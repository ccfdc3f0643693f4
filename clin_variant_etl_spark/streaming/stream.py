"""Structured Streaming front-end: tail the change log, apply per micro-batch.

The reference simulates incrementality with batch ids + partition overwrite
(SURVEY.md §2.J); this is the axis-A upgrade to a real stream:

    readStream(file source over the event log)
      → foreachBatch(CdcPipeline.apply_epoch)

Exactly-once composition: Spark's streaming checkpoint guarantees each source
file lands in exactly one micro-batch with a monotonic ``batchId``; the
pipeline's epoch gate (stored in the data table's snapshot properties,
atomically with the data) makes the apply idempotent under foreachBatch
retries.  Together: a batch is applied exactly once even if the process dies
between the table commit and the streaming-checkpoint advance.

Pairing rule: one streaming checkpoint dir ↔ one target table.  Restarting
with a *fresh* checkpoint against an already-populated table is UNSAFE, not
merely wasteful: batch ids restart at 0 and files re-batch, so a batch that
mixes already-applied and NEW events can receive an id <= last_epoch_id, be
skipped whole by the epoch gate while the stream checkpoint marks its files
consumed — silent event loss.  Resume must reuse the checkpoint dir (which
is exactly Structured Streaming's contract); ``_guard_checkpoint_pairing``
refuses to start in the torn state so the mistake fails loudly.

On a real cluster the same code tails Kafka or a binlog connector — only the
``readStream`` source line changes; ordering is not required by the apply
(late/duplicate events are resolved by LSN), so any at-least-once source works.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, types as T

from ..engine.apply import CdcPipeline


class StreamingCdc:
    def __init__(
        self,
        spark: SparkSession,
        pipeline: CdcPipeline,
        events_dir: str | None = None,
        event_schema: T.StructType | None = None,
        checkpoint_dir: str = "",
        max_files_per_trigger: int | None = None,
        source=None,
        after_batch=None,
    ):
        """``source`` (optional): callable ``spark -> streaming DataFrame``
        replacing the default file-log reader — a Kafka/binlog adapter plugs
        in here and NOTHING downstream changes (epoch gate, LSN resolution,
        checkpoint pairing are all source-agnostic; pinned by
        tests/test_mock_source.py against a non-file at-least-once,
        out-of-order source).

        ``after_batch`` (optional): callable ``(pipeline, epoch_id,
        ApplyResult) -> None`` run inside foreachBatch AFTER the epoch's
        table commit — the composition point for per-epoch maintenance
        (``lake.maintenance.auto_fold``) and derived-state refresh
        (``engine.matview``).  Crash contract: a failure here fails the
        micro-batch BEFORE the streaming checkpoint advances, so the batch
        redelivers; the epoch gate skips the (already-committed) apply and
        the hook re-runs — hooks must therefore be idempotent, which both
        shipped hooks are (a fold re-selects nothing; a matview refresh is
        cursor-gated)."""
        self.spark = spark
        self.pipeline = pipeline
        self.events_dir = events_dir
        self.event_schema = event_schema
        self.checkpoint_dir = checkpoint_dir
        self.max_files_per_trigger = max_files_per_trigger
        self.source = source
        self.after_batch = after_batch
        if source is None and (events_dir is None or event_schema is None):
            raise ValueError("pass either source= or events_dir+event_schema")

    def _reader(self):
        if self.source is not None:
            return self.source(self.spark)
        r = (
            self.spark.readStream.schema(self.event_schema)
            # recursive lookup reads epoch=*/part-*.parquet without turning
            # the epoch dir into an inferred partition column
            .option("recursiveFileLookup", "true")
        )
        if self.max_files_per_trigger:
            r = r.option("maxFilesPerTrigger", self.max_files_per_trigger)
        return r.parquet(self.events_dir)

    def _guard_checkpoint_pairing(self) -> None:
        """Refuse a fresh checkpoint against an already-advanced table (see
        module docstring: the torn pairing can silently lose events)."""
        import os

        has_ckpt = os.path.isdir(os.path.join(self.checkpoint_dir, "offsets"))
        if not has_ckpt and self.pipeline.last_epoch_id() >= 0:
            raise RuntimeError(
                f"streaming checkpoint {self.checkpoint_dir!r} is empty but the "
                f"target table has last_epoch_id="
                f"{self.pipeline.last_epoch_id()} — starting fresh would re-batch "
                "from id 0 and the epoch gate could skip batches containing NEW "
                "events (silent loss). Reuse the original checkpoint dir, or "
                "replay into a fresh table."
            )

    def _apply_batch(self, df, epoch_id):
        res = self.pipeline.apply_epoch(df, epoch_id)
        if self.after_batch is not None:
            self.after_batch(self.pipeline, epoch_id, res)

    def _start(self, trigger_kwargs: dict):
        self._guard_checkpoint_pairing()
        return (
            self._reader()
            .writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(**trigger_kwargs)
            .start()
        )

    def run_available(self) -> None:
        """Process everything currently in the log, then stop (availableNow).

        Used for batch-drain runs and tests; production tails use
        ``run_tail``.
        """
        q = self._start({"availableNow": True})
        q.awaitTermination()

    def run_tail(self, trigger_seconds: int = 30, await_termination: bool = True):
        """Continuous tail: apply new event files every ``trigger_seconds``.

        Returns the StreamingQuery (after blocking, if ``await_termination``).
        """
        q = self._start({"processingTime": f"{trigger_seconds} seconds"})
        if await_termination:
            q.awaitTermination()
        return q
