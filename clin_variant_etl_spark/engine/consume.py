"""Durable change-data-feed consumer: drain ``CdcPipeline.read_changes``
batches behind a crash-safe cursor.

``read_changes`` gives the snapshot-diff; production still needs the
consumer side — where is the cursor stored, when does it advance, and what
happens if the handler dies mid-batch.  ``CdfConsumer`` answers those with
the same primitives the lake itself uses:

- the cursor is a tiny JSON file on the pluggable ``FileIO`` metadata plane
  (works on the object-store posture: atomic put, no rename dependency);
- delivery is AT-LEAST-ONCE with a handler contract: the cursor advances to
  the drained head ONLY after the handler returns — a crash between handler
  and advance redelivers the same snapshot-diff batch, so handlers must be
  idempotent (the batch is keyed (doc_id, _last_lsn): an upsert-by-key
  consumer is idempotent for free, exactly like the engine's own LSN guard);
- a batch is pinned to an explicit ``to_snapshot_id`` head, so commits that
  land while the handler runs are never half-seen — they are the next batch.

This mirrors how Structured Streaming consumes a Delta/Iceberg table-as-
stream (version-range micro-batches + a checkpointed version cursor), built
on this repo's snapshot-diff instead of a file-log replay.
"""

from __future__ import annotations

import json

from collections.abc import Callable

from pyspark.sql import DataFrame

from ..lake.fsio import FileIO, LocalFileIO

from .apply import CdcPipeline


class CdfConsumer:
    def __init__(self, pipeline: CdcPipeline, cursor_path: str, io: FileIO | None = None):
        self.pipeline = pipeline
        self.cursor_path = cursor_path
        self.io = io or LocalFileIO()

    def cursor(self) -> int | None:
        """Last fully-handled snapshot id; None = never drained."""
        if not self.io.exists(self.cursor_path):
            return None
        return json.loads(self.io.read(self.cursor_path))["snapshot_id"]

    def _advance(self, snapshot_id: int) -> None:
        self.io.put_atomic(
            self.cursor_path, json.dumps({"snapshot_id": snapshot_id}).encode()
        )

    def drain(
        self,
        handler: Callable[[DataFrame], None],
        on_expired_cursor: str = "resync",
        require_materialized: bool = False,
    ) -> dict:
        """One drain cycle: feed = read_changes(cursor → current head), call
        ``handler(feed)``, then advance the cursor.  Returns a summary dict.

        The handler runs BEFORE the cursor advance (at-least-once); it
        receives the DataFrame lazily.  **Handlers MUST trigger their action
        (write/collect/count) before returning** — the cursor advances when
        ``handler`` returns, so work deferred past that point is marked
        handled without having run, and a failure in the deferred plan
        would surface AFTER the batch was already considered delivered.
        This matches foreachBatch semantics (the epoch commits when the
        function returns), but unlike foreachBatch nothing downstream
        forces the plan — hence the guard below.

        ``require_materialized=True`` hardens the contract: after the
        handler returns, the consumer itself executes the feed's plan (a
        count) before advancing, so a plan-level failure (expired file,
        schema error, bad UDF) aborts the drain and the batch is
        redelivered instead of silently skipped.  It costs one extra scan
        of the batch diff and still cannot verify the handler's external
        side effects — idempotent handlers remain the real contract.
        A no-op head (cursor already at head) skips the handler entirely.

        ``on_expired_cursor``: if ``expire_snapshots`` has deleted the
        cursor's snapshot, the incremental diff is unrecoverable (same as
        Iceberg CDF past expiry).  "resync" (default) re-delivers the FULL
        current per-key state as one batch (from=None — correct for any
        keyed-idempotent handler, though deletes tombstone-GC'd in the gap
        are not observable) and reports ``resynced: True``; "raise"
        propagates, for consumers that must not reprocess history.
        """
        start = self.cursor()
        resynced = False
        if start is not None and start not in self.pipeline.table.snapshot_ids():
            if on_expired_cursor != "resync":
                raise LookupError(
                    f"cursor snapshot {start} has been expired; incremental "
                    "diff unrecoverable — re-sync from a full read or pass "
                    "on_expired_cursor='resync'"
                )
            start, resynced = None, True
        head = self.pipeline.table.current_snapshot().snapshot_id
        if start == head:
            return {"from": start, "to": head, "handled": False}
        feed = self.pipeline.read_changes(from_snapshot_id=start, to_snapshot_id=head)
        handler(feed)
        out = {"from": start, "to": head, "handled": True}
        if require_materialized:
            out["rows"] = feed.count()  # plan failure ⇒ no advance, redeliver
        self._advance(head)
        if resynced:
            out["resynced"] = True
        return out
