"""Event-time windowed aggregation with watermark-bounded state — the
Structured Streaming form of the batch window queries (tumbling / sliding in
queries/cdc_events.py).

``withWatermark`` is what makes a streaming window FINITE: without it the
window state grows forever (every window stays open for ever-later data).
The watermark declares "no event older than max(event_ts) − delay will be
accepted"; windows whose end falls behind it are finalized, emitted once
(append mode — the exactly-once shape for downstream sinks), and their state
is dropped.  Late rows inside the allowance are still counted; rows beyond
it are discarded by the engine — both behaviors pinned in
tests/test_watermark.py against a 3-micro-batch file log.

At 100 TB/day this bound is the difference between O(open windows) and
O(history) state; the delay is the operator's late-data SLA, the same
contract the batch engine's lsn-horizon GC expresses for tombstones
(lake/maintenance.py) — one allowance, two planes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "event_ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling (or sliding, if ``slide``) count + lsn span per window,
    watermark-bounded, append-output-compatible (aggregation keyed on the
    event-time window ⇒ finalized exactly once per window)."""
    w = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), *(keys or []))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lsn").alias("min_lsn"),
            F.max("lsn").alias("max_lsn"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *(keys or []),
            "n",
            "min_lsn",
            "max_lsn",
        )
    )
