"""As-of join — for each left row, the latest right row with
``right_ts <= left_ts`` and equal keys — plus the last-touch attribution
query built on it.

Spark has no ASOF JOIN (SPARK-22947 open since 2017); the naive encodings
are a range join (BroadcastNestedLoop / O(n·m) per key) or a per-key
``collect_list`` + UDF (driver-sized state).  The scale-out formulation used
here is the tagged-union window:

  1. tag right rows side=0 carrying their payload, left rows side=1 with a
     null payload;
  2. union and sort each key partition by (ts, side) — right sorts before
     left at equal ts, so equality matches (ts_r == ts_l) are included;
  3. ``last(payload, ignorenulls=True)`` over rows UNBOUNDED PRECEDING →
     CURRENT ROW fills every left row with the most recent right payload;
  4. keep side=1 rows.

Cost: ONE shuffle on the join key + one per-partition sort — the same plan
shape as a groupBy, linear in |left| + |right|, no pair blow-up.  At 100 TB
both inputs hash-partition on the key; skewed keys behave like any skewed
window (AQE handles moderate skew; a hot key could be range-split by time
because the window is a prefix scan — noted, not needed here).

Determinism: the window order must be total, so callers pre-dedupe right
rows to one per (key, ts) — ``attribution_last_touch`` keeps max(event_id)
per (user_id, ts), matching the oracle's GROUP BY exactly.

Oracle: DuckDB has a native ASOF LEFT JOIN with identical semantics
(greatest right ts <= left ts, equality included) — an exact, independent
implementation of the operator.

Reference parity: no as-of operator in the reference (nearest-event lookup
there is the interval join family, covered by C9); this is an LLM/event-
pipeline extension per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .registry import load, query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_us: int | None = None,
) -> DataFrame:
    """All columns of ``left`` plus ``right_cols`` from the latest right row
    with ``right[right_ts] <= left[left_ts]`` per ``on`` key (null when no
    right row precedes).  Right rows must be unique per (key, ts).

    ``tolerance_us`` (pandas merge_asof / kdb wj semantics): a match further
    back than this many microseconds is nulled out.  Exact by construction —
    the window fill picks the NEAREST preceding row, so if that one exceeds
    the tolerance every other candidate does too; the filter is a cheap
    post-projection, never a second pass."""
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("_r")
    # a NULL right ts can never satisfy right_ts <= left_ts, but nulls_first
    # ordering would otherwise make it the "earliest" row and leak its
    # payload into left rows with no real predecessor — drop them up front
    r = right.where(F.col(right_ts).isNotNull()).select(
        *on, F.col(right_ts).alias("_ts"), payload, F.lit(0).alias("_side")
    )
    l = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc_nulls_first("_ts"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_r", F.last("_r", ignorenulls=True).over(w))
    filled = filled.withColumn(
        "_rts", F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True).over(w)
    )
    if tolerance_us is not None:
        gap = F.unix_micros(F.col("_ts").cast("timestamp")) - F.unix_micros(
            F.col("_rts").cast("timestamp")
        )
        filled = filled.withColumn(
            "_r", F.when(gap <= F.lit(int(tolerance_us)), F.col("_r"))
        )
    out = filled.where(F.col("_side") == 1).drop("_ts", "_rts", "_side")
    for c in right_cols:
        out = out.withColumn(c, F.col("_r")[c])
    return out.drop("_r")


_ATTRIBUTION_ORACLE = """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), views AS (
  SELECT user_id, ts, MAX(event_id) AS view_event_id
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT p.event_id AS purchase_event_id,
       p.user_id AS user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       v.view_event_id AS view_event_id,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
FROM purchases p
ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts >= v.ts
"""


@query(
    "attribution_last_touch",
    oracle=_ATTRIBUTION_ORACLE,
    survey="asof-join,C10,E2,H-date",
    # gated mid-r4 (slot freed by driver_scalar_share): the as-of operator
    # is verified against an INDEPENDENT engine implementation (DuckDB's
    # native ASOF JOIN) — highest-value driver row — see __spark_entry__.py
)
def attribution_last_touch(spark, sf_dir):
    """Last-touch attribution: each purchase joined as-of to the same user's
    most recent preceding (or simultaneous) view, with the gap in exact
    microseconds.  Unmatched purchases keep null view columns."""
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"), "user_id", "ts"
    )
    views = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
        .select("user_id", F.col("ts").alias("view_ts_raw"), "view_event_id")
    )
    joined = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="view_ts_raw",
        right_cols=["view_event_id", "view_ts_raw"],
    )
    return joined.select(
        F.col("purchase_event_id").cast("long").alias("purchase_event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("view_event_id").cast("long").alias("view_event_id"),
        F.date_format("view_ts_raw", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        (
            # TIMESTAMP_NTZ → TIMESTAMP under the session's pinned UTC zone:
            # wall-clock == epoch, matching DuckDB's epoch_us on naive ts
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("view_ts_raw").cast("timestamp"))
        ).alias("gap_us"),
    )
