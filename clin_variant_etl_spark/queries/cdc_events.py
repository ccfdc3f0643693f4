"""CDC / incremental-ingest semantics expressed over the generic ``events``
table (SURVEY.md §2 E+J): keep-latest-per-key, non-duplication invariants,
epoch filters, out-of-order detection, sessionization, tumbling windows.

These mirror the engine's streaming semantics (engine/apply.py) in a
SQL-checkable form: ``event_id`` plays the LSN (global total order), ``ts``
the event time, ``user_id`` the key.  Reference patterns cited per query.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from .registry import load, query


def _cents(c):
    return F.round(F.col(c) * 100).cast("long")


# =========================================================================
# E1/J4 — dedup keep-latest-within-key, the reference's CDC dedup
# (KeepFirstWithinPartition etl/fhir/FhirRawToNormalizedMappings.scala:14-17);
# deterministic tie-break on the LSN (event_id), per SURVEY.md §7.4.
# =========================================================================
@query(
    "cdc_latest_state",
    oracle="""
SELECT user_id,
       event_id AS last_event_id,
       event_type AS last_type,
       CAST(round(value*100) AS BIGINT) AS last_value_cents,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
""",
    survey="E1,J4,E5",
    gate=False,  # rotated out r5: driver rows green r1-r4; codes stay gate-covered
)
def cdc_latest_state(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
            _cents("value").alias("last_value_cents"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        )
    )


# =========================================================================
# E1 (salted) — the engine's two-phase skew-proof dedup on a monotone LSN,
# exercised through the real engine function (engine/dedup.py), so the
# correctness gate covers the production code path.
# =========================================================================
@query(
    "cdc_latest_by_lsn_salted",
    oracle="""
SELECT user_id,
       event_id AS last_event_id,
       event_type AS last_type
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
""",
    survey="E1,J4,F1",
    gate=False,  # rotated out r5: driver rows green r1-r4; codes stay gate-covered
)
def cdc_latest_by_lsn_salted(spark, sf_dir):
    from ..engine.dedup import latest_by_key_salted

    e = load(spark, sf_dir, "events").select("user_id", "event_id", "event_type")
    latest = latest_by_key_salted(e, key="user_id", order_col="event_id", n_salts=8)
    return latest.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
    )


# =========================================================================
# net-state classification — latest-wins upsert view of the event stream:
# signup=insert, error=tombstone, others=update (engine/apply.py op model).
# =========================================================================
@query(
    "cdc_net_state_ops",
    oracle="""
WITH latest AS (
  SELECT user_id, event_type
  FROM events
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
)
SELECT event_type AS last_type,
       COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_tombstoned
FROM latest
GROUP BY 1
""",
    survey="E1,J4,D2,B4",
    gate=False,  # rotated out r5: driver rows green r1-r4; codes stay gate-covered
)
def cdc_net_state_ops(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest = e.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    return (
        latest.groupBy(F.col("event_type").alias("last_type"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("n_tombstoned"),
        )
    )


# =========================================================================
# D9 — the non-duplication invariant: groupBy(keys).count.filter(>1)
# (reference: etl/qc/variantlist/NonDuplicationSNV.scala:10-16)
# =========================================================================
@query(
    "cdc_duplicate_invariant",
    oracle="""
SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, COUNT(*) AS n
FROM events
GROUP BY 1, 2
HAVING COUNT(*) > 1
""",
    survey="D9,D8",
    gate=False,  # rotated out r5: driver rows green r1-r4; codes stay gate-covered
)
def cdc_duplicate_invariant(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )


# =========================================================================
# J1/B3 — epoch (time-range) filter: the reference's lastRunDateTime
# incremental extract (etl/enriched/Consequences.scala:30-31)
# =========================================================================
@query(
    "cdc_epoch_slice",
    oracle="""
SELECT event_type, COUNT(*) AS n,
       CAST(MIN(event_id) AS BIGINT) AS min_lsn,
       CAST(MAX(event_id) AS BIGINT) AS max_lsn
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
GROUP BY 1
""",
    survey="J1,B3,B2",
)
def cdc_epoch_slice(spark, sf_dir):
    e = load(spark, sf_dir, "events").where(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp_ntz"))
    )
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").cast("long").alias("min_lsn"),
        F.max("event_id").cast("long").alias("max_lsn"),
    )


# =========================================================================
# J6 — out-of-order detection: events whose ts is behind the running max
# in LSN order (the late-event population the engine's LSN guard handles).
# =========================================================================
@query(
    "cdc_out_of_order",
    oracle="""
WITH flagged AS (
  SELECT event_type,
         CASE WHEN ts < max(ts) OVER (ORDER BY event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS late
  FROM events
)
SELECT event_type, COUNT(*) AS n_total, CAST(SUM(late) AS BIGINT) AS n_late
FROM flagged
GROUP BY 1
""",
    survey="J6,E1,D2",
    gate=False,  # rotated out r5: driver rows green r1-r4; codes stay gate-covered
)
def cdc_out_of_order(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = W.orderBy("event_id").rowsBetween(W.unboundedPreceding, -1)
    flagged = e.select(
        "event_type",
        F.when(F.col("ts") < F.max("ts").over(w), 1).otherwise(0).alias("late"),
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"), F.sum("late").cast("long").alias("n_late")
    )


# =========================================================================
# Streaming-window analogue (batch form): tumbling 1-hour aggregation
# (axis-A upgrade — the reference has no windows, SURVEY.md §2.J note)
# =========================================================================
@query(
    "tumbling_hourly_activity",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2
""",
    survey="J-window,D1,D8",
    gate=False,  # rotated out r5: driver rows green r1-r4; codes stay gate-covered
)
def tumbling_hourly_activity(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents("value")).alias("sum_value_cents"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )


# =========================================================================
# Sessionization — gap-based session assignment via lag + cumulative sum
# (stateful-streaming analogue expressed as deterministic windows)
# =========================================================================
@query(
    "session_stats_per_user",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM gaps
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events FROM sessions GROUP BY 1, 2
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(MAX(n_events) AS BIGINT) AS max_session_events,
       CAST(SUM(n_events) AS BIGINT) AS n_events
FROM per_session
GROUP BY 1
""",
    survey="E1,J-window,D1",
    gate=False,  # rotated out r5: driver rows green r1-r4; codes stay gate-covered
)
def session_stats_per_user(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(wo)
    new_session = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTE")), 1
    ).otherwise(0)
    sess = e.withColumn("new_session", new_session).withColumn(
        "session_id",
        F.sum("new_session").over(wo.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("n_events"))
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").cast("long").alias("max_session_events"),
        F.sum("n_events").cast("long").alias("n_events"),
    )


# =========================================================================
# Sliding-window analogue (batch form): 1-hour windows every 30 minutes.
# Completes the axis-A window family (tumbling + session above).  Spark's
# F.window(ts, "1 hour", "30 minutes") assigns each event to exactly
# slide⁻¹·length = 2 windows; the oracle enumerates the same two starts
# (floor30(ts) and floor30(ts) − 30 min — epoch-aligned, identical origin
# to Spark's window calculation) and re-aggregates.  At scale the explode
# is map-side ×2 fan-out feeding ONE count shuffle — the exact plan
# Structured Streaming uses for sliding aggregations pre-watermark.
# =========================================================================
_SLIDE_SQL_STARTS = (
    "to_timestamp(floor(epoch(ts) / 1800) * 1800)",
    "to_timestamp(floor(epoch(ts) / 1800) * 1800 - 1800)",
)


@query(
    "sliding_hourly_activity",
    oracle=f"""
WITH assigned AS (
  SELECT w.ws AS window_start, event_type, value, user_id
  FROM events, LATERAL unnest([{_SLIDE_SQL_STARTS[0]}, {_SLIDE_SQL_STARTS[1]}]) AS w(ws)
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM assigned
GROUP BY 1, 2
""",
    survey="J-window,D1,D8,H-date",
    # gated since r5 (rotation: first driver row this round)
)
def sliding_hourly_activity(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            F.window("ts", "1 hour", "30 minutes").alias("w"),
            "event_type",
            "value",
            "user_id",
        )
        .groupBy(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents("value")).alias("sum_value_cents"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )


# =========================================================================
# Frame-based running aggregation: per-user cumulative spend + running event
# index over event time.  The rank-based windows above (row_number/lag) are
# POSITION windows; this is the FRAME family (rows BETWEEN UNBOUNDED
# PRECEDING AND CURRENT ROW) — the last window shape the registry lacked.
# Total order inside each partition: (ts, event_id) — ties impossible since
# event_id is unique, so the running sums are deterministic.  At scale this
# is one shuffle on user_id + a sorted per-partition scan (identical cost
# profile to sessionization above).
# =========================================================================
@query(
    "running_user_spend",
    oracle="""
SELECT user_id,
       event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       CAST(SUM(CAST(round(value*100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS run_cents,
       CAST(ROW_NUMBER()
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS n_so_far
FROM events
WHERE event_type = 'purchase'
""",
    survey="E-frame,H-date,D1",
    # gated since r5 (rotation: first driver row this round)
)
def running_user_spend(spark, sf_dir):
    e = load(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    frame = wo.rowsBetween(W.unboundedPreceding, W.currentRow)
    return e.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.sum(_cents("value")).over(frame).cast("long").alias("run_cents"),
        F.row_number().over(wo).cast("long").alias("n_so_far"),
    )
