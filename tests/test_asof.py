"""asof_join unit tests: equality inclusion, no-match nulls, per-key
isolation, and the plan-shape guarantee (one exchange, no range join).
The end-to-end attribution query is covered by tests/test_oracle_parity.py
against DuckDB's native ASOF LEFT JOIN."""

from datetime import datetime

from pyspark.sql import functions as F

from clin_variant_etl_spark.queries.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def _run(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "a"),  # after r2 → matches r2
            (1, _ts("2024-01-01T08:30:00"), "b"),  # between r1 and r2 → r1
            (1, _ts("2024-01-01T08:00:00"), "c"),  # == r1 ts → equality included
            (1, _ts("2024-01-01T07:59:59"), "d"),  # before everything → null
            (2, _ts("2024-01-01T12:00:00"), "e"),  # key 2 has no right rows → null
        ],
        "k: long, lts: timestamp_ntz, tag: string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T08:00:00"), 100),  # r1
            (1, _ts("2024-01-01T09:00:00"), 200),  # r2
        ],
        "k: long, rts: timestamp_ntz, rid: long",
    )
    return asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts", right_cols=["rid"])


def test_asof_semantics(spark):
    got = {r["tag"]: r["rid"] for r in _run(spark).collect()}
    assert got == {"a": 200, "b": 100, "c": 100, "d": None, "e": None}


def test_asof_single_shuffle_no_range_join(spark):
    plan = _run(spark)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    # one exchange per union branch feeding ONE window sort — no join at all
    assert "Window" in plan and "Join" not in plan


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), "near"),   # 30 min after r1 → kept
            (1, _ts("2024-01-01T11:00:00"), "far"),    # 2h after r2 → nulled
        ],
        "k: long, lts: timestamp_ntz, tag: string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), 100), (1, _ts("2024-01-01T09:00:01"), 200)],
        "k: long, rts: timestamp_ntz, rid: long",
    )
    got = {
        r["tag"]: r["rid"]
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            right_cols=["rid"], tolerance_us=3600 * 1_000_000,
        ).collect()
    }
    assert got == {"near": 200, "far": None}


def test_asof_null_right_ts_never_matches(spark):
    # a right row with NULL ts must not leak its payload into left rows
    # that have no true predecessor (nulls_first ordering hazard)
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T08:00:00"), "x")], "k: long, lts: timestamp_ntz, tag: string"
    )
    right = spark.createDataFrame(
        [(1, None, 999)], "k: long, rts: timestamp_ntz, rid: long"
    )
    got = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts", right_cols=["rid"]
    ).collect()
    assert got[0]["rid"] is None
