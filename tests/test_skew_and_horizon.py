"""Hot-key skew correctness + tombstone-GC LSN-horizon semantics."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from clin_variant_etl_spark.engine import CdcPipeline, create_cdc_table
from clin_variant_etl_spark.engine.oracle import assert_state_equals, replay_oracle
from clin_variant_etl_spark.lake.maintenance import compact
from clin_variant_etl_spark.schemas import BASE_DOCS_SCHEMA

EV_DDL = "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string"


def test_extreme_hot_key_skew_correct(spark, tmp_path):
    """One key receives 60% of all events (far beyond Zipf-1.1); the salted
    two-phase dedup must still produce the exact last-writer-wins state."""
    rng = np.random.default_rng(17)
    n = 20_000
    hot = rng.random(n) < 0.6
    doc = np.where(hot, "doc_hot", np.char.add("doc_", rng.integers(0, 200, n).astype(str)))
    lsn = np.arange(1, n + 1)
    op = np.where(rng.random(n) < 0.05, "D", "U")
    pdf = pd.DataFrame(
        {
            "lsn": lsn,
            "op": op,
            "doc_id": doc,
            "tokens": [None if o == "D" else [int(x) % 100, int(x) % 7] for x, o in zip(lsn, op)],
            "n_tok": np.where(op == "D", None, 2),
            "source": np.where(op == "D", None, "web"),
        }
    )
    create_cdc_table(str(tmp_path / "t"), BASE_DOCS_SCHEMA, n_buckets=8)
    pipe = CdcPipeline(spark, str(tmp_path / "t"), n_salts=8)
    # 4 epochs, shuffled delivery inside each
    order = rng.permutation(n)
    for k in range(4):
        part = pdf.iloc[order[k * n // 4 : (k + 1) * n // 4]]
        df = spark.createDataFrame(part.to_dict("records"), EV_DDL)
        res = pipe.apply_epoch(df, k)
        assert not res.skipped
    oracle = replay_oracle(pdf)
    assert_state_equals(pipe.read_state(), oracle)


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV_DDL)


def test_tombstone_gc_respects_lsn_horizon(spark, tmp_path):
    create_cdc_table(str(tmp_path / "t"), BASE_DOCS_SCHEMA, n_buckets=4)
    pipe = CdcPipeline(spark, str(tmp_path / "t"), n_salts=2)
    # d_old deleted long ago (lsn 5); d_new deleted recently (lsn 100)
    pipe.apply_epoch(
        _ev(
            spark,
            [
                (1, "I", "d_old", [1], 1, "web"),
                (5, "D", "d_old", None, None, None),
                (90, "I", "d_new", [9], 1, "web"),
                (100, "D", "d_new", None, None, None),
            ],
        ),
        0,
    )
    # horizon=50: only tombstones with lsn < 50 may be GC'd
    compact(spark, pipe.table, drop_tombstones=True, lsn_horizon=50)
    raw = pipe.table.read(spark)
    tombs = {r["doc_id"] for r in raw.where(F.col("_deleted")).collect()}
    assert tombs == {"d_new"}  # d_old's tombstone gone, d_new's kept
    # a late update older than d_new's delete must STILL stay dead
    res = pipe.apply_epoch(_ev(spark, [(95, "U", "d_new", [5], 1, "web")]), 1)
    assert res.dropped_stale == 1
    assert pipe.read_state().where(F.col("doc_id") == "d_new").count() == 0
    # by the horizon contract, no event with lsn < 50 can arrive for d_old;
    # a NEW insert (lsn above horizon) legitimately recreates it
    pipe.apply_epoch(_ev(spark, [(200, "I", "d_old", [2], 1, "web")]), 2)
    assert pipe.read_state().where(F.col("doc_id") == "d_old").count() == 1
