"""Clustered compaction: cluster_by range-splits each partition's rows over
its output files so manifest min/max stats actually prune, vs the hash
split where every file spans the full value range (A/B asserted)."""

from pyspark.sql import functions as F

from clin_variant_etl_spark.engine import CdcPipeline, create_cdc_table
from clin_variant_etl_spark.lake.maintenance import compact
from clin_variant_etl_spark.schemas import BASE_DOCS_SCHEMA, INTERNAL_LAST_LSN
from clin_variant_etl_spark.testgen import (
    EventGenConfig,
    generate_change_events,
    write_events_by_epoch,
)


def _build(spark, tmp_path, name):
    cfg = EventGenConfig(n_docs=400, n_events=2000, n_epochs=2, seed=17)
    tbl = generate_change_events(cfg)
    src = str(tmp_path / f"ev_{name}")
    write_events_by_epoch(tbl, src)
    path = str(tmp_path / f"docs_{name}")
    create_cdc_table(path, BASE_DOCS_SCHEMA, n_buckets=2)
    pipe = CdcPipeline(spark, path, apply_mode="mor")
    for ep in range(2):
        pipe.apply_epoch(spark.read.parquet(f"{src}/epoch={ep}"), epoch_id=ep)
    return pipe


def test_cluster_by_makes_stats_pruning_effective(spark, tmp_path):
    pipe = _build(spark, tmp_path, "clustered")
    before = {
        tuple(r) for r in pipe.read_state().select("doc_id", "n_tok").collect()
    }
    compact(
        spark,
        pipe.table,
        resolve_keep_latest=("doc_id", INTERNAL_LAST_LSN),
        target_file_bytes=4_000,  # force several files per bucket
        min_input_files=1,
        cluster_by=["n_tok"],
    )
    # semantics preserved through the clustered rewrite
    after = {
        tuple(r) for r in pipe.read_state().select("doc_id", "n_tok").collect()
    }
    assert after == before

    snap = pipe.table.current_snapshot()
    files = snap.files
    assert len(files) > 2, "split did not produce multiple files per bucket"
    # every rewritten file carries n_tok stats and the ranges are NARROW:
    # strictly fewer files match a point-range than exist
    assert all("n_tok" in (f.get("stats") or {}) for f in files)
    full = pipe.table.read(spark)
    sliced = pipe.table.read(spark, stats_filter={"n_tok": (50, None)})
    # strict non-empty subset: SOME files match the mid-range predicate
    # (n_tok spans 8..64), the rest are pruned by their manifest ranges
    assert set() != set(sliced.inputFiles()) < set(full.inputFiles())
    # pruned read still complete for the predicate
    want = full.where(F.col("n_tok") >= 50).count()
    assert want > 0
    assert sliced.where(F.col("n_tok") >= 50).count() == want


def test_hash_split_baseline_cannot_prune(spark, tmp_path):
    pipe = _build(spark, tmp_path, "hashed")
    compact(
        spark,
        pipe.table,
        resolve_keep_latest=("doc_id", INTERNAL_LAST_LSN),
        target_file_bytes=4_000,
        min_input_files=1,
    )
    # hash split: no stats recorded (and every file spans the full range
    # anyway) — the same stats_filter opens every file
    full = pipe.table.read(spark)
    sliced = pipe.table.read(spark, stats_filter={"n_tok": (50, None)})
    assert set(sliced.inputFiles()) == set(full.inputFiles())


def test_cluster_by_requires_target_bytes(spark, tmp_path):
    pipe = _build(spark, tmp_path, "guard")
    import pytest

    with pytest.raises(ValueError, match="cluster_by requires"):
        compact(spark, pipe.table, cluster_by=["n_tok"])


def test_zorder_two_predicate_pruning_beats_1d(spark, tmp_path):
    """Z-order (cluster_by two columns): a box predicate on (n_tok, lsn)
    prunes STRICTLY more files than the 1-D n_tok cluster on the same data,
    and both reads stay complete.  (VERDICT r4 task #5 'done' bar.)"""
    from clin_variant_etl_spark.schemas import INTERNAL_LAST_LSN as LSN

    results = {}
    for name, cols in (("oned", ["n_tok"]), ("zord", ["n_tok", LSN])):
        pipe = _build(spark, tmp_path, name)
        before = {
            tuple(r) for r in pipe.read_state().select("doc_id", "n_tok").collect()
        }
        compact(
            spark,
            pipe.table,
            resolve_keep_latest=("doc_id", LSN),
            target_file_bytes=2_000,  # many small files per bucket
            min_input_files=1,
            cluster_by=cols,
        )
        after = {
            tuple(r) for r in pipe.read_state().select("doc_id", "n_tok").collect()
        }
        assert after == before, f"{name}: clustered rewrite changed state"
        snap = pipe.table.current_snapshot()
        # z-order records stats for BOTH columns
        for c in cols:
            assert all(c in (f.get("stats") or {}) for f in snap.files), (name, c)
        results[name] = pipe

    # box predicate: mid-range slice on both dimensions
    lo_t, hi_t = 40, 56
    # LSN is internal: visible via the RAW table read (what compact clusters)
    lsns = [r[0] for r in results["zord"].table.read(spark).select(LSN).collect()]
    lsns.sort()
    lo_l, hi_l = lsns[len(lsns) // 3], lsns[2 * len(lsns) // 3]
    box = {"n_tok": (lo_t, hi_t), LSN: (lo_l, hi_l)}

    opened = {}
    for name, pipe in results.items():
        full = pipe.table.read(spark)
        sliced = pipe.table.read(spark, stats_filter=box)
        opened[name] = (len(set(sliced.inputFiles())), len(set(full.inputFiles())))
        # completeness under pruning
        pred = (
            (F.col("n_tok") >= lo_t) & (F.col("n_tok") <= hi_t)
            & (F.col(LSN) >= lo_l) & (F.col(LSN) <= hi_l)
        )
        assert sliced.where(pred).count() == full.where(pred).count()

    z_open, z_total = opened["zord"]
    d_open, d_total = opened["oned"]
    # comparable layouts (same data, same target size)
    assert abs(z_total - d_total) <= max(2, d_total // 4), opened
    # the headline: strictly fewer files opened by the 2-predicate read
    assert z_open < d_open, opened
