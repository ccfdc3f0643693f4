"""Round-3 FS layer: footer-derived per-file lineage (zero extra scans of the
event batch) and executor-side parquet-stats collection above the threshold."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from clin_variant_etl_spark.engine import CdcPipeline, create_cdc_table
from clin_variant_etl_spark.lake import table as table_mod
from clin_variant_etl_spark.lake.table import _collect_parquet_stats
from clin_variant_etl_spark.schemas import BASE_DOCS_SCHEMA
from clin_variant_etl_spark.testgen import (
    EventGenConfig,
    generate_change_events,
    write_events_by_epoch,
)


@pytest.fixture()
def part_stats_pipeline(spark, tmp_path):
    create_cdc_table(str(tmp_path / "t"), BASE_DOCS_SCHEMA, n_buckets=4)
    return CdcPipeline(
        spark,
        str(tmp_path / "t"),
        lineage_path=str(tmp_path / "lin"),
        checkpoint_path=str(tmp_path / "ckpt"),
        n_salts=2,
        collect_part_stats=True,
    )


def test_footer_lineage_no_extra_scan(spark, tmp_path, part_stats_pipeline):
    cfg = EventGenConfig(n_docs=40, n_events=600, n_epochs=2, seed=31)
    tbl = generate_change_events(cfg)
    write_events_by_epoch(tbl, str(tmp_path / "ev"), files_per_epoch=2)
    for k in range(2):
        ev = spark.read.parquet(str(tmp_path / "ev" / f"epoch={k}"))
        res = part_stats_pipeline.apply_epoch(ev, k)
        # the old implementation pre-scanned the events (phase "scan_offsets");
        # footer-derived lineage must not add any phase before dedup
        assert "scan_offsets" not in (res.phase_ms or {})

    lin = part_stats_pipeline.lineage.read(spark).toPandas()
    per_file = lin[lin.partition_id >= 0]
    summary = lin[lin.partition_id == -1]
    # one lineage row per written data file, rows summing to the table delta
    snap = part_stats_pipeline.table.current_snapshot()
    assert len(per_file[per_file.epoch_id == 1]) >= 1
    # per-file lsn coverage comes from footers: bounds must bracket the
    # actual _last_lsn values in the current table state
    state = part_stats_pipeline.table.read(spark)
    lo, hi = state.agg(F.min("_last_lsn"), F.max("_last_lsn")).first()
    ep1 = per_file[per_file.epoch_id == 1]
    assert ep1.source_offset_min.min() >= lo - 0  # footer mins are real lsns
    assert ep1.source_offset_max.max() == hi
    # the summary row + checkpoint still record SOURCE offsets (observe-fed)
    ev_all = tbl.to_pandas()
    ep1_src = ev_all[ev_all.epoch_hint == 1]
    s1 = summary[summary.epoch_id == 1].iloc[0]
    assert s1.source_offset_min == ep1_src.lsn.min()
    assert s1.source_offset_max == ep1_src.lsn.max()
    ck = part_stats_pipeline.checkpoint.read(spark).toPandas()
    c1 = ck[ck.epoch_id == 1].iloc[0]
    assert c1.source_min_lsn == ep1_src.lsn.min()
    assert c1.source_max_lsn == ep1_src.lsn.max()
    # manifest entries themselves carry the stats (pruning metadata)
    assert any("stats" in e for e in snap.files)


def _write_tiny(path, lo, hi):
    pq.write_table(
        pa.table({"lsn": pa.array(list(range(lo, hi + 1)), type=pa.int64())}), path
    )


def test_stats_driver_and_executor_paths_agree(spark, tmp_path, monkeypatch):
    paths = []
    for i in range(6):
        p = str(tmp_path / f"f{i}.parquet")
        _write_tiny(p, i * 10, i * 10 + 4)
        paths.append(p)
    driver = _collect_parquet_stats(spark, paths, ("lsn",))
    monkeypatch.setattr(table_mod, "EXECUTOR_STATS_THRESHOLD", 2)
    executor = _collect_parquet_stats(spark, paths, ("lsn",))
    assert driver == executor
    for i, p in enumerate(paths):
        rows, stats, blooms = driver[p]
        assert rows == 5
        assert stats["lsn"] == [i * 10, i * 10 + 4]
        assert blooms == {}


def test_stats_missing_column_ok(spark, tmp_path):
    p = str(tmp_path / "f.parquet")
    _write_tiny(p, 0, 3)
    rows, stats, blooms = _collect_parquet_stats(spark, [p], ("not_there",))[p]
    assert rows == 4 and stats == {} and blooms == {}
