"""Matview × streaming composition (VERDICT r4 task #6): the
MaterializedAggregate refreshes inside the streaming loop's after_batch
hook, per epoch, composed with the mor auto-fold — and a crash BETWEEN the
apply-commit and the refresh is healed by the MV's source-snapshot cursor
on redelivery (the epoch gate skips the re-apply; the re-run hook folds the
missed window).

Full flow: mock binlog stream → mor apply → auto_fold → mv.refresh(), all
per micro-batch; after every stage the MV equals a full recompute over
read_state().
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from clin_variant_etl_spark.engine import (
    AggSpec,
    CdcPipeline,
    MaterializedAggregate,
    create_cdc_table,
)
from clin_variant_etl_spark.lake.maintenance import auto_fold, fold_candidates
from clin_variant_etl_spark.schemas import BASE_DOCS_SCHEMA, INTERNAL_LAST_LSN
from clin_variant_etl_spark.streaming import mock_source
from clin_variant_etl_spark.streaming.stream import StreamingCdc

N_DOCS = 100
AGGS = {"n_docs": AggSpec("count"), "total_tok": AggSpec("sum", "n_tok")}


def _recompute(pipe) -> pd.DataFrame:
    return (
        pipe.read_state()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("total_tok"))
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )


def _mv_frame(mv) -> pd.DataFrame:
    return (
        mv.read()
        .select("source", "n_docs", "total_tok")
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )


def _run(spark, pipe, ckpt, total, hook):
    def src(s):
        return (
            s.readStream.format("mock_binlog")
            .option("total", str(total))
            .option("overlap", "48")
            .option("n_docs", str(N_DOCS))
            .load()
        )

    StreamingCdc(spark, pipe, checkpoint_dir=ckpt, source=src, after_batch=hook).run_available()


def test_stream_refresh_per_epoch_with_autofold_and_crash_heal(spark, tmp_path):
    mock_source.register(spark)
    tdir, ckpt = str(tmp_path / "t"), str(tmp_path / "ck")
    create_cdc_table(tdir, BASE_DOCS_SCHEMA, n_buckets=4)
    pipe = CdcPipeline(spark, tdir, apply_mode="mor")
    mv = MaterializedAggregate(pipe, str(tmp_path / "mv"), ["source"], AGGS, n_buckets=4)

    crash_at = {"epoch": None}

    def hook(pipeline, epoch_id, res):
        auto_fold(spark, pipeline.table, ("doc_id", INTERNAL_LAST_LSN))
        if crash_at["epoch"] == epoch_id:
            crash_at["epoch"] = None  # next delivery proceeds
            raise RuntimeError("injected crash before mv refresh")
        mv.refresh()

    # epoch 0: normal — refresh rides the micro-batch
    _run(spark, pipe, ckpt, 400, hook)
    assert pipe.last_epoch_id() == 0
    pd.testing.assert_frame_equal(_mv_frame(mv), _recompute(pipe), check_dtype=False)

    # epoch 1: crash AFTER the table commit, BEFORE the refresh — the
    # streaming checkpoint has not advanced, so the batch redelivers
    crash_at["epoch"] = 1
    with pytest.raises(Exception, match="injected crash"):
        _run(spark, pipe, ckpt, 800, hook)
    assert pipe.last_epoch_id() == 1  # table committed
    # the MV is BEHIND (cursor still at epoch 0's source snapshot) — that
    # is the torn state the cursor exists for
    assert not _mv_frame(mv).equals(_recompute(pipe))

    # restart from the same checkpoint: the epoch gate skips the re-apply,
    # the re-run hook folds the missed window — healed
    _run(spark, pipe, ckpt, 800, hook)
    assert pipe.last_epoch_id() == 1
    pd.testing.assert_frame_equal(_mv_frame(mv), _recompute(pipe), check_dtype=False)

    # epoch 2: normal again; then verify the fold composed in throughout
    _run(spark, pipe, ckpt, 1200, hook)
    pd.testing.assert_frame_equal(_mv_frame(mv), _recompute(pipe), check_dtype=False)
    assert fold_candidates(pipe.table.current_snapshot()) == []  # auto-fold kept up

    # a manual re-refresh after everything is a no-op (cursor-gated)
    before = _mv_frame(mv)
    mv.refresh()
    pd.testing.assert_frame_equal(_mv_frame(mv), before, check_dtype=False)
