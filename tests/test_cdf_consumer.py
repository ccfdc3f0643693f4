"""CdfConsumer: crash-safe cursor semantics over read_changes.

Oracle: the pandas per-key last-version map — the union of all drained
batches applied in order must equal the full-history feed, across normal
drains, a crash-before-advance redelivery, and an idle (no new commits)
drain."""

import pandas as pd
import pytest

from clin_variant_etl_spark.engine import CdcPipeline, CdfConsumer, create_cdc_table
from clin_variant_etl_spark.schemas import BASE_DOCS_SCHEMA
from clin_variant_etl_spark.testgen import (
    EventGenConfig,
    generate_change_events,
    write_events_by_epoch,
)


from tests.feed_oracle import last_versions as _last_versions


def test_consumer_drain_redeliver_idle(spark, tmp_path):
    cfg = EventGenConfig(n_docs=80, n_events=900, n_epochs=3, seed=29)
    tbl = generate_change_events(cfg)
    src = str(tmp_path / "events")
    write_events_by_epoch(tbl, src)
    create_cdc_table(str(tmp_path / "docs"), BASE_DOCS_SCHEMA, n_buckets=4)
    pipe = CdcPipeline(spark, str(tmp_path / "docs"), apply_mode="mor")
    consumer = CdfConsumer(pipe, str(tmp_path / "cursor.json"))

    seen: dict = {}

    def apply_batch(feed):
        for r in feed.select("doc_id", "_last_lsn", "_change_type").collect():
            seen[r["doc_id"]] = (r["_last_lsn"], r["_change_type"])

    # epoch 0: first drain from a fresh cursor (full history)
    pipe.apply_epoch(spark.read.parquet(f"{src}/epoch=0"), epoch_id=0)
    s = consumer.drain(apply_batch)
    assert s["handled"] and s["from"] is None

    # epoch 1: handler CRASHES before the cursor advances → redelivery of
    # the identical batch on the next drain (at-least-once), and the
    # idempotent keyed apply converges to the same state
    pipe.apply_epoch(spark.read.parquet(f"{src}/epoch=1"), epoch_id=1)
    cursor_before = consumer.cursor()
    with pytest.raises(RuntimeError, match="boom"):
        def crashing(feed):
            apply_batch(feed)
            raise RuntimeError("boom")
        consumer.drain(crashing)
    assert consumer.cursor() == cursor_before  # did not advance
    s = consumer.drain(apply_batch)  # redelivers, then advances
    assert s["handled"] and s["from"] == cursor_before

    # idle drain: no new commits → handler not called
    s = consumer.drain(apply_batch)
    assert not s["handled"]

    # epoch 2, normal drain; final state equals the event-log oracle
    pipe.apply_epoch(spark.read.parquet(f"{src}/epoch=2"), epoch_id=2)
    assert consumer.drain(apply_batch)["handled"]
    assert seen == _last_versions(tbl.to_pandas())

    # a NEW consumer instance resumes from the durable cursor, sees nothing
    seen2: dict = {}
    resumed = CdfConsumer(pipe, str(tmp_path / "cursor.json"))
    assert not resumed.drain(lambda f: seen2.update({1: 1}))["handled"]
    assert seen2 == {}


def test_consumer_expired_cursor_resync(spark, tmp_path):
    """expire_snapshots deleting the cursor's snapshot must not wedge the
    consumer: default policy re-delivers the full current state once;
    'raise' surfaces a LookupError for strict consumers."""
    from clin_variant_etl_spark.lake.maintenance import expire_snapshots

    cfg = EventGenConfig(n_docs=40, n_events=400, n_epochs=4, seed=41)
    tbl = generate_change_events(cfg)
    src = str(tmp_path / "events")
    write_events_by_epoch(tbl, src)
    create_cdc_table(str(tmp_path / "docs"), BASE_DOCS_SCHEMA, n_buckets=2)
    pipe = CdcPipeline(spark, str(tmp_path / "docs"))
    consumer = CdfConsumer(pipe, str(tmp_path / "cursor.json"))

    pipe.apply_epoch(spark.read.parquet(f"{src}/epoch=0"), epoch_id=0)
    consumer.drain(lambda f: f.count())
    for ep in (1, 2, 3):
        pipe.apply_epoch(spark.read.parquet(f"{src}/epoch={ep}"), epoch_id=ep)
    expire_snapshots(pipe.table, keep_last=2)  # cursor's snapshot now gone

    with pytest.raises(LookupError, match="expired"):
        consumer.drain(lambda f: f.count(), on_expired_cursor="raise")

    seen: dict = {}
    s = consumer.drain(
        lambda f: seen.update(
            {r["doc_id"]: (r["_last_lsn"], r["_change_type"]) for r in f.collect()}
        )
    )
    assert s["handled"] and s.get("resynced") and s["from"] is None
    assert seen == _last_versions(tbl.to_pandas())
    # next drain is a normal incremental no-op
    assert not consumer.drain(lambda f: f.count())["handled"]


def test_consumer_require_materialized_guards_lazy_handler(spark, tmp_path):
    """A handler that defers its action past drain() would mark the batch
    handled without the feed's plan ever running; require_materialized=True
    executes the plan (one count) before the cursor advances, so a
    plan-level failure — here a data file missing under the feed — aborts
    the drain, the cursor stays put, and the batch is REDELIVERED."""
    import os
    import shutil

    cfg = EventGenConfig(n_docs=40, n_events=300, n_epochs=2, seed=31)
    tbl = generate_change_events(cfg)
    src = str(tmp_path / "events")
    write_events_by_epoch(tbl, src)
    create_cdc_table(str(tmp_path / "docs"), BASE_DOCS_SCHEMA, n_buckets=2)
    pipe = CdcPipeline(spark, str(tmp_path / "docs"))
    consumer = CdfConsumer(pipe, str(tmp_path / "cursor.json"))
    pipe.apply_epoch(spark.read.parquet(f"{src}/epoch=0"), epoch_id=0)

    # break the feed's plan at EXECUTION time: hide a committed data file
    snap = pipe.table.current_snapshot()
    victim = os.path.join(pipe.table.path, snap.files[0]["path"])
    shutil.move(victim, victim + ".hidden")
    lazy = lambda f: None  # defers everything — the footgun
    with pytest.raises(Exception):
        consumer.drain(lazy, require_materialized=True)
    assert consumer.cursor() is None  # not advanced: batch will redeliver

    # restore; the SAME batch redelivers and the guard reports its rows
    shutil.move(victim + ".hidden", victim)
    s = consumer.drain(lazy, require_materialized=True)
    assert s["handled"] and s["rows"] > 0
    assert consumer.cursor() == s["to"]
    # foreachBatch-matching default is unchanged: lazy handler, no guard
    pipe.apply_epoch(spark.read.parquet(f"{src}/epoch=1"), epoch_id=1)
    s2 = consumer.drain(lazy)
    assert s2["handled"] and "rows" not in s2
    assert consumer.cursor() == s2["to"]
