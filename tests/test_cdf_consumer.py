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


def _last_versions(pdf: pd.DataFrame) -> dict:
    ev = pdf.drop_duplicates(subset=["lsn"]).sort_values("lsn", kind="stable")
    last = ev.groupby("doc_id", as_index=False, sort=False).tail(1)
    return {
        r["doc_id"]: (int(r["lsn"]), "delete" if r["op"] == "D" else "upsert")
        for _, r in last.iterrows()
    }


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
