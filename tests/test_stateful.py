"""applyInPandasWithState dedup: per-key LSN watermark survives across
micro-batches; duplicates/stale events absorbed stream-side."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F, types as T

from clin_variant_etl_spark.streaming.stateful import dedup_stream

EV_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("payload", T.StringType()),
    ]
)


def _write_batch(d, name, rows):
    tbl = pa.table(
        {
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "doc_id": pa.array([r[1] for r in rows]),
            "payload": pa.array([r[2] for r in rows]),
        }
    )
    p = os.path.join(d, name)
    pq.write_table(tbl, p)
    # the file stream source orders batches by modification time; writes
    # landing in the same mtime tick would make batch order racy — force a
    # strictly increasing mtime from the file name's batch number
    import time

    seq = int("".join(c for c in name if c.isdigit()) or 0)
    t = time.time() + seq * 10
    os.utime(p, (t, t))


def _drain(spark, src, ckpt, out_table):
    q = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(src)
        .transform(dedup_stream)
        .writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stateful_dedup_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 1: d1 gets lsn 1 then 3 (same batch → only 3 survives); d2 lsn 2
    _write_batch(src, "b1.parquet", [(1, "d1", "a"), (3, "d1", "b"), (2, "d2", "c")])
    # batch 2: d1 stale (2) and dup (3) → nothing; d2 advances to 5
    _write_batch(src, "b2.parquet", [(2, "d1", "x"), (3, "d1", "b"), (5, "d2", "d")])
    # batch 3: d1 advances to 9; new key d3
    _write_batch(src, "b3.parquet", [(9, "d1", "z"), (4, "d3", "e")])

    _drain(spark, src, str(tmp_path / "ck"), "survivors")
    got = {
        (r["doc_id"], r["lsn"]): r["payload"]
        for r in spark.table("survivors").collect()
    }
    assert got == {
        ("d1", 3): "b",
        ("d2", 2): "c",
        ("d2", 5): "d",
        ("d1", 9): "z",
        ("d3", 4): "e",
    }


def test_stateful_dedup_resume_from_checkpoint(spark, tmp_path):
    """The memory sink can't recover a checkpoint — use the (fault-tolerant)
    file sink to prove the state store restores across restarts."""
    src, out, ck = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(src)

    def drain():
        q = (
            spark.readStream.schema(EV_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .transform(dedup_stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write_batch(src, "b1.parquet", [(7, "k", "v7")])
    drain()
    assert spark.read.schema(EV_SCHEMA).parquet(out).count() == 1
    # restart: a stale event must still be suppressed by restored state
    _write_batch(src, "b2.parquet", [(6, "k", "v6"), (8, "k", "v8")])
    drain()
    rows = {
        (r["doc_id"], r["lsn"]) for r in spark.read.schema(EV_SCHEMA).parquet(out).collect()
    }
    assert rows == {("k", 7), ("k", 8)}


def test_stateful_dedup_state_ttl_expiry(spark, tmp_path):
    """With ttl_ms set on a CONTINUOUS tail, an idle key's watermark cell is
    expired; a later event for that key is re-emitted (state lost) — the
    documented contract: the TABLE-side LSN guard, not the stream state, is
    the invariant.  (availableNow drains must not set ttl_ms — Spark keeps
    scheduling no-data batches for future timers and never terminates.)"""
    import time
    from functools import partial

    src, out, ck = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(src)

    def rows_now():
        try:
            return {
                (r["doc_id"], r["lsn"])
                for r in spark.read.schema(EV_SCHEMA).parquet(out).collect()
            }
        except Exception:
            return set()

    def wait_for(want, deadline_s=90):
        t0 = time.time()
        while time.time() - t0 < deadline_s:
            if want <= rows_now():
                return
            time.sleep(0.3)
        raise AssertionError(f"timed out waiting for {want}; have {rows_now()}")

    _write_batch(src, "b1.parquet", [(7, "k", "v7")])
    q = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .transform(partial(dedup_stream, ttl_ms=500))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        wait_for({("k", 7)})
        time.sleep(1.2)  # k's TTL deadline passes; a no-data batch expires it
        # stale event for k is re-emitted because the watermark cell is gone
        _write_batch(src, "b2.parquet", [(6, "k", "v6")])
        wait_for({("k", 7), ("k", 6)})
    finally:
        q.stop()
    assert rows_now() == {("k", 7), ("k", 6)}
