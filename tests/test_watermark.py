"""Watermark semantics over 3 micro-batches (file-log source, append mode):

batch 1: events in hour-0 and hour-1 windows, head at 02:10
         → watermark after batch = 01:40 → hour-0 window (ends 01:00)
           finalizes and is emitted on the next trigger
batch 2: late event at 00:30 (BEYOND the 01:40 watermark → dropped),
         late event at 01:45 (inside allowance, hour-1 window still open
         → counted), head at 03:30 → watermark 03:00 → hour-1 finalizes
batch 3: dummy head at 05:00 → hour-1 window emitted

Final sink: hour-0 WITHOUT the too-late row, hour-1 WITH the in-allowance
late row — the two halves of the late-data contract."""

import os

from datetime import datetime

from pyspark.sql import types as T

from clin_variant_etl_spark.streaming.windows import windowed_event_counts

SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("event_ts", T.TimestampType()),
    ]
)


def _write(spark, path, rows):
    spark.createDataFrame(
        [(lsn, datetime.fromisoformat(ts)) for lsn, ts in rows], SCHEMA
    ).coalesce(1).write.mode("append").parquet(path)


def test_watermark_late_data_contract(spark, tmp_path):
    src = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    _write(spark, src, [
        (1, "2024-01-01T00:10:00"),
        (2, "2024-01-01T00:20:00"),
        (3, "2024-01-01T01:05:00"),
        (4, "2024-01-01T02:10:00"),  # head → watermark 01:40
    ])

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        windowed_event_counts(stream, window="1 hour", watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("win_sink")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        _write(spark, src, [
            (5, "2024-01-01T00:30:00"),  # beyond watermark → dropped
            (6, "2024-01-01T01:45:00"),  # within allowance → counted
            (7, "2024-01-01T03:30:00"),  # head → watermark 03:00
        ])
        q.processAllAvailable()
        _write(spark, src, [(8, "2024-01-01T05:00:00")])
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r["window_start"].isoformat(): (r["n"], r["min_lsn"], r["max_lsn"])
        for r in spark.sql("SELECT * FROM win_sink").collect()
    }
    # hour-0: lsns 1,2 only — the 00:30 row arrived beyond the watermark
    assert got["2024-01-01T00:00:00"] == (2, 1, 2)
    # hour-1: lsn 3 plus the in-allowance late lsn 6
    assert got["2024-01-01T01:00:00"] == (2, 3, 6)
