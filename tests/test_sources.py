"""File-format sources/sinks: pinned-schema JSON, CSV with options,
single-file CSV sink (SURVEY §2 A2/A3/A8)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from clin_variant_etl_spark.sources import (
    CSV_PATH,
    CSV_PINNED_SCHEMA,
    JSON_PATH,
    JSON_PINNED_SCHEMA,
    ensure_control_files,
    read_csv_options,
    read_json_pinned,
    write_single_csv,
)


def test_json_pinned_schema_no_drift(spark):
    ensure_control_files()
    df = read_json_pinned(spark, JSON_PATH, JSON_PINNED_SCHEMA)
    # pinned column absent from the file reads as null, not schema drift
    assert df.schema == JSON_PINNED_SCHEMA
    assert df.where(F.col("missing_col").isNotNull()).count() == 0
    assert df.count() == 50
    assert df.select("meta.score").where(F.col("score") >= 13).count() == 0


def test_csv_options_roundtrip(spark):
    ensure_control_files()
    df = read_csv_options(spark, CSV_PATH, CSV_PINNED_SCHEMA, sep="|", header=True)
    assert df.count() == 40
    first = df.orderBy("id").first()
    assert first["id"] == 0 and first["label"] == "item_0"


def test_write_single_csv(spark, tmp_path):
    ensure_control_files()
    df = read_csv_options(spark, CSV_PATH, CSV_PINNED_SCHEMA, sep="|", header=True)
    target = str(tmp_path / "out.csv")
    write_single_csv(df.orderBy("id"), target, sep=",", header=True)
    assert os.path.isfile(target)
    with open(target) as fh:
        lines = fh.read().strip().splitlines()
    assert lines[0] == "id,label,amount"
    assert len(lines) == 41
    # round-trip: Spark reads its own single file back identically
    back = (
        spark.read.schema(CSV_PINNED_SCHEMA)
        .option("header", "true")
        .csv(target)
    )
    assert back.count() == 40
    assert back.agg(F.sum("id")).first()[0] == sum(range(40))
