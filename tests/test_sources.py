"""File-format sources/sinks: pinned-schema JSON, CSV with options,
single-file CSV sink, VCF scan, ES _bulk sink (SURVEY §2 A1/A2/A3/A8/A9)."""

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
    read_vcf,
    write_es_bulk,
    write_single_csv,
)
from clin_variant_etl_spark.sources import N_VCF_ROWS, VCF_PATH


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


def test_read_vcf_contract(spark):
    """##-preamble and #CHROM header skipped, 8 fixed columns typed, INFO
    parsed to a map with typed extraction."""
    ensure_control_files()
    df = read_vcf(spark, VCF_PATH)
    assert df.count() == N_VCF_ROWS
    r = df.where(F.col("vid") == "rs100001").first()  # i=1
    assert r["chrom"] == "chr2" and r["pos"] == 10_137
    assert r["ref"] == "C" and r["alt"] == "T"  # bases[(1 + 1 + 1 % 3) % 4]
    assert r["filt"] == "PASS"
    assert r["info_map"]["DP"] == "3"
    assert float(r["info_map"]["AF"]) == 1 / 64
    # REF never equals ALT anywhere (generator invariant the parser preserves)
    assert df.where(F.col("ref") == F.col("alt")).count() == 0


def test_write_es_bulk_protocol(spark, tmp_path):
    """Every row renders as an action+source NDJSON pair; ids escape
    correctly; redelivery (same _id) is idempotent by construction."""
    import json

    df = spark.createDataFrame(
        [(1, 'plain', 7), (2, 'quote " inside', 9)], "doc_id long, txt string, n long"
    )
    out = str(tmp_path / "bulk")
    write_es_bulk(df, out, index="docs-v1", id_col="doc_id")
    lines = []
    for f in sorted(os.listdir(out)):
        if f.startswith("part-"):
            with open(os.path.join(out, f)) as fh:
                lines += [ln for ln in fh.read().splitlines() if ln]
    assert len(lines) == 4  # 2 rows x (action + source)
    pairs = [(json.loads(lines[i]), json.loads(lines[i + 1])) for i in (0, 2)]
    by_id = {a["index"]["_id"]: d for a, d in pairs}
    assert all(a["index"]["_index"] == "docs-v1" for a, _ in pairs)
    assert by_id["2"]["txt"] == 'quote " inside'  # to_json escaping survived
    assert by_id["1"] == {"doc_id": 1, "txt": "plain", "n": 7}


def test_write_es_bulk_null_id_fails_loudly(spark, tmp_path):
    """A null id would make ES mint a fresh _id per redelivery (silent
    duplication) — the sink must fail the job instead."""
    import pytest

    df = spark.createDataFrame([(None, "x")], "doc_id long, txt string")
    with pytest.raises(Exception, match="null doc_id"):
        write_es_bulk(df, str(tmp_path / "bulk"), index="docs", id_col="doc_id")


def test_write_es_bulk_delete_actions(spark, tmp_path):
    """op_col rows marked delete render as one-line delete actions (no
    source line) and everything else keeps the two-line index unit."""
    import glob
    import json

    df = spark.createDataFrame(
        [(1, "keep", "upsert"), (2, "gone", "delete")],
        "doc_id long, txt string, _change_type string",
    )
    out = str(tmp_path / "bulk_del")
    write_es_bulk(df, out, index="docs", id_col="doc_id", op_col="_change_type")
    lines = []
    for p in sorted(glob.glob(f"{out}/part-*")):
        lines += [json.loads(l) for l in open(p).read().splitlines() if l]
    deletes = [l for l in lines if "delete" in l]
    assert len(deletes) == 1 and deletes[0]["delete"]["_id"] == "2"
    idx = next(i for i, l in enumerate(lines) if "index" in l)
    assert lines[idx]["index"]["_id"] == "1"
    src = lines[idx + 1]
    assert src == {"doc_id": 1, "txt": "keep"}  # op_col excluded from source
