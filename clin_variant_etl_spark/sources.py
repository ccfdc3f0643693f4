"""File-format sources & sinks beyond the lake: pinned-schema JSON, CSV with
options, single-file CSV sink.

Reference analogues:
- JSON with a pinned (resource-declared) schema — FHIR resources are read
  with an explicit JSON-serialized StructType to avoid inference drift:
  etl/fhir/FhirToNormalizedETL.scala:22-33, etl/normalized/Franklin.scala:29,47-48.
- CSV/TSV with per-dataset reader options (header, separator):
  etl/normalized/Exomiser.scala:32-36, etl/conf/EtlConfiguration.scala:56-57.
- Single-file CSV sink (coalesce-to-1 + rename, for downstream tools that
  want exactly one file): etl/nextflow/PrepareSVClusteringParentalOrigin.scala:51-61.

The control files used by the oracle-gated scan queries are generated
deterministically (pure function of row index — no external data, identical
bytes every run) at import time, so the DuckDB oracle can read the same
fixed paths.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

AUX_DIR = "/tmp/spark_graft_aux"
JSON_PATH = os.path.join(AUX_DIR, "control.jsonl")
CSV_PATH = os.path.join(AUX_DIR, "control.csv")
VCF_PATH = os.path.join(AUX_DIR, "control.vcf")
N_JSON_ROWS = 50
N_CSV_ROWS = 40
N_VCF_ROWS = 60
N_VCF_META_LINES = 3  # ## header lines before #CHROM (oracle skip count)

# pinned schema: declared in code, never inferred; ``missing_col`` is absent
# from the file on purpose (pinned-schema contract: absent -> null, not drift)
JSON_PINNED_SCHEMA = T.StructType(
    [
        T.StructField("rec_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("grp", T.LongType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("score", T.LongType()),
                    T.StructField("tag", T.StringType()),
                ]
            ),
        ),
        T.StructField("missing_col", T.StringType()),
    ]
)

CSV_PINNED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("label", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def ensure_control_files() -> None:
    """Idempotently (re)write the deterministic control files."""
    os.makedirs(AUX_DIR, exist_ok=True)
    rows = [
        {
            "rec_id": i,
            "name": f"rec_{i:03d}",
            "grp": i % 4,
            "meta": {"score": (i * 7) % 13, "tag": f"t{i % 3}"},
        }
        for i in range(N_JSON_ROWS)
    ]
    payload = "\n".join(json.dumps(r, sort_keys=True) for r in rows) + "\n"
    _write_if_changed(JSON_PATH, payload)

    lines = ["id|label|amount"]
    for i in range(N_CSV_ROWS):
        lines.append(f"{i}|item_{i % 7}|{(i * 37) % 1000}.{(i * 13) % 100:02d}")
    _write_if_changed(CSV_PATH, "\n".join(lines) + "\n")

    # VCF 4.2 fixed columns, ##-meta preamble, deterministic rows.  QUAL and
    # AF are dyadic fractions rendered with enough digits to round-trip
    # exactly, so double parses are bit-identical across engines.
    bases = "ACGT"
    vcf = [
        "##fileformat=VCFv4.2",
        '##INFO=<ID=DP,Number=1,Type=Integer,Description="Read depth">',
        '##INFO=<ID=AF,Number=1,Type=Float,Description="Allele frequency">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
    ]
    assert len(vcf) - 1 == N_VCF_META_LINES
    for i in range(N_VCF_ROWS):
        ref = bases[i % 4]
        alt = bases[(i + 1 + i % 3) % 4]
        qual = (i % 64) + (i % 16) / 16
        af = (i % 64) / 64
        vcf.append(
            f"chr{(i % 22) + 1}\t{10_000 + i * 137}\trs{100_000 + i}\t{ref}\t{alt}"
            f"\t{qual:.4f}\t{'PASS' if i % 5 else 'q10'}\tDP={(i * 3) % 200};AF={af:.6f}"
        )
    _write_if_changed(VCF_PATH, "\n".join(vcf) + "\n")


def _write_if_changed(path: str, content: str) -> None:
    if os.path.exists(path):
        with open(path) as fh:
            if fh.read() == content:
                return
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(content)
    os.replace(tmp, path)


def read_json_pinned(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON scan with a code-declared schema (never inferSchema — the
    reference's drift-protection rule, Franklin.scala:47-48)."""
    return spark.read.schema(schema).json(path)


VCF_FIXED_SCHEMA = T.StructType(
    [
        T.StructField("chrom", T.StringType()),
        T.StructField("pos", T.LongType()),
        T.StructField("vid", T.StringType()),
        T.StructField("ref", T.StringType()),
        T.StructField("alt", T.StringType()),
        T.StructField("qual", T.DoubleType()),
        T.StructField("filt", T.StringType()),
        T.StructField("info", T.StringType()),
    ]
)


def read_vcf(spark: SparkSession, path: str) -> DataFrame:
    """VCF scan, pure Spark (SURVEY §2 A1; the reference reads VCF via the
    Glow datasource, etl/vcf — here the same fixed-column contract is read
    with the built-in CSV source so predicate pushdown and column pruning
    apply):

    - ``##`` meta lines and the ``#CHROM`` header are skipped via the
      ``comment`` reader option (VCF comments are exactly '#'-prefixed);
    - the 8 fixed columns are read under a PINNED schema (never inferred);
    - the semicolon-delimited INFO column is exposed both raw (``info``)
      and parsed to a map (``info_map``) for typed key extraction.

    Multi-sample FORMAT columns are out of scope for the token-domain
    engine — the reference's own normalization also reduces to per-variant
    rows before any downstream query (etl/normalized/SNV.scala).
    """
    df = (
        spark.read.schema(VCF_FIXED_SCHEMA)
        .option("sep", "\t")
        .option("comment", "#")
        .option("header", "false")
        .csv(path)
    )
    return df.withColumn(
        "info_map", F.str_to_map(F.col("info"), F.lit(";"), F.lit("="))
    )


def read_csv_options(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = "|",
    header: bool = True,
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("header", str(header).lower())
        .csv(path)
    )


def write_es_bulk(
    df: DataFrame,
    target_dir: str,
    index: str,
    id_col: str,
    doc_cols: list[str] | None = None,
    op_col: str | None = None,
    delete_value: str = "delete",
) -> None:
    """Elasticsearch ``_bulk``-protocol sink (SURVEY §2 A9; reference:
    PublishToElasticsearch / the es-spark sink in etl/es).

    Each row renders as the two-line NDJSON bulk unit —
    ``{"index":{"_index":…,"_id":<key>}}`` followed by the document source —
    one file per partition, so a downstream shipper POSTs each part file to
    ``/_bulk`` verbatim (the es-hadoop connector does exactly this per
    partition).  Using ``index`` actions with an explicit ``_id`` makes
    redelivery idempotent (upsert by id): the engine's at-least-once
    delivery carries through to the search tier unchanged.

    The reference's release pattern — write index ``<name>-<version>`` then
    swap the alias — composes with ``LakeTable.publish``: bulk-load into a
    snapshot-suffixed index, then move the alias after QC, so readers never
    see a half-loaded index.

    ``op_col``: name of a column distinguishing deletes — rows whose value
    equals ``delete_value`` render as a one-line ``{"delete":{…}}`` action
    (no source line; by-id deletes are idempotent under redelivery like the
    index actions), everything else as the two-line index unit.  This is
    the CDC→search-index contract: feed ``CdcPipeline.read_changes`` /
    ``CdfConsumer`` output straight in with ``op_col="_change_type"`` and
    the bulk stream carries upserts AND deletions of the window.

    Both JSON lines are built with ``to_json`` (never string concat), so
    ids and values are escaped correctly.
    """
    cols = doc_cols or [c for c in df.columns if c != op_col]
    # a NULL id would render an id-less action line and ES would mint a
    # fresh _id per delivery — exactly the duplication the explicit-_id
    # contract exists to prevent; fail the job instead of shipping it
    checked_id = F.when(
        F.col(id_col).isNull(),
        F.assert_true(F.col(id_col).isNotNull(), f"write_es_bulk: null {id_col}").cast(
            "string"
        ),
    ).otherwise(F.col(id_col).cast("string"))
    target = F.struct(
        F.lit(index).alias("_index"),
        checked_id.alias("_id"),
    )
    index_action = F.to_json(F.struct(target.alias("index")))
    doc = F.to_json(F.struct(*[F.col(c) for c in cols]))
    unit = F.concat_ws("\n", index_action, doc)
    if op_col is not None:
        delete_action = F.to_json(F.struct(target.alias("delete")))
        unit = F.when(F.col(op_col) == delete_value, delete_action).otherwise(unit)
    df.select(unit.alias("value")).write.mode("overwrite").text(target_dir)


def write_single_csv(
    df: DataFrame, target_path: str, sep: str = ",", header: bool = True
) -> str:
    """Write df as EXACTLY one CSV file at ``target_path``.

    coalesce(1) funnels the (small, by contract) frame through one task;
    Spark still writes a directory, so the lone part file is renamed onto
    the target (reference: CsvUtils.renameCsvFile, PrepareSVClusteringParentalOrigin.scala:51-61).
    Only for driver-manifest-sized outputs — never a data path at scale.
    """
    staging = target_path + "._staging"
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("sep", sep)
        .option("header", str(header).lower())
        .csv(staging)
    )
    part = next(
        f for f in os.listdir(staging) if f.startswith("part-") and f.endswith(".csv")
    )
    os.replace(os.path.join(staging, part), target_path)
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    return target_path
