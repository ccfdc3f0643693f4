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

from pyspark.sql import DataFrame, SparkSession, types as T

AUX_DIR = "/tmp/spark_graft_aux"
JSON_PATH = os.path.join(AUX_DIR, "control.jsonl")
CSV_PATH = os.path.join(AUX_DIR, "control.csv")
N_JSON_ROWS = 50
N_CSV_ROWS = 40

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
