"""Oracle-gated scan queries for the non-parquet sources (SURVEY §2 A2/A3).

Both queries read deterministic control files (generated at import, pure
function of row index — see ../sources.py) so the DuckDB oracle can scan
the identical bytes from the same fixed path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources import (
    CSV_PATH,
    CSV_PINNED_SCHEMA,
    JSON_PATH,
    JSON_PINNED_SCHEMA,
    N_VCF_META_LINES,
    VCF_PATH,
    ensure_control_files,
    read_csv_options,
    read_json_pinned,
    read_vcf,
)
from .registry import query

ensure_control_files()

_JSON_ORACLE = f"""
SELECT rec_id, name, grp,
       meta.score AS score, meta.tag AS tag,
       CAST(NULL AS VARCHAR) AS missing_col
FROM read_json('{JSON_PATH}', format='newline_delimited',
               columns={{rec_id: 'BIGINT', name: 'VARCHAR', grp: 'BIGINT',
                        meta: 'STRUCT(score BIGINT, tag VARCHAR)'}})
WHERE grp <> 3
"""


@query("scan_json_pinned", oracle=_JSON_ORACLE, survey="A2,B1,B2")
def scan_json_pinned(spark, sf_dir):
    """Pinned-schema JSON scan: schema declared in code (incl. a column the
    file doesn't carry -> null), nested struct projection, filter."""
    ensure_control_files()
    df = read_json_pinned(spark, JSON_PATH, JSON_PINNED_SCHEMA)
    return df.where(F.col("grp") != 3).select(
        "rec_id",
        "name",
        "grp",
        F.col("meta.score").alias("score"),
        F.col("meta.tag").alias("tag"),
        "missing_col",
    )


_CSV_ORACLE = f"""
SELECT id, label,
       CAST(round(amount * 100) AS BIGINT) AS amount_cents
FROM read_csv('{CSV_PATH}', delim='|', header=true,
              columns={{id: 'BIGINT', label: 'VARCHAR', amount: 'DOUBLE'}})
WHERE id % 2 = 0
"""


@query("scan_csv_options", oracle=_CSV_ORACLE, survey="A3,B7,H-math",
    gate=False,  # rotated out r5: driver rows green r1-r4; codes stay gate-covered
)
def scan_csv_options(spark, sf_dir):
    """CSV scan with reader options (pipe separator + header) and a pinned
    schema; money rendered as exact integer cents."""
    ensure_control_files()
    df = read_csv_options(spark, CSV_PATH, CSV_PINNED_SCHEMA, sep="|", header=True)
    return df.where(F.col("id") % 2 == 0).select(
        "id",
        "label",
        F.round(F.col("amount") * 100).cast("long").alias("amount_cents"),
    )


_VCF_ORACLE = f"""
SELECT chrom, pos, vid, ref, alt, qual, filt,
       CAST(regexp_extract(info, 'DP=([0-9]+)', 1) AS BIGINT) AS dp,
       CAST(regexp_extract(info, 'AF=([0-9.]+)', 1) AS DOUBLE) AS af
FROM read_csv('{VCF_PATH}', delim='\t', skip={N_VCF_META_LINES + 1}, header=false,
              columns={{chrom: 'VARCHAR', pos: 'BIGINT', vid: 'VARCHAR',
                       ref: 'VARCHAR', alt: 'VARCHAR', qual: 'DOUBLE',
                       filt: 'VARCHAR', info: 'VARCHAR'}})
WHERE filt = 'PASS' AND CAST(regexp_extract(info, 'DP=([0-9]+)', 1) AS BIGINT) >= 30
"""


@query("scan_vcf_info", oracle=_VCF_ORACLE, survey="A1,A3,B2,B7,H-map")
def scan_vcf_info(spark, sf_dir):
    """VCF scan (SURVEY §2 A1): ##-preamble skipped via the comment option,
    pinned 8-column schema, semicolon INFO parsed to a map and extracted to
    typed columns (DP long, AF double — dyadic text, bit-identical parses),
    filtered on FILTER + depth.  gate=False: A1's scan shape is evidenced by
    the gated A2/A3 scans; this query makes the VCF contract itself
    first-class under the identical hash-match suite."""
    ensure_control_files()
    df = read_vcf(spark, VCF_PATH)
    dp = F.element_at("info_map", F.lit("DP")).cast("long")
    return (
        df.where((F.col("filt") == "PASS") & (dp >= 30))
        .select(
            "chrom",
            "pos",
            "vid",
            "ref",
            "alt",
            "qual",
            "filt",
            dp.alias("dp"),
            F.element_at("info_map", F.lit("AF")).cast("double").alias("af"),
        )
    )
