"""Nested frequency cascade — the reference's 3-stage re-aggregation shape.

Mirrors ``etl/normalized/Variants.scala:183-258`` + ``etl/utils/
FrequencyUtils.scala:40-69``: partial frequency counts are aggregated at the
finest grain, packed into ``struct`` frequency columns, re-aggregated one
level up into a ``map`` keyed by affected-status (missing statuses filled
with an empty frequency, as the reference does for ``non_affected``), and
re-aggregated a second time into an array of per-analysis struct-of-struct
entries plus a top-level ``frequency_RQDM`` struct-of-structs — partial sums
(ac/an/hom) flow through every level so each stage re-aggregates the previous
stage's partials rather than rescanning the input (the D1 "multi-level hash
aggregation" nuance the flat q1/q5 groupBys don't exercise).

Domain mapping onto the synthetic tables: locus → ``c_nationkey``, analysis
→ ``c_mktsegment``, affected status → ``o_orderstatus = 'F'``, allele count
``ac`` → order count, allele number ``an`` → exact total cents, ``hom`` →
urgent-priority count.

Scale notes (100 TB): every level is a hash aggregation over the PREVIOUS
level's output (strictly smaller — level 2 input is |nation×segment×status|
rows), so only level 1 touches the fact table; the customer dimension is
broadcast.  The collect_list/map state per key is bounded by the status and
segment cardinalities (2 and 5), not by the fact-row count.

Oracle exactness: the nested columns are built for real (map_from_entries →
map_concat fill → element_at lookups → collect_list of struct-of-structs),
then FLATTENED for the gate — integer partials rendered into a
deterministically sorted per-analysis string, top-level frequencies as
columns; ``af`` divisions are guarded exact IEEE long/long divisions
(``when(an=0, 0.0)`` both sides, the reference's coalesce-to-0).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import load, query

_FREQ_CASCADE_ORACLE = """
WITH l1 AS (
  SELECT c.c_nationkey AS nationkey,
         c.c_mktsegment AS seg,
         CASE WHEN o.o_orderstatus = 'F' THEN 'affected' ELSE 'non_affected' END AS status,
         COUNT(*) AS ac,
         CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS an,
         CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS hom
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2, 3
), l2 AS (
  SELECT nationkey, seg,
         SUM(CASE WHEN status = 'affected' THEN ac ELSE 0 END) AS affected_ac,
         SUM(CASE WHEN status = 'affected' THEN an ELSE 0 END) AS affected_an,
         SUM(CASE WHEN status = 'affected' THEN hom ELSE 0 END) AS affected_hom,
         SUM(CASE WHEN status = 'affected' THEN 0 ELSE ac END) AS non_affected_ac,
         SUM(CASE WHEN status = 'affected' THEN 0 ELSE an END) AS non_affected_an,
         SUM(CASE WHEN status = 'affected' THEN 0 ELSE hom END) AS non_affected_hom,
         SUM(ac) AS ac, SUM(an) AS an, SUM(hom) AS hom
  FROM l1 GROUP BY 1, 2
), l3 AS (
  SELECT nationkey,
         CAST(COUNT(*) AS BIGINT) AS n_analyses,
         string_agg(seg || '=' || ac || ':' || an || ':' || hom || ':'
                        || affected_ac || ':' || affected_an,
                    '|' ORDER BY seg) AS analyses_rendered,
         SUM(affected_ac) AS affected_ac, SUM(affected_an) AS affected_an,
         SUM(affected_hom) AS affected_hom,
         SUM(non_affected_ac) AS non_affected_ac, SUM(non_affected_an) AS non_affected_an,
         SUM(non_affected_hom) AS non_affected_hom,
         SUM(ac) AS ac, SUM(an) AS an, SUM(hom) AS hom
  FROM l2 GROUP BY 1
)
SELECT CAST(nationkey AS BIGINT) AS nationkey,
       n_analyses,
       analyses_rendered,
       CAST(affected_ac AS BIGINT) AS affected_ac,
       CAST(affected_an AS BIGINT) AS affected_an,
       CAST(affected_hom AS BIGINT) AS affected_hom,
       CASE WHEN affected_an = 0 THEN 0.0
            ELSE CAST(affected_ac AS DOUBLE) / CAST(affected_an AS DOUBLE) END AS affected_af,
       CAST(non_affected_ac AS BIGINT) AS non_affected_ac,
       CAST(non_affected_an AS BIGINT) AS non_affected_an,
       CAST(non_affected_hom AS BIGINT) AS non_affected_hom,
       CASE WHEN non_affected_an = 0 THEN 0.0
            ELSE CAST(non_affected_ac AS DOUBLE) / CAST(non_affected_an AS DOUBLE) END
         AS non_affected_af,
       CAST(ac AS BIGINT) AS total_ac,
       CAST(an AS BIGINT) AS total_an,
       CAST(hom AS BIGINT) AS total_hom,
       CASE WHEN an = 0 THEN 0.0
            ELSE CAST(ac AS DOUBLE) / CAST(an AS DOUBLE) END AS total_af
FROM l3
"""

_PARTIALS = ("ac", "an", "hom")


def _freq_struct(prefix: str = ""):
    """frequency struct {ac, an, af, hom} from (possibly prefixed) partial
    columns — the FrequencyUtils.frequency analogue (guarded exact division)."""
    p = lambda c: F.col(f"{prefix}{c}")  # noqa: E731
    af = F.when(p("an") == 0, F.lit(0.0)).otherwise(
        p("ac").cast("double") / p("an").cast("double")
    )
    return F.struct(
        p("ac").alias("ac"), p("an").alias("an"), af.alias("af"), p("hom").alias("hom")
    )


def _empty_freq():
    return F.struct(
        F.lit(0).cast("long").alias("ac"),
        F.lit(0).cast("long").alias("an"),
        F.lit(0.0).alias("af"),
        F.lit(0).cast("long").alias("hom"),
    )


def freq_cascade_nested(spark, sf_dir):
    """The nested cascade itself (pre-flattening) — schema:

    nationkey, frequencies_by_analysis: array<struct<analysis_code,
    affected: struct<ac,an,af,hom>, non_affected: ..., total: ...>>,
    frequency_RQDM: struct<affected: struct<...>, non_affected, total>,
    plus the flat partial-sum columns every level re-aggregates.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")

    # ---- level 1: finest grain (locus × analysis × affected-status) --------
    l1 = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("seg"),
            F.when(F.col("o_orderstatus") == "F", F.lit("affected"))
            .otherwise(F.lit("non_affected"))
            .alias("status"),
        )
        .agg(
            F.count(F.lit(1)).alias("ac"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("an"),
            F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0))
            .cast("long")
            .alias("hom"),
        )
        .withColumn("frequency_by_status", _freq_struct())
    )

    # ---- level 2: per analysis — map keyed by status + re-aggregated partials
    cond_sum = lambda flag, col: F.sum(  # noqa: E731
        F.when(F.col("status") == "affected", F.col(col) if flag else F.lit(0)).otherwise(
            F.lit(0) if flag else F.col(col)
        )
    )
    m = F.map_from_entries(F.collect_list(F.struct("status", "frequency_by_status")))
    l2 = l1.groupBy("nationkey", "seg").agg(
        m.alias("frequency_by_status"),
        *[cond_sum(True, c_).alias(f"affected_{c_}") for c_ in _PARTIALS],
        *[cond_sum(False, c_).alias(f"non_affected_{c_}") for c_ in _PARTIALS],
        *[F.sum(c_).alias(c_) for c_ in _PARTIALS],
    )
    # total entry + fill missing statuses with the empty frequency (the
    # reference's emptyFrequency backfill for absent non_affected groups)
    l2 = l2.withColumn(
        "frequency_by_status",
        F.map_concat(
            F.create_map(F.lit("total"), _freq_struct()), F.col("frequency_by_status")
        ),
    )
    for status in ("affected", "non_affected"):
        l2 = l2.withColumn(
            "frequency_by_status",
            F.when(
                F.array_contains(F.map_keys("frequency_by_status"), status),
                F.col("frequency_by_status"),
            ).otherwise(
                F.map_concat(
                    F.col("frequency_by_status"), F.create_map(F.lit(status), _empty_freq())
                )
            ),
        )

    # ---- level 3: per locus — array of per-analysis struct-of-structs +
    # re-aggregated partials + top-level frequency_RQDM struct-of-structs
    entry = F.struct(
        F.col("seg").alias("analysis_code"),
        F.element_at("frequency_by_status", "affected").alias("affected"),
        F.element_at("frequency_by_status", "non_affected").alias("non_affected"),
        F.element_at("frequency_by_status", "total").alias("total"),
    )
    l3 = l2.groupBy("nationkey").agg(
        F.collect_list(entry).alias("frequencies_by_analysis"),
        *[
            F.sum(f"{p}_{c_}").alias(f"{p}_{c_}")
            for p in ("affected", "non_affected")
            for c_ in _PARTIALS
        ],
        *[F.sum(c_).alias(c_) for c_ in _PARTIALS],
    )
    return l3.withColumn(
        "frequency_RQDM",
        F.struct(
            _freq_struct("affected_").alias("affected"),
            _freq_struct("non_affected_").alias("non_affected"),
            _freq_struct().alias("total"),
        ),
    )


@query(
    "freq_cascade_nested",
    oracle=_FREQ_CASCADE_ORACLE,
    survey="D1,D2,D5,H-map,H-struct,C1",
)
def freq_cascade_nested_flat(spark, sf_dir):
    """Driver-gated flattening of the nested cascade: the per-analysis array
    is rendered via a deterministic sort (struct sort on analysis_code) and
    the per-analysis ``affected`` values come OUT OF THE MAP-built structs,
    so the nested machinery is value-verified, not just schema-checked."""
    n = freq_cascade_nested(spark, sf_dir)
    rendered = F.concat_ws(
        "|",
        F.transform(
            F.sort_array(F.col("frequencies_by_analysis")),
            lambda e: F.concat_ws(
                "",
                e["analysis_code"],
                F.lit("="),
                e["total"]["ac"].cast("string"),
                F.lit(":"),
                e["total"]["an"].cast("string"),
                F.lit(":"),
                e["total"]["hom"].cast("string"),
                F.lit(":"),
                e["affected"]["ac"].cast("string"),
                F.lit(":"),
                e["affected"]["an"].cast("string"),
            ),
        ),
    )
    r = F.col("frequency_RQDM")
    return n.select(
        F.col("nationkey").cast("long").alias("nationkey"),
        F.size("frequencies_by_analysis").cast("long").alias("n_analyses"),
        rendered.alias("analyses_rendered"),
        r["affected"]["ac"].alias("affected_ac"),
        r["affected"]["an"].alias("affected_an"),
        r["affected"]["hom"].alias("affected_hom"),
        r["affected"]["af"].alias("affected_af"),
        r["non_affected"]["ac"].alias("non_affected_ac"),
        r["non_affected"]["an"].alias("non_affected_an"),
        r["non_affected"]["hom"].alias("non_affected_hom"),
        r["non_affected"]["af"].alias("non_affected_af"),
        r["total"]["ac"].alias("total_ac"),
        r["total"]["an"].alias("total_an"),
        r["total"]["hom"].alias("total_hom"),
        r["total"]["af"].alias("total_af"),
    )
