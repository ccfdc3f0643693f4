"""Bucketized interval-overlap join — the reference's region machinery
re-expressed as an equi-join, never a broadcast-nested-loop join.

Reference semantics replicated (cites into /root/reference):
- ``isOverlapping`` — half-open interval intersection on a low-cardinality
  equi key (chromosome): src/main/scala/bio/ferlab/clin/etl/utils/Region.scala:11-28,
  etl/enriched/package.scala:19-63;
- reciprocal-overlap fraction >= 0.8 vs gnomAD: etl/enriched/CNV.scala:139-183;
- keep-best-overlap row per left interval (ordered DropDuplicates):
  etl/enriched/CNV.scala:277-313,127-131.

Why bucketized: the only equi key of a genomic interval join is the
chromosome (cardinality ~24), so a naive join degenerates to a BNLJ with
O(n*m) comparisons per chromosome — a scale-killer at 10^8 intervals.
Binning both sides into fixed-width buckets and exploding to (chrom, bin)
turns it into a shuffle equi-join on (chrom, bin); each pair is emitted
EXACTLY once by requiring the join bin to be the bin containing the overlap
start (``bin == greatest(floor(a_start/B), floor(b_start/B))``) — no
DISTINCT pass needed.  Fan-out per interval is len/B + 1 rows (~1-2 for
B >= typical length), and bin width tunes the shuffle-width/fan-out
trade-off exactly like Iceberg's truncate-transform partitioning.

Intervals are synthesized DETERMINISTICALLY from the TPC-H tables (pure
arithmetic on keys — identical in Spark and DuckDB): left set from
``orders``, right set from ``part``.  Fractions use integer
cross-multiplication (5*ov >= 4*len), so the filter is exact.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from .registry import load, query

BIN = 1024  # bin width (positions); production knob, like truncate(width)
N_CHROM = 8
SPAN = 100_000
RO_NUM, RO_DEN = 4, 5  # reciprocal-overlap fraction >= RO_NUM/RO_DEN = 0.8


def _a_sql() -> str:
    k = "CAST(o_orderkey AS BIGINT)"
    return (
        f"SELECT {k} AS a_id, {k} % {N_CHROM} AS chrom, "
        f"({k} * 7919) % {SPAN} AS a_start, "
        f"({k} * 7919) % {SPAN} + 60 + ({k} * 13) % 180 AS a_end FROM orders"
    )


def _b_sql() -> str:
    k = "CAST(p_partkey AS BIGINT)"
    return (
        f"SELECT {k} AS b_id, {k} % {N_CHROM} AS chrom, "
        f"({k} * 104729) % {SPAN} AS b_start, "
        f"({k} * 104729) % {SPAN} + 60 + ({k} * 17) % 180 AS b_end FROM part"
    )


_OVERLAP_ORACLE = f"""
WITH a AS ({_a_sql()}),
     b AS ({_b_sql()}),
     pairs AS (
       SELECT a.a_id, a.chrom, a.a_start, a.a_end,
              b.b_id, b.b_start, b.b_end,
              least(a.a_end, b.b_end) - greatest(a.a_start, b.b_start) AS ov
       FROM a JOIN b
         ON a.chrom = b.chrom AND a.a_start < b.b_end AND b.b_start < a.a_end
     )
SELECT a_id, chrom, a_start, a_end, b_id, b_start, b_end,
       CAST(ov AS BIGINT) AS overlap_len,
       CAST(ov AS DOUBLE) / CAST(a_end - a_start AS DOUBLE) AS frac_a,
       CAST(ov AS DOUBLE) / CAST(b_end - b_start AS DOUBLE) AS frac_b
FROM pairs
WHERE {RO_DEN} * ov >= {RO_NUM} * (a_end - a_start)
  AND {RO_DEN} * ov >= {RO_NUM} * (b_end - b_start)
QUALIFY row_number() OVER (PARTITION BY a_id ORDER BY ov DESC, b_id ASC) = 1
"""


def _a_df(spark, sf_dir):
    k = F.col("o_orderkey").cast("long")
    return load(spark, sf_dir, "orders").select(
        k.alias("a_id"),
        (k % N_CHROM).alias("chrom"),
        ((k * 7919) % SPAN).alias("a_start"),
        ((k * 7919) % SPAN + 60 + (k * 13) % 180).alias("a_end"),
    )


def _b_df(spark, sf_dir):
    k = F.col("p_partkey").cast("long")
    return load(spark, sf_dir, "part").select(
        k.alias("b_id"),
        (k % N_CHROM).alias("chrom"),
        ((k * 104729) % SPAN).alias("b_start"),
        ((k * 104729) % SPAN + 60 + (k * 17) % 180).alias("b_end"),
    )


def _binned(df, start_col: str, end_col: str):
    """Explode each interval to one row per bin it touches (half-open end)."""
    bins = F.sequence(
        F.floor(F.col(start_col) / BIN), F.floor((F.col(end_col) - 1) / BIN)
    )
    return df.withColumn("bin", F.explode(bins))


@query(
    "interval_overlap_best",
    oracle=_OVERLAP_ORACLE,
    survey="C9,C10,E2,H-math",
    gate=False,  # rotated out r5: driver rows green r1-r4; codes stay gate-covered
)
def interval_overlap_best(spark, sf_dir):
    a = _binned(_a_df(spark, sf_dir), "a_start", "a_end").alias("a")
    b = _binned(_b_df(spark, sf_dir), "b_start", "b_end").alias("b")
    ov = F.least(F.col("a.a_end"), F.col("b.b_end")) - F.greatest(
        F.col("a.a_start"), F.col("b.b_start")
    )
    # each overlapping pair shares >=1 bin; emitting only from the bin that
    # contains the overlap start makes the emission exactly-once (no distinct)
    anchor_bin = F.floor(F.greatest(F.col("a.a_start"), F.col("b.b_start")) / BIN)
    pairs = a.join(
        b,
        (F.col("a.chrom") == F.col("b.chrom"))
        & (F.col("a.bin") == F.col("b.bin"))
        & (F.col("a.bin") == anchor_bin)
        & (F.col("a.a_start") < F.col("b.b_end"))
        & (F.col("b.b_start") < F.col("a.a_end")),
    ).select(
        "a.a_id",
        "a.chrom",
        "a.a_start",
        "a.a_end",
        "b.b_id",
        "b.b_start",
        "b.b_end",
        ov.alias("ov"),
    )
    a_len = F.col("a_end") - F.col("a_start")
    b_len = F.col("b_end") - F.col("b_start")
    recip = pairs.where(
        (RO_DEN * F.col("ov") >= RO_NUM * a_len) & (RO_DEN * F.col("ov") >= RO_NUM * b_len)
    )
    w = W.partitionBy("a_id").orderBy(F.col("ov").desc(), F.col("b_id").asc())
    return (
        recip.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "a_id",
            "chrom",
            "a_start",
            "a_end",
            "b_id",
            "b_start",
            "b_end",
            F.col("ov").cast("long").alias("overlap_len"),
            (F.col("ov").cast("double") / a_len.cast("double")).alias("frac_a"),
            (F.col("ov").cast("double") / b_len.cast("double")).alias("frac_b"),
        )
    )
