"""Relational operator coverage (SURVEY.md §2 B-H) on the TPC-H-ish tables.

Each query re-expresses a reference pattern (cited per query) Spark-first:
declarative DataFrame plans, explicit broadcast for dimensions (reference
disables auto-broadcast and broadcasts by hand — etl/conf/EtlConfiguration.scala:51,
etl/normalized/SNV.scala:40), filters applied at the scan so Catalyst pushes
them into the parquet reader, and all aggregates in exact integer space so the
DuckDB oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import load, query

# ---- exact-money helpers (per-row round of 2-decimal doubles is exact) ------


def _cents(c):
    return F.round(F.col(c) * 100).cast("long")


def _pct2(c):
    """0.07 → 7 (two-decimal rate as integer percent)."""
    return F.round(F.col(c) * 100).cast("long")


# =========================================================================
# D1/D2/B7 — multi-aggregate hash aggregation with exact arithmetic
# (reference: 3-stage frequency cascade etl/normalized/Variants.scala:183-258)
# =========================================================================
@query(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)            AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)   AS sum_base_cents,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
              * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_e4,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
              * (100 - CAST(round(l_discount*100) AS BIGINT))
              * (100 + CAST(round(l_tax*100) AS BIGINT))) AS BIGINT)      AS sum_charge_e6,
       CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE)                                       AS avg_qty,
       COUNT(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    survey="D1,D2,B2,B7,H-math",
    gate=False,  # rotated out r5: driver rows green r1-r4; codes stay gate-covered
)
def q1_pricing_summary(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp_ntz")
    )
    qty = F.round(F.col("l_quantity")).cast("long")
    cents = _cents("l_extendedprice")
    d = _pct2("l_discount")
    t = _pct2("l_tax")
    return (
        l.select(
            "l_returnflag",
            "l_linestatus",
            qty.alias("q"),
            cents.alias("c"),
            (cents * (100 - d)).alias("de4"),
            (cents * (100 - d) * (100 + t)).alias("ce6"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("q").alias("sum_qty"),
            F.sum("c").alias("sum_base_cents"),
            F.sum("de4").alias("sum_disc_e4"),
            F.sum("ce6").alias("sum_charge_e6"),
            (F.sum("q").cast("double") / F.count(F.lit(1)).cast("double")).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# =========================================================================
# C1/C4 + F4 — broadcast dimension join, join chain, deterministic top-k
# (reference: broadcast clinical join etl/normalized/SNV.scala:40)
# =========================================================================
@query(
    "q3_top_revenue_orders",
    oracle="""
SELECT o.o_orderkey AS orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_orderpriority AS orderpriority,
       CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)
              * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY 1, 2, 3
ORDER BY revenue_e4 DESC, orderkey ASC
LIMIT 10
""",
    survey="C1,C4,D1,F4,B2",
)
def q3_top_revenue_orders(spark, sf_dir):
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    rev = _cents("l_extendedprice") * (100 - _pct2("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(F.sum(rev).alias("revenue_e4"))
        .orderBy(F.col("revenue_e4").desc(), F.col("orderkey").asc())
        .limit(10)
    )


# =========================================================================
# C4 chain over 6 tables — the reference's 10+-join enrichment shape
# (etl/enriched/Variants.scala:104-121, manual small-dim-last ordering)
# =========================================================================
@query(
    "q5_nation_revenue",
    oracle="""
SELECT r.r_name AS region, n.n_name AS nation,
       CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)
              * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
""",
    survey="C4,C10,D1,C1",
    gate=False,  # rotated out r5: driver rows green r1-r4; codes stay gate-covered
)
def q5_nation_revenue(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    rev = _cents("l_extendedprice") * (100 - _pct2("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(rev).alias("revenue_e4"), F.count(F.lit(1)).alias("n_items"))
    )


# =========================================================================
# C1 — explicit broadcast dimension join + exact avg
# =========================================================================
@query(
    "brand_part_stats",
    oracle="""
SELECT p.p_brand AS brand,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(p.p_retailprice*100) AS BIGINT)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_price_cents
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1
""",
    survey="C1,D1,B7",
    # C1 evidenced by gated q3/q5; suite-only keeps a driver slot free
    gate=False,
)
def brand_part_stats(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("sum_qty"),
            (
                F.sum(_cents("p_retailprice")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_price_cents"),
        )
    )


# =========================================================================
# C6 — left-semi join (reference: panel-gene restriction etl/varsome/Varsome.scala:51)
# =========================================================================
@query(
    "semi_active_customers",
    oracle="""
SELECT c.c_mktsegment AS mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1
""",
    survey="C6,D1",
)
def semi_active_customers(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# =========================================================================
# C7 — left-anti join: incremental delta detection
# (reference: Varsome 7-day refresh anti-join etl/varsome/Varsome.scala:68-74)
# =========================================================================
@query(
    "anti_inactive_customers",
    oracle="""
SELECT n.n_name AS nation, COUNT(*) AS n_inactive
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1
""",
    survey="C7,C1,D1",
)
def anti_inactive_customers(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_inactive"))
    )


# =========================================================================
# C5 — full outer join of two aggregates
# (reference: gene-centric full join etl/es/PrepareGeneCentric.scala:67-70)
# =========================================================================
@query(
    "outer_nation_activity",
    oracle="""
WITH cc AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers FROM customer GROUP BY 1),
     ss AS (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1)
SELECT COALESCE(cc.nk, ss.nk) AS nationkey,
       COALESCE(cc.n_customers, 0) AS n_customers,
       COALESCE(ss.n_suppliers, 0) AS n_suppliers
FROM cc FULL OUTER JOIN ss ON cc.nk = ss.nk
""",
    survey="C5,B6,D1",
)
def outer_nation_activity(spark, sf_dir):
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    j = c.alias("c").join(s.alias("s"), F.col("c.nk") == F.col("s.nk"), "full_outer")
    return j.select(
        F.coalesce(F.col("c.nk"), F.col("s.nk")).alias("nationkey"),
        F.coalesce(F.col("c.n_customers"), F.lit(0)).alias("n_customers"),
        F.coalesce(F.col("s.n_suppliers"), F.lit(0)).alias("n_suppliers"),
    )


# =========================================================================
# E2/E4 — deterministic windowed top-k per key
# (reference: sorted-array rank-1/rank-2 etl/enriched/SNV.scala:68-78; our
#  engine mandates explicit tie-breaks, SURVEY.md §7.4)
# =========================================================================
@query(
    "top2_orders_per_customer",
    oracle="""
SELECT o_custkey AS custkey,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rk,
       o_orderkey AS orderkey,
       CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_cents
FROM orders
QUALIFY rk <= 2
""",
    survey="E2,E4,E5,D6",
)
def top2_orders_per_customer(spark, sf_dir):
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 2)
        .select(
            F.col("o_custkey").alias("custkey"),
            "rk",
            F.col("o_orderkey").alias("orderkey"),
            _cents("o_totalprice").alias("totalprice_cents"),
        )
    )


# =========================================================================
# D6 — argmax per group via deterministic window (reference max_by exomiser
#  etl/enriched/Variants.scala:383-394; E5 fix: explicit tie-break)
# =========================================================================
@query(
    "richest_customer_per_nation",
    oracle="""
SELECT c_nationkey AS nationkey, c_custkey AS custkey,
       CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents
FROM customer
QUALIFY row_number() OVER (PARTITION BY c_nationkey
                           ORDER BY c_acctbal DESC, c_custkey ASC) = 1
""",
    survey="D6,E1,E5",
    # rotated out of the driver gate in r4 (driver rows r01-r03 green;
    # survey codes stay covered by gated siblings) to free a slot for a
    # never-gated query -- see __spark_entry__.py rotation table
    gate=False,
)
def richest_customer_per_nation(spark, sf_dir):
    from pyspark.sql import Window as W

    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        c.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_custkey").alias("custkey"),
            _cents("c_acctbal").alias("acctbal_cents"),
        )
    )


# =========================================================================
# D2/B4 — conditional aggregates (reference: sum(when(affected,...))
#  etl/utils/FrequencyUtils.scala:16-38)
# =========================================================================
@query(
    "orders_month_priority",
    oracle="""
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       o_orderpriority AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_total_cents,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
       CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_bigticket
FROM orders
GROUP BY 1, 2
""",
    survey="D2,B4,H-date",
    # D2/H-date evidenced by gated cdc_out_of_order + session_stats_per_user; suite-only
    gate=False,
)
def orders_month_priority(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents("o_totalprice")).alias("sum_total_cents"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("long")
            .alias("n_finished"),
            F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0))
            .cast("long")
            .alias("n_bigticket"),
        )
    )


# =========================================================================
# H-string — regexp extract / split / case / length / md5 fingerprint
# (reference: regex analysis-id extraction etl/nextflow/
#  NormalizeSVClusteringParentalOrigin.scala:57; sha1 row ids
#  etl/enriched/Variants.scala:119-120 — md5 here for oracle portability)
# =========================================================================
@query(
    "part_type_tokens",
    oracle="""
SELECT split_part(p_type, ' ', 1) AS type_head,
       COUNT(*) AS n_parts,
       CAST(COUNT(DISTINCT p_size) AS BIGINT) AS n_sizes,
       CAST(SUM(CAST(p_size AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_size,
       min(md5(p_name)) AS min_name_md5
FROM part
GROUP BY 1
""",
    survey="H-string,D8,B1",
    gate=False,  # rotated out r5: driver rows green r1-r4; codes stay gate-covered
)
def part_type_tokens(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    return (
        p.withColumn("type_head", F.split(F.col("p_type"), " ").getItem(0))
        .groupBy("type_head")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.countDistinct("p_size").cast("long").alias("n_sizes"),
            (
                F.sum(F.col("p_size").cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_size"),
            F.min(F.md5(F.col("p_name"))).alias("min_name_md5"),
        )
    )


@query(
    "customer_name_parse",
    oracle="""
SELECT c_custkey AS custkey,
       CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
       upper(c_mktsegment) AS segment_uc,
       CAST(length(c_name) AS BIGINT) AS name_len,
       md5(c_name) AS name_md5
FROM customer
WHERE c_custkey <= 500
""",
    survey="H-string,B2,B7",
    # H-string/B7 evidenced by gated doc_fingerprints + q1; suite-only
    gate=False,
)
def customer_name_parse(spark, sf_dir):
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") <= 500)
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.regexp_extract(F.col("c_name"), "([0-9]+)", 1).cast("long").alias("name_num"),
        F.upper(F.col("c_mktsegment")).alias("segment_uc"),
        F.length(F.col("c_name")).cast("long").alias("name_len"),
        F.md5(F.col("c_name")).alias("name_md5"),
    )


# =========================================================================
# G1/G3 — set operations (reference uses unions + anti joins; except here)
# =========================================================================
@query(
    "brands_expensive_not_cheap",
    oracle="""
SELECT p_brand AS brand FROM part WHERE p_retailprice > 1500
EXCEPT
SELECT p_brand AS brand FROM part WHERE p_retailprice < 500
""",
    survey="G3,G1,B2",
    gate=False,  # rotated out r5: driver rows green r1-r4; codes stay gate-covered
)
def brands_expensive_not_cheap(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    hi = p.where(F.col("p_retailprice") > 1500).select(F.col("p_brand").alias("brand")).distinct()
    lo = p.where(F.col("p_retailprice") < 500).select(F.col("p_brand").alias("brand")).distinct()
    return hi.subtract(lo)


@query(
    "union_order_events",
    oracle="""
SELECT kind, COUNT(*) AS n, CAST(MIN(k) AS BIGINT) AS min_key, CAST(MAX(k) AS BIGINT) AS max_key
FROM (
  SELECT 'order' AS kind, o_orderkey AS k FROM orders WHERE o_orderstatus = 'O'
  UNION ALL
  SELECT 'event' AS kind, event_id AS k FROM events WHERE event_type = 'purchase'
) u
GROUP BY 1
""",
    survey="G1,G2,D1",
    # G2 retains exact parity in the suite; gated union_parties covers the union family
    gate=False,
)
def union_order_events(spark, sf_dir):
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select(F.lit("order").alias("kind"), F.col("o_orderkey").alias("k"))
    )
    e = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(F.lit("event").alias("kind"), F.col("event_id").alias("k"))
    )
    return (
        o.unionByName(e)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").cast("long").alias("min_key"),
            F.max("k").cast("long").alias("max_key"),
        )
    )


# =========================================================================
# C9/C10 — composite equi+range join (reference interval joins
#  etl/utils/Region.scala:11-28, etl/enriched/package.scala:19-63)
# =========================================================================
@query(
    "ship_latency_histogram",
    oracle="""
SELECT o.o_orderpriority AS priority,
       CAST(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) // 30
            AS BIGINT) AS latency_months,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 360 DAY
GROUP BY 1, 2
""",
    survey="C9,C10,H-date,D1",
    gate=False,  # rotated out r5: driver rows green r1-r4; codes stay gate-covered
)
def ship_latency_histogram(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    cond = (
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate >= o.o_orderdate)
        & (l.l_shipdate < o.o_orderdate + F.expr("INTERVAL 360 DAY"))
    )
    return (
        l.join(o, cond)
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.floor(
                F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
                / 30
            )
            .cast("long")
            .alias("latency_months"),
        )
        .groupBy("priority", "latency_months")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )


# =========================================================================
# C11 — self range join (reference self-join family graph
#  etl/fhir/EnrichedClinical.scala:298-314; range condition C9)
# =========================================================================
@query(
    "event_followup_pairs",
    oracle="""
SELECT a.event_type AS first_type, b.event_type AS next_type, COUNT(*) AS n_pairs
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 10 MINUTE
 AND b.event_id <> a.event_id
GROUP BY 1, 2
""",
    survey="C11,C9,D1",
)
def event_followup_pairs(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    a, b = e.alias("a"), e.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTE"))
        & (F.col("b.event_id") != F.col("a.event_id"))
    )
    return (
        a.join(b, cond)
        .groupBy(
            F.col("a.event_type").alias("first_type"),
            F.col("b.event_type").alias("next_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# =========================================================================
# H-array HOFs — transform/filter/aggregate folds (reference: FrequencyUtils
#  array_sum fold etl/utils/FrequencyUtils.scala:8,16; F.transform family
#  etl/fhir/FhirCustomOperations.scala:115-128).  Folds are sequential
#  left-folds → bitwise-identical to DuckDB list_reduce.
# =========================================================================
@query(
    "embedding_array_stats",
    oracle="""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
SELECT vec_id,
       CAST(label AS BIGINT) AS label,
       CAST(len(v) AS BIGINT) AS dim,
       CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_pos,
       CASE WHEN len(list_filter(v, x -> x > 0)) = 0 THEN 0.0
            ELSE list_reduce(list_prepend(0.0, list_filter(v, x -> x > 0)), (x, y) -> x + y)
       END AS sum_pos,
       sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (x, y) -> x + y))
         AS l2_norm
FROM e
WHERE vec_id < 100
""",
    survey="H-array,I3,B7",
    gate=False,  # rotated out r5: driver rows green r1-r4; codes stay gate-covered
)
def embedding_array_stats(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    v = F.col("embedding").cast("array<double>")
    pos = F.filter(v, lambda x: x > 0)
    return e.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.size(v).cast("long").alias("dim"),
        F.size(pos).cast("long").alias("n_pos"),
        F.aggregate(pos, F.lit(0.0), lambda acc, x: acc + x).alias("sum_pos"),
        F.sqrt(
            F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
        ).alias("l2_norm"),
    )


# =========================================================================
# H-JSON — from_json/get_json_object (reference: from_json Varsome payloads
#  etl/varsome/Varsome.scala:89)
# =========================================================================
@query(
    "event_props_json",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_k
FROM events
GROUP BY 1
""",
    survey="H-json,D1",
)
def event_props_json(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            (F.sum(k).cast("double") / F.count(F.lit(1)).cast("double")).alias("avg_k"),
        )
    )


# =========================================================================
# G-ext: INTERSECT — the set-op family's missing member (G1 union,
# G3 except above).  Spark compiles intersect to a left-semi join over
# distinct inputs — same shuffle shape as the except/anti pair.
# =========================================================================
@query(
    "brands_both_expensive_and_large",
    oracle="""
SELECT p_brand AS brand FROM part WHERE p_retailprice > 1200
INTERSECT
SELECT p_brand AS brand FROM part WHERE p_size >= 40
""",
    survey="G-intersect,G3,B2",
)
def brands_both_expensive_and_large(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    hi = p.where(F.col("p_retailprice") > 1200).select(F.col("p_brand").alias("brand"))
    lg = p.where(F.col("p_size") >= 40).select(F.col("p_brand").alias("brand"))
    return hi.intersect(lg)
