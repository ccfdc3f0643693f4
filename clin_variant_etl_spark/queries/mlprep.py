"""Training-data preparation operators: quantization and dataset splits.

Two more members of the LLM-pipeline family (COVERAGE.md), both suite-only
(`gate=False` — the driver registry is pinned at 50; the identical
exact-match contract runs in tests/test_oracle_parity.py):

- ``embed_quantize_int8`` — per-vector symmetric int8 quantization of the
  embedding column (the standard storage/serving compression at 10^9
  vectors: 4 bytes/dim → 1 byte/dim + one scale).  Everything is HOFs over
  the array (zero per-row Python); rounding is ``floor(x + 0.5)`` in BOTH
  engines so ties break identically, and the reconstruction error comes out
  as the same sequential left fold as every other float in this repo.
- ``train_holdout_split`` — deterministic content-addressed dataset split:
  a document's split is a pure function of md5(doc_id) (stable across runs,
  machines, and engine versions — re-shuffling the corpus can never leak
  holdout docs into train).  ~1/16 of docs land in holdout (first hex digit
  '0'); the aggregate per split is exactly reproducible in DuckDB.
"""

from pyspark.sql import functions as F

from .registry import load, query

_Q_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
     s AS (SELECT vec_id, v,
                  list_reduce(list_prepend(0.0, list_transform(v, x -> abs(x))),
                              (a, b) -> greatest(a, b)) / 127.0 AS scale
           FROM e),
     q AS (SELECT vec_id, v, scale,
                  CASE WHEN scale = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
                       ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
                  END AS qv
           FROM s)
SELECT vec_id, scale,
       list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(qv, x -> abs(x))),
                   (a, b) -> a + b) AS q_l1,
       list_reduce(list_prepend(0.0,
                   list_transform(generate_series(1, 64),
                                  i -> (v[i] - qv[i] * scale) * (v[i] - qv[i] * scale))),
                   (a, b) -> a + b) / 64.0 AS recon_mse
FROM q
"""


@query("embed_quantize_int8", oracle=_Q_ORACLE, survey="sim-cosine-dup,H-array,B7")
def embed_quantize_int8(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    scale = (
        F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))) / 127.0
    ).alias("scale")
    s = e.select("vec_id", "v", scale)
    qv = F.when(
        F.col("scale") == 0,
        F.transform(F.col("v"), lambda x: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(F.col("v"), lambda x: F.floor(x / F.col("scale") + F.lit(0.5)))
    )
    q = s.withColumn("qv", qv)
    q_l1 = F.aggregate(
        F.transform(F.col("qv"), F.abs), F.lit(0).cast("long"), lambda a, x: a + x
    ).alias("q_l1")
    err = F.zip_with(
        F.col("v"), F.col("qv"), lambda x, qi: (x - qi * F.col("scale")) * (x - qi * F.col("scale"))
    )
    recon = (F.aggregate(err, F.lit(0.0), lambda a, x: a + x) / 64.0).alias("recon_mse")
    return q.select("vec_id", "scale", q_l1, recon)


_SPLIT_ORACLE = """
WITH d AS (SELECT doc_id, n_chars,
                  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
                       THEN 'holdout' ELSE 'train' END AS split
           FROM documents)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM d
GROUP BY split
"""


@query("train_holdout_split", oracle=_SPLIT_ORACLE, survey="D1,B4,H-string")
def train_holdout_split(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0", "holdout"
    ).otherwise("train")
    return (
        d.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
        )
    )


# =========================================================================
# Deterministic stratified sample: k docs per language stratum, selected by
# md5-hash rank.  The eval-set construction primitive — a uniform-without-
# replacement sample per stratum that is a pure function of the content key
# (stable across runs, engines, corpus re-orderings; adding documents can
# only displace a selected doc by out-hashing it, never reshuffle the rest).
# Plan at 10^10 docs: hash is map-side; per-stratum top-k is ONE shuffle on
# the stratum key with a bounded heap per group (row_number over a total
# order, k rows retained) — no global sort, no sample() nondeterminism.
# =========================================================================
SAMPLE_K = 20

_SAMPLE_ORACLE = f"""
WITH h AS (
  SELECT lang, doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS hk
  FROM documents
), ranked AS (
  SELECT lang, doc_id, n_chars, hk,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hk ASC, doc_id ASC) AS rnk
  FROM h
)
SELECT lang, CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       hk, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {SAMPLE_K}
"""


@query(
    "stratified_hash_sample",
    oracle=_SAMPLE_ORACLE,
    survey="sample-stratified,D6,E4,H-string",
)
def stratified_hash_sample(spark, sf_dir):
    """k=20 docs per language by md5(doc_id) rank — deterministic
    uniform-without-replacement stratified sampling."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars", F.md5(F.col("doc_id").cast("string")).alias("hk")
    )
    w = Window.partitionBy("lang").orderBy(F.asc("hk"), F.asc("doc_id"))
    return (
        d.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= SAMPLE_K)
        .select(
            "lang",
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_chars").cast("long").alias("n_chars"),
            "hk",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )
