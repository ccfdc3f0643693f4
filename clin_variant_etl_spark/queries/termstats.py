"""Corpus term statistics: per-language heavy hitters and TF-IDF-style term
salience — the vocabulary/feature side of a training-data pipeline (corpus
inspection, stopword discovery, keyword extraction for quality filters).

Exactness rules (the driver hash-compares values):
- all counts are BIGINT on both sides;
- the salience score avoids ``ln`` (libm last-ulp differences across
  engines): score = tf * N / df computed as ``CAST(tf*N AS DOUBLE) / df`` —
  the product is an exact integer (< 2^53 by construction) and one IEEE
  division is bit-deterministic on both engines;
- every top-k uses a total order (count DESC, term ASC) so ranks are unique.

100-TB shapes:
- heavy hitters: token explode is map-side; ONE shuffle on (lang, token) for
  the count, then the per-language top-k shuffles only the counted frame
  (vocabulary-sized, not corpus-sized).  A count-min-sketch would replace
  the exact count if the vocabulary itself outgrew a shuffle — not needed
  while tokens are bounded strings;
- tf-idf: tf and df aggregate from the same exploded frame with one shuffle
  each (same key prefix); df is vocabulary-sized and joins tf on the token —
  a shuffle join, NOT broadcast (at web scale the vocabulary is billions of
  n-grams); the final per-doc top-k repartitions on doc_id.

Reference parity: no corpus-stats operator exists in the reference (its
aggregations are variant frequencies, ``Variants.scala:183+``); this extends
the LLM-pipeline family per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import load, query
from .textops import _words, _words_sql

TOP_K_TOKENS = 5
TOP_K_TERMS = 3

_HEAVY_ORACLE = f"""
WITH words AS (
  SELECT doc_id, lang, {_words_sql("text")} AS ws FROM documents
), toks AS (
  SELECT lang, w.w AS token FROM words, LATERAL unnest(ws) AS w(w)
), counts AS (
  SELECT lang, token, COUNT(*) AS n FROM toks GROUP BY 1, 2
), ranked AS (
  SELECT lang, token, n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, token ASC) AS rnk
  FROM counts
)
SELECT lang, token, CAST(n AS BIGINT) AS n, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {TOP_K_TOKENS}
"""


@query(
    "top_tokens_per_lang",
    oracle=_HEAVY_ORACLE,
    survey="text-heavy-hitters,D1,E4,H-array",
    # gated since r5 (rotation: first driver row this round)
)
def top_tokens_per_lang(spark, sf_dir):
    """Heavy hitters: top-5 tokens per language by exact count, total-ordered
    tie-break (count DESC, token ASC)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("lang", F.explode(_words(F.col("text"))).alias("token"))
    counts = toks.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("token"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K_TOKENS)
        .select("lang", "token", F.col("n").cast("long").alias("n"),
                F.col("rnk").cast("long").alias("rnk"))
    )


_TFIDF_ORACLE = f"""
WITH words AS (
  SELECT doc_id, {_words_sql("text")} AS ws FROM documents
), toks AS (
  SELECT doc_id, w.w AS term FROM words, LATERAL unnest(ws) AS w(w)
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1
), n_docs AS (
  SELECT COUNT(*) AS n FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(tf.tf * n_docs.n AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n_docs
), ranked AS (
  SELECT doc_id, term, tf, df, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rnk
  FROM scored
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, term,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       score, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {TOP_K_TERMS}
"""


@query(
    "tfidf_top_terms",
    oracle=_TFIDF_ORACLE,
    survey="text-tfidf,D1,C2,E4",
)
def tfidf_top_terms(spark, sf_dir):
    """Keyword extraction: top-3 terms per document by tf * N / df (an
    ln-free tf-idf variant — same ordering as tf·idf with idf = N/df).

    The tf→df join is a same-key shuffle join (vocabulary can be billions of
    terms at corpus scale — never broadcast); N is a driver scalar → literal
    (survey D7 pattern).
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_words(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.count()
    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        ((F.col("tf") * F.lit(int(n_docs))).cast("double") / F.col("df").cast("double")).alias(
            "score"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K_TERMS)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "score",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


# =========================================================================
# Exact distributed quantiles (p25 / median / p75 of doc length per lang).
# Neither engine's quantile builtin is trusted across implementations;
# instead BOTH sides compute the identical textbook linear interpolation
# from explicit ranks: pos = 1 + (n-1)q; v = v_lo + (v_hi - v_lo)·frac.
# For q ∈ {.25, .5, .75} every term is exactly representable (frac is a
# dyadic rational, inputs are integers), so the doubles are bit-equal.
# Plan at corpus scale: ONE shuffle on the group key, per-group sort via
# row_number, then a 2-row-per-quantile semi-aggregation — no global sort,
# no driver collect; this is how you get exact quantiles distributed
# (approx_percentile is the sketch alternative when exactness can yield).
# =========================================================================
_QUANTILES = (25, 50, 75)
_Q_TERMS_SQL = ", ".join(
    f"""CAST(MAX(CASE WHEN rnk = CAST(floor(1 + (n-1)*{q / 100}) AS BIGINT) THEN v END)
      + (MAX(CASE WHEN rnk = CAST(ceil(1 + (n-1)*{q / 100}) AS BIGINT) THEN v END)
         - MAX(CASE WHEN rnk = CAST(floor(1 + (n-1)*{q / 100}) AS BIGINT) THEN v END))
        * ((1 + (MAX(n)-1)*{q / 100}) - floor(1 + (MAX(n)-1)*{q / 100})) AS DOUBLE) AS p{q}"""
    for q in _QUANTILES
)

_QUANTILE_ORACLE = f"""
WITH ranked AS (
  SELECT lang, CAST(n_chars AS DOUBLE) AS v,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rnk,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT lang, CAST(MAX(n) AS BIGINT) AS n, {_Q_TERMS_SQL}
FROM ranked
GROUP BY lang
"""


@query(
    "doc_length_quantiles",
    oracle=_QUANTILE_ORACLE,
    survey="quantiles-exact,D1,E4,H-math",
)
def doc_length_quantiles(spark, sf_dir):
    """Exact p25/p50/p75 of n_chars per language — rank-interpolation
    formula identical on both engines (see module-section note)."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    ranked = d.select(
        "lang",
        F.col("n_chars").cast("double").alias("v"),
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
    )
    aggs = [F.max("n").cast("long").alias("n")]
    for q in _QUANTILES:
        pos = 1 + (F.col("n") - 1) * F.lit(q / 100)
        lo = F.floor(pos).cast("long")
        hi = F.ceil(pos).cast("long")
        v_lo = F.max(F.when(F.col("rnk") == lo, F.col("v")))
        v_hi = F.max(F.when(F.col("rnk") == hi, F.col("v")))
        frac = pos - F.floor(pos)
        # frac is constant per group (function of n) — max() collapses it
        aggs.append(
            (v_lo + (v_hi - v_lo) * F.max(frac)).cast("double").alias(f"p{q}")
        )
    return ranked.groupBy("lang").agg(*aggs)
