"""Sequence packing — GPT-style concat-and-chunk over tokenized documents.

The training-data op the reference has no analogue for (it is the tokens-
payload counterpart of the reference's layout-for-scan repartitions,
etl/enriched/Variants.scala:124): concatenate every document's token
stream in a fixed corpus order (doc_id asc) and cut the stream into
fixed-length packs of ``MAX_LEN`` tokens, documents crossing pack
boundaries (the standard causal-LM data prep).  Per document the operator
emits its global token offset and the first/last pack it lands in.

Scale path — a **distributed prefix sum**, not a global window:

1. ``repartitionByRange(P, doc_id)`` — ordered ranges, P ≈ cluster
   parallelism (the frame is persisted so the partition assignment is
   frozen between the two reads);
2. one tiny aggregation job collects the per-partition token totals
   (≤P rows to the driver — metadata-sized, like the engine's bucket
   stats) and folds them into per-partition prefix offsets;
3. a window cumsum **within each partition** (P parallel groups, no
   global single-task window) plus the broadcast prefix-offset lookup
   reconstructs the exact global running sum.

The output is invariant to the (sampled) range boundaries: partition-local
cumsum + ordered-prefix offset telescopes to the global ordered cumsum for
any ordered partitioning, so the plan is deterministic end-to-end even
though ``repartitionByRange`` samples its split points.  A naive
``Window.orderBy(doc_id)`` with no partitionBy funnels the whole corpus
through ONE task — exactly what this operator avoids at 10^8 docs.

Token counts use the repo's deterministic subword rule (``ceil(len(w)/4)``
per word, textops.text_quality_stats) so the DuckDB oracle is exact.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from .registry import query
from .textops import _words_df, _words_sql

MAX_LEN = 2048

_PACK_ORACLE = f"""
WITH w AS (
  SELECT doc_id, {_words_sql("text")} AS ws FROM documents
), t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(list_reduce(list_prepend(0, list_transform(ws, x -> (len(x) + 3) // 4)),
                          (a, b) -> a + b) AS BIGINT) AS n_tok
  FROM w
), c AS (
  SELECT doc_id, n_tok,
         SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM t WHERE n_tok > 0
)
SELECT doc_id, n_tok,
       CAST(cum - n_tok AS BIGINT) AS start_off,
       CAST((cum - n_tok) // {MAX_LEN} AS BIGINT) AS pack_first,
       CAST((cum - 1) // {MAX_LEN} AS BIGINT) AS pack_last,
       CAST((cum - 1) // {MAX_LEN} - (cum - n_tok) // {MAX_LEN} + 1 AS BIGINT) AS n_packs
FROM c
"""


def _n_tok(ws_col):
    return F.aggregate(
        F.transform(ws_col, lambda x: F.floor((F.length(x) + 3) / 4).cast("long")),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )


_PACK_SCHEMA = (
    "doc_id long, n_tok long, start_off long, pack_first long, pack_last long, n_packs long"
)


@query("pack_chunks", oracle=_PACK_ORACLE, survey="pack-sequences,F1,D7,I3")
def pack_chunks(spark, sf_dir):
    toks = (
        _words_df(spark, sf_dir)
        .select(F.col("doc_id").cast("long").alias("doc_id"), _n_tok(F.col("ws")).alias("n_tok"))
        .where(F.col("n_tok") > 0)
    )
    n_parts = max(spark.sparkContext.defaultParallelism, 1)
    # localCheckpoint (NOT persist): the collected prefix offsets are only
    # valid for the exact partition assignment that produced them, and
    # repartitionByRange SAMPLES its split points — a cache-evicted persist
    # could re-execute the exchange with re-sampled boundaries and silently
    # shift every offset.  Checkpointing materializes the assignment once
    # (recompute impossible), and the blocks are reclaimed by the
    # ContextCleaner when the frame is GC'd — nothing outlives the query.
    ranged = (
        toks.repartitionByRange(n_parts, "doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    partials = {
        r["_pid"]: r["s"]
        for r in ranged.groupBy("_pid").agg(F.sum("n_tok").alias("s")).collect()
    }
    if not partials:
        # empty corpus: F.create_map() with no entries types as
        # map<string,string>, so the int-keyed element_at below would fail at
        # ANALYSIS — return the (empty) output frame directly instead
        return spark.createDataFrame([], _PACK_SCHEMA)
    prefix: dict[int, int] = {}
    acc = 0
    for pid in sorted(partials):
        prefix[pid] = acc
        acc += partials[pid]
    pref = F.create_map(
        *[x for pid, off in prefix.items() for x in (F.lit(pid), F.lit(off).cast("long"))]
    )
    w = W.partitionBy("_pid").orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = F.sum("n_tok").over(w) + F.element_at(pref, F.col("_pid"))
    start = (cum - F.col("n_tok")).alias("start_off")
    pack_first = (start / F.lit(MAX_LEN)).cast("long")
    pack_last = ((cum - 1) / F.lit(MAX_LEN)).cast("long")
    return ranged.select(
        "doc_id",
        "n_tok",
        start,
        pack_first.alias("pack_first"),
        pack_last.alias("pack_last"),
        (pack_last - pack_first + 1).alias("n_packs"),
    )


# =========================================================================
# Pack ASSEMBLY — materialize the packed training rows pack_chunks only
# addresses.  Token values are derived with a deterministic subword rule
# shared bit-for-bit with the oracle (token = ascii(first char of the
# 4-char chunk) * 256 + chunk length), so the reconstruction is exactly
# checkable end-to-end.  Plan shape at 10^9 docs:
# - offsets come from pack_chunks' distributed prefix sum (no global
#   window);
# - each doc explodes into one row PER PACK IT TOUCHES (≥1, ≤2 for docs
#   shorter than MAX_LEN — fan-out ∝ corpus tokens / MAX_LEN, not docs²);
# - assembly is ONE shuffle on pack_id with per-group state bounded by
#   MAX_LEN tokens; the pack content is fingerprinted (md5 of the joined
#   token stream) so result rows stay metadata-sized however long the
#   packs are.
# =========================================================================

_ASSEMBLE_ORACLE = f"""
WITH w AS (
  SELECT doc_id, {_words_sql("text")} AS ws FROM documents
), tok AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         flatten(list_transform(ws, w -> list_transform(
           generate_series(0, (len(w) + 3) // 4 - 1),
           j -> CAST(ascii(substr(w, j*4 + 1, 1)) * 256
                     + len(substr(w, j*4 + 1, 4)) AS BIGINT)
         ))) AS toks
  FROM w
), t AS (
  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tok FROM tok WHERE len(toks) > 0
), c AS (
  SELECT doc_id, toks, n_tok,
         CAST(SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tok
              AS BIGINT) AS start_off
  FROM t
), pieces AS (
  SELECT c.doc_id, p.pack_id,
         GREATEST(c.start_off, p.pack_id * {MAX_LEN}) AS a,
         LEAST(c.start_off + c.n_tok, (p.pack_id + 1) * {MAX_LEN}) AS b,
         c.toks[(GREATEST(c.start_off, p.pack_id * {MAX_LEN}) - c.start_off + 1)
                : (LEAST(c.start_off + c.n_tok, (p.pack_id + 1) * {MAX_LEN}) - c.start_off)]
           AS piece
  FROM c, LATERAL (
    SELECT unnest(generate_series(c.start_off // {MAX_LEN},
                                  (c.start_off + c.n_tok - 1) // {MAX_LEN})) AS pack_id
  ) p
)
SELECT CAST(pack_id AS BIGINT) AS pack_id,
       CAST(SUM(b - a) AS BIGINT) AS n_tok,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       md5(array_to_string(flatten(list(piece ORDER BY a)), ',')) AS tokens_md5
FROM pieces GROUP BY pack_id
"""


def _subword_tokens(ws_col):
    """array<long> of deterministic subword token ids for a words array —
    the token-VALUE companion of ``_n_tok`` (same chunking, so sizes agree)."""
    def word_tokens(w):
        n_chunks = F.floor((F.length(w) + 3) / 4).cast("int")
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda j: (
                F.ascii(w.substr(j * 4 + 1, F.lit(1))) * 256
                + F.length(w.substr(j * 4 + 1, F.lit(4)))
            ).cast("long"),
        )

    return F.flatten(F.transform(ws_col, word_tokens))


@query(
    "pack_assemble",
    oracle=_ASSEMBLE_ORACLE,
    survey="pack-sequences,I3,H-array,D4",
)
def pack_assemble(spark, sf_dir):
    """Materialized GPT-style packs: concat the corpus token stream in
    doc_id order, cut into MAX_LEN rows, fingerprint each pack's exact
    token sequence.  Offsets reuse pack_chunks' distributed prefix sum."""
    offs = pack_chunks(spark, sf_dir).select(
        "doc_id", "n_tok", "start_off", "pack_first", "pack_last"
    )
    toks = _words_df(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        _subword_tokens(F.col("ws")).alias("toks"),
    )
    L = F.lit(MAX_LEN)
    pieces = (
        offs.join(toks, "doc_id")
        .select(
            "doc_id", "start_off", "n_tok", "toks",
            F.explode(F.sequence("pack_first", "pack_last")).alias("pack_id"),
        )
        .select(
            "pack_id",
            F.greatest(F.col("start_off"), F.col("pack_id") * L).alias("a"),
            F.least(F.col("start_off") + F.col("n_tok"), (F.col("pack_id") + 1) * L).alias("b"),
            "start_off", "toks",
        )
        .select(
            "pack_id", "a",
            (F.col("b") - F.col("a")).alias("n_piece"),
            F.slice(
                F.col("toks"),
                (F.col("a") - F.col("start_off") + 1).cast("int"),
                (F.col("b") - F.col("a")).cast("int"),
            ).alias("piece"),
        )
    )
    assembled = F.flatten(
        F.transform(
            F.array_sort(F.collect_list(F.struct("a", "piece"))), lambda x: x["piece"]
        )
    )
    return pieces.groupBy("pack_id").agg(
        F.sum("n_piece").cast("long").alias("n_tok"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.md5(
            F.array_join(F.transform(assembled, lambda t: t.cast("string")), ",")
        ).alias("tokens_md5"),
    ).select(F.col("pack_id").cast("long").alias("pack_id"), "n_tok", "n_docs", "tokens_md5")
