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
