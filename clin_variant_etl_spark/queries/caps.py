"""Bucket-size caps for LSH-style candidate generation.

Every bucketed similarity path (MinHash bands, SimHash bands, hyperplane
buckets) generates candidate pairs through an equi-join on the bucket key, so
pair fan-out per bucket is O(bucket²).  A degenerate bucket (boilerplate
documents, an all-zeros embedding cluster) turns one key into a quadratic
hot spot — the same skewed-key failure mode as the CDC merge, handled the
same way the shingle MAX_DF cap handles hot shingles: a count-only aggregate
finds over-cap buckets and a semi-join drops their rows BEFORE the pair
join.  Dropping a bucket trades recall for a hard fan-out bound, which is
the standard LSH production posture (an over-cap bucket's members are
near-identical en masse and are better handled by the exact-dedup pass).

The default cap (``DEFAULT_BUCKET_CAP``) is far above any bucket observed at
the test scale factors, so gated oracles are byte-identical with the cap
active on every run — the capped path is the ONLY path, not a dark one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_BUCKET_CAP = 10_000


def cap_buckets(
    df: DataFrame,
    keys: list[str],
    cap: int = DEFAULT_BUCKET_CAP,
    observation=None,
) -> DataFrame:
    """Rows of buckets (grouped by ``keys``) whose size exceeds ``cap`` are
    dropped; everything else passes through unchanged.

    ``observation`` (a ``pyspark.sql.Observation``): when given, the count
    aggregate is instrumented with ``overcap_buckets`` / ``dropped_rows``
    metrics — observability rides the aggregation that runs anyway, no extra
    job (the same ``observe`` pattern as the CDC apply stats).

    Plan shape: one shuffle for the count, one semi-join on the bucket key;
    the downstream pair join shuffles on the same key, so the join's
    partitioning is reused.  Aggregation state is one long per bucket.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_bucket_n"))
    if observation is not None:
        counts = counts.observe(
            observation,
            F.sum(F.when(F.col("_bucket_n") > cap, 1).otherwise(0)).alias(
                "overcap_buckets"
            ),
            F.sum(F.when(F.col("_bucket_n") > cap, F.col("_bucket_n")).otherwise(0)).alias(
                "dropped_rows"
            ),
        )
    kept = counts.where(F.col("_bucket_n") <= cap).select(*keys)
    return df.join(kept, keys, "left_semi")


def cap_buckets_fused(
    df: DataFrame, keys: list[str], cap: int = DEFAULT_BUCKET_CAP
) -> DataFrame:
    """Window-fused variant of :func:`cap_buckets` — identical semantics
    (rows of over-cap buckets dropped), different plan shape: the bucket
    count rides a window partitioned by the SAME key the downstream pair
    join shuffles on, so the cap costs zero extra Spark jobs and the
    window's hash partitioning is inherited by the join (no re-exchange;
    the self-join's two identical branches collapse to a ReusedExchange).

    Prefer this when ``df`` is already materialized (checkpointed band
    frames); ``cap_buckets``' count+semi-join shape remains better when the
    count can run on a much slimmer projection than the payload rows.

    Null-key rows are dropped up front to match ``cap_buckets`` exactly
    (its left-semi join never matches a null key; a window would instead
    group all nulls into one kept partition).
    """
    if "_bucket_n" in df.columns:  # not assert: must survive python -O
        raise ValueError("_bucket_n is reserved by cap_buckets_fused")
    for k in keys:
        df = df.where(F.col(k).isNotNull())
    w = Window.partitionBy(*keys)
    return (
        df.withColumn("_bucket_n", F.count(F.lit(1)).over(w))
        .where(F.col("_bucket_n") <= cap)
        .drop("_bucket_n")
    )
