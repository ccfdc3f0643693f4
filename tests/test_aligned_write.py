"""The bucket_m3 aligned-write fast path (engine/apply.py, lake/table.py).

The optimization rests on ONE Spark contract: ``repartition(n, col)`` places
each row in partition ``pmod(murmur3_hash(col), n)`` — the same value
``PartitionField("...", col, "bucket_m3", n).expr()`` computes.  If a Spark
upgrade ever changed HashPartitioning, correctness would NOT break (the
write's partitionBy routes by value), but the skipped exchange would silently
start producing many files per bucket — this test makes that loud.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F


def test_repartition_matches_bucket_m3_expr(spark):
    from clin_variant_etl_spark.lake.table import PartitionField

    n = 8
    df = spark.range(5000).select(
        F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("doc_id")
    )
    pf = PartitionField("bucket", "doc_id", "bucket_m3", n)
    got = (
        df.repartition(n, "doc_id")
        .select(
            F.spark_partition_id().alias("pid"),
            pf.expr().cast("int").alias("bucket"),
        )
        .where(F.col("pid") != F.col("bucket"))
        .count()
    )
    assert got == 0


def test_aligned_replay_matches_oracle_mismatched_shuffle(spark):
    """Full replay through the aligned path with n_buckets deliberately
    different from spark.sql.shuffle.partitions (the alignment must come
    from the explicit repartition(n_buckets, key), not from the session
    conf), asserting exact final-state equality and one file per affected
    bucket per merge commit."""
    from clin_variant_etl_spark.engine import CdcPipeline, create_cdc_table
    from clin_variant_etl_spark.engine.oracle import assert_state_equals, replay_oracle
    from clin_variant_etl_spark.schemas import BASE_DOCS_SCHEMA
    from clin_variant_etl_spark.testgen import (
        EventGenConfig,
        generate_change_events,
        write_events_by_epoch,
    )

    assert int(spark.conf.get("spark.sql.shuffle.partitions")) != 6
    root = tempfile.mkdtemp(prefix="aligned_")
    cfg = EventGenConfig(n_docs=300, n_events=4000, n_epochs=4, seed=7)
    tbl = generate_change_events(cfg)
    ev_dir = os.path.join(root, "events")
    write_events_by_epoch(tbl, ev_dir, 1)
    tpath = os.path.join(root, "table")
    t = create_cdc_table(tpath, BASE_DOCS_SCHEMA, n_buckets=6)
    assert t.partition_spec[0].transform == "bucket_m3"
    pipe = CdcPipeline(spark, tpath, n_salts=2)
    for ep in range(cfg.n_epochs):
        df = spark.read.parquet(os.path.join(ev_dir, f"epoch={ep}"))
        pipe.apply_epoch(df, ep)
        snap = pipe.table.current_snapshot()
        per_bucket: dict[str, int] = {}
        for f in snap.files:
            b = f["partition"]["bucket"]
            per_bucket[b] = per_bucket.get(b, 0) + 1
        # every live bucket holds exactly ONE file: the aligned write puts
        # each bucket's rows in exactly one task, and each merge replaces
        # the affected buckets' previous files
        assert set(per_bucket.values()) == {1}, per_bucket

    assert_state_equals(pipe.read_state(), replay_oracle(tbl.to_pandas()))


def test_pmod_multiple_keeps_alignment(spark):
    """The parallelism guard repartitions into k·n_buckets when the table has
    fewer buckets than cores; pid = pmod(h, k·n) still implies
    pid mod n = pmod(h, n), so each task holds exactly one bucket value."""
    from clin_variant_etl_spark.lake.table import PartitionField

    n, k = 3, 2
    df = spark.range(5000).select(
        F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("doc_id")
    )
    pf = PartitionField("bucket", "doc_id", "bucket_m3", n)
    bad = (
        df.repartition(n * k, "doc_id")
        .select(
            (F.spark_partition_id() % n).alias("pid_mod"),
            pf.expr().cast("int").alias("bucket"),
        )
        .where(F.col("pid_mod") != F.col("bucket"))
        .count()
    )
    assert bad == 0


def test_aligned_replay_few_buckets_wide_cluster(spark):
    """n_buckets below cluster parallelism: the guard widens the merge to
    k·n_buckets tasks; alignment (≤k files per bucket, each file one bucket)
    and exact state both hold."""
    from clin_variant_etl_spark.engine import CdcPipeline, create_cdc_table
    from clin_variant_etl_spark.engine.oracle import assert_state_equals, replay_oracle
    from clin_variant_etl_spark.schemas import BASE_DOCS_SCHEMA
    from clin_variant_etl_spark.testgen import (
        EventGenConfig,
        generate_change_events,
        write_events_by_epoch,
    )

    par = spark.sparkContext.defaultParallelism
    n_b = 2
    assert n_b < par
    k = -(-par // n_b)
    root = tempfile.mkdtemp(prefix="aligned_few_")
    cfg = EventGenConfig(n_docs=200, n_events=2500, n_epochs=3, seed=11)
    tbl = generate_change_events(cfg)
    ev_dir = os.path.join(root, "events")
    write_events_by_epoch(tbl, ev_dir, 1)
    tpath = os.path.join(root, "table")
    create_cdc_table(tpath, BASE_DOCS_SCHEMA, n_buckets=n_b)
    pipe = CdcPipeline(spark, tpath, n_salts=2)
    for ep in range(cfg.n_epochs):
        df = spark.read.parquet(os.path.join(ev_dir, f"epoch={ep}"))
        pipe.apply_epoch(df, ep)
    per_bucket: dict[str, int] = {}
    for f in pipe.table.current_snapshot().files:
        b = f["partition"]["bucket"]
        per_bucket[b] = per_bucket.get(b, 0) + 1
    assert per_bucket and all(1 <= c <= k for c in per_bucket.values()), per_bucket
    assert_state_equals(pipe.read_state(), replay_oracle(tbl.to_pandas()))


def test_aligned_partition_count_skew_guard():
    """k widens with the measured hot-bucket share, never narrows, caps at
    parallelism, and leaves near-uniform histograms at the minimal k."""
    from clin_variant_etl_spark.engine.apply import _aligned_partition_count

    # uniform over 32 buckets at par=8: parallelism guard only (k=1)
    assert _aligned_partition_count(32, 8, [100] * 32, 3200) == 32
    # few-bucket table: k = ceil(par / n_buckets)
    assert _aligned_partition_count(2, 8, [500, 500], 1000) == 2 * 4
    # moderate imbalance below 1.5x uniform share: guard stays disarmed
    assert _aligned_partition_count(8, 8, [140] + [123] * 7, 1001) == 8
    # hot bucket with 50% of keys at n=8 (uniform would be 12.5%):
    # k = ceil(8 * 0.5) = 4 so the hot bucket spreads to ~1/par per task
    assert _aligned_partition_count(8, 8, [500] + [72] * 7, 1004) == 8 * 4
    # fully adversarial (everything in one bucket): k caps at parallelism
    assert _aligned_partition_count(8, 8, [1000] + [0] * 7, 1000) == 8 * 8
    # empty epoch: falls back to the parallelism guard
    assert _aligned_partition_count(8, 8, [], 0) == 8
