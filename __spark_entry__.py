"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``    — flagship CDC query on /root/testdata/sf0.001.
- ``queries()``       — every implemented operator from SURVEY.md §2 plus the
  training-data pipeline family (dedup / similarity / text / multimodal),
  registered in ``clin_variant_etl_spark/queries/``.
- ``oracle_sql()``    — DuckDB-equivalent ANSI SQL per query (exact-match
  discipline documented in clin_variant_etl_spark/queries/registry.py).

50-slot rotation policy (the driver records CORRECTNESS rows for the first
50 registry entries; the registry therefore pins EXACTLY 50 ``gate=True``
queries — see queries/registry.py DRIVER_GATE_CAP).  Queries beyond the cap
are ``gate=False``: still benchable and hash-verified under the identical
compare contract by tests/test_oracle_parity.py, just without a driver row
THIS round.  Slots rotate so every query gets a driver row in some round:

  round 5 state (this file is the authoritative rotation record):
  - rotated IN for r5 — the entire never-driver-checked backlog with an
    exact oracle (18 queries, each one's first driver row):
      multimodal_png_decode, multimodal_bmp_decode, pack_assemble,
      text_segment_dedup, ann_ivf_topk, tfidf_top_terms,
      doc_length_quantiles, rollup_customers_by_nation_segment,
      pivot_user_event_counts, running_user_spend, stratified_hash_sample,
      scan_vcf_info, top_tokens_per_lang, text_repetition_stats,
      sliding_hourly_activity, brands_both_expensive_and_large,
      embed_quantize_int8, train_holdout_split
    After this round every registered query with an oracle has had at
    least one driver CORRECTNESS row; the only never-gated query is
    approx_distinct_users_by_type (rows-only BY DESIGN — a sketch; its
    ≤5% error bound is pinned at two scales by tests/test_sketches.py).
  - rotated OUT for r5 (driver rows green in ALL of r1-r4; every survey
    code still covered by a gated sibling — verified by
    tests/test_gate_rotation.py):
      q1_pricing_summary, q5_nation_revenue, ship_latency_histogram,
      interval_overlap_best, cdc_latest_state, cdc_latest_by_lsn_salted,
      cdc_net_state_ops, cdc_out_of_order, cdc_duplicate_invariant,
      session_stats_per_user, tumbling_hourly_activity, part_type_tokens,
      embedding_array_stats, scan_csv_options, brands_expensive_not_cheap,
      ann_topk_bruteforce, embed_cosine_pairs_lsh, multimodal_decode_features
    (All remain benched in bench.py and exact-parity-tested in the suite;
    the CDC-engine semantics stay driver-gated through
    cdc_engine_full_replay / cdc_engine_mor_replay / scd1 / upsert.)

  round 4 state (historical):
  - gated since r4 (never driver-checked in r1-r3):
      multimodal_wav_decode, multimodal_frame_sample, pack_chunks,
      decontaminate_benchmark, cdc_engine_mor_replay (new in r4)
  - rotated OUT in r4 (driver rows green in r01-r03; every survey code
    still covered by a gated sibling):
      null_normalize_status, map_agg_source_counts, struct_mutation,
      richest_customer_per_nation, dedup_simhash
  - suite-only since r2/r3 (each a labeled baseline or a sibling of a
    gated query covering the same survey rows):
      embed_cosine_pairs (all-pairs baseline of embed_cosine_pairs_lsh),
      brand_part_stats, orders_month_priority, customer_name_parse,
      union_order_events
  - suite-only, new in r4 (survey rows already gated via
    ann_topk_bruteforce / embed_cosine_pairs_lsh):
      ann_ivf_topk (exact DuckDB oracle in tests/test_oracle_parity.py;
      recall-vs-bruteforce pinned in tests/test_banded_lsh.py)
  - mid-r4 swap (both outgoing queries driver-green r01-r03):
      IN:  dedup_clusters (iterative connected components — recursive-CTE
           oracle), attribution_last_touch (as-of join — verified against
           DuckDB's NATIVE ASOF JOIN, an independent engine implementation)
      OUT: ann_lsh_buckets (sim-LSH family stays gated via
           embed_cosine_pairs_lsh), driver_scalar_share (the D7 scalar→lit
           pattern stays in tfidf_top_terms / multimodal's F3 count rule)
  - suite-only, new mid-r4 (codes covered by gated siblings):
      top_tokens_per_lang, tfidf_top_terms (heavy hitters / TF-IDF),
      text_repetition_stats (Gopher repetition filters),
      scan_vcf_info (the A1 VCF contract made first-class),
      multimodal_bmp_decode (real stdlib image codec, the WAV sibling),
      multimodal_png_decode (real COMPRESSED codec: zlib DEFLATE, chunk
      CRCs, full scanline unfiltering),
      text_segment_dedup (CCNet-style corpus boilerplate-segment removal
      with full-reconstruction md5 oracle),
      pack_assemble (materialized GPT-style packed sequences; per-pack
      exact token-stream fingerprint oracle)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clin_variant_etl_spark.queries import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC latest-state-per-key (keep-max-LSN dedup, the engine's
    core semantic) over the sf0.001 events table, enriched with a broadcast
    customer-dimension join (reference pattern: etl/normalized/SNV.scala:40).
    """
    from pyspark.sql import functions as F

    from clin_variant_etl_spark.engine.dedup import latest_by_key_salted

    sf_dir = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")

    latest = latest_by_key_salted(
        events.select("user_id", "event_id", "event_type", "value", "ts"),
        key="user_id",
        order_col="event_id",
        n_salts=8,
    )
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_nationkey"
    )
    return (
        latest.join(F.broadcast(dim), "user_id", "left")
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
            F.round(F.col("value") * 100).cast("long").alias("last_value_cents"),
            "c_mktsegment",
            "c_nationkey",
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
