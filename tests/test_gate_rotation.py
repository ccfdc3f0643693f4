"""Pins the driver-gate rotation invariants (__spark_entry__.py docstring is
the authoritative record; this test makes its promises structural):

1. exactly DRIVER_GATE_CAP queries are gated (the driver records rows for
   the first 50 registrations — a 51st gated query would silently never be
   checked);
2. every SURVEY.md §2 code claimed by ANY registered query is carried by at
   least one *gated* query — rotating a query out must never orphan a code;
3. the r5 swap-ins (the never-driver-checked backlog) are all gated, so
   CORRECTNESS_r05 gives each its first driver row;
4. every gated query except the sanctioned sketch has an exact oracle.
"""

from __future__ import annotations

from clin_variant_etl_spark.queries.registry import DRIVER_GATE_CAP, all_queries

R5_SWAP_INS = {
    "multimodal_png_decode", "multimodal_bmp_decode", "pack_assemble",
    "text_segment_dedup", "ann_ivf_topk", "tfidf_top_terms",
    "doc_length_quantiles", "rollup_customers_by_nation_segment",
    "pivot_user_event_counts", "running_user_spend", "stratified_hash_sample",
    "scan_vcf_info", "top_tokens_per_lang", "text_repetition_stats",
    "sliding_hourly_activity", "brands_both_expensive_and_large",
    "embed_quantize_int8", "train_holdout_split",
}

# rows-only BY DESIGN: a mergeable sketch has no exact SQL equivalent; its
# error bound is pinned at two scales by tests/test_sketches.py
ROWS_ONLY_SANCTIONED = {"approx_distinct_users_by_type"}


def _codes(specs):
    out: set[str] = set()
    for s in specs:
        out |= {c for c in s.survey.split(",") if c}
    return out


def test_exactly_cap_gated():
    assert len(all_queries()) == DRIVER_GATE_CAP


def test_no_survey_code_orphaned_by_rotation():
    allq = all_queries(include_suite_only=True)
    gated = all_queries().values()
    # codes carried ONLY by the sanctioned rows-only sketch can't be hash-
    # gated by construction (no exact SQL oracle exists for a sketch)
    exempt = _codes(allq[n] for n in ROWS_ONLY_SANCTIONED)
    exempt -= _codes(s for n, s in allq.items() if n not in ROWS_ONLY_SANCTIONED)
    orphaned = _codes(allq.values()) - _codes(gated) - exempt
    assert not orphaned, f"survey codes with no gated representative: {orphaned}"


def test_r5_swap_ins_are_gated():
    gated = set(all_queries())
    assert R5_SWAP_INS <= gated, f"missing: {R5_SWAP_INS - gated}"


def test_gated_queries_have_exact_oracles():
    for name, spec in all_queries().items():
        if name in ROWS_ONLY_SANCTIONED:
            continue
        assert spec.oracle, f"gated query {name} lacks an exact oracle"
