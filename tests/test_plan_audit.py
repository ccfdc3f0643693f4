"""Plan-shape audit over the WHOLE registry: no registered query may plan a
CartesianProduct, and BroadcastNestedLoopJoin is allowed only where it is
the documented design (a SMALL broadcast side swept against a linear scan —
cost ∝ corpus, not corpus²).  This is the structural guard behind every
docstring's "never all-pairs" claim: a future edit that drops a join key or
defeats a band prefilter fails here, not at 100 TB.
"""

import pytest

from clin_variant_etl_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"

# BNLJ sanctioned designs: {query: why linear, not quadratic}
BNLJ_OK = {
    # labeled all-pairs correctness baseline for the LSH path (simops.py);
    # excluded from the driver gate, kept deliberately
    "embed_cosine_pairs": "labeled all-pairs baseline",
    # tiny broadcast query set (k rows) swept once over the corpus — the
    # documented brute-force ANN baseline, cost ∝ corpus
    "ann_topk_bruteforce": "broadcast k-row probe set x one corpus scan",
    # broadcast probe set joined against the nprobe-restricted lists only
    "ann_ivf_topk": "broadcast probe set x nprobe-restricted lists",
    # C8 array-containment theta join against a broadcast dim of <=5 rows;
    # explode_keys_join is the registered shuffle-friendly rewrite
    "array_contains_join": "C8 theta join, broadcast dim rows <= label count",
}

ALL = all_queries(include_suite_only=True)


@pytest.mark.parametrize("name", sorted(ALL))
def test_no_cartesian_or_unsanctioned_bnlj(spark, name):
    df = ALL[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a BroadcastNestedLoopJoin; if this is a deliberate "
            "small-broadcast linear sweep, add it to BNLJ_OK with the reason"
        )


# predicate pushdown reaching the parquet scan — {query: filter fragment
# that must appear inside a PushedFilters list}
PUSHDOWN = {
    "cdc_epoch_slice": "GreaterThanOrEqual(ts",
    "q1_pricing_summary": "LessThanOrEqual(l_shipdate",
    "attribution_last_touch": "EqualTo(event_type,purchase)",
    "running_user_spend": "EqualTo(event_type,purchase)",
}


@pytest.mark.parametrize("name", sorted(PUSHDOWN))
def test_filters_reach_the_scan(spark, name):
    df = ALL[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert PUSHDOWN[name] in pushed, (
        f"{name}: expected '{PUSHDOWN[name]}' inside PushedFilters; got: {pushed!r}"
    )
