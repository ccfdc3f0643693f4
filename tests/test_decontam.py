"""Planted-contamination semantics for decontaminate_benchmark.

The parity suite (test_oracle_parity) already hash-matches the operator
against its DuckDB oracle on the sf fixtures; this file checks the SEMANTICS
on a planted corpus: a doc that copies a 5-gram run from a benchmark doc is
flagged, an unrelated doc is not, and the hit counts are the distinct-gram
overlaps.
"""

from __future__ import annotations

import os
import tempfile

import pytest

BENCH_TEXT = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
CLEAN_TEXT = "one two three four five six seven eight nine ten eleven"
# copies the run "charlie delta echo foxtrot golf hotel" from the benchmark
# doc -> 5-gram overlaps: "charlie delta echo foxtrot golf" and
# "delta echo foxtrot golf hotel" (2 distinct contaminated grams)
DIRTY_TEXT = "zz yy charlie delta echo foxtrot golf hotel xx ww vv"
SHORT_TEXT = "too few words here"  # < 5 words -> no shingles, out of scope


@pytest.fixture(scope="module")
def planted_dir(spark):
    d = tempfile.mkdtemp(prefix="decontam_")
    rows = [
        (97, BENCH_TEXT, "en", "bench", len(BENCH_TEXT)),   # 97 % 97 == 0
        (1, DIRTY_TEXT, "en", "web", len(DIRTY_TEXT)),
        (2, CLEAN_TEXT, "en", "web", len(CLEAN_TEXT)),
        (3, SHORT_TEXT, "en", "web", len(SHORT_TEXT)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def test_planted_contamination(spark, planted_dir):
    from clin_variant_etl_spark.queries.textops import (
        clear_words_cache,
        decontaminate_benchmark,
    )

    clear_words_cache()
    try:
        out = {r["doc_id"]: r for r in decontaminate_benchmark(spark, planted_dir).collect()}
    finally:
        clear_words_cache()

    # benchmark doc itself is not in the corpus output
    assert 97 not in out
    # short doc has no 5-grams -> out of scope
    assert 3 not in out

    dirty, clean = out[1], out[2]
    assert dirty["contaminated"] and dirty["n_hits"] == 2
    assert dirty["n_grams"] == len(DIRTY_TEXT.split()) - 4  # all distinct
    assert not clean["contaminated"] and clean["n_hits"] == 0


def test_plan_is_broadcast_probe(spark, planted_dir):
    """The benchmark gram set must join as a broadcast hash probe — the
    exploded corpus side never shuffles before the per-doc aggregation."""
    from clin_variant_etl_spark.queries.textops import decontaminate_benchmark

    plan = decontaminate_benchmark(spark, planted_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
