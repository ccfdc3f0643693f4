"""connected_components unit tests: chain transitivity, isolated vertices,
convergence guard.  The end-to-end dedup_clusters query is covered by
tests/test_oracle_parity.py (exact DuckDB recursive-CTE oracle)."""

import pytest

from pyspark.sql import functions as F

from clin_variant_etl_spark.queries.graphops import connected_components


def _cc(spark, edge_pairs, node_ids, **kw):
    pairs = spark.createDataFrame(edge_pairs, "src: long, dst: long")
    edges = pairs.unionAll(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    nodes = spark.createDataFrame([(n,) for n in node_ids], "doc_id: long")
    out = connected_components(edges, nodes, **kw)
    return {r["doc_id"]: r["cluster_id"] for r in out.collect()}


def test_chain_transitivity(spark):
    # 1-2, 2-3, 3-4 is one component even though 1 and 4 never pair;
    # 10-11 separate; 99 isolated
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11)], [1, 2, 3, 4, 10, 11, 99])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: 99}


def test_min_label_not_first_seen(spark):
    # the min id enters through the far end of the chain: 5-4, 4-3, 3-0
    got = _cc(spark, [(5, 4), (4, 3), (3, 0)], [0, 3, 4, 5])
    assert set(got.values()) == {0}


def test_convergence_guard(spark):
    # diameter 3 cannot converge in 1 iteration
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, [(1, 2), (2, 3), (3, 4)], [1, 2, 3, 4], max_iters=1)
