"""Property-based checks (hypothesis) for the two operators with the most
intricate hand-rolled logic, against INDEPENDENT reference implementations:

- connected_components vs a classic union-find over random graphs;
- asof_join vs pandas.merge_asof over random per-key event times.

Example counts are small (Spark round-trip per example) but the generators
cover the shapes unit tests miss: self-edges, duplicate edges, isolated
nodes, equal timestamps, empty sides.
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from clin_variant_etl_spark.queries.asof import asof_join
from clin_variant_etl_spark.queries.graphops import connected_components

pytestmark = pytest.mark.filterwarnings("ignore")

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min label per component
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    return {n: min(m) for r, m in comp.items() for n in m}


@settings(**_SETTINGS)
@given(
    n_nodes=st.integers(min_value=1, max_value=14),
    edge_pairs=st.lists(
        st.tuples(st.integers(0, 13), st.integers(0, 13)), max_size=25
    ),
)
def test_connected_components_matches_union_find(spark, n_nodes, edge_pairs):
    nodes = list(range(n_nodes))
    edges = [(a, b) for a, b in edge_pairs if a < n_nodes and b < n_nodes and a != b]
    want = _union_find(nodes, edges)
    e = spark.createDataFrame(
        [(a, b) for a, b in edges] + [(b, a) for a, b in edges] or [(0, 0)],
        "src: long, dst: long",
    )
    if not edges:
        e = e.limit(0)
    nd = spark.createDataFrame([(n,) for n in nodes], "doc_id: long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(e, nd, max_iters=40).collect()
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    left_rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=12
    ),
    right_rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)), max_size=12
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, left_rows, right_rows):
    # unique right (key, ts): keep max payload id per (key, ts) — the
    # operator's documented pre-dedup contract (pandas merge_asof requires
    # sorted unique-ish right too)
    lp = pd.DataFrame(
        [(k, pd.Timestamp(2024, 1, 1) + pd.Timedelta(seconds=t), i)
         for i, (k, t) in enumerate(left_rows)],
        columns=["k", "ts", "lid"],
    )
    rp = (
        pd.DataFrame(
            [(k, pd.Timestamp(2024, 1, 1) + pd.Timedelta(seconds=t), i)
             for i, (k, t) in enumerate(right_rows)],
            columns=["k", "ts", "rid"],
        )
        .groupby(["k", "ts"], as_index=False)["rid"].max()
    )
    if len(rp) == 0:
        want = {int(i): None for i in lp["lid"]}
    else:
        want_df = pd.merge_asof(
            lp.sort_values(["ts", "lid"], kind="stable"),
            rp.sort_values("ts", kind="stable"),
            on="ts",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        )
        want = {
            int(r["lid"]): (None if pd.isna(r["rid"]) else int(r["rid"]))
            for _, r in want_df.iterrows()
        }

    left = spark.createDataFrame(
        [(int(k), ts.to_pydatetime(), int(i)) for k, ts, i in lp.itertuples(index=False)],
        "k: long, lts: timestamp_ntz, lid: long",
    )
    right = spark.createDataFrame(
        [(int(k), ts.to_pydatetime(), int(i)) for k, ts, i in rp.itertuples(index=False)],
        "k: long, rts: timestamp_ntz, rid: long",
    ) if len(rp) else spark.createDataFrame([], "k: long, rts: timestamp_ntz, rid: long")
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts", right_cols=["rid"]
        ).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# The flagship property: a RANDOM event log (ops, keys, duplicate
# redeliveries, arbitrary epoch placement = late delivery) applied through
# the real pipeline equals the last-writer-wins oracle computed in pure
# python.  Complements tests/test_matrix.py's hand-written case table with
# hypothesis-shrunk adversarial sequences, in both apply modes.
# ---------------------------------------------------------------------------
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow, HealthCheck.data_too_large])
@given(
    data=st.lists(  # (key, op_code 0=I/1=U/2=D, epoch, duplicate?)
        st.tuples(st.integers(0, 4), st.integers(0, 2), st.integers(0, 2),
                  st.booleans()),
        min_size=1,
        max_size=18,
    ),
    apply_mode=st.sampled_from(["cow", "mor"]),
)
def test_random_event_log_matches_lww_oracle(spark, tmp_path_factory, data, apply_mode):
    ops = "IUD"
    events = []  # (epoch, lsn, op, key, tokens)
    for lsn, (k, oc, ep, dup) in enumerate(data, start=1):
        op = ops[oc]
        toks = [lsn] if op != "D" else None
        events.append((ep, lsn, op, f"doc{k}", toks))
        if dup:
            events.append((min(ep + 1, 2), lsn, op, f"doc{k}", toks))

    # pure-python last-writer-wins oracle (dedup by lsn, max lsn per key wins)
    best = {}
    for _, lsn, op, key, toks in events:
        if key not in best or lsn > best[key][0]:
            best[key] = (lsn, op, toks)
    want = {k: toks for k, (_, op, toks) in best.items() if op != "D"}

    tmp = tmp_path_factory.mktemp("prop_cdc")
    from clin_variant_etl_spark.engine import CdcPipeline, create_cdc_table
    from clin_variant_etl_spark.schemas import BASE_DOCS_SCHEMA

    create_cdc_table(str(tmp / "docs"), BASE_DOCS_SCHEMA, n_buckets=2)
    pipe = CdcPipeline(spark, str(tmp / "docs"), apply_mode=apply_mode)
    for k, epoch in enumerate(sorted({e[0] for e in events})):
        rows = [
            (lsn, op, key, toks, len(toks) if toks else None, "web" if toks else None)
            for (ep, lsn, op, key, toks) in events
            if ep == epoch
        ]
        df = spark.createDataFrame(
            rows, "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string"
        )
        pipe.apply_epoch(df, k)
    got = {r["doc_id"]: r["tokens"] for r in pipe.read_state().collect()}
    assert got == want
