"""Property-based determinism (SURVEY.md §5 promise): the final table state
is a pure function of the event SET — independent of delivery order, epoch
partitioning, duplicate redelivery, and engine parallelism knobs.

Hypothesis generates small random event logs (ops, keys, duplicates) and a
random epoch partitioning; the engine's final state must equal the pandas
replay oracle every time.  Examples are kept small and few — each example
runs real Spark jobs.
"""

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from clin_variant_etl_spark.engine import CdcPipeline, create_cdc_table
from clin_variant_etl_spark.engine.oracle import assert_state_equals, replay_oracle
from clin_variant_etl_spark.schemas import BASE_DOCS_SCHEMA

EV_DDL = "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string"

# one random event: (lsn handled globally), key index, op, token seed
event = st.tuples(
    st.integers(min_value=0, max_value=5),  # key index (collisions guaranteed)
    st.sampled_from(["I", "U", "U", "D"]),
    st.integers(min_value=0, max_value=99),
)
case = st.tuples(
    st.lists(event, min_size=1, max_size=25),
    st.lists(st.integers(min_value=0, max_value=2), min_size=1, max_size=25),  # epoch of each event
    st.integers(min_value=0, max_value=10_000),  # duplicate-mask seed
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(case)
def test_any_partitioning_yields_oracle_state(spark, tmp_path_factory, data):
    events, epoch_of, dup_seed = data
    rows = []
    for i, (ki, op, seed) in enumerate(events):
        lsn = i + 1
        toks = None if op == "D" else [seed, seed % 7]
        rows.append(
            {
                "lsn": lsn,
                "op": op,
                "doc_id": f"d{ki}",
                "tokens": toks,
                "n_tok": None if op == "D" else 2,
                "source": None if op == "D" else "web",
                "epoch": epoch_of[i % len(epoch_of)],
            }
        )
    # deterministic duplicate redelivery: every third row (offset by seed)
    dups = [dict(r) for j, r in enumerate(rows) if (j + dup_seed) % 3 == 0]
    for d in dups:
        d["epoch"] = min(d["epoch"] + 1, 2)  # redelivered later
    all_rows = rows + dups

    tmp = tmp_path_factory.mktemp("det")
    create_cdc_table(str(tmp / "t"), BASE_DOCS_SCHEMA, n_buckets=4)
    pipe = CdcPipeline(spark, str(tmp / "t"), n_salts=3)
    for ep in range(3):
        batch = [r for r in all_rows if r["epoch"] == ep]
        df = spark.createDataFrame(
            [
                (r["lsn"], r["op"], r["doc_id"], r["tokens"], r["n_tok"], r["source"])
                for r in batch
            ]
            or [],
            EV_DDL,
        )
        pipe.apply_epoch(df, ep)

    oracle = replay_oracle(
        pd.DataFrame(
            [
                {k: r[k] for k in ("lsn", "op", "doc_id", "tokens", "n_tok", "source")}
                for r in all_rows
            ]
        )
    )
    assert_state_equals(pipe.read_state(), oracle)
