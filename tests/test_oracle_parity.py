"""Driver-mimicking correctness gate: every registered query runs on Spark AND
its DuckDB oracle over the same parquet tables; results must match exactly —
row count, column-name set, and order-insensitive values (the driver's
value-hash check, reproduced here as sorted-frame equality).

Uses sf0.001 for speed; the driver runs the same contract at sf0.01.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from clin_variant_etl_spark.queries import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame):
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )
    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert a == b, f"{name}.{c}[{i}]: {a!r} != {b!r} (exact float mismatch)"
            else:
                assert a == b or (pd.isna(a) and pd.isna(b)), (
                    f"{name}.{c}[{i}]: {a!r} != {b!r}"
                )


ALL = all_queries(include_suite_only=True)
WITH_ORACLE = sorted(n for n, s in ALL.items() if s.oracle is not None)
NO_ORACLE = sorted(n for n, s in ALL.items() if s.oracle is None)


def test_driver_gate_is_exactly_cap():
    """Every driver-gated query gets a CORRECTNESS row: the gated registry
    must be exactly at (or under) the driver's observed 50-row cap."""
    from clin_variant_etl_spark.queries.registry import DRIVER_GATE_CAP

    gated = all_queries()
    assert len(gated) <= DRIVER_GATE_CAP
    assert all(s.oracle is not None for s in gated.values())


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, ddb, name):
    spec = ALL[name]
    sdf = spec.fn(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    oracle_pdf = ddb.execute(spec.oracle).fetchdf()
    _compare(name, spark_pdf, oracle_pdf)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_runs(spark, name):
    spec = ALL[name]
    sdf = spec.fn(spark, SF_DIR)
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    import importlib.util

    p = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
    mod_spec = importlib.util.spec_from_file_location("__spark_entry__", p)
    mod = importlib.util.module_from_spec(mod_spec)
    mod_spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 4
    # contract coherence: every oracle key is a query key
    q = mod.queries()
    for k in mod.oracle_sql():
        assert k in q
