"""The nested frequency cascade builds REAL nested columns (map keyed by
status, array of per-analysis struct-of-structs, top-level struct-of-structs)
— the flattened driver query is value-gated in test_oracle_parity; here the
nested intermediate's shape and re-aggregation invariants are asserted."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from clin_variant_etl_spark.queries.freq_cascade import freq_cascade_nested

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")


def test_nested_schema_shape(spark):
    df = freq_cascade_nested(spark, SF_DIR)
    s = df.schema

    fba = s["frequencies_by_analysis"].dataType
    assert isinstance(fba, T.ArrayType)
    entry = fba.elementType
    assert isinstance(entry, T.StructType)
    assert [f.name for f in entry.fields] == [
        "analysis_code", "affected", "non_affected", "total",
    ]
    for status in ("affected", "non_affected", "total"):
        freq = entry[status].dataType
        assert isinstance(freq, T.StructType)
        assert [f.name for f in freq.fields] == ["ac", "an", "af", "hom"]

    rqdm = s["frequency_RQDM"].dataType
    assert isinstance(rqdm, T.StructType)
    assert [f.name for f in rqdm.fields] == ["affected", "non_affected", "total"]
    assert isinstance(rqdm["total"].dataType, T.StructType)


def test_partials_reaggregate_consistently(spark):
    """Level-3 totals must equal the sum of level-2 per-analysis totals —
    i.e. each level aggregates the previous level's partials, losslessly."""
    rows = freq_cascade_nested(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        entries = r["frequencies_by_analysis"]
        assert len(entries) >= 1
        for part in ("ac", "an", "hom"):
            assert sum(e["total"][part] for e in entries) == r["frequency_RQDM"]["total"][part]
            assert (
                sum(e["affected"][part] for e in entries)
                == r["frequency_RQDM"]["affected"][part]
            )
        # affected + non_affected partials recompose the total at every level
        for e in entries:
            for part in ("ac", "an", "hom"):
                assert e["affected"][part] + e["non_affected"][part] == e["total"][part]
