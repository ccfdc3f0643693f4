"""SPARK_GRAFT_EXTRA_CONF parsing (the spark-submit --conf analogue for the
in-process entry points).  The builder application itself can only be
observed on a fresh JVM (getOrCreate ignores confs on reuse — documented in
session.py), so the contract pinned here is the parse."""

from clin_variant_etl_spark.session import parse_extra_conf


def test_parse_extra_conf():
    assert parse_extra_conf("") == {}
    assert parse_extra_conf("a=1") == {"a": "1"}
    assert parse_extra_conf("a=1;b=x=y") == {"a": "1", "b": "x=y"}  # first = splits
    assert parse_extra_conf(" a = 1 ; b = 2 ;") == {"a": "1", "b": "2"}
    assert parse_extra_conf("a=1;a=2") == {"a": "2"}  # last wins
    assert parse_extra_conf("flag") == {"flag": ""}
