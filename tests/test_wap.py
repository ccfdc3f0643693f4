"""Write-audit-publish: the published ref only ever points at snapshots
that passed QC; failed audits leave readers pinned, and maintenance cannot
expire the published snapshot out from under them."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from clin_variant_etl_spark.lake.maintenance import expire_snapshots
from clin_variant_etl_spark.lake.table import LakeTable, PartitionField
from clin_variant_etl_spark.lake.wap import audit_and_publish
from clin_variant_etl_spark.qc import QCError, should_not_contain_duplicates

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)

CHECKS = {"no_dup_keys": lambda df: should_not_contain_duplicates(df, "k")}


def _commit(spark, t, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    t.commit("append", t.write_data_files(df, 0, t.partition_spec))


def test_failed_audit_keeps_readers_on_last_good_snapshot(spark, tmp_path):
    t = LakeTable.create(
        str(tmp_path / "t"), SCHEMA, [PartitionField("bucket", "k", "bucket", 2)]
    )
    _commit(spark, t, [(1, "a"), (2, "b")])
    good_sid, results = audit_and_publish(spark, t, CHECKS)
    assert all(r.passed for r in results)
    assert t.resolve_ref("published") == good_sid

    # a bad load lands: duplicate key 2 — writers commit freely
    _commit(spark, t, [(2, "dup"), (3, "c")])
    bad_sid = t.current_snapshot().snapshot_id
    with pytest.raises(QCError, match="no_dup_keys"):
        audit_and_publish(spark, t, CHECKS)

    # the ref did not move; ref-readers see the audited rows only
    assert t.resolve_ref("published") == good_sid
    ref_rows = sorted(r["k"] for r in t.read(spark, ref="published").collect())
    assert ref_rows == [1, 2]
    # the write branch is ahead of the ref (bad snapshot exists, unpublished)
    assert bad_sid > good_sid
    assert sorted(r["k"] for r in t.read(spark).collect()) == [1, 2, 2, 3]


def test_fix_then_publish_advances_and_audit_pins_candidate(spark, tmp_path):
    t = LakeTable.create(
        str(tmp_path / "t"), SCHEMA, [PartitionField("bucket", "k", "bucket", 2)]
    )
    _commit(spark, t, [(1, "a")])
    audit_and_publish(spark, t, CHECKS)

    _commit(spark, t, [(2, "b")])
    fixed_sid = t.current_snapshot().snapshot_id
    # a commit racing the audit must not change what gets published: pass
    # the candidate id explicitly, then land another (bad) commit before
    # publish would have read "current"
    _commit(spark, t, [(2, "racer-dup")])
    sid, _ = audit_and_publish(spark, t, CHECKS, snapshot_id=fixed_sid)
    assert sid == fixed_sid
    assert t.resolve_ref("published") == fixed_sid
    assert sorted(r["k"] for r in t.read(spark, ref="published").collect()) == [1, 2]


def test_expiry_never_drops_the_published_snapshot(spark, tmp_path):
    t = LakeTable.create(
        str(tmp_path / "t"), SCHEMA, [PartitionField("bucket", "k", "bucket", 2)]
    )
    _commit(spark, t, [(1, "a")])
    good_sid, _ = audit_and_publish(spark, t, CHECKS)
    for i in range(3):  # unaudited commits pile up ahead of the ref
        _commit(spark, t, [(10 + i, "x")])
    expired = expire_snapshots(t, keep_last=1)
    assert good_sid not in expired
    # published readers still resolve and read their snapshot
    assert sorted(r["k"] for r in t.read(spark, ref="published").collect()) == [1]
