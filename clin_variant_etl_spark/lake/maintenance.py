"""Table maintenance: compaction + snapshot expiry.

Reference analogue: Delta ``compact`` (to ~100 files per chromosome) and
``vacuum`` (keep 2 versions) in the publish step
(etl/normalized/Consequences.scala:135-138; etl/script/schema/SchemaUtils.scala:46-89).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .table import LakeTable, Snapshot


def compact(
    spark: SparkSession,
    table: LakeTable,
    drop_tombstones: bool = False,
    deleted_col: str = "_deleted",
    lsn_col: str = "_last_lsn",
    lsn_horizon: int | None = None,
) -> Snapshot:
    """Rewrite the table into one file per partition (small-files compaction).

    ``drop_tombstones`` physically removes delete markers.  A tombstone at
    lsn L guards against late updates with lsn < L (SURVEY.md §7.4 hard part
    #1): removing it early would let such a late event resurrect the row.
    ``lsn_horizon`` is the caller's promise that no event with
    lsn < horizon can still arrive (e.g. the source's retention low-water
    mark): only tombstones BELOW the horizon are dropped; newer tombstones
    are kept so the LSN guard stays intact.  ``lsn_horizon=None`` with
    ``drop_tombstones=True`` drops them all (caller asserts the stream is
    fully drained forever).
    """
    from pyspark.sql import functions as F

    snap = table.current_snapshot()
    df = table.read(spark)
    if drop_tombstones and deleted_col in df.columns:
        dead = F.coalesce(df[deleted_col], F.lit(False))
        if lsn_horizon is not None and lsn_col in df.columns:
            df = df.where(~(dead & (df[lsn_col] < lsn_horizon)))
        else:
            df = df.where(~dead)
    files = table.write_data_files(df, snap.schema_id, snap.partition_spec)
    return table.commit("compact", files, replace_all=True)


def expire_snapshots(table: LakeTable, keep_last: int = 2) -> list[int]:
    """Delete old snapshot manifests (and their now-unreferenced manifest
    shards) and garbage-collect unreferenced data files."""
    ids = table.snapshot_ids()
    if len(ids) <= keep_last:
        return []
    expired, kept = ids[:-keep_last], ids[-keep_last:]
    referenced: set[str] = set()
    kept_shards: set[str] = set()
    for sid in kept:
        s = table.snapshot(sid)
        for f in s.files:
            referenced.add(f["path"])
        for m in s.manifests:
            kept_shards.add(m["path"])
    candidates: set[str] = set()
    old_shards: set[str] = set()
    for sid in expired:
        s = table.snapshot(sid)
        for f in s.files:
            candidates.add(f["path"])
        for m in s.manifests:
            old_shards.add(m["path"])
    for rel in (candidates - referenced) | (old_shards - kept_shards):
        p = os.path.join(table.path, rel)
        if os.path.exists(p):
            os.unlink(p)
    for sid in expired:
        os.unlink(os.path.join(table.meta_dir, f"v{sid:08d}.json"))
    return expired
