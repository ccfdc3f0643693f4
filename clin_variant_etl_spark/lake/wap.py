"""Write-audit-publish (WAP): gate a named ref on a QC audit of the
candidate snapshot, so consumers reading the ref never observe unaudited
data.

The reference runs its QC suite as separate post-deploy apps against the
live table (etl/qc/TestingApp.scala:116-199) — a bad load is visible to
readers until the QC run flags it.  WAP closes that window with the pieces
this lake already has:

- writers commit snapshots freely (the table's "write" branch — snapshot
  isolation means readers of a ref are untouched);
- the audit runs against the CANDIDATE snapshot, pinned by id, never
  "current" (a concurrent commit mid-audit must not swap what was audited);
- only a fully clean audit advances the ref (``LakeTable.publish`` — the
  lock-free versioned alias swap, table.py); a failed audit raises
  ``QCError`` with every broken invariant and leaves the ref where it was.

This is Iceberg's WAP pattern (stage on a branch → audit → fast-forward
publish) expressed over this lake's linear snapshot chain + named-ref
layer: the "branch" is simply the snapshots ahead of the published ref.
``expire_snapshots`` treats refs as retention roots (maintenance.py), so a
published snapshot can never be GC'd out from under its readers while a
failed candidate ahead of it ages out normally.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..qc import CheckResult, handle_errors, run_checks
from .table import LakeTable

__all__ = ["audit_and_publish"]


def audit_and_publish(
    spark: SparkSession,
    table: LakeTable,
    checks: dict[str, Callable[[DataFrame], DataFrame]],
    ref: str = "published",
    snapshot_id: int | None = None,
    max_examples: int = 5,
    reader: Callable[[int], DataFrame] | None = None,
) -> tuple[int, list[CheckResult]]:
    """Audit one snapshot and advance ``ref`` to it iff every check passes.

    ``checks``: {name: candidate_df -> offending_rows_df} — each check
    returns the rows violating its invariant (the qc.py contract: empty =
    pass).  All checks run (no short-circuit); on any failure ``QCError``
    lists every broken invariant with example rows and the ref is NOT
    moved.  Returns (published snapshot id, per-check results).

    The candidate defaults to the RAW snapshot frame
    (``table.read(spark, snapshot_id=sid)``).  On a mor CDC table that
    frame contains unresolved base+delta versions, tombstoned rows, and
    internal columns — visible-state invariants (e.g. no-duplicate-keys)
    would spuriously fail.  For those, pass ``reader``: a callable
    ``snapshot_id -> DataFrame`` producing the VISIBLE state pinned to the
    candidate (e.g. ``lambda sid: pipe.read_state(snapshot_id=sid)`` with a
    CdcPipeline-resolved read); the audit then runs on what consumers of
    the ref will actually see.

    The candidate snapshot id is resolved ONCE up front: commits racing
    the audit cannot change what gets published.
    """
    sid = (
        snapshot_id
        if snapshot_id is not None
        else table.current_snapshot().snapshot_id
    )
    candidate = reader(sid) if reader is not None else table.read(spark, snapshot_id=sid)
    results = run_checks(
        {name: (lambda mk=mk: mk(candidate)) for name, mk in checks.items()},
        max_examples=max_examples,
    )
    handle_errors(results)  # raises QCError; ref untouched
    table.publish(ref, sid)
    return sid, results
