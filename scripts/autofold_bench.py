"""Growing-table mor read-latency leg: does the in-loop auto-fold keep
reads flat with NO manual maintain pass?  (VERDICT r4 task #4 'done' bar.)

Protocol: one session, two sequential legs over the SAME deterministic
event stream (insert-heavy so the table grows every epoch):

  autofold leg — CdcPipeline(apply_mode="mor"), auto_fold() after every
                 epoch (exactly the run.py drain/tail wiring);
  plain leg    — identical, hook disabled (the untended control).

After each epoch both legs time ``read_state().count()`` (the resolve
merge over base+delta).  The autofold leg runs FIRST so JVM/JIT warmup
penalizes it, not the control.  Output: BENCH/MOR_AUTOFOLD.json with
per-epoch read seconds + delta file counts for both legs.

Reading the result: the control's read time and delta file count must grow
across epochs; the autofold leg's delta count stays policy-bounded and its
read time flat (ratio of last-3-epoch means reported as the headline).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import MALLOC_TUNE_ENV  # noqa: E402


def reexec():
    if os.environ.get("_SPARK_GRAFT_MALLOC_TUNED") == "1":
        return
    env = dict(os.environ, _SPARK_GRAFT_MALLOC_TUNED="1", **MALLOC_TUNE_ENV)
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def run_leg(spark, events_dir, n_epochs, table_path, fold):
    from clin_variant_etl_spark.engine import CdcPipeline, create_cdc_table
    from clin_variant_etl_spark.lake.maintenance import auto_fold
    from clin_variant_etl_spark.schemas import BASE_DOCS_SCHEMA, INTERNAL_LAST_LSN

    create_cdc_table(table_path, BASE_DOCS_SCHEMA, n_buckets=8)
    pipe = CdcPipeline(spark, table_path, apply_mode="mor")
    reads, deltas, rows = [], [], []
    for ep in range(n_epochs):
        df = spark.read.parquet(os.path.join(events_dir, f"epoch={ep}"))
        pipe.apply_epoch(df, ep)
        if fold:
            auto_fold(spark, pipe.table, ("doc_id", INTERNAL_LAST_LSN),
                      target_file_bytes=128 * 1024 * 1024)
        t0 = time.monotonic()
        n = pipe.read_state().count()
        reads.append(round(time.monotonic() - t0, 3))
        deltas.append(sum(1 for f in pipe.table.current_snapshot().files if f.get("delta")))
        rows.append(n)
    return {"read_sec": reads, "delta_files": deltas, "visible_rows": rows}


def main():
    reexec()
    from clin_variant_etl_spark.session import build_session
    from clin_variant_etl_spark.testgen import (
        EventGenConfig,
        generate_change_events,
        write_events_by_epoch,
    )

    n_epochs = int(os.environ.get("AUTOFOLD_EPOCHS", "20"))
    n_events = int(os.environ.get("AUTOFOLD_EVENTS", "800000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session("autofold-bench", master=f"local[{cpus}]",
                          shuffle_partitions=max(8, cpus))
    root = tempfile.mkdtemp(prefix="autofold_bench_")
    try:
        events = os.path.join(root, "events")
        # insert-heavy: the table grows ~n_docs/epoch, the mor degradation
        # regime the policy exists for
        cfg = EventGenConfig(
            n_docs=n_events // 8, n_events=n_events, n_epochs=n_epochs,
            dup_rate=0.02, late_rate=0.02, delete_rate=0.05, seed=42,
        )
        write_events_by_epoch(generate_change_events(cfg), events, files_per_epoch=2)

        legs = {}
        legs["autofold"] = run_leg(spark, events, n_epochs, os.path.join(root, "t_fold"), fold=True)
        legs["plain"] = run_leg(spark, events, n_epochs, os.path.join(root, "t_plain"), fold=False)
        assert legs["autofold"]["visible_rows"] == legs["plain"]["visible_rows"]

        def tail_mean(xs):
            return round(sum(xs[-3:]) / 3, 3)

        out = {
            "metric": "mor_read_latency_growing_table",
            "n_epochs": n_epochs,
            "n_events": n_events,
            "cpus": cpus,
            "legs": legs,
            "tail_read_sec": {k: tail_mean(v["read_sec"]) for k, v in legs.items()},
            "tail_delta_files": {k: v["delta_files"][-1] for k, v in legs.items()},
            "flat_ratio_autofold_over_plain": round(
                tail_mean(legs["autofold"]["read_sec"]) / tail_mean(legs["plain"]["read_sec"]), 3
            ),
        }
        print(json.dumps(out))
        dst = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "BENCH", "MOR_AUTOFOLD.json")
        with open(dst, "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
