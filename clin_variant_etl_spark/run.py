"""spark-submit entry point for the CDC pipeline.

Deploy (north_rule): ``spark-submit --py-files clin_variant_etl_spark.zip
-m`` equivalents; in local/sandbox form:

    # batch-drain everything currently in the event log, then exit
    python -m clin_variant_etl_spark.run \
        --events-dir /data/events --table /lake/docs \
        --lineage /lake/docs_lineage --checkpoint-table /lake/docs_epochs \
        --stream-checkpoint /ckpt/docs --mode drain

    # continuous tail (Structured Streaming, 30s triggers)
    ... --mode tail --trigger-seconds 30

The streaming checkpoint dir pairs 1:1 with the target table (see
streaming/stream.py): resume MUST reuse the checkpoint dir.  A fresh
checkpoint against an advanced table re-batches from id 0 and a mixed
old+new batch can be gate-skipped while its files are marked consumed —
silent loss; StreamingCdc refuses to start in that state.

On a cluster, pass ``--master`` via spark-submit as usual; every knob here
is cluster-size independent (SURVEY.md §7 design).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F  # noqa: F401  (re-export convenience)

from .engine.apply import CdcPipeline, create_cdc_table
from .lake.table import LakeTable
from .schemas import BASE_DOCS_SCHEMA, CHANGE_EVENTS_SCHEMA
from .session import build_session
from .streaming.stream import StreamingCdc


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="clin_variant_etl_spark.run")
    p.add_argument("--events-dir", required=True, help="change-event log root (parquet)")
    p.add_argument("--table", required=True, help="target lake table path")
    p.add_argument("--lineage", default=None, help="lineage side-table path")
    p.add_argument("--checkpoint-table", default=None, help="epoch checkpoint side-table path")
    p.add_argument("--stream-checkpoint", required=True, help="Structured Streaming checkpoint dir")
    p.add_argument("--mode", choices=["drain", "tail"], default="drain")
    p.add_argument("--trigger-seconds", type=int, default=30)
    p.add_argument("--key-col", default="doc_id")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--n-salts", type=int, default=16)
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument(
        "--apply-mode",
        choices=["cow", "mor"],
        default="cow",
        help="cow = copy-on-write merge; mor = delta-file commits "
        "(write cost ~ epoch delta; fold via maintenance.compact)",
    )
    p.add_argument(
        "--dedup-variant",
        choices=["auto", "join", "salted"],
        default="auto",
        help="keep-latest-within-key strategy; auto = measured cost model "
        "(window/pandas variants exist in engine.dedup for tests but are "
        "not pipeline options)",
    )
    p.add_argument("--app-name", default="cdc-lake-apply")
    args = p.parse_args(argv)

    spark = build_session(args.app_name)
    if not LakeTable.exists(args.table):
        create_cdc_table(args.table, BASE_DOCS_SCHEMA, key_col=args.key_col, n_buckets=args.n_buckets)
    pipe = CdcPipeline(
        spark,
        args.table,
        lineage_path=args.lineage,
        checkpoint_path=args.checkpoint_table,
        key_col=args.key_col,
        n_salts=args.n_salts,
        apply_mode=args.apply_mode,
        dedup_variant=args.dedup_variant,
    )
    stream = StreamingCdc(
        spark,
        pipe,
        events_dir=args.events_dir,
        event_schema=CHANGE_EVENTS_SCHEMA,
        checkpoint_dir=args.stream_checkpoint,
        max_files_per_trigger=args.max_files_per_trigger,
    )
    if args.mode == "drain":
        stream.run_available()
        state = pipe.read_state()
        print(f"drained; table now has {state.count()} visible rows "
              f"(snapshot {pipe.table.current_snapshot().snapshot_id})")
    else:
        stream.run_tail(trigger_seconds=args.trigger_seconds)
    return 0


if __name__ == "__main__":
    sys.exit(main())
