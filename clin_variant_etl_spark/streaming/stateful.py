"""Custom stateful streaming operator: per-key LSN high-watermark dedup via
``applyInPandasWithState`` (SURVEY.md §2.J — the stateful-operator upgrade
the batch-only reference lacks).

``dedup_stream(events)`` keeps one tiny state cell per ``doc_id`` — the
highest LSN applied so far — and emits, per micro-batch, only the winning
(max-LSN) event per key IF it advances the watermark.  Duplicates, stale and
late events are absorbed **in the stream**, before anything touches the lake
table, so the downstream ``foreachBatch`` merge input is ≤1 row per key per
trigger regardless of upstream redelivery behavior.

This complements (not replaces) the LSN guard in ``engine/apply.py``: the
table-side guard is what makes replay exactly-once; the stream-side state
is the low-latency path that shrinks merge input under at-least-once
sources with heavy duplication (e.g. a rewinding binlog tail).

At scale: state is per-key-group, partitioned by the stream's groupBy
shuffle; each cell is one int (the LSN), so 10^9 keys ≈ GBs of state —
within RocksDB state-store territory; timeouts could expire keys whose
tombstones have compacted.

All logic inside the state function is vectorized pandas (idxmax), defined
nested so cloudpickle ships it by value (executors never import this repo).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([T.StructField("max_lsn", T.LongType())])


def dedup_stream(events: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """events (streaming DF with ``lsn``) → ≤1 winning row per key per batch.

    Output schema == input schema.  A row is emitted iff its lsn exceeds the
    key's persisted high watermark; the watermark then advances to that lsn.
    """
    out_schema = events.schema

    def advance(key, pdfs, state: GroupState):
        import pandas as pd

        prev = state.get[0] if state.exists else -1
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            row = pdf.loc[[pdf["lsn"].idxmax()]]
            if best is None or int(row["lsn"].iloc[0]) > int(best["lsn"].iloc[0]):
                best = row
        if best is not None and int(best["lsn"].iloc[0]) > prev:
            state.update((int(best["lsn"].iloc[0]),))
            yield best
        else:
            yield pd.DataFrame(columns=[f.name for f in out_schema.fields])

    return events.groupBy(key_col).applyInPandasWithState(
        advance,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
