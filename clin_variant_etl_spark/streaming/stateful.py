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

State growth at scale: one long per key is GBs of state at 10^9 keys —
within RocksDB territory but unbounded without expiry.  ``ttl_ms`` sets a
processing-time timeout per key: a key idle for ttl_ms is dropped from the
state store.  Correctness contract: choose the TTL so that expiry implies
the key's events are behind the table's LSN/tombstone horizon
(lake/maintenance.py ``compact(lsn_horizon=...)``) — an expired key that
re-appears is re-emitted by the stream (its watermark is lost), and the
TABLE-side LSN guard is what still drops it if it is stale.  The stream
state is an optimization; the guard is the invariant.

All logic inside the state function is vectorized pandas (idxmax), defined
nested so cloudpickle ships it by value (executors never import this repo).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([T.StructField("max_lsn", T.LongType())])


def dedup_stream(
    events: DataFrame, key_col: str = "doc_id", ttl_ms: int | None = None
) -> DataFrame:
    """events (streaming DF with ``lsn``) → ≤1 winning row per key per batch.

    Output schema == input schema.  A row is emitted iff its lsn exceeds the
    key's persisted high watermark; the watermark then advances to that lsn.
    With ``ttl_ms`` set, a key idle for that long is expired from the state
    store (see module docstring for the horizon contract).

    ``ttl_ms`` is for CONTINUOUS tails (``trigger(processingTime=...)``)
    only: with ``availableNow`` drains Spark keeps scheduling no-data
    micro-batches to service future timers, so the drain never terminates —
    leave ttl_ms=None there (a drain is finite, state growth is bounded by
    the drained key set).
    """
    out_schema = events.schema

    def advance(key, pdfs, state: GroupState):
        import pandas as pd

        empty = pd.DataFrame(columns=[f.name for f in out_schema.fields])
        if state.hasTimedOut:
            # idle past TTL: drop the watermark cell; the table-side LSN
            # guard keeps correctness if this key ever re-appears stale
            state.remove()
            yield empty
            return
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
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield best
        else:
            if state.exists and ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield empty

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(key_col).applyInPandasWithState(
        advance,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
