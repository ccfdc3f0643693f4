"""Pure-pandas replay oracle — the independent recomputation the final state is
judged against (reference analogue: independent frequency recomputation + exact
compare, etl/qc/frequency/RQDMTotal.scala:11-30).

Semantics: global last-writer-wins by lsn; exact-duplicate redeliveries (same
lsn) collapse; I/U upsert the payload; D deletes.  Delivery order and epoch
assignment are irrelevant by construction — which is exactly the property the
engine must reproduce.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

EVENT_META = {"lsn", "op", "event_ts", "epoch_hint"}


def replay_oracle(events: pd.DataFrame, base: pd.DataFrame | None = None) -> pd.DataFrame:
    """Expected final visible table state (payload columns only)."""
    ev = events.drop_duplicates(subset=["lsn"]).sort_values("lsn", kind="stable")
    if base is not None:
        b = base.copy()
        b["lsn"] = 0
        b["op"] = "I"
        ev = pd.concat([b, ev], ignore_index=True).sort_values("lsn", kind="stable")
    last = ev.groupby("doc_id", as_index=False, sort=False).tail(1)
    final = last[last["op"] != "D"]
    payload_cols = [c for c in ev.columns if c not in EVENT_META]
    return final[payload_cols].sort_values("doc_id").reset_index(drop=True)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    """Hashable, order-insensitive row representation (arrays → tuples)."""

    def norm(v):
        if isinstance(v, (list, np.ndarray)):
            return tuple(int(x) for x in v)
        if isinstance(v, float) and np.isnan(v):
            return None
        if v is None or v is pd.NA or (isinstance(v, float) and pd.isna(v)):
            return None
        if isinstance(v, (np.integer,)):
            return int(v)
        if isinstance(v, (np.floating,)):
            return float(v)
        return v

    cols = sorted(df.columns)
    return sorted(tuple(norm(r[c]) for c in cols) for _, r in df[cols].iterrows())


def assert_state_equals(spark_df, oracle_pdf: pd.DataFrame) -> None:
    """Row-for-row (incl. token-array) equality of engine state vs oracle."""
    got = canonical_rows(spark_df.toPandas())
    want = canonical_rows(oracle_pdf)
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    for g, w in zip(got, want):
        assert g == w, f"row mismatch:\n  got  {g}\n  want {w}"
