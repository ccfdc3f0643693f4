"""Shared CDF test oracle: per-key last delivered version of an event log.

One implementation for every change-feed suite (test_cdf, test_cdf_consumer,
test_lifecycle_integration) so a feed-contract change (e.g. _change_type
naming) is fixed in exactly one place.
"""

import pandas as pd


def last_versions(events_pdf: pd.DataFrame, mask=None) -> dict:
    """{doc_id: (last_lsn, 'delete'|'upsert')} after lsn-dedup + LWW."""
    ev = events_pdf if mask is None else events_pdf[mask]
    ev = ev.drop_duplicates(subset=["lsn"]).sort_values("lsn", kind="stable")
    last = ev.groupby("doc_id", as_index=False, sort=False).tail(1)
    return {
        r["doc_id"]: (int(r["lsn"]), "delete" if r["op"] == "D" else "upsert")
        for _, r in last.iterrows()
    }


def expected_diff(old: dict, new: dict) -> dict:
    return {k: v for k, v in new.items() if old.get(k) != v}
