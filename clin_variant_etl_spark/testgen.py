"""Deterministic, seeded generators for the CDC fixtures (FIXTURES.md F1-F3).

No external data: everything derives from a seed + arithmetic.  Token payloads
are a pure function of (lsn, position) so any single row is reproducible in
isolation, and generation is fully vectorized (numpy → arrow ListArray, no
per-row Python) so bench-scale inputs (10^7+ events) are cheap to produce.

Event-log semantics (matches engine + oracle):
- ``lsn`` is a global total order (strictly increasing commit order).
- ``op`` ∈ {I, U, D}.  I and U both carry a full payload (last-writer-wins
  upsert); D is a delete (payload null).
- Delivery order differs from commit order: ``epoch_hint`` assigns each event
  to a micro-batch file, and ``late_rate`` pushes events into later epochs
  than their lsn implies.  ``dup_rate`` re-delivers exact duplicate rows
  (same lsn) — the at-least-once transport model.
- Zipf-skewed key choice models hot doc_ids (reference gap called out in
  SURVEY.md §4 "skew handling").
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50257
_A = np.int64(1315423911)
_B = np.int64(2654435761)


def _tokens_list_array(lsns: np.ndarray, lengths: np.ndarray) -> pa.ListArray:
    """tokens[i][j] = (lsn[i]*A + j*B) mod VOCAB — deterministic, vectorized."""
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    total = int(offsets[-1])
    # position index within each row
    j = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lengths)
    row_lsn = np.repeat(lsns.astype(np.int64), lengths)
    values = ((row_lsn * _A + j * _B) % VOCAB).astype(np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(values))


SOURCES = np.array(["web", "books", "code", "wiki"])
LANGS = np.array(["en", "fr", "de", "es", "zh"])


def expected_tokens(lsn: int, length: int) -> np.ndarray:
    """Reproduce one row's token payload in isolation (for unit tests)."""
    j = np.arange(length, dtype=np.int64)
    return ((np.int64(lsn) * _A + j * _B) % VOCAB).astype(np.int32)


@dataclass
class EventGenConfig:
    n_docs: int = 1_000
    n_events: int = 10_000
    n_epochs: int = 8
    dup_rate: float = 0.05
    late_rate: float = 0.05
    delete_rate: float = 0.10
    hot_key_skew: float = 1.1  # Zipf alpha (>1); 0 disables skew
    min_tokens: int = 8
    max_tokens: int = 64
    seed: int = 42
    # schema-evolution: epochs >= v2_from_epoch carry (lang, quality); -1 = never
    v2_from_epoch: int = -1


def _doc_ids(n_docs: int) -> np.ndarray:
    return np.char.add("doc_", np.char.zfill(np.arange(n_docs).astype(str), 8))


def generate_base_docs(n_docs: int = 1_000, seed: int = 42) -> pa.Table:
    """F1: initial lake-table state, n_docs unique doc_ids."""
    rng = np.random.default_rng(seed)
    lengths = rng.integers(8, 64, size=n_docs)
    # base rows use pseudo-lsn = -doc_index-1 so payloads differ from events
    pseudo = -(np.arange(n_docs, dtype=np.int64) + 1)
    tokens = _tokens_list_array(pseudo, lengths)
    return pa.table(
        {
            "doc_id": pa.array(_doc_ids(n_docs)),
            "tokens": tokens,
            "n_tok": pa.array(lengths.astype(np.int32)),
            "source": pa.array(SOURCES[rng.integers(0, len(SOURCES), size=n_docs)]),
        }
    )


def generate_change_events(cfg: EventGenConfig) -> pa.Table:
    """F2/F3: the ordered change-event log, in delivery order."""
    rng = np.random.default_rng(cfg.seed)
    n = cfg.n_events

    # --- key choice: Zipf-skewed over doc index --------------------------------
    # bounded Zipf via inverse-CDF sampling (vectorized; numpy's rng.zipf uses
    # rejection sampling which is ~100x slower for alpha near 1)
    if cfg.hot_key_skew and cfg.hot_key_skew > 1.0:
        ranks = np.arange(1, cfg.n_docs + 1, dtype=np.float64)
        pmf = ranks ** (-cfg.hot_key_skew)
        cdf = np.cumsum(pmf / pmf.sum())
        doc_idx = np.searchsorted(cdf, rng.random(n), side="right").clip(0, cfg.n_docs - 1)
    else:
        doc_idx = rng.integers(0, cfg.n_docs, size=n)

    lsn = np.arange(1, n + 1, dtype=np.int64)

    # --- ops: first touch of a key is I; later touches U/D ---------------------
    first_touch = np.zeros(n, dtype=bool)
    seen = np.zeros(cfg.n_docs, dtype=bool)
    # vectorized "first occurrence" via sorting on (doc_idx, lsn)
    order = np.lexsort((lsn, doc_idx))
    sorted_docs = doc_idx[order]
    is_first_sorted = np.ones(n, dtype=bool)
    is_first_sorted[1:] = sorted_docs[1:] != sorted_docs[:-1]
    first_touch[order] = is_first_sorted
    del seen
    r = rng.random(n)
    op = np.where(first_touch, "I", np.where(r < cfg.delete_rate, "D", "U"))

    # --- payloads ---------------------------------------------------------------
    lengths = rng.integers(cfg.min_tokens, cfg.max_tokens + 1, size=n)
    lengths = np.where(op == "D", 0, lengths)
    tokens = _tokens_list_array(lsn, lengths)
    n_tok = lengths.astype(np.int32)
    source = SOURCES[(lsn % len(SOURCES)).astype(np.int64)]

    # --- epoch assignment + lateness ---------------------------------------------
    epoch = (lsn - 1) * cfg.n_epochs // n
    late = rng.random(n) < cfg.late_rate
    epoch = np.where(late, np.minimum(epoch + rng.integers(1, 3, size=n), cfg.n_epochs - 1), epoch)
    epoch = epoch.astype(np.int32)

    event_ts = (np.int64(1700000000) + lsn).astype("datetime64[s]")

    cols: dict[str, pa.Array] = {
        "lsn": pa.array(lsn),
        "op": pa.array(op),
        "doc_id": pa.array(_doc_ids(cfg.n_docs)[doc_idx]),
        "tokens": tokens,
        "n_tok": pa.array(n_tok),
        "source": pa.array(source),
        "event_ts": pa.array(event_ts, type=pa.timestamp("us", tz="UTC")),
        "epoch_hint": pa.array(epoch),
    }
    # null out payload for deletes
    is_del = pa.array(op == "D")
    for c in ("tokens", "n_tok", "source"):
        cols[c] = pa.compute.if_else(is_del, pa.nulls(n, type=cols[c].type), cols[c])

    if cfg.v2_from_epoch >= 0:
        in_v2 = epoch >= cfg.v2_from_epoch
        lang = LANGS[(lsn % len(LANGS)).astype(np.int64)]
        quality = np.round((lsn % 1000) / 1000.0, 6)
        cols["lang"] = pa.compute.if_else(pa.array(in_v2 & (op != "D")), pa.array(lang), pa.nulls(n, pa.string()))
        cols["quality"] = pa.compute.if_else(
            pa.array(in_v2 & (op != "D")), pa.array(quality), pa.nulls(n, pa.float64())
        )

    tbl = pa.table(cols)

    # --- duplicates: re-deliver a sample of rows (same lsn), shuffled nearby ----
    if cfg.dup_rate > 0:
        n_dup = int(n * cfg.dup_rate)
        dup_idx = rng.choice(n, size=n_dup, replace=False)
        dup = tbl.take(pa.array(np.sort(dup_idx)))
        tbl = pa.concat_tables([tbl, dup])

    # delivery order: shuffle within epoch (stable across runs: seeded)
    ep = tbl.column("epoch_hint").to_numpy()
    jitter = rng.random(len(ep))
    delivery = np.lexsort((jitter, ep))
    return tbl.take(pa.array(delivery))


def write_events_by_epoch(tbl: pa.Table, out_dir: str, files_per_epoch: int = 1) -> list[str]:
    """Write events as events/epoch=<k>/part-*.parquet (file-per-epoch layout)."""
    os.makedirs(out_dir, exist_ok=True)
    ep = tbl.column("epoch_hint").to_numpy()
    paths = []
    for k in np.unique(ep):
        sub = tbl.filter(pa.compute.equal(tbl.column("epoch_hint"), int(k)))
        # schema-evolution realism: epochs before the v2 cutover must not
        # carry the new columns at all (all-null → drop), so the engine sees
        # the schema change exactly when the producer upgrades
        for c in ("lang", "quality"):
            if c in sub.column_names and sub.column(c).null_count == sub.num_rows:
                sub = sub.drop_columns([c])
        d = os.path.join(out_dir, f"epoch={int(k)}")
        os.makedirs(d, exist_ok=True)
        n = sub.num_rows
        step = max(1, -(-n // files_per_epoch))
        for i in range(0, n, step):
            p = os.path.join(d, f"part-{i // step:04d}.parquet")
            # small row groups keep the files SPLITTABLE: a single-row-group
            # 16 MB file is one indivisible map split no matter how low
            # spark.sql.files.maxPartitionBytes is set, capping scan/dedup
            # map parallelism at the file count
            pq.write_table(sub.slice(i, step), p, row_group_size=32_000)
            paths.append(p)
    return paths


def write_base_docs(tbl: pa.Table, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    p = os.path.join(out_dir, "base_docs.parquet")
    pq.write_table(tbl, p)
    return p
