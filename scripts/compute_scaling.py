"""CPU-bound operator scaling at N vs 4N cores over a corpus big enough to
measure compute, not job overhead.

The sf0.1 documents table has 5,000 docs: the text operators finish in
0.6-3 s, where per-job scheduling (~100-300 ms × dozens of jobs) and plan
time dominate and no core count can show through — the r4 ladder's
"compute" leg read 0.32 normalized for exactly this reason.  This script
synthesizes a deterministic corpus (seeded numpy, Zipf vocabulary, a
near-dup fraction so the dedup operators have real work) sized so each
query runs tens of seconds, then runs the SAME bench.py query leg at both
parallelism levels, interleaved, and reports same-round ratios.

Usage: python scripts/compute_scaling.py [n_docs] [N] [4N] [rounds]
Writes BENCH/SCALING_COMPUTE.md; raw per-leg JSON inline.

No external data: the corpus is generated in-process from a fixed seed
(same discipline as the CDC ladder's event generator).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = "dedup_minhash_lsh,dedup_simhash,dedup_ngram_jaccard,text_quality_stats,doc_fingerprints,text_language_id"
SEED = 424242
LANGS = ["en", "fr", "de", "es", "zh"]
SOURCES = ["web", "books", "code", "wiki"]


def gen_corpus(n_docs: int, out_dir: str, n_files: int = 16) -> str:
    """documents.parquet with the testdata schema (doc_id, text, lang,
    source, n_chars); ~10% near-dup pairs (a copy with a few words mutated)
    so jaccard/minhash/simhash produce candidates; Zipf word frequencies so
    the MAX_DF shingle cap and the LSH bucket caps are exercised."""
    path = os.path.join(out_dir, "documents.parquet")
    marker = os.path.join(out_dir, f".corpus_n{n_docs}_seed{SEED}")
    if os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path)):
        if os.path.exists(marker):
            return out_dir
        raise SystemExit(
            f"{out_dir} holds a corpus generated with DIFFERENT parameters "
            f"(no {os.path.basename(marker)} marker) — benchmarking it would "
            "mislabel the report; point SPARK_GRAFT_COMPUTE_CORPUS elsewhere "
            "or delete the directory"
        )
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(SEED)
    vocab = np.array([f"w{j:04d}" for j in range(4000)])
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    pmf = ranks ** (-1.05)
    cdf = np.cumsum(pmf / pmf.sum())

    lengths = rng.integers(80, 220, size=n_docs)
    texts: list[str] = []
    for i in range(n_docs):
        if i % 10 == 9 and i > 0:
            # near-dup of the previous doc: mutate ~3% of its words
            words = texts[i - 1].split(" ")
            k = max(1, len(words) // 32)
            idx = rng.integers(0, len(words), size=k)
            repl = vocab[np.searchsorted(cdf, rng.random(k), side="right").clip(0, len(vocab) - 1)]
            for p, w in zip(idx, repl):
                words[p] = w
            texts.append(" ".join(words))
        else:
            pick = np.searchsorted(cdf, rng.random(lengths[i]), side="right").clip(
                0, len(vocab) - 1
            )
            texts.append(" ".join(vocab[pick]))

    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array([LANGS[i % len(LANGS)] for i in range(n_docs)]),
            "source": pa.array([SOURCES[i % len(SOURCES)] for i in range(n_docs)]),
            "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
        }
    )
    per = (n_docs + n_files - 1) // n_files
    for f in range(n_files):
        sl = tbl.slice(f * per, per)
        if sl.num_rows:
            pq.write_table(sl, os.path.join(path, f"part-{f:03d}.parquet"))
    open(marker, "w").close()
    return out_dir


def run_leg(cpus: int, corpus: str) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_MODE="queries",
        SPARK_GRAFT_SF_DIR=corpus,
        SPARK_GRAFT_BENCH_QUERY_SET=QUERIES,
        SPARK_GRAFT_BENCH_QUERY_REPS="2",
        # leg-level amortization (r5): one untimed full-set pass so the
        # words-cache fill and JIT land before timing starts — both levels
        # then time identical warm work
        SPARK_GRAFT_BENCH_QUERY_WARMUP="1",
        # same job at both levels (scaling_bench.py note)
        SPARK_GRAFT_BENCH_SHUFFLE="16",
        SPARK_GRAFT_DRIVER_MEM="16g",
    )
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-4000:])
        raise SystemExit(f"bench at local[{cpus}] failed rc={p.returncode}")
    line = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    n_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_hi = int(sys.argv[3]) if len(sys.argv) > 3 else 4 * n_lo
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    corpus = os.environ.get(
        "SPARK_GRAFT_COMPUTE_CORPUS", f"/tmp/spark_graft_corpus_{n_docs}"
    )
    t0 = time.time()
    gen_corpus(n_docs, corpus)
    print(f"corpus ready at {corpus} ({time.time() - t0:.0f}s)", flush=True)

    # in-window CPU calibration (the CDC ladder's protocol, scaling_bench.py):
    # delivered pure-CPU throughput measured immediately before each engine
    # leg identifies throttled host windows, and the normalized reading
    # judges the engine against the hardware the window actually delivered
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scaling_bench import cal_cpu

    legs: list[dict] = []  # {"round", "cpus", "queries", "total", "cal_mops"}
    for r in range(rounds):
        for cpus in (n_lo, n_hi):
            cal = round(cal_cpu(cpus), 1)
            res = run_leg(cpus, corpus)
            total = round(sum(res["queries"].values()), 2)
            legs.append(
                {"round": r, "cpus": cpus, "queries": res["queries"],
                 "total": total, "cal_mops": cal}
            )
            print(f"round {r} local[{cpus}]: {total}s cal={cal}Mops/s {res['queries']}", flush=True)

    ideal = n_hi / n_lo
    ratios, norm_effs = [], []
    for r in range(rounds):
        lo = next(l for l in legs if l["round"] == r and l["cpus"] == n_lo)
        hi = next(l for l in legs if l["round"] == r and l["cpus"] == n_hi)
        raw = lo["total"] / hi["total"]
        ratios.append(raw)
        # delivered-CPU scaling across the two legs' windows; the engine
        # can't out-scale what the hypervisor delivered
        cal_scale = hi["cal_mops"] / lo["cal_mops"]
        norm_effs.append(raw / cal_scale if cal_scale > 0 else 0.0)
    best = max(ratios)

    n_pass = sum(1 for r in range(rounds) if ratios[r] / ideal >= 0.8 or norm_effs[r] >= 0.8)
    lines = [
        f"# BENCH — CPU-bound operator scaling ({n_docs:,}-doc synthetic corpus)",
        "",
        f"Protocol: same corpus (seed {SEED}, ~10% near-dups, Zipf-1.05 vocabulary),",
        f"same queries ({QUERIES}),",
        f"fresh JVM per leg, {rounds} interleaved rounds at local[{n_lo}] vs local[{n_hi}],",
        "one untimed full-set warmup pass per leg (words-cache + JIT amortized),",
        "then best-of-2 per query.  Same-round ratios (both legs of a ratio from",
        "one host window), with delivered-CPU calibration per leg: `norm eff` =",
        "raw ratio ÷ the pure-CPU scaling the hypervisor actually delivered in",
        "those windows (cal_cpu, the CDC ladder's protocol).",
        "",
        f"| round | local[{n_lo}] total s (cal Mops/s) | local[{n_hi}] total s (cal Mops/s) | ratio | raw eff vs {ideal:.0f}× | norm eff |",
        "|---|---|---|---|---|---|",
    ]
    for r in range(rounds):
        lo = next(l for l in legs if l["round"] == r and l["cpus"] == n_lo)
        hi = next(l for l in legs if l["round"] == r and l["cpus"] == n_hi)
        lines.append(
            f"| {r} | {lo['total']} ({lo['cal_mops']}) | {hi['total']} ({hi['cal_mops']}) "
            f"| {ratios[r]:.2f}× | {ratios[r] / ideal:.2f} | {norm_effs[r]:.2f} |"
        )
    lines += [
        "",
        f"Best same-round: **{best:.2f}× = {best / ideal:.2f} raw efficiency**; "
        f"**{n_pass}/{rounds} rounds ≥0.8 raw-or-normalized**.",
        "",
        "Per-query seconds (all legs):",
        "",
        "```json",
        json.dumps(legs, indent=1),
        "```",
        "",
    ]
    out = os.path.join(REPO, "BENCH", "SCALING_COMPUTE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}; best same-round {best:.2f}x ({best / ideal:.2f} raw eff); "
          f"{n_pass}/{rounds} rounds >=0.8 raw-or-normalized")


if __name__ == "__main__":
    main()
