"""Scaling-efficiency protocol (BASELINE.md): run the IDENTICAL CDC apply job
at two parallelism levels — local[8] (N) and local[32] (4N) — on the same
pre-generated deterministic input, and report throughput at both plus
efficiency = (T₈_tput⁻¹… strictly: (tput@32 / tput@8) / 4.  Target ≥ 0.8.

Each level runs in its own subprocess (fresh JVM — no warm-cache bleed) via
`python bench.py` with SPARK_GRAFT_BENCH_MODE=cdc.  Results land in
BENCH/BASELINE.md next to the reference-baseline notes.

Usage: python scripts/scaling_bench.py [n_events]
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, input_dir: str, n_events: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_MODE="cdc",
        SPARK_GRAFT_BENCH_INPUT=input_dir,
        SPARK_GRAFT_BENCH_EVENTS=str(n_events),
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
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    sys.path.insert(0, REPO)
    from bench import gen_events

    tmp = tempfile.mkdtemp(prefix="scaling_input_")
    print(f"generating {n_events} events (shared input) ...", flush=True)
    gen_s = gen_events(n_events, tmp, files_per_epoch=32, n_epochs=4)
    print(f"generated in {gen_s:.0f}s at {tmp}", flush=True)

    results = {}
    for cpus in (8, 32):
        print(f"running local[{cpus}] ...", flush=True)
        results[cpus] = run_level(cpus, tmp, n_events)
        c = results[cpus]["cdc"]
        print(f"  local[{cpus}]: {c['events_per_sec']} ev/s ({c['apply_sec']}s)", flush=True)

    t8 = results[8]["cdc"]["events_per_sec"]
    t32 = results[32]["cdc"]["events_per_sec"]
    eff = (t32 / t8) / 4.0
    today = datetime.date.today().isoformat()

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out, "w") as fh:
        fh.write(
            f"""# BENCH — CDC apply throughput & scaling efficiency ({today})

Protocol (BASELINE.json north_rule, sandbox form): the IDENTICAL apply job —
same deterministic pre-generated input ({n_events:,} events incl. duplicate
redeliveries, 4 epochs, Zipf-1.1 hot-key skew, 5% dups, 5% late, 10%
deletes, seed 42) — executed at two parallelism levels in fresh JVMs.
Throughput counts pre-dedup events (the work done) over the apply+commit
wall-clock, excluding input generation.

| level | events/sec | apply wall (s) | per-epoch (s) |
|---|---|---|---|
| local[8]  (N)  | {t8:,.0f} | {results[8]["cdc"]["apply_sec"]} | {results[8]["cdc"]["epoch_sec"]} |
| local[32] (4N) | {t32:,.0f} | {results[32]["cdc"]["apply_sec"]} | {results[32]["cdc"]["epoch_sec"]} |

**Scaling efficiency (tput@4N / tput@N) / 4 = {eff:.3f}**  (target >= 0.8)

Correctness context: the same engine path is asserted row-for-row (including
token arrays) against an independent pandas replay oracle in
tests/test_apply.py and the merge-combination matrix in tests/test_matrix.py;
exactly-once replay and schema evolution are exercised in the same suite.

Raw bench lines:

```json
{json.dumps(results[8])}
{json.dumps(results[32])}
```
"""
        )
    print(f"efficiency = {eff:.3f} -> {out}")


if __name__ == "__main__":
    main()
