"""Pre-fault guest memory once so engine legs run on recycled frames.

On lazily-backed VM memory (Firecracker/UFFD-style), the FIRST touch of
each guest-physical frame is served by a host-side handler measured here at
~5-260 MB/s (minute-to-minute swings), while re-touched or recycled frames
zero at normal GB/s speed.  Frames stay populated for the VM's lifetime —
even across process exits the guest kernel hands the populated frame to the
next allocator — so touching a large region ONCE converts all later
first-allocations (JVMs, python workers, generators) to fast guest-zeroing.

Parallel faulting does not help (8 workers measured SLOWER in aggregate
than 1 — a single host handler serializes), so this touches sequentially
in one process.

Usage: python scripts/prefault.py [GiB]   (default 24)
"""

from __future__ import annotations

import sys
import time

import numpy as np


def prefault(gib: float, chunk_gib: float = 2.0) -> None:
    done = 0.0
    t0 = time.time()
    while done < gib:
        step = min(chunk_gib, gib - done)
        a = np.empty(int(step * 1024**3 / 8), dtype=np.int64)
        a[:: 512] = 1  # one write per 4 KiB page forces the fault
        del a  # freed to the guest — frames stay populated host-side
        done += step
        rate = done * 1024 / (time.time() - t0)
        print(f"prefaulted {done:.0f}/{gib:.0f} GiB ({rate:.0f} MiB/s)", flush=True)


if __name__ == "__main__":
    prefault(float(sys.argv[1]) if len(sys.argv) > 1 else 24.0)
