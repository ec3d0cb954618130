"""Cheap host-quietness probe for the scaling protocol.

The sandbox's usable CPU capacity swings several-fold with co-tenant
load (BASELINE.md, round-2 protocol attempts). The full ``bench.py
--scaling`` pair costs ~10 min of wall clock per attempt; burning one
inside a degraded window is pure waste. This probe answers "is the
host quiet right now?" in ~15 s with no Ray involvement: K worker
processes each run a fixed integer-numpy kernel for a fixed duration;
aggregate throughput at K=2 vs K=8 gives a parallel-efficiency proxy.

Usage: python tools/quiet_probe.py  →  one JSON line; quiet=true when
E(2→8) ≥ the threshold (default 0.8).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np


def _kernel(seconds: float, out):
    x = np.arange(1_000_000, dtype=np.int64)
    reps = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        x = (x * 2862933555777941757 + 3037000493) & 0x7FFFFFFFFFFFFFFF
        reps += 1
    out.put(reps)


def aggregate(k: int, seconds: float = 3.0) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=_kernel, args=(seconds, q)) for _ in range(k)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    return sum(q.get() for _ in procs) / seconds


def main() -> dict:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 0.8
    r2 = aggregate(2)
    r8 = aggregate(8)
    eff = (r8 / r2) / 4.0
    result = {
        "reps_per_sec": {"2": round(r2, 1), "8": round(r8, 1)},
        "efficiency_2_to_8": round(eff, 3),
        "quiet": eff >= threshold,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
