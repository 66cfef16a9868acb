"""Hardware scaling ceiling probe — context for BENCH/BASELINE.md.

Two microbenchmarks that bound what ANY software can achieve on this
single-box sandbox when emulating cluster sizes with local[N]:

1. cpu: pure-register arithmetic in N pinned processes — measures CPU
   core scaling with zero memory traffic.
2. membw: large-array copies in N pinned processes — measures aggregate
   memory bandwidth scaling. Every data-processing workload (shuffles,
   string ops, Arrow transfers, parquet scans) is bounded by this curve,
   because unlike a real cluster — where each added executor brings its
   own memory channels — a single box has ONE fixed memory subsystem
   shared by all local[N] threads.

Usage: python BENCH/hw_probe.py
Prints one JSON line per (probe, procs) with aggregate throughput and
the N→4N scaling efficiencies.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np


def _pin(procs: int) -> None:
    try:
        os.sched_setaffinity(0, set(range(procs)))
    except (AttributeError, OSError):
        pass


def _cpu_one(n: int) -> int:
    x = 0
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return x


def _membw_one(args: tuple[int, int]) -> float:
    n_mb, iters = args
    src = np.frombuffer(np.random.bytes(n_mb << 20), dtype=np.uint8).copy()
    dst = np.empty_like(src)
    t0 = time.perf_counter()
    for _ in range(iters):
        np.copyto(dst, src)
    return n_mb * iters / (time.perf_counter() - t0)  # MB/s this proc


def run(probe: str, procs: int) -> float:
    _pin(procs)
    with mp.Pool(procs) as p:
        if probe == "cpu":
            per = 30_000_000
            t0 = time.perf_counter()
            p.map(_cpu_one, [per] * procs * 2)
            dt = time.perf_counter() - t0
            out = procs * 2 * per / dt / 1e6  # Mops/s aggregate
        else:
            out = sum(p.map(_membw_one, [(256, 30)] * procs)) / 1024  # GB/s
    _pin(os.cpu_count())
    return out


def main() -> None:
    results: dict[str, dict[int, float]] = {"cpu": {}, "membw": {}}
    for probe in ("cpu", "membw"):
        for procs in (2, 4, 8, 16, 32):
            v = run(probe, procs)
            results[probe][procs] = round(v, 1)
            print(json.dumps({"probe": probe, "procs": procs, "agg": round(v, 1),
                              "unit": "Mops/s" if probe == "cpu" else "GB/s"}))
    for probe, r in results.items():
        effs = {
            f"{n}->{4*n}": round((r[4 * n] / r[n]) / 4, 3)
            for n in (2, 4, 8)
            if n in r and 4 * n in r
        }
        print(json.dumps({"probe": probe, "scaling_efficiency": effs}))


if __name__ == "__main__":
    main()
