"""Memory-bandwidth ceiling probe (round-5 companion to
scaling_bench.measure_ceiling, which probes pure COMPUTE).

The 4->16 stage profile (BENCH_SCALING.md round-5 section) pins the
scaling miss to the politeness select's exchange+sort — memory-bound
work (shuffle write/read, sort runs, hash tables) — while the
compute-bound dedup stage scales at ~0.92. This probe measures what
the BOX can do for that class of work: N pinned processes each
stream-copying a buffer far larger than L3, aggregate GB/s at N and
4N. On a single socket all N processes share one memory controller, so
bandwidth saturates long before 32 threads; a real 4N-executor cluster
adds memory channels WITH cores, which is why this ceiling is a
sandbox artifact, not an engine property.

Usage: python bench/membw_probe.py [pairs ...]   (default: 4 16)
Prints one JSON line: per-level aggregate GB/s + N->4N efficiency.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

BUF_MB = int(os.environ.get("MEMBW_BUF_MB", "256"))
SECONDS = float(os.environ.get("MEMBW_SECONDS", "6.0"))


def _worker(core: int, q: mp.Queue) -> None:
    os.sched_setaffinity(0, {core})
    import numpy as np

    src = np.random.default_rng(core).integers(
        0, 255, size=BUF_MB * 1024 * 1024, dtype=np.uint8
    )
    dst = np.empty_like(src)
    np.copyto(dst, src)  # touch both buffers before the timed window
    n = 0
    t0 = time.time()
    while time.time() - t0 < SECONDS:
        np.copyto(dst, src)
        n += 1
    elapsed = time.time() - t0
    # copy touches 2x the buffer (read + write)
    q.put(2 * n * BUF_MB / 1024 / elapsed)


def measure(n_procs: int) -> float:
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(c, q)) for c in range(n_procs)
    ]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [4, 16]
    out = {}
    for n in levels:
        gbs = measure(n)
        out[n] = round(gbs, 1)
        print(f"# {n} procs: {gbs:.1f} GB/s aggregate", file=sys.stderr)
    effs = {}
    for lo in levels:
        hi = lo * 4
        if hi in out:
            effs[f"{lo}->{hi}"] = round(out[hi] / (4 * out[lo]), 3)
    print(json.dumps({"aggregate_gbs": out, "bandwidth_scaling_eff": effs}))


if __name__ == "__main__":
    main()
