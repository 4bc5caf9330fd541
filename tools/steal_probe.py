"""Hypervisor-throttle probe: measure CPU steal under a controlled spin load.

The sandbox VM is intermittently CPU-throttled by its host (BASELINE.md
"Round 3" / scaling series 3-5): steal engages under sustained multi-core
load and contaminates the high leg of a scaling measurement. Run this
BEFORE `bench.py --scaling` — if the target-leg spin shows >2-3% steal,
the draw will under-measure efficiency roughly linearly (fitted slope
-0.0155 efficiency per steal point, R^2 0.975 across series 2-5).

Usage: python tools/steal_probe.py [nproc ...]   (default: 4 8 16 32)
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time


def _spin(stop_t: float) -> None:
    while time.time() < stop_t:
        pass


def _steal_sample() -> tuple[int, int]:
    with open("/proc/stat") as f:
        vals = list(map(int, f.readline().split()[1:]))
    return vals[7], sum(vals)


def probe(nproc: int, seconds: float = 8.0) -> float:
    s0, t0 = _steal_sample()
    stop = time.time() + seconds
    procs = [mp.Process(target=_spin, args=(stop,)) for _ in range(nproc)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    s1, t1 = _steal_sample()
    return 100.0 * (s1 - s0) / max(t1 - t0, 1)


if __name__ == "__main__":
    levels = [int(a) for a in sys.argv[1:]] or [4, 8, 16, 32]
    for n in levels:
        print(f"{n:3d}-proc spin steal: {probe(n):5.1f}%", flush=True)
