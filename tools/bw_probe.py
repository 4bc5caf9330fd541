"""Memory-bandwidth canary: detects the co-tenant load /proc/stat steal
cannot see.

The round-5 8→32 draws r5-14/r5-15 (BASELINE.md) were contaminated at
<0.4% steal: a co-tenant saturating the shared memory bus slows ONLY the
wide leg (8-wide under-subscribes the bus; 32-wide competes). This probe
measures an aggregate STREAM-triad-like bandwidth at 1 and N processes;
the N-process aggregate on a quiet box should approach the socket ceiling
and reproduce between runs — a materially lower reading minutes apart IS
the co-tenant signal.

Usage: python tools/bw_probe.py [nprocs ...]   (default: 1 8 32)
Prints one JSON line: {"bw_gbs": {"1": ..., "8": ..., "32": ...}}.
"""

import json
import multiprocessing as mp
import sys
import time

import numpy as np

N = 1 << 25  # 32M float64 = 256 MB per array, far beyond LLC


def _triad(q, barrier, seconds=2.0):
    a = np.ones(N)
    b = np.ones(N)
    c = np.zeros(N)  # touch c too: this VM's first-touch faults run ~150MB/s
    barrier.wait()  # no process measures until every process has allocated
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < seconds:
        np.multiply(b, 2.0, out=c)
        c += a
        reps += 1
    dt = time.perf_counter() - t0
    # two-op formulation moves 5 full-array passes per rep:
    # multiply = read b + write c; += is read c + read a + write c
    q.put(reps * 5 * N * 8 / dt / 1e9)


def measure(nproc: int) -> float:
    q = mp.Queue()
    barrier = mp.Barrier(nproc)
    ps = [mp.Process(target=_triad, args=(q, barrier)) for _ in range(nproc)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return round(total, 2)


def main():
    procs = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
    out = {str(n): measure(n) for n in procs}
    print(json.dumps({"bw_gbs": out}))


if __name__ == "__main__":
    main()
