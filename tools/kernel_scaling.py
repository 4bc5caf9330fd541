"""Pure-kernel scaling harness (no Ray): N worker processes each run the
fused scoring kernel (take-prebuilt wide pair chunks through
score_pair_batch) on identical data; reports aggregate throughput and
per-core retention vs one process.

This isolates HARDWARE contention from Ray/pipeline effects — the evidence
behind BASELINE.md's scaling decomposition (measured 0.89 per-core
retention at 32 procs on this box).

Usage: python tools/kernel_scaling.py
"""

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

def worker(npairs, out_q):
    import pyarrow as pa
    from splink_ray.pipelines.flagship import transcript_settings
    from splink_ray.datasets import generate_transcripts_fast
    from splink_ray.stages.canonicalize import canonicalize_bucket
    from splink_ray.settings import make_eval_context
    from splink_ray.stages.scoring import score_pair_batch
    tbl = generate_transcripts_fast(20000, seed=1, entities_per_day=4000)
    recs = canonicalize_bucket(tbl)
    s = transcript_settings()
    uid = s.unique_id_column_name
    out_cols = sorted(s.columns_needed() - {uid})
    sel = recs.select([uid] + [c for c in out_cols if c in recs.column_names])
    a, b = np.triu_indices(700, k=1)
    lt = sel.take(pa.array(a)); rt = sel.take(pa.array(b))
    data = {f"{uid}_l": lt[uid], f"{uid}_r": rt[uid]}
    for c in out_cols:
        if c in sel.column_names:
            data[f"{c}_l"] = lt[c]; data[f"{c}_r"] = rt[c]
    data["match_key"] = pa.array(np.zeros(len(a), np.int32), pa.int32())
    wide = pa.table(data)
    ctx = make_eval_context(s)
    score_pair_batch(wide, s, ctx, {}, ["unique_id_l","unique_id_r","match_key"])
    t0 = time.time(); done = 0
    while done < npairs:
        score_pair_batch(wide, s, ctx, {}, ["unique_id_l","unique_id_r","match_key"])
        done += len(a)
    out_q.put(done / (time.time()-t0))

if __name__ == "__main__":
    mp.set_start_method("spawn")
    base = None
    for P in (1, 4, 8, 16, 32):
        q = mp.Queue()
        procs = [mp.Process(target=worker, args=(1_200_000, q)) for _ in range(P)]
        [p.start() for p in procs]
        rates = [q.get() for _ in procs]
        [p.join() for p in procs]
        agg = sum(rates)
        if base is None: base = agg
        print(f"P={P:2d}  per-core={agg/P:9,.0f} pairs/s  aggregate={agg:11,.0f}  per-core-retention={agg/P/base:.3f}")
