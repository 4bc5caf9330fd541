#!/usr/bin/env python
"""Benchmark harness (task brief contract).

Default mode: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) plus the bench-scale transcript linkage, under
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32), and
prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "pairs_scored": P, "pairs_scored_per_sec": R, "turns": T}

The recorded number is a MEDIAN: one untimed warmup linkage run, then
``$BENCH_RUNS`` (default 3) timed runs, per-stage medians (this box swings
±15% on identical code — BASELINE.md round-2 environment note — so a single
draw is not a measurement). Per-run linkage times are included in the JSON.

``--scaling`` mode: runs the identical job in two fresh processes at
num_cpus=$BENCH_SCALE_LO and $BENCH_SCALE_HI (default 4 and 16 — both legs
below this VM's >16-core hypervisor steal throttle; set LO=8 HI=32 for the
full-width pair, steal%% is recorded per leg either way) on the same
(pre-generated, page-warm) input and prints both times + scaling
efficiency = (T_lo/T_hi)/(hi/lo) — the sandbox substitute for the
N-vs-4N-node cluster criterion (SURVEY.md §4.2.5). Scaling legs use
BENCH_RUNS=1 (wall-clock bounded); run the mode twice for two series.

The transcript fixture is generated once (vectorized, seed-fixed) and cached
under /tmp/splink_ray_bench; generation is never timed.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

BENCH_DIR = "/tmp/splink_ray_bench"
# pipeline outputs go to tmpfs: a single VM disk (~150 MB/s) caps a
# 10-GB scored write identically at every CPU count, which a multi-node
# cluster's storage would not — tmpfs bandwidth scales like cluster storage
OUT_BASE = "/dev/shm/splink_ray_bench"
SEED = 42


def _fixture_path(turns: int) -> str:
    epd = os.environ.get("BENCH_EPD", "1000")
    return os.path.join(BENCH_DIR, f"transcripts_{turns}_s{SEED}_v4_epd{epd}")


def ensure_fixture(turns: int) -> str:
    """Generate+cache the bench transcripts (pure function of args)."""
    path = _fixture_path(turns)
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    import pyarrow.parquet as pq

    from splink_ray.datasets import generate_transcripts_fast

    os.makedirs(path, exist_ok=True)
    # dense day-blocks (entities_per_day) are the honest 10^12-turn shape:
    # blocking keys at that scale have multi-thousand-row blocks (the reason
    # salting/capping exist), and they make the bench compute-bound
    tbl = generate_transcripts_fast(
        turns, seed=SEED, entities_per_day=int(os.environ.get("BENCH_EPD", "1000"))
    )
    # several files so the read parallelizes
    n_files = 16
    step = (tbl.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        part = tbl.slice(i * step, step)
        if part.num_rows:
            pq.write_table(part, os.path.join(path, f"part-{i:03d}.parquet"))
    open(done, "w").close()
    return path


def _cpu_stat() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from /proc/stat — 0s if unreadable."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        return (vals[7] if len(vals) > 7 else 0, sum(vals))
    except Exception:
        return (0, 0)


def run_linkage(fixture: str, out_dir: str, turns: int) -> tuple[dict, dict]:
    """One full linkage: canonicalize → predict (bucket sink + clustering
    edge sidecar) → connected components. Returns (timings, extras)."""
    import shutil

    import ray.data as rd

    from splink_ray.pipelines.clustering import (
        cluster_pairwise_predictions_at_threshold,
    )
    from splink_ray.pipelines.flagship import transcript_settings
    from splink_ray.pipelines.predict import predict_to_partitioned
    from splink_ray.stages.canonicalize import canonicalize

    timings: dict[str, float] = {}
    extras: dict = {}
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)

    # ---- q1: canonicalize -------------------------------------------------
    t0 = time.time()
    records = canonicalize(rd.read_parquet(fixture))
    records.write_parquet(os.path.join(out_dir, "records"))
    timings["canonicalize"] = round(time.time() - t0, 2)
    records = rd.read_parquet(os.path.join(out_dir, "records"))
    n_records = records.count()
    extras["records"] = n_records
    extras["turns_canonicalized_per_sec"] = round(turns / timings["canonicalize"])

    # ---- q2: predict (salted pairgen + fused gamma/FS scoring, written as
    # resumable per-bucket partitions; the clustering edge list is extracted
    # as a sidecar while the scored chunks are in hand — no re-scan) --------
    settings = transcript_settings()
    settings.hot_key_threshold = int(os.environ.get("BENCH_HOT", "1200"))
    settings.target_rows_per_salted_block = int(os.environ.get("BENCH_SALT_TARGET", "600"))
    scored_dir = os.path.join(out_dir, "scored")
    edge_dir = os.path.join(out_dir, "edges")
    t0 = time.time()
    scored, metrics, stats = predict_to_partitioned(
        records, settings, scored_dir, edge_dir=edge_dir, edge_threshold=0.9
    )
    timings["predict"] = round(time.time() - t0, 2)
    pairs_scored = int(stats.loc[~stats["skipped"], "rows"].sum())
    extras["pairs_scored"] = pairs_scored
    extras["pairs_scored_per_sec"] = round(pairs_scored / timings["predict"])
    extras["blocking"] = metrics["rules"]

    # ---- q3: cluster (reads the narrow pre-thresholded edge sidecar) ------
    t0 = time.time()
    edges = rd.read_parquet(edge_dir)
    clustered, cinfo = cluster_pairwise_predictions_at_threshold(
        records, edges, threshold_match_probability=None
    )
    clustered.count()
    timings["cluster"] = round(time.time() - t0, 2)
    extras["clustering"] = cinfo
    return timings, extras


def run_corpus_ops(sf_dir: str) -> tuple[dict, dict]:
    """Corpus operators over the driver testdata (q4–q6)."""
    import numpy as np
    import ray.data as rd

    from splink_ray.stages.ann import knn_brute_force
    from splink_ray.stages.dedup import minhash_lsh_pairs
    from splink_ray.stages.tf import term_frequency_table

    timings: dict[str, float] = {}
    extras: dict = {}
    t0 = time.time()
    term_frequency_table(
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_mktsegment"]),
        "c_mktsegment",
    )
    timings["tf"] = round(time.time() - t0, 2)

    t0 = time.time()
    extras["minhash_pairs"] = minhash_lsh_pairs(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        "text",
        "doc_id",
        threshold=0.5,
    ).count()
    timings["minhash_dedup"] = round(time.time() - t0, 2)

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    head = emb.limit(8).to_pandas()
    t0 = time.time()
    knn_brute_force(
        emb, "embedding", "vec_id",
        np.asarray(head.embedding.tolist(), np.float64),
        head.vec_id.tolist(), k=10,
    ).count()
    timings["knn"] = round(time.time() - t0, 2)
    return timings, extras


def run_bench(sf_dir: str, num_cpus: int, turns: int) -> dict:
    import ray

    fixture = ensure_fixture(turns)

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    out_dir = os.path.join(OUT_BASE, f"out_{num_cpus}")

    # warm the page cache (untimed) so both CPU levels measure compute+shuffle
    rd.read_parquet(fixture).count()

    runs = int(os.environ.get("BENCH_RUNS", "3"))
    if runs > 1:
        # one full untimed warmup linkage: spins worker processes, allocator
        # arenas, and the kernel page pool before any timed sample
        run_linkage(fixture, out_dir, turns)
    elif os.environ.get("BENCH_WARMUP_SMALL") == "1":
        # scaling legs run a single timed sample (wall-clock bounded): spin
        # the worker pool + allocator arenas on a small fixture instead, so
        # process-startup latency doesn't land inside the timed run (it
        # lands on both legs equally in absolute terms, i.e. relatively
        # harder on the fast leg — a measurement artifact, not pipeline work;
        # on a real cluster workers are long-lived)
        warm_turns = 200_000
        run_linkage(ensure_fixture(warm_turns), out_dir, warm_turns)

    # BENCH_MONITOR=1: poll object-store usage during the timed window (for
    # the large-turn memory-scale runs — proves "no spill, bounded store"
    # beyond the default bench size). Peak = max(total - available) over
    # 2-second samples; spill bytes read from Ray's own memory summary.
    mon: dict = {}
    mon_stop = None
    if os.environ.get("BENCH_MONITOR") == "1":
        import threading

        total_store = ray.cluster_resources().get("object_store_memory", 0)
        mon["object_store_total_bytes"] = int(total_store)
        mon["object_store_peak_bytes"] = 0
        mon_stop = threading.Event()

        def _poll():
            while not mon_stop.is_set():
                try:
                    # Ray OMITS resources whose available quantity is 0, so a
                    # missing key means FULLY USED — default 0.0, never total
                    avail = ray.available_resources().get("object_store_memory", 0.0)
                    used = int(total_store - avail)
                    if used > mon["object_store_peak_bytes"]:
                        mon["object_store_peak_bytes"] = used
                except Exception:
                    pass
                mon_stop.wait(2.0)

        threading.Thread(target=_poll, daemon=True).start()

    st0, tt0 = _cpu_stat()
    linkage_samples: list[tuple[dict, dict]] = []
    for _ in range(runs):
        linkage_samples.append(run_linkage(fixture, out_dir, turns))
    corpus_samples = [run_corpus_ops(sf_dir) for _ in range(runs)]
    st1, tt1 = _cpu_stat()
    if mon_stop is not None:
        mon_stop.set()
        try:
            from ray._private.internal_api import memory_summary

            summ = memory_summary(stats_only=True)
            for line in summ.splitlines():
                if "Spilled" in line:
                    mon["spill_summary"] = line.strip()
                    break
            else:
                mon["spill_summary"] = "no spill line (nothing spilled)"
        except Exception:
            # no grpc in this env — fall back to the raylet's own spill log
            # lines plus the on-disk spill directory size
            import glob as _glob

            spilled = []
            for log in _glob.glob("/tmp/ray/session_latest/logs/raylet.out"):
                try:
                    with open(log, errors="replace") as f:
                        spilled += [
                            ln.strip() for ln in f if "Spilled " in ln
                        ][-2:]
                except OSError:
                    pass
            spill_bytes = 0
            for d in _glob.glob("/tmp/ray/session_latest/ray_spilled_objects*"):
                for root, _dirs, files in os.walk(d):
                    for fn in files:
                        try:
                            spill_bytes += os.path.getsize(os.path.join(root, fn))
                        except OSError:
                            pass
            mon["spill_summary"] = (
                spilled[-1] if spilled else "no raylet spill lines (nothing spilled)"
            )
            mon["spill_dir_bytes"] = spill_bytes

    def med(samples, key) -> float:
        return round(statistics.median(s[0][key] for s in samples), 2)

    timings = {k: med(linkage_samples, k) for k in ("canonicalize", "predict", "cluster")}
    timings |= {k: med(corpus_samples, k) for k in ("tf", "minhash_dedup", "knn")}
    extras = {"turns": turns, **linkage_samples[-1][1], **corpus_samples[-1][1]}
    extras["turns_canonicalized_per_sec"] = round(turns / timings["canonicalize"])
    extras["pairs_scored_per_sec"] = round(extras["pairs_scored"] / timings["predict"])
    per_run = [
        round(s[0]["canonicalize"] + s[0]["predict"] + s[0]["cluster"], 2)
        for s in linkage_samples
    ]
    extras["linkage_runs"] = per_run
    if mon:
        extras.update(mon)
    extras["bench_runs"] = runs
    if tt1 > tt0:
        # hypervisor CPU steal during the timed window: this VM is throttled
        # under sustained >16-core load (vmstat showed 19% steal at 32-core
        # burn, 0% at 16) — a per-draw contamination record, so any slow
        # sample carries its own evidence
        extras["cpu_steal_pct"] = round(100 * (st1 - st0) / (tt1 - tt0), 2)
    if runs > 1:
        spread = (max(per_run) - min(per_run)) / max(min(per_run), 1e-9)
        extras["linkage_run_spread"] = round(spread, 3)

    ray.shutdown()

    total = round(sum(timings.values()), 2)
    extras["linkage_sec"] = round(
        timings["canonicalize"] + timings["predict"] + timings["cluster"], 2
    )
    return {
        "metric": "transcript_linkage_e2e",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        **extras,
    }


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    turns = int(os.environ.get("BENCH_TURNS", "1000000"))

    if "--scaling" in sys.argv:
        # scaling evidence defaults to the AMORTIZED configuration (4M turns
        # at default density): per-op fixed latencies are noise there, so the
        # ratio measures the pipeline, not the ~1-3 s/op session constants
        # (BASELINE.md "Scaling decomposition"). Override with BENCH_TURNS /
        # BENCH_EPD. One timed run per leg (BENCH_RUNS=1): a leg takes
        # minutes, and the two legs see identical box state back-to-back.
        if "BENCH_TURNS" not in os.environ:
            turns = 4_000_000
        os.environ.setdefault("BENCH_EPD", "1000")
        os.environ["BENCH_TURNS"] = str(turns)
        os.environ.setdefault("BENCH_RUNS", "1")
        os.environ.setdefault("BENCH_WARMUP_SMALL", "1")
        # identical plan at both legs: partition count sized by DATA (what a
        # production job does — the plan doesn't change with cluster size,
        # only the schedule), 8 buckets per high-leg CPU
        os.environ.setdefault(
            "SPLINK_RAY_NUM_BUCKETS",
            str(int(os.environ.get("BENCH_SCALE_HI", "16")) * 8),
        )
        ensure_fixture(turns)  # generate + warm once, outside both timings

        def run(ncpu: int) -> dict:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout
            return json.loads(out.strip().splitlines()[-1])

        # N and 4N CPUs (the sandbox proxy for N vs 4N nodes). Default 4→16:
        # this VM's hypervisor throttles sustained full-width load (measured
        # up to 19% CPU steal at 32-process load, 0% at 16 — BASELINE.md
        # "Round 3"), so an 8→32 comparison caps ONLY its high leg — an
        # asymmetry no real N→4N cluster has (every node runs the same
        # per-node load at both cluster sizes). At 4→16 both legs run below
        # the throttle and the ratio is clean and reproducible; the per-leg
        # steal%% is recorded in the output JSON either way so a contaminated
        # draw carries its own evidence. BENCH_SCALE_LO/HI override.
        lo = int(os.environ.get("BENCH_SCALE_LO", "4"))
        hi = int(os.environ.get("BENCH_SCALE_HI", "16"))
        r_lo = run(lo)
        r_hi = run(hi)
        # efficiency on the headline linkage pipeline (canonicalize +
        # predict + cluster over the same input)
        eff = (r_lo["linkage_sec"] / r_hi["linkage_sec"]) / (hi / lo)
        # per-stage view: the predict stage carries ~95% of the work at the
        # dense density; fixed per-op latencies weigh the e2e ratio down
        # (see BASELINE.md "Scaling decomposition")
        pred_eff = (
            r_hi["pairs_scored_per_sec"] / r_lo["pairs_scored_per_sec"]
        ) / (hi / lo)
        print(
            json.dumps(
                {
                    "metric": "scaling_efficiency",
                    "value": round(eff, 3),
                    "predict_stage_efficiency": round(pred_eff, 3),
                    "unit": "ratio",
                    f"linkage_sec_{lo}": r_lo["linkage_sec"],
                    f"linkage_sec_{hi}": r_hi["linkage_sec"],
                    f"sec_{lo}": r_lo["value"],
                    f"sec_{hi}": r_hi["value"],
                    f"pairs_per_sec_{lo}": r_lo["pairs_scored_per_sec"],
                    f"pairs_per_sec_{hi}": r_hi["pairs_scored_per_sec"],
                    # per-stage wall at each leg: shows WHERE the efficiency
                    # is lost (fixed per-op latency vs parallel-work scaling)
                    f"stages_{lo}": r_lo["queries"],
                    f"stages_{hi}": r_hi["queries"],
                    f"steal_pct_{lo}": r_lo.get("cpu_steal_pct"),
                    f"steal_pct_{hi}": r_hi.get("cpu_steal_pct"),
                    "sf": sf_dir,
                    "turns": turns,
                }
            )
        )
        return

    print(json.dumps(run_bench(sf_dir, num_cpus, turns)))


if __name__ == "__main__":
    main()
