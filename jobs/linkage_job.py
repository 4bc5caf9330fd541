"""`ray job submit`-ready driver for the flagship transcript linkage.

The north-star run shape (BASELINE.json): a fixed-size multi-node Ray
cluster executes canonicalize → salted blocking + fused Fellegi-Sunter
scoring → connected components over a Parquet transcript table, resumable
from per-partition checkpoints. Submit it to a running cluster with:

    ray job submit --address http://<head>:8265 \
        --working-dir . -- python jobs/linkage_job.py \
        --input  s3://bucket/transcripts/ \
        --output s3://bucket/linkage-run-01/ \
        --edge-threshold 0.9 --cluster-threshold 0.9

or run it standalone on one node (`python jobs/linkage_job.py ...`) — the
script initialises Ray only if the job runtime has not already done so.

Resume semantics: every stage is checkpointed under ``--output``
(`splink_ray.state.checkpoint.RunCheckpoint` manifests keyed by the
settings hash), and the predict stage writes one parquet partition per
exchange bucket with atomic ``_DONE`` markers
(`pipelines.predict.predict_to_partitioned`) — a killed job re-submitted
with the same arguments skips canonicalize if complete and rescored
buckets individually, never the finished ones. Metrics (per-rule pair
counts, salting, capping overflow, per-stage wall time) land in
``<output>/metrics.json``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="Parquet directory of transcripts "
                         "(conv_id, turn_idx, role, text, tool, ts)")
    ap.add_argument("--output", required=True,
                    help="run directory: checkpoints, scored buckets, "
                         "edges, clusters, metrics.json")
    ap.add_argument("--edge-threshold", type=float, default=0.9,
                    help="match-probability cut for the clustering edge "
                         "sidecar extracted during scoring")
    ap.add_argument("--cluster-threshold", type=float, default=None,
                    help="re-threshold edges at clustering time (defaults "
                         "to the edge sidecar as written)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` the job runtime sets RAY_ADDRESS; standalone
        # (no cluster) must pass NO address — address="auto" raises
        # ConnectionError when nothing is running (ADVICE r3)
        ray.init(address=os.environ.get("RAY_ADDRESS"),
                 ignore_reinit_error=True)

    import ray.data as rd

    from splink_ray.pipelines.clustering import (
        cluster_pairwise_predictions_at_threshold,
    )
    from splink_ray.pipelines.flagship import transcript_settings
    from splink_ray.pipelines.predict import predict_to_partitioned
    from splink_ray.stages.canonicalize import canonicalize
    from splink_ray.state.checkpoint import RunCheckpoint

    settings = transcript_settings()
    ckpt = RunCheckpoint(args.output, settings.config_hash())
    metrics: dict = {"input": args.input, "output": args.output}

    # ---- stage 1: canonicalize (skipped wholesale when complete) ----------
    t0 = time.time()
    if ckpt.is_complete("records", input_key=args.input):
        records = ckpt.load("records")
        metrics["canonicalize"] = {"resumed": True}
    else:
        records = canonicalize(rd.read_parquet(args.input))
        ckpt.save("records", records, input_key=args.input)
        records = ckpt.load("records")
        metrics["canonicalize"] = {"resumed": False,
                                   "sec": round(time.time() - t0, 2)}

    # ---- stage 2: blocking + fused scoring (per-bucket resume) ------------
    t0 = time.time()
    scored_dir = os.path.join(args.output, "scored")
    edge_dir = os.path.join(args.output, "edges")
    scored, pmetrics, stats = predict_to_partitioned(
        records, settings, scored_dir,
        edge_dir=edge_dir, edge_threshold=args.edge_threshold,
    )
    metrics["predict"] = {
        "sec": round(time.time() - t0, 2),
        "pairs_scored": int(stats.loc[~stats["skipped"], "rows"].sum()),
        "buckets_resumed": int(stats["skipped"].sum()),
        "rules": pmetrics["rules"],
    }

    # ---- stage 3: connected components (per-round checkpoints inside) ----
    t0 = time.time()
    edges = rd.read_parquet(edge_dir)
    clustered, cinfo = cluster_pairwise_predictions_at_threshold(
        records, edges, threshold_match_probability=args.cluster_threshold,
    )
    clusters_dir = os.path.join(args.output, "clusters")
    import shutil

    shutil.rmtree(clusters_dir, ignore_errors=True)  # final stage: rewrite
    clustered.write_parquet(clusters_dir)
    metrics["cluster"] = {"sec": round(time.time() - t0, 2), **cinfo}

    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2, default=str)
    print(json.dumps(metrics, default=str))


if __name__ == "__main__":
    main()
