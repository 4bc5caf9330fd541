"""Stage checkpoints with manifests — resumable pipelines.

The reference caches intermediate tables by SQL-hash within a session
(``splink/internals/pipeline.py::CTEPipeline``,
``…/cache_dict_with_logging.py``) but has NO cross-run resume; the north_rule
requires it ("a killed job resumes without rescoring completed blocks").

Layout (SURVEY.md §4.2.4)::

    {run_dir}/{stage}/data/part-*.parquet # the stage output
    {run_dir}/{stage}/manifest.json       # config hash, input hash, rows,
                                          # metrics, wall time
    {run_dir}/{stage}/_DONE               # written last → atomic completion

A stage whose manifest matches (same stage key = config hash ⊕ input key) is
skipped on rerun and its parquet is read back instead of recomputing. Writes
go to ``{stage}.tmp`` and are renamed into place, so a kill mid-write leaves
no half-stage that could be mistaken for complete.
"""

from __future__ import annotations

import json
import os
import shutil
import time


class RunCheckpoint:
    def __init__(self, run_dir: str, config_key: str):
        self.run_dir = run_dir
        self.config_key = config_key
        os.makedirs(run_dir, exist_ok=True)

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.run_dir, stage)

    def is_complete(self, stage: str, input_key: str = "") -> bool:
        d = self._stage_dir(stage)
        if not os.path.exists(os.path.join(d, "_DONE")):
            return False
        try:
            with open(os.path.join(d, "manifest.json")) as f:
                m = json.load(f)
        except Exception:
            return False
        return m.get("config_key") == self.config_key and m.get("input_key") == input_key

    def manifest(self, stage: str) -> dict | None:
        try:
            with open(os.path.join(self._stage_dir(stage), "manifest.json")) as f:
                return json.load(f)
        except Exception:
            return None

    def load(self, stage: str):
        import ray.data as rd

        return rd.read_parquet(os.path.join(self._stage_dir(stage), "data"))

    def save(self, stage: str, ds, input_key: str = "", metrics: dict | None = None):
        """Write ``ds`` as the stage output atomically; returns the re-read
        Dataset (so downstream reads parquet, not re-executed lineage)."""
        d = self._stage_dir(stage)
        tmp = d + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if os.path.exists(d):
            shutil.rmtree(d)
        t0 = time.time()
        data_dir = os.path.join(tmp, "data")
        ds.write_parquet(data_dir)
        import pyarrow.parquet as pq

        rows = 0
        for f in os.listdir(data_dir):
            if f.endswith(".parquet"):
                rows += pq.read_metadata(os.path.join(data_dir, f)).num_rows
        manifest = {
            "stage": stage,
            "config_key": self.config_key,
            "input_key": input_key,
            "rows": rows,
            "wall_seconds": round(time.time() - t0, 3),
            "metrics": metrics or {},
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2, default=str)
        os.rename(tmp, d)
        open(os.path.join(d, "_DONE"), "w").close()
        return self.load(stage)

    def stage(self, name: str, compute_fn, input_key: str = "", metrics_fn=None):
        """Run-or-load: ``compute_fn() -> Dataset`` executes only when the
        stage isn't already complete for this config+input."""
        if self.is_complete(name, input_key):
            return self.load(name), True
        ds = compute_fn()
        metrics = metrics_fn() if metrics_fn else None
        return self.save(name, ds, input_key=input_key, metrics=metrics), False


def dataset_fingerprint(ds) -> str:
    """Cheap content key for a Dataset: source files + schema when the input
    is file-backed (no execution), else row count + schema. Feeds checkpoint
    ``input_key``s so a rerun with different input data never reuses a stale
    stage (ADVICE r01)."""
    import hashlib

    try:
        files = sorted(ds.input_files() or [])
    except Exception:
        files = []
    try:
        names = list(ds.schema().names)
    except Exception:
        names = []
    if files:
        basis = json.dumps({"files": files, "schema": names}, sort_keys=True)
    else:
        basis = json.dumps({"rows": ds.count(), "schema": names}, sort_keys=True)
    return hashlib.sha256(basis.encode()).hexdigest()[:16]


def predict_with_checkpoints(
    records_ds,
    settings,
    run_dir: str,
    threshold_match_probability: float | None = None,
    cluster_threshold: float | None = None,
    num_buckets: int | None = None,
):
    """Checkpointed flagship flow: records → scored pairs [→ clusters].

    Each stage is skipped on rerun when its manifest matches the settings'
    config hash AND its input key — a fingerprint of the input data plus
    every out-of-Settings parameter that shapes the stage's output
    (thresholds, bucket count). Connected components additionally checkpoints
    per round under ``{run_dir}/cc/``. Returns (final Dataset, info dict)."""
    from ..pipelines.predict import predict
    from ..pipelines.clustering import cluster_pairwise_predictions_at_threshold

    ck = RunCheckpoint(run_dir, settings.config_hash())
    info: dict = {"skipped": []}
    input_fp = dataset_fingerprint(records_ds)

    def _records():
        return records_ds

    records, skipped = ck.stage("records", _records, input_key=input_fp)
    if skipped:
        info["skipped"].append("records")

    metrics_box = {}
    fused = not settings.retain_matching_columns and not any(
        r.is_exploding for r in settings.blocking_rules_to_generate_predictions
    )
    if num_buckets is None and fused:
        # pin the bucket count so a resume on different CPU counts reuses
        # the same bucket partitioning
        from ..stages.exchange import default_num_buckets

        num_buckets = default_num_buckets()
    scored_key = f"{input_fp}|thr={threshold_match_probability}|buckets={num_buckets}"

    if fused:
        # bucket-granular resume: the scored stage accumulates per-bucket
        # parquet partitions under `scored.partial/data/bucket-*`; a rerun
        # after a kill re-runs the exchange but SKIPS rescoring of buckets
        # whose _DONE marker exists, then the stage finalizes atomically.
        from ..pipelines.predict import predict_to_partitioned

        if ck.is_complete("scored", scored_key):
            scored = ck.load("scored")
            info["skipped"].append("scored")
        else:
            d = ck._stage_dir("scored")
            partial = d + ".partial"
            keyfile = os.path.join(partial, "stage_key")
            if os.path.exists(partial):
                try:
                    stale = open(keyfile).read() != f"{ck.config_key}|{scored_key}"
                except Exception:
                    stale = True
                if stale:
                    shutil.rmtree(partial)
            data_dir = os.path.join(partial, "data")
            os.makedirs(data_dir, exist_ok=True)
            with open(keyfile, "w") as f:
                f.write(f"{ck.config_key}|{scored_key}")
            scored, metrics, stats = predict_to_partitioned(
                records,
                settings,
                data_dir,
                threshold_match_probability=threshold_match_probability,
                num_buckets=num_buckets,
            )
            metrics_box.update(metrics)
            info["bucket_stats"] = {
                "n_buckets": int(len(stats)),
                "skipped_buckets": int(stats["skipped"].sum()) if len(stats) else 0,
            }
            import pyarrow.parquet as pq

            rows = 0
            for root_, _dirs, files_ in os.walk(data_dir):
                for fname in files_:
                    if fname.endswith(".parquet"):
                        rows += pq.read_metadata(os.path.join(root_, fname)).num_rows
            manifest = {
                "stage": "scored",
                "config_key": ck.config_key,
                "input_key": scored_key,
                "rows": rows,
                "metrics": metrics_box,
                "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            with open(os.path.join(partial, "manifest.json"), "w") as f:
                json.dump(manifest, f, indent=2, default=str)
            os.remove(keyfile)
            if os.path.exists(d):
                shutil.rmtree(d)
            os.rename(partial, d)
            open(os.path.join(d, "_DONE"), "w").close()
            scored = ck.load("scored")
    else:

        def _scored():
            scored, metrics = predict(
                records,
                settings,
                threshold_match_probability=threshold_match_probability,
                num_buckets=num_buckets,
                materialize_records=False,
            )
            metrics_box.update(metrics)
            return scored

        scored, skipped = ck.stage(
            "scored", _scored, input_key=scored_key, metrics_fn=lambda: metrics_box
        )
        if skipped:
            info["skipped"].append("scored")
    info["blocking_metrics"] = (ck.manifest("scored") or {}).get("metrics")

    if cluster_threshold is None:
        return scored, info

    def _clustered():
        clustered, cinfo = cluster_pairwise_predictions_at_threshold(
            records,
            scored,
            cluster_threshold,
            uid=settings.unique_id_column_name,
            checkpoint_dir=os.path.join(run_dir, "cc"),
        )
        info["clustering"] = cinfo
        return clustered

    clustered, skipped = ck.stage(
        "clustered", _clustered, input_key=f"{scored_key}|ct={cluster_threshold}"
    )
    if skipped:
        info["skipped"].append("clustered")
    return clustered, info
