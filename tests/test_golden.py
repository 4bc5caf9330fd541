"""Golden-output regression (SURVEY.md §5.2.5): the full flagship pipeline on
the committed fixture must reproduce the committed cluster parquet exactly.
Catches any semantic drift in canonicalize/blocking/scoring/clustering."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "clusters_seed42_n120.parquet")


def _run_pipeline():
    import ray.data as rd

    from splink_ray.datasets import generate_transcripts
    from splink_ray.pipelines.clustering import cluster_pairwise_predictions_at_threshold
    from splink_ray.pipelines.flagship import transcript_settings
    from splink_ray.pipelines.predict import predict
    from splink_ray.stages.canonicalize import canonicalize

    tables = generate_transcripts(n_entities=120, seed=42)
    records = canonicalize(
        rd.from_arrow(tables["transcripts"]).repartition(6), num_buckets=4
    ).materialize()
    scored, _ = predict(records, transcript_settings(), threshold_match_probability=0.5)
    clustered, _ = cluster_pairwise_predictions_at_threshold(records, scored, 0.9)
    df = (
        clustered.select_columns(["unique_id", "cluster_id"])
        .to_pandas()
        .sort_values("unique_id")
        .reset_index(drop=True)
    )
    return df


def test_golden_clusters(ray_session):
    got = _run_pipeline()
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        pq.write_table(pa.Table.from_pandas(got, preserve_index=False), GOLDEN)
        pytest.skip("golden written on first run; commit tests/golden/")
    exp = pq.read_table(GOLDEN).to_pandas()
    pd.testing.assert_frame_equal(got, exp)
