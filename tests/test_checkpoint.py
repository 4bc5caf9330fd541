"""Resume + determinism tests (SURVEY.md §5.2.7, north_rule resumability)."""

import os
import shutil

import pandas as pd
import pytest

from splink_ray.datasets import generate_transcripts
from splink_ray.pipelines.flagship import transcript_settings
from splink_ray.stages.canonicalize import canonicalize_bucket
from splink_ray.state.checkpoint import RunCheckpoint, predict_with_checkpoints


@pytest.fixture(scope="module")
def records(ray_session):
    import ray.data as rd

    tables = generate_transcripts(n_entities=60, seed=21)
    return rd.from_arrow(canonicalize_bucket(tables["transcripts"])).materialize()


def _sorted_df(ds):
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_stage_skip_and_recompute(ray_session, records, tmp_path):
    run_dir = str(tmp_path / "run")
    s = transcript_settings()
    out1, info1 = predict_with_checkpoints(records, s, run_dir, threshold_match_probability=0.5)
    df1 = _sorted_df(out1)
    assert info1["skipped"] == []

    # rerun: every stage is skipped, output identical
    out2, info2 = predict_with_checkpoints(records, s, run_dir, threshold_match_probability=0.5)
    assert set(info2["skipped"]) == {"records", "scored"}
    pd.testing.assert_frame_equal(df1, _sorted_df(out2))

    # kill simulation: drop the scored stage → only it recomputes
    shutil.rmtree(os.path.join(run_dir, "scored"))
    out3, info3 = predict_with_checkpoints(records, s, run_dir, threshold_match_probability=0.5)
    assert info3["skipped"] == ["records"]
    pd.testing.assert_frame_equal(df1, _sorted_df(out3))


def test_config_change_invalidates(ray_session, records, tmp_path):
    run_dir = str(tmp_path / "run")
    s = transcript_settings()
    predict_with_checkpoints(records, s, run_dir, threshold_match_probability=0.5)
    s2 = transcript_settings(probability_two_random_records_match=0.2)
    assert s2.config_hash() != s.config_hash()
    _, info = predict_with_checkpoints(records, s2, run_dir, threshold_match_probability=0.5)
    assert "scored" not in info["skipped"]


def test_manifest_contents(ray_session, records, tmp_path):
    run_dir = str(tmp_path / "run")
    s = transcript_settings()
    predict_with_checkpoints(records, s, run_dir, threshold_match_probability=0.5)
    ck = RunCheckpoint(run_dir, s.config_hash())
    m = ck.manifest("scored")
    assert m["rows"] > 0
    assert m["config_key"] == s.config_hash()
    assert m["metrics"]["rules"][0]["total_pairs_pre_exclusion"] > 0
    assert os.path.exists(os.path.join(run_dir, "scored", "_DONE"))


def test_determinism_two_full_runs(ray_session, records, tmp_path):
    """Two independent runs → identical sorted outputs (fixed seeds, fixed
    comparison order, deterministic hashing)."""
    s = transcript_settings()
    a, _ = predict_with_checkpoints(records, s, str(tmp_path / "a"), threshold_match_probability=0.5)
    b, _ = predict_with_checkpoints(records, s, str(tmp_path / "b"), threshold_match_probability=0.5)
    pd.testing.assert_frame_equal(_sorted_df(a), _sorted_df(b))


def test_bucket_partitioned_resume(ray_session, records, tmp_path):
    """north_rule: a killed predict resumes at BUCKET granularity — finished
    buckets are skipped without rescoring, output identical."""
    import glob

    from splink_ray.pipelines.predict import predict_to_partitioned

    s = transcript_settings()
    d = str(tmp_path / "scored")
    scored1, _, stats1 = predict_to_partitioned(
        records, s, d, threshold_match_probability=0.5, num_buckets=8
    )
    df1 = _sorted_df(scored1)
    assert stats1["skipped"].sum() == 0
    buckets = sorted(glob.glob(os.path.join(d, "bucket-*")))
    assert len(buckets) >= 2

    # kill simulation: two buckets lost, one stale tmp left behind
    shutil.rmtree(buckets[0])
    shutil.rmtree(buckets[1])
    os.makedirs(os.path.join(d, "bucket-999.tmp"))

    scored2, _, stats2 = predict_to_partitioned(
        records, s, d, threshold_match_probability=0.5, num_buckets=8
    )
    assert stats2["skipped"].sum() == len(stats2) - 2  # only lost buckets rescored
    pd.testing.assert_frame_equal(df1, _sorted_df(scored2))


def test_checkpointed_predict_uses_bucket_partitions(ray_session, records, tmp_path):
    import glob

    run_dir = str(tmp_path / "run")
    s = transcript_settings()
    out, info = predict_with_checkpoints(records, s, run_dir, threshold_match_probability=0.5)
    assert info["bucket_stats"]["skipped_buckets"] == 0
    parts = glob.glob(os.path.join(run_dir, "scored", "data", "bucket-*"))
    assert parts, "scored stage should be bucket-partitioned"
    # rerun skips the whole stage
    _, info2 = predict_with_checkpoints(records, s, run_dir, threshold_match_probability=0.5)
    assert "scored" in info2["skipped"]


def test_edge_sidecar_matches_scored_threshold(ray_session, records, tmp_path):
    """The per-bucket clustering edge sidecar must equal the scored table
    filtered at the edge threshold, and survive a bucket-resume untouched."""
    import glob

    import ray.data as rd

    from splink_ray.pipelines.predict import predict_to_partitioned

    s = transcript_settings()
    d = str(tmp_path / "scored")
    ed = str(tmp_path / "edges")
    scored, _, stats = predict_to_partitioned(
        records, s, d, num_buckets=8, edge_dir=ed, edge_threshold=0.9
    )
    sdf = scored.to_pandas()
    exp = sdf[sdf.match_probability >= 0.9][
        ["unique_id_l", "unique_id_r", "match_probability"]
    ]
    edf = rd.read_parquet(ed).to_pandas()
    key = ["unique_id_l", "unique_id_r"]
    pd.testing.assert_frame_equal(
        exp.sort_values(key).reset_index(drop=True),
        edf.sort_values(key).reset_index(drop=True),
    )
    # resume: kill one bucket, rerun — edges still complete and identical
    buckets = sorted(glob.glob(os.path.join(d, "bucket-*")))
    shutil.rmtree(buckets[0])
    _, _, stats2 = predict_to_partitioned(
        records, s, d, num_buckets=8, edge_dir=ed, edge_threshold=0.9
    )
    assert stats2["skipped"].sum() == len(stats2) - 1
    edf2 = rd.read_parquet(ed).to_pandas()
    pd.testing.assert_frame_equal(
        edf.sort_values(key).reset_index(drop=True),
        edf2.sort_values(key).reset_index(drop=True),
    )
