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
