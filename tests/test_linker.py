"""Linker facade — the splink-4-shaped end-to-end user flow
(train → predict → cluster → evaluate) on the transcript fixture."""

import numpy as np
import pandas as pd
import pytest

from splink_ray import Linker
from splink_ray.datasets import generate_transcripts
from splink_ray.pipelines.flagship import transcript_settings
from splink_ray.stages.canonicalize import canonicalize_bucket


@pytest.fixture(scope="module")
def fixture_tables():
    return generate_transcripts(n_entities=100, seed=5)


@pytest.fixture(scope="module")
def linker(ray_session, fixture_tables):
    records = canonicalize_bucket(fixture_tables["transcripts"])
    return Linker(records, transcript_settings())


def test_full_linker_flow(linker, fixture_tables):
    preds = linker.inference.predict(threshold_match_probability=0.5)
    clustered = linker.clustering.cluster_pairwise_predictions_at_threshold(preds, 0.9)
    got = clustered.select_columns(["unique_id", "cluster_id"]).to_pandas()
    exp = fixture_tables["expected_clusters"].to_pandas()
    merged = got.merge(exp, on="unique_id", suffixes=("_got", "_exp"))
    # cluster ids are min-uid in both; compare the partitions directly
    agree = (merged.cluster_id_got == merged.cluster_id_exp).mean()
    assert agree >= 0.99, f"cluster agreement {agree}"

    acc = linker.evaluation.accuracy_analysis_from_labels_table(
        fixture_tables["labels"], threshold_match_probability=0.9
    )
    assert acc["f1"] >= 0.99, acc


def test_truth_space_and_errors(linker, fixture_tables):
    ts = linker.evaluation.truth_space_table_from_labels_table(fixture_tables["labels"])
    assert {"precision", "recall", "f1", "tp", "fp"} <= set(ts.columns)
    assert ts["f1"].max() >= 0.99
    errs = linker.evaluation.prediction_errors_from_labels_table(
        fixture_tables["labels"], threshold=0.9
    )
    assert set(errs.get("error_type", [])) <= {"FP", "FN"}


def test_compare_two_records(linker):
    r1 = {
        "text_concat_hash": "h1", "first_user_text": "hello world foo",
        "tool_set": ["a"], "n_turns": 4, "ts_min": np.datetime64("2025-01-01T12:00", "us"),
        "ts_day": "2025-01-01", "unique_id": "x",
    }
    r2 = dict(r1, unique_id="y")
    df = linker.inference.compare_two_records(r1, r2)
    assert df["match_probability"].iloc[0] > 0.99
    r3 = dict(
        r2,
        text_concat_hash="h2",
        first_user_text="totally different words here",
        n_turns=9,
        ts_min=np.datetime64("2025-03-05T09:00", "us"),
    )
    df2 = linker.inference.compare_two_records(r1, r3)
    assert df2["match_probability"].iloc[0] < 0.05


def test_unlinkables_and_charts(linker):
    preds = linker.last_predictions
    ul = linker.evaluation.unlinkables_table(preds)
    assert {"node", "best_weight", "cum_share"} <= set(ul.columns)
    mu = linker.visualisations.m_u_parameters_table()
    assert (mu["m_probability"] > 0).all()
    wf = linker.visualisations.waterfall_data(
        {c.gamma_column_name: 1 for c in linker.settings.comparisons}
    )
    assert abs(wf["log2_bayes_factor"].sum() - wf["cumulative_weight"].iloc[-1]) < 1e-9


def test_profile_and_completeness(linker):
    prof = linker.exploratory.profile_columns(["ts_day", "n_turns"])
    assert prof["ts_day"]["n_distinct"] >= 1
    assert 0 <= prof["ts_day"]["null_share"] <= 1
    comp = linker.exploratory.completeness_chart_data(["first_user_text", "tool_set"])
    assert (comp["completeness"] <= 1).all()


def test_find_matches_to_new_records(linker, fixture_tables):
    recs = canonicalize_bucket(fixture_tables["transcripts"])
    new = recs.slice(0, 1).set_column(
        recs.column_names.index("unique_id"),
        "unique_id",
        __import__("pyarrow").array(["zzz_new_record"]),
    )
    out = linker.inference.find_matches_to_new_records(
        new, threshold_match_probability=0.9
    ).to_pandas()
    assert len(out) >= 1
    touched = set(out["unique_id_l"]) | set(out["unique_id_r"])
    assert "zzz_new_record" in touched


def test_model_json_roundtrip(linker, tmp_path):
    p = str(tmp_path / "model.json")
    linker.misc_save_model_to_json(p)
    import json

    d = json.load(open(p))
    assert d["link_type"] == "dedupe_only"
    assert len(d["comparisons"]) == 5


def test_find_matches_pair_count_scales_with_new_blocks(ray_session):
    """The rewritten R1 generates pairs proportional to the NEW records'
    blocks, not the corpus self-join (round-1 verdict finding #4)."""
    import pyarrow as pa
    import ray.data as rd

    import splink_ray.comparison_level_library as cll
    from splink_ray.blocking_rule_library import block_on
    from splink_ray.pipelines.predict import find_matches_to_new_records
    from splink_ray.settings import Comparison, Settings

    n = 500
    # 50 blocks of 10; the corpus self-join would be 50*45=2250 pairs
    corpus = pa.table(
        {
            "unique_id": [f"u{i:04d}" for i in range(n)],
            "city": [f"c{i % 50}" for i in range(n)],
            "name": [f"name{i}" for i in range(n)],
        }
    )
    s = Settings(
        blocking_rules_to_generate_predictions=[block_on("city")],
        comparisons=[
            Comparison(
                "name",
                [
                    cll.NullLevel("name"),
                    cll.ExactMatchLevel("name", m_probability=0.9, u_probability=0.01),
                    cll.ElseLevel(m_probability=0.1, u_probability=0.99),
                ],
            )
        ],
    )
    new = pa.table(
        {"unique_id": ["new1"], "city": ["c7"], "name": ["name7"]}
    )
    out = find_matches_to_new_records(rd.from_arrow(corpus), new, s).to_pandas()
    # exactly the 10 corpus rows of block c7 — not the self-join
    assert len(out) == 10
    assert set(out["unique_id_l"]) == {"new1"}
    assert set(out["city_r"]) == {"c7"}
    # the exact-name row scores highest
    top = out.sort_values("match_probability", ascending=False).iloc[0]
    assert top["unique_id_r"] == "u0007"


def test_find_matches_cross_rule_exclusion(ray_session):
    import pyarrow as pa
    import ray.data as rd

    import splink_ray.comparison_level_library as cll
    from splink_ray.blocking_rule_library import block_on
    from splink_ray.pipelines.predict import find_matches_to_new_records
    from splink_ray.settings import Comparison, Settings

    corpus = pa.table(
        {
            "unique_id": ["a", "b", "c"],
            "city": ["x", "x", "y"],
            "pc": ["1", "2", "1"],
            "name": ["n1", "n2", "n3"],
        }
    )
    s = Settings(
        blocking_rules_to_generate_predictions=[block_on("city"), block_on("pc")],
        comparisons=[
            Comparison(
                "name",
                [
                    cll.NullLevel("name"),
                    cll.ExactMatchLevel("name", m_probability=0.9, u_probability=0.01),
                    cll.ElseLevel(m_probability=0.1, u_probability=0.99),
                ],
            )
        ],
    )
    new = pa.table({"unique_id": ["z"], "city": ["x"], "pc": ["1"], "name": ["n1"]})
    out = find_matches_to_new_records(rd.from_arrow(corpus), new, s).to_pandas()
    # a: city rule (match_key 0); b: city rule; c: pc rule only
    # a also matches pc but must appear ONCE with match_key 0
    assert len(out) == 3
    mk = dict(zip(out["unique_id_r"], out["match_key"]))
    assert mk == {"a": 0, "b": 0, "c": 1}


def test_comparison_viewer_and_parameter_history(linker):
    preds = linker.inference.predict()
    cv = linker.visualisations.comparison_viewer_data(preds)
    assert {"n", "mean_match_weight", "example"} <= set(cv.columns)
    assert cv["n"].sum() == preds.count()
    assert cv.iloc[0]["n"] >= cv.iloc[-1]["n"]  # sorted by pattern count
    assert "|" in cv.iloc[0]["example"]

    # EM session history feeds the parameter-estimate chart data
    import copy

    from splink_ray.blocking_rule_library import block_on
    from splink_ray.pipelines.training import (
        estimate_parameters_using_expectation_maximisation,
    )

    s = copy.deepcopy(linker.settings)
    estimate_parameters_using_expectation_maximisation(
        linker._records(), s, block_on("ts_day")
    )
    from splink_ray.pipelines.evaluation import parameter_estimate_comparisons

    hist = parameter_estimate_comparisons(s)
    assert len(hist) > 0
    assert set(hist.estimate_session) == {0}
