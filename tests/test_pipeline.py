"""End-to-end Ray pipeline tests: canonicalize → blocking → scoring
(SURVEY.md §5.2.5/§5.2.6 with a DuckDB pair-count oracle)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from splink_ray import Settings, block_on, col
from splink_ray.datasets import generate_transcripts
from splink_ray.pipelines.flagship import transcript_settings
from splink_ray.pipelines.predict import predict
from splink_ray.stages.canonicalize import canonicalize, canonicalize_bucket
from splink_ray.stages.blocking import (
    count_comparisons_from_blocking_rule,
    derive_block_keys,
    generate_pairs,
)
import splink_ray.comparison_library as cl


@pytest.fixture(scope="module")
def fixture_tables():
    return generate_transcripts(n_entities=120, seed=42)


@pytest.fixture(scope="module")
def entity_records(fixture_tables):
    """Canonicalize via the pure bucket function (no Ray) — ground truth."""
    return canonicalize_bucket(fixture_tables["transcripts"])


def test_generator_deterministic(fixture_tables):
    again = generate_transcripts(n_entities=120, seed=42)
    assert again["transcripts"].equals(fixture_tables["transcripts"])
    other = generate_transcripts(n_entities=120, seed=43)
    assert not other["transcripts"].equals(fixture_tables["transcripts"])


def test_canonicalize_pure(entity_records, fixture_tables):
    t = fixture_tables["transcripts"]
    recs = entity_records
    assert recs.num_rows == len(set(t["conv_id"].to_pylist()))
    df = recs.to_pandas().set_index("unique_id")
    # spot-check one conversation against a pandas groupby
    pdf = t.to_pandas()
    g = pdf[pdf.conv_id == pdf.conv_id.iloc[0]].sort_values("turn_idx")
    row = df.loc[g.conv_id.iloc[0]]
    assert row["n_turns"] == len(g)
    assert list(row["turn_texts"]) == list(g.text)
    assert row["first_user_text"] == g[g.role == "user"].text.iloc[0]
    assert row["ts_min"] == g.ts.min()
    # unperturbed copies share the text hash
    c0, c1 = "c0000000-0", "c0000000-1"
    if c1 in df.index:
        same = df.loc[c0, "turn_texts"] == df.loc[c1, "turn_texts"]


def test_canonicalize_ray_matches_pure(ray_session, fixture_tables, entity_records):
    import ray.data as rd

    ds = rd.from_arrow(fixture_tables["transcripts"]).repartition(8)
    out = canonicalize(ds, num_buckets=5).to_pandas().sort_values("unique_id").reset_index(drop=True)
    exp = entity_records.to_pandas().sort_values("unique_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[sorted(out.columns)], exp[sorted(exp.columns)], check_like=True
    )


def _pair_count_oracle(records: pa.Table, key_sql: str) -> int:
    con = duckdb.connect()
    con.register("r", records)
    return con.execute(
        f"SELECT count(*) FROM r l JOIN r r2 ON {key_sql} "
        "AND l.unique_id < r2.unique_id"
    ).fetchone()[0]


def test_pairgen_matches_sql_selfjoin(ray_session, entity_records):
    """Pair generation == DuckDB self-join on the same key (B2 oracle)."""
    import ray.data as rd

    s = Settings(
        blocking_rules_to_generate_predictions=[block_on("ts_day")],
        comparisons=[cl.ExactMatch("text_concat_hash")],
    )
    ds = rd.from_arrow(entity_records).repartition(4)
    pairs, metrics = generate_pairs(ds, s, num_buckets=4)
    got = pairs.to_pandas()
    exp_n = _pair_count_oracle(entity_records, "l.ts_day = r2.ts_day")
    assert len(got) == exp_n
    assert (got["unique_id_l"] < got["unique_id_r"]).all()
    assert not got.duplicated(["unique_id_l", "unique_id_r"]).any()
    assert metrics["rules"][0]["total_pairs_pre_exclusion"] == exp_n


def test_multi_rule_match_key_exclusion(ray_session, entity_records):
    """B3: rule i excludes pairs already produced by rules < i; union of all
    rules == SQL OR-join distinct pairs."""
    import ray.data as rd

    s = Settings(
        blocking_rules_to_generate_predictions=[
            block_on("ts_day"),
            block_on("n_turns"),
        ],
        comparisons=[cl.ExactMatch("text_concat_hash")],
    )
    ds = rd.from_arrow(entity_records).repartition(4)
    pairs, _ = generate_pairs(ds, s, num_buckets=4)
    got = pairs.to_pandas()
    assert not got.duplicated(["unique_id_l", "unique_id_r"]).any()
    con = duckdb.connect()
    con.register("r", entity_records)
    exp_n = con.execute(
        "SELECT count(*) FROM r l JOIN r r2 ON "
        "(l.ts_day = r2.ts_day OR l.n_turns = r2.n_turns) AND l.unique_id < r2.unique_id"
    ).fetchone()[0]
    assert len(got) == exp_n
    # match_key 1 pairs must NOT share ts_day
    mk1 = got[got.match_key == 1]
    exp_mk1 = con.execute(
        "SELECT count(*) FROM r l JOIN r r2 ON l.n_turns = r2.n_turns "
        "AND NOT (l.ts_day = r2.ts_day) AND l.unique_id < r2.unique_id"
    ).fetchone()[0]
    assert len(mk1) == exp_mk1


def test_salting_preserves_pair_set(ray_session, entity_records):
    """B4 property test: salted pairgen emits exactly the unsalted pair set."""
    import ray.data as rd

    base = Settings(
        blocking_rules_to_generate_predictions=[block_on("ts_day")],
        comparisons=[cl.ExactMatch("text_concat_hash")],
        hot_key_threshold=10**9,
    )
    salted = Settings(
        blocking_rules_to_generate_predictions=[block_on("ts_day")],
        comparisons=[cl.ExactMatch("text_concat_hash")],
        hot_key_threshold=5,  # every day-block is "hot"
        target_rows_per_salted_block=4,
    )
    ds = rd.from_arrow(entity_records).repartition(4)
    p0 = generate_pairs(ds, base, num_buckets=4)[0].to_pandas()
    p1 = generate_pairs(ds, salted, num_buckets=4)[0].to_pandas()
    k0 = set(zip(p0.unique_id_l, p0.unique_id_r))
    k1 = set(zip(p1.unique_id_l, p1.unique_id_r))
    assert k0 == k1
    assert len(p1) == len(k1)  # no dupes


def test_capping_and_overflow_metrics(ray_session, entity_records):
    import ray.data as rd

    s = Settings(
        blocking_rules_to_generate_predictions=[block_on("ts_day")],
        comparisons=[cl.ExactMatch("text_concat_hash")],
        max_pairs_per_block=10,
        hot_key_threshold=10**9,
    )
    ds = rd.from_arrow(entity_records).repartition(4)
    pairs, metrics = generate_pairs(ds, s, num_buckets=4)
    got = pairs.to_pandas()
    total = metrics["rules"][0]["total_pairs_pre_exclusion"]
    over = metrics["rules"][0]["overflow_pairs_capped"]
    assert len(got) == total - over
    assert over > 0  # fixture has day-blocks larger than 5 records


def test_count_comparisons(ray_session, entity_records):
    import ray.data as rd

    s = Settings(blocking_rules_to_generate_predictions=[block_on("ts_day")])
    ds = derive_block_keys(rd.from_arrow(entity_records), s.blocking_rules_to_generate_predictions)
    n = count_comparisons_from_blocking_rule(ds, 0)
    assert n == _pair_count_oracle(entity_records, "l.ts_day = r2.ts_day")


def test_predict_end_to_end_f1(ray_session, fixture_tables):
    """Golden E2E: flagship settings recover planted clusters at F1 ≥ 0.99
    on the labeled pairs (A5 driver gate, SURVEY.md §2.10)."""
    import ray.data as rd

    ds = rd.from_arrow(fixture_tables["transcripts"]).repartition(8)
    records = canonicalize(ds, num_buckets=5)
    s = transcript_settings()
    scored, metrics = predict(records, s, num_buckets=4)
    df = scored.to_pandas()
    labels = fixture_tables["labels"].to_pandas()
    merged = labels.merge(
        df[["unique_id_l", "unique_id_r", "match_probability"]],
        on=["unique_id_l", "unique_id_r"],
        how="left",
    )
    merged["match_probability"] = merged["match_probability"].fillna(0.0)
    pred = merged["match_probability"] >= 0.9
    truth = merged["clerical_match_score"] >= 0.5
    tp = int((pred & truth).sum())
    fp = int((pred & ~truth).sum())
    fn = int((~pred & truth).sum())
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f"F1={f1} (tp={tp} fp={fp} fn={fn})"


def test_conversation_stats_and_repetition(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from splink_ray.stages.canonicalize import conversation_stats, turn_repetition

    base = np.datetime64("2025-01-01T00:00:00", "us")
    t = pa.table(
        {
            "conv_id": pa.array(["c1", "c1", "c1", "c2"], pa.string()),
            "turn_idx": pa.array([0, 1, 2, 0], pa.int32()),
            "role": pa.array(["user", "assistant", "user", "user"], pa.string()),
            "text": pa.array(["a b c", "a b d", "x", "hello"], pa.string()),
            "tool": pa.array([""] * 4, pa.string()),
            "ts": pa.array([base] * 4, pa.timestamp("us")),
        }
    )
    ds = rd.from_arrow(t)
    st = conversation_stats(ds).to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert list(st["n_turns"]) == [3, 1]
    assert list(st["n_user_turns"]) == [2, 1]
    assert list(st["total_chars"]) == [11, 5]
    assert abs(st["avg_turn_chars"][0] - round(11 / 3, 6)) < 1e-9

    rep = turn_repetition(ds).to_pandas().sort_values("conv_id").reset_index(drop=True)
    # c1: jac(t0,t1) = |{a,b}| / |{a,b,c,d}| = 0.5 ; jac(t1,t2) = 0
    assert list(rep["n_pairs"]) == [2, 0]
    assert abs(rep["mean_jaccard"][0] - 0.25) < 1e-9
    assert rep["mean_jaccard"][1] == 0.0


def test_last_k_turns_tail_extraction(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from splink_ray.stages.canonicalize import last_k_turns

    base = np.datetime64("2025-01-01T00:00:00", "us")
    t = pa.table(
        {
            "conv_id": pa.array(["c1"] * 5 + ["c2"], pa.string()),
            "turn_idx": pa.array([0, 1, 2, 3, 4, 0], pa.int32()),
            "role": pa.array(["user", "assistant"] * 3, pa.string()),
            "text": pa.array(["t0", "t1", "t2", "t3", "t4", "solo"], pa.string()),
            "tool": pa.array([""] * 6, pa.string()),
            "ts": pa.array([base] * 6, pa.timestamp("us")),
        }
    )
    out = (
        last_k_turns(rd.from_arrow(t).repartition(3), k=3, sep="|", num_buckets=4)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert list(out["context_text"]) == ["t2|t3|t4", "solo"]
    assert list(out["n_context_turns"]) == [3, 1]
