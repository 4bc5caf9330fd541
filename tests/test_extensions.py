"""Exploding blocking rules (B5), custom levels / custom blocking keys
(§2.14), sources helpers (S1/S3), and the fused-vs-unfused predict parity."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import splink_ray.comparison_level_library as cll
from splink_ray import BlockingRule, KeyFunctionRule, Settings, block_on
from splink_ray.settings import Comparison
from splink_ray.stages.blocking import generate_pairs
import splink_ray.comparison_library as cl


@pytest.fixture(scope="module")
def array_records():
    rng = np.random.default_rng(9)
    rows = []
    tags = ["a", "b", "c", "d", "e", "f"]
    for i in range(120):
        k = int(rng.integers(1, 4))
        rows.append(
            {
                "unique_id": f"r{i:03d}",
                "tags": sorted(rng.choice(tags, k, replace=False).tolist()),
                "val": float(rng.normal()),
            }
        )
    return pa.Table.from_pylist(rows)


def test_exploding_blocking_rule_vs_sql(ray_session, array_records):
    """B5: block on array elements; pair set == SQL UNNEST self-join."""
    import ray.data as rd

    s = Settings(
        blocking_rules_to_generate_predictions=[
            BlockingRule(["tags"], array_columns_to_explode=["tags"])
        ],
        comparisons=[cl.AbsoluteDifferenceAtThresholds("val", (0.5,))],
    )
    pairs, _ = generate_pairs(
        rd.from_arrow(array_records), s, num_buckets=4,
        analyze_skew=False, collect_metrics=False,
    )
    got = pairs.to_pandas()
    con = duckdb.connect()
    con.register("r", array_records)
    exp = con.execute(
        "SELECT DISTINCT l.unique_id AS a, r2.unique_id AS b "
        "FROM (SELECT unique_id, unnest(tags) AS tag FROM r) l "
        "JOIN (SELECT unique_id, unnest(tags) AS tag FROM r) r2 "
        "ON l.tag = r2.tag AND l.unique_id < r2.unique_id"
    ).df()
    assert set(zip(got.unique_id_l, got.unique_id_r)) == set(zip(exp.a, exp.b))
    assert not got.duplicated(["unique_id_l", "unique_id_r"]).any()


def test_custom_key_function_rule(ray_session, array_records):
    """§2.14: custom blocking key = callable pa.Table -> pa.Array."""
    import ray.data as rd

    def first_tag(t: pa.Table) -> pa.Array:
        import pyarrow.compute as pc

        return pc.list_element(t["tags"], 0)

    s = Settings(
        blocking_rules_to_generate_predictions=[
            KeyFunctionRule(key_fn=first_tag, name="first_tag")
        ],
        comparisons=[cl.AbsoluteDifferenceAtThresholds("val", (0.5,))],
    )
    pairs, _ = generate_pairs(
        rd.from_arrow(array_records), s, num_buckets=4,
        analyze_skew=False, collect_metrics=False,
    )
    got = pairs.to_pandas()
    df = array_records.to_pandas()
    df["k"] = df.tags.str[0]
    exp = set()
    for _, g in df.groupby("k"):
        ids = sorted(g.unique_id)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                exp.add((ids[i], ids[j]))
    assert set(zip(got.unique_id_l, got.unique_id_r)) == exp


def test_custom_comparison_level(ray_session, array_records):
    """§2.14: custom level = python predicate over the pair batch."""

    def same_tag_count(pairs: pa.Table) -> np.ndarray:
        import pyarrow.compute as pc

        nl = pc.list_value_length(pairs["tags_l"]).to_numpy(zero_copy_only=False)
        nr = pc.list_value_length(pairs["tags_r"]).to_numpy(zero_copy_only=False)
        return nl == nr

    comp = Comparison(
        "tags",
        [
            cll.NullLevel("tags"),
            cll.CustomLevel(
                predicate=same_tag_count,
                sql_condition="len(tags_l) = len(tags_r)",
                used_columns=("tags",),
                label="same tag count",
            ),
            cll.ElseLevel(),
        ],
    )
    pairs = pa.table(
        {
            "tags_l": [["a"], ["a", "b"], None],
            "tags_r": [["c"], ["d"], ["e"]],
        }
    )
    from splink_ray.settings import make_eval_context

    g = comp.compute_gamma(pairs, make_eval_context(Settings()))
    assert list(g) == [1, 0, -1]  # ["a","b"] vs ["d"]: lengths differ → else
    assert "len(tags_l) = len(tags_r)" in comp.gamma_case_sql()


def test_fused_equals_unfused_predict(ray_session):
    """The fused pairgen+score fast path must emit exactly the two-stage
    path's rows (same ids, gammas, weights)."""
    import ray.data as rd

    from splink_ray.datasets import generate_transcripts
    from splink_ray.pipelines.flagship import transcript_settings
    from splink_ray.pipelines.predict import predict
    from splink_ray.stages.canonicalize import canonicalize_bucket

    recs = rd.from_arrow(
        canonicalize_bucket(generate_transcripts(60, seed=31)["transcripts"])
    ).materialize()
    s1 = transcript_settings()
    fused, _ = predict(recs, s1, materialize_records=False)
    s2 = transcript_settings()
    s2.retain_matching_columns = True  # forces the two-stage path
    unfused, _ = predict(recs, s2, materialize_records=False)
    a = fused.to_pandas().sort_values(["unique_id_l", "unique_id_r"]).reset_index(drop=True)
    b = unfused.to_pandas().sort_values(["unique_id_l", "unique_id_r"]).reset_index(drop=True)
    cols = [c for c in a.columns if c in b.columns]
    pd.testing.assert_frame_equal(a[cols], b[cols])


def test_sources_roundtrip(ray_session, tmp_path, array_records):
    from splink_ray.sources import as_record_dicts, read_table, write_table

    ds = read_table(array_records)
    p = str(tmp_path / "out")
    write_table(ds, p)
    back = read_table(p)
    assert back.count() == array_records.num_rows
    recs = as_record_dicts(back, limit=3)
    assert len(recs) == 3 and "unique_id" in recs[0]

    csv_path = str(tmp_path / "t.csv")
    pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}).to_csv(csv_path, index=False)
    assert read_table(csv_path).count() == 2


def test_static_salting_partitions(ray_session, array_records):
    """B4 static hint: rule.salting_partitions salts EVERY key of the rule;
    output pair set must be unchanged."""
    import ray.data as rd
    from splink_ray import block_on

    base = Settings(
        blocking_rules_to_generate_predictions=[block_on("val")],  # unique-ish
        comparisons=[cl.AbsoluteDifferenceAtThresholds("val", (0.5,))],
    )
    # block on a 3-way key for real groups
    import pyarrow.compute as pc

    def first_tag(t):
        return pc.list_element(t["tags"], 0)

    base.blocking_rules_to_generate_predictions = [
        KeyFunctionRule(key_fn=first_tag, name="ft")
    ]
    salted = Settings(
        blocking_rules_to_generate_predictions=[
            KeyFunctionRule(key_fn=first_tag, name="ft", salting_partitions=3)
        ],
        comparisons=[cl.AbsoluteDifferenceAtThresholds("val", (0.5,))],
    )
    ds = rd.from_arrow(array_records)
    p0 = generate_pairs(ds, base, num_buckets=4, analyze_skew=False, collect_metrics=False)[0].to_pandas()
    p1 = generate_pairs(ds, salted, num_buckets=4, analyze_skew=False, collect_metrics=False)[0].to_pandas()
    assert set(zip(p0.unique_id_l, p0.unique_id_r)) == set(zip(p1.unique_id_l, p1.unique_id_r))
    assert not p1.duplicated(["unique_id_l", "unique_id_r"]).any()


def test_link_only_and_link_and_dedupe(ray_session):
    """Multi-source link jobs: link_only keeps only cross-source pairs;
    link_and_dedupe keeps both (splink link_type semantics)."""
    import ray.data as rd
    from splink_ray import Linker

    a = pa.table({"unique_id": ["a1", "a2", "a3"], "city": ["x", "x", "y"]})
    b = pa.table({"unique_id": ["b1", "b2"], "city": ["x", "y"]})

    def run(link_type):
        s = Settings(
            link_type=link_type,
            blocking_rules_to_generate_predictions=[block_on("city")],
            comparisons=[cl.ExactMatch("city")],
        )
        for lv in s.comparisons[0].non_null_levels():
            lv.m_probability, lv.u_probability = 0.9, 0.1
        linker = Linker({"A": a, "B": b}, s)
        return linker.inference.predict().to_pandas()

    lo = run("link_only")
    pairs_lo = set(zip(lo.unique_id_l, lo.unique_id_r))
    # city x block: a1,a2,b1 → cross-source only: (a1,b1),(a2,b1)
    assert pairs_lo == {("a1", "b1"), ("a2", "b1"), ("a3", "b2")}

    ld = run("link_and_dedupe")
    pairs_ld = set(zip(ld.unique_id_l, ld.unique_id_r))
    assert pairs_ld == {("a1", "a2"), ("a1", "b1"), ("a2", "b1"), ("a3", "b2")}


def test_cumulative_comparisons_data(ray_session, array_records):
    """B7 cumulative chart data: per-rule post-exclusion counts sum to the
    distinct pair total."""
    import ray.data as rd
    import pyarrow.compute as pc
    from splink_ray.stages.blocking import cumulative_comparisons_data

    def first_tag(t):
        return pc.list_element(t["tags"], 0)

    s = Settings(
        blocking_rules_to_generate_predictions=[
            KeyFunctionRule(key_fn=first_tag, name="ft"),
            BlockingRule(["val"]),
        ],
        comparisons=[cl.AbsoluteDifferenceAtThresholds("val", (0.5,))],
    )
    df = cumulative_comparisons_data(rd.from_arrow(array_records), s, num_buckets=4)
    assert list(df.rule) == [0, 1]
    assert df.cumulative.iloc[-1] == df.n_pairs.sum()
    assert df.n_pairs.iloc[0] > 0
