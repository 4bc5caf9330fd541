"""Comparison-level cascade + Fellegi-Sunter math with closed-form oracles
(SURVEY.md §5.2.2, mirroring splink's hand-computed tests)."""

import numpy as np
import pyarrow as pa
import pytest

import splink_ray.comparison_level_library as cll
import splink_ray.comparison_library as cl
from splink_ray import Settings, col
from splink_ray.model import score_gamma_table
from splink_ray.settings import Comparison, make_eval_context


def pair_table(**cols):
    return pa.table(cols)


@pytest.fixture(params=[True, False], ids=["duckdb", "numpy"])
def ctx(request):
    return cll.EvalContext(use_duckdb=request.param)


def test_gamma_cascade_first_true_wins(ctx):
    comp = Comparison(
        "name",
        [
            cll.NullLevel("name"),
            cll.ExactMatchLevel("name"),
            cll.JaroWinklerLevel("name", 0.9),
            cll.LevenshteinLevel("name", 2),
            cll.ElseLevel(),
        ],
    )
    # gamma numbering: exact=3, jw=2, lev=1, else=0, null=-1
    pairs = pair_table(
        name_l=["ann", "martha", "abcdef", "zzz", None],
        name_r=["ann", "marhta", "abcdxy", "qqq", "x"],
    )
    g = comp.compute_gamma(pairs, ctx)
    assert list(g) == [3, 2, 1, 0, -1]


def test_gamma_with_expression_transform(ctx):
    comp = Comparison(
        "city",
        [
            cll.NullLevel("city"),
            cll.ExactMatchLevel(col("city").lower()),
            cll.ElseLevel(),
        ],
    )
    pairs = pair_table(city_l=["London", "Paris"], city_r=["LONDON", "Rome"])
    assert list(comp.compute_gamma(pairs, ctx)) == [1, 0]


def test_array_and_numeric_levels(ctx):
    comp = Comparison(
        "tools",
        [
            cll.NullLevel("tools"),
            cll.ArrayIntersectLevel("tools", 2),
            cll.ArrayIntersectLevel("tools", 1),
            cll.ElseLevel(),
        ],
    )
    pairs = pair_table(
        tools_l=[["a", "b"], ["a", "b"], ["a"], None],
        tools_r=[["a", "b", "c"], ["b"], ["z"], ["a"]],
    )
    assert list(comp.compute_gamma(pairs, ctx)) == [2, 1, 0, -1]

    comp2 = Comparison(
        "n",
        [cll.NullLevel("n"), cll.AbsoluteDifferenceLevel("n", 1.5), cll.ElseLevel()],
    )
    pairs2 = pair_table(n_l=[1.0, 1.0, None], n_r=[2.0, 5.0, 1.0])
    assert list(comp2.compute_gamma(pairs2, ctx)) == [1, 0, -1]


def test_time_difference_level(ctx):
    comp = Comparison(
        "ts",
        [
            cll.NullLevel("ts"),
            cll.ExactMatchLevel("ts"),
            cll.AbsoluteTimeDifferenceLevel("ts", 1, "hour"),
            cll.ElseLevel(),
        ],
    )
    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    pairs = pair_table(
        ts_l=pa.array([t0, t0, t0]),
        ts_r=pa.array(
            [t0, t0 + np.timedelta64(30, "m"), t0 + np.timedelta64(3, "h")]
        ),
    )
    assert list(comp.compute_gamma(pairs, ctx)) == [2, 1, 0]


def test_columns_reversed_and_composition(ctx):
    comp = Comparison(
        "fn_sn",
        [
            cll.Or(cll.NullLevel("fn"), cll.NullLevel("sn")),
            cll.And(cll.ExactMatchLevel("fn"), cll.ExactMatchLevel("sn")),
            cll.ColumnsReversedLevel("fn", "sn"),
            cll.ElseLevel(),
        ],
    )
    pairs = pair_table(
        fn_l=["john", "john", "john", None],
        sn_l=["smith", "smith", "smith", "x"],
        fn_r=["john", "smith", "ann", "y"],
        sn_r=["smith", "john", "lee", "z"],
    )
    assert list(comp.compute_gamma(pairs, ctx)) == [2, 1, 0, -1]


def test_fs_scoring_closed_form():
    """Two comparisons with known m/u; hand-computed match weights."""
    c1 = Comparison(
        "a",
        [
            cll.NullLevel("a"),
            cll.ExactMatchLevel("a", m_probability=0.9, u_probability=0.01),
            cll.ElseLevel(m_probability=0.1, u_probability=0.99),
        ],
    )
    c2 = Comparison(
        "b",
        [
            cll.NullLevel("b"),
            cll.ExactMatchLevel("b", m_probability=0.8, u_probability=0.05),
            cll.ElseLevel(m_probability=0.2, u_probability=0.95),
        ],
    )
    s = Settings(probability_two_random_records_match=0.01, comparisons=[c1, c2])
    gammas = {
        "gamma_a": np.array([1, 1, 0, -1]),
        "gamma_b": np.array([1, 0, 1, -1]),
    }
    out = score_gamma_table(s, gammas)
    prior = np.log2(0.01 / 0.99)
    exp = np.array(
        [
            prior + np.log2(0.9 / 0.01) + np.log2(0.8 / 0.05),
            prior + np.log2(0.9 / 0.01) + np.log2(0.2 / 0.95),
            prior + np.log2(0.1 / 0.99) + np.log2(0.8 / 0.05),
            prior,  # both null → BF 1
        ]
    )
    np.testing.assert_allclose(out["match_weight"], exp, rtol=1e-12)
    np.testing.assert_allclose(
        out["match_probability"], 2.0**exp / (1 + 2.0**exp), rtol=1e-12
    )


def test_tf_adjustment_formula():
    """TF adjustment: u_tf = max(tf_l, tf_r) clamped; BF ← BF·(BF_tf/BF)^w."""
    lvl = cll.ExactMatchLevel(
        "a",
        m_probability=0.9,
        u_probability=0.01,
        tf_adjustment_column="a",
        tf_adjustment_weight=1.0,
        tf_minimum_u_value=0.001,
    )
    c1 = Comparison(
        "a", [cll.NullLevel("a"), lvl, cll.ElseLevel(m_probability=0.1, u_probability=0.99)]
    )
    s = Settings(probability_two_random_records_match=0.5, comparisons=[c1])
    gammas = {"gamma_a": np.array([1, 1, 1, 0])}
    tf_l = np.array([0.05, 0.0005, np.nan, 0.3])
    tf_r = np.array([0.02, 0.0004, np.nan, 0.3])
    out = score_gamma_table(s, gammas, {"a": (tf_l, tf_r)})
    prior = 0.0  # log2(1)
    bf_exact = np.log2(0.9 / 0.01)
    exp = np.array(
        [
            prior + np.log2(0.9 / 0.05),        # tf 0.05 replaces u
            prior + np.log2(0.9 / 0.001),       # clamped at tf_minimum_u_value
            prior + bf_exact,                    # no tf → generic u
            prior + np.log2(0.1 / 0.99),        # else level: no adjustment
        ]
    )
    np.testing.assert_allclose(out["match_weight"], exp, rtol=1e-12)


def test_comparison_library_bundles_build():
    bundles = [
        cl.ExactMatch("x", term_frequency_adjustments=True),
        cl.LevenshteinAtThresholds("x", (1, 2)),
        cl.DamerauLevenshteinAtThresholds("x"),
        cl.JaroAtThresholds("x"),
        cl.JaroWinklerAtThresholds("x"),
        cl.JaccardAtThresholds("x"),
        cl.AbsoluteTimeDifferenceAtThresholds("ts"),
        cl.ArrayIntersectAtSizes("arr", (2, 1)),
        cl.DistanceInKMAtThresholds("lat", "lng", (5,)),
        cl.NameComparison("nm"),
        cl.ForenameSurnameComparison("fn", "sn"),
        cl.DateOfBirthComparison("dob"),
        cl.PostcodeComparison("pc"),
        cl.EmailComparison("em"),
        cl.CosineSimilarityAtThresholds("emb", (0.9,)),
        cl.AbsoluteDifferenceAtThresholds("num"),
    ]
    for b in bundles:
        assert b.num_levels >= 2
        vals = [lv.comparison_vector_value for lv in b.non_null_levels()]
        assert sorted(vals, reverse=True) == vals
        assert vals[-1] == 0  # else level


def test_settings_roundtrip_and_hash():
    from splink_ray import block_on

    s = Settings(
        blocking_rules_to_generate_predictions=[block_on("a"), block_on("a", "b")],
        comparisons=[cl.ExactMatch("a"), cl.NameComparison("b")],
    )
    h1 = s.config_hash()
    assert s.to_dict()["comparisons"][0]["output_column_name"] == "a"
    s.probability_two_random_records_match = 0.3
    assert s.config_hash() != h1
    assert s.columns_needed() == {"unique_id", "a", "b"}


def test_gamma_case_sql_matches_python(ctx):
    """The auto-generated CASE WHEN SQL must agree with compute_gamma."""
    import duckdb

    comp = Comparison(
        "name",
        [
            cll.NullLevel("name"),
            cll.ExactMatchLevel("name"),
            cll.JaroWinklerLevel("name", 0.9),
            cll.LevenshteinLevel("name", 2),
            cll.ElseLevel(),
        ],
    )
    pairs = pair_table(
        name_l=["ann", "martha", "abcdef", "zzz", None, "kitten"],
        name_r=["ann", "marhta", "abcdxy", "qqq", "x", "sitting"],
    )
    g = comp.compute_gamma(pairs, ctx)
    con = duckdb.connect()
    con.register("pairs", pairs)
    sql_g = con.execute(
        f"SELECT {comp.gamma_case_sql()} AS g FROM pairs"
    ).fetchnumpy()["g"]
    np.testing.assert_array_equal(g, sql_g)
