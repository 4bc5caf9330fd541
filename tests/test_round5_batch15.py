"""CUBE grouping sets, ROWS-frame moving window, grouped entropy, HITS."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from splink_ray.pipelines.clustering import hits_bipartite
from splink_ray.stages.stats import cube_aggregate, grouped_entropy, grouped_moving


def test_cube_matches_duckdb(ray_session):
    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], 3000),
            "b": rng.choice(["p", "q"], 3000),
            "v": rng.integers(0, 100, 3000),
        }
    )
    out = (
        cube_aggregate(rd.from_pandas(df).repartition(5), ["a", "b"], "v")
        .to_pandas()
        .sort_values(["grouping_id", "a", "b"], na_position="first")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT a, b, CAST(GROUPING(a, b) AS BIGINT) AS grouping_id, "
        "CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s "
        "FROM t GROUP BY CUBE(a, b) "
        "ORDER BY grouping_id, a NULLS FIRST, b NULLS FIRST"
    ).df().reset_index(drop=True)
    assert len(out) == len(want) == 3 * 2 + 3 + 2 + 1
    pd.testing.assert_frame_equal(
        out[["a", "b", "grouping_id", "n", "s"]], want
    )


def test_grouped_moving_matches_duckdb(ray_session):
    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 40, 2000),
            "o": np.arange(2000),  # unique order key
            "v": rng.integers(-50, 50, 2000),
        }
    )
    out = (
        grouped_moving(rd.from_pandas(df).repartition(6), "g", "o", "v", window=4)
        .to_pandas()
        .sort_values(["g", "o"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT g, o, v, CAST(SUM(v) OVER w AS BIGINT) AS mov_sum, "
        "AVG(v) OVER w AS mov_avg FROM t "
        "WINDOW w AS (PARTITION BY g ORDER BY o "
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) ORDER BY g, o"
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.astype({"g": np.int64, "o": np.int64, "v": np.int64}), want
    )


def test_grouped_moving_window_one_is_identity(ray_session):
    df = pd.DataFrame({"g": [1, 1, 2], "o": [1, 2, 1], "v": [5, 7, 9]})
    out = (
        grouped_moving(rd.from_pandas(df), "g", "o", "v", window=1)
        .to_pandas()
        .sort_values(["g", "o"])
    )
    assert out["mov_sum"].tolist() == [5, 7, 9]
    assert out["mov_avg"].tolist() == [5.0, 7.0, 9.0]


def test_grouped_entropy_closed_form(ray_session):
    # user A: 4 types uniform -> 2 bits; B: one type -> 0.0 (not -0.0);
    # C: p = (.5, .25, .25) -> 1.5 bits
    rows = (
        [("A", t) for t in "wxyz"] * 3
        + [("B", "w")] * 5
        + [("C", "w"), ("C", "w"), ("C", "x"), ("C", "y")]
    )
    df = pd.DataFrame(rows, columns=["u", "t"])
    out = (
        grouped_entropy(rd.from_pandas(df).repartition(3), "u", "t")
        .to_pandas()
        .set_index("u")["entropy"]
    )
    assert out["A"] == 2.0
    assert out["B"] == 0.0 and not np.signbit(out["B"])
    assert out["C"] == 1.5


def test_hits_matches_dense_power_iteration(ray_session):
    rng = np.random.default_rng(8)
    hubs = np.arange(60)
    edges = pd.DataFrame(
        {
            "u": rng.integers(0, 60, 400),
            "v": rng.choice(["a", "b", "c", "d", "e"], 400),
        }
    ).drop_duplicates()
    out = (
        hits_bipartite(
            rd.from_pandas(edges).repartition(4), "u", "v", iterations=3
        )
        .to_pandas()
        .set_index("u")["hub"]
    )
    # dense reference: same schedule (a <- A^T h, normalize; h <- A a, norm)
    us = sorted(edges["u"].unique())
    vs = sorted(edges["v"].unique())
    A = np.zeros((len(us), len(vs)))
    ui = {u: i for i, u in enumerate(us)}
    vi = {v: i for i, v in enumerate(vs)}
    for _, r in edges.iterrows():
        A[ui[r["u"]], vi[r["v"]]] = 1.0
    h = np.ones(len(us))
    for _ in range(3):
        a = A.T @ h
        a /= np.sqrt((a * a).sum())
        h = A @ a
        h /= np.sqrt((h * h).sum())
    for u in us:
        assert abs(out[u] - round(h[ui[u]], 6)) <= 1e-6, u
