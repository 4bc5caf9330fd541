"""OHLC downsampling, binned histogram, grouped NTILE, IQR outliers."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from splink_ray.stages.events import ohlc_downsample
from splink_ray.stages.stats import binned_histogram, grouped_ntile, iqr_outliers


def test_ohlc_matches_duckdb(ray_session):
    rng = np.random.default_rng(21)
    n = 3000
    df = pd.DataFrame(
        {
            "id": np.arange(n),
            "ts": pd.to_datetime("2025-01-01")
            + pd.to_timedelta(rng.integers(0, 86400 * 3, n), unit="s"),
            "u": rng.integers(0, 50, n),
            "v": rng.normal(0, 10, n).round(4),
        }
    )
    out = (
        ohlc_downsample(
            rd.from_pandas(df).repartition(5), "u", "ts", "id", "v", 30.0
        )
        .to_pandas()
        .sort_values(["u", "window_start"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    w_us = 30 * 60 * 1_000_000
    want = con.execute(
        f"WITH e AS (SELECT u, make_timestamp((epoch_us(ts) // {w_us}) * "
        f"{w_us}) AS window_start, ts, id, v FROM t) "
        "SELECT DISTINCT u, window_start, first_value(v) OVER w AS open, "
        "max(v) OVER w AS high, min(v) OVER w AS low, "
        "last_value(v) OVER w AS close, CAST(count(*) OVER w AS BIGINT) AS n "
        "FROM e WINDOW w AS (PARTITION BY u, window_start ORDER BY ts, id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
        "ORDER BY u, window_start"
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(out.astype({"u": np.int64}), want)


def test_binned_histogram_matches_duckdb(ray_session):
    rng = np.random.default_rng(22)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], 4000),
            "v": rng.normal(0, 3, 4000),  # negative values exercise floor
        }
    )
    out = (
        binned_histogram(rd.from_pandas(df).repartition(4), "v", 0.25, "g")
        .to_pandas()
        .sort_values(["g", "bin"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT g, CAST(floor(v / 0.25) AS BIGINT) AS bin, "
        "CAST(floor(v / 0.25) AS BIGINT) * 0.25 AS bin_lo, "
        "CAST(count(*) AS BIGINT) AS n FROM t GROUP BY g, floor(v / 0.25) "
        "ORDER BY g, bin"
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(out[["g", "bin", "bin_lo", "n"]], want)


def test_grouped_ntile_matches_duckdb(ray_session):
    rng = np.random.default_rng(23)
    # group sizes deliberately not divisible by n (quota edge)
    df = pd.DataFrame(
        {"g": rng.integers(0, 30, 1700), "o": np.arange(1700)}
    )
    for n in (1, 3, 7):
        out = (
            grouped_ntile(rd.from_pandas(df).repartition(4), "g", "o", n)
            .to_pandas()
            .sort_values(["g", "o"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        want = con.execute(
            f"SELECT g, o, CAST(NTILE({n}) OVER (PARTITION BY g ORDER BY o) "
            "AS BIGINT) AS tile FROM t ORDER BY g, o"
        ).df().reset_index(drop=True)
        pd.testing.assert_frame_equal(
            out.astype({"g": np.int64, "o": np.int64}), want
        )


def test_iqr_outliers_matches_duckdb(ray_session):
    rng = np.random.default_rng(24)
    df = pd.DataFrame(
        {
            "id": np.arange(2500),
            "g": rng.choice(["x", "y", "z"], 2500),
            "v": np.concatenate(
                [rng.integers(40, 60, 2400), rng.integers(-500, 500, 100)]
            ),
        }
    )
    out = (
        iqr_outliers(rd.from_pandas(df).repartition(4), "g", "v")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "WITH q AS (SELECT g, quantile_disc(v, 0.25) AS q1, "
        "quantile_disc(v, 0.75) AS q3 FROM t GROUP BY g) "
        "SELECT t.id, t.g, t.v FROM t JOIN q USING (g) "
        "WHERE t.v < q.q1 - 1.5 * (q.q3 - q.q1) "
        "OR t.v > q.q3 + 1.5 * (q.q3 - q.q1) ORDER BY id"
    ).df().reset_index(drop=True)
    assert len(out) > 0
    pd.testing.assert_frame_equal(
        out[["id", "g", "v"]].astype({"id": np.int64, "v": np.int64}), want
    )


def test_categorical_association_matches_scipy_formula(ray_session):
    from splink_ray.stages.stats import categorical_association

    rng = np.random.default_rng(41)
    # dependent columns -> nonzero chi2
    a = rng.choice(["x", "y", "z"], 5000)
    b = np.where(
        (a == "x") & (rng.random(5000) < 0.7), "p",
        rng.choice(["p", "q"], 5000),
    )
    df = pd.DataFrame({"a": a, "b": b})
    out = categorical_association(
        rd.from_pandas(df).repartition(6), "a", "b"
    ).to_pandas()
    # dense reference over the full contingency grid
    ct = pd.crosstab(df["a"], df["b"]).to_numpy().astype(float)
    n = ct.sum()
    e = np.outer(ct.sum(1), ct.sum(0)) / n
    chi2 = ((ct - e) ** 2 / e).sum()
    assert abs(out.loc[0, "chi2"] - chi2) < 1e-5
    assert out.loc[0, "dof"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    v = np.sqrt(chi2 / (n * (min(ct.shape) - 1)))
    assert abs(out.loc[0, "cramers_v"] - v) < 1e-6
    assert out.loc[0, "n"] == 5000


def test_grouped_weighted_mean_exact(ray_session):
    from splink_ray.stages.stats import grouped_weighted_mean

    df = pd.DataFrame(
        {"g": ["a", "a", "b", "b", "b"], "v": [1, 3, 10, 0, 5], "w": [2, 2, 1, 3, 0]}
    )
    out = (
        grouped_weighted_mean(rd.from_pandas(df).repartition(2), "g", "v", "w")
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    assert out.loc["a", "wmean"] == 2.0  # (1*2+3*2)/4
    assert out.loc["b", "wmean"] == 2.5  # (10*1+0*3+5*0)/4
    assert out["n"].tolist() == [2, 3]
