"""Sketch-prefiltered exact operators: Bloom semi/anti join, Count-Min
heavy hitters, distributed 2D skyline. Every test compares against a
brute-force / DuckDB-computed exact answer — the sketches are prefilters
only and must never change the result."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from splink_ray.stages.sketches import (
    _skyline2d_table,
    bloom_contains,
    bloom_semi_join,
    build_bloom,
    cms_heavy_hitters,
    skyline2d,
)


def _left_right(seed=7, n_left=5000, n_right=400):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 2000, n_left),
            "payload": rng.integers(0, 10, n_left),
        }
    )
    right = pd.DataFrame({"rk": rng.choice(2000, n_right, replace=False)})
    return left, right


def test_bloom_no_false_negatives(ray_session):
    left, right = _left_right()
    bm = build_bloom(rd.from_pandas(right), "rk", num_bits=1 << 12)
    members = pa.array(right["rk"].to_numpy())
    assert bloom_contains(bm, members).all()


@pytest.mark.parametrize("num_bits", [1 << 9, 1 << 16])  # tiny bloom = high fpr
def test_bloom_semi_join_exact(ray_session, num_bits):
    left, right = _left_right()
    out = (
        bloom_semi_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            on="k",
            right_on="rk",
            num_bits=num_bits,
        )
        .to_pandas()
        .sort_values(["k", "payload"])
        .reset_index(drop=True)
    )
    want = (
        left[left["k"].isin(set(right["rk"]))]
        .sort_values(["k", "payload"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["k", "payload"]], want)


@pytest.mark.parametrize("num_bits", [1 << 9, 1 << 16])
def test_bloom_anti_join_exact(ray_session, num_bits):
    left, right = _left_right(seed=11)
    out = (
        bloom_semi_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            on="k",
            right_on="rk",
            how="left_anti",
            num_bits=num_bits,
        )
        .to_pandas()
        .sort_values(["k", "payload"])
        .reset_index(drop=True)
    )
    want = (
        left[~left["k"].isin(set(right["rk"]))]
        .sort_values(["k", "payload"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["k", "payload"]], want)


def test_bloom_anti_null_left_keys_survive(ray_session):
    left = pd.DataFrame({"k": pd.array([1, None, 3, None], dtype="Int64")})
    right = pd.DataFrame({"rk": [1, 2]})
    out = bloom_semi_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", right_on="rk", how="left_anti", num_bits=1 << 9,
    ).to_pandas()
    # SQL NOT EXISTS: null never equals anything -> null rows survive
    assert sorted(out["k"].fillna(-1).tolist()) == [-1, -1, 3]


def test_cms_heavy_hitters_exact(ray_session):
    rng = np.random.default_rng(3)
    # zipf-ish: a few heavy keys + a long tail
    keys = np.concatenate(
        [np.repeat(np.arange(10), rng.integers(40, 80, 10)),
         rng.integers(100, 5000, 20000)]
    )
    rng.shuffle(keys)
    ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(8)
    # width deliberately small so CMS produces false-positive candidates
    out = (
        cms_heavy_hitters(ds, "k", min_count=40, depth=4, width=512)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        pd.Series(keys).value_counts().rename_axis("k").reset_index(name="c")
    )
    want = want[want["c"] >= 40].sort_values("k").reset_index(drop=True)
    want["k"] = want["k"].astype(np.int64)
    want["c"] = want["c"].astype(np.int64)
    pd.testing.assert_frame_equal(out, want)


def _brute_skyline(df, x, y):
    keep = []
    for i, a in df.iterrows():
        dom = (
            (df[x] >= a[x]) & (df[y] >= a[y])
            & ((df[x] > a[x]) | (df[y] > a[y]))
        )
        if not dom.any():
            keep.append(i)
    return df.loc[keep]


def test_skyline2d_matches_brute_force(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "id": np.arange(800),
            "x": rng.integers(0, 50, 800),
            "y": rng.integers(0, 50, 800),
        }
    )
    out = (
        skyline2d(rd.from_pandas(df).repartition(6), "x", "y")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = _brute_skyline(df, "x", "y").sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want)


def test_skyline2d_coordinate_duplicates_all_survive(ray_session):
    df = pd.DataFrame({"id": [1, 2, 3, 4], "x": [5, 5, 1, 5], "y": [9, 9, 1, 3]})
    out = _skyline2d_table(pa.Table.from_pandas(df), "x", "y").to_pandas()
    assert sorted(out["id"].tolist()) == [1, 2]  # both (5,9) rows; (5,3),(1,1) dominated


def test_skyline2d_against_duckdb(ray_session):
    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {"id": np.arange(500), "x": rng.integers(0, 30, 500),
         "y": rng.normal(0, 1, 500).round(3)}
    )
    out = (
        skyline2d(rd.from_pandas(df).repartition(4), "x", "y")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT * FROM t a WHERE NOT EXISTS (SELECT 1 FROM t b WHERE "
        "b.x >= a.x AND b.y >= a.y AND (b.x > a.x OR b.y > a.y)) ORDER BY id"
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.astype({"x": np.int64}), want.astype({"x": np.int64})
    )
