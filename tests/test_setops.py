"""SQL set operations (EXCEPT / INTERSECT, DISTINCT and ALL) vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from splink_ray.stages.setops import (
    except_all,
    except_distinct,
    intersect_all,
    intersect_distinct,
)

OPS = {
    "EXCEPT": except_distinct,
    "EXCEPT ALL": except_all,
    "INTERSECT": intersect_distinct,
    "INTERSECT ALL": intersect_all,
}


def _frames(seed=13):
    rng = np.random.default_rng(seed)
    # small domain -> heavy duplication, exercising multiplicity math
    a = pd.DataFrame(
        {"x": rng.integers(0, 6, 500), "y": rng.choice(["p", "q", "r"], 500)}
    )
    b = pd.DataFrame(
        {"x": rng.integers(0, 6, 300), "y": rng.choice(["p", "q", "s"], 300)}
    )
    return a, b


@pytest.mark.parametrize("op", list(OPS))
def test_setop_matches_duckdb(ray_session, op):
    a, b = _frames()
    out = (
        OPS[op](rd.from_pandas(a).repartition(4), rd.from_pandas(b).repartition(3))
        .to_pandas()
        .sort_values(["x", "y"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("a", a)
    con.register("b", b)
    want = (
        con.execute(f"SELECT x, y FROM a {op} SELECT x, y FROM b ORDER BY x, y")
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out.astype({"x": np.int64}), want)


def test_setop_nulls_compare_equal(ray_session):
    # SQL set ops use IS NOT DISTINCT FROM: NULL rows match NULL rows
    a = pd.DataFrame({"x": pd.array([1, None, None, 2], dtype="Int64")})
    b = pd.DataFrame({"x": pd.array([None, 3], dtype="Int64")})
    out = except_all(rd.from_pandas(a), rd.from_pandas(b)).to_pandas()
    # multiset: a has two NULLs, b one -> one NULL survives, plus 1 and 2
    assert len(out) == 3
    assert out["x"].isna().sum() == 1
    inter = intersect_distinct(rd.from_pandas(a), rd.from_pandas(b)).to_pandas()
    assert len(inter) == 1 and inter["x"].isna().all()


def test_setop_column_projection(ray_session):
    a = pd.DataFrame({"x": [1, 1, 2], "junk": ["a", "b", "c"]})
    b = pd.DataFrame({"x": [1], "other": [9]})
    out = except_all(
        rd.from_pandas(a), rd.from_pandas(b), columns=["x"]
    ).to_pandas()
    assert sorted(out["x"].tolist()) == [1, 2]
    assert list(out.columns) == ["x"]


def test_snapshot_diff_classification(ray_session):
    from splink_ray.stages.setops import snapshot_diff

    old = pd.DataFrame(
        {"k": [1, 2, 3, 4], "v": ["a", "b", "c", None], "w": [10, 20, 30, 40]}
    )
    new = pd.DataFrame(
        {"k": [2, 3, 4, 5], "v": ["b", "C", None, "e"], "w": [20, 30, 40, 50]}
    )
    out = (
        snapshot_diff(rd.from_pandas(old), rd.from_pandas(new), "k")
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    # k=1 removed; k=2 unchanged (omitted); k=3 changed (v); k=4 unchanged
    # via NULL IS NOT DISTINCT FROM NULL; k=5 added
    assert out["change"].to_dict() == {1: "removed", 3: "changed", 5: "added"}
    assert out.loc[3, "v"] == "C"  # NEW side's values for changed rows
    full = (
        snapshot_diff(
            rd.from_pandas(old), rd.from_pandas(new), "k", include_unchanged=True
        )
        .to_pandas()
    )
    assert (full["change"] == "unchanged").sum() == 2


def test_snapshot_diff_duplicate_key_raises(ray_session):
    from splink_ray.stages.setops import snapshot_diff

    old = pd.DataFrame({"k": [1, 1], "v": [1, 2]})
    new = pd.DataFrame({"k": [1], "v": [1]})
    with pytest.raises(Exception):
        snapshot_diff(rd.from_pandas(old), rd.from_pandas(new), "k").to_pandas()


def test_unpivot_matches_duckdb(ray_session):
    """Melt parity vs a UNION-ALL oracle: null measure values drop (SQL
    UNPIVOT semantics), mixed int/float value columns unify to the common
    type, ids replicate per measure."""
    import duckdb
    import ray.data as rd

    from splink_ray.stages.setops import unpivot

    df = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "a": [1.5, None, 2.5],
            "b": pd.array([7, 8, None], dtype="Int64"),
        }
    )
    # single batch: per-batch int+float promotion resolves to float64
    out1 = unpivot(rd.from_pandas(df), ["id"], ["a", "b"]).to_pandas()
    # multi batch: pandas-origin batches disagree on the promoted type
    # (an all-null 'a' slice is a null-type wildcard), so the documented
    # contract is an explicit value_type
    ds = rd.from_pandas(df).repartition(3)
    out = unpivot(
        ds, ["id"], ["a", "b"], value_type=pa.float64()
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        "SELECT id, 'a' AS name, a AS value FROM t WHERE a IS NOT NULL "
        "UNION ALL SELECT id, 'b', CAST(b AS DOUBLE) FROM t "
        "WHERE b IS NOT NULL"
    ).df()
    key = lambda d: d.sort_values(["id", "name"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(out), key(exp), check_dtype=False)
    pd.testing.assert_frame_equal(key(out1), key(exp), check_dtype=False)
    assert out1["value"].dtype == np.float64  # int column unified to double
