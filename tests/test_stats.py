"""Grouped quantiles (stages/stats.py) and deterministic sharding
(stages/sampling.assign_shards / write_sharded)."""

import glob

import numpy as np
import pyarrow as pa


def test_grouped_quantiles_matches_duckdb_nearest_rank(ray_session):
    import duckdb
    import pandas as pd
    import ray.data as rd

    from splink_ray.stages.stats import grouped_quantiles

    rng = np.random.default_rng(11)
    n = 5000
    t = pa.table(
        {
            "g": rng.choice(["a", "b", "c", "solo"], n, p=[0.5, 0.3, 0.19, 0.01]),
            "v": rng.integers(0, 40, n),  # heavy ties stress the histogram path
        }
    )
    out = (
        grouped_quantiles(rd.from_arrow(t).repartition(6), "g", "v",
                          qs=(0.0, 0.25, 0.5, 0.9, 1.0))
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        "SELECT g, count(*) AS n, quantile_disc(v, 0.0) AS q0, "
        "quantile_disc(v, 0.25) AS q25, quantile_disc(v, 0.5) AS q50, "
        "quantile_disc(v, 0.9) AS q90, quantile_disc(v, 1.0) AS q100 "
        "FROM t GROUP BY g ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(out[exp.columns], exp, check_dtype=False)


def test_grouped_quantiles_single_row_group(ray_session):
    import ray.data as rd

    from splink_ray.stages.stats import grouped_quantiles

    out = grouped_quantiles(
        rd.from_arrow(pa.table({"g": ["x"], "v": [7]})), "g", "v", qs=(0.5,)
    ).to_pandas()
    assert out.n.tolist() == [1] and out.q50.tolist() == [7]


def test_write_sharded_layout_is_reproducible(ray_session, tmp_path):
    import ray.data as rd

    from splink_ray.stages.sampling import write_sharded

    t = pa.table({"k": list(range(300)), "v": [f"r{i}" for i in range(300)]})
    layouts = []
    for run in ("a", "b"):
        path = str(tmp_path / run)
        # different partitioning per run; shard contents must be identical
        write_sharded(rd.from_arrow(t).repartition(2 if run == "a" else 5),
                      path, "k", 8)
        per_shard = {}
        for d in glob.glob(f"{path}/shard=*"):
            shard = int(d.rsplit("=", 1)[1])
            rows = rd.read_parquet(d).to_pandas()
            per_shard[shard] = sorted(rows.k)
        layouts.append(per_shard)
    assert layouts[0] == layouts[1]
    assert sum(len(v) for v in layouts[0].values()) == 300


def test_distinct_count_per_group_exact(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from splink_ray.stages.stats import distinct_count_per_group

    t = pa.table(
        {
            "g": pa.array(["a", "a", "a", "b", "b"], pa.string()),
            "v": pa.array([1, 1, 2, 1, 1], pa.int64()),
        }
    )
    # duplicates across batches must not double-count: repartition to split
    ds = rd.from_arrow(t).repartition(3)
    out = (
        distinct_count_per_group(ds, "g", "v", num_buckets=4)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert list(out["g"]) == ["a", "b"]
    assert list(out["n_distinct"]) == [2, 1]


def test_broadcast_join_inner_and_left(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from splink_ray.stages.joins import broadcast_join

    big = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 2], pa.int64()),
                  "v": pa.array(["a", "b", "c", "d"], pa.string())})
    )
    small = pa.table({"ck": pa.array([1, 2], pa.int64()),
                      "dim": pa.array(["x", "y"], pa.string())})
    inner = (
        broadcast_join(big, small, key="k", right_key="ck", how="inner")
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    assert list(inner["k"]) == [1, 2, 2]
    assert list(inner["dim"]) == ["x", "y", "y"]
    left = (
        broadcast_join(big, small, key="k", right_key="ck", how="left")
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    assert len(left) == 4
    assert left[left["k"] == 3]["dim"].isna().all()


def test_docs_above_q90_composition(ray_session):
    """grouped_quantiles ∘ broadcast_join ∘ filter == SQL quantile join."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = (
        e.queries()["docs_above_q90"](sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    o = (
        con.execute(e.oracle_sql()["docs_above_q90"] + " ORDER BY doc_id")
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        mine[["doc_id", "lang", "n_chars"]], o, check_dtype=False
    )


def test_rank_values_matches_duckdb_window(ray_session):
    """rank/dense_rank/percent_rank vs DuckDB's window trio, with heavy
    ties and a null value (NULLS LAST: ranked after everything, counted
    toward N), across forced multi-block partitioning."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from splink_ray.stages.stats import rank_values

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "id": np.arange(300),
            "v": rng.integers(0, 12, 300).astype("float64"),
        }
    )
    df.loc[7, "v"] = None
    out = (
        rank_values(rd.from_pandas(df).repartition(9), "v")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    exp = duckdb.query_df(
        df, "t",
        "SELECT id, rank() OVER (ORDER BY v) AS rank, "
        "dense_rank() OVER (ORDER BY v) AS dense_rank, "
        "round(percent_rank() OVER (ORDER BY v), 6) AS percent_rank "
        "FROM t",
    ).df().sort_values("id").reset_index(drop=True)
    assert out["rank"].tolist() == exp["rank"].tolist()
    assert out["dense_rank"].tolist() == exp["dense_rank"].tolist()
    assert out["percent_rank"].tolist() == exp["percent_rank"].tolist()
    # the null value ranked LAST (NULLS LAST), counted toward N
    assert out.loc[out["v"].isna(), "rank"].tolist() == [300]


def test_rank_values_single_row(ray_session):
    import pandas as pd
    import ray.data as rd

    from splink_ray.stages.stats import rank_values

    out = rank_values(
        rd.from_pandas(pd.DataFrame({"id": [1], "v": [42]})), "v"
    ).to_pandas()
    assert out["rank"].tolist() == [1]
    assert out["percent_rank"].tolist() == [0.0]


def test_grouped_string_agg_matches_duckdb(ray_session):
    """Ordered concat vs DuckDB string_agg(... ORDER BY ...), with null
    values skipped, an all-null group emitting a null aggregate, and
    multi-block partitioning at an empty-bucket-forcing bucket count."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from splink_ray.stages.stats import grouped_string_agg

    df = pd.DataFrame(
        {
            "g": [1, 1, 1, 2, 2, 3, 3, 4],
            "v": ["b", None, "a", "x", "y", None, None, "solo"],
            "o1": [2, 1, 1, 5, 4, 1, 2, 9],
            "o2": [0, 0, 1, 0, 0, 0, 0, 0],
        }
    )
    out = (
        grouped_string_agg(
            rd.from_pandas(df).repartition(5), "g", "v", ["o1", "o2"],
            sep="|", num_buckets=32,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    exp = duckdb.query_df(
        df, "t",
        "SELECT g, string_agg(v, '|' ORDER BY o1, o2) AS agg "
        "FROM t GROUP BY g ORDER BY g",
    ).df().reset_index(drop=True)
    assert out["g"].tolist() == exp["g"].tolist()
    assert out["agg"].where(out["agg"].notna(), None).tolist() == \
        exp["agg"].where(exp["agg"].notna(), None).tolist()


def test_grouped_string_agg_null_group_key(ray_session):
    """A NULL group key is ONE group (SQL GROUP BY), not per-row runs."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from splink_ray.stages.stats import grouped_string_agg

    df = pd.DataFrame(
        {
            "g": [None, None, None, "a", None],
            "v": ["x", "y", None, "q", "z"],
            "o": [3, 1, 0, 1, 2],
        }
    )
    out = grouped_string_agg(
        rd.from_pandas(df).repartition(4), "g", "v", ["o"], sep="|",
        num_buckets=16,
    ).to_pandas()
    exp = duckdb.query_df(
        df, "t",
        "SELECT g, string_agg(v, '|' ORDER BY o) AS agg FROM t GROUP BY g",
    ).df()
    key = lambda d: d.fillna({"g": "~"}).sort_values("g").reset_index(drop=True)
    got, want = key(out), key(exp)
    assert got["g"].tolist() == want["g"].tolist()
    assert got["agg"].tolist() == want["agg"].tolist()


def test_rank_values_nan_and_null_ranked_last(ray_session):
    """DuckDB ORDER BY total order: values < NaN < NULL, all ranked and
    counted toward N. Arrow-origin input so genuine NaN survives (pandas
    conversion folds NaN into null); NaN partials from different blocks
    merge to one lookup entry despite Ray's groupby dropping NaN keys."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from splink_ray.stages.stats import rank_values

    vals = [float(i % 5) for i in range(30)] + [float("nan")] * 4 + [None] * 3
    tbl = pa.table(
        {"id": pa.array(np.arange(37)), "v": pa.array(vals, pa.float64())}
    )
    out = (
        rank_values(rd.from_arrow(tbl).repartition(7), "v")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.execute(
        "SELECT id, rank() OVER (ORDER BY v) AS rank, "
        "dense_rank() OVER (ORDER BY v) AS dense_rank, "
        "round(percent_rank() OVER (ORDER BY v), 6) AS percent_rank "
        "FROM t ORDER BY id"
    ).df().reset_index(drop=True)
    assert out["rank"].tolist() == exp["rank"].tolist()
    assert out["dense_rank"].tolist() == exp["dense_rank"].tolist()
    assert out["percent_rank"].tolist() == exp["percent_rank"].tolist()
    # NaN block ranks 31-34 (one shared rank 31), nulls last at 35-37
    assert out.loc[30:33, "rank"].tolist() == [31] * 4
    assert out.loc[34:36, "rank"].tolist() == [35] * 3


def test_rank_values_cume_dist_matches_duckdb(ray_session):
    """include_cume: cume_dist (peers-inclusive ≤-fraction) vs DuckDB,
    with ties, a NaN and a NULL — NaN is a peer group before NULL, NULL's
    cume is 1.0; existing consumers (include_cume off) keep their schema."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from splink_ray.stages.stats import rank_values

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "id": np.arange(200),
            "v": rng.integers(0, 9, 200).astype("float64"),
        }
    )
    df.loc[3, "v"] = None
    df.loc[11, "v"] = float("nan")
    out = (
        rank_values(rd.from_pandas(df).repartition(8), "v", include_cume=True)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    exp = duckdb.query_df(
        df, "t",
        "SELECT id, round(cume_dist() OVER (ORDER BY v), 6) AS cume_dist "
        "FROM t",
    ).df().sort_values("id").reset_index(drop=True)
    assert out["cume_dist"].tolist() == exp["cume_dist"].tolist()
    assert "cume_dist" in out.columns
    plain = rank_values(rd.from_pandas(df), "v").to_pandas()
    assert "cume_dist" not in plain.columns
