"""Round-5 fourth batch: distributed window functions (grouped_running),
GROUP BY ROLLUP (rollup_aggregate) and the sparse inverted-index cosine
join (token_cosine_pairs) — each cross-checked against DuckDB on randomized
inputs, plus empty-result schema stability."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_grouped_running_matches_duckdb_window(ray_session):
    import ray.data as rd

    from splink_ray.stages.stats import grouped_running

    rng = np.random.default_rng(7)
    n = 4000
    t = pa.table(
        {
            "g": rng.integers(0, 60, n),  # some groups of 1, some of ~100
            "k": np.arange(n, dtype=np.int64),  # unique order key
            "v": rng.integers(-50, 500, n),
        }
    )
    out = (
        grouped_running(rd.from_arrow(t).repartition(7), "g", "k", "v")
        .to_pandas()
    )
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        "SELECT g, k, v, "
        "CAST(SUM(v) OVER w AS BIGINT) AS running_v, "
        "LAG(v) OVER w AS prev_v, ROW_NUMBER() OVER w AS rn "
        "FROM t WINDOW w AS (PARTITION BY g ORDER BY k)"
    ).df()
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False
    )


def test_grouped_running_partition_invariance(ray_session):
    import ray.data as rd

    from splink_ray.stages.stats import grouped_running

    rng = np.random.default_rng(8)
    t = pa.table(
        {
            "g": rng.integers(0, 5, 300),
            "k": rng.permutation(300).astype(np.int64),
            "v": rng.integers(0, 10, 300),
        }
    )
    a = grouped_running(rd.from_arrow(t).repartition(2), "g", "k", "v",
                        num_buckets=3).to_pandas()
    b = grouped_running(rd.from_arrow(t).repartition(11), "g", "k", "v",
                        num_buckets=17).to_pandas()
    pd.testing.assert_frame_equal(_norm(a), _norm(b))


def test_rollup_aggregate_matches_duckdb(ray_session):
    import ray.data as rd

    from splink_ray.stages.stats import rollup_aggregate

    rng = np.random.default_rng(9)
    n = 3000
    t = pa.table(
        {
            "a": rng.choice(["x", "y", "z"], n),
            "b": rng.choice(["p", "q"], n),
            "v": rng.integers(-100, 1000, n),
        }
    )
    out = rollup_aggregate(
        rd.from_arrow(t).repartition(5), ["a", "b"], "v"
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        "SELECT a, b, CAST(GROUPING(a, b) AS BIGINT) AS grouping_id, "
        "CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS s "
        "FROM t GROUP BY ROLLUP(a, b)"
    ).df()
    assert len(out) == len(exp) == 3 * 2 + 3 + 1
    pd.testing.assert_frame_equal(_norm(out), _norm(exp), check_dtype=False)


def test_rollup_single_key_and_int_keys(ray_session):
    import ray.data as rd

    from splink_ray.stages.stats import rollup_aggregate

    t = pa.table({"a": [1, 1, 2], "v": [10, 20, 5]})
    out = (
        rollup_aggregate(rd.from_arrow(t), "a", "v")
        .to_pandas()
        .sort_values(["grouping_id", "a"])
        .reset_index(drop=True)
    )
    assert out["s"].tolist() == [30, 5, 35]
    assert out["grouping_id"].tolist() == [0, 0, 1]
    assert pd.isna(out["a"].iloc[2])


def test_token_cosine_matches_duckdb_and_df_cap(ray_session):
    import ray.data as rd

    from splink_ray.stages.dedup import token_cosine_pairs

    rng = np.random.default_rng(10)
    vocab = np.array([f"w{i}" for i in range(12)] + ["the"])  # 'the' = stop
    docs = []
    for i in range(80):
        words = list(rng.choice(vocab[:-1], rng.integers(3, 9)))
        words += ["the"] * int(rng.integers(1, 4))  # df('the') = 80 > cap
        rng.shuffle(words)
        docs.append(" ".join(words))
    t = pa.table({"doc_id": np.arange(80, dtype=np.int64), "text": docs})
    out = token_cosine_pairs(
        rd.from_arrow(t).repartition(6), "text", "doc_id",
        threshold=0.5, max_df=40, num_buckets=9,
    ).to_pandas()
    con = duckdb.connect()
    con.register("documents", t)
    exp = con.execute(
        "WITH tok AS (SELECT doc_id, unnest(str_split(text, ' ')) AS term "
        "FROM documents), "
        "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf "
        "FROM tok WHERE term <> '' GROUP BY doc_id, term), "
        "nrm AS (SELECT doc_id, CAST(sum(tf*tf) AS BIGINT) AS n2 "
        "FROM tf GROUP BY doc_id), "
        "df AS (SELECT term FROM tf GROUP BY term "
        "HAVING count(*) BETWEEN 2 AND 40), "
        "dots AS (SELECT a.doc_id AS id_l, b.doc_id AS id_r, "
        "CAST(sum(a.tf*b.tf) AS BIGINT) AS dot "
        "FROM tf a JOIN tf b USING (term) JOIN df USING (term) "
        "WHERE a.doc_id < b.doc_id GROUP BY 1, 2) "
        "SELECT id_l, id_r, "
        "round(dot / (sqrt(nl.n2)*sqrt(nr.n2)), 6) AS cosine FROM dots "
        "JOIN nrm nl ON nl.doc_id = dots.id_l "
        "JOIN nrm nr ON nr.doc_id = dots.id_r "
        "WHERE dot / (sqrt(nl.n2)*sqrt(nr.n2)) >= 0.5"
    ).df()
    assert len(exp) > 0  # the cap leaves real pairs behind
    pd.testing.assert_frame_equal(_norm(out), _norm(exp), check_dtype=False)
    # norm must include capped terms ('the' contributes to n2, not to dot):
    # recompute one pair by hand
    r0 = exp.iloc[0]
    tf = con.execute(
        "SELECT doc_id, term, count(*) AS tf FROM (SELECT doc_id, "
        "unnest(str_split(text,' ')) AS term FROM documents) "
        "WHERE doc_id IN (?, ?) GROUP BY 1,2",
        [int(r0.id_l), int(r0.id_r)],
    ).df()
    import collections

    vl = collections.Counter(
        dict(tf[tf.doc_id == r0.id_l][["term", "tf"]].values)
    )
    vr = collections.Counter(
        dict(tf[tf.doc_id == r0.id_r][["term", "tf"]].values)
    )
    shared = {
        k: vl[k] * vr[k] for k in set(vl) & set(vr) if k != "the"
    }
    n2l = sum(v * v for v in vl.values())
    n2r = sum(v * v for v in vr.values())
    manual = sum(shared.values()) / (np.sqrt(n2l) * np.sqrt(n2r))
    assert abs(manual - r0.cosine) < 1e-6


def test_token_cosine_empty_result_keeps_schema(ray_session):
    import ray.data as rd

    from splink_ray.stages.dedup import token_cosine_pairs

    t = pa.table(
        {"doc_id": np.arange(6, dtype=np.int64),
         "text": [f"unique{i} only{i}" for i in range(6)]}
    )
    ds = token_cosine_pairs(
        rd.from_arrow(t).repartition(3), "text", "doc_id",
        threshold=0.5, max_df=10, num_buckets=8,
    )
    # Dataset-level schema survives a fully-empty result (the typed seed
    # block) — what downstream stages consume. (to_pandas() on ANY 0-row
    # Dataset returns a column-less frame on Ray 2.49, even for
    # from_arrow(typed_empty) — a conversion quirk, not a pipeline defect.)
    assert ds.schema().names == ["id_l", "id_r", "cosine"]
    assert ds.count() == 0


def test_global_row_number_and_ntile_match_duckdb(ray_session):
    import ray.data as rd

    from splink_ray.stages.stats import global_row_number

    rng = np.random.default_rng(12)
    n = 3000
    t = pa.table(
        {
            "v": rng.integers(0, 25, n),  # heavy ties
            "id": rng.permutation(n).astype(np.int64),  # unique tiebreak
        }
    )
    out = global_row_number(
        rd.from_arrow(t).repartition(6), "v", "id", n_tiles=7, num_buckets=11
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        "SELECT v, id, ROW_NUMBER() OVER w AS rn, NTILE(7) OVER w AS tile "
        "FROM t WINDOW w AS (ORDER BY v, id)"
    ).df()
    pd.testing.assert_frame_equal(_norm(out), _norm(exp), check_dtype=False)


def test_global_row_number_more_tiles_than_rows(ray_session):
    import ray.data as rd

    from splink_ray.stages.stats import global_row_number

    t = pa.table({"v": [3, 1, 2], "id": [0, 1, 2]})
    out = (
        global_row_number(rd.from_arrow(t), "v", "id", n_tiles=10)
        .to_pandas().sort_values("rn").reset_index(drop=True)
    )
    assert out["rn"].tolist() == [1, 2, 3]
    assert out["tile"].tolist() == [1, 2, 3]  # each row its own tile


def test_grouped_mode_matches_duckdb(ray_session):
    import ray.data as rd

    from splink_ray.stages.stats import grouped_mode

    rng = np.random.default_rng(13)
    n = 5000
    t = pa.table(
        {
            "g": rng.integers(0, 40, n),
            "v": rng.choice(["a", "b", "c", "d"], n),  # frequent count ties
        }
    )
    out = grouped_mode(
        rd.from_arrow(t).repartition(8), "g", "v", num_buckets=9
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        "SELECT g, v AS mode, n FROM (SELECT g, v, "
        "CAST(count(*) AS BIGINT) AS n, row_number() OVER ("
        "PARTITION BY g ORDER BY count(*) DESC, v) AS rk "
        "FROM t GROUP BY g, v) WHERE rk = 1"
    ).df()
    pd.testing.assert_frame_equal(_norm(out), _norm(exp), check_dtype=False)


def test_byte_entropy_reference_and_slices():
    import collections
    import math

    from splink_ray.functions.text import byte_entropy

    texts = ["aaaa", "abab", "", "héllo wörld", "the quick brown fox", None]
    arr = pa.array(texts, pa.string())

    def ref(s):
        if not s:
            return 0.0
        bs = s.encode("utf-8")
        c = collections.Counter(bs)
        n = len(bs)
        return -sum((k / n) * math.log2(k / n) for k in c.values())

    got = byte_entropy(arr)
    exp = np.array([ref(s) for s in texts])
    np.testing.assert_allclose(got, exp, atol=1e-12)
    # sliced (offset != 0) arrays must view the right buffer region
    np.testing.assert_allclose(byte_entropy(arr.slice(2, 3)), exp[2:5],
                               atol=1e-12)


def test_grouped_quantiles_interpolated_matches_quantile_cont(ray_session):
    import ray.data as rd

    from splink_ray.stages.stats import grouped_quantiles

    rng = np.random.default_rng(14)
    n = 4000
    t = pa.table(
        {
            "g": rng.choice(["a", "b", "c", "one"], n, p=[0.5, 0.3, 0.199, 0.001]),
            "v": rng.integers(0, 37, n),
        }
    )
    out = grouped_quantiles(
        rd.from_arrow(t).repartition(6), "g", "v",
        qs=(0.0, 0.25, 0.5, 0.9, 1.0), interpolated=True,
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        "SELECT g, count(*) AS n, quantile_cont(v, 0.0) AS q0, "
        "quantile_cont(v, 0.25) AS q25, quantile_cont(v, 0.5) AS q50, "
        "quantile_cont(v, 0.9) AS q90, quantile_cont(v, 1.0) AS q100 "
        "FROM t GROUP BY g"
    ).df()
    a, b = _norm(out), _norm(exp)
    for c in ("q0", "q25", "q50", "q90", "q100"):
        np.testing.assert_allclose(a[c], b[c], atol=1e-9)
    assert a["n"].tolist() == b["n"].tolist()


def test_triangle_counts_matches_bruteforce(ray_session):
    import itertools

    import ray.data as rd

    from splink_ray.pipelines.clustering import triangle_counts

    rng = np.random.default_rng(15)
    n = 60
    # random graph ~12% density → plenty of triangles
    li, ri = np.triu_indices(n, k=1)
    keep = rng.random(len(li)) < 0.12
    li, ri = li[keep].astype(np.int64), ri[keep].astype(np.int64)
    edges = pa.table({"id_l": li, "id_r": ri})
    out = (
        triangle_counts(rd.from_arrow(edges).repartition(5), num_buckets=7)
        .to_pandas().set_index("node")["n_triangles"].to_dict()
    )
    eset = set(zip(li.tolist(), ri.tolist()))
    adj = {}
    for a, b in eset:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    ref: dict = {}
    for a, b in eset:
        for c in adj[a] & adj[b]:
            if c > b:  # count each triangle once at its ordered triple
                for x in (a, b, c):
                    ref[x] = ref.get(x, 0) + 1
    assert out == ref and sum(ref.values()) % 3 == 0 and len(ref) > 10


def test_triangle_counts_triangle_free_keeps_schema(ray_session):
    import ray.data as rd

    from splink_ray.pipelines.clustering import triangle_counts

    # a path graph has no triangles
    edges = pa.table(
        {"id_l": np.arange(9, dtype=np.int64),
         "id_r": np.arange(1, 10, dtype=np.int64)}
    )
    ds = triangle_counts(rd.from_arrow(edges))
    assert ds.schema().names == ["node", "n_triangles"]
    assert ds.count() == 0


def test_pivot_counts_matches_duckdb(ray_session):
    import ray.data as rd

    from splink_ray.stages.stats import pivot_counts

    rng = np.random.default_rng(16)
    n = 4000
    t = pa.table(
        {
            "g": rng.integers(0, 50, n),
            "v": rng.choice(["a", "b", "c", "zzz"], n, p=[0.4, 0.3, 0.2, 0.1]),
        }
    )
    # 'zzz' is NOT in the pivot domain → counted nowhere (documented)
    out = pivot_counts(
        rd.from_arrow(t).repartition(6), "g", "v", ["a", "b", "c"],
        num_buckets=9,
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        "SELECT g, CAST(COUNT(*) FILTER (v='a') AS BIGINT) AS n_a, "
        "CAST(COUNT(*) FILTER (v='b') AS BIGINT) AS n_b, "
        "CAST(COUNT(*) FILTER (v='c') AS BIGINT) AS n_c "
        "FROM t GROUP BY g"
    ).df()
    pd.testing.assert_frame_equal(_norm(out), _norm(exp), check_dtype=False)


def test_embedding_correlation_matches_numpy(ray_session):
    import ray.data as rd

    from splink_ray.stages.ann import embedding_covariance

    rng = np.random.default_rng(17)
    X = rng.normal(size=(400, 6))
    X[:, 3] = 2.5 * X[:, 0] - 1.0  # perfectly correlated pair
    t = pa.table({"embedding": [row.tolist() for row in X]})
    out = embedding_covariance(
        rd.from_arrow(t).repartition(4), "embedding", decimals=9,
        correlation=True,
    ).to_pandas()
    ref = np.corrcoef(X.T)
    for _, r in out.iterrows():
        assert abs(r["corr"] - ref[int(r.dim_i), int(r.dim_j)]) < 1e-6
    iu = np.triu_indices(6)
    assert len(out) == len(iu[0])
    d03 = out[(out.dim_i == 0) & (out.dim_j == 3)]["corr"].iloc[0]
    assert abs(d03 - 1.0) < 1e-9


def test_grouped_topk_ascending_bottom_k(ray_session):
    import ray.data as rd

    from splink_ray.stages.stats import grouped_topk

    rng = np.random.default_rng(18)
    n = 2000
    t = pa.table(
        {
            "g": rng.integers(0, 20, n),
            "v": rng.integers(0, 1000, n),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    out = grouped_topk(
        rd.from_arrow(t).repartition(5), "g", "v", "id", k=4,
        ascending=True, num_buckets=7,
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        "SELECT g, v, id, rank FROM (SELECT g, v, id, row_number() OVER ("
        "PARTITION BY g ORDER BY v, id) AS rank FROM t) WHERE rank <= 4"
    ).df()
    pd.testing.assert_frame_equal(_norm(out), _norm(exp), check_dtype=False)


def test_grouped_zscore_matches_duckdb(ray_session):
    import ray.data as rd

    from splink_ray.stages.stats import grouped_zscore

    rng = np.random.default_rng(19)
    n = 3000
    t = pa.table(
        {
            "g": rng.choice(["a", "b", "c", "const"], n),
            "v": rng.integers(0, 500, n),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    # make one group zero-variance → null zscores
    t = t.set_column(1, "v", pc.if_else(
        pc.equal(t["g"], "const"), pa.scalar(7, t.schema.field("v").type), t["v"]
    ))
    out = grouped_zscore(
        rd.from_arrow(t).repartition(6), "g", "v"
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        "WITH gs AS (SELECT g, CAST(count(*) AS DOUBLE) AS n, "
        "CAST(sum(v) AS DOUBLE) AS s1, CAST(sum(v*v) AS DOUBLE) AS s2 "
        "FROM t GROUP BY g) "
        "SELECT id, (v - s1/n) / sqrt(s2/n - (s1/n)*(s1/n)) AS z "
        "FROM t JOIN gs USING (g)"
    ).df().set_index("id")["z"]
    got = out.set_index("id")["zscore"]
    const_ids = out[out.g == "const"]["id"]
    assert got.loc[const_ids].isna().all()
    rest = out[out.g != "const"]["id"]
    np.testing.assert_allclose(got.loc[rest], exp.loc[rest], atol=1e-12)


def test_dedup_against_hit_is_complement_of_miss(ray_session):
    import ray.data as rd

    from splink_ray.stages.dedup import dedup_against

    texts = [f"doc {i % 7}" for i in range(40)]  # heavy duplication
    corpus = pa.table(
        {"doc_id": np.arange(40, dtype=np.int64), "text": texts}
    )
    ref = pa.table({"doc_id": [100, 101], "text": ["doc 0", "doc 3"]})
    cds = rd.from_arrow(corpus).repartition(4)
    rds = rd.from_arrow(ref)
    for method in ("join", "broadcast"):
        miss = set(
            dedup_against(cds, rds, "text", "doc_id", method=method)
            .to_pandas().doc_id
        )
        hit = set(
            dedup_against(cds, rds, "text", "doc_id", method=method,
                          keep="hit").to_pandas().doc_id
        )
        assert miss | hit == set(range(40)) and not (miss & hit)
        assert hit == {i for i in range(40) if i % 7 in (0, 3)}


def test_grouped_corr_matches_numpy(ray_session):
    import ray.data as rd

    from splink_ray.stages.stats import grouped_corr

    rng = np.random.default_rng(20)
    n = 3000
    g = rng.choice(["a", "b", "c"], n)
    x = rng.integers(0, 300, n)
    y = (x * 2 + rng.integers(0, 50, n)).astype(np.int64)  # correlated
    t = pa.table({"g": g, "x": x, "y": y})
    out = grouped_corr(
        rd.from_arrow(t).repartition(6), "g", "x", "y"
    ).to_pandas().set_index("g")
    for grp in ("a", "b", "c"):
        m = g == grp
        ref = np.corrcoef(x[m], y[m])[0, 1]
        assert abs(out.loc[grp, "corr"] - ref) < 1e-9
        assert out.loc[grp, "n"] == m.sum()


def test_grouped_corr_zero_variance_is_null(ray_session):
    import ray.data as rd

    from splink_ray.stages.stats import grouped_corr

    t = pa.table({"g": ["z"] * 5, "x": [7] * 5, "y": [1, 2, 3, 4, 5]})
    out = grouped_corr(rd.from_arrow(t), "g", "x", "y").to_pandas()
    assert pd.isna(out["corr"].iloc[0]) and out["n"].iloc[0] == 5


def test_grouped_mad_matches_duckdb(ray_session):
    import ray.data as rd

    from splink_ray.stages.stats import grouped_mad

    rng = np.random.default_rng(21)
    n = 3000
    t = pa.table(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "v": rng.integers(0, 80, n),
        }
    )
    out = grouped_mad(
        rd.from_arrow(t).repartition(5), "g", "v"
    ).to_pandas().set_index("g")
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        "SELECT g, count(*) AS n, mad(v) AS mad FROM t GROUP BY g"
    ).df().set_index("g")
    for grp in exp.index:
        assert out.loc[grp, "n"] == exp.loc[grp, "n"]
        assert abs(out.loc[grp, "mad"] - exp.loc[grp, "mad"]) < 1e-9


def test_driver_registry_invariants():
    """Guard the rotation bookkeeping that bit twice this round: the
    sampled 50-query prefix must contain every query that has never had a
    driver row (everything registered in round 5), queries/oracles must
    agree, and no key may be silently swallowed by a duplicate literal."""
    import re

    import __ray_entry__ as e

    q = list(e.queries())
    o = e.oracle_sql()
    # Every query is SQL-oracled except the explicit rows-only allowlist
    # (genuinely non-SQL-expressible ops; the driver records a weaker
    # rows-only check for these, and pytest pins their invariants instead).
    rows_only = {"pca_embeddings"}  # eigendecomposition is not SQL
    assert set(q) - set(o) == rows_only, sorted((set(q) - set(o)) ^ rows_only)
    assert set(o) <= set(q), sorted(set(o) - set(q))
    # bpe_token_counts_docs is the canonical last never-green entry of the
    # round-5 window plan; everything registered after it is r3/r4-green
    assert q.index("bpe_token_counts_docs") <= 49
    src = open(e.__file__.replace(".pyc", ".py")).read()
    m = re.search(r"def queries\(\).*?return \{(.*?)\n    \}", src, re.S)
    keys = re.findall(r'^\s+"([a-z0-9_]+)":', m.group(1), re.M)
    dupes = {k for k in keys if keys.count(k) > 1}
    assert not dupes, f"duplicate dict literals (first wins silently): {dupes}"


def test_grouped_running_lead_matches_duckdb(ray_session):
    """include_lead: next_v == LEAD(v) OVER the same window (run tails
    null); default consumers keep the three-column schema."""
    import ray.data as rd

    from splink_ray.stages.stats import grouped_running

    rng = np.random.default_rng(9)
    n = 1500
    t = pa.table(
        {
            "g": rng.integers(0, 40, n),
            "k": np.arange(n, dtype=np.int64),
            "v": rng.integers(-9, 99, n),
        }
    )
    out = grouped_running(
        rd.from_arrow(t).repartition(6), "g", "k", "v", include_lead=True
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        "SELECT g, k, v, "
        "CAST(SUM(v) OVER w AS BIGINT) AS running_v, "
        "LAG(v) OVER w AS prev_v, ROW_NUMBER() OVER w AS rn, "
        "LEAD(v) OVER w AS next_v "
        "FROM t WINDOW w AS (PARTITION BY g ORDER BY k)"
    ).df()
    pd.testing.assert_frame_equal(_norm(out), _norm(exp), check_dtype=False)
    plain = grouped_running(rd.from_arrow(t), "g", "k", "v").to_pandas()
    assert "next_v" not in plain.columns
