"""Round-5 batch 11 operators: sorted-neighborhood blocking (stages/snb.py),
KMV distinct sketch + grouped OLS regression (stages/stats.py), and the
local clustering coefficient (pipelines/clustering.py)."""

import numpy as np
import pyarrow as pa


def _snb_reference(vals, ids, window):
    order = sorted(range(len(vals)), key=lambda i: (vals[i], ids[i]))
    out = set()
    for pos in range(len(order)):
        for d in range(1, window):
            if pos + d < len(order):
                out.add((ids[order[pos]], ids[order[pos + d]], d))
    return out


def test_snb_matches_window_self_join(ray_session):
    import ray.data as rd

    from splink_ray.stages.snb import sorted_neighborhood_pairs

    rng = np.random.default_rng(5)
    n = 800
    vals = rng.integers(0, 120, n)  # heavy ties stress the id tie-break
    ids = np.arange(1000, 1000 + n)
    rng.shuffle(ids)
    t = pa.table({"v": vals, "id": ids})
    out = sorted_neighborhood_pairs(
        rd.from_arrow(t).repartition(7), "v", "id",
        window=5, num_range_buckets=16,
    ).to_pandas()
    got = set(zip(out["id_l"], out["id_r"], out["dist"]))
    exp = _snb_reference(vals.tolist(), ids.tolist(), 5)
    assert got == exp
    assert len(out) == len(exp)  # no duplicate emissions


def test_snb_partitioning_and_bucket_count_invariance(ray_session):
    import ray.data as rd

    from splink_ray.stages.snb import sorted_neighborhood_pairs

    rng = np.random.default_rng(7)
    t = pa.table(
        {
            "v": rng.integers(-50, 50, 300),  # negative keys
            "id": np.arange(300),
        }
    )

    def run(parts, rb):
        out = sorted_neighborhood_pairs(
            rd.from_arrow(t).repartition(parts), "v", "id",
            window=3, num_range_buckets=rb,
        ).to_pandas()
        return set(zip(out["id_l"], out["id_r"], out["dist"]))

    a = run(2, 4)
    # more range buckets than rows forces empty buckets + tiny carries
    b = run(9, 512)
    assert a == b == _snb_reference(
        t["v"].to_pylist(), t["id"].to_pylist(), 3
    )


def test_kmv_matches_single_machine_sketch(ray_session):
    import ray.data as rd

    from splink_ray.duckdb_kernels import get_kernel
    from splink_ray.stages.stats import kmv_distinct

    rng = np.random.default_rng(3)
    n = 6000
    g = rng.choice(["big", "mid", "tiny"], n, p=[0.6, 0.35, 0.05])
    v = np.where(
        g == "tiny", rng.integers(0, 5, n), rng.integers(0, 2000, n)
    )
    t = pa.table({"g": g, "v": v})
    k = 32
    out = (
        kmv_distinct(rd.from_arrow(t).repartition(8), "g", "v", k=k)
        .to_pandas().set_index("g")["est_distinct"]
    )

    # single-machine reference sketch with the same hash law
    for grp in ("big", "mid", "tiny"):
        vals = pa.array(sorted({int(x) for x in v[g == grp]}))
        h = get_kernel().md5_u32(vals)
        u = np.unique((h.astype(np.float64) + 0.5) / 4294967296.0)
        if len(u) >= k:
            exp = (k - 1.0) / u[k - 1]
        else:
            exp = float(len(u))
        assert out[grp] == exp
    # the sketch estimate lands near the truth when it fills
    truth = len(np.unique(v[g == "big"]))
    assert abs(out["big"] - truth) / truth < 0.35
    # 'tiny' never fills -> exact distinct count
    assert out["tiny"] == float(len(np.unique(v[g == "tiny"])))


def test_grouped_regression_matches_numpy_polyfit(ray_session):
    import ray.data as rd

    from splink_ray.stages.stats import grouped_regression

    rng = np.random.default_rng(9)
    n = 4000
    g = rng.choice(["a", "b"], n)
    x = rng.integers(0, 1000, n)
    noise = rng.integers(-40, 41, n)
    y = np.where(g == "a", 3 * x + 17, -2 * x + 999) + noise
    t = pa.table({"g": g, "x": x, "y": y})
    out = (
        grouped_regression(rd.from_arrow(t).repartition(5), "g", "x", "y")
        .to_pandas().set_index("g")
    )
    for grp in ("a", "b"):
        m = g == grp
        slope, intercept = np.polyfit(
            x[m].astype(float), y[m].astype(float), 1
        )
        assert abs(out.loc[grp, "slope"] - slope) < 1e-6
        assert abs(out.loc[grp, "intercept"] - intercept) < 1e-3
        assert out.loc[grp, "n"] == int(m.sum())


def test_grouped_regression_zero_variance_x_is_null(ray_session):
    import ray.data as rd

    from splink_ray.stages.stats import grouped_regression

    t = pa.table({"g": ["z"] * 4, "x": [7, 7, 7, 7], "y": [1, 2, 3, 4]})
    out = grouped_regression(rd.from_arrow(t), "g", "x", "y").to_pandas()
    assert out["slope"].isna().all()
    assert out["intercept"].isna().all()


def test_clustering_coefficient_matches_reference(ray_session):
    import ray.data as rd

    from splink_ray.pipelines.clustering import clustering_coefficient

    # two triangles sharing node 2, plus a pendant node 9 and an isolated
    # edge (10, 11)
    e = [(0, 1), (0, 2), (1, 2), (2, 3), (2, 4), (3, 4), (4, 9), (10, 11)]
    t = pa.table(
        {
            "id_l": pa.array([a for a, _ in e], pa.int64()),
            "id_r": pa.array([b for _, b in e], pa.int64()),
        }
    )
    out = (
        clustering_coefficient(rd.from_arrow(t).repartition(3))
        .to_pandas().set_index("node").sort_index()
    )
    adj: dict[int, set] = {}
    for a, b in e:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for node, nbrs in adj.items():
        d = len(nbrs)
        tri = sum(
            1
            for i in nbrs
            for j in nbrs
            if i < j and j in adj.get(i, set())
        )
        assert out.loc[node, "degree"] == d
        assert out.loc[node, "n_triangles"] == tri
        exp_cc = 2.0 * tri / (d * (d - 1.0)) if d > 1 else 0.0
        assert out.loc[node, "cc"] == exp_cc
    assert set(out.index) == set(adj)


def test_containment_kernel_fast_matches_loop(ray_session):
    from splink_ray.stages.dedup import (
        _jaccard_tokens_fast,
        _jaccard_tokens_loop,
    )

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        " ".join(rng.choice(vocab, rng.integers(0, 12)))
        for _ in range(400)
    ]
    l = pa.array([docs[i] for i in rng.integers(0, 400, 300)])
    r = pa.array([docs[i] for i in rng.integers(0, 400, 300)])
    fast = _jaccard_tokens_fast(l, r, containment_r=True)
    loop = _jaccard_tokens_loop(l, r, containment_r=True)
    np.testing.assert_allclose(fast, loop, rtol=0, atol=0)


def test_prefix_containment_against_exact_recall(ray_session):
    import ray.data as rd

    from splink_ray.stages.dedup import prefix_containment_against

    rng = np.random.default_rng(21)
    vocab = [f"t{i:03d}" for i in range(40)]
    corpus = [
        " ".join(rng.choice(vocab, rng.integers(3, 15), replace=False))
        for _ in range(120)
    ]
    refs = [
        " ".join(rng.choice(vocab, rng.integers(2, 8), replace=False))
        for _ in range(25)
    ]
    # a superset pair: low jaccard, containment exactly 1.0
    refs.append("t000 t001")
    corpus.append("t000 t001 " + " ".join(vocab[10:30]))
    t = 0.6
    ds = rd.from_arrow(
        pa.table({"doc_id": np.arange(len(corpus)), "text": corpus})
    ).repartition(5)
    rf = rd.from_arrow(
        pa.table({"ref_id": np.arange(len(refs)), "rt": refs})
    ).repartition(3)
    out = prefix_containment_against(
        ds, rf, "text", "doc_id",
        ref_text_col="rt", ref_id_col="ref_id", threshold=t,
    ).to_pandas()
    got = {
        (a, b): c
        for a, b, c in zip(out["doc_id"], out["ref_id"], out["containment"])
    }
    exp = {}
    for di, d in enumerate(corpus):
        sd = set(d.split())
        for ri, r in enumerate(refs):
            sr = set(r.split())
            c = len(sd & sr) / len(sr) if sr else 1.0
            if c >= t:
                exp[(di, ri)] = round(c, 6)
    assert got == exp  # exact recall AND exact scores
    assert got[(len(corpus) - 1, len(refs) - 1)] == 1.0


def test_cohort_retention_matches_pandas(ray_session):
    import pandas as pd
    import ray.data as rd

    from splink_ray.stages.events import cohort_retention

    rng = np.random.default_rng(17)
    n = 5000
    users = rng.integers(0, 200, n)
    base = np.int64(1_700_000_000_000_000)
    ts = base + rng.integers(0, 40, n) * 86_400_000_000 + rng.integers(
        0, 86_400_000_000, n
    )
    t = pa.table(
        {
            "user_id": users,
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    out = (
        cohort_retention(
            rd.from_arrow(t).repartition(7), "user_id", "ts",
            period_days=7,
        )
        .to_pandas()
        .sort_values(["cohort_period", "offset_periods"])
        .reset_index(drop=True)
    )
    df = pd.DataFrame({"u": users, "p": ts // (86_400_000_000 * 7)})
    up = df.drop_duplicates()
    cohort = up.groupby("u")["p"].transform("min")
    ref = (
        pd.DataFrame(
            {
                "cohort_period": cohort,
                "offset_periods": up["p"] - cohort,
            }
        )
        .groupby(["cohort_period", "offset_periods"])
        .size()
        .rename("n_users")
        .reset_index()
        .sort_values(["cohort_period", "offset_periods"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # every user appears exactly once at offset 0 of their cohort
    assert (
        out[out["offset_periods"] == 0]["n_users"].sum()
        == df["u"].nunique()
    )


def test_gram_novelty_matches_reference(ray_session):
    import ray.data as rd

    from splink_ray.stages.corpus import gram_novelty

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        " ".join(rng.choice(vocab, rng.integers(0, 20))) for _ in range(150)
    ]
    t = pa.table({"doc_id": np.arange(150), "text": docs})
    out = (
        gram_novelty(rd.from_arrow(t).repartition(6), "text", "doc_id", n=3)
        .to_pandas().set_index("doc_id").sort_index()
    )

    def grams(s):
        w = s.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    first: dict = {}
    for i, d in enumerate(docs):
        for g in sorted(grams(d)):
            first.setdefault(g, i)
    for i, d in enumerate(docs):
        gs = grams(d)
        if not gs:
            assert i not in out.index
            continue
        intro = sum(1 for g in gs if first[g] == i)
        assert out.loc[i, "n_grams"] == len(gs)
        assert out.loc[i, "n_introduced"] == intro
        assert out.loc[i, "novelty"] == intro / len(gs)


def test_graph_metrics_clusters_tiny_edges_high_parallelism(ray_session):
    """Regression: compute_graph_metrics' edges ⋈ cluster-map join must
    survive schema-less empty partitions (3 edges, keyed_map-produced
    blocks, many partitions) — the Dataset.join hazard class that killed
    cluster_density_docs before the shuffle_join migration."""
    import ray.data as rd

    from splink_ray.pipelines.clustering import (
        cluster_pairwise_predictions_at_threshold,
        compute_graph_metrics,
    )
    from splink_ray.stages.exchange import keyed_map

    recs = rd.from_arrow(
        pa.table({"unique_id": pa.array(list(range(10)), pa.int64())})
    ).repartition(8)
    preds_t = pa.table(
        {
            "unique_id_l": pa.array([0, 2, 7], pa.int64()),
            "unique_id_r": pa.array([1, 3, 8], pa.int64()),
            "match_probability": pa.array([1.0, 1.0, 1.0]),
        }
    )
    # route the tiny edge set through keyed_map so its empty partitions are
    # the schema-less blocks Ray emits for empty groupby groups
    preds = keyed_map(
        rd.from_arrow(preds_t).repartition(4),
        "unique_id_l",
        lambda t: t,
        num_buckets=32,
    )
    clustered, _ = cluster_pairwise_predictions_at_threshold(
        recs, preds, threshold_match_probability=0.5
    )
    out = compute_graph_metrics(preds, clustered, threshold=0.5)
    cl = out["clusters"].set_index("cluster_id").sort_index()
    assert len(cl) == 7  # 3 pairs + 4 singletons
    assert cl.loc[0, "n_nodes"] == 2 and cl.loc[0, "n_edges"] == 1
    assert cl.loc[0, "density"] == 1.0
    assert cl.loc[4, "n_nodes"] == 1 and cl.loc[4, "n_edges"] == 0
    assert np.isnan(cl.loc[4, "density"])
    nodes = out["nodes"].set_index("node")
    assert nodes.loc[0, "degree"] == 1 and len(nodes) == 6
