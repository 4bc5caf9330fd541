"""Round-5 second-batch operators: FastSS edit-distance join, full-probe
IVF exactness, hybrid RRF retrieval, SimHash dedup groups."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _rd(table, cols=None):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/{table}.parquet", columns=cols)


# ---------------------------------------------------------------------------
# edit_distance_join
# ---------------------------------------------------------------------------


def _lev_oracle_pairs(rows, max_dist):
    con = duckdb.connect()
    con.register("t", pa.table({"id": [r[0] for r in rows],
                                "s": [r[1] for r in rows]}))
    return set(
        map(
            tuple,
            con.sql(
                "SELECT l.id, r.id, levenshtein(l.s, r.s) FROM t l JOIN t r "
                "ON l.id < r.id WHERE l.s IS NOT NULL AND r.s IS NOT NULL "
                f"AND levenshtein(l.s, r.s) <= {max_dist}"
            ).fetchall(),
        )
    )


def test_edit_distance_join_tricky_cases(ray_session):
    """Transposition (ab/ba = dist 2) must be verified OUT; repeated chars,
    empty strings, nulls, insert/delete/substitute all handled; unicode
    verified at DuckDB's byte-level semantics."""
    import ray.data as rd

    from splink_ray.stages.fuzzy import edit_distance_join

    rows = [
        (1, "ab"), (2, "ba"), (3, "abc"), (4, "abcd"), (5, "xbc"),
        (6, "aa"), (7, "a"), (8, ""), (9, None), (10, "abc"),
        (11, "café"), (12, "cafe"), (13, "cafés"),
    ]
    ds = rd.from_arrow(
        pa.table({"id": [r[0] for r in rows],
                  "s": pa.array([r[1] for r in rows], pa.string())})
    )
    got = {
        (r["id_l"], r["id_r"], r["dist"])
        for r in edit_distance_join(ds, "s", "id", max_dist=1).take_all()
    }
    exp = _lev_oracle_pairs(rows, 1)
    assert got == exp
    assert (1, 2, 2) not in got          # transposition excluded
    assert (3, 10, 0) in exp and (3, 10, 0) in got  # exact dup at dist 0
    assert (7, 8, 1) in got              # "a" vs "" = one deletion
    # café→cafés is a 1-byte append; café→cafe is a 2-byte edit (é is 2
    # bytes) so DuckDB byte-level distance is 2 → must NOT pair
    assert (11, 13, 1) in got and not any(l == 11 and r == 12 for l, r, _ in got)


def test_edit_distance_join_empty_partitions(ray_session):
    """num_buckets ≫ key count forces empty buckets through every exchange
    (the Ray 2.49 schema-loss hazard class)."""
    import ray.data as rd

    from splink_ray.stages.fuzzy import edit_distance_join

    rows = [(1, "abc"), (2, "abd"), (3, "zzz")]
    ds = rd.from_arrow(
        pa.table({"id": [r[0] for r in rows], "s": [r[1] for r in rows]})
    )
    got = {
        (r["id_l"], r["id_r"], r["dist"])
        for r in edit_distance_join(ds, "s", "id", num_buckets=64).take_all()
    }
    assert got == {(1, 2, 1)}


def test_edit_distance_join_max_dist_zero_and_validation(ray_session):
    import ray.data as rd

    from splink_ray.stages.fuzzy import edit_distance_join

    ds = rd.from_arrow(pa.table({"id": [1, 2, 3], "s": ["x", "x", "y"]}))
    got = {
        (r["id_l"], r["id_r"], r["dist"])
        for r in edit_distance_join(ds, "s", "id", max_dist=0).take_all()
    }
    assert got == {(1, 2, 0)}
    with pytest.raises(ValueError):
        edit_distance_join(ds, "s", "id", max_dist=2)


# ---------------------------------------------------------------------------
# IVF full probe == brute force
# ---------------------------------------------------------------------------


def test_ivf_full_probe_equals_brute(ray_session):
    from splink_ray.stages.ann import ivf_build, ivf_search, knn_brute_force

    emb = _rd("embeddings")
    head = emb.limit(3).to_pandas().sort_values("vec_id")
    Q = np.asarray(head.embedding.tolist(), np.float64)
    qids = head.vec_id.tolist()
    idx = ivf_build(emb, "embedding", "vec_id", n_clusters=4, seed=42)
    ivf = ivf_search(idx, Q, qids, k=5, nprobe=4).to_pandas()
    brute = knn_brute_force(emb, "embedding", "vec_id", Q, qids, k=5).to_pandas()
    key = ["query_id", "rank"]
    ivf = ivf.sort_values(key).reset_index(drop=True)
    brute = brute.sort_values(key).reset_index(drop=True)
    assert ivf[["query_id", "vec_id", "rank"]].equals(
        brute[["query_id", "vec_id", "rank"]]
    )


# ---------------------------------------------------------------------------
# hybrid RRF
# ---------------------------------------------------------------------------


def test_hybrid_rrf_math(ray_session):
    """Fusion math pinned by hand: rrf = 1/(60+r_bm25) + 1/(60+r_knn) with
    a missing list contributing 0; order on rounded rrf, id tie-break."""
    from splink_ray.stages.ann import knn_brute_force
    from splink_ray.stages.search import bm25_search, hybrid_rrf_search

    docs = _rd("documents", ["doc_id", "text"])
    emb = _rd("embeddings")
    terms = ["hash", "spark", "window"]
    qvec = np.asarray(
        emb.filter(expr="vec_id == 0").to_pandas().embedding.iloc[0], np.float64
    )
    out = hybrid_rrf_search(
        docs, emb, "text", "doc_id", terms, qvec, "embedding", "vec_id",
        k_each=10, k=5,
    ).to_pandas()
    assert len(out) == 5
    # reconstruct from the two component retrievers
    bm = bm25_search(docs, "text", "doc_id", terms, k=10).to_pandas()
    order = np.lexsort((bm.doc_id.to_numpy(), -bm.score.to_numpy()))
    bm_rank = {int(bm.doc_id.iloc[i]): r + 1 for r, i in enumerate(order)}
    kn = knn_brute_force(emb, "embedding", "vec_id", [qvec], [0], k=10).to_pandas()
    kn_rank = dict(zip(kn.vec_id.astype(int), kn["rank"].astype(int)))
    for _, row in out.iterrows():
        i = int(row.doc_id)
        exp = (1.0 / (60 + bm_rank[i]) if i in bm_rank else 0.0) + (
            1.0 / (60 + kn_rank[i]) if i in kn_rank else 0.0
        )
        assert row.rrf == np.floor(exp * 1e6 + 0.5) / 1e6
    # monotone non-increasing rrf down the list
    assert (np.diff(out.rrf.to_numpy()) <= 0).all()


# ---------------------------------------------------------------------------
# grouped top-k
# ---------------------------------------------------------------------------


def test_grouped_topk_matches_window_oracle(ray_session):
    """Local prune + exchange equals row_number() OVER (PARTITION BY ...),
    including ties broken by id; lossless under forced tiny batches."""
    import ray.data as rd

    from splink_ray.stages.stats import grouped_topk

    rng = np.random.default_rng(11)
    n = 400
    t = pa.table(
        {
            "g": pa.array(rng.integers(0, 5, n), pa.int64()),
            "v": pa.array(rng.integers(0, 20, n), pa.int64()),  # many ties
            "id": pa.array(np.arange(n), pa.int64()),
        }
    )
    ds = rd.from_arrow(t).repartition(16)  # force many small batches
    got = grouped_topk(ds, "g", "v", "id", k=3).to_pandas()
    got = got.sort_values(["g", "rank"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql(
        "SELECT g, v, id, rank FROM (SELECT g, v, id, row_number() OVER "
        "(PARTITION BY g ORDER BY v DESC, id) AS rank FROM t) "
        "WHERE rank <= 3 ORDER BY g, rank"
    ).df()
    assert got[["g", "v", "id", "rank"]].to_numpy().tolist() == exp.to_numpy().tolist()


# ---------------------------------------------------------------------------
# embedding covariance
# ---------------------------------------------------------------------------


def test_embedding_covariance_matches_numpy(ray_session):
    import ray.data as rd

    from splink_ray.kernels import round_half_away
    from splink_ray.stages.ann import embedding_covariance

    rng = np.random.default_rng(3)
    X = rng.normal(size=(97, 6))
    t = pa.table({"embedding": pa.array(list(X), pa.list_(pa.float64()))})
    out = (
        embedding_covariance(rd.from_arrow(t).repartition(7), "embedding")
        .to_pandas()
        .sort_values(["dim_i", "dim_j"])
        .reset_index(drop=True)
    )
    C = np.cov(X, rowvar=False, bias=True)  # population covariance
    iu, ju = np.triu_indices(6)
    assert len(out) == len(iu)
    np.testing.assert_allclose(
        out["cov"].to_numpy(), round_half_away(C[iu, ju], 6), atol=2e-6
    )
    # negative covariances survive the half-away rounding path
    assert (out["cov"].to_numpy() < 0).any()


# ---------------------------------------------------------------------------
# simhash dedup groups
# ---------------------------------------------------------------------------


def test_simhash_dedup_groups_closure(ray_session):
    """Groups equal the transitive closure of simhash_pairs with min-id
    labels; every doc_id gets exactly one row."""
    from splink_ray.stages.dedup import simhash_dedup, simhash_pairs

    docs = _rd("documents", ["doc_id", "text"])
    pairs = [
        (r["id_l"], r["id_r"])
        for r in simhash_pairs(docs, "text", "doc_id", max_hamming=3).take_all()
    ]
    n = docs.count()
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    exp = {i: find(i) for i in range(n)}
    got = {
        r["doc_id"]: r["dup_group_id"]
        for r in simhash_dedup(docs, "text", "doc_id", max_hamming=3).take_all()
    }
    assert got == exp
