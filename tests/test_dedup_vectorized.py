"""Vectorized sketching kernels + scale-safe dedup defaults (round-1 verdict
findings #2/#3): batch/scalar hash consistency, LSH default routing, and
recall of the LSH-verified n-gram path."""

import numpy as np
import pyarrow as pa
import pytest

import splink_ray.functions.hashing as hashing
import splink_ray.stages.dedup as dedup


def test_minhash_batch_matches_scalar():
    texts = ["the quick brown fox", "the quick brown fax", "", "ab", "x y z w v u"]
    batch = hashing.minhash_signatures_batch(texts, num_perm=32, k=5)
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(batch[i], hashing.minhash_signature(t, 32, 5))


def test_minhash_batch_matches_scalar_words():
    texts = ["a b c d e f", "a b c", "", "one two"]
    batch = hashing.minhash_signatures_batch(texts, num_perm=16, k=3, words=True)
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(
            batch[i], hashing.minhash_signature(t, 16, 3, words=True)
        )


def test_minhash_estimates_track_true_jaccard():
    a = "the cat sat on the mat and looked out of the window at the rain falling"
    b = "the cat sat on the mat and looked out of the door at the rain falling"
    sa = hashing.minhash_signature(a, 128, 5)
    sb = hashing.minhash_signature(b, 128, 5)
    est = hashing.estimate_jaccard(sa, sb)
    true = hashing.true_jaccard(a, b, 5)
    assert abs(est - true) < 0.15
    # identical texts → identical signatures
    np.testing.assert_array_equal(sa, hashing.minhash_signature(a, 128, 5))


def test_simhash_batch_matches_scalar_and_properties():
    texts = ["alpha beta gamma delta", "alpha beta gamma delta epsilon", "", "solo"]
    batch = hashing.simhash64_batch(texts)
    for i, t in enumerate(texts):
        assert int(batch[i]) == hashing.simhash64(t)
    assert hashing.simhash64("") == 0
    # near-identical docs → small hamming distance
    d = hashing.hamming64(int(batch[0]), int(batch[1]))
    assert d <= 16


def test_popcount64_vectorized():
    xs = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF, 1 << 63], np.uint64)
    np.testing.assert_array_equal(hashing.popcount64(xs), [0, 1, 2, 64, 1])


def test_band_values_group_identical_band_rows():
    sigs = np.array(
        [[1, 2, 3, 4, 5, 6, 7, 8],
         [1, 2, 3, 4, 9, 9, 9, 9],   # same first band, different second
         [9, 9, 3, 4, 5, 6, 7, 8]],
        np.uint64,
    )
    bv = hashing.minhash_band_values(sigs, bands=2)
    assert bv[0, 0] == bv[1, 0]
    assert bv[0, 1] != bv[1, 1]
    assert bv[0, 0] != bv[2, 0]
    assert bv[0, 1] == bv[2, 1]
    # band index is mixed in: identical rows in different bands never alias
    flat = np.array([[7, 7, 7, 7]], np.uint64)
    b2 = hashing.minhash_band_values(flat, bands=2)
    assert b2[0, 0] != b2[0, 1]


def test_dedup_defaults_route_to_lsh(ray_session, monkeypatch):
    """The default (no group_col, no brute) paths must never build a single
    global bucket — they route to the LSH implementations (driver-side
    routing, so monkeypatching observes it)."""
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"doc_id": [1, 2], "text": ["a b", "a c"]}))
    called = {}

    def fake_lsh_verified(*a, **k):
        called["ngram"] = True
        return "sentinel"

    monkeypatch.setattr(dedup, "ngram_jaccard_lsh_verified", fake_lsh_verified)
    assert dedup.ngram_jaccard_pairs(ds, "text", "doc_id") == "sentinel"
    assert called["ngram"]

    # embedding: default keys by random hyperplanes, not a constant
    seen_keys = {}
    orig = hashing.random_hyperplane_signature

    def spy(vecs, n_planes, dim=None):
        seen_keys["called"] = True
        return orig(vecs, n_planes, dim)

    monkeypatch.setattr(dedup.hashing, "random_hyperplane_signature", spy)
    eds = rd.from_arrow(
        pa.table({"vec_id": [1, 2], "embedding": [[1.0, 0.0], [0.0, 1.0]]})
    )
    # building the keyed dataset happens lazily; force one batch through the
    # driver-side map by executing
    dedup.embedding_cosine_pairs(eds, "embedding", "vec_id", threshold=0.5).count()
    # NOTE: the map fn runs in a Ray worker, so the spy only proves routing
    # when local; instead assert behaviorally below.


def test_embedding_default_is_bucketed_not_all_pairs(ray_session):
    """Two orthogonal clusters: default (LSH) output must be a subset of
    brute and contain no cross-cluster pair; brute finds within-cluster
    pairs exhaustively."""
    import ray.data as rd

    rng = np.random.default_rng(5)
    a = rng.normal(0, 0.01, (10, 8)) + np.eye(8)[0]
    b = rng.normal(0, 0.01, (10, 8)) + np.eye(8)[1]
    V = np.vstack([a, b])
    ids = list(range(20))
    ds = rd.from_arrow(pa.table({"vec_id": ids, "embedding": [list(v) for v in V]}))
    brute = dedup.embedding_cosine_pairs(
        ds, "embedding", "vec_id", threshold=0.9, brute=True
    ).to_pandas()
    got_b = set(zip(brute.id_l, brute.id_r))
    assert len(got_b) == 2 * (10 * 9 // 2)  # all within-cluster pairs
    lsh = dedup.embedding_cosine_pairs(
        ds, "embedding", "vec_id", threshold=0.9, n_planes=4
    ).to_pandas()
    got_l = set(zip(lsh.id_l, lsh.id_r))
    assert got_l <= got_b
    assert len(got_l) > 0


def test_ngram_lsh_verified_recall_and_exactness(ray_session):
    """Default n-gram path: planted high-Jaccard pairs are found and carry
    the EXACT token jaccard; low-jaccard pairs are absent."""
    import ray.data as rd

    base = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten",
        "red orange yellow green blue indigo violet pink black white",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append({"doc_id": i * 2, "text": t})
        words = t.split()
        words[-1] = "CHANGED"
        rows.append({"doc_id": i * 2 + 1, "text": " ".join(words)})
    ds = rd.from_arrow(pa.table({
        "doc_id": [r["doc_id"] for r in rows],
        "text": [r["text"] for r in rows],
    }))
    out = dedup.ngram_jaccard_pairs(ds, "text", "doc_id", threshold=0.5).to_pandas()
    got = set(zip(out.id_l, out.id_r))
    # each planted pair has jaccard 9/11 ≈ 0.82
    for i in range(3):
        assert (i * 2, i * 2 + 1) in got
    for _, r in out.iterrows():
        assert r.jaccard >= 0.5
        if (r.id_l, r.id_r) in {(0, 1), (2, 3), (4, 5)}:
            assert r.jaccard == pytest.approx(9 / 11)


def test_ngram_grouped_path(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["a b c", "a b d", "a b c", "a b d"],
            "grp": ["x", "x", "y", "y"],
        }
    )
    out = dedup.ngram_jaccard_pairs(
        rd.from_arrow(t), "text", "doc_id", threshold=0.4, group_col="grp"
    ).to_pandas()
    got = set(zip(out.id_l, out.id_r))
    assert got == {(1, 2), (3, 4)}  # no cross-group comparisons


# ---------------------------------------------------------------------------
# hypothesis hardening: batch kernels == scalar references on arbitrary text
# ---------------------------------------------------------------------------

from hypothesis import given, settings as hsettings, strategies as st

_texts = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
    ),
    min_size=1,
    max_size=8,
)


@hsettings(max_examples=40, deadline=None)
@given(_texts)
def test_minhash_batch_scalar_property(texts):
    batch = hashing.minhash_signatures_batch(texts, num_perm=16, k=3)
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(batch[i], hashing.minhash_signature(t, 16, 3))


@hsettings(max_examples=40, deadline=None)
@given(_texts)
def test_simhash_batch_scalar_property(texts):
    batch = hashing.simhash64_batch(texts)
    for i, t in enumerate(texts):
        assert int(batch[i]) == hashing.simhash64(t)


@hsettings(max_examples=40, deadline=None)
@given(_texts)
def test_word_kgram_consistency_property(texts):
    """Same token sequence ⇒ same word-kgram hashes regardless of batch
    company (position independence)."""
    h_all, starts = hashing.word_kgram_hashes_batch(texts, 2)
    ends = np.append(starts[1:], len(h_all))
    for i, t in enumerate(texts):
        h_one, _ = hashing.word_kgram_hashes_batch([t], 2)
        np.testing.assert_array_equal(h_all[starts[i]:ends[i]], h_one)


def test_source_overlap_matrix(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from splink_ray.stages.dedup import source_overlap

    t = pa.table(
        {
            "text": pa.array(
                ["x", "x", "x", "y", "y", "z", "x"], pa.string()
            ),
            "source": pa.array(
                ["a", "b", "c", "a", "b", "a", "a"], pa.string()
            ),
        }
    )
    # distinct (text, source): x:{a,b,c}, y:{a,b}, z:{a}
    # pairs: x -> (a,b),(a,c),(b,c); y -> (a,b)
    out = (
        source_overlap(rd.from_arrow(t).repartition(3), "text", "source", num_buckets=4)
        .to_pandas()
        .sort_values(["source_l", "source_r"])
        .reset_index(drop=True)
    )
    assert list(out["source_l"]) == ["a", "a", "b"]
    assert list(out["source_r"]) == ["b", "c", "c"]
    assert list(out["n_shared_texts"]) == [2, 1, 1]
