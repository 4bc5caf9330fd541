"""BPE trainer + encoder (stages/bpe.py) — hand-computed oracle on the
classic Sennrich corpus, partition invariance, and actor cache contract."""

import numpy as np
import pyarrow as pa
import pytest

from splink_ray.stages import bpe


def _sennrich_corpus():
    # the worked example of Sennrich et al. 2016 §3.2:
    # {'low':5, 'lower':2, 'newest':6, 'widest':3}
    rows = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    return pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array(rows, pa.string()),
        }
    )


def test_bpe_merges_hand_computed(ray_session):
    import ray.data as rd

    merges = bpe.train_bpe(rd.from_arrow(_sennrich_corpus()), "text", num_merges=4)
    got = list(zip(merges["left"].to_pylist(), merges["right"].to_pylist()))
    # pair counts round 1: (e,s)=9 wins (over (s,t)=9? no: s,t also 9 —
    # lexicographic tie-break picks ('e','s') < ('s','t'))
    assert got[0] == ("e", "s")
    assert got[1] == ("es", "t")
    # round 3: ('est','</w>') has 9 — beats ('l','o')=7
    assert got[2] == ("est", "</w>")
    assert got[3] == ("l", "o")


def test_bpe_pure_reference_agreement():
    # engine-independent reference: same algorithm written differently
    # (dict-of-words formulation) must agree on a random corpus
    rng = np.random.default_rng(11)
    alphabet = list("abcdef")
    words, counts = [], []
    seen = set()
    for _ in range(30):
        w = "".join(rng.choice(alphabet, size=rng.integers(2, 7)))
        if w in seen:
            continue
        seen.add(w)
        words.append(w)
        counts.append(int(rng.integers(1, 20)))

    def ref_bpe(vocab: dict, n: int):
        vocab = {tuple(w) + (bpe.END,): c for w, c in vocab.items()}
        out = []
        for _ in range(n):
            pairs = {}
            for s, c in vocab.items():
                for i in range(len(s) - 1):
                    pairs[(s[i], s[i + 1])] = pairs.get((s[i], s[i + 1]), 0) + c
            if not pairs:
                break
            m = max(pairs.values())
            if m < 2:
                break
            p = min(k for k, v in pairs.items() if v == m)
            out.append(p)
            nv = {}
            for s, c in vocab.items():
                r, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and (s[i], s[i + 1]) == p:
                        r.append(s[i] + s[i + 1])
                        i += 2
                    else:
                        r.append(s[i])
                        i += 1
                nv[tuple(r)] = nv.get(tuple(r), 0) + c
            vocab = nv
        return out

    exp = ref_bpe(dict(zip(words, counts)), 25)
    got = bpe.bpe_from_word_counts(words, counts, 25)
    assert got == exp


def test_train_bpe_partition_invariant(ray_session):
    import ray.data as rd

    t = _sennrich_corpus()
    a = bpe.train_bpe(rd.from_arrow(t), "text", num_merges=6)
    b = bpe.train_bpe(rd.from_arrow(t).repartition(7), "text", num_merges=6)
    assert a.equals(b.replace_schema_metadata(a.schema.metadata))


def test_bpe_encoder_counts(ray_session):
    import ray.data as rd

    t = _sennrich_corpus()
    merges = bpe.train_bpe(rd.from_arrow(t), "text", num_merges=4)
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["newest low", "lower unseen"], pa.string()),
        }
    )
    out = (
        bpe.bpe_token_counts(rd.from_arrow(docs), "text", "doc_id", merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # merges: (e,s) (es,t) (est,</w>) (l,o)
    # newest -> n,e,w,est</w> = 4 ; low -> lo,w,</w> = 3
    # lower -> lo,w,e,r,</w> = 5 ; unseen -> u,n,s,e,e,n,</w> = 7
    assert list(out["n_words"]) == [2, 2]
    assert list(out["n_bpe_tokens"]) == [7, 12]


def test_bpe_encoder_cache_is_per_actor():
    # encode twice through one instance: second call hits the word cache
    merges = pa.table(
        {
            "rank": pa.array([0], pa.int64()),
            "left": pa.array(["l"], pa.string()),
            "right": pa.array(["o"], pa.string()),
            "merged": pa.array(["lo"], pa.string()),
        }
    )
    enc = bpe.BPEEncoder(merges, "doc_id", "text")
    t = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["low low low"], pa.string()),
        }
    )
    enc(t)
    assert enc.cache == {"low": 3}  # lo,w,</w>
    n0 = len(enc.cache)
    enc(t)
    assert len(enc.cache) == n0


def test_train_bpe_empty_corpus(ray_session):
    import ray.data as rd

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["", ""], pa.string()),
        }
    )
    out = bpe.train_bpe(rd.from_arrow(docs).repartition(2), "text")
    assert len(out) == 0
    assert out.column_names == ["rank", "left", "right", "merged"]
