"""Deduplication suite: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

No splink analogue — first-class training-data-pipeline operators (task
brief). Ray shapes:

- **exact** — content-hash column in ``map_batches`` → hash-exchange →
  keep min-id per hash (one shuffle of (hash, id) width).
- **MinHash-LSH** — signature per doc (stateless ``map_batches``, numpy
  universal hashing) → explode to (band_key, id, sig) rows → hash-exchange
  on band_key → within-bucket candidate pairs → signature-estimated Jaccard
  filter → pair-dedup across bands → optional connected components.
- **SimHash** — 64-bit signature → pigeonhole band keys (hamming ≤ bands−1
  guaranteed candidate) → verify exact hamming distance.
- **n-gram Jaccard / embedding cosine** — bucketed all-pairs verification
  (constant key + the blocking salting machinery at scale); LSH variants
  (`minhash` / `random hyperplane`) are the scale path, brute force is the
  small-scale oracle baseline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import hashing
from ..functions.hashing import (
    content_hash,
    estimate_jaccard,
    minhash_band_keys,
    minhash_signature,
    simhash64,
    simhash_band_keys,
)
from ..kernels import cosine_similarity, jaccard_tokens
from .exchange import keyed_map

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _pairs_in_buckets(tbl: pa.Table, key_col: str, id_col: str) -> tuple[np.ndarray, np.ndarray, pa.Table]:
    """Triangle pair indices for every key-group in a bucket table (sorted by
    (key, id) for determinism)."""
    t = tbl.sort_by([(key_col, "ascending"), (id_col, "ascending")])
    keys = np.asarray(t[key_col].to_pylist(), dtype=object)
    change = np.empty(len(keys), bool)
    if len(keys):
        change[0] = True
        change[1:] = keys[1:] != keys[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(keys))
    li, ri = [], []
    for s, e in zip(starts, ends):
        n = e - s
        if n < 2:
            continue
        a, b = np.triu_indices(n, k=1)
        li.append(a + s)
        ri.append(b + s)
    if li:
        return np.concatenate(li), np.concatenate(ri), t
    return np.array([], np.int64), np.array([], np.int64), t


def _dedupe_pair_rows(pairs_ds, id_l: str, id_r: str, num_buckets=None):
    def _first(t: pa.Table) -> pa.Table:
        key = np.asarray(t["__pk"].to_pylist(), dtype=object)
        order = np.argsort(key, kind="stable")
        t = t.take(pa.array(order))
        key = key[order]
        keep = np.empty(len(key), bool)
        if len(key):
            keep[0] = True
            keep[1:] = key[1:] != key[:-1]
        return t.filter(pa.array(keep)).drop_columns(["__pk"])

    def _key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(t[id_l], pa.string()), pc.cast(t[id_r], pa.string()), "\x1f"
        )
        return t.append_column("__pk", k)

    ds = pairs_ds.map_batches(_key, batch_format="pyarrow")
    return keyed_map(ds, "__pk", _first, num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, text_col: str, id_col: str, num_buckets=None):
    """Keep the min-id representative of each distinct text. Returns a
    Dataset with the surviving rows (all original columns)."""

    def _hash(t: pa.Table) -> pa.Table:
        return t.append_column("__h", pa.array(content_hash(t[text_col]), pa.string()))

    def _keep_first(t: pa.Table) -> pa.Table:
        t = t.sort_by([("__h", "ascending"), (id_col, "ascending")])
        h = np.asarray(t["__h"].to_pylist(), dtype=object)
        keep = np.empty(len(h), bool)
        if len(h):
            keep[0] = True
            keep[1:] = h[1:] != h[:-1]
        return t.filter(pa.array(keep)).drop_columns(["__h"])

    hashed = ds.map_batches(_hash, batch_format="pyarrow")
    return keyed_map(hashed, "__h", _keep_first, num_buckets=num_buckets)


def exact_dup_groups(ds, text_col: str, id_col: str, num_buckets=None):
    """(representative id, n_copies) per duplicated text — metrics view."""

    def _hash(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "__h": pa.array(content_hash(t[text_col]), pa.string()),
                id_col: t[id_col],
            }
        )

    def _grp(t: pa.Table) -> pa.Table:
        t = t.sort_by([("__h", "ascending"), (id_col, "ascending")])
        h = np.asarray(t["__h"].to_pylist(), dtype=object)
        ids = t[id_col]
        change = np.empty(len(h), bool)
        if len(h):
            change[0] = True
            change[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(h))
        return pa.table(
            {
                "rep_id": ids.take(pa.array(starts)),
                "n_copies": pa.array((ends - starts).astype(np.int64)),
            }
        )

    return keyed_map(ds.map_batches(_hash, batch_format="pyarrow"), "__h", _grp, num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup
# ---------------------------------------------------------------------------


class MinHashSigner:
    """Actor: signature + band keys per doc, exploded to one row per band."""

    def __init__(self, text_col: str, id_col: str, num_perm: int, bands: int, k: int, words: bool):
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.k, self.words = num_perm, bands, k, words

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        ids = t[self.id_col].to_pylist()
        band_key, out_id, sigs = [], [], []
        for i, text in enumerate(texts):
            sig = minhash_signature(text or "", self.num_perm, self.k, self.words)
            sb = sig.tobytes()
            for bk in minhash_band_keys(sig, self.bands):
                band_key.append(bk)
                out_id.append(ids[i])
                sigs.append(sb)
        return pa.table(
            {
                "band_key": pa.array(band_key, pa.string()),
                self.id_col: pa.array(out_id),
                "sig": pa.array(sigs, pa.binary()),
            }
        )


def minhash_lsh_pairs(
    ds,
    text_col: str,
    id_col: str,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    words: bool = False,
    threshold: float = 0.8,
    num_buckets=None,
    concurrency=(1, 8),
):
    """Candidate pairs with signature-estimated Jaccard ≥ threshold.

    Returns Dataset (id_l, id_r, est_jaccard), each unordered pair once."""
    exploded = ds.map_batches(
        MinHashSigner,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, num_perm=num_perm,
            bands=bands, k=shingle_k, words=words,
        ),
    )

    def _bucket_pairs(t: pa.Table) -> pa.Table:
        li, ri, ts = _pairs_in_buckets(t, "band_key", id_col)
        ids = ts[id_col]
        sigs = ts["sig"].to_pylist()
        out_l, out_r, est = [], [], []
        seen = set()
        for a, b in zip(li, ri):
            key = (a, b)
            if key in seen:
                continue
            seen.add(key)
            sa = np.frombuffer(sigs[a], np.uint64)
            sb = np.frombuffer(sigs[b], np.uint64)
            e = estimate_jaccard(sa, sb)
            if e >= threshold:
                out_l.append(a)
                out_r.append(b)
                est.append(e)
        il = ids.take(pa.array(out_l, pa.int64())) if out_l else pa.array([], ids.type)
        ir = ids.take(pa.array(out_r, pa.int64())) if out_r else pa.array([], ids.type)
        id_a = pc.min_element_wise(il, ir)
        id_b = pc.max_element_wise(il, ir)
        return pa.table(
            {"id_l": id_a, "id_r": id_b, "est_jaccard": pa.array(est, pa.float64())}
        )

    cand = keyed_map(exploded, "band_key", _bucket_pairs, num_buckets=num_buckets)
    return _dedupe_pair_rows(cand, "id_l", "id_r", num_buckets=num_buckets)


def minhash_dedup(ds, text_col: str, id_col: str, threshold: float = 0.8, **kw):
    """Full near-dup pipeline: LSH pairs → connected components → per-id
    group assignment (min id). Returns Dataset (id, dup_group_id)."""
    pairs = minhash_lsh_pairs(ds, text_col, id_col, threshold=threshold, **kw)
    from ..pipelines.clustering import cluster_pairwise_predictions_at_threshold

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "unique_id_l": pc.cast(t["id_l"], pa.string()),
                "unique_id_r": pc.cast(t["id_r"], pa.string()),
                "match_probability": pa.array(np.ones(len(t)), pa.float64()),
            }
        )

    preds = pairs.map_batches(_prep, batch_format="pyarrow")
    records = ds.map_batches(
        lambda t: pa.table({"unique_id": pc.cast(t[id_col], pa.string())}),
        batch_format="pyarrow",
    )
    clustered, _ = cluster_pairwise_predictions_at_threshold(records, preds, None)
    return clustered.rename_columns({"unique_id": str(id_col), "cluster_id": "dup_group_id"})


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


class SimHashSigner:
    def __init__(self, text_col: str, id_col: str, bands: int):
        self.text_col, self.id_col, self.bands = text_col, id_col, bands

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        ids = t[self.id_col].to_pylist()
        band_key, out_id, hashes = [], [], []
        for i, text in enumerate(texts):
            h = simhash64(text or "")
            for bk in simhash_band_keys(h, self.bands):
                band_key.append(bk)
                out_id.append(ids[i])
                hashes.append(np.int64(np.uint64(h).astype(np.int64)))
        return pa.table(
            {
                "band_key": pa.array(band_key, pa.string()),
                self.id_col: pa.array(out_id),
                "simhash": pa.array(hashes, pa.int64()),
            }
        )


def simhash_pairs(
    ds, text_col: str, id_col: str, max_hamming: int = 3, bands: int = 4,
    num_buckets=None, concurrency=(1, 8),
):
    """Pairs within hamming distance ≤ max_hamming (pigeonhole guarantees
    completeness when max_hamming ≤ bands − 1)."""
    if max_hamming > bands - 1:
        raise ValueError("bands must exceed max_hamming for completeness")
    exploded = ds.map_batches(
        SimHashSigner,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col, bands=bands),
    )

    def _bucket_pairs(t: pa.Table) -> pa.Table:
        li, ri, ts = _pairs_in_buckets(t, "band_key", id_col)
        ids = ts[id_col]
        hs = ts["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        out_l, out_r, dist = [], [], []
        seen = set()
        for a, b in zip(li, ri):
            if (a, b) in seen:
                continue
            seen.add((a, b))
            d = bin(int(hs[a]) ^ int(hs[b])).count("1")
            if d <= max_hamming:
                out_l.append(a)
                out_r.append(b)
                dist.append(d)
        il = ids.take(pa.array(out_l, pa.int64())) if out_l else pa.array([], ids.type)
        ir = ids.take(pa.array(out_r, pa.int64())) if out_r else pa.array([], ids.type)
        return pa.table(
            {
                "id_l": pc.min_element_wise(il, ir),
                "id_r": pc.max_element_wise(il, ir),
                "hamming": pa.array(dist, pa.int64()),
            }
        )

    cand = keyed_map(exploded, "band_key", _bucket_pairs, num_buckets=num_buckets)
    return _dedupe_pair_rows(cand, "id_l", "id_r", num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# n-gram token Jaccard (brute baseline) and embedding cosine
# ---------------------------------------------------------------------------


def _constant_key(ds, group_col: str | None):
    if group_col is None:

        def _k(t: pa.Table) -> pa.Table:
            return t.append_column("__g", pa.array(["1"] * len(t), pa.string()))

        return ds.map_batches(_k, batch_format="pyarrow"), "__g"
    return ds, group_col


def ngram_jaccard_pairs(
    ds, text_col: str, id_col: str, threshold: float = 0.5,
    group_col: str | None = None, num_buckets=None,
):
    """All-pairs whitespace-token Jaccard ≥ threshold, optionally within
    ``group_col`` blocks. Brute-force baseline (SQL-oracle-able); use
    minhash_lsh_pairs(words=True) as the scale path."""
    ds2, key = _constant_key(ds, group_col)

    def _bucket(t: pa.Table) -> pa.Table:
        li, ri, ts = _pairs_in_buckets(t, key, id_col)
        ids = ts[id_col]
        texts = ts[text_col].to_pylist()
        a = [texts[i] or "" for i in li]
        b = [texts[i] or "" for i in ri]
        jac = jaccard_tokens(a, b) if len(a) else np.array([])
        keep = jac >= threshold
        il = ids.take(pa.array(li[keep], pa.int64())) if keep.any() else pa.array([], ids.type)
        ir = ids.take(pa.array(ri[keep], pa.int64())) if keep.any() else pa.array([], ids.type)
        return pa.table(
            {
                "id_l": pc.min_element_wise(il, ir),
                "id_r": pc.max_element_wise(il, ir),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )

    return keyed_map(ds2, key, _bucket, num_buckets=num_buckets)


def embedding_cosine_pairs(
    ds, vec_col: str, id_col: str, threshold: float = 0.9,
    use_lsh: bool = False, n_planes: int = 12, num_buckets=None,
):
    """Near-dup pairs by embedding cosine ≥ threshold.

    ``use_lsh=True`` buckets by sign-random-projection first (scale path;
    only same-bucket pairs compared — approximate). Brute force otherwise."""

    def _key(t: pa.Table) -> pa.Table:
        if not use_lsh:
            return t.append_column("__g", pa.array(["1"] * len(t), pa.string()))
        vecs = np.asarray(t[vec_col].to_pylist(), np.float64)
        keys = hashing.random_hyperplane_signature(vecs, n_planes)
        return t.append_column("__g", pa.array([f"{k:x}" for k in keys], pa.string()))

    keyed = ds.map_batches(_key, batch_format="pyarrow")

    def _bucket(t: pa.Table) -> pa.Table:
        li, ri, ts = _pairs_in_buckets(t, "__g", id_col)
        ids = ts[id_col]
        vecs = np.asarray(ts[vec_col].to_pylist(), np.float64)
        if len(li) == 0:
            return pa.table(
                {"id_l": pa.array([], ids.type), "id_r": pa.array([], ids.type),
                 "cosine": pa.array([], pa.float64())}
            )
        cos = cosine_similarity(vecs[li], vecs[ri])
        keep = cos >= threshold
        il = ids.take(pa.array(li[keep], pa.int64()))
        ir = ids.take(pa.array(ri[keep], pa.int64()))
        return pa.table(
            {
                "id_l": pc.min_element_wise(il, ir),
                "id_r": pc.max_element_wise(il, ir),
                "cosine": pa.array(np.round(cos[keep], 12), pa.float64()),
            }
        )

    return keyed_map(keyed, "__g", _bucket, num_buckets=num_buckets)
