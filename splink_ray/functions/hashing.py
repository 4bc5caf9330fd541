"""Hashing / sketching primitives: content hashes, shingles, MinHash, SimHash.

Building blocks for the dedup stages (stages/dedup.py). All deterministic
(fixed hash seeds / fixed polynomial constants) so pipeline outputs are
byte-stable across runs and cluster layouts.

Everything here is BATCH-vectorized (round-1 verdict: per-doc Python signing
dominated minhash wall time). The per-doc scalar helpers (``minhash_signature``,
``simhash64``) delegate to the batch kernels so brute-force test oracles see
identical values.

Vectorization strategy:
- char k-grams: one concatenated (zero-padded) byte buffer, a k-step
  polynomial hash over every window, murmur-style finalizer;
- word k-grams: whitespace tokens via Arrow ``utf8_split_whitespace``,
  token hashes via ``pandas.util.hash_array`` (SipHash in C, fixed key),
  fixed-k polynomial combine of consecutive token hashes;
- MinHash: universal-hash rows ``(a_i*h + b_i) mod p`` evaluated in uint64
  blocks with per-document ``np.minimum.reduceat`` segment minima;
- SimHash: per-token bit matrix + ``np.add.reduceat`` per-document votes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = np.uint64((1 << 61) - 1)
_RNG = np.random.default_rng(1234567)
_MAX_PERM = 256
_A = _RNG.integers(1, int(_MERSENNE), _MAX_PERM, dtype=np.uint64)
_B = _RNG.integers(0, int(_MERSENNE), _MAX_PERM, dtype=np.uint64)

_POLY = np.uint64(1099511628211)  # FNV-1a prime
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_POP8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def content_hash(texts) -> list[str]:
    """md5 hex of the utf-8 text — matches DuckDB ``md5()`` for SQL oracles."""
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = texts.to_pylist()
    return [hashlib.md5((t or "").encode()).hexdigest() for t in texts]


def _fmix64(h: np.ndarray) -> np.ndarray:
    """Murmur3 64-bit finalizer, vectorized (avalanches the weak polynomial)."""
    return _fmix64_inplace(h.copy())


def _fmix64_inplace(h: np.ndarray, scratch: np.ndarray | None = None) -> np.ndarray:
    t = scratch if scratch is not None and scratch.shape == h.shape else np.empty_like(h)
    np.right_shift(h, np.uint64(33), out=t)
    h ^= t
    h *= np.uint64(0xFF51AFD7ED558CCD)
    np.right_shift(h, np.uint64(33), out=t)
    h ^= t
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    np.right_shift(h, np.uint64(33), out=t)
    h ^= t
    return h


def _segment_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated (standard segmented arange)."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    cum0 = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return np.arange(total, dtype=np.int64) - np.repeat(cum0, counts)


def char_kgram_hashes_batch(texts: list, k: int) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hash of every char k-gram of every doc, concatenated.

    Returns (hashes, seg_starts) where ``seg_starts[d]`` is doc d's first
    gram index. Docs shorter than k contribute one whole-text hash (the
    scalar ``char_shingles`` contract) with the length mixed in. Every doc
    contributes ≥ 1 hash, so ``reduceat`` segments are never empty."""
    n = len(texts)
    enc = [(t or "").encode() for t in texts]
    lens = np.fromiter((len(b) for b in enc), np.int64, n)
    # k pad bytes (not k-1): an empty doc still emits one whole-doc gram
    pad = b"\x00" * k
    buf = np.frombuffer(b"".join(b + pad for b in enc), np.uint8)
    padded_lens = lens + k
    doc_starts = np.concatenate([[0], np.cumsum(padded_lens)[:-1]])

    counts = np.maximum(lens - k + 1, 1)
    seg_starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    idx = np.repeat(doc_starts, counts)
    idx += _segment_arange(counts)

    # in-place accumulation: fresh large allocations are pathologically
    # expensive here (first-touch page faults dominate wall time), so one
    # scratch gather buffer is reused across the k steps
    m = len(idx)
    acc = np.zeros(m, np.uint64)
    gather = np.empty(m, np.uint8)
    for j in range(k):
        np.multiply(acc, _POLY, out=acc)
        np.take(buf, idx, out=gather)
        np.add(acc, gather, out=acc, casting="unsafe")
        if j < k - 1:
            idx += 1
    short = np.repeat(lens < k, counts)
    if short.any():
        acc[short] ^= np.repeat(lens, counts)[short].astype(np.uint64) * _GOLDEN
    return _fmix64_inplace(acc), seg_starts


def _flat_tokens(texts) -> tuple[np.ndarray, np.ndarray]:
    """(token hashes uint64, tokens-per-doc int64) via Arrow split +
    pandas SipHash (C loop, fixed key — deterministic across processes)."""
    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(
        [t or "" for t in texts], pa.string()
    )
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "")
    toks = pc.utf8_split_whitespace(arr)
    ntok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat_arr = pc.list_flatten(toks)
    # Arrow emits empty tokens at string edges ("" → [""]); python .split()
    # does not — drop them and fix the per-doc counts
    valid = pc.greater(pc.utf8_length(flat_arr), 0).to_numpy(zero_copy_only=False)
    if not valid.all():
        seg = np.repeat(np.arange(len(ntok), dtype=np.int64), ntok)
        ntok = np.bincount(seg[valid], minlength=len(ntok)).astype(np.int64)
        flat_arr = flat_arr.filter(pa.array(valid))
    flat = flat_arr.to_numpy(zero_copy_only=False)
    th = pd.util.hash_array(np.asarray(flat, dtype=object), categorize=False)
    return th.astype(np.uint64), ntok


def word_kgram_hashes_batch(texts: list, k: int) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hash of every k-consecutive-word shingle per doc (combine of
    SipHash token hashes). Docs with ≤ k words contribute one whole-doc
    shingle; empty docs contribute the constant empty hash. Returns
    (hashes, seg_starts)."""
    th, ntok = _flat_tokens(texts)
    n = len(ntok)
    padded_lens = ntok + k  # k (not k-1): empty docs still emit one gram
    padded = np.zeros(int(padded_lens.sum()), np.uint64)
    pstarts = np.concatenate([[0], np.cumsum(padded_lens)[:-1]])
    scatter = np.repeat(pstarts, ntok) + _segment_arange(ntok)
    padded[scatter] = th

    counts = np.maximum(ntok - k + 1, 1)
    seg_starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    idx = np.repeat(pstarts, counts)
    idx += _segment_arange(counts)
    m = len(idx)
    acc = np.zeros(m, np.uint64)
    gather = np.empty(m, np.uint64)
    for j in range(k):
        np.multiply(acc, _POLY, out=acc)
        np.take(padded, idx, out=gather)
        np.add(acc, gather, out=acc)
        if j < k - 1:
            idx += 1
    short = np.repeat(ntok < k, counts)
    if short.any():
        acc[short] ^= np.repeat(ntok, counts)[short].astype(np.uint64) * _GOLDEN
    return _fmix64_inplace(acc, gather), seg_starts


def minhash_signatures_batch(
    texts, num_perm: int = 128, k: int = 5, words: bool = False,
) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures in one vectorized pass.

    Universal-hash family h_i(x) = (a_i·x + b_i) mod p with fixed seeds —
    same text ⇒ same signature everywhere. Peak scratch memory is one
    total_shingles row regardless of num_perm."""
    if num_perm > _MAX_PERM:
        raise ValueError(f"num_perm > {_MAX_PERM}")
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = texts.to_pylist()
    if len(texts) == 0:
        return np.empty((0, num_perm), np.uint64)
    h, seg_starts = (
        word_kgram_hashes_batch(texts, k) if words else char_kgram_hashes_batch(texts, k)
    )
    h %= _MERSENNE
    n = len(seg_starts)
    sig = np.empty((n, num_perm), np.uint64)
    # one reused scratch row per permutation: in-place a·h+b mod p, then a
    # segment min. (A blocked (B×N) matrix re-pays the first-touch page
    # fault cost of ~N×B×8 bytes every block — measured 10× slower here.)
    tmp = np.empty_like(h)
    for p in range(num_perm):
        np.multiply(h, _A[p], out=tmp)
        np.add(tmp, _B[p], out=tmp)
        np.mod(tmp, _MERSENNE, out=tmp)
        sig[:, p] = np.minimum.reduceat(tmp, seg_starts)
    return sig


def minhash_signature(text: str, num_perm: int = 128, k: int = 5, words: bool = False) -> np.ndarray:
    """Single-doc MinHash signature (delegates to the batch kernel so scalar
    and batch values are identical)."""
    return minhash_signatures_batch([text], num_perm, k, words)[0]


def minhash_band_values(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) int64 LSH band keys: polynomial combine of each band's
    signature rows (band index seeds the accumulator so bands never alias)."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    out = np.empty((n, bands), np.uint64)
    for b in range(bands):
        acc = np.full(n, np.uint64(b + 1))
        for j in range(rows):
            acc = acc * _POLY + sigs[:, b * rows + j]
        out[:, b] = _fmix64(acc)
    return out.view(np.int64)


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def char_shingles(text: str, k: int = 5) -> set[bytes]:
    b = (text or "").encode()
    if len(b) <= k:
        return {b}
    return {b[i : i + k] for i in range(len(b) - k + 1)}


def word_shingles(text: str, k: int = 3) -> set[bytes]:
    words = (text or "").split()
    if len(words) <= k:
        return {" ".join(words).encode()}
    return {" ".join(words[i : i + k]).encode() for i in range(len(words) - k + 1)}


def true_jaccard(a: str, b: str, k: int = 5, words: bool = False) -> float:
    sa = word_shingles(a, k) if words else char_shingles(a, k)
    sb = word_shingles(b, k) if words else char_shingles(b, k)
    u = len(sa | sb)
    return len(sa & sb) / u if u else 1.0


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash64_batch(texts) -> np.ndarray:
    """uint64 SimHash per doc: per-token 64-bit SipHash, per-document bit
    votes via one ``np.add.reduceat``. Empty docs hash to 0."""
    th, ntok = _flat_tokens(texts)
    n = len(ntok)
    out = np.zeros(n, np.uint64)
    nonempty = ntok > 0
    if not nonempty.any():
        return out
    seg_starts = np.concatenate([[0], np.cumsum(ntok)[:-1]])
    # reduceat needs non-empty segments: run it on non-empty docs only
    ne_starts = seg_starts[nonempty].astype(np.int64)
    tot = ntok[nonempty]
    sim = np.zeros(int(nonempty.sum()), np.uint64)
    # per-bit scratch column keeps peak memory at O(total_tokens); in-place
    # shifts avoid 64 fresh allocations (first-touch faults dominate here)
    bitcol = np.empty_like(th)
    tot_u = tot.astype(np.uint64)
    for b in range(64):
        np.right_shift(th, np.uint64(b), out=bitcol)
        np.bitwise_and(bitcol, np.uint64(1), out=bitcol)
        ones = np.add.reduceat(bitcol, ne_starts)
        sim |= (2 * ones > tot_u).astype(np.uint64) << np.uint64(b)
    out[nonempty] = sim
    return out


def simhash64(text: str) -> int:
    """Single-doc SimHash (delegates to the batch kernel)."""
    return int(simhash64_batch([text])[0])


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (byte-table lookup)."""
    x = np.ascontiguousarray(x, np.uint64)
    return _POP8[x.view(np.uint8).reshape(-1, 8)].sum(axis=1).astype(np.int64)


def simhash_band_values(hs: np.ndarray, bands: int = 4) -> np.ndarray:
    """(n, bands) int64 pigeonhole band keys: near-dups within hamming
    distance (bands−1) share at least one 64/bands-bit chunk."""
    hs = np.ascontiguousarray(hs, np.uint64)
    width = np.uint64(64 // bands)
    mask = (np.uint64(1) << width) - np.uint64(1)
    out = np.empty((len(hs), bands), np.uint64)
    for b in range(bands):
        chunk = (hs >> (np.uint64(b) * width)) & mask
        out[:, b] = (np.uint64(b + 1) << np.uint64(56)) | chunk
    return out.view(np.int64)


def random_hyperplane_signature(vecs: np.ndarray, n_planes: int = 16, dim: int | None = None) -> np.ndarray:
    """Sign-random-projection LSH for embeddings (cosine): (n, n_planes) bits
    packed into uint32 keys. Fixed-seed planes."""
    d = vecs.shape[1] if dim is None else dim
    planes = np.random.default_rng(987654).normal(size=(d, n_planes))
    bits = (vecs @ planes) > 0
    keys = np.zeros(len(vecs), np.uint32)
    for i in range(n_planes):
        keys |= bits[:, i].astype(np.uint32) << i
    return keys
