"""Hashing / sketching primitives: content hashes, shingles, MinHash, SimHash.

Building blocks for the dedup stages (stages/dedup.py). All deterministic
(fixed hash seeds) so pipeline outputs are byte-stable across runs and
cluster layouts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_MERSENNE = (1 << 61) - 1
_RNG = np.random.default_rng(1234567)
_MAX_PERM = 256
_A = _RNG.integers(1, _MERSENNE, _MAX_PERM, dtype=np.uint64)
_B = _RNG.integers(0, _MERSENNE, _MAX_PERM, dtype=np.uint64)


def content_hash(texts) -> list[str]:
    """md5 hex of the utf-8 text — matches DuckDB ``md5()`` for SQL oracles."""
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = texts.to_pylist()
    return [hashlib.md5((t or "").encode()).hexdigest() for t in texts]


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


def _shingle_hashes(shingles: set[bytes]) -> np.ndarray:
    out = np.empty(len(shingles), np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "little")
    return out


def minhash_signature(text: str, num_perm: int = 128, k: int = 5, words: bool = False) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) over char- or word-shingles.

    Universal-hash family h_i(x) = (a_i·x + b_i) mod p with fixed seeds —
    same text ⇒ same signature everywhere."""
    sh = word_shingles(text, k) if words else char_shingles(text, k)
    h = _shingle_hashes(sh) % _MERSENNE
    a = _A[:num_perm, None]
    b = _B[:num_perm, None]
    vals = (a * h[None, :] + b) % _MERSENNE
    return vals.min(axis=1).astype(np.uint64)


def minhash_band_keys(sig: np.ndarray, bands: int) -> list[str]:
    """LSH band keys: hash of each signature band → 'band:hex'."""
    rows = len(sig) // bands
    out = []
    for b in range(bands):
        chunk = sig[b * rows : (b + 1) * rows].tobytes()
        out.append(f"{b}:{hashlib.blake2b(chunk, digest_size=8).hexdigest()}")
    return out


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def true_jaccard(a: str, b: str, k: int = 5, words: bool = False) -> float:
    sa = word_shingles(a, k) if words else char_shingles(a, k)
    sb = word_shingles(b, k) if words else char_shingles(b, k)
    u = len(sa | sb)
    return len(sa & sb) / u if u else 1.0


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (bit-vote of token hashes)."""
    tokens = (text or "").split()
    if not tokens:
        return 0
    votes = np.zeros(64, np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for t in tokens:
        h = np.uint64(
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
        )
        bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
        votes += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if votes[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_band_keys(h: int, bands: int = 4) -> list[str]:
    """Split the 64-bit simhash into ``bands`` chunks; near-dups within
    hamming distance (bands-1) share at least one chunk (pigeonhole)."""
    width = 64 // bands
    mask = (1 << width) - 1
    return [f"{b}:{(h >> (b * width)) & mask:x}" for b in range(bands)]


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
