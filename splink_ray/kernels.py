"""Vectorized similarity kernels for comparison levels.

Reference semantics: splink's comparison levels delegate string similarity to
the backend engine's built-ins (DuckDB `levenshtein`, `damerau_levenshtein`,
`jaro_similarity`, `jaro_winkler_similarity`, `jaccard`); see
``splink/internals/comparison_level_library.py`` (public layout; the
/root/reference checkout is empty — SURVEY.md §0).

Two execution paths, same semantics:

- **numpy reference path** (this module): pure, dependency-free, unit-tested
  against DuckDB's C++ implementations (tests/test_kernels.py). Levenshtein
  is vectorized *across pairs* (DP loop over character positions, each step a
  numpy op over the whole pair batch). Jaro / Jaro-Winkler / Damerau use a
  tight per-pair loop — correct but slower.
- **DuckDB batch path** (``duckdb_kernels.py``): the Ray Data hot path runs
  these functions inside ``map_batches`` actors via an embedded single-thread
  DuckDB connection over the zero-copy Arrow batch — C++ vectorized, exactly
  the kernels splink's DuckDB backend executes.

All kernels take python-string sequences / numpy arrays and return numpy
arrays; nulls must be masked by the caller (levels treat null as non-match,
except NullLevel).
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int = 6) -> np.ndarray:
    """Half-away-from-zero rounding, bit-identical to DuckDB ``round(x, d)``
    (verified 0/500k mismatches at 2/6/12 decimals vs DuckDB 1.x; numpy's
    ``np.round`` is half-to-even and disagrees on ~1% of near-tie doubles).
    ALL oracle-facing float rounding must go through this helper — ADVICE r3
    flagged mixed np.round / pd.round use as a latent hash-parity flake."""
    p = 10.0 ** decimals
    x = np.asarray(x, np.float64)
    return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p


# ---------------------------------------------------------------------------
# codepoint helpers
# ---------------------------------------------------------------------------


def _codes(strs: list, max_len: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """List of str → (utf-8 byte matrix (n, L) uint8 zero-padded, lengths).

    Byte-level (not codepoint) to match DuckDB's levenshtein/jaro semantics —
    the hot-path engine and splink-DuckDB's own behavior.
    """
    n = len(strs)
    if n == 0:
        return np.zeros((0, 0), np.uint8), np.zeros(0, np.int64)
    bs = [s.encode("utf-8") for s in strs]
    if max_len is not None:
        bs = [b[:max_len] for b in bs]
    lens = np.fromiter((len(b) for b in bs), count=n, dtype=np.int64)
    L = max(int(lens.max()), 1)
    arr = np.zeros((n, L), np.uint8)
    for i, b in enumerate(bs):
        if b:
            arr[i, : len(b)] = np.frombuffer(b, np.uint8)
    return arr, lens


# ---------------------------------------------------------------------------
# Levenshtein — vectorized across the pair batch
# ---------------------------------------------------------------------------


def levenshtein(a: list, b: list, max_len: int | None = None) -> np.ndarray:
    """Edit distance per pair, vectorized across pairs.

    DP over (i, j) character positions; each cell update is a numpy op over
    all pairs at once → O(La·Lb) vector ops regardless of batch size.
    """
    n = len(a)
    out = np.zeros(n, np.int64)
    if n == 0:
        return out
    ca, la = _codes(a, max_len)
    cb, lb = _codes(b, max_len)
    La, Lb = ca.shape[1], cb.shape[1]
    prev = np.broadcast_to(np.arange(Lb + 1, dtype=np.int64), (n, Lb + 1)).copy()
    out[la == 0] = lb[la == 0]
    done = la == 0
    for i in range(1, La + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = ca[:, i - 1]
        for j in range(1, Lb + 1):
            sub = prev[:, j - 1] + (ai != cb[:, j - 1])
            np.minimum(sub, prev[:, j] + 1, out=sub)
            np.minimum(sub, cur[:, j - 1] + 1, out=sub)
            cur[:, j] = sub
        prev = cur
        hit = (~done) & (la == i)
        if hit.any():
            out[hit] = prev[hit, lb[hit]]
            done |= hit
    return out


def damerau_levenshtein(a: list, b: list, max_len: int | None = None) -> np.ndarray:
    """Unrestricted Damerau-Levenshtein (matches DuckDB: DL('CA','ABC')=2).

    Byte-level (utf-8), per-pair classic alphabet-dict algorithm;
    reference/oracle path only — the hot path uses DuckDB's C++ impl.
    """
    out = np.zeros(len(a), np.int64)
    for idx, (s1, s2) in enumerate(zip(a, b)):
        b1, b2 = s1.encode("utf-8"), s2.encode("utf-8")
        if max_len is not None:
            b1, b2 = b1[:max_len], b2[:max_len]
        out[idx] = _dl_one(b1, b2)
    return out


def _dl_one(a: bytes, b: bytes) -> int:
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxdist = la + lb
    da: dict[int, int] = {}
    d = np.zeros((la + 2, lb + 2), np.int64)
    d[0, :] = maxdist
    d[:, 0] = maxdist
    d[1, 1:] = np.arange(lb + 1)
    d[1:, 1] = np.arange(la + 1)
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1, j + 1] = min(
                d[i, j] + cost,  # substitution
                d[i + 1, j] + 1,  # insertion
                d[i, j + 1] + 1,  # deletion
                d[k, l] + (i - k - 1) + 1 + (j - l - 1),  # transposition
            )
        da[a[i - 1]] = i
    return int(d[la + 1, lb + 1])


# ---------------------------------------------------------------------------
# Jaro / Jaro-Winkler
# ---------------------------------------------------------------------------


def _jaro_one(a: bytes, b: bytes) -> float:
    # DuckDB conventions: empty-vs-anything (incl. empty-empty) → 0.0;
    # transposition count is floored to an integer (t = mismatches // 2).
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    b_used = [False] * lb
    matches_a = []
    for i, ch in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_used[j] and b[j] == ch:
                b_used[j] = True
                matches_a.append(ch)
                break
    m = len(matches_a)
    if m == 0:
        return 0.0
    matches_b = [b[j] for j in range(lb) if b_used[j]]
    t = sum(x != y for x, y in zip(matches_a, matches_b)) // 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro(a: list, b: list) -> np.ndarray:
    """Byte-level (utf-8) Jaro similarity — DuckDB semantics."""
    return np.fromiter(
        (_jaro_one(x.encode("utf-8"), y.encode("utf-8")) for x, y in zip(a, b)),
        count=len(a),
        dtype=np.float64,
    )


def jaro_winkler(a: list, b: list, prefix_weight: float = 0.1) -> np.ndarray:
    """Jaro-Winkler with p=0.1, max prefix 4 (DuckDB-compatible)."""
    out = np.empty(len(a), np.float64)
    for idx, (xs, ys) in enumerate(zip(a, b)):
        x, y = xs.encode("utf-8"), ys.encode("utf-8")
        j = _jaro_one(x, y)
        if j <= 0.7:  # DuckDB uses the classic Winkler boost threshold
            out[idx] = j
            continue
        prefix = 0
        for cx, cy in zip(x[:4], y[:4]):
            if cx != cy:
                break
            prefix += 1
        out[idx] = j + prefix * prefix_weight * (1.0 - j)
    return out


# ---------------------------------------------------------------------------
# Set similarities
# ---------------------------------------------------------------------------


def jaccard_charset(a: list, b: list) -> np.ndarray:
    """Byte-set Jaccard — DuckDB ``jaccard()`` semantics (utf-8 bytes)."""
    out = np.empty(len(a), np.float64)
    for idx, (x, y) in enumerate(zip(a, b)):
        if not x or not y:
            out[idx] = 0.0  # DuckDB errors on empty input; we define it as 0
            continue
        sx, sy = set(x.encode("utf-8")), set(y.encode("utf-8"))
        out[idx] = len(sx & sy) / len(sx | sy)
    return out


def jaccard_tokens(a: list, b: list) -> np.ndarray:
    """Whitespace-token-set Jaccard (used by text dedup levels)."""
    out = np.empty(len(a), np.float64)
    for idx, (x, y) in enumerate(zip(a, b)):
        sx, sy = set(x.split()), set(y.split())
        u = len(sx | sy)
        out[idx] = (len(sx & sy) / u) if u else 1.0
    return out


def array_intersect_size(a: list, b: list) -> np.ndarray:
    """|set(a) ∩ set(b)| per pair of python-list values (null → caller masks)."""
    out = np.zeros(len(a), np.int64)
    for idx, (x, y) in enumerate(zip(a, b)):
        if x is None or y is None:
            continue
        out[idx] = len(set(x) & set(y))
    return out


def array_subset(a: list, b: list) -> np.ndarray:
    """True when the smaller side's set ⊆ the other's (splink ArraySubsetLevel:
    non-empty smaller array fully contained)."""
    out = np.zeros(len(a), bool)
    for idx, (x, y) in enumerate(zip(a, b)):
        if x is None or y is None or (len(x) == 0 and len(y) == 0):
            continue
        sx, sy = set(x), set(y)
        small, big = (sx, sy) if len(sx) <= len(sy) else (sy, sx)
        out[idx] = len(small) > 0 and small <= big
    return out


# ---------------------------------------------------------------------------
# Numeric / geo / vector
# ---------------------------------------------------------------------------


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise cosine of two (n, d) float matrices."""
    num = np.einsum("ij,ij->i", a, b)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(den > 0, num / den, 0.0)
    return out


def haversine_km(lat1, lng1, lat2, lng2) -> np.ndarray:
    r = 6371.0
    lat1, lng1, lat2, lng2 = (np.radians(np.asarray(x, np.float64)) for x in (lat1, lng1, lat2, lng2))
    dlat = lat2 - lat1
    dlng = lng2 - lng1
    h = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlng / 2) ** 2
    return 2 * r * np.arcsin(np.sqrt(np.clip(h, 0, 1)))
