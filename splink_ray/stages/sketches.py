"""Probabilistic-sketch PREFILTERS with EXACT final answers.

No splink analogue — first-class extras per the task brief. The pattern
shared by every operator here: a tiny sketch (Bloom bitmap, Count-Min
matrix) is built in one streaming pass, broadcast once via ``ray.put``,
and used to cheaply discard the bulk of the data BEFORE the expensive
exchange — then an exact verification pass over the survivors guarantees
the final answer is identical to the brute-force one (sketches only ever
produce false POSITIVES here, never false negatives, so verification can
never lose a row). At 100 TB the win is shuffle volume: a semi-join whose
probe side is 1000× the build side ships only the (few) Bloom survivors
through the exchange instead of every probe row; a heavy-hitters query
ships only candidate keys' partial counts instead of the full key domain.

Hash family: :func:`~.exchange.hash_values` with distinct seeds (the
xxhash family polars exposes) + Kirsch–Mitzenmacher double hashing
``h1 + i·h2`` for the k probe positions — two vectorized hash passes per
batch regardless of k.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_BLOOM_SEEDS = (101, 211)
_CMS_SEED0 = 977


def _bit_positions(keys: pa.Array, num_bits: int, num_hashes: int) -> np.ndarray:
    """(len(keys), num_hashes) uint64 probe positions via double hashing."""
    from .exchange import hash_values

    h1 = hash_values(keys, seed=_BLOOM_SEEDS[0])
    h2 = hash_values(keys, seed=_BLOOM_SEEDS[1]) | np.uint64(1)  # odd stride
    i = np.arange(num_hashes, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(num_bits)


def build_bloom(ds, key_col: str, num_bits: int = 1 << 20, num_hashes: int = 4):
    """One streaming pass → packed uint8 Bloom bitmap over ``key_col``.

    Per-batch partial bitmaps (``num_bits/8`` bytes each — row-count
    independent) are emitted one-row-per-batch and OR-folded on the driver
    via ``iter_batches``; driver work is O(batches × num_bits/8), never
    O(rows). Size ``num_bits`` ≈ 10 bits per expected DISTINCT key for a
    ~1% false-positive rate; beyond ~10⁹ distinct keys the bitmap itself
    outgrows a broadcast and a plain shuffle semi-join is the right plan
    (callers should gate on a distinct-count estimate)."""
    if num_bits % 8:
        raise ValueError("num_bits must be a multiple of 8")
    nbytes = num_bits // 8

    def _partial(t: pa.Table) -> pa.Table:
        bm = np.zeros(nbytes, np.uint8)
        k = t[key_col]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        k = pc.drop_null(pc.unique(k))
        if len(k):
            pos = _bit_positions(k, num_bits, num_hashes).ravel()
            np.bitwise_or.at(bm, (pos >> np.uint64(3)).astype(np.int64),
                             np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary(nbytes))})

    out = np.zeros(nbytes, np.uint8)
    parts = ds.map_batches(_partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow"):
        col = b["bm"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        for buf in col.to_pylist():
            out |= np.frombuffer(buf, np.uint8)
    return out


def bloom_contains(bitmap: np.ndarray, keys: pa.Array, num_hashes: int = 4):
    """Vectorized membership probe → bool numpy mask (true = maybe-member).

    Null keys probe false (a Bloom set never contains NULL — matches SQL
    ``IN`` semantics where NULL never equals anything)."""
    num_bits = len(bitmap) * 8
    pos = _bit_positions(keys, num_bits, num_hashes)
    byte = bitmap[(pos >> np.uint64(3)).astype(np.int64)]
    bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
    mask = bit.all(axis=1)
    nulls = np.asarray(pc.is_null(keys))
    if nulls.any():
        mask &= ~nulls
    return mask


def bloom_semi_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    how: str = "left_semi",
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    left_schema=None,
    right_schema=None,
    num_buckets: int | None = None,
):
    """EXACT distributed semi/anti-join with a Bloom prefilter on the probe
    side — the classic "ship a bitmap, not the table" plan for selective
    semi-joins (SQL ``WHERE k IN (SELECT …)`` / ``NOT IN``-as-``NOT
    EXISTS``).

    Plan: (1) one streaming pass over ``right`` builds a Bloom bitmap of
    its distinct keys, broadcast ONCE via ``ray.put``; (2) ``left`` streams
    through a vectorized membership gate that discards definite
    non-members (semi) — for ``left_anti`` the gate keeps only maybe-
    members for verification and definite non-members bypass the exchange
    entirely; (3) the survivors go through ONE exact
    :func:`~.joins.shuffle_join` against the right keys, which removes the
    Bloom's false positives. The result is bit-identical to the plain
    semi/anti-join; the Bloom only reduces exchange volume, by (1 − fpr) ×
    the non-matching fraction.

    Scale: at a 1000:1 probe:build ratio with 1% selectivity, step (3)
    ships ~1% of ``left`` instead of all of it. The bitmap is
    ``num_bits/8`` bytes however big the data is.
    """
    from .exchange import broadcast as bcast
    from .joins import _as_schema, shuffle_join

    if how not in ("left_semi", "left_anti"):
        raise ValueError("how must be 'left_semi' or 'left_anti'")
    rkey = right_on or on
    ls = _as_schema(left_schema if left_schema is not None else left)

    def _rkeys(t: pa.Table) -> pa.Table:
        k = t[rkey]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        return pa.table({rkey: pc.drop_null(pc.unique(k))})

    rkeys = right.map_batches(_rkeys, batch_format="pyarrow")
    bitmap = build_bloom(rkeys, rkey, num_bits=num_bits, num_hashes=num_hashes)
    ref = bcast((bitmap, num_hashes))

    if how == "left_semi":

        def _gate(t: pa.Table) -> pa.Table:
            from .blocking import _fetch_broadcast

            bm, nh = _fetch_broadcast(ref)
            return t.filter(pa.array(bloom_contains(bm, _one(t[on]), nh)))

        pre = left.map_batches(_gate, batch_format="pyarrow")
        return shuffle_join(
            pre, rkeys, on, right_on=rkey, how="left_semi",
            left_schema=ls, right_schema=pa.schema([(rkey, ls.field(on).type)]),
            num_buckets=num_buckets,
        )

    # left_anti: definite non-members (bloom says no) are provably in the
    # answer and SKIP the exchange; maybe-members verify via exact anti-join.
    # NULL left keys never match anything → they are definite non-members.
    def _split(t: pa.Table, want_maybe: bool) -> pa.Table:
        from .blocking import _fetch_broadcast

        bm, nh = _fetch_broadcast(ref)
        m = bloom_contains(bm, _one(t[on]), nh)
        return t.filter(pa.array(m if want_maybe else ~m))

    maybe = left.map_batches(lambda t: _split(t, True), batch_format="pyarrow")
    definite = left.map_batches(lambda t: _split(t, False), batch_format="pyarrow")
    verified = shuffle_join(
        maybe, rkeys, on, right_on=rkey, how="left_anti",
        left_schema=ls, right_schema=pa.schema([(rkey, ls.field(on).type)]),
        num_buckets=num_buckets,
    )
    return definite.union(verified)


def _one(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def cms_heavy_hitters(
    ds,
    key_col: str,
    min_count: int,
    depth: int = 4,
    width: int = 8192,
    num_buckets: int | None = None,
):
    """EXACT heavy hitters (``GROUP BY k HAVING COUNT(*) >= min_count``)
    with a Count-Min-Sketch candidate prefilter — the full-key-domain
    groupby never happens.

    Pass 1 builds the global d×w CMS: per-batch SPARSE partials
    ``(row, col, count)`` (≤ depth × batch-distinct rows) pre-aggregate
    through Ray's groupby into ≤ d·w cells, which the driver densifies
    (256 KB at the defaults — row-count independent). Pass 2 broadcasts the
    matrix; each batch estimates its distinct keys' GLOBAL counts
    (``min`` over the d rows — the CMS guarantee est ≥ true, so no heavy
    key is ever discarded) and emits (key, partial_count) rows ONLY for
    candidates. One key-hash exchange sums partials and applies the exact
    ``>= min_count`` filter, eliminating CMS false positives.

    Shuffle volume: candidate keys only — with width ≫ (rows/min_count)
    the CMS error ``≈ N/width`` stays below the threshold gap and the
    candidate set is close to the true heavy set. Returns (key, c).
    """
    from .exchange import broadcast as bcast
    from .exchange import hash_values, keyed_map
    from .joins import _as_schema

    key_type = _as_schema(ds).field(key_col).type
    seeds = [_CMS_SEED0 + 31 * i for i in range(depth)]

    def _partial(t: pa.Table) -> pa.Table:
        g = (
            t.select([key_col])
            .group_by([key_col], use_threads=False)
            .aggregate([([], "count_all")])
        )
        k = _one(g[key_col])
        c = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows, cols, vals = [], [], []
        for i, seed in enumerate(seeds):
            h = (hash_values(k, seed=seed) % np.uint64(width)).astype(np.int64)
            # collisions within the batch merge here (same (i, h) cell)
            cell = np.bincount(h, weights=c.astype(np.float64), minlength=width)
            nz = np.nonzero(cell)[0]
            rows.append(np.full(len(nz), i, np.int64))
            cols.append(nz)
            vals.append(cell[nz].astype(np.int64))
        return pa.table(
            {
                "r": pa.array(np.concatenate(rows), pa.int64()),
                "c": pa.array(np.concatenate(cols), pa.int64()),
                "v": pa.array(np.concatenate(vals), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    cells = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["r", "c"])
        .aggregate(Sum("v", alias_name="v"))
        .take_all()
    )
    cms = np.zeros((depth, width), np.int64)
    for row in cells:
        cms[row["r"], row["c"]] = row["v"]
    ref = bcast(cms)

    def _candidates(t: pa.Table) -> pa.Table:
        from .blocking import _fetch_broadcast

        m = _fetch_broadcast(ref)
        g = (
            t.select([key_col])
            .group_by([key_col], use_threads=False)
            .aggregate([([], "count_all")])
        )
        k = _one(g[key_col])
        est = np.full(len(g), np.iinfo(np.int64).max, np.int64)
        for i, seed in enumerate(seeds):
            h = (hash_values(k, seed=seed) % np.uint64(width)).astype(np.int64)
            est = np.minimum(est, m[i, h])
        keep = est >= min_count
        return pa.table(
            {
                key_col: k.filter(pa.array(keep)),
                "c": pc.cast(g["count_all"], pa.int64()).filter(pa.array(keep)),
            }
        )

    partials = ds.map_batches(_candidates, batch_format="pyarrow")

    def _exact(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {key_col: pa.array([], key_type), "c": pa.array([], pa.int64())}
            )
        g = t.group_by([key_col], use_threads=False).aggregate([("c", "sum")])
        tot = _one(pc.cast(g["c_sum"], pa.int64()))
        keep = pc.greater_equal(tot, min_count)
        return pa.table(
            {key_col: _one(g[key_col]).filter(keep), "c": tot.filter(keep)}
        )

    return keyed_map(partials, key_col, _exact, num_buckets=num_buckets)


def _skyline2d_table(t: pa.Table, x_col: str, y_col: str) -> pa.Table:
    """Exact 2D Pareto skyline (maximize both), fully vectorized.

    SQL semantics: row b DOMINATES a iff b.x>=a.x AND b.y>=a.y AND
    (b.x>a.x OR b.y>a.y); the skyline is the NOT EXISTS set. Coordinate
    duplicates all survive together (neither strictly dominates). Requires
    non-null coordinates (a NULL coordinate makes SQL's dominance test
    three-valued; pre-filter upstream)."""
    if len(t) == 0:
        return t
    idx = pc.sort_indices(
        t, sort_keys=[(x_col, "descending"), (y_col, "descending")]
    )
    t = t.take(idx)
    from .exchange import group_starts

    x = _one(t[x_col])
    y = _one(t[y_col]).to_numpy(zero_copy_only=False)
    starts = group_starts(x)
    lens = np.diff(np.append(starts, len(t)))
    besty = y[starts]  # max y within each equal-x run (sorted desc)
    # M[run] = max besty over runs with STRICTLY greater x (earlier runs)
    run_max = np.maximum.accumulate(besty)
    m_prev = np.concatenate([[-np.inf], run_max[:-1]])
    run_ok = besty > m_prev  # strict: equal y at greater x dominates
    keep = np.repeat(run_ok, lens) & (y == np.repeat(besty, lens))
    return t.filter(pa.array(keep))


def skyline2d(ds, x_col: str, y_col: str):
    """Distributed exact 2D Pareto skyline: per-batch local skylines
    (dominated rows never leave their batch — dominance is transitive, so
    dropping a locally-dominated row cannot change the global answer),
    then one single-partition merge over the union of local survivors.
    The merge input is bounded by Σ per-batch skyline sizes — for
    realistically-correlated data this is tiny; for a fully anti-
    correlated worst case the skyline itself is the data and no engine
    does better."""
    local = ds.map_batches(
        lambda t: _skyline2d_table(t, x_col, y_col), batch_format="pyarrow"
    )
    return local.repartition(1).map_batches(
        lambda t: _skyline2d_table(t, x_col, y_col),
        batch_format="pyarrow",
        batch_size=None,
    )
