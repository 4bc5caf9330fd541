"""Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the classic
entity-resolution candidate generator splink users pair with `block_on`:
order all records by a key, slide a window of size ``w``, and emit every
pair whose rank distance is 1..w−1. Complements the repo's hash blocking
(stages/blocking.py — equality keys) with an ORDER-based rule that catches
near-boundary records equality keys miss.

Distributed shape (no global sort materialization, no all-to-all beyond
two narrow exchanges of ``(key, id)`` rows):

1. Range-bucket each row by ``(key − min) // width`` — order-preserving,
   deterministic, and independent of partitioning (the skew contract is
   the caller's: a hot key range means a bigger bucket, never a wrong
   pair).
2. Tail pass: every batch pre-prunes to its last ``w−1`` rows per bucket,
   ONE keyed exchange reduces those to the true per-bucket tails, and the
   driver holds only ``O(num_buckets · w)`` rows — from which each
   bucket's carry-in (the last ``w−1`` rows of the global order before the
   bucket) is a prefix-concat, broadcast once via ``ray.put``.
3. Pair pass: the same narrow exchange re-buckets the rows; each bucket
   sorts locally, prepends its carry-in, and emits the ``w−1`` shifted
   zips whose RIGHT member is an in-bucket row — every global
   window pair exactly once, fully vectorized.

Oracle: self-join on ``ROW_NUMBER() OVER (ORDER BY key, id)`` rank
distance BETWEEN 1 AND w−1 (``__ray_entry__._snb_sql``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def sorted_neighborhood_pairs(
    ds,
    sort_col: str,
    id_col: str,
    window: int = 4,
    num_range_buckets: int = 64,
    num_buckets=None,
):
    """Candidate pairs ``(id_l, id_r, dist)`` for all records within
    ``window − 1`` positions of each other in the total order
    ``(sort_col, id_col)``. ``sort_col`` must be integer-valued (bucket
    ranges are value arithmetic); ``id_col`` must be unique (the
    deterministic tie-break). ``id_l`` is the earlier row in sort order."""
    from .exchange import broadcast, group_starts, keyed_map
    from .joins import _as_schema

    if window < 2:
        raise ValueError("window must be >= 2")
    w1 = window - 1
    schema = _as_schema(ds)
    id_type = schema.field(id_col).type
    key_type = schema.field(sort_col).type

    # narrow projection; two passes consume it (tails, pairs)
    proj = ds.select_columns([sort_col, id_col]).materialize()

    # deterministic order-preserving range buckets from the global span
    from ray.data.aggregate import Max, Min

    lohi = proj.aggregate(Min(sort_col), Max(sort_col))
    vmin = int(lohi[f"min({sort_col})"])
    vmax = int(lohi[f"max({sort_col})"])
    width = max(1, (vmax - vmin) // max(1, num_range_buckets) + 1)

    def _with_rb(t: pa.Table) -> pa.Table:
        v = t[sort_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        rb = np.floor_divide(
            v.cast(pa.int64()).to_numpy(zero_copy_only=False) - vmin, width
        )
        return pa.table(
            {
                "__rb": pa.array(rb, pa.int64()),
                sort_col: v,
                id_col: t[id_col],
            }
        )

    def _empty_rows() -> pa.Table:
        return pa.table(
            {
                "__rb": pa.array([], pa.int64()),
                sort_col: pa.array([], key_type),
                id_col: pa.array([], id_type),
            }
        )

    def _last_per_rb(t: pa.Table) -> pa.Table:
        """Last min(w−1, n) rows of each range bucket in (key, id) order."""
        if len(t) == 0 or "__rb" not in t.column_names:
            return _empty_rows()
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("__rb", "ascending"),
                (sort_col, "ascending"),
                (id_col, "ascending"),
            ],
        )
        t = t.take(idx)
        rb = t["__rb"]
        if isinstance(rb, pa.ChunkedArray):
            rb = rb.combine_chunks()
        starts = group_starts(rb)
        n = len(t)
        sizes = np.diff(np.append(starts, n))
        rank = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
        from_end = np.repeat(sizes, sizes) - 1 - rank
        return t.filter(pa.array(from_end < w1))

    tails_partial = proj.map_batches(
        lambda t: _last_per_rb(_with_rb(t)), batch_format="pyarrow"
    )
    # ≤ (w−1)·num_range_buckets rows leave this exchange — bounded driver pull
    tails = keyed_map(
        tails_partial, "__rb", _last_per_rb, num_buckets=num_buckets
    ).take_all()

    tails.sort(key=lambda r: (r["__rb"], r[sort_col], r[id_col]))
    carry: dict[int, tuple[list, list]] = {}
    seen_v: list = []
    seen_i: list = []
    cur = None
    for r in tails:
        b = r["__rb"]
        if b != cur:
            # carry-in for b = last w−1 global-order rows before bucket b
            carry[b] = (list(seen_v[-w1:]), list(seen_i[-w1:]))
            cur = b
        seen_v.append(r[sort_col])
        seen_i.append(r[id_col])
    carry_ref = broadcast(carry)

    def _pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_l": pa.array([], id_type),
                "id_r": pa.array([], id_type),
                "dist": pa.array([], pa.int64()),
            }
        )
        if len(t) == 0 or "__rb" not in t.column_names:
            return empty
        from .blocking import _fetch_broadcast

        cmap = _fetch_broadcast(carry_ref)
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("__rb", "ascending"),
                (sort_col, "ascending"),
                (id_col, "ascending"),
            ],
        )
        t = t.take(idx)
        rb = t["__rb"]
        if isinstance(rb, pa.ChunkedArray):
            rb = rb.combine_chunks()
        starts = group_starts(rb)
        bounds = np.append(starts, len(t))
        ids_all = t[id_col]
        if isinstance(ids_all, pa.ChunkedArray):
            ids_all = ids_all.combine_chunks()
        out_l, out_r, out_d = [], [], []
        for gi in range(len(starts)):
            lo, hi = int(bounds[gi]), int(bounds[gi + 1])
            b = int(rb[lo].as_py())
            cv, ci = cmap.get(b, ([], []))
            run = ids_all.slice(lo, hi - lo)
            ids = (
                pa.concat_arrays([pa.array(ci, id_type), run])
                if ci
                else run
            )
            ncar = len(ci)
            n = len(ids)
            for d in range(1, min(window, n)):
                right_pos = np.arange(d, n, dtype=np.int64)
                keep = right_pos >= ncar
                if not keep.any():
                    continue
                rp = right_pos[keep]
                out_l.append(ids.take(pa.array(rp - d)))
                out_r.append(ids.take(pa.array(rp)))
                out_d.append(np.full(len(rp), d, np.int64))
        if not out_l:
            return empty
        return pa.table(
            {
                "id_l": pa.concat_arrays(out_l),
                "id_r": pa.concat_arrays(out_r),
                "dist": pa.array(np.concatenate(out_d), pa.int64()),
            }
        )

    keyed = proj.map_batches(_with_rb, batch_format="pyarrow")
    return keyed_map(keyed, "__rb", _pairs, num_buckets=num_buckets)
