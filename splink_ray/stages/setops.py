"""Distributed SQL set operations over whole rows: EXCEPT / INTERSECT,
DISTINCT and ALL (multiset) variants.

No splink analogue — first-class extras per the task brief (the corpus
shapes: "new crawl minus what we already trained on, with multiplicities"
= EXCEPT ALL; "which examples appear in both snapshots" = INTERSECT). The
generic row-level sibling of the content-hash-specific
:func:`~.dedup.dedup_against`.

Plan (shared by all four ops): both sides project to the compared columns
(casting to a common schema), tag a side byte, and union; ONE exchange on
a combined row hash co-locates every copy of an identical row — sides
included — in exactly one bucket (the hash only ROUTES; equality inside
the bucket is decided on the real columns, so hash collisions cannot
mis-match). In-bucket, a single Arrow ``group_by(all columns + side)``
yields each distinct row's per-side multiplicities (n_a, n_b), from which
every variant is a pure vectorized function:

- ``except_distinct``:   rows with n_a > 0 and n_b == 0, once
- ``intersect_distinct``: rows with n_a > 0 and n_b > 0, once
- ``except_all``:        each row repeated max(n_a − n_b, 0) times
- ``intersect_all``:     each row repeated min(n_a, n_b) times

(SQL bag semantics, DuckDB/PostgreSQL ``EXCEPT ALL`` / ``INTERSECT
ALL``.) NULLs compare as equal here (SQL set ops use IS NOT DISTINCT
FROM semantics, unlike joins). Shuffle volume is the two projected
sides, once; per-batch local pre-aggregation collapses in-batch
duplicate rows before the exchange, so heavy duplication costs
(distinct-rows × sides), not raw rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SIDE = "__side"
_CNT = "__n"
_RH = "__rh"


def _set_op(a, b, columns, mode: str, num_buckets=None):
    from .exchange import hash_values, keyed_map
    from .joins import _as_schema

    sa = _as_schema(a)
    cols = list(columns) if columns is not None else list(sa.names)
    types = [sa.field(c).type for c in cols]
    out_empty = pa.table([pa.array([], ty) for ty in types], names=cols)

    def _prep(side: int):
        def _f(t: pa.Table) -> pa.Table:
            # local pre-aggregation: in-batch duplicate rows collapse to
            # (row, count) before the exchange
            sel = pa.table(
                [
                    (
                        t[c].combine_chunks()
                        if isinstance(t[c], pa.ChunkedArray)
                        else t[c]
                    ).cast(ty)
                    for c, ty in zip(cols, types)
                ],
                names=cols,
            )
            g = sel.group_by(cols, use_threads=False).aggregate(
                [([], "count_all")]
            )
            n = len(g)
            h = hash_values(
                g[cols[0]].combine_chunks()
                if isinstance(g[cols[0]], pa.ChunkedArray)
                else g[cols[0]]
            )
            for c in cols[1:]:
                arr = g[c]
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                h = h * np.uint64(1000003) ^ hash_values(arr)
            out = {c: g[c] for c in cols}
            out[_SIDE] = pa.array(np.full(n, side, np.int8))
            out[_CNT] = pc.cast(g["count_all"], pa.int64())
            out[_RH] = pa.array(h, pa.uint64())
            return pa.table(out)

        return _f

    union = a.map_batches(_prep(0), batch_format="pyarrow").union(
        b.map_batches(_prep(1), batch_format="pyarrow")
    )

    def _bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_empty
        g = t.group_by(cols + [_SIDE], use_threads=False).aggregate(
            [(_CNT, "sum")]
        )
        side = g[_SIDE].to_numpy(zero_copy_only=False)
        cnt = g[f"{_CNT}_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        # fold the two side rows of each distinct row together: re-group on
        # the row columns with per-side conditional sums
        na = np.where(side == 0, cnt, 0)
        nb = np.where(side == 1, cnt, 0)
        g2 = (
            g.drop_columns([_SIDE, f"{_CNT}_sum"])
            .append_column("__na", pa.array(na, pa.int64()))
            .append_column("__nb", pa.array(nb, pa.int64()))
            .group_by(cols, use_threads=False)
            .aggregate([("__na", "sum"), ("__nb", "sum")])
        )
        na = g2["__na_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = g2["__nb_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        if mode == "except_distinct":
            reps = ((na > 0) & (nb == 0)).astype(np.int64)
        elif mode == "intersect_distinct":
            reps = ((na > 0) & (nb > 0)).astype(np.int64)
        elif mode == "except_all":
            reps = np.maximum(na - nb, 0)
        elif mode == "intersect_all":
            reps = np.minimum(na, nb)
        else:  # pragma: no cover
            raise ValueError(mode)
        idx = np.repeat(np.arange(len(g2), dtype=np.int64), reps)
        return g2.select(cols).take(pa.array(idx))

    return keyed_map(union, _RH, _bucket, num_buckets=num_buckets)


def except_distinct(a, b, columns=None, num_buckets=None):
    """SQL ``a EXCEPT b``: distinct rows of ``a`` absent from ``b``."""
    return _set_op(a, b, columns, "except_distinct", num_buckets)


def intersect_distinct(a, b, columns=None, num_buckets=None):
    """SQL ``a INTERSECT b``: distinct rows present in both."""
    return _set_op(a, b, columns, "intersect_distinct", num_buckets)


def except_all(a, b, columns=None, num_buckets=None):
    """SQL ``a EXCEPT ALL b``: each row max(n_a − n_b, 0) times."""
    return _set_op(a, b, columns, "except_all", num_buckets)


def intersect_all(a, b, columns=None, num_buckets=None):
    """SQL ``a INTERSECT ALL b``: each row min(n_a, n_b) times."""
    return _set_op(a, b, columns, "intersect_all", num_buckets)
