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


def snapshot_diff(
    old,
    new,
    key_cols,
    compare_cols=None,
    include_unchanged: bool = False,
    num_buckets=None,
):
    """CDC-style diff of two snapshots of a keyed table: one output row
    per key with ``change`` ∈ {'added', 'removed', 'changed'} (and
    'unchanged' when ``include_unchanged``) — the "what moved between
    yesterday's crawl and today's" shape.

    Keys must be unique within each snapshot (a primary key — the usual
    CDC contract; duplicate keys raise in-bucket). Value comparison uses
    IS NOT DISTINCT FROM semantics (NULL equals NULL), per column over
    ``compare_cols`` (default: all non-key columns of ``old``).

    Plan: both sides project to key+compare columns, tag a side byte,
    union; ONE exchange on the key hash co-locates each key's (at most
    two) rows; in-bucket a single sort by (keys, side) leaves old/new
    adjacent and every classification is a vectorized run-length +
    column-equality pass. Output carries the NEW side's values for
    added/changed/unchanged and the OLD side's for removed."""
    from .exchange import hash_values, keyed_map
    from .joins import _as_schema

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    so = _as_schema(old)
    if compare_cols is None:
        compare_cols = [c for c in so.names if c not in keys]
    cols = keys + list(compare_cols)
    types = [so.field(c).type for c in cols]
    out_names = cols + ["change"]
    out_empty = pa.table(
        [pa.array([], ty) for ty in types] + [pa.array([], pa.string())],
        names=out_names,
    )

    def _prep(side: int):
        def _f(t: pa.Table) -> pa.Table:
            arrs = []
            for c, ty in zip(cols, types):
                a = t[c]
                if isinstance(a, pa.ChunkedArray):
                    a = a.combine_chunks()
                arrs.append(a if a.type == ty else a.cast(ty))
            h = hash_values(arrs[0])
            for a in arrs[1 : len(keys)]:
                h = h * np.uint64(1000003) ^ hash_values(a)
            arrs.append(pa.array(np.full(len(t), side, np.int8)))
            arrs.append(pa.array(h, pa.uint64()))
            return pa.table(arrs, names=cols + [_SIDE, _RH])

        return _f

    union = old.map_batches(_prep(0), batch_format="pyarrow").union(
        new.map_batches(_prep(1), batch_format="pyarrow")
    )

    def _not_distinct(a: pa.Array, b: pa.Array) -> np.ndarray:
        eq = pc.fill_null(pc.equal(a, b), False)
        both_null = pc.and_(pc.is_null(a), pc.is_null(b))
        return np.asarray(pc.or_(eq, both_null))

    def _bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_empty
        idx = pc.sort_indices(
            t,
            sort_keys=[(c, "ascending") for c in keys] + [(_SIDE, "ascending")],
        )
        t = t.take(idx)
        n = len(t)
        kcols = [
            t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c]
            for c in keys
        ]
        same_key = np.ones(n - 1, bool)
        for a in kcols:
            same_key &= _not_distinct(a.slice(0, n - 1), a.slice(1, n))
        change = np.empty(n, bool)
        change[0] = True
        change[1:] = ~same_key
        starts = np.nonzero(change)[0]
        lens = np.diff(np.append(starts, n))
        if (lens > 2).any():
            raise ValueError(
                "snapshot_diff requires unique keys per snapshot; "
                f"found a key with {int(lens.max())} rows"
            )
        side = t[_SIDE].to_numpy(zero_copy_only=False)
        pair = lens == 2  # sorted by side -> starts is old, starts+1 is new
        if pair.any() and (
            (side[starts[pair]] != 0) | (side[starts[pair] + 1] != 1)
        ).any():
            raise ValueError(
                "snapshot_diff requires unique keys per snapshot; "
                "found a key duplicated within one snapshot"
            )
        solo_side = side[starts]  # valid where lens == 1
        labels = np.empty(len(starts), object)
        pick = starts.copy()  # row whose values we emit
        labels[~pair & (solo_side == 0)] = "removed"
        labels[~pair & (solo_side == 1)] = "added"
        if pair.any():
            o_idx, n_idx = starts[pair], starts[pair] + 1
            equal = np.ones(int(pair.sum()), bool)
            for c in compare_cols:
                a = t[c]
                if isinstance(a, pa.ChunkedArray):
                    a = a.combine_chunks()
                equal &= _not_distinct(
                    a.take(pa.array(o_idx)), a.take(pa.array(n_idx))
                )
            labels[np.nonzero(pair)[0]] = np.where(equal, "unchanged", "changed")
            pick[pair] = n_idx  # emit NEW values for present keys
        out = t.select(cols).take(pa.array(pick))
        out = out.append_column(
            "change", pa.array(labels.astype(str), pa.string())
        )
        if not include_unchanged:
            out = out.filter(pc.not_equal(out["change"], "unchanged"))
        return out

    return keyed_map(union, _RH, _bucket, num_buckets=num_buckets)


def unpivot(
    ds,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "name",
    value_name: str = "value",
    value_type: pa.DataType | None = None,
):
    """Wide → long melt (SQL ``UNPIVOT`` / the ``UNION ALL`` of one SELECT
    per measure column): each input row emits ``len(value_cols)`` rows of
    ``(*id_cols, name, value)``. The feature-table normalization shape.

    Pure per-batch flat transform — ZERO shuffle, row order within a batch
    preserved per measure. All ``value_cols`` must share (or cast to) one
    common type; every output value is a PICKED input value (no
    arithmetic), so results are bit-exact vs a SQL engine. SQL UNPIVOT
    drops NULL measure values — matched here with one vectorized
    ``drop_null`` gate per measure slice.
    """
    def _common_type(types: list[pa.DataType]) -> pa.DataType:
        # SQL numeric promotion: identical types pass through; any float
        # in a numeric mix widens to float64; an all-integer mix to int64.
        # Arrow ``null`` (an all-null pandas-origin batch column) is a
        # wildcard — its values all drop anyway. Resolved PER BATCH, so a
        # schema-less source whose batches disagree on the promoted type
        # (one all-int batch, one float) must pass ``value_type``
        # explicitly; parquet-backed datasets have one schema and never hit
        # this.
        types = [ty for ty in set(types) if not pa.types.is_null(ty)]
        if not types:
            return pa.float64()
        if len(types) == 1:
            return types[0]
        if all(pa.types.is_integer(ty) or pa.types.is_floating(ty) for ty in types):
            if any(pa.types.is_floating(ty) for ty in types):
                return pa.float64()
            return pa.int64()
        raise ValueError(f"unpivot value_cols have incompatible types: {types}")

    def _melt(t: pa.Table) -> pa.Table:
        vt = value_type
        if vt is None:
            vt = _common_type([t.schema.field(c).type for c in value_cols])
        n = len(t)
        parts = []
        for c in value_cols:
            v = t[c]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            part = pa.table(
                [t[i] for i in id_cols]
                + [
                    pa.array(np.full(n, c, object), pa.string()),
                    v.cast(vt) if v.type != vt else v,
                ],
                names=id_cols + [var_name, value_name],
            )
            parts.append(part.filter(pc.is_valid(part[value_name])))
        return pa.concat_tables(parts)

    return ds.map_batches(_melt, batch_format="pyarrow")
