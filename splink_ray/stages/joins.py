"""Broadcast (map-side) hash join — the scale-critical join shape.

No splink analogue — a first-class engine primitive per the task brief
("broadcast small sides with ``ray.put`` + lookup inside ``map_batches``
instead of a shuffle join"). The small side ships to the object store ONCE
and every batch attaches it with a zero-copy Arrow C++ hash join — no
all-to-all exchange, no per-batch re-serialization (``ray.get`` of a plasma
object is shared-memory on a node). Use :func:`broadcast_join` whenever one
side fits comfortably in a worker heap (dimension tables, lookup maps,
centroids); fall back to ``Dataset.join`` only when both sides are huge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def broadcast_join(
    ds,
    small,
    key: str,
    right_key: str | None = None,
    how: str = "inner",
    suffix: str = "_r",
):
    """Join every batch of ``ds`` against the broadcast ``small`` table.

    ``small`` is a ``pa.Table`` (or anything with ``to_arrow()``, e.g. a
    small Dataset aggregate — materialized HERE, so only call this on
    genuinely small sides). ``how`` is ``"inner"`` or ``"left"``
    (left outer). Overlapping non-key column names on the small side get
    ``suffix`` appended. Row order within a batch is NOT preserved (hash
    join); downstream aggregation shapes don't care.
    """
    import ray

    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    if hasattr(small, "to_arrow_refs"):  # ray.data.Dataset small side
        small = pa.concat_tables(
            [ray.get(r) for r in small.to_arrow_refs()], promote_options="default"
        )
    elif hasattr(small, "to_arrow"):
        small = small.to_arrow()
    if not isinstance(small, pa.Table):
        small = pa.table(small)
    rk = right_key or key
    # rename the small side's key to the big side's key name, suffix clashes
    names = []
    for n in small.column_names:
        if n == rk:
            names.append(key)
        else:
            names.append(n + suffix if n == key or n in (key,) else n)
    small = small.rename_columns(names)
    ref = ray.put(small)
    join_type = "inner" if how == "inner" else "left outer"

    def _join(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        clashes = [
            n for n in s.column_names if n != key and n in t.column_names
        ]
        if clashes:
            s = s.rename_columns(
                [n + suffix if n in clashes else n for n in s.column_names]
            )
        return t.join(s, keys=key, join_type=join_type)

    return ds.map_batches(_join, batch_format="pyarrow")

def _pa_type(ty) -> pa.DataType:
    """Coerce a Ray Schema type entry to a pyarrow DataType. Arrow-block
    datasets already report DataTypes; pandas-block datasets report numpy
    dtypes and ``object`` (strings)."""
    if isinstance(ty, pa.DataType):
        return ty
    if ty is object or getattr(ty, "kind", None) == "O":
        return pa.string()
    return pa.from_numpy_dtype(ty)


def _as_schema(schema) -> pa.Schema:
    """Accept a pa.Schema, a list of (name, type) pairs, or a
    ``ray.data.Dataset``/``Dataset.schema()`` wrapper."""
    if isinstance(schema, pa.Schema):
        return schema
    if hasattr(schema, "schema") and not isinstance(schema, (list, tuple)):
        schema = schema.schema()  # a Dataset
    if hasattr(schema, "names") and hasattr(schema, "types"):
        return pa.schema(
            [(n, _pa_type(t)) for n, t in zip(schema.names, schema.types)]
        )
    return pa.schema(schema)


def shuffle_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    left_schema=None,
    right_schema=None,
    num_buckets: int | None = None,
    suffix: str = "_r",
):
    """Distributed equi-join as ONE sort-bucket exchange + in-bucket Arrow
    C++ joins — the hardened replacement for ``ray.data.Dataset.join`` on
    this repo's hazard class.

    Why not ``Dataset.join``: Ray 2.49's hash-shuffle join raises
    ``ArrowInvalid: No match or multiple matches for key field reference``
    when an entire shuffle partition on either side consists of the
    schema-less EMPTY blocks that ``groupby().map_groups()`` /
    ``groupby().aggregate()`` emit for empty partitions (observed killing
    ``dedup_against`` at driver parallelism, CORRECTNESS_r04). Crucially a
    schema-fixing ``map_batches`` pass CANNOT repair them: Ray routes empty
    blocks AROUND the UDF (verified in tests/test_join_hardening.py), so
    every join whose input passed through a groupby carries the hazard. The
    sort-based bucket exchange used here (:func:`~.exchange.keyed_map`)
    tolerates schema-less blocks by construction — the same pattern
    ``remove_dup_spans`` (stages/corpus.py) adopted for the same reason.

    Semantics match ``Dataset.join`` for equi-joins: ``how`` is ``"inner"``
    or ``"left_outer"``; duplicate keys produce the cross product per key;
    null keys never match (left rows with null keys survive a left_outer
    with null right columns). The right key column is dropped from the
    output (key appears once, under the LEFT name); right value columns
    that clash with left names get ``suffix``. Both sides stream; shuffle
    volume is the two projected sides, exchanged once on the key hash.

    ``left_schema`` / ``right_schema``: pass explicitly (pa.Schema or
    [(name, type)] pairs) when known — deriving via ``Dataset.schema()``
    may partially execute the plan, and on a dataset whose FIRST block is
    schema-less it would mis-infer.
    """
    from .exchange import keyed_map

    if how not in ("inner", "left_outer"):
        raise ValueError("how must be 'inner' or 'left_outer'")
    rk = right_on or on
    ls = _as_schema(left_schema if left_schema is not None else left)
    rs = _as_schema(right_schema if right_schema is not None else right)
    if on not in ls.names:
        raise ValueError(f"left key {on!r} not in left schema {ls.names}")
    if rk not in rs.names:
        raise ValueError(f"right key {rk!r} not in right schema {rs.names}")
    key_type = ls.field(on).type

    lval_names = [c for c in ls.names if c != on]
    rval_in = [c for c in rs.names if c != rk]
    rval_out = [
        (c + suffix if (c in lval_names or c == on) else c) for c in rval_in
    ]
    clash = set(lval_names) & set(rval_out)
    if clash:
        raise ValueError(f"suffixed right columns still clash: {sorted(clash)}")
    union_names = [on] + lval_names + rval_out + ["__side"]
    lval_types = [ls.field(c).type for c in lval_names]
    rval_types = [rs.field(c).type for c in rval_in]
    out_names = [on] + lval_names + rval_out

    def _cast(col, ty):
        return col if col.type == ty else col.cast(ty)

    def _prep_left(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = [_cast(t[on], key_type)]
        cols += [_cast(t[c], ty) for c, ty in zip(lval_names, lval_types)]
        cols += [pa.nulls(n, ty) for ty in rval_types]
        cols.append(pa.array(np.zeros(n, np.int8)))
        return pa.table(cols, names=union_names)

    def _prep_right(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = [_cast(t[rk], key_type)]
        cols += [pa.nulls(n, ty) for ty in lval_types]
        cols += [_cast(t[c], ty) for c, ty in zip(rval_in, rval_types)]
        cols.append(pa.array(np.ones(n, np.int8)))
        return pa.table(cols, names=union_names)

    union = left.map_batches(_prep_left, batch_format="pyarrow").union(
        right.map_batches(_prep_right, batch_format="pyarrow")
    )
    empty_out = pa.table(
        [pa.array([], key_type)]
        + [pa.array([], ty) for ty in lval_types]
        + [pa.array([], ty) for ty in rval_types],
        names=out_names,
    )
    arrow_how = "inner" if how == "inner" else "left outer"

    def _bucket_join(t: pa.Table) -> pa.Table:
        side = t["__side"]
        lt = t.filter(pc.equal(side, 0)).select([on] + lval_names)
        if len(lt) == 0:
            return empty_out
        rt = (
            t.filter(pc.equal(side, 1))
            .select([on] + rval_out)
            .rename_columns(["__rk"] + rval_out)
        )
        if len(rt) == 0:
            if how == "inner":
                return empty_out
            return pa.table(
                [lt[on]]
                + [lt[c] for c in lval_names]
                + [pa.nulls(len(lt), ty) for ty in rval_types],
                names=out_names,
            )
        j = lt.join(
            rt, keys=on, right_keys="__rk", join_type=arrow_how
        )
        return j.select(out_names)

    return keyed_map(union, on, _bucket_join, num_buckets=num_buckets)
