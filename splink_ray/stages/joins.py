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
    on,
    right_on=None,
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

    Semantics match ``Dataset.join`` for equi-joins: ``how`` is ``"inner"``,
    ``"left_outer"``, ``"full_outer"`` (unmatched rows of BOTH sides
    survive with nulls on the other side; key columns are coalesced under
    the LEFT names, so a right-only row carries its key value there —
    SQL ``COALESCE(l.k, r.k)``; null-key rows on either side never match
    and are emitted unmatched, like SQL), ``"left_semi"`` (left rows with
    at least one match, emitted at most once — SQL ``EXISTS``) or
    ``"left_anti"`` (left rows
    with no match — SQL ``NOT EXISTS``; null-key left rows survive, since
    null never equals anything). Semi/anti output only the LEFT columns and
    ship only the right KEY columns through the exchange (right values are
    projected away before the shuffle). For inner/left_outer, duplicate
    keys produce the cross product per key;
    null keys never match (left rows with null keys survive a left_outer
    with null right columns). ``on`` / ``right_on`` accept a single column
    name or a sequence for composite keys (multi-key exchanges co-locate on
    a combined xxhash of the key tuple; the in-bucket Arrow join matches on
    the real columns, so hash collisions cannot mis-join). The right key
    columns are dropped from the output (keys appear once, under the LEFT
    names); right value columns that clash with left names get ``suffix``.
    Both sides stream; shuffle volume is the two projected sides, exchanged
    once on the key hash.

    ``left_schema`` / ``right_schema``: pass explicitly (pa.Schema or
    [(name, type)] pairs) when known — deriving via ``Dataset.schema()``
    may partially execute the plan, and on a dataset whose FIRST block is
    schema-less it would mis-infer.
    """
    from .exchange import hash_values, keyed_map

    if how not in ("inner", "left_outer", "full_outer", "left_semi", "left_anti"):
        raise ValueError(
            "how must be 'inner', 'left_outer', 'full_outer', 'left_semi' "
            "or 'left_anti'"
        )
    filtering = how in ("left_semi", "left_anti")
    keys = [on] if isinstance(on, str) else list(on)
    if right_on is None:
        rkeys = list(keys)
    else:
        rkeys = [right_on] if isinstance(right_on, str) else list(right_on)
    if len(rkeys) != len(keys):
        raise ValueError("on and right_on must name the same number of columns")
    ls = _as_schema(left_schema if left_schema is not None else left)
    rs = _as_schema(right_schema if right_schema is not None else right)
    for k in keys:
        if k not in ls.names:
            raise ValueError(f"left key {k!r} not in left schema {ls.names}")
    for k in rkeys:
        if k not in rs.names:
            raise ValueError(f"right key {k!r} not in right schema {rs.names}")
    key_types = [ls.field(k).type for k in keys]
    multi = len(keys) > 1

    lval_names = [c for c in ls.names if c not in keys]
    rval_in = [] if filtering else [c for c in rs.names if c not in rkeys]
    rval_out = [
        (c + suffix if (c in lval_names or c in keys) else c) for c in rval_in
    ]
    clash = set(lval_names) & set(rval_out)
    if clash:
        raise ValueError(f"suffixed right columns still clash: {sorted(clash)}")
    # multi-key: co-locate on a derived combined hash ("__jk"); equal key
    # tuples always collide (same bucket), unequal collisions are resolved
    # by the in-bucket multi-column Arrow join
    exch_key = keys[0] if not multi else "__jk"
    union_names = keys + lval_names + rval_out + ["__side"] + (
        ["__jk"] if multi else []
    )
    lval_types = [ls.field(c).type for c in lval_names]
    rval_types = [rs.field(c).type for c in rval_in]
    out_names = keys + lval_names + rval_out

    def _cast(col, ty):
        return col if col.type == ty else col.cast(ty)

    def _combined_hash(cols) -> pa.Array:
        h = hash_values(cols[0])
        for c in cols[1:]:
            h = h * np.uint64(1000003) ^ hash_values(c)
        return pa.array(h, pa.uint64())

    def _prep(t: pa.Table, key_names, val_names, val_types, side: int):
        n = len(t)
        kcols = [
            _cast(
                t[k].combine_chunks() if isinstance(t[k], pa.ChunkedArray) else t[k],
                ty,
            )
            for k, ty in zip(key_names, key_types)
        ]
        cols = list(kcols)
        if side == 0:
            cols += [_cast(t[c], ty) for c, ty in zip(val_names, val_types)]
            cols += [pa.nulls(n, ty) for ty in rval_types]
        else:
            cols += [pa.nulls(n, ty) for ty in lval_types]
            cols += [_cast(t[c], ty) for c, ty in zip(val_names, val_types)]
        cols.append(pa.array(np.full(n, side, np.int8)))
        if multi:
            cols.append(_combined_hash(kcols))
        return pa.table(cols, names=union_names)

    def _prep_left(t: pa.Table) -> pa.Table:
        return _prep(t, keys, lval_names, lval_types, 0)

    def _prep_right(t: pa.Table) -> pa.Table:
        return _prep(t, rkeys, rval_in, rval_types, 1)

    union = left.map_batches(_prep_left, batch_format="pyarrow").union(
        right.map_batches(_prep_right, batch_format="pyarrow")
    )
    empty_out = pa.table(
        [pa.array([], ty) for ty in key_types]
        + [pa.array([], ty) for ty in lval_types]
        + [pa.array([], ty) for ty in rval_types],
        names=out_names,
    )
    arrow_how = {
        "inner": "inner",
        "left_outer": "left outer",
        "full_outer": "full outer",
        "left_semi": "left semi",
        "left_anti": "left anti",
    }[how]
    rk_tmp = [f"__rk{i}" for i in range(len(keys))]

    def _bucket_join(t: pa.Table) -> pa.Table:
        side = t["__side"]
        lt = t.filter(pc.equal(side, 0)).select(keys + lval_names)
        rt = (
            t.filter(pc.equal(side, 1))
            .select(keys + rval_out)
            .rename_columns(rk_tmp + rval_out)
        )
        if len(lt) == 0:
            if how == "full_outer" and len(rt) > 0:
                # right-only bucket: keys surface under the left names
                return pa.table(
                    [rt[k] for k in rk_tmp]
                    + [pa.nulls(len(rt), ty) for ty in lval_types]
                    + [rt[c] for c in rval_out],
                    names=out_names,
                )
            return empty_out
        if len(rt) == 0:
            if how in ("inner", "left_semi"):
                return empty_out
            if how == "left_anti":
                return lt.select(out_names)
            return pa.table(
                [lt[k] for k in keys]
                + [lt[c] for c in lval_names]
                + [pa.nulls(len(lt), ty) for ty in rval_types],
                names=out_names,
            )
        j = lt.join(rt, keys=keys, right_keys=rk_tmp, join_type=arrow_how)
        return j.select(out_names)

    return keyed_map(union, exch_key, _bucket_join, num_buckets=num_buckets)


def interval_join(
    left,
    right,
    on,
    left_ts: str,
    right_start: str,
    right_end: str,
    right_on=None,
    closed: str = "left",
    left_schema=None,
    right_schema=None,
    num_buckets: int | None = None,
    suffix: str = "_r",
):
    """Equi-key + time-range join (SQL ``l.key = r.key AND l.ts >= r.start
    AND l.ts < r.end``) — an operator Ray Data has no native form of.

    Built as ONE :func:`shuffle_join` exchange on the equi-key followed by a
    fused vectorized range filter, so both sides stream and shuffle volume
    is the two projected inputs exchanged once. ``closed`` is ``"left"``
    (``start <= ts < end``), ``"both"`` (``start <= ts <= end``) or
    ``"neither"`` (strict). Inner semantics: left rows matching no interval
    are dropped.

    Partitioning assumption (document per the scale brief): the per-key
    cross product of left rows × right intervals must fit a bucket worker's
    heap — true when intervals per key are bounded (sessions, campaign
    windows, order weeks). For keyless/banded range joins, pre-band the
    timestamp into the key on both sides and dedupe matches downstream.
    """
    if closed not in ("left", "both", "neither"):
        raise ValueError("closed must be 'left', 'both' or 'neither'")
    ls = _as_schema(left_schema if left_schema is not None else left)
    rs = _as_schema(right_schema if right_schema is not None else right)
    if left_ts not in ls.names:
        raise ValueError(f"left_ts {left_ts!r} not in left schema {ls.names}")
    keys = [on] if isinstance(on, str) else list(on)
    rkeys = (
        list(keys)
        if right_on is None
        else ([right_on] if isinstance(right_on, str) else list(right_on))
    )
    for c in (right_start, right_end):
        if c not in rs.names:
            raise ValueError(f"{c!r} not in right schema {rs.names}")
        if c in rkeys:
            # the equi-join drops right key columns from its output, so the
            # range filter could never see this column downstream
            raise ValueError(
                f"{c!r} is a right join key; interval bounds must be right "
                "VALUE columns (duplicate the column before joining)"
            )
    start_out = right_start + suffix if right_start in ls.names else right_start
    end_out = right_end + suffix if right_end in ls.names else right_end
    j = shuffle_join(
        left,
        right,
        on,
        right_on=right_on,
        how="inner",
        left_schema=ls,
        right_schema=rs,
        num_buckets=num_buckets,
        suffix=suffix,
    )
    ge = pc.greater_equal if closed in ("left", "both") else pc.greater
    lt_ = pc.less_equal if closed == "both" else pc.less

    def _range_filter(t: pa.Table) -> pa.Table:
        ts = t[left_ts]
        mask = pc.and_kleene(ge(ts, t[start_out]), lt_(ts, t[end_out]))
        return t.filter(pc.fill_null(mask, False))

    return j.map_batches(_range_filter, batch_format="pyarrow")
