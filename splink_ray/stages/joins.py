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

import pyarrow as pa


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
