"""Keyed exchange: hash-bucket co-location without per-group dispatch.

Ray Data's ``groupby(key).map_groups(fn)`` calls ``fn`` once per *group* —
per-call overhead that dominates when groups are tiny (millions of conv_ids
or blocking keys). ``repartition(keys=...)`` co-locates cheaply but requires
the HASH_SHUFFLE strategy, which deadlocks ``map_groups`` at low CPU counts
(verified on Ray 2.49.2 local mode).

The portable pattern (ray_guide.md "Joins and lookups"): add a deterministic
coarse bucket column ``__bucket = hash(key) % B`` in ``map_batches``, then
``groupby("__bucket").map_groups(fn)`` — one call per bucket, with ``fn``
processing *all* key-groups in the bucket vectorized. B is sized from cluster
CPUs so a bucket ≈ rows/B fits a worker's heap; the shuffle key is the single
int bucket column (cheap sort exchange).

Determinism: pandas.util.hash_array (SipHash, fixed key) — stable across
processes, Python versions and PYTHONHASHSEED.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

BUCKET_COL = "__bucket"


def default_parallelism() -> int:
    try:
        import ray

        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        pass
    return 8


def default_num_buckets(num_rows_hint: int | None = None) -> int:
    """~8 buckets per CPU, bounded below for tiny data.

    Measured on the dense bench (625M pairs, 32 CPUs): 3×CPU buckets leave
    straggler tails that cost ~20% wall time; 6–8×CPU packs the heavy
    pair-group tasks far better (94.7 s → 79.1 s) and keeps per-task peak
    memory smaller. Fixed per-bucket cost stays negligible at these sizes.

    ``SPLINK_RAY_NUM_BUCKETS`` pins the count outright: a production job
    sizes partitions by DATA (so the plan is identical on an N-node and a
    4N-node cluster and only the schedule changes); the CPU-derived default
    is a convenience for interactive sessions. The scaling bench pins it so
    both parallelism legs execute the same task DAG."""
    import os

    pinned = os.environ.get("SPLINK_RAY_NUM_BUCKETS")
    if pinned:
        return max(2, int(pinned))
    b = default_parallelism() * 8
    if num_rows_hint is not None:
        b = min(b, max(1, num_rows_hint // 100 + 1))
    return max(2, b)


def hash_values(keys: pa.Array, seed: int = 42) -> np.ndarray:
    """Deterministic uint64 hash per element, fully vectorized.

    Primary path: polars' xxhash over the Arrow array — no Python-object
    boxing for strings OR numerics (the old ``np.asarray(..., dtype=object)``
    + ``pd.util.hash_array`` route boxed every element; measured 7× slower on
    2M strings). Deterministic across processes / Python versions for a
    pinned polars (seeded xxhash). Falls back to the pandas object hash if
    polars is unavailable. Nulls hash to a stable value.

    ``seed`` selects an independent hash family member (Bloom/CMS rows use
    distinct seeds; the partitioning default stays 42 everywhere else). The
    fallback path mixes the seed in with a splitmix64 step so both paths
    honor it."""
    try:
        import polars as pl

        return pl.from_arrow(keys).hash(seed=seed).to_numpy().astype(np.uint64)
    except Exception:
        vals = keys.to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(vals, dtype=object), categorize=False)
        if seed != 42:
            z = h + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            h = z ^ (z >> np.uint64(31))
        return h


def hash_bucket_array(keys: pa.Array, num_buckets: int) -> np.ndarray:
    """Deterministic int32 bucket per key value (nulls get a stable bucket;
    callers filter null keys before or after as semantics demand)."""
    return (hash_values(keys) % np.uint64(num_buckets)).astype(np.int32)


def group_starts(arr: pa.Array) -> np.ndarray:
    """Start indices of equal-value runs in a (sorted) Arrow array.

    C-level adjacent-slice ``not_equal`` — measured 117× faster than boxing
    the column to Python objects for the numpy shift-compare on 1.6M label
    strings. Null boundaries count as changes (callers filter null keys)."""
    n = len(arr)
    if n == 0:
        return np.empty(0, np.int64)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    ne = pc.fill_null(pc.not_equal(arr.slice(1), arr.slice(0, n - 1)), True)
    change = np.empty(n, bool)
    change[0] = True
    change[1:] = ne.to_numpy(zero_copy_only=False)
    return np.flatnonzero(change)


def add_bucket_column(
    ds, key_col: str, num_buckets: int, bucket_col: str = BUCKET_COL
):
    """``ds`` + deterministic bucket column derived from ``key_col``."""

    def _add(t: pa.Table) -> pa.Table:
        arr = t[key_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return t.append_column(bucket_col, pa.array(hash_bucket_array(arr, num_buckets)))

    return ds.map_batches(_add, batch_format="pyarrow")


def keyed_map(
    ds,
    key_col: str,
    fn: Callable[[pa.Table], pa.Table],
    num_buckets: int | None = None,
    drop_bucket: bool = True,
    **map_groups_kwargs,
):
    """Hash-exchange ``ds`` on ``key_col`` and run ``fn`` once per bucket.

    ``fn`` receives a ``pa.Table`` containing *every* row of each key that
    hashes to the bucket (keys are never split across buckets) and returns a
    ``pa.Table``. This is the workhorse for canonicalize and pair generation
    (SURVEY.md §3.1 Ray shape).
    """
    if num_buckets is None:
        num_buckets = default_num_buckets()
    ds = add_bucket_column(ds, key_col, num_buckets)

    if drop_bucket:
        inner = fn

        def fn_wrap(t: pa.Table) -> pa.Table:
            out = inner(t.drop_columns([BUCKET_COL]))
            return out
    else:
        fn_wrap = fn

    return ds.groupby(BUCKET_COL).map_groups(fn_wrap, batch_format="pyarrow", **map_groups_kwargs)


def broadcast(obj):
    """``ray.put`` once on the driver; workers ``ray.get`` per actor/process.

    Small-side lookup broadcast (TF tables, hot-key maps, new-records batch) —
    never re-shipped per batch (task brief / SURVEY.md §2.7 T2).
    """
    import ray

    return ray.put(obj)
