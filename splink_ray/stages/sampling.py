"""Deterministic sampling operators for training-data pipelines.

No splink analogue — first-class extras per the task brief. The sampling
gate is a pure per-row hash predicate, so every operator here is a
streaming ``map_batches`` with NO exchange, no driver materialization and
bit-reproducible output at any scale / partitioning: row ``k`` survives
iff ``u32(md5(CAST(k AS VARCHAR))[:8]) < rate · 2³²`` — the same md5-cut
convention the u-estimator uses (pipelines/training.py, SURVEY.md §2.8 E2).

The hash runs through the process-singleton DuckDB connection
(`duckdb_kernels.DuckKernel.md5_u32`): vectorized C++, and bit-parity with
the SQL oracles by construction (same md5, same VARCHAR key rendering).
"""

from __future__ import annotations

import numpy as np

from ..kernels import round_half_away
import pyarrow as pa

U32_SPACE = float(2**32)


def _rate_cuts(rates, default_rate: float) -> dict:
    cuts = {k: np.uint64(np.floor(r * U32_SPACE)) for k, r in rates.items()}
    cuts["*"] = np.uint64(np.floor(default_rate * U32_SPACE))
    return cuts


def hash_sample(ds, key_col: str, rate: float):
    """Deterministic Bernoulli(rate) sample keyed on ``key_col``. Same rows
    survive regardless of partitioning, ordering or cluster size — a
    resumable job re-draws the identical sample."""
    return stratified_sample(ds, key_col, rates={}, strata_col=None, default_rate=rate)


def stratified_sample(
    ds,
    key_col: str,
    rates: dict,
    strata_col: str | None = None,
    default_rate: float = 0.0,
):
    """Per-stratum deterministic sampling: keep a row iff its md5-cut falls
    below ``rates[stratum]`` (``default_rate`` for unlisted strata; with
    ``strata_col=None`` every row uses ``default_rate``).

    The per-stratum rate table is a tiny dict captured in the closure
    (strata are few by definition); the corpus side streams.

    Oracle: ``('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 8))::UBIGINT <
    CAST(floor(rate * 4294967296) AS UBIGINT)`` with a CASE over the
    strata column (``__ray_entry__._stratified_sample_sql``)."""
    cuts = _rate_cuts(rates, default_rate)

    def _keep(t: pa.Table) -> pa.Table:
        from ..duckdb_kernels import get_kernel

        h = get_kernel().md5_u32(t[key_col])
        if strata_col is None:
            thr = np.full(len(t), cuts["*"], np.uint64)
        else:
            sv = t[strata_col]
            if isinstance(sv, pa.ChunkedArray):
                sv = sv.combine_chunks()
            # few strata: dictionary-encode, map codes -> cuts once
            d = sv.dictionary_encode()
            per_code = np.fromiter(
                (cuts.get(v, cuts["*"]) for v in d.dictionary.to_pylist()),
                np.uint64,
                len(d.dictionary),
            )
            idx = d.indices.fill_null(-1).to_numpy(zero_copy_only=False)
            thr = np.where(idx >= 0, per_code[np.maximum(idx, 0)], cuts["*"])
        return t.filter(pa.array(h < thr))

    return ds.map_batches(_keep, batch_format="pyarrow")


def top_n_per_group(ds, group_col: str, n: int, order_cols, num_buckets=None):
    """Quota capping: keep at most ``n`` rows per group, ranked by
    ``order_cols`` ascending (make the last order column unique — e.g. the
    record id — for a deterministic cut). The group-by-domain cap every
    pretraining mix applies.

    One hash exchange on ``group_col`` (groups never split across buckets);
    inside each bucket the ranking is fully vectorized — one multi-key
    Arrow sort, run starts via ``group_starts``, rank = arange − repeat.

    Oracle: ``row_number() OVER (PARTITION BY g ORDER BY ...) <= n``
    (``__ray_entry__._quota_docs_sql``). Arrow and DuckDB both order
    strings bytewise, so mixed-type order keys stay parity-safe."""
    from .exchange import group_starts, keyed_map

    order_cols = list(order_cols)

    def _cap(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        idx = pa.compute.sort_indices(
            t, sort_keys=[(group_col, "ascending")]
            + [(c, "ascending") for c in order_cols]
        )
        t = t.take(idx)
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        starts = group_starts(g)
        rank = np.arange(len(t), dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, len(t)))
        )
        return t.filter(pa.array(rank < n))

    return keyed_map(ds, group_col, _cap, num_buckets=num_buckets)


def assign_shards(ds, key_col: str, num_shards: int, shard_col: str = "shard"):
    """Deterministic output sharding: ``shard = md5_u32(key) % num_shards``.
    Same row → same shard at any partitioning or cluster size, so a
    restarted job reproduces the exact shard layout (the resumable-output
    contract). Streaming, no exchange.

    Oracle: ``('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::UBIGINT %
    num_shards``."""
    if num_shards <= 0:
        raise ValueError("num_shards must be positive")

    def _assign(t: pa.Table) -> pa.Table:
        from ..duckdb_kernels import get_kernel

        h = get_kernel().md5_u32(t[key_col])
        return t.append_column(
            shard_col, pa.array((h % np.uint64(num_shards)).astype(np.int64))
        )

    return ds.map_batches(_assign, batch_format="pyarrow")


def write_sharded(ds, path: str, key_col: str, num_shards: int):
    """Write ``ds`` as hive-partitioned parquet, one directory per
    deterministic md5 shard (``shard=<i>/``). A failed run rewritten with
    the same inputs reproduces identical shard contents, so finished shard
    directories can be skipped on retry."""
    assign_shards(ds, key_col, num_shards).write_parquet(
        path, partition_cols=["shard"]
    )


def temperature_sample(
    ds, key_col: str, strata_col: str, target_total: int, alpha: float = 0.5,
):
    """Domain-mixture rebalancing (the multilingual-corpus "temperature
    sampling" shape): stratum ``s`` with ``n_s`` rows gets sampling weight
    ``w_s = n_s^alpha``; the expected sample size is ``target_total`` split
    proportionally to ``w_s``, i.e. per-stratum keep-rate
    ``min(1, target_total * (w_s / sum w) / n_s)`` — flattening the stratum
    distribution toward uniform as ``alpha`` drops below 1.

    One tiny ``groupby.count`` over the strata (pre-aggregated; strata are
    few), rates half-up-rounded to 6 decimals (pins float parity with the
    SQL oracle's identical formula), then the streaming md5-cut gate of
    :func:`stratified_sample` — no exchange over the corpus, deterministic
    at any partitioning. Oracle: counts CTE + the same rate arithmetic
    (``__ray_entry__._temperature_sample_sql``)."""
    from ray.data.aggregate import Count

    cnt = ds.groupby(strata_col).aggregate(Count(alias_name="n")).take_all()
    names = [r[strata_col] for r in cnt]
    n = np.array([r["n"] for r in cnt], np.float64)
    w = n ** alpha
    rate = np.minimum(1.0, target_total * (w / w.sum()) / n)
    rate6 = round_half_away(rate, 6)
    rates = dict(zip(names, rate6))
    return stratified_sample(ds, key_col, rates, strata_col, default_rate=0.0)


def weighted_sample(ds, key_col: str, weight_col: str, n: int):
    """Weighted sampling WITHOUT replacement via the Efraimidis–Spirakis
    A-ES reservoir scheme (Inf. Proc. Letters 97(5), 2006): each row draws
    ``k = u^(1/w)`` with ``u`` a deterministic md5-derived uniform in (0,1)
    and ``w = weight_col``; the sample is the global top-``n`` rows by
    ``k``. Heavier rows win proportionally more often, and the draw is
    bit-reproducible at any partitioning because ``u`` comes from the same
    md5-cut convention as :func:`hash_sample`.

    Distributed shape: a per-batch local top-``n`` prune (zero exchange,
    streaming) shrinks the candidate set to ≤ n rows per block; one small
    sort+limit over the pruned remainder picks the winners — at 100 TB the
    sort input is O(n · num_blocks) rows, never the corpus. The ``pow`` is
    evaluated through the process-singleton DuckDB kernel so the top-n
    boundary is bit-identical to the SQL oracle (libm pow differs by ulps
    across implementations). Rows with null or non-positive weight are
    excluded (they have zero mass). Ties broken by ``key_col`` ascending.
    """
    import pyarrow.compute as pc

    from ..duckdb_kernels import get_kernel

    def _local_topn(t: pa.Table) -> pa.Table:
        w = t[weight_col]
        mask = pc.fill_null(pc.greater(w, 0), False)
        t = t.filter(mask)
        k = get_kernel().aes_key(t[key_col], t[weight_col])
        t = t.append_column("__aes", k)
        if len(t) <= n:
            return t
        idx = pc.sort_indices(
            t, sort_keys=[("__aes", "descending"), (key_col, "ascending")]
        )
        return t.take(idx.slice(0, n))

    pruned = ds.map_batches(_local_topn, batch_format="pyarrow")
    out = pruned.sort(["__aes", key_col], descending=[True, False]).limit(n)
    return out.drop_columns(["__aes"])
