"""Distributed grouped statistics.

No splink analogue — first-class extras per the task brief. Exact
per-group quantiles at corpus scale without ever shuffling raw rows: the
only exchange carries (group, value, count) HISTOGRAM rows, pre-aggregated
inside every batch. For integer-valued metrics (lengths, token counts,
scores in bounded domains) the histogram cardinality is |groups| × |value
domain| — independent of row count, which is what makes the quantile EXACT
and still scale-safe at 100 TB. (For unbounded/continuous metrics, bucket
the value first; the quantile is then exact over buckets.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def grouped_quantiles(
    ds,
    group_col: str,
    value_col: str,
    qs: tuple = (0.25, 0.5, 0.9),
    num_buckets=None,
):
    """Exact per-group discrete quantiles of an integer-valued column.

    Returns one row per group: ``group_col``, ``n`` (row count) and one
    ``q<percent>`` column per requested quantile, matching DuckDB
    ``quantile_disc`` semantics exactly: the 1-based nearest-rank element
    ``max(1, ceil(q·n))`` of the sorted values.

    Two stages: per-batch (group, value) partial counts (the ONLY rows that
    shuffle), then one hash exchange on the group; inside a bucket the
    quantile reads are vectorized over the merged histogram (sort +
    ``cumsum`` + ``searchsorted``)."""
    from .exchange import group_starts, keyed_map

    qs = tuple(float(q) for q in qs)
    if not qs or any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError("qs must be fractions in [0, 1]")

    def _partial(t: pa.Table) -> pa.Table:
        g = (
            t.select([group_col, value_col])
            .group_by([group_col, value_col], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns([group_col, value_col, "c"])

    partials = ds.map_batches(_partial, batch_format="pyarrow")

    def _quant(t: pa.Table) -> pa.Table:
        # merge batch partials, then one vectorized pass over all groups
        t = (
            t.group_by([group_col, value_col], use_threads=False)
            .aggregate([("c", "sum")])
            .rename_columns([group_col, value_col, "c"])
        )
        idx = pc.sort_indices(
            t, sort_keys=[(group_col, "ascending"), (value_col, "ascending")]
        )
        t = t.take(idx)
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        starts = group_starts(g)
        lens = np.diff(np.append(starts, len(t)))
        cnt = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = t[value_col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        cum = np.cumsum(cnt)
        base = np.concatenate([[0], cum[starts[1:] - 1]])  # total before group k
        cum_in = cum - np.repeat(base, lens)  # within-group cumulative counts
        n_per_group = cum_in[np.append(starts[1:], len(t)) - 1]
        cols: dict = {
            group_col: g.take(pa.array(starts)),
            "n": pa.array(n_per_group, pa.int64()),
        }
        for q in qs:
            # nearest-rank: max(1, ceil(q*n)), found per group by one
            # searchsorted over the within-group cumulative histogram
            ranks = np.maximum(np.ceil(q * n_per_group), 1).astype(np.int64)
            pos = np.empty(len(starts), np.int64)
            ends = np.append(starts[1:], len(t))
            for i, (s, e, r) in enumerate(zip(starts, ends, ranks)):
                pos[i] = s + np.searchsorted(cum_in[s:e], r, side="left")
            cols[f"q{int(round(q * 100))}"] = vals.take(pa.array(pos))
        return pa.table(cols)

    return keyed_map(partials, group_col, _quant, num_buckets=num_buckets)


def distinct_count_per_group(ds, group_col: str, value_col: str, num_buckets=None):
    """Exact ``count(DISTINCT value)`` per group without ever shuffling raw
    rows: each batch first locally dedups to its distinct (group, value)
    pairs; ONE hash exchange on the value column then co-locates every copy
    of a pair in exactly one bucket (pairs can never straddle buckets), so a
    per-bucket distinct-pair count per group is a globally-correct partial;
    only tiny (group, partial n) rows shuffle again for the final sum.

    Returns a Dataset (group_col, n_distinct).
    """
    from ray.data.aggregate import Sum

    from .exchange import keyed_map

    def _local_dedup(t: pa.Table) -> pa.Table:
        g = (
            t.select([group_col, value_col])
            .group_by([group_col, value_col], use_threads=False)
            .aggregate([])
        )
        return g

    pairs = ds.map_batches(_local_dedup, batch_format="pyarrow")

    def _bucket(t: pa.Table) -> pa.Table:
        t = t.group_by([group_col, value_col], use_threads=False).aggregate([])
        g = (
            t.group_by(group_col, use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns([group_col, "n_distinct"])

    partials = keyed_map(pairs, value_col, _bucket, num_buckets=num_buckets)
    return partials.groupby(group_col).aggregate(
        Sum("n_distinct", alias_name="n_distinct")
    )


def grouped_topk(
    ds, group_col: str, value_col: str, id_col: str, k: int, num_buckets=None
):
    """Top-``k`` rows per group by (``value_col`` DESC, ``id_col`` ASC) —
    the distributed equivalent of ``row_number() OVER (PARTITION BY g ORDER
    BY v DESC, id) <= k``.

    Scale shape: every batch first prunes LOCALLY to its own per-group
    top-k (sort + group-run rank, fully vectorized), so at most
    ``k × |groups in batch|`` rows reach the single group-keyed exchange;
    the identical prune inside each bucket then emits the global answer
    with a ``rank`` column. Raw rows never shuffle. The local prune is
    lossless: a row outside a batch's local top-k is dominated by k rows
    that travel with it, so it can never enter the global top-k."""
    from .exchange import group_starts, keyed_map

    def _prune(t: pa.Table, with_rank: bool) -> pa.Table:
        if len(t) == 0:
            return t.append_column("rank", pa.array([], pa.int64())) if with_rank else t
        idx = pc.sort_indices(
            t,
            sort_keys=[
                (group_col, "ascending"),
                (value_col, "descending"),
                (id_col, "ascending"),
            ],
        )
        t = t.take(idx)
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        starts = group_starts(g)
        lens = np.diff(np.append(starts, len(t)))
        rank = np.arange(len(t), dtype=np.int64) - np.repeat(starts, lens) + 1
        keep = rank <= k
        out = t.filter(pa.array(keep))
        if with_rank:
            out = out.append_column("rank", pa.array(rank[keep], pa.int64()))
        return out

    local = ds.select_columns([group_col, value_col, id_col]).map_batches(
        lambda t: _prune(t, False), batch_format="pyarrow"
    )
    return keyed_map(
        local, group_col, lambda t: _prune(t, True), num_buckets=num_buckets
    )


def rank_values(ds, value_col: str, ndigits: int = 6):
    """SQL ``rank() / dense_rank() / percent_rank() OVER (ORDER BY v)``
    over the whole dataset — distributed without ever sorting the rows.

    Scale shape (module premise): per-batch partial value counts, so the
    ONLY exchange carries (value, count) histogram rows — cardinality is
    the value DOMAIN, independent of row count (bucket continuous metrics
    first). The bounded distinct-value table is cumsum'd once on the
    driver, then broadcast via ``ray.put``; every batch attaches ranks
    with one vectorized ``pc.index_in`` gather, preserving row order.
    Semantics: rank = 1 + count of strictly-smaller non-null values (ties
    share), dense_rank = index in the sorted distinct values,
    percent_rank = (rank-1)/(N-1) rounded half-away to ``ndigits`` (0.0
    when N == 1); null values get null ranks and don't count toward N —
    matching the SQL trio over a null-free column."""
    import ray
    from ray.data.aggregate import Sum

    from ..kernels import round_half_away

    def _partial(t: pa.Table) -> pa.Table:
        v = t[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        g = (
            pa.table({"v": v.filter(pc.is_valid(v))})
            .group_by("v", use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["v", "n"])

    counts = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # distinct-value-domain sized
    )
    pdf = counts.to_pandas().dropna(subset=["v"]).sort_values("v")
    nvals = pdf["n"].to_numpy(np.int64)
    total = int(nvals.sum())
    cum = np.concatenate([[0], np.cumsum(nvals)[:-1]])
    rank = cum + 1
    pr = (
        (rank - 1) / float(total - 1)
        if total > 1
        else np.zeros(len(nvals), np.float64)
    )
    lookup_vals = pa.Array.from_pandas(pdf["v"])
    rank_arr = pa.array(rank, pa.int64())
    dense_arr = pa.array(np.arange(1, len(nvals) + 1, dtype=np.int64))
    pr_arr = pa.array(round_half_away(pr, ndigits), pa.float64())
    ref = ray.put((lookup_vals, rank_arr, dense_arr, pr_arr))

    def _attach(t: pa.Table) -> pa.Table:
        vals, rk, dn, pctr = ray.get(ref)
        v = t[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        idx = pc.index_in(v.cast(vals.type), vals)
        t = t.append_column("rank", rk.take(idx))
        t = t.append_column("dense_rank", dn.take(idx))
        return t.append_column("percent_rank", pctr.take(idx))

    return ds.map_batches(_attach, batch_format="pyarrow")


def grouped_string_agg(
    ds,
    group_col: str,
    value_col: str,
    order_cols,
    sep: str = "|",
    out_col: str = "agg",
    num_buckets=None,
):
    """SQL ``string_agg(value, sep ORDER BY order_cols) GROUP BY group`` —
    the ordered collect-and-join shape (turn sequences, event trails,
    per-entity provenance strings).

    Scale shape: ONE group-keyed exchange; in-bucket assembly is fully
    vectorized — sort by (group, *order_cols), group-run offsets, a
    zero-copy ``ListArray`` view over the sorted values, one C++
    ``binary_join`` (the same idiom the canonicalizer uses for its concat
    hash). Null values are skipped per SQL ``string_agg`` semantics;
    groups whose values are ALL null still emit a row with a null
    aggregate. Per-group output strings live in one worker — bound the
    group size upstream (chunk/truncate) for pathological groups."""
    from .exchange import group_starts, keyed_map

    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)

    def _bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    group_col: pa.array([], t.schema.field(group_col).type),
                    out_col: pa.array([], pa.string()),
                }
            )
        val = t[value_col]
        if isinstance(val, pa.ChunkedArray):
            val = val.combine_chunks()
        all_groups = pc.unique(
            t[group_col].combine_chunks()
            if isinstance(t[group_col], pa.ChunkedArray)
            else t[group_col]
        )
        tv = t.filter(pc.is_valid(val))
        if len(tv) > 0:
            idx = pc.sort_indices(
                tv,
                sort_keys=[(group_col, "ascending")]
                + [(c, "ascending") for c in order_cols],
            )
            tv = tv.take(idx)
            g = tv[group_col].combine_chunks() if isinstance(
                tv[group_col], pa.ChunkedArray
            ) else tv[group_col]
            starts = group_starts(g)
            offsets = pa.array(np.append(starts, len(tv)).astype(np.int32))
            v = tv[value_col]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            joined = pc.binary_join(
                pa.ListArray.from_arrays(offsets, v.cast(pa.string())), sep
            )
            got_groups = g.take(pa.array(starts))
        else:
            joined = pa.array([], pa.string())
            got_groups = all_groups.slice(0, 0)
        # groups with rows but zero non-null values → null aggregate
        miss_mask = pc.invert(pc.is_in(all_groups, value_set=got_groups))
        missing = all_groups.filter(miss_mask)
        out_g = pa.concat_arrays(
            [got_groups.combine_chunks() if isinstance(got_groups, pa.ChunkedArray) else got_groups,
             missing]
        )
        out_v = pa.concat_arrays(
            [joined, pa.nulls(len(missing), pa.string())]
        )
        return pa.table({group_col: out_g, out_col: out_v})

    proj = ds.select_columns([group_col, value_col] + order_cols)
    return keyed_map(proj, group_col, _bucket, num_buckets=num_buckets)
