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
    interpolated: bool = False,
):
    """Exact per-group discrete quantiles of an integer-valued column.

    Returns one row per group: ``group_col``, ``n`` (row count) and one
    ``q<percent>`` column per requested quantile, matching DuckDB
    ``quantile_disc`` semantics exactly: the 1-based nearest-rank element
    ``max(1, ceil(q·n))`` of the sorted values.

    ``interpolated=True`` switches to ``quantile_cont``/``percentile_cont``
    semantics: with ``h = (n-1)·q``, the result is the linear interpolation
    ``x_k + (x_{k+1} - x_k)·(h - k)`` between the 0-based sorted elements
    ``k = ⌊h⌋`` and ``k+1`` — still read straight off the merged histogram
    (two searchsorted rank probes per group), still one tiny exchange. The
    interpolation arithmetic is plain double ops on exact integers, so it
    agrees with a SQL engine to ulp noise (round before hash-comparing).

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
        ends = np.append(starts[1:], len(t))

        def _rank_positions(ranks: np.ndarray) -> np.ndarray:
            pos = np.empty(len(starts), np.int64)
            for i, (s, e, r) in enumerate(zip(starts, ends, ranks)):
                pos[i] = s + np.searchsorted(cum_in[s:e], r, side="left")
            return pos

        for q in qs:
            name = f"q{int(round(q * 100))}"
            if not interpolated:
                # nearest-rank: max(1, ceil(q*n)), found per group by one
                # searchsorted over the within-group cumulative histogram
                ranks = np.maximum(np.ceil(q * n_per_group), 1).astype(np.int64)
                cols[name] = vals.take(pa.array(_rank_positions(ranks)))
            else:
                h = (n_per_group - 1).astype(np.float64) * q
                k = np.floor(h).astype(np.int64)
                f = h - k
                lo = vals.take(pa.array(_rank_positions(k + 1))).to_numpy(
                    zero_copy_only=False
                ).astype(np.float64)
                hi = vals.take(
                    pa.array(_rank_positions(np.minimum(k + 2, n_per_group)))
                ).to_numpy(zero_copy_only=False).astype(np.float64)
                cols[name] = pa.array(lo + (hi - lo) * f, pa.float64())
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
    ds, group_col: str, value_col: str, id_col: str, k: int,
    num_buckets=None, ascending: bool = False,
):
    """Top-``k`` rows per group by (``value_col`` DESC, ``id_col`` ASC) —
    the distributed equivalent of ``row_number() OVER (PARTITION BY g ORDER
    BY v DESC, id) <= k``. ``ascending=True`` flips the value order (BOTTOM-k
    — e.g. smallest-hash deterministic per-group sampling).

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
                (value_col, "ascending" if ascending else "descending"),
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


def rank_values(ds, value_col: str, ndigits: int = 6, include_cume: bool = False):
    """SQL ``rank() / dense_rank() / percent_rank() OVER (ORDER BY v)``
    over the whole dataset — distributed without ever sorting the rows.
    ``include_cume=True`` adds ``cume_dist`` (rows with value ≤ v, peers
    included, over total — NaN/NULL peer groups last, so null cume is 1.0)
    from the same cumulative histogram; opt-in so existing consumers keep
    their output schema.

    Scale shape (module premise): per-batch partial value counts, so the
    ONLY exchange carries (value, count) histogram rows — cardinality is
    the value DOMAIN, independent of row count (bucket continuous metrics
    first). The bounded distinct-value table is cumsum'd once on the
    driver, then broadcast via ``ray.put``; every batch attaches ranks
    with one vectorized ``pc.index_in`` gather, preserving row order.
    Semantics: rank = 1 + count of strictly-smaller non-null values (ties
    share), dense_rank = index in the sorted distinct values,
    percent_rank = (rank-1)/(N-1) rounded half-away to ``ndigits`` (0.0
    when N == 1). Ordering is exactly DuckDB's default ``ORDER BY``:
    values < NaN < NULL — NaN and NULL are real ranked groups counted
    toward N (``NULLS LAST``). They ride the exchange as an explicit
    kind-flag column with the value zeroed, because Ray's distributed
    groupby silently drops NaN (and sometimes null) keys on 2.49. Note
    the input lineage executes twice (the histogram pass and the attach
    pass) — checkpoint/materialize upstream first when it is more than a
    column-pruned scan."""
    import ray
    from ray.data.aggregate import Sum

    from ..kernels import round_half_away

    def _neutral(ty: pa.DataType) -> pa.Scalar:
        if pa.types.is_string(ty) or pa.types.is_large_string(ty):
            return pa.scalar("", ty)
        if pa.types.is_binary(ty) or pa.types.is_large_binary(ty):
            return pa.scalar(b"", ty)
        if pa.types.is_boolean(ty):
            return pa.scalar(False, ty)
        return pa.scalar(0, ty)  # numeric / temporal

    def _kinds(v: pa.Array):
        """kind: 0 = plain value, 1 = NaN, 2 = NULL; v replaced with a
        typed neutral for 1/2 so every exchange key is non-null non-NaN."""
        isnull = pc.is_null(v)
        if pa.types.is_floating(v.type):
            isnan = pc.and_kleene(pc.is_valid(v), pc.is_nan(v))
            isnan = pc.fill_null(isnan, False)
        else:
            isnan = pa.array(np.zeros(len(v), bool))
        kind = pc.add(
            pc.cast(isnan, pa.int8()),
            pc.multiply(pc.cast(isnull, pa.int8()), pa.scalar(2, pa.int8())),
        )
        zero = _neutral(v.type)
        vz = pc.if_else(pc.or_kleene(isnan, isnull), zero, v)
        return pc.fill_null(vz, zero), kind

    def _partial(t: pa.Table) -> pa.Table:
        v = t[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vz, kind = _kinds(v)
        g = (
            pa.table({"v": vz, "kind": kind})
            .group_by(["v", "kind"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["v", "kind", "n"])

    counts = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["v", "kind"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # distinct-value-domain sized
    )
    tbl = pa.concat_tables(
        [ray.get(r) for r in counts.to_arrow_refs()], promote_options="default"
    )
    v = tbl["v"].combine_chunks()
    n = tbl["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    kind = tbl["kind"].to_numpy(zero_copy_only=False).astype(np.int8)
    nan_total = int(n[kind == 1].sum())
    null_total = int(n[kind == 2].sum())
    vk = v.filter(pa.array(kind == 0))
    order = pc.sort_indices(vk)
    vk = vk.take(order)
    nvals = n[kind == 0][order.to_numpy(zero_copy_only=False)]
    plain_sum = int(nvals.sum())
    total = plain_sum + nan_total + null_total
    cum = np.concatenate([[0], np.cumsum(nvals)[:-1]])
    rank = cum + 1
    dense = np.arange(1, len(nvals) + 1, dtype=np.int64)
    if nan_total:  # one merged NaN entry, after all plain values
        vk = pa.concat_arrays([vk, pa.array([float("nan")], vk.type)])
        rank = np.append(rank, plain_sum + 1)
        dense = np.append(dense, dense[-1] + 1 if len(dense) else 1)
    # NULLS LAST: one null entry after NaN, applied via is_null fill (a
    # null probe can't match through index_in)
    null_entry = None
    if null_total:
        null_rank = plain_sum + nan_total + 1
        null_dense = (dense[-1] + 1) if len(dense) else 1
        rank = np.append(rank, null_rank)
        dense = np.append(dense, null_dense)
        null_entry = True
    pr = (
        (rank - 1) / float(total - 1)
        if total > 1
        else np.zeros(len(rank), np.float64)
    )
    pr = round_half_away(pr, ndigits)
    # cume_dist = rows ≤ v (peers included) / total, from the same
    # cumulative histogram: plain entries (cum + n)/total, the NaN peer
    # group ends at plain_sum + nan_total, the NULL group at total (1.0)
    denom = float(max(total, 1))
    cume = (cum + nvals) / denom
    if nan_total:
        cume = np.append(cume, (plain_sum + nan_total) / denom)
    if null_total:
        cume = np.append(cume, 1.0)
    cume = round_half_away(cume, ndigits)
    if null_entry:
        null_scalars = (
            int(rank[-1]), int(dense[-1]), float(pr[-1]), float(cume[-1])
        )
        rank, dense, pr, cume = rank[:-1], dense[:-1], pr[:-1], cume[:-1]
    else:
        null_scalars = None
    ref = ray.put(
        (
            vk,
            pa.array(rank, pa.int64()),
            pa.array(dense, pa.int64()),
            pa.array(pr, pa.float64()),
            pa.array(cume, pa.float64()),
            null_scalars,
        )
    )

    def _attach(t: pa.Table) -> pa.Table:
        vals, rk, dn, pctr, cm, nulls = ray.get(ref)
        v = t[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        idx = pc.index_in(v.cast(vals.type), vals)
        cols = [rk.take(idx), dn.take(idx), pctr.take(idx)]
        names = ["rank", "dense_rank", "percent_rank"]
        if include_cume:
            cols.append(cm.take(idx))
            names.append("cume_dist")
        if nulls is not None:
            isnull = pc.is_null(v)
            fills = [
                pa.scalar(nulls[0], pa.int64()),
                pa.scalar(nulls[1], pa.int64()),
                pa.scalar(nulls[2], pa.float64()),
            ]
            if include_cume:
                fills.append(pa.scalar(nulls[3], pa.float64()))
            cols = [pc.if_else(isnull, f, c) for f, c in zip(fills, cols)]
        for name, c in zip(names, cols):
            t = t.append_column(name, c)
        return t

    return ds.map_batches(_attach, batch_format="pyarrow")


def grouped_mad(ds, group_col: str, value_col: str, num_buckets=None):
    """Per-group median absolute deviation — ``median(|v − median_g(v)|)``
    with interpolated (quantile_cont-style) medians at BOTH levels, matching
    DuckDB ``mad()``.

    Pure composition of the histogram-quantile primitive: pass 1 computes
    interpolated group medians (one histogram exchange), which broadcast
    once; pass 2 derives ``|v − m_g|`` per batch (exact doubles — integer
    values minus an at-worst-.5 median) and runs the SAME histogram
    quantile over the deviation column. Deviation cardinality is bounded by
    the value domain, so both exchanges stay histogram-sized. Input lineage
    executes twice — materialize upstream if it is more than a pruned scan.
    Returns (group, n, mad); round before hash-comparing (interpolator ulp)."""
    import ray

    med = grouped_quantiles(
        ds, group_col, value_col, qs=(0.5,), interpolated=True,
        num_buckets=num_buckets,
    ).materialize()  # group-domain sized
    tbl = pa.concat_tables(
        [ray.get(r) for r in med.to_arrow_refs()], promote_options="default"
    )
    gvals = tbl[group_col].combine_chunks()
    meds = tbl["q50"].combine_chunks()
    ref = ray.put((gvals, meds))

    def _dev(t: pa.Table) -> pa.Table:
        gv, ms = ray.get(ref)
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        idx = pc.index_in(g.cast(gv.type), gv)
        m = ms.take(idx).to_numpy(zero_copy_only=False)
        v = t[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        dev = np.abs(v.cast(pa.float64()).to_numpy(zero_copy_only=False) - m)
        return pa.table({group_col: g, "__dev": pa.array(dev, pa.float64())})

    devs = ds.map_batches(_dev, batch_format="pyarrow")
    out = grouped_quantiles(
        devs, group_col, "__dev", qs=(0.5,), interpolated=True,
        num_buckets=num_buckets,
    )
    return out.map_batches(
        lambda t: t.rename_columns([group_col, "n", "mad"]),
        batch_format="pyarrow",
    )


def grouped_zscore(ds, group_col: str, value_col: str, out_col: str = "zscore"):
    """Per-row z-score normalization against the row's GROUP —
    ``(v − mean_g) / std_g`` (population std) — the standard distributed
    feature-engineering shape: per-batch ``(group, n, Σv, Σv²)`` moment
    partials (group-domain sized, row-count independent) reduce through one
    small groupby, the bounded group table broadcasts once via ``ray.put``,
    and every batch attaches z-scores with a vectorized ``index_in``
    gather — raw rows never shuffle.

    With an integer ``value_col`` the three moments are exact integers, so
    the double expression ``(v − s1/n) / sqrt(s2/n − (s1/n)²)`` is
    bit-identical to a SQL engine evaluating the same formula.
    Zero-variance groups yield null. Input lineage executes twice
    (moments + attach) — materialize upstream if more than a pruned scan."""
    import ray
    from ray.data.aggregate import Sum

    def _moments(t: pa.Table) -> pa.Table:
        v = t[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        v2 = pc.multiply(v, v)
        g = (
            pa.table({group_col: t[group_col], "__v": v, "__v2": v2})
            .group_by(group_col, use_threads=False)
            .aggregate([("__v", "sum"), ("__v2", "sum"), ([], "count_all")])
        )
        return g.rename_columns([group_col, "s1", "s2", "n"])

    agg = (
        ds.map_batches(_moments, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(
            Sum("s1", alias_name="s1"),
            Sum("s2", alias_name="s2"),
            Sum("n", alias_name="n"),
        )
        .materialize()  # group-domain sized
    )
    tbl = pa.concat_tables(
        [ray.get(r) for r in agg.to_arrow_refs()], promote_options="default"
    )
    gvals = tbl[group_col].combine_chunks()
    n = tbl["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    s1 = tbl["s1"].to_numpy(zero_copy_only=False).astype(np.float64)
    s2 = tbl["s2"].to_numpy(zero_copy_only=False).astype(np.float64)
    m = s1 / n
    var = s2 / n - m * m
    with np.errstate(invalid="ignore"):
        std = np.sqrt(var)
    ref = ray.put(
        (gvals, pa.array(m, pa.float64()), pa.array(std, pa.float64()))
    )

    def _attach(t: pa.Table) -> pa.Table:
        gv, means, stds = ray.get(ref)
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        idx = pc.index_in(g.cast(gv.type), gv)
        v = t[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vm = v.cast(pa.float64()).to_numpy(zero_copy_only=False)
        mm = means.take(idx).to_numpy(zero_copy_only=False)
        ss = stds.take(idx).to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (vm - mm) / ss
        return t.append_column(
            out_col, pa.array(z, pa.float64(), mask=~np.isfinite(z))
        )

    return ds.map_batches(_attach, batch_format="pyarrow")


def grouped_corr(ds, group_col: str, x_col: str, y_col: str):
    """Per-group bivariate Pearson correlation between two integer columns
    — one row per group: ``(group, n, corr)``.

    Same moment-partial shape as :func:`grouped_zscore`: each batch reduces
    to ``(group, n, Σx, Σy, Σx², Σy², Σxy)`` (group-domain sized), ONE small
    groupby sums them, and the driver-bounded finish evaluates
    ``(sxy/n − mx·my) / sqrt((sxx/n − mx²)(syy/n − my²))`` — a pure double
    function of integer moments, bitwise-equal to a SQL engine computing
    the same expression. Zero-variance groups yield null. Raw rows never
    shuffle."""
    from ray.data.aggregate import Sum

    def _moments(t: pa.Table) -> pa.Table:
        x = t[x_col]
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        y = t[y_col]
        if isinstance(y, pa.ChunkedArray):
            y = y.combine_chunks()
        g = (
            pa.table(
                {
                    group_col: t[group_col],
                    "__x": x,
                    "__y": y,
                    "__xx": pc.multiply(x, x),
                    "__yy": pc.multiply(y, y),
                    "__xy": pc.multiply(x, y),
                }
            )
            .group_by(group_col, use_threads=False)
            .aggregate(
                [("__x", "sum"), ("__y", "sum"), ("__xx", "sum"),
                 ("__yy", "sum"), ("__xy", "sum"), ([], "count_all")]
            )
        )
        return g.rename_columns(
            [group_col, "sx", "sy", "sxx", "syy", "sxy", "n"]
        )

    agg = (
        ds.map_batches(_moments, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(
            *(Sum(c, alias_name=c) for c in ("sx", "sy", "sxx", "syy", "sxy", "n"))
        )
    )

    def _finish(t: pa.Table) -> pa.Table:
        gtype = (
            t.schema.field(group_col).type
            if group_col in t.column_names
            else pa.string()
        )
        if len(t) == 0 or "sx" not in t.column_names:
            return pa.table(
                {
                    group_col: pa.array([], gtype),
                    "n": pa.array([], pa.int64()),
                    "corr": pa.array([], pa.float64()),
                }
            )
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = t["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = t["sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
        syy = t["syy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = t["sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
        mx, my = sx / n, sy / n
        with np.errstate(invalid="ignore", divide="ignore"):
            r = (sxy / n - mx * my) / np.sqrt(
                (sxx / n - mx * mx) * (syy / n - my * my)
            )
        return pa.table(
            {
                group_col: t[group_col],
                "n": pc.cast(t["n"], pa.int64()),
                "corr": pa.array(r, pa.float64(), mask=~np.isfinite(r)),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def pivot_counts(ds, group_col: str, pivot_col: str, values, num_buckets=None):
    """Pivot-to-wide counts: one row per group with an ``n_<value>`` count
    column per entry of ``values`` — the SQL ``COUNT(*) FILTER (WHERE v =
    'x')`` fan-out. ``values`` is the explicit (static) pivot domain: at
    scale the output SCHEMA must be fixed up front, so unlisted values are
    counted into none of the columns (pre-validate the domain upstream if
    that must be an error).

    Scale shape: per-batch (group, value) partial counts are the only rows
    that shuffle; ONE group-keyed exchange; in-bucket a vectorized bincount
    over ``group_run × |values|`` scatters the merged counts into the wide
    layout."""
    from .exchange import group_starts, keyed_map

    values = list(values)
    vset = pa.array([str(v) for v in values], pa.string())

    def _partial(t: pa.Table) -> pa.Table:
        g = (
            t.select([group_col, pivot_col])
            .group_by([group_col, pivot_col], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns([group_col, pivot_col, "c"])

    partials = ds.map_batches(_partial, batch_format="pyarrow")

    def _wide(t: pa.Table) -> pa.Table:
        gtype = t.schema.field(group_col).type if t.num_columns else pa.int64()
        if len(t) == 0:
            cols = {group_col: pa.array([], gtype)}
            for v in values:
                cols[f"n_{v}"] = pa.array([], pa.int64())
            return pa.table(cols)
        t = (
            t.group_by([group_col, pivot_col], use_threads=False)
            .aggregate([("c", "sum")])
            .rename_columns([group_col, pivot_col, "c"])
        )
        t = t.take(pc.sort_indices(t, sort_keys=[(group_col, "ascending")]))
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        starts = group_starts(g)
        lens = np.diff(np.append(starts, len(t)))
        run = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
        piv = t[pivot_col]
        if isinstance(piv, pa.ChunkedArray):
            piv = piv.combine_chunks()
        vidx = (
            pc.fill_null(pc.index_in(pc.cast(piv, pa.string()), vset), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        known = vidx >= 0
        vidx = np.maximum(vidx, 0)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        nv = len(values)
        mat = np.bincount(
            (run * nv + vidx)[known], weights=c[known].astype(np.float64),
            minlength=len(starts) * nv,
        ).astype(np.int64).reshape(len(starts), nv)
        cols = {group_col: g.take(pa.array(starts))}
        for k, v in enumerate(values):
            cols[f"n_{v}"] = pa.array(mat[:, k], pa.int64())
        return pa.table(cols)

    return keyed_map(partials, group_col, _wide, num_buckets=num_buckets)


def global_row_number(
    ds,
    value_col: str,
    tiebreak_col: str,
    n_tiles: int | None = None,
    num_buckets=None,
):
    """SQL ``ROW_NUMBER() OVER (ORDER BY v, tiebreak)`` — and optionally
    ``NTILE(n) OVER (same)`` — over the whole dataset WITHOUT a global row
    sort.

    Scale shape (the stats-module premise): a per-batch partial histogram
    of ``value_col`` is the only full-scan aggregate — (value, count) rows,
    value-domain bounded — cumsum'd once on the driver into per-value base
    offsets and broadcast; then ONE value-keyed exchange co-locates all
    rows of equal value, where the tiebreak is resolved by a local sort
    (``rn`` = value base + within-value position). Equal-value row counts
    must fit a bucket (same contract as any window partition). NTILE needs
    only N and rn, so it costs nothing extra. ``(value, tiebreak)`` must be
    unique and non-null for a deterministic SQL-matchable answer. The input
    lineage executes twice (histogram + exchange) — materialize upstream
    if it is more than a pruned scan."""
    import ray
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        g = (
            t.select([value_col])
            .group_by([value_col], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["v", "n"])

    counts = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # value-domain sized
    )
    tbl = pa.concat_tables(
        [ray.get(r) for r in counts.to_arrow_refs()], promote_options="default"
    )
    v = tbl["v"].combine_chunks()
    order = pc.sort_indices(v)
    v = v.take(order)
    n = tbl["n"].to_numpy(zero_copy_only=False).astype(np.int64)[
        order.to_numpy(zero_copy_only=False)
    ]
    bases = np.concatenate([[0], np.cumsum(n)[:-1]])
    total = int(n.sum())
    ref = ray.put((v, pa.array(bases, pa.int64())))

    if n_tiles is not None and n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")

    def _attach(t: pa.Table) -> pa.Table:
        vals, base_arr = ray.get(ref)
        if len(t) == 0:
            t = t.append_column("rn", pa.array([], pa.int64()))
            if n_tiles is not None:
                t = t.append_column("tile", pa.array([], pa.int64()))
            return t
        idx = pc.sort_indices(
            t,
            sort_keys=[(value_col, "ascending"), (tiebreak_col, "ascending")],
        )
        t = t.take(idx)
        col = t[value_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        from .exchange import group_starts

        starts = group_starts(col)
        lens = np.diff(np.append(starts, len(t)))
        pos = np.arange(len(t), dtype=np.int64) - np.repeat(starts, lens)
        vb = base_arr.take(pc.index_in(col, vals)).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        rn = vb + pos + 1
        t = t.append_column("rn", pa.array(rn, pa.int64()))
        if n_tiles is not None:
            q, r = divmod(total, n_tiles)
            cut = r * (q + 1)
            zero = rn - 1
            tile = np.where(
                zero < cut,
                zero // (q + 1),
                r + (zero - cut) // max(q, 1),
            ) + 1
            t = t.append_column("tile", pa.array(tile, pa.int64()))
        return t

    from .exchange import keyed_map

    return keyed_map(ds, value_col, _attach, num_buckets=num_buckets)


def grouped_mode(ds, group_col: str, value_col: str, num_buckets=None):
    """Exact per-group mode with a deterministic tie-break (max count,
    then smallest value) — SQL ``row_number() OVER (PARTITION BY g ORDER BY
    count(*) DESC, v) = 1`` over the grouped counts.

    Scale shape: per-batch (group, value) partial counts are the ONLY rows
    that shuffle (group × value domain, row-count independent); ONE
    group-keyed exchange merges them and a vectorized argmax-per-run picks
    the winner. Returns (group_col, mode, n)."""
    from .exchange import group_starts, keyed_map

    def _partial(t: pa.Table) -> pa.Table:
        g = (
            t.select([group_col, value_col])
            .group_by([group_col, value_col], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns([group_col, value_col, "c"])

    partials = ds.map_batches(_partial, batch_format="pyarrow")

    def _pick(t: pa.Table) -> pa.Table:
        t = (
            t.group_by([group_col, value_col], use_threads=False)
            .aggregate([("c", "sum")])
            .rename_columns([group_col, value_col, "c"])
        )
        idx = pc.sort_indices(
            t,
            sort_keys=[
                (group_col, "ascending"),
                ("c", "descending"),
                (value_col, "ascending"),
            ],
        )
        t = t.take(idx)
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        starts = pa.array(group_starts(g))
        return pa.table(
            {
                group_col: g.take(starts),
                "mode": t[value_col].take(starts),
                "n": pc.cast(t["c"].take(starts), pa.int64()),
            }
        )

    return keyed_map(partials, group_col, _pick, num_buckets=num_buckets)


def grouped_running(
    ds,
    group_col: str,
    order_cols,
    value_col: str,
    num_buckets=None,
    include_lead: bool = False,
):
    """SQL windowed running aggregates per group — for every input row:

    - ``running_<v>`` = ``SUM(v) OVER (PARTITION BY g ORDER BY o...)``
    - ``prev_<v>``    = ``LAG(v)  OVER (PARTITION BY g ORDER BY o...)``
    - ``rn``          = ``ROW_NUMBER() OVER (same window)``
    - with ``include_lead``: ``next_<v>`` = ``LEAD(v) OVER (same window)``
      (run tails nulled; opt-in so existing consumers keep their schema)

    the cumulative-spend / previous-event shape. ``(group, *order_cols)``
    must be unique (so RANGE and ROWS frames coincide) and ``value_col``
    must be integer-valued — integer cumsum is associative, so the result
    is EXACT and independent of accumulation order (float running sums are
    not: the SQL engine's segment-tree accumulation rounds differently
    than a sequential cumsum). Group keys must be non-null.

    Scale shape: ONE group-keyed exchange (each group's rows co-locate in
    exactly one bucket); in-bucket everything is vectorized — one sort by
    ``(group, *order_cols)``, ``group_starts`` run detection, a segmented
    ``cumsum`` (global cumsum minus the repeated run base), and a shift-by-
    one gather for LAG with the run heads nulled. Per-group data lives in
    one bucket: this is the window-function contract (a partition must be
    assembled somewhere); bound pathological group sizes upstream."""
    from .exchange import group_starts, keyed_map

    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    run_col, prev_col = f"running_{value_col}", f"prev_{value_col}"
    next_col = f"next_{value_col}"

    def _bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            names = [(run_col, pa.int64()), (prev_col, pa.int64()),
                     ("rn", pa.int64())]
            if include_lead:
                names.append((next_col, pa.int64()))
            for name, ty in names:
                t = t.append_column(name, pa.array([], ty))
            return t
        idx = pc.sort_indices(
            t,
            sort_keys=[(group_col, "ascending")]
            + [(c, "ascending") for c in order_cols],
        )
        t = t.take(idx)
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        starts = group_starts(g)
        lens = np.diff(np.append(starts, len(t)))
        v = t[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vals = v.to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.cumsum(vals)
        excl = np.concatenate([[0], cum[:-1]])
        running = cum - np.repeat(excl[starts], lens)
        rn = np.arange(len(t), dtype=np.int64) - np.repeat(starts, lens) + 1
        prev = np.empty(len(t), np.int64)
        prev[1:] = vals[:-1]
        prev[0] = 0
        head = np.zeros(len(t), bool)
        head[starts] = True
        t = t.append_column(run_col, pa.array(running, pa.int64()))
        t = t.append_column(prev_col, pa.array(prev, pa.int64(), mask=head))
        t = t.append_column("rn", pa.array(rn, pa.int64()))
        if include_lead:
            nxt = np.empty(len(t), np.int64)
            nxt[:-1] = vals[1:]
            nxt[-1] = 0
            tail = np.zeros(len(t), bool)
            tail[starts + lens - 1] = True  # last row of each run
            t = t.append_column(next_col, pa.array(nxt, pa.int64(), mask=tail))
        return t

    return keyed_map(ds, group_col, _bucket, num_buckets=num_buckets)


def rollup_aggregate(
    ds,
    keys,
    value_col: str,
    count_name: str = "n",
    sum_name: str = "s",
    num_buckets=None,
):
    """``GROUP BY ROLLUP(*keys)`` — hierarchical grouping sets in ONE pass:
    one output row per cell of every prefix level ``(k1..kn), (k1..kn-1),
    …, ()`` with a row count, an integer sum of ``value_col``, and
    ``grouping_id`` = the SQL ``GROUPING(*keys)`` bitmask (1-bits mark
    rolled-up keys) so the (k1) total row is never confused with a real
    ``(k1, NULL)`` cell.

    Scale shape: per-batch partials pre-aggregate EVERY level locally
    (levels × per-batch group domain tiny rows — row-count independent), so
    the only exchange is Ray's small ``groupby().aggregate()`` over
    ``(grouping_id, *keys)``. Rolled-up key slots travel as typed neutral
    sentinels (Ray 2.49's distributed groupby drops null keys) and become
    real NULLs in the finish map; ``grouping_id`` disambiguates them, which
    is also why input key VALUES must be non-null (pre-fill upstream)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    n = len(keys)
    sets = [(keys[:lvl], (1 << (n - lvl)) - 1) for lvl in range(n, -1, -1)]
    return _grouping_sets_aggregate(
        ds, keys, value_col, sets, count_name, sum_name
    )


def cube_aggregate(
    ds,
    keys,
    value_col: str,
    count_name: str = "n",
    sum_name: str = "s",
    num_buckets=None,
):
    """``GROUP BY CUBE(*keys)`` — ALL 2ⁿ grouping sets in the same ONE-pass
    plan as :func:`rollup_aggregate` (per-batch partials pre-aggregate
    every subset locally; the only exchange is the small distributed
    groupby over ``(grouping_id, *keys)``). Same ``grouping_id`` bitmask
    convention and non-null-key requirement."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    n = len(keys)
    if n > 8:
        raise ValueError("cube over >8 keys explodes 2^n grouping sets")
    sets = []
    for mask in range(1 << n):  # mask bit i set => keys[i] rolled up
        active = [k for i, k in enumerate(keys) if not (mask >> (n - 1 - i)) & 1]
        sets.append((active, mask))
    sets.sort(key=lambda s: s[1])
    return _grouping_sets_aggregate(
        ds, keys, value_col, sets, count_name, sum_name
    )


def _grouping_sets_aggregate(ds, keys, value_col, sets, count_name, sum_name):
    """Shared ROLLUP/CUBE engine: ``sets`` is [(active_keys, grouping_id)]."""
    from ray.data.aggregate import Sum

    n = len(keys)

    def _neutral(ty: pa.DataType):
        if pa.types.is_string(ty) or pa.types.is_large_string(ty):
            return pa.scalar("", ty)
        if pa.types.is_boolean(ty):
            return pa.scalar(False, ty)
        return pa.scalar(0, ty)

    def _partial(t: pa.Table) -> pa.Table:
        ktypes = [t.schema.field(k).type for k in keys]
        parts = []
        for active, gid in sets:
            if active:
                g = (
                    t.select(active + [value_col])
                    .group_by(active, use_threads=False)
                    .aggregate([(value_col, "sum"), ([], "count_all")])
                )
                cols = {k: g[k] for k in active}
                s = g[f"{value_col}_sum"]
                c = g["count_all"]
                m = len(g)
            else:
                v = t[value_col]
                s = pa.array([pc.sum(v).as_py() or 0], pa.int64())
                c = pa.array([len(t)], pa.int64())
                cols = {}
                m = 1
            for k, ty in zip(keys, ktypes):
                if k not in cols:
                    cols[k] = pa.array([_neutral(ty).as_py()] * m, ty)
            cols["__gid"] = pa.array([gid] * m, pa.int64())
            cols["__s"] = pc.cast(s, pa.int64())
            cols["__n"] = pc.cast(c, pa.int64())
            parts.append(pa.table({k: cols[k] for k in keys + ["__gid", "__s", "__n"]}))
        return pa.concat_tables(parts)

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["__gid"] + keys)
        .aggregate(Sum("__s", alias_name="__s"), Sum("__n", alias_name="__n"))
    )

    def _finish(t: pa.Table) -> pa.Table:
        gid = t["__gid"]
        if isinstance(gid, pa.ChunkedArray):
            gid = gid.combine_chunks()
        gid_np = gid.to_numpy(zero_copy_only=False).astype(np.int64)
        cols: dict = {}
        for i, k in enumerate(keys):
            rolled = (gid_np & (1 << (n - 1 - i))) != 0
            col = t[k]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[k] = pc.if_else(
                pa.array(rolled), pa.nulls(len(t), col.type), col
            )
        cols["grouping_id"] = gid
        cols[count_name] = pc.cast(t["__n"], pa.int64())
        cols[sum_name] = pc.cast(t["__s"], pa.int64())
        return pa.table(cols)

    return agg.map_batches(_finish, batch_format="pyarrow")


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
    aggregate; a NULL group KEY is one group (SQL GROUP BY), handled as an
    explicit run because run detection can't compare null==null. Offsets
    are int64 over a LargeListArray, so a bucket may exceed 2³¹ rows.
    Per-group output strings live in one worker — bound the group size
    upstream (chunk/truncate) for pathological groups."""
    from .exchange import group_starts, keyed_map

    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)

    def _join_runs(tv: pa.Table, starts: np.ndarray) -> pa.Array:
        offsets = pa.array(np.append(starts, len(tv)).astype(np.int64))
        v = tv[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        return pc.binary_join(
            pa.LargeListArray.from_arrays(offsets, v.cast(pa.string())), sep
        )

    def _bucket(t: pa.Table) -> pa.Table:
        gtype = t.schema.field(group_col).type if t.num_columns else None
        if len(t) == 0:
            return pa.table(
                {
                    group_col: pa.array([], gtype),
                    out_col: pa.array([], pa.string()),
                }
            )
        gcol = t[group_col]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        null_g = pc.is_null(gcol)
        tnull = t.filter(null_g)
        t = t.filter(pc.invert(null_g))
        out_g_parts: list = []
        out_v_parts: list = []
        if len(t):
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
                joined = _join_runs(tv, starts)
                got_groups = g.take(pa.array(starts))
            else:
                joined = pa.array([], pa.string())
                got_groups = all_groups.slice(0, 0)
            # groups with rows but zero non-null values → null aggregate
            miss_mask = pc.invert(pc.is_in(all_groups, value_set=got_groups))
            missing = all_groups.filter(miss_mask)
            got_groups = got_groups.combine_chunks() if isinstance(
                got_groups, pa.ChunkedArray
            ) else got_groups
            out_g_parts += [got_groups, missing]
            out_v_parts += [joined, pa.nulls(len(missing), pa.string())]
        if len(tnull):
            # the single NULL-key group: one explicit run
            vn = tnull[value_col]
            if isinstance(vn, pa.ChunkedArray):
                vn = vn.combine_chunks()
            tnv = tnull.filter(pc.is_valid(vn))
            if len(tnv):
                idx = pc.sort_indices(
                    tnv, sort_keys=[(c, "ascending") for c in order_cols]
                )
                joined_n = _join_runs(tnv.take(idx), np.array([0], np.int64))
            else:
                joined_n = pa.nulls(1, pa.string())
            out_g_parts.append(pa.nulls(1, gcol.type))
            out_v_parts.append(joined_n)
        return pa.table(
            {
                group_col: pa.concat_arrays(out_g_parts),
                out_col: pa.concat_arrays(out_v_parts),
            }
        )

    proj = ds.select_columns([group_col, value_col] + order_cols)
    return keyed_map(proj, group_col, _bucket, num_buckets=num_buckets)

def grouped_regression(ds, group_col: str, x_col: str, y_col: str):
    """Per-group simple linear regression (OLS) of ``y`` on ``x`` over two
    integer columns — one row per group: ``(group, n, slope, intercept)``.

    Identical scale shape to :func:`grouped_corr`: each batch reduces to
    exact integer moment partials ``(group, n, Σx, Σy, Σx², Σxy)``
    (group-domain sized — raw rows never shuffle), ONE small groupby sums
    them, and the driver-bounded finish evaluates the closed form

    ``slope = (sxy/n − mx·my) / (sxx/n − mx²)``,
    ``intercept = my − slope·mx``

    — pure double functions of integer moments, bitwise-equal to a SQL
    engine computing the same expression (so the oracle is the moment SQL,
    NOT DuckDB's ``regr_slope``, whose streaming accumulator rounds
    differently). Zero-variance-x groups yield null slope/intercept.
    Callers own the int64 moment-overflow domain contract (|x|·√n within
    ~3·10⁹, same as :func:`grouped_corr`)."""
    from ray.data.aggregate import Sum

    def _moments(t: pa.Table) -> pa.Table:
        x = t[x_col]
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        y = t[y_col]
        if isinstance(y, pa.ChunkedArray):
            y = y.combine_chunks()
        g = (
            pa.table(
                {
                    group_col: t[group_col],
                    "__x": x,
                    "__y": y,
                    "__xx": pc.multiply(x, x),
                    "__xy": pc.multiply(x, y),
                }
            )
            .group_by(group_col, use_threads=False)
            .aggregate(
                [("__x", "sum"), ("__y", "sum"), ("__xx", "sum"),
                 ("__xy", "sum"), ([], "count_all")]
            )
        )
        return g.rename_columns([group_col, "sx", "sy", "sxx", "sxy", "n"])

    agg = (
        ds.map_batches(_moments, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(
            *(Sum(c, alias_name=c) for c in ("sx", "sy", "sxx", "sxy", "n"))
        )
    )

    def _finish(t: pa.Table) -> pa.Table:
        gtype = (
            t.schema.field(group_col).type
            if group_col in t.column_names
            else pa.string()
        )
        if len(t) == 0 or "sx" not in t.column_names:
            return pa.table(
                {
                    group_col: pa.array([], gtype),
                    "n": pa.array([], pa.int64()),
                    "slope": pa.array([], pa.float64()),
                    "intercept": pa.array([], pa.float64()),
                }
            )
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = t["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = t["sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = t["sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
        mx, my = sx / n, sy / n
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = (sxy / n - mx * my) / (sxx / n - mx * mx)
            intercept = my - slope * mx
        bad = ~np.isfinite(slope)
        return pa.table(
            {
                group_col: t[group_col],
                "n": pc.cast(t["n"], pa.int64()),
                "slope": pa.array(slope, pa.float64(), mask=bad),
                "intercept": pa.array(intercept, pa.float64(), mask=bad),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def kmv_distinct(ds, group_col: str, value_col: str, k: int = 64, num_buckets=None):
    """Per-group KMV (k-minimum-values) approximate distinct count — the
    classic bottom-k sketch (Bar-Yossef et al. 2002): hash every value to a
    uniform ``u ∈ (0,1)``, keep the k smallest distinct hashes per group,
    and estimate ``(k−1)/u_(k)``; groups whose sketch never fills report
    the exact distinct-hash count. Returns ``(group, est_distinct)``.

    Scale shape — the whole point of a sketch: each batch reduces to its
    per-group k smallest distinct hashes, so the ONLY rows that shuffle
    are ≤ k·groups per batch regardless of row count; ONE group-keyed
    exchange merges sketches (distinct ∪ sort ∪ first-k — the standard KMV
    union). The k smallest global hashes all survive per-batch pruning, and
    when the global count is < k no pruning ever occurs, so the merged
    sketch is EXACTLY the sketch a single machine would build —
    deterministic, partitioning-invariant, and reproducible in SQL (the
    oracle computes the same md5-derived ``u`` and the same estimate law,
    see ``__ray_entry__._kmv_sql``). Hash: the repo's deterministic-
    sampling law ``u = (u32(md5(CAST(v AS VARCHAR))) + 0.5) / 2³²``
    (`duckdb_kernels.DuckKernel.md5_u32` — bit-parity with the oracle by
    construction)."""
    from ..duckdb_kernels import get_kernel
    from .exchange import group_starts, keyed_map
    from .joins import _as_schema

    if k < 2:
        raise ValueError("k must be >= 2")
    gtype = _as_schema(ds).field(group_col).type

    def _empty() -> pa.Table:
        return pa.table(
            {
                group_col: pa.array([], gtype),
                "u": pa.array([], pa.float64()),
            }
        )

    def _prune(t: pa.Table) -> pa.Table:
        # distinct per (group, u), sort (group, u), keep first k per group
        idx = pc.sort_indices(
            t, sort_keys=[(group_col, "ascending"), ("u", "ascending")]
        )
        t = t.take(idx)
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        starts = group_starts(g)
        n = len(t)
        sizes = np.diff(np.append(starts, n))
        rank = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
        return t.filter(pa.array(rank < k))

    def _partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _empty()
        d = (
            t.select([group_col, value_col])
            .group_by([group_col, value_col], use_threads=False)
            .aggregate([])
        )
        h = get_kernel().md5_u32(d[value_col])
        u = (h.astype(np.float64) + 0.5) / 4294967296.0
        sk = pa.table(
            {group_col: d[group_col], "u": pa.array(u, pa.float64())}
        )
        # collisions merge (KMV semantics — the oracle hashes identically)
        sk = sk.group_by([group_col, "u"], use_threads=False).aggregate([])
        return _prune(sk)

    partials = ds.map_batches(_partial, batch_format="pyarrow")

    def _merge(t: pa.Table) -> pa.Table:
        out_empty = pa.table(
            {
                group_col: pa.array([], gtype),
                "est_distinct": pa.array([], pa.float64()),
            }
        )
        if len(t) == 0 or "u" not in t.column_names:
            return out_empty
        d = t.group_by([group_col, "u"], use_threads=False).aggregate([])
        d = _prune(d)
        g = d[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        starts = group_starts(g)
        sizes = np.diff(np.append(starts, len(d)))
        u = d["u"].to_numpy(zero_copy_only=False)
        kth = u[starts + np.minimum(sizes, k) - 1]
        est = np.where(sizes >= k, (k - 1.0) / kth, sizes.astype(np.float64))
        return pa.table(
            {
                group_col: g.take(pa.array(starts)),
                "est_distinct": pa.array(est, pa.float64()),
            }
        )

    return keyed_map(partials, group_col, _merge, num_buckets=num_buckets)


def grouped_moving(
    ds,
    group_col: str,
    order_cols,
    value_col: str,
    window: int = 3,
    num_buckets=None,
):
    """SQL ROWS-frame moving window per group — for every input row:

    - ``mov_sum`` = ``SUM(v) OVER (PARTITION BY g ORDER BY o... ROWS
      BETWEEN window-1 PRECEDING AND CURRENT ROW)``
    - ``mov_avg`` = the matching ``AVG`` (sum / actual frame row count —
      frames at the head of a partition are shorter, like SQL)

    Same contract as :func:`grouped_running`: unique ``(group,
    *order_cols)``, integer ``value_col`` (the windowed sum is then EXACT
    and order-independent; ``mov_avg`` is a single double division of two
    exact integers, so it matches a SQL engine bitwise), non-null keys.

    Scale shape: ONE group-keyed exchange; in-bucket one sort + segmented
    cumsum with the frame's lower bound clamped to the partition head —
    ``mov_sum[i] = cum[i] - cum[max(start, i-window+1) - 1]`` — all
    vectorized, no per-row loop."""
    from .exchange import group_starts, keyed_map

    if window < 1:
        raise ValueError("window must be >= 1")
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)

    def _bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            t = t.append_column("mov_sum", pa.array([], pa.int64()))
            return t.append_column("mov_avg", pa.array([], pa.float64()))
        idx = pc.sort_indices(
            t,
            sort_keys=[(group_col, "ascending")]
            + [(c, "ascending") for c in order_cols],
        )
        t = t.take(idx)
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        starts = group_starts(g)
        lens = np.diff(np.append(starts, len(t)))
        v = t[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vals = v.to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(vals)])  # cum[i] = sum of first i
        pos = np.arange(len(t), dtype=np.int64)
        head = np.repeat(starts, lens)
        lo = np.maximum(head, pos - window + 1)
        msum = cum[pos + 1] - cum[lo]
        cnt = pos - lo + 1
        t = t.append_column("mov_sum", pa.array(msum, pa.int64()))
        return t.append_column(
            "mov_avg", pa.array(msum / cnt, pa.float64())
        )

    return keyed_map(ds, group_col, _bucket, num_buckets=num_buckets)


def grouped_entropy(
    ds,
    group_col: str,
    value_col: str,
    out_col: str = "entropy",
    ndigits: int = 6,
    num_buckets=None,
):
    """Shannon entropy (bits) of each group's ``value_col`` distribution:
    ``H(g) = -Σ_v p(v|g)·log2 p(v|g)`` — the "how diverse is this user's
    event mix / this source's token mix" shape.

    Two stages: per-batch ``(group, value) -> count`` partials (the ONLY
    rows that shuffle — row-count independent for bounded value domains),
    then one group-keyed exchange merges counts and evaluates the entropy
    vectorized over the merged histogram. Counts are exact integers; the
    float entropy sum is rounded to ``ndigits`` (segment order vs a SQL
    engine's accumulation order differs at ~1 ulp)."""
    from .exchange import group_starts, keyed_map

    def _partial(t: pa.Table) -> pa.Table:
        g = (
            t.select([group_col, value_col])
            .group_by([group_col, value_col], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns([group_col, value_col, "c"])

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    from ..kernels import round_half_away
    from .joins import _as_schema

    gtype = _as_schema(ds).field(group_col).type
    empty = pa.table(
        {group_col: pa.array([], gtype), out_col: pa.array([], pa.float64())}
    )

    def _merge(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "c" not in t.column_names:
            return empty
        m = t.group_by([group_col, value_col], use_threads=False).aggregate(
            [("c", "sum")]
        )
        idx = pc.sort_indices(m, sort_keys=[(group_col, "ascending")])
        m = m.take(idx)
        g = m[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        starts = group_starts(g)
        lens = np.diff(np.append(starts, len(m)))
        c = m["c_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        tot = np.add.reduceat(c, starts)
        p = c / np.repeat(tot, lens)
        # + 0.0 canonicalizes the single-value group's -0.0 to +0.0
        h = -np.add.reduceat(p * np.log2(p), starts) + 0.0
        return pa.table(
            {
                group_col: g.take(pa.array(starts)),
                out_col: pa.array(round_half_away(h, ndigits), pa.float64()),
            }
        )

    return keyed_map(partials, group_col, _merge, num_buckets=num_buckets)


def binned_histogram(ds, value_col: str, width: float, group_col: str | None = None):
    """Fixed-width value histogram — ``bin = floor(value / width)`` counts,
    optionally per group. The profiling shape ("what does this column's
    distribution look like") at any scale: per-batch partials pre-aggregate
    to (group, bin) counts, so the only exchange is the tiny
    ``groupby().aggregate`` over the bin domain — row-count independent.
    ``floor`` of an exact double division matches any SQL engine bitwise.
    Returns (group_col?, bin, bin_lo, n) with ``bin_lo = bin × width``."""
    from ray.data.aggregate import Sum

    if width <= 0:
        raise ValueError("width must be positive")
    keys = ([group_col] if group_col else []) + ["bin"]

    def _partial(t: pa.Table) -> pa.Table:
        v = t[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vn = v.to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor(vn / width).astype(np.int64)
        sub = {}
        if group_col:
            sub[group_col] = t[group_col]
        sub["bin"] = pa.array(b, pa.int64())
        g = pa.table(sub).group_by(keys, use_threads=False).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(keys + ["n"])

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(keys if len(keys) > 1 else keys[0])
        .aggregate(Sum("n", alias_name="n"))
    )

    def _lo(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "bin" not in t.column_names:
            cols = {}
            if group_col:
                cols[group_col] = pa.array([], pa.string())
            cols["bin"] = pa.array([], pa.int64())
            cols["bin_lo"] = pa.array([], pa.float64())
            cols["n"] = pa.array([], pa.int64())
            return pa.table(cols)
        b = t["bin"].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column("bin_lo", pa.array(b * width, pa.float64()))

    return agg.map_batches(_lo, batch_format="pyarrow")


def grouped_ntile(ds, group_col: str, order_cols, n: int, num_buckets=None):
    """``NTILE(n) OVER (PARTITION BY g ORDER BY o...)`` — SQL tile
    assignment: the first ``count % n`` tiles get ``ceil(count/n)`` rows,
    the rest ``floor(count/n)``. ``(group, *order_cols)`` must be unique
    (ties make NTILE nondeterministic in SQL too). ONE group-keyed
    exchange; in-bucket one sort + vectorized per-run rank arithmetic."""
    from .exchange import group_starts, keyed_map

    if n < 1:
        raise ValueError("n must be >= 1")
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)

    def _bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("tile", pa.array([], pa.int64()))
        idx = pc.sort_indices(
            t,
            sort_keys=[(group_col, "ascending")]
            + [(c, "ascending") for c in order_cols],
        )
        t = t.take(idx)
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        starts = group_starts(g)
        lens = np.diff(np.append(starts, len(t)))
        cnt = np.repeat(lens, lens).astype(np.int64)
        r0 = np.arange(len(t), dtype=np.int64) - np.repeat(starts, lens)
        q, r = cnt // n, cnt % n
        big = (q + 1) * r  # rows covered by the r larger tiles
        tile = np.where(
            r0 < big,
            r0 // np.maximum(q + 1, 1),
            r + np.where(q > 0, (r0 - big) // np.maximum(q, 1), 0),
        ) + 1
        return t.append_column("tile", pa.array(tile, pa.int64()))

    return keyed_map(ds, group_col, _bucket, num_buckets=num_buckets)


def iqr_outliers(ds, group_col: str, value_col: str, k: float = 1.5, num_buckets=None):
    """Per-group IQR outlier rows: values outside ``[q1 − k·IQR, q3 +
    k·IQR]`` where q1/q3 are the EXACT nearest-rank quartiles of the
    integer-valued ``value_col`` (``quantile_disc`` semantics, from
    :func:`grouped_quantiles`). The fences are one tiny per-group table,
    broadcast once via ``ray.put``; the corpus then streams through a
    vectorized gate — no second exchange. Fence arithmetic is double ops
    on exact integers (``k·IQR`` exact for k = 1.5), so the comparison
    matches a SQL engine bitwise. Returns the outlier rows unchanged."""
    from .exchange import broadcast as bcast

    q = grouped_quantiles(
        ds, group_col, value_col, qs=(0.25, 0.75), num_buckets=num_buckets
    ).take_all()
    keys = [r[group_col] for r in q]
    q1 = np.array([r["q25"] for r in q], np.float64)
    q3 = np.array([r["q75"] for r in q], np.float64)
    iqr = q3 - q1
    ref = bcast((pa.array(keys), q1 - k * iqr, q3 + k * iqr))

    def _gate(t: pa.Table) -> pa.Table:
        from .blocking import _fetch_broadcast

        gk, lo, hi = _fetch_broadcast(ref)
        pos = pc.fill_null(pc.index_in(t[group_col], value_set=gk), -1)
        pos = pos.to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vn = v.to_numpy(zero_copy_only=False).astype(np.float64)
        # pos == -1: null/unseen group -> excluded (SQL inner-join fences)
        mask = (pos >= 0) & ((vn < lo[pos]) | (vn > hi[pos]))
        return t.filter(pa.array(mask))

    return ds.map_batches(_gate, batch_format="pyarrow")


def categorical_association(ds, col_a: str, col_b: str, ndigits: int = 6):
    """Pearson chi-square independence statistic + Cramér's V between two
    categorical columns — the "are these two fields related" profiling
    probe. Uses the grid-free identity ``χ² = Σ_nonzero o²/e − n`` (zero
    cells contribute exactly their expectation, which the subtraction
    absorbs), so only OBSERVED cells are ever enumerated.

    Scale shape: per-batch (a, b, count) partials → one tiny cell-domain
    ``groupby().aggregate`` → the |A|·|B| nonzero cells fold on the driver
    (categorical domains are small by definition; a high-cardinality
    column here is a modeling error, not a scaling problem). Returns one
    row: (chi2, dof, cramers_v, n) — counts exact ints, the two float
    stats rounded to ``ndigits``."""
    from ray.data.aggregate import Sum

    from ..kernels import round_half_away

    def _partial(t: pa.Table) -> pa.Table:
        g = (
            t.select([col_a, col_b])
            .group_by([col_a, col_b], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns([col_a, col_b, "c"])

    cells = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby([col_a, col_b])
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    a = np.array([r[col_a] for r in cells])
    b = np.array([r[col_b] for r in cells])
    o = np.array([r["c"] for r in cells], np.float64)
    n = o.sum()
    ua, ia = np.unique(a, return_inverse=True)
    ub, ib = np.unique(b, return_inverse=True)
    na = np.bincount(ia, weights=o)
    nb = np.bincount(ib, weights=o)
    chi2 = float((o * o / (na[ia] * nb[ib] / n)).sum() - n)
    dof = (len(ua) - 1) * (len(ub) - 1)
    mindim = min(len(ua) - 1, len(ub) - 1)
    v = float(np.sqrt(chi2 / (n * mindim))) if mindim > 0 else 0.0
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "chi2": pa.array(
                    [float(round_half_away(np.array([chi2]), ndigits)[0]) + 0.0],
                    pa.float64(),
                ),
                "dof": pa.array([dof], pa.int64()),
                "cramers_v": pa.array(
                    [float(round_half_away(np.array([v]), ndigits)[0]) + 0.0],
                    pa.float64(),
                ),
                "n": pa.array([int(n)], pa.int64()),
            }
        )
    )


def grouped_weighted_mean(
    ds, group_col: str, value_col: str, weight_col: str, ndigits: int = 6
):
    """Weighted mean ``Σ v·w / Σ w`` per group for INTEGER value and
    weight columns — both sums are exact int64, so the single double
    division matches a SQL engine bitwise (then rounded defensively).
    Per-batch partial products pre-aggregate; only (group, Σvw, Σw) rows
    shuffle. Returns (group_col, n, wmean)."""
    from ray.data.aggregate import Sum

    from ..kernels import round_half_away

    def _partial(t: pa.Table) -> pa.Table:
        v = t[value_col]
        w = t[weight_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        vn = v.to_numpy(zero_copy_only=False).astype(np.int64)
        wn = w.to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pa.table(
                {
                    group_col: t[group_col],
                    "vw": pa.array(vn * wn, pa.int64()),
                    "w": pa.array(wn, pa.int64()),
                }
            )
            .group_by([group_col], use_threads=False)
            .aggregate([("vw", "sum"), ("w", "sum"), ([], "count_all")])
        )
        return g.rename_columns([group_col, "vw", "w", "n"])

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(
            Sum("vw", alias_name="vw"),
            Sum("w", alias_name="w"),
            Sum("n", alias_name="n"),
        )
    )

    def _finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "vw" not in t.column_names:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "wmean": pa.array([], pa.float64()),
                }
            )
        vw = t["vw"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        wm = np.where(w != 0, vw / np.where(w != 0, w, 1.0), np.nan)
        return pa.table(
            {
                group_col: t[group_col],
                "n": pc.cast(t["n"], pa.int64()),
                "wmean": pa.array(
                    round_half_away(wm, ndigits) + 0.0,
                    pa.float64(),
                    mask=~np.isfinite(wm),
                ),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")
