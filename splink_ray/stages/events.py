"""Windowed / sessionized event operators (custom operators the reference
lacks; task brief: "windowed aggregate, as-of join, a streaming window").

All are expressed Ray-Data-first per the brief's option (a): composition of
``map_batches`` + the hash-bucket exchange (``keyed_map`` co-locates every
row of a user, so per-bucket numpy is exact) — no raw actors needed.

- :func:`sessionize` — gap-based session ids per user (one exchange on the
  user key, vectorized break/cumsum inside the bucket);
- :func:`tumbling_window_agg` — fixed-width window aggregates via derived
  window keys + per-batch partial aggregation (NO exchange of raw events,
  only (window, type, partials) rows shuffle);
- :func:`last_event_before` — as-of lookup: for every event, the timestamp
  of the most recent PRIOR event of a reference type by the same user
  (prefix-max index trick, exact and fully vectorized).

Partitioning assumption (documented per the brief): ``sessionize`` and
``last_event_before`` require all rows of a user in one bucket — guaranteed
by the hash exchange on the user column; window aggregation is
commutative/associative so it needs no co-location at all.
"""

from __future__ import annotations

import numpy as np

from ..kernels import round_half_away
import pyarrow as pa
import pyarrow.compute as pc

from .exchange import keyed_map


def _sorted_user_blocks(t: pa.Table, user_col: str, ts_col: str, id_col: str):
    """Sort by (user, ts, id); return (table, user-change bool array)."""
    t = t.sort_by(
        [(user_col, "ascending"), (ts_col, "ascending"), (id_col, "ascending")]
    )
    u = t[user_col].to_numpy(zero_copy_only=False)
    change = np.empty(len(u), bool)
    if len(u):
        change[0] = True
        change[1:] = u[1:] != u[:-1]
    return t, change


def sessionize(
    ds, user_col: str, ts_col: str, id_col: str, gap_minutes: float = 30.0,
    num_buckets=None,
):
    """→ Dataset (id, user, session_seq, session_id): a session breaks when
    the gap to the previous event of the same user exceeds ``gap_minutes``.
    ``session_seq`` counts from 1 per user; ``session_id`` = "user:seq"."""
    gap_us = np.int64(gap_minutes * 60 * 1_000_000)

    def _bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    user_col: pa.array([], pa.int64()),
                    "session_seq": pa.array([], pa.int64()),
                    "session_id": pa.array([], pa.string()),
                }
            )
        t, change = _sorted_user_blocks(t, user_col, ts_col, id_col)
        ts = t[ts_col].combine_chunks().cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").astype(np.int64)
        brk = change.copy()
        brk[1:] |= (ts[1:] - ts[:-1]) > gap_us
        seq_global = np.cumsum(brk)
        # per-user numbering: subtract the running count just before the
        # user's first row (brk is always 1 there)
        user_base = np.where(change, seq_global - 1, 0)
        np.maximum.accumulate(user_base, out=user_base)
        seq = seq_global - user_base
        users = t[user_col]
        sid = pc.binary_join_element_wise(
            pc.cast(users, pa.string()),
            pc.cast(pa.array(seq, pa.int64()), pa.string()),
            ":",
        )
        return pa.table(
            {
                id_col: t[id_col],
                user_col: users,
                "session_seq": pa.array(seq, pa.int64()),
                "session_id": sid,
            }
        )

    return keyed_map(ds, user_col, _bucket, num_buckets=num_buckets)


def tumbling_window_agg(
    ds, ts_col: str, window_minutes: float = 10.0, by: str | None = None,
    value_col: str | None = None,
):
    """Fixed-width tumbling windows: count (+ sum of ``value_col``) per
    (window_start[, by]) — partial aggregation per batch, one small
    ``groupby.sum``; raw events never shuffle."""
    from ray.data.aggregate import Sum

    w_us = np.int64(window_minutes * 60 * 1_000_000)

    def _partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            cols = {"window_start": pa.array([], pa.timestamp("us"))}
            if by:
                cols[by] = pa.array([], pa.string())
            cols["n"] = pa.array([], pa.int64())
            if value_col:
                cols["sum_value"] = pa.array([], pa.float64())
            return pa.table(cols)
        ts = t[ts_col].combine_chunks().cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").astype(np.int64)
        wstart = (ts // w_us) * w_us
        sub = {"window_start": pa.array(wstart.astype("datetime64[us]"), pa.timestamp("us"))}
        keys = ["window_start"]
        if by:
            sub[by] = t[by]
            keys.append(by)
        aggs = [([], "count_all")]
        if value_col:
            sub["__v"] = t[value_col]
            aggs = [(["__v"], "sum")] + aggs
        g = pa.table(sub).group_by(keys, use_threads=False).aggregate(aggs)
        names = keys + (["sum_value", "n"] if value_col else ["n"])
        return g.rename_columns(names)

    keys = ["window_start"] + ([by] if by else [])
    aggs = [Sum("n", alias_name="n")]
    if value_col:
        aggs.append(Sum("sum_value", alias_name="sum_value"))
    return ds.map_batches(_partial, batch_format="pyarrow").groupby(keys).aggregate(*aggs)


def last_event_before(
    ds, user_col: str, ts_col: str, id_col: str, type_col: str, ref_type: str,
    num_buckets=None,
):
    """As-of lookup: per event, the ts of the most recent STRICTLY PRIOR
    ``ref_type`` event of the same user (null when none). Exact: prefix-max
    over matching row indices; a hit from a previous user block is rejected
    by the user-start bound."""

    def _bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "last_ref_ts": pa.array([], pa.timestamp("us")),
                }
            )
        t, change = _sorted_user_blocks(t, user_col, ts_col, id_col)
        n = len(t)
        ts = t[ts_col].combine_chunks().cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").astype(np.int64)
        mask = pc.equal(t[type_col], ref_type).to_numpy(zero_copy_only=False)
        mask = np.nan_to_num(mask, nan=False).astype(bool)
        idx_masked = np.where(mask, np.arange(n, dtype=np.int64), np.int64(-1))
        np.maximum.accumulate(idx_masked, out=idx_masked)
        # strictly prior: look at the accumulate UP TO the previous row
        j = np.empty(n, np.int64)
        j[0] = -1
        j[1:] = idx_masked[:-1]
        user_start = np.where(change, np.arange(n, dtype=np.int64), 0)
        np.maximum.accumulate(user_start, out=user_start)
        valid = j >= user_start  # a match from an earlier user is no match
        out_ts = np.where(valid, ts[np.where(valid, j, 0)], np.int64(0))
        arr = pa.array(out_ts.astype("datetime64[us]"), pa.timestamp("us"))
        arr = pc.if_else(pa.array(valid), arr, pa.scalar(None, pa.timestamp("us")))
        return pa.table({id_col: t[id_col], "last_ref_ts": arr})

    return keyed_map(ds, user_col, _bucket, num_buckets=num_buckets)


def funnel_conversions(
    ds,
    user_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    from_type: str,
    to_type: str,
    within_minutes: float = 30.0,
    num_buckets=None,
):
    """Funnel step: per user (with ≥ 1 ``from_type`` event), how many of
    their ``from_type`` events have a ``to_type`` event at
    ``from.ts <= to.ts <= from.ts + within`` — the A-then-B-within-T
    conversion count.

    Exact and fully vectorized after the one exchange on the user key:
    rows sort by (user, ts, to-after-from-at-ties, id) so a REVERSED
    ``minimum.accumulate`` over to-event indices yields each from-event's
    next to-event with ``ts >= from.ts`` (ties included, matching the SQL
    ``>=``); the user-end bound rejects matches that leak from the next
    user block. Per-user counts via ``bincount`` on user codes.

    Oracle: correlated EXISTS over the from/to projections
    (``__ray_entry__._funnel_sql``)."""
    within_us = np.int64(within_minutes * 60 * 1_000_000)

    def _bucket(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                user_col: pa.array([], pa.int64()),
                "n_from": pa.array([], pa.int64()),
                "n_converted": pa.array([], pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        is_to_col = pc.equal(t[type_col], to_type)
        t = t.append_column("__is_to", is_to_col.cast(pa.int8()))
        t = t.sort_by(
            [
                (user_col, "ascending"),
                (ts_col, "ascending"),
                ("__is_to", "ascending"),
                (id_col, "ascending"),
            ]
        )
        n = len(t)
        u = t[user_col].to_numpy(zero_copy_only=False)
        ts = (
            t[ts_col].combine_chunks().cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        )
        is_to = t["__is_to"].to_numpy(zero_copy_only=False).astype(bool)
        is_from = pc.equal(t[type_col], from_type).to_numpy(zero_copy_only=False)
        is_from = np.nan_to_num(is_from, nan=False).astype(bool)
        if not is_from.any():
            return empty
        change = np.empty(n, bool)
        change[0] = True
        change[1:] = u[1:] != u[:-1]
        # next to-event index at-or-after each position (reversed prefix-min)
        idx = np.where(is_to, np.arange(n, dtype=np.int64), np.int64(n))
        nxt = np.minimum.accumulate(idx[::-1])[::-1]
        # last index of each row's OWN user block: the nearest block-end
        # at-or-after the row (reversed prefix-MIN over end markers)
        ends = np.where(
            np.append(change[1:], True), np.arange(n, dtype=np.int64), np.int64(n)
        )
        user_end = np.minimum.accumulate(ends[::-1])[::-1]
        valid = (nxt <= user_end) & is_from
        conv = np.zeros(n, bool)
        conv[valid] = ts[nxt[valid]] <= ts[valid] + within_us
        # per-user aggregation over from-events only
        codes = np.cumsum(change) - 1
        n_users = int(codes[-1]) + 1
        n_from = np.bincount(codes[is_from], minlength=n_users)
        n_conv = np.bincount(codes[is_from & conv], minlength=n_users)
        has_from = n_from > 0
        first_rows = np.flatnonzero(change)
        users = t[user_col].take(pa.array(first_rows[has_from]))
        return pa.table(
            {
                user_col: users,
                "n_from": pa.array(n_from[has_from], pa.int64()),
                "n_converted": pa.array(n_conv[has_from], pa.int64()),
            }
        )

    return keyed_map(ds, user_col, _bucket, num_buckets=num_buckets)


def event_transitions(
    ds, user_col: str, ts_col: str, id_col: str, type_col: str,
    num_buckets=None,
):
    """Markov transition statistics over per-user event sequences.

    For every pair of consecutive events of the same user (ordered by
    ``ts`` then ``id``), counts the (from_type -> to_type) transition and
    computes the transition probability ``p = n / sum(n)`` over each
    ``from_type`` row.

    Scale shape: raw events exchange once on the user key (co-location is
    required to see consecutive pairs); each bucket emits pre-aggregated
    (from_type, to_type, partial n) rows, so only a types^2-sized table ever
    shuffles again. The final probability normalisation runs on that tiny
    aggregate driver-side. Returns a pandas DataFrame
    (from_type, to_type, n, p) with p rounded to 6 decimals.
    """
    from ray.data.aggregate import Sum

    empty = pa.table(
        {
            "from_type": pa.array([], pa.string()),
            "to_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def _bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        t, change = _sorted_user_blocks(t, user_col, ts_col, id_col)
        # rows that continue the previous row's user pair with it
        cont = np.flatnonzero(~change)
        if len(cont) == 0:
            return empty
        types = t[type_col].combine_chunks()
        frm = types.take(pa.array(cont - 1))
        to = types.take(pa.array(cont))
        g = (
            pa.table({"from_type": frm, "to_type": to})
            .group_by(["from_type", "to_type"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["from_type", "to_type", "n"])

    counts = keyed_map(ds, user_col, _bucket, num_buckets=num_buckets)
    merged = (
        counts.groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if merged.empty:  # Ray 2.49: empty agg output may arrive schema-less
        import pandas as pd

        return pd.DataFrame(
            {"from_type": [], "to_type": [], "n": [], "p": []}
        )
    tot = merged.groupby("from_type")["n"].transform("sum")
    merged["p"] = round_half_away(merged["n"].astype(float) / tot.astype(float), 6)
    return merged.reset_index(drop=True)


def rolling_window_stats(
    ds, user_col: str, ts_col: str, id_col: str, value_col: str,
    window_minutes: float = 30.0, num_buckets=None,
):
    """Sliding (RANGE) window per event: for every event, the count and
    value-sum of the same user's events in the trailing ``window_minutes``
    INCLUDING the current row's timestamp peers (ANSI ``RANGE BETWEEN
    INTERVAL w PRECEDING AND CURRENT ROW`` semantics).

    Scale shape: one exchange on the user key (windows never cross users);
    inside each bucket everything is vectorized — window boundaries come
    from one composite-key ``searchsorted`` over all user blocks at once
    (per-block timestamps offset onto disjoint ranges), and window sums are
    direct per-window slice sums via ``np.add.reduceat`` (error bounded by
    the window's own magnitude, not a corpus-wide prefix sum). Cost is
    O(sum of window lengths); for bounded windows that is O(n * avg-window),
    the same work a streaming engine does.

    Returns a Dataset (id, n_window, sum_value) with sum rounded to 6
    decimals.
    """
    w_us = np.int64(window_minutes * 60 * 1_000_000)

    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "n_window": pa.array([], pa.int64()),
            "sum_value": pa.array([], pa.float64()),
        }
    )

    def _bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        t, change = _sorted_user_blocks(t, user_col, ts_col, id_col)
        n = len(t)
        ts = (
            t[ts_col].combine_chunks().cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        )
        ts = ts - ts.min()
        block_id = np.cumsum(change) - 1
        span = np.int64(int(ts.max()) + int(w_us) + 2)
        n_blocks = int(block_id[-1]) + 1
        if n_blocks * int(span) < np.iinfo(np.int64).max // 2:
            key = block_id * span + ts
            left = np.searchsorted(key, key - w_us, side="left")
            right = np.searchsorted(key, key, side="right")
        else:  # pathological span: per-block searchsorted fallback
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], n)
            left = np.empty(n, np.int64)
            right = np.empty(n, np.int64)
            for s, e in zip(starts, ends):
                left[s:e] = s + np.searchsorted(ts[s:e], ts[s:e] - w_us, "left")
                right[s:e] = s + np.searchsorted(ts[s:e], ts[s:e], "right")
        vals = np.append(
            pc.fill_null(t[value_col], 0.0).to_numpy(zero_copy_only=False)
            .astype(np.float64),
            0.0,
        )
        inter = np.empty(2 * n, np.int64)
        inter[0::2] = left
        inter[1::2] = right
        sums = np.add.reduceat(vals, inter)[0::2]
        sums = np.where(right > left, sums, 0.0)  # reduceat quirk on empty
        return pa.table(
            {
                id_col: t[id_col],
                "n_window": pa.array(right - left, pa.int64()),
                "sum_value": pa.array(round_half_away(sums, 6), pa.float64()),
            }
        )

    return keyed_map(ds, user_col, _bucket, num_buckets=num_buckets)

def cohort_retention(
    ds, user_col: str, ts_col: str, period_days: int = 7, num_buckets=None,
):
    """Cohort retention matrix: users are cohorted by the period (epoch
    ``ts // period_days``) of their FIRST event; for every (cohort,
    offset) cell, count the distinct users of that cohort active
    ``offset`` periods after their first one. Returns
    ``(cohort_period, offset_periods, n_users)`` — the classic
    product-analytics rollup.

    Scale shape: each batch reduces to DISTINCT ``(user, period)`` rows
    (user × period-domain bounded — raw events never shuffle); ONE
    user-keyed exchange re-distincts and, per user, derives the cohort
    (min period) and emits one ``(cohort, offset)`` partial count per
    active period — all vectorized run arithmetic; a final tiny groupby
    over the (cohort × offset)-domain sums the partials.

    Oracle: DISTINCT (user, period) CTE + MIN() OVER (PARTITION BY user)
    + COUNT(*) GROUP BY (``__ray_entry__`` cohort_retention SQL)."""
    from ray.data.aggregate import Sum

    from .exchange import group_starts

    us = 86_400_000_000 * int(period_days)

    def _user_periods(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        p = pc.divide(pc.cast(ts, pa.int64()), pa.scalar(us, pa.int64()))
        g = (
            pa.table({user_col: t[user_col], "__p": p})
            .group_by([user_col, "__p"], use_threads=False)
            .aggregate([])
        )
        return g

    up = ds.select_columns([user_col, ts_col]).map_batches(
        _user_periods, batch_format="pyarrow"
    )

    def _cells(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cohort_period": pa.array([], pa.int64()),
                "offset_periods": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if len(t) == 0 or "__p" not in t.column_names:
            return empty
        d = t.group_by([user_col, "__p"], use_threads=False).aggregate([])
        d = d.sort_by(
            [(user_col, "ascending"), ("__p", "ascending")]
        )
        u = d[user_col]
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        starts = group_starts(u)
        sizes = np.diff(np.append(starts, len(d)))
        p = d["__p"].to_numpy(zero_copy_only=False).astype(np.int64)
        cohort = np.repeat(p[starts], sizes)  # per-user min = first sorted
        off = p - cohort
        g = (
            pa.table(
                {
                    "cohort_period": pa.array(cohort, pa.int64()),
                    "offset_periods": pa.array(off, pa.int64()),
                }
            )
            .group_by(["cohort_period", "offset_periods"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["cohort_period", "offset_periods", "n"])

    cells = keyed_map(up, user_col, _cells, num_buckets=num_buckets)
    return cells.groupby(["cohort_period", "offset_periods"]).aggregate(
        Sum("n", alias_name="n_users")
    )


def ohlc_downsample(
    ds,
    user_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    window_minutes: float = 60.0,
):
    """Time-bucket OHLC downsampling — per (entity, tumbling window):
    ``open``/``close`` = first/last value in (ts, id) order, ``high``/
    ``low`` = max/min, ``n`` = row count. The metrics/telemetry compaction
    shape ("resample ticks to hourly candles"). Every output value is a
    PICKED input value (no arithmetic), so results are bit-exact vs any
    SQL engine regardless of float accumulation order.

    Scale shape: ONE entity-keyed exchange (an entity's rows co-locate;
    windows subdivide inside the bucket); in-bucket one sort by (entity,
    window, ts, id) + run detection + ``reduceat`` — no per-row loop. Raw
    rows shuffle once; output is |entities × active windows| rows."""
    w_us = np.int64(window_minutes * 60 * 1_000_000)
    from .exchange import keyed_map
    from .joins import _as_schema

    sch = _as_schema(ds)
    utype = sch.field(user_col).type
    vtype = sch.field(value_col).type
    empty = pa.table(
        {
            user_col: pa.array([], utype),
            "window_start": pa.array([], pa.timestamp("us")),
            "open": pa.array([], vtype),
            "high": pa.array([], vtype),
            "low": pa.array([], vtype),
            "close": pa.array([], vtype),
            "n": pa.array([], pa.int64()),
        }
    )

    def _bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        ts_us = (
            t[ts_col]
            .combine_chunks()
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        wstart = (ts_us // w_us) * w_us
        t = t.append_column("__w", pa.array(wstart, pa.int64()))
        t = t.sort_by(
            [
                (user_col, "ascending"),
                ("__w", "ascending"),
                (ts_col, "ascending"),
                (id_col, "ascending"),
            ]
        )
        u = t[user_col].to_numpy(zero_copy_only=False)
        w = t["__w"].to_numpy(zero_copy_only=False)
        change = np.empty(len(t), bool)
        change[0] = True
        change[1:] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
        starts = np.nonzero(change)[0]
        ends = np.append(starts[1:], len(t))
        v = t[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vn = v.to_numpy(zero_copy_only=False)
        uarr = t[user_col]
        if isinstance(uarr, pa.ChunkedArray):
            uarr = uarr.combine_chunks()
        return pa.table(
            {
                user_col: uarr.take(pa.array(starts)),
                "window_start": pa.array(
                    w[starts].astype("datetime64[us]"), pa.timestamp("us")
                ),
                "open": v.take(pa.array(starts)),
                "high": pa.array(np.maximum.reduceat(vn, starts), vtype),
                "low": pa.array(np.minimum.reduceat(vn, starts), vtype),
                "close": v.take(pa.array(ends - 1)),
                "n": pa.array(ends - starts, pa.int64()),
            }
        )

    return keyed_map(ds, user_col, _bucket)
