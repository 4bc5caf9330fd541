"""Blocking: key derivation, skew analysis, salted + capped pair generation.

Reference: ``splink/internals/blocking.py::BlockingRule, SaltedBlockingRule,
ExplodingBlockingRule, block_using_rules_sqls`` and
``splink/internals/blocking_analysis.py`` (public layout; /root/reference
empty — SURVEY.md §0 / §2.4). The reference renders the self-join
``concat AS l JOIN concat AS r ON <rule> AND l.unique_id < r.unique_id``
per rule with ``match_key = rule index`` and the cross-rule exclusion
``AND NOT (rule_j)`` for j < i.

Ray shape (§3.1): one ``map_batches`` derives all rules' key columns
(``bk_0..bk_{R-1}``); per rule a hash-exchange on the (possibly salted) key
co-locates each block, and a vectorized per-bucket pass emits the triangular
pairs. Skew handling (north_rule):

- **Hot-key detection** — per-batch partial counts → small ``groupby.sum`` →
  keys with count > ``hot_key_threshold`` collected driver-side (small) and
  broadcast via ``ray.put``.
- **Salting** — a hot key with n rows gets P = ceil(n / target) salt slots;
  each record (salt s = hash(uid) % P) is replicated into the P unordered
  slot-pairs {(min(s,k), max(s,k))}; subgroup (s1,s2) emits only s1×s2 pairs
  (triangle when s1==s2), so every pair appears exactly once and no subgroup
  exceeds ~2·target rows. Property-tested equal to unsalted output.
- **Capping** — groups still above ``max_pairs_per_block`` emit the first cap
  pairs in deterministic (sorted unique_id) order; overflow counts are
  computed exactly from the count table and reported in metrics — never
  silently dropped.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..blocking_rule_library import BlockingRule
from ..settings import Settings
from .exchange import broadcast, default_num_buckets, keyed_map

PG_COL = "__pg"       # pair-group label (rule + key [+ salt-slot pair])
SALT_COL = "__salt"
RULE_COL = "__rule"
MATCH_KEY_COL = "match_key"


def bk_col(i: int) -> str:
    return f"bk_{i}"


# ---------------------------------------------------------------------------
# key derivation (M3)
# ---------------------------------------------------------------------------


def derive_block_keys(ds, rules: list[BlockingRule]):
    """Add one string key column per rule in a single vectorized pass."""

    def _add(t: pa.Table) -> pa.Table:
        for i, rule in enumerate(rules):
            t = t.append_column(bk_col(i), rule.key_values(t))
        return t

    return ds.map_batches(_add, batch_format="pyarrow")


def explode_for_rule(ds, rule: BlockingRule):
    """ExplodingBlockingRule (B5): unnest the rule's array columns so the key
    expression sees one element per row. Emitted pairs are de-duplicated on
    (unique_id_l, unique_id_r) afterwards."""

    def _explode(t: pa.Table) -> pa.Table:
        for c in rule.array_columns_to_explode:
            other = [n for n in t.column_names if n != c]
            lengths = pc.list_value_length(t[c]).fill_null(0).to_numpy(zero_copy_only=False)
            idx = np.repeat(np.arange(len(t)), lengths)
            flat = pc.list_flatten(t[c].combine_chunks())
            t = t.select(other).take(idx).append_column(c, flat)
        return t

    return ds.map_batches(_explode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# blocking analysis (B7) — counts, skew, overflow
# ---------------------------------------------------------------------------


def rule_key_counts(ds_keys, i: int):
    """Dataset of (key, n) for rule i — partial per-batch counts, then a tiny
    groupby-sum (pre-aggregation pattern; never shuffles raw rows)."""
    c = bk_col(i)

    def _partial(t: pa.Table) -> pa.Table:
        t = t.select([c]).filter(pc.is_valid(t[c]))
        if len(t) == 0:
            return pa.table({c: pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        g = t.group_by(c, use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns([c, "n"])

    from ray.data.aggregate import Sum

    return (
        ds_keys.map_batches(_partial, batch_format="pyarrow")
        .groupby(c)
        .aggregate(Sum("n", alias_name="n"))
    )


def count_comparisons_from_blocking_rule(ds_keys, i: int) -> int:
    """Σ over keys of n·(n−1)/2 — reference
    ``blocking_analysis.count_comparisons_from_blocking_rule``."""
    from ray.data.aggregate import Sum

    counts = rule_key_counts(ds_keys, i)

    def _pairs(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"p": n * (n - 1) / 2})

    out = counts.map_batches(_pairs, batch_format="pyarrow").aggregate(Sum("p", alias_name="p"))
    return int(out["p"] or 0)


def n_largest_blocks(ds_keys, i: int, k: int = 5) -> pd.DataFrame:
    counts = rule_key_counts(ds_keys, i)
    return counts.sort("n", descending=True).limit(k).to_pandas()


def analyze_all_rules_skew(
    ds_keys, rule_idxs: list[int], hot_threshold: int, target_rows: int,
    cap_pairs: int | None,
    approx_records: int | None = None,
) -> tuple[dict[int, dict], dict[int, dict]]:
    """One pass over the records for every rule's counts (instead of one
    shuffle per rule): per-batch partial counts emit (rule, key, n) rows →
    merged per-rule metrics + hot-key maps. When the key space is small the
    partials are merged driver-side in pandas (ONE dataset execution — the
    distributed groupby + filters cost ~8 s of fixed latency per predict);
    the distributed merge remains for billion-key regimes."""
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        parts = []
        for i in rule_idxs:
            c = bk_col(i)
            sub = t.select([c]).filter(pc.is_valid(t[c]))
            if len(sub) == 0:
                continue
            g = sub.group_by(c, use_threads=False).aggregate([([], "count_all")])
            g = g.rename_columns(["key", "n"])
            parts.append(g.append_column("rule", pa.array(np.full(len(g), i, np.int32))))
        if not parts:
            return pa.table(
                {"key": pa.array([], pa.string()), "n": pa.array([], pa.int64()),
                 "rule": pa.array([], pa.int32())}
            )
        return pa.concat_tables(parts)

    DRIVER_SIDE_KEY_LIMIT = 5_000_000
    if approx_records is not None and approx_records <= DRIVER_SIDE_KEY_LIMIT:
        # small key space: fetch the per-batch partials and merge in pandas
        cdf = ds_keys.map_batches(_partial, batch_format="pyarrow").to_pandas()
        if "rule" not in cdf.columns:
            cdf = pd.DataFrame({"rule": [], "key": [], "n": []})
        cdf = cdf.groupby(["rule", "key"], as_index=False)["n"].sum()
        n = cdf["n"].to_numpy(dtype=np.float64, na_value=0)
        cdf["pairs"] = n * (n - 1) / 2
        agg = (
            cdf.groupby("rule")
            .agg(pairs=("pairs", "sum"), n_keys=("n", "size"), largest_block=("n", "max"))
        )
        hot = cdf[cdf["n"] > hot_threshold]
        big = cdf[cdf["n"] > int((2 * cap_pairs) ** 0.5)] if cap_pairs is not None else None
    else:
        counts = (
            ds_keys.map_batches(_partial, batch_format="pyarrow")
            .groupby(["rule", "key"])
            .aggregate(Sum("n", alias_name="n"))
        )

        def _derived(t: pa.Table) -> pa.Table:
            n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table(
                {"rule": t["rule"], "pairs": n * (n - 1) / 2,
                 "one": np.ones(len(t), np.int64), "nmax": n}
            )

        from ray.data.aggregate import Max

        counts = counts.materialize()
        agg = (
            counts.map_batches(_derived, batch_format="pyarrow")
            .groupby("rule")
            .aggregate(
                Sum("pairs", alias_name="pairs"),
                Sum("one", alias_name="n_keys"),
                Max("nmax", alias_name="largest_block"),
            )
            .to_pandas()
            .set_index("rule")
        )

        def _safe(df: pd.DataFrame) -> pd.DataFrame:
            # empty filtered Datasets come back with no columns (Ray drops
            # the schema of fully-empty results)
            if "rule" not in df.columns:
                return pd.DataFrame({"rule": [], "key": [], "n": []})
            return df

        hot = _safe(counts.filter(expr=f"n > {hot_threshold}").to_pandas())
        big = (
            _safe(counts.filter(expr=f"n > {int((2 * cap_pairs) ** 0.5)}").to_pandas())
            if cap_pairs is not None
            else None
        )
    metrics: dict[int, dict] = {}
    hot_maps: dict[int, dict] = {}
    for i in rule_idxs:
        hi = hot[hot["rule"] == i]
        hot_maps[i] = {
            row["key"]: int(np.ceil(row["n"] / target_rows)) for _, row in hi.iterrows()
        }
        row = agg.loc[i] if i in agg.index else None
        m = {
            "rule": i,
            "n_keys": int(row["n_keys"]) if row is not None else 0,
            "total_pairs_pre_exclusion": int(row["pairs"]) if row is not None else 0,
            "largest_block_rows": int(row["largest_block"]) if row is not None else 0,
            "n_hot_keys_salted": len(hot_maps[i]),
        }
        if cap_pairs is not None:
            over = 0
            for nn in big[big["rule"] == i]["n"].to_numpy():
                p = nn * (nn - 1) // 2
                if p > cap_pairs:
                    over += int(p - cap_pairs)
            m["overflow_pairs_capped"] = over
        metrics[i] = m
    return metrics, hot_maps


def analyze_rule_skew(
    ds_keys, i: int, hot_threshold: int, target_rows: int, cap_pairs: int | None
) -> tuple[dict, dict]:
    """→ (metrics dict, hot-key → salt-partition-count map) for rule i.

    Metrics include exact overflow counts when capping is enabled, computed
    from the counts table (so capped pairs are accounted, not lost)."""
    counts = rule_key_counts(ds_keys, i)

    from ray.data.aggregate import Count, Max, Sum

    def _derived(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "pairs": n * (n - 1) / 2,
                "one": np.ones(len(t), np.int64),
                "nmax": n,
            }
        )

    agg = counts.map_batches(_derived, batch_format="pyarrow").aggregate(
        Sum("pairs", alias_name="pairs"),
        Sum("one", alias_name="n_keys"),
        Max("nmax", alias_name="largest_block"),
    )
    hot = counts.filter(expr=f"n > {hot_threshold}").to_pandas()
    hot_map = {
        row[bk_col(i)]: int(np.ceil(row["n"] / target_rows))
        for _, row in hot.iterrows()
    }
    metrics = {
        "rule": i,
        "n_keys": int(agg["n_keys"] or 0),
        "total_pairs_pre_exclusion": int(agg["pairs"] or 0),
        "largest_block_rows": int(agg["largest_block"] or 0),
        "n_hot_keys_salted": len(hot_map),
    }
    if cap_pairs is not None:
        # overflow only possible in blocks with pairs > cap
        over = 0
        big = counts.filter(expr=f"n > {int((2 * cap_pairs) ** 0.5)}").to_pandas()
        for nn in big["n"].to_numpy():
            p = nn * (nn - 1) // 2
            if p > cap_pairs:
                over += int(p - cap_pairs)
        metrics["overflow_pairs_capped"] = over
    return metrics, hot_map


# ---------------------------------------------------------------------------
# pair generation (B2/B3/B4)
# ---------------------------------------------------------------------------


def _triangle(n: int) -> tuple[np.ndarray, np.ndarray]:
    return np.triu_indices(n, k=1)


def _pairgen_bucket(
    tbl: pa.Table,
    rule_idx: int,
    uid_col: str,
    out_cols: list[str],
    earlier_bks: list[str],
    cap_pairs: int | None,
    link_type: str,
    source_col: str,
) -> pa.Table:
    """Single-rule wrapper around :func:`_pairgen_bucket_multi` (used by the
    exploding-rule path and tests)."""
    t = tbl.append_column(RULE_COL, pa.array(np.full(len(tbl), rule_idx, np.int32)))
    return _pairgen_bucket_multi(
        t, uid_col, out_cols, {rule_idx: earlier_bks}, cap_pairs, link_type, source_col
    )


def _pairgen_bucket_multi(
    tbl: pa.Table,
    uid_col: str,
    out_cols: list[str],
    earlier_by_rule: dict[int, list[str]],
    cap_pairs: int | None,
    link_type: str,
    source_col: str,
) -> pa.Table:
    """All pair-groups (possibly of several blocking rules) in one bucket →
    pair table. One exchange serves every rule: rows carry ``__rule`` and a
    rule-prefixed group label, so R rules cost one sort instead of R (the
    per-stage fixed latency was the scaling bottleneck at bench sizes).
    Vectorized index build + per-rule ``take``; no per-row python in the
    emit path."""
    t = tbl.sort_by([(PG_COL, "ascending"), (uid_col, "ascending")])
    pg_arr = t[PG_COL].combine_chunks() if isinstance(t[PG_COL], pa.ChunkedArray) else t[PG_COL]
    salt = t[SALT_COL].to_numpy(zero_copy_only=False)
    rule_arr = t[RULE_COL].to_numpy(zero_copy_only=False)

    from .exchange import group_starts

    starts = group_starts(pg_arr)
    ends = np.append(starts[1:], len(pg_arr))
    # only GROUP-START labels are parsed (salt-slot suffix) — O(groups)
    # python, not O(rows)
    start_labels = pg_arr.take(pa.array(starts)).to_pylist() if len(starts) else []

    by_rule_li: dict[int, list[np.ndarray]] = {}
    by_rule_ri: dict[int, list[np.ndarray]] = {}
    for gi, (s, e) in enumerate(zip(starts, ends)):
        label = start_labels[gi]
        if "\x1e" in label:
            s1s2 = label.rsplit("\x1e", 1)[1]
            s1, s2 = (int(x) for x in s1s2.split("_"))
        else:
            s1 = s2 = None
        if s1 is None or s1 == s2:
            rows = (
                np.arange(s, e)
                if s1 is None
                else np.arange(s, e)[salt[s:e] == s1]
            )
            n = rows.size
            if n < 2:
                continue
            a, b = _triangle(n)
            li, ri = rows[a], rows[b]
        else:
            rows_a = np.arange(s, e)[salt[s:e] == s1]
            rows_b = np.arange(s, e)[salt[s:e] == s2]
            if rows_a.size == 0 or rows_b.size == 0:
                continue
            li = np.repeat(rows_a, rows_b.size)
            ri = np.tile(rows_b, rows_a.size)
            # orient so uid_l < uid_r (rows are uid-sorted within the group,
            # but cross-slot order is arbitrary)
            swap = li > ri
            li2 = np.where(swap, ri, li)
            ri = np.where(swap, li, ri)
            li = li2
        if cap_pairs is not None and li.size > cap_pairs:
            li, ri = li[:cap_pairs], ri[:cap_pairs]
        r = int(rule_arr[s])
        by_rule_li.setdefault(r, []).append(li)
        by_rule_ri.setdefault(r, []).append(ri)

    parts: list[pa.Table] = []
    for r in sorted(earlier_by_rule):
        earlier_bks = earlier_by_rule[r]
        if r in by_rule_li:
            li = np.concatenate(by_rule_li[r])
            ri = np.concatenate(by_rule_ri[r])
        else:
            li = ri = np.array([], np.int64)
        # dict.fromkeys: same overlap invariant as the fused path below —
        # duplicate names would make lt[uid_col] ambiguous
        take_cols = list(dict.fromkeys([uid_col] + out_cols + earlier_bks))
        lt = t.select(take_cols).take(pa.array(li))
        rt = t.select(take_cols).take(pa.array(ri))

        keep = np.ones(len(li), bool)
        if link_type == "link_only" and source_col in out_cols:
            keep &= ~pc.equal(lt[source_col], rt[source_col]).to_numpy(zero_copy_only=False)
        # cross-rule exclusion (B3): drop pairs already produced by earlier rules
        for c in earlier_bks:
            eq = pc.and_(
                pc.and_(pc.is_valid(lt[c]), pc.is_valid(rt[c])),
                pc.equal(lt[c], rt[c]),
            )
            keep &= ~pc.fill_null(eq, False).to_numpy(zero_copy_only=False)

        data = {f"{uid_col}_l": lt[uid_col], f"{uid_col}_r": rt[uid_col]}
        for c in out_cols:
            data[f"{c}_l"] = lt[c]
            data[f"{c}_r"] = rt[c]
        data[MATCH_KEY_COL] = pa.array(np.full(len(li), r, np.int32), pa.int32())
        out = pa.table(data)
        if not keep.all():
            out = out.filter(pa.array(keep))
        parts.append(out)
    return parts[0] if len(parts) == 1 else pa.concat_tables(parts)


class _MultiSaltExpander:
    """map_batches fn: emit one row per (record, rule) with a rule-prefixed
    group label (+ salt-slot replication for hot keys) — all rules share ONE
    downstream exchange. Hot-key maps broadcast once via ``ray.put``.

    Used as a PLAIN callable (task pool): the instance pickles the tiny
    object ref; the map itself is fetched once per worker process via
    ``_fetch_broadcast`` (no actor-pool startup/ramp latency)."""

    def __init__(self, hot_ref, rule_idxs: list[int], uid_col: str):
        self.hot_ref = hot_ref
        self.rule_idxs = rule_idxs
        self.uid_col = uid_col

    @property
    def hot(self) -> dict:
        return _fetch_broadcast(self.hot_ref) or {}

    def __call__(self, t: pa.Table) -> pa.Table:
        from .exchange import hash_values

        parts = []
        for i in self.rule_idxs:
            key_c = bk_col(i)
            sub = t.filter(pc.is_valid(t[key_c]))
            if len(sub) == 0:
                continue
            karr = sub[key_c]
            if isinstance(karr, pa.ChunkedArray):
                karr = karr.combine_chunks()
            # rule-prefixed group labels, fully in Arrow (no Python-object
            # boxing of O(records) key strings)
            labels_all = pc.binary_join_element_wise(
                pa.scalar(f"{i}\x1d"), karr, ""
            )
            hot = self.hot.get(i) or {}
            default_p = hot.get("*", 1)
            if not hot or (default_p == 1 and not any(v > 1 for v in hot.values())):
                part = sub.append_column(PG_COL, labels_all)
                part = part.append_column(SALT_COL, pa.array(np.zeros(len(sub), np.int32)))
                parts.append(part.append_column(RULE_COL, pa.array(np.full(len(sub), i, np.int32))))
                continue
            # per-row salt-partition counts via dictionary-encode: the hot
            # map is consulted once per DISTINCT key (small), then fanned out
            # with one vectorized take
            enc = karr.dictionary_encode()
            uniq = enc.dictionary.to_pylist()
            p_per_uniq = np.fromiter(
                (hot.get(k, default_p) for k in uniq), np.int64, len(uniq)
            )
            ps = p_per_uniq[enc.indices.to_numpy(zero_copy_only=False)]
            plain = ps == 1
            if plain.any():
                mask = pa.array(plain)
                tp = sub.filter(mask)
                part = tp.append_column(PG_COL, labels_all.filter(mask))
                part = part.append_column(SALT_COL, pa.array(np.zeros(int(plain.sum()), np.int32)))
                parts.append(part.append_column(RULE_COL, pa.array(np.full(len(tp), i, np.int32))))
            hot_idx = np.flatnonzero(~plain)
            if hot_idx.size:
                p_hot = ps[hot_idx]
                uid_arr = sub[self.uid_col]
                if isinstance(uid_arr, pa.ChunkedArray):
                    uid_arr = uid_arr.combine_chunks()
                salts = (
                    hash_values(uid_arr.take(pa.array(hot_idx)))
                    % p_hot.astype(np.uint64)
                ).astype(np.int64)
                # vectorized slot expansion: row r replicates into p_r rows,
                # one per unordered slot-pair {(min(s,o), max(s,o))}
                rep_rows = np.repeat(hot_idx, p_hot)
                total = int(p_hot.sum())
                off = np.concatenate(([0], np.cumsum(p_hot)[:-1]))
                other = np.arange(total, dtype=np.int64) - np.repeat(off, p_hot)
                s_rep = np.repeat(salts, p_hot)
                a = np.minimum(s_rep, other)
                b = np.maximum(s_rep, other)
                base_rep = labels_all.take(pa.array(rep_rows))
                ab = pc.binary_join_element_wise(
                    pc.cast(pa.array(a), pa.string()),
                    pc.cast(pa.array(b), pa.string()),
                    "_",
                )
                lab = pc.binary_join_element_wise(base_rep, ab, "\x1e")
                th = sub.take(pa.array(rep_rows))
                part = th.append_column(PG_COL, lab)
                part = part.append_column(SALT_COL, pa.array(s_rep.astype(np.int32)))
                parts.append(part.append_column(RULE_COL, pa.array(np.full(len(th), i, np.int32))))
        if not parts:
            out = t.slice(0, 0)
            out = out.append_column(PG_COL, pa.array([], pa.string()))
            out = out.append_column(SALT_COL, pa.array([], pa.int32()))
            return out.append_column(RULE_COL, pa.array([], pa.int32()))
        return pa.concat_tables(parts)


class _SaltExpander:
    """map_batches fn: replicate hot-key rows across salt-slot pairs.

    Plain callable; hot-key map broadcast once via ``ray.put`` and fetched
    per worker process through ``_fetch_broadcast`` (not per batch)."""

    def __init__(self, hot_ref, key_c: str, uid_col: str):
        self.hot_ref = hot_ref
        self.key_c = key_c
        self.uid_col = uid_col

    @property
    def hot(self) -> dict:
        return _fetch_broadcast(self.hot_ref) or {}

    def __call__(self, t: pa.Table) -> pa.Table:
        key_c, uid_col = self.key_c, self.uid_col
        t = t.filter(pc.is_valid(t[key_c]))
        if len(t) == 0:
            out = t.append_column(PG_COL, pa.array([], pa.string()))
            return out.append_column(SALT_COL, pa.array([], pa.int32()))
        keys = np.asarray(t[key_c].to_pylist(), dtype=object)
        if not self.hot:
            return t.append_column(PG_COL, pa.array(keys, pa.string())).append_column(
                SALT_COL, pa.array(np.zeros(len(t), np.int32))
            )
        default_p = self.hot.get("*", 1)
        ps = np.fromiter((self.hot.get(k, default_p) for k in keys), np.int64, len(keys))
        plain = ps == 1
        out_parts = []
        if plain.any():
            tp = t.filter(pa.array(plain))
            out_parts.append(
                tp.append_column(PG_COL, pa.array(keys[plain], pa.string())).append_column(
                    SALT_COL, pa.array(np.zeros(int(plain.sum()), np.int32))
                )
            )
        hot_idx = np.flatnonzero(~plain)
        if hot_idx.size:
            uids = np.asarray(t[uid_col].to_pylist(), dtype=object)[hot_idx]
            salts = (
                pd.util.hash_array(uids, categorize=False)
                % ps[hot_idx].astype(np.uint64)
            ).astype(np.int64)
            rep_rows, labels, rep_salts = [], [], []
            for row, k, p, s in zip(hot_idx, keys[hot_idx], ps[hot_idx], salts):
                for other in range(p):
                    a, b = (s, other) if s <= other else (other, s)
                    rep_rows.append(row)
                    labels.append(f"{k}\x1e{a}_{b}")
                    rep_salts.append(s)
            th = t.take(pa.array(np.asarray(rep_rows)))
            out_parts.append(
                th.append_column(PG_COL, pa.array(labels, pa.string())).append_column(
                    SALT_COL, pa.array(np.asarray(rep_salts, np.int32))
                )
            )
        return pa.concat_tables(out_parts)


# per-worker-process caches for the fused pairgen+score tasks: the DuckDB
# kernel is a process singleton already (duckdb_kernels.get_kernel); TF maps
# and hot-key maps are fetched from plasma once per process per object ref
_TF_CACHE: dict = {}
_BCAST_CACHE: dict = {}


def _fetch_broadcast(ref):
    """ray.get(ref) memoized per worker process (plain tasks get the same
    amortization an actor pool would, without the pool's startup/ramp cost)."""
    if ref is None:
        return None
    key = ref.hex() if hasattr(ref, "hex") else str(ref)
    if key not in _BCAST_CACHE:
        import ray

        _BCAST_CACHE[key] = ray.get(ref)
    return _BCAST_CACHE[key]


def _fused_tf_maps(tf_refs):
    if not tf_refs:
        return {}
    key = tuple(sorted((c, ref.hex() if hasattr(ref, "hex") else str(ref)) for c, ref in tf_refs.items()))
    if key not in _TF_CACHE:
        import ray

        from .tf import tf_map_to_arrays

        # string values are sentinels (tf.TF_FROM_COLUMNS), not object refs;
        # dicts convert to Arrow arrays ONCE per process for pc.index_in
        _TF_CACHE[key] = {
            c: (ref if isinstance(ref, str) else tf_map_to_arrays(ray.get(ref)))
            for c, ref in tf_refs.items()
        }
    return _TF_CACHE[key]


def _make_fused_fn(settings, rule_idx, earlier_bks, out_cols, tf_refs, keep_cols):
    """Pair generation + gamma + FS scoring in ONE task.

    The wide (column-doubled) pair table exists only task-locally; only the
    narrow scored rows (ids, match_key, gammas, weight, probability) leave
    through the object store. Measured on 22M pairs / 1M turns: the unfused
    path spent >100 s shipping ~5 GB of doubled text between pairgen and the
    scorer. Plain tasks (not an actor pool): actor-based map_groups after a
    sort stalls at low CPU counts; process-level caches keep the per-task
    setup cost near zero anyway."""
    from ..settings import make_eval_context

    def _fn(t: pa.Table) -> pa.Table:
        from .scoring import score_pair_batch

        pairs = _pairgen_bucket(
            t,
            rule_idx,
            settings.unique_id_column_name,
            out_cols,
            earlier_bks,
            settings.max_pairs_per_block,
            settings.link_type,
            settings.source_dataset_column_name,
        )
        ctx = make_eval_context(settings)
        return score_pair_batch(
            pairs, settings, ctx, _fused_tf_maps(tf_refs), keep_cols
        )

    return _fn


def _pairgen_score_stream(
    tbl: pa.Table,
    settings: Settings,
    out_cols: list[str],
    earlier_by_rule: dict[int, list[str]],
    tf_refs,
    keep_cols: list[str],
    chunk_pairs: int | None = None,
):
    """Generator: pair indices for the whole bucket, then take→score→yield in
    ``chunk_pairs`` slices. Peak memory per task stays ~chunk-sized even for
    multi-million-pair blocks (a 2.4M-pair block's wide table is ~1.5 GB;
    32 concurrent tasks of those thrash the heap — measured 471k pairs/s at
    32 CPUs, chunked it is compute-bound again). Default 512k pairs/chunk:
    with per-bucket dictionary encoding the chunk gathers move int32 codes
    (~8× narrower than the r3 string chunks), so a larger chunk re-amortizes
    per-chunk kernel setup — A/B swept 256k/512k/1M at 32 CPUs (BASELINE.md
    round-5 chunk sweep); 512k won, 1M was flat-to-worse (heap pressure).
    ``SPLINK_RAY_CHUNK_PAIRS`` overrides."""
    from ..settings import make_eval_context
    from .scoring import score_pair_batch

    if chunk_pairs is None:
        chunk_pairs = int(os.environ.get("SPLINK_RAY_CHUNK_PAIRS", "524288"))

    uid_col = settings.unique_id_column_name
    cap_pairs = settings.max_pairs_per_block
    link_type = settings.link_type
    source_col = settings.source_dataset_column_name

    t = tbl.sort_by([(PG_COL, "ascending"), (uid_col, "ascending")])
    pg_arr = t[PG_COL].combine_chunks() if isinstance(t[PG_COL], pa.ChunkedArray) else t[PG_COL]
    if len(pg_arr) == 0:
        return
    salt = t[SALT_COL].to_numpy(zero_copy_only=False)
    rule_arr = t[RULE_COL].to_numpy(zero_copy_only=False)

    from .exchange import group_starts

    starts = group_starts(pg_arr)
    ends = np.append(starts[1:], len(pg_arr))
    # group-START labels only (salt-slot suffix parse) — O(groups) python
    start_labels = pg_arr.take(pa.array(starts)).to_pylist()

    by_rule_li: dict[int, list[np.ndarray]] = {}
    by_rule_ri: dict[int, list[np.ndarray]] = {}
    for gi, (s, e) in enumerate(zip(starts, ends)):
        label = start_labels[gi]
        if "\x1e" in label:
            s1s2 = label.rsplit("\x1e", 1)[1]
            s1, s2 = (int(x) for x in s1s2.split("_"))
        else:
            s1 = s2 = None
        if s1 is None or s1 == s2:
            rows = np.arange(s, e) if s1 is None else np.arange(s, e)[salt[s:e] == s1]
            if rows.size < 2:
                continue
            a, b = _triangle(rows.size)
            li, ri = rows[a], rows[b]
        else:
            rows_a = np.arange(s, e)[salt[s:e] == s1]
            rows_b = np.arange(s, e)[salt[s:e] == s2]
            if rows_a.size == 0 or rows_b.size == 0:
                continue
            li = np.repeat(rows_a, rows_b.size)
            ri = np.tile(rows_b, rows_a.size)
            swap = li > ri
            li2 = np.where(swap, ri, li)
            ri = np.where(swap, li, ri)
            li = li2
        if cap_pairs is not None and li.size > cap_pairs:
            li, ri = li[:cap_pairs], ri[:cap_pairs]
        r = int(rule_arr[s])
        by_rule_li.setdefault(r, []).append(li)
        by_rule_ri.setdefault(r, []).append(ri)

    ctx = make_eval_context(settings)
    tf_maps = _fused_tf_maps(tf_refs)
    for r in sorted(by_rule_li):
        earlier_bks = earlier_by_rule[r]
        li = np.concatenate(by_rule_li[r])
        ri = np.concatenate(by_rule_ri[r])
        # dict.fromkeys: uid_col/out_cols/earlier_bks may overlap, and the
        # pa.table(dict(...)) rebuild below would silently collapse
        # duplicate names (ADVICE r4) — make uniqueness explicit
        take_cols = list(dict.fromkeys([uid_col] + out_cols + earlier_bks))
        sel = t.select(take_cols)
        # dictionary-encode string comparison columns ONCE per bucket: the
        # per-chunk pair takes then gather int32 indices instead of copying
        # the (long) strings, and the similarity kernels consume the codes
        # directly (duckdb_kernels dedup + native jaro_arrow_idx). The
        # encoded columns never surface: fused scoring projects them away.
        enc_ok = {c for c in out_cols if c != source_col}
        cols = []
        for c in sel.column_names:
            col = sel[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if c in enc_ok and (
                pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
            ):
                col = pc.dictionary_encode(col)
            cols.append(col)
        sel = pa.table(dict(zip(sel.column_names, cols)))
        for lo in range(0, len(li), chunk_pairs):
            cl = pa.array(li[lo : lo + chunk_pairs])
            cr = pa.array(ri[lo : lo + chunk_pairs])
            lt = sel.take(cl)
            rt = sel.take(cr)
            keep = np.ones(len(cl), bool)
            if link_type == "link_only" and source_col in out_cols:
                keep &= ~pc.equal(lt[source_col], rt[source_col]).to_numpy(zero_copy_only=False)
            for c in earlier_bks:
                eq = pc.and_(
                    pc.and_(pc.is_valid(lt[c]), pc.is_valid(rt[c])),
                    pc.equal(lt[c], rt[c]),
                )
                keep &= ~pc.fill_null(eq, False).to_numpy(zero_copy_only=False)
            data = {f"{uid_col}_l": lt[uid_col], f"{uid_col}_r": rt[uid_col]}
            for c in out_cols:
                data[f"{c}_l"] = lt[c]
                data[f"{c}_r"] = rt[c]
            data[MATCH_KEY_COL] = pa.array(np.full(len(cl), r, np.int32), pa.int32())
            wide = pa.table(data)
            if not keep.all():
                wide = wide.filter(pa.array(keep))
            yield score_pair_batch(wide, settings, ctx, tf_maps, keep_cols)


def generate_pairs(
    records_ds,
    settings: Settings,
    num_buckets: int | None = None,
    analyze_skew: bool = True,
    collect_metrics: bool = True,
    score_inline: bool = False,
    tf_refs: dict | None = None,
    sink_dir: str | None = None,
    sink_threshold: float | None = None,
    extra_record_cols: list[str] | None = None,
    edge_dir: str | None = None,
    edge_threshold: float | None = None,
):
    """Records Dataset → candidate-pair Dataset + blocking metrics.

    The pair table has column doubling (``c_l`` / ``c_r``) for every column
    the comparisons need, plus ``match_key`` (SURVEY.md §1.3).

    ``score_inline=True`` fuses gamma + FS scoring into the pairgen bucket
    task (actor pool holding the DuckDB kernel + broadcast TF maps) and emits
    only narrow scored rows — the fast path ``predict()`` uses when matching
    columns need not be retained.

    ``sink_dir`` (requires ``score_inline``): RESUMABLE bucket sink — each
    bucket task writes its own scored partition ``{sink_dir}/bucket-<id>/``
    (atomic tmp+rename, ``_DONE`` marker) and emits one stats row instead of
    data; buckets whose ``_DONE`` already exists are skipped WITHOUT
    rescoring (north_rule: a killed predict resumes at bucket granularity).
    ``sink_threshold`` filters match_probability before writing.

    ``edge_dir``/``edge_threshold`` (sink mode only): each bucket ALSO writes
    the narrow clustering edge list (uid_l, uid_r, match_probability ≥
    edge_threshold) as ``{edge_dir}/bucket-<id>.parquet`` while the scored
    chunks are in hand — the downstream connected-components stage reads the
    tiny sidecar instead of re-scanning the full scored table (a fixed
    re-read that does not shrink with cluster size)."""
    rules = settings.blocking_rules_to_generate_predictions
    if not rules:
        raise ValueError("no blocking rules configured")
    if score_inline and any(r.is_exploding for r in rules):
        raise ValueError("score_inline does not support exploding rules")
    if sink_dir is not None and not score_inline:
        raise ValueError("sink_dir requires score_inline=True")
    from ..validation import validate_settings_against_dataset

    validate_settings_against_dataset(settings, records_ds)
    uid = settings.unique_id_column_name
    out_cols = sorted(settings.columns_needed() - {uid})
    # extra record columns to double into the pair table (e.g. join-attached
    # tf_<col> for huge-cardinality TF — stages.tf.prepare_tf)
    if extra_record_cols:
        out_cols = sorted(set(out_cols) | set(extra_record_cols))
    # link jobs need the source column in the pair table for the
    # cross-source-only / both-kinds predicates
    if settings.link_type != "dedupe_only":
        src_c = settings.source_dataset_column_name
        if src_c not in out_cols:
            out_cols = sorted(out_cols + [src_c])
    if num_buckets is None:
        num_buckets = default_num_buckets()

    # fused scoring never emits the raw pair columns, so its wide chunks
    # only need what the comparisons (and retention/link predicates) read —
    # blocking-key SOURCE columns (already shipped as bk_*) drop out of the
    # take entirely
    score_cols = out_cols
    if score_inline:
        comp_cols: set = set()
        for c in settings.comparisons:
            comp_cols |= c.columns_used()
        comp_cols |= set(settings.additional_columns_to_retain)
        if extra_record_cols:
            comp_cols |= set(extra_record_cols)
        if settings.link_type != "dedupe_only":
            comp_cols.add(settings.source_dataset_column_name)
        score_cols = sorted(comp_cols - {uid})

    metrics: dict = {"rules": []}
    non_exploding = [r for r in rules if not r.is_exploding]
    plain_keys = None
    if non_exploding:
        plain_keys = derive_block_keys(records_ds, rules)
        # project to what pairgen needs BEFORE the exchange: records often
        # carry heavy payload columns (turn_texts ≈ the whole conversation)
        # that no comparison reads — shipping them through the sort wastes
        # most of the exchange bandwidth
        needed = [uid] + (score_cols if score_inline else out_cols) + [
            bk_col(j) for j in range(len(rules))
        ]
        # batch_size here also BUNDLES tiny input blocks (a records table
        # re-read from a many-partition sink arrives as sub-1k-row blocks;
        # 314 blocks × 314 sort partitions = ~100k shuffle objects whose
        # scheduling dwarfed the exchange's ~10 core-s of real work —
        # measured 36.3 s → 24.0 s on the 156M-pair bench at 4096). It
        # never SPLITS big blocks into extra tasks, so large-scale inputs
        # with healthy block sizes pass through unchanged.
        proj_batch = int(os.environ.get("SPLINK_RAY_PROJ_BATCH", "4096")) or None
        plain_keys = plain_keys.map_batches(
            lambda t, cols=tuple(needed): t.select([c for c in cols if c in t.column_names]),
            batch_format="pyarrow",
            batch_size=proj_batch,
        )
    plain_metrics: dict[int, dict] = {}
    plain_hot: dict[int, dict] = {}
    if plain_keys is not None and (analyze_skew or collect_metrics):
        # the skew analysis AND the pairgen exchange both consume the keyed
        # projection: materialize it ONCE so key derivation runs a single
        # time (it executed twice before — the dominant fixed cost the
        # round-1 scaling measurement flagged)
        plain_keys = plain_keys.materialize()
        plain_idxs = [i for i, r in enumerate(rules) if not r.is_exploding]
        try:
            n_records = plain_keys.count()  # metadata count on materialized
        except Exception:
            n_records = None
        plain_metrics, plain_hot = analyze_all_rules_skew(
            plain_keys,
            plain_idxs,
            settings.hot_key_threshold,
            settings.target_rows_per_salted_block,
            settings.max_pairs_per_block,
            approx_records=n_records,
        )
    keep_cols = [f"{uid}_l", f"{uid}_r", MATCH_KEY_COL] + [
        f"{c}_{s}"
        for c in settings.additional_columns_to_retain
        for s in ("l", "r")
    ]
    pair_dss = []

    # ---- all non-exploding rules share ONE exchange ----------------------
    plain_idxs = [i for i, r in enumerate(rules) if not r.is_exploding]
    if plain_idxs:
        hot_by_rule: dict[int, dict] = {}
        for i in plain_idxs:
            hm = dict(plain_hot.get(i, {}))
            if rules[i].salting_partitions > 1:
                hm = {"*": rules[i].salting_partitions, **hm}
            if hm:
                hot_by_rule[i] = hm
            if analyze_skew or collect_metrics:
                if i in plain_metrics:
                    metrics["rules"].append(plain_metrics[i])
        hot_ref = broadcast(hot_by_rule) if hot_by_rule else None
        expanded = plain_keys.map_batches(
            _MultiSaltExpander(hot_ref, plain_idxs, uid),
            batch_format="pyarrow",
        )
        earlier_by_rule = {i: [bk_col(j) for j in range(i)] for i in plain_idxs}

        if score_inline:

            def _bucket_fn(t: pa.Table) -> pa.Table:
                # chunked take→score keeps peak memory ~chunk-sized; only the
                # NARROW scored chunks are held and concatenated (the wide
                # chunk is dropped as soon as it's scored)
                chunks = list(
                    _pairgen_score_stream(
                        t, settings, score_cols, earlier_by_rule, tf_refs, keep_cols
                    )
                )
                if chunks:
                    return chunks[0] if len(chunks) == 1 else pa.concat_tables(chunks)
                from ..settings import make_eval_context
                from .scoring import score_pair_batch

                empty_wide = _pairgen_bucket_multi(
                    t.slice(0, 0),
                    uid,
                    score_cols,
                    earlier_by_rule,
                    None,
                    settings.link_type,
                    settings.source_dataset_column_name,
                )
                return score_pair_batch(
                    empty_wide, settings, make_eval_context(settings), {}, keep_cols
                )
        else:

            def _bucket_fn(t: pa.Table) -> pa.Table:
                return _pairgen_bucket_multi(
                    t,
                    uid,
                    out_cols,
                    earlier_by_rule,
                    settings.max_pairs_per_block,
                    settings.link_type,
                    settings.source_dataset_column_name,
                )

        if score_inline and sink_dir is not None:

            def _empty_scored(t: pa.Table) -> pa.Table:
                from ..settings import make_eval_context
                from .scoring import score_pair_batch

                empty_wide = _pairgen_bucket_multi(
                    t.slice(0, 0),
                    uid,
                    score_cols,
                    earlier_by_rule,
                    None,
                    settings.link_type,
                    settings.source_dataset_column_name,
                )
                return score_pair_batch(
                    empty_wide, settings, make_eval_context(settings), {}, keep_cols
                )

            def _bucket_sink_fn(t: pa.Table) -> pa.Table:
                import os
                import shutil

                import pyarrow.parquet as pq

                from .exchange import BUCKET_COL

                bid = int(t[BUCKET_COL][0].as_py()) if len(t) else -1

                def _stats(rows: int, skipped: bool) -> pa.Table:
                    return pa.table(
                        {
                            "bucket": pa.array([bid], pa.int32()),
                            "rows": pa.array([rows], pa.int64()),
                            "skipped": pa.array([skipped], pa.bool_()),
                        }
                    )

                part = os.path.join(sink_dir, f"bucket-{bid}")
                if os.path.exists(os.path.join(part, "_DONE")):
                    return _stats(-1, True)  # resume: bucket NOT rescored
                t2 = t.drop_columns([BUCKET_COL])
                tmp = part + ".tmp"
                shutil.rmtree(tmp, ignore_errors=True)
                os.makedirs(tmp, exist_ok=True)
                uid_l, uid_r = f"{uid}_l", f"{uid}_r"
                writer = None
                edge_parts: list[pa.Table] = []
                rows = 0
                for chunk in _pairgen_score_stream(
                    t2, settings, score_cols, earlier_by_rule, tf_refs, keep_cols
                ):
                    if sink_threshold is not None and len(chunk):
                        chunk = chunk.filter(
                            pc.greater_equal(chunk["match_probability"], sink_threshold)
                        )
                    if edge_dir is not None and len(chunk):
                        e = chunk.select([uid_l, uid_r, "match_probability"])
                        if edge_threshold is not None:
                            e = e.filter(
                                pc.greater_equal(e["match_probability"], edge_threshold)
                            )
                        if len(e):
                            edge_parts.append(e)
                    if writer is None:
                        writer = pq.ParquetWriter(
                            os.path.join(tmp, "part-0.parquet"), chunk.schema
                        )
                    writer.write_table(chunk)
                    rows += len(chunk)
                if writer is None:
                    empty = _empty_scored(t2)
                    writer = pq.ParquetWriter(
                        os.path.join(tmp, "part-0.parquet"), empty.schema
                    )
                    writer.write_table(empty)
                writer.close()
                if edge_dir is not None:
                    # edge sidecar lands BEFORE the _DONE marker so a skipped
                    # (resumed) bucket always has its edges on disk
                    os.makedirs(edge_dir, exist_ok=True)
                    if edge_parts:
                        etbl = pa.concat_tables(edge_parts)
                    else:
                        etbl = pa.table(
                            {
                                uid_l: pa.array([], _empty_scored(t2)[uid_l].type),
                                uid_r: pa.array([], _empty_scored(t2)[uid_r].type),
                                "match_probability": pa.array([], pa.float64()),
                            }
                        )
                    epath = os.path.join(edge_dir, f"bucket-{bid}.parquet")
                    pq.write_table(etbl, epath + ".tmp")
                    os.replace(epath + ".tmp", epath)
                shutil.rmtree(part, ignore_errors=True)  # stale partial (no _DONE)
                os.rename(tmp, part)
                open(os.path.join(part, "_DONE"), "w").close()
                return _stats(rows, False)

            pair_dss.append(
                keyed_map(
                    expanded, PG_COL, _bucket_sink_fn,
                    num_buckets=num_buckets, drop_bucket=False,
                )
            )
        else:
            pair_dss.append(
                keyed_map(expanded, PG_COL, _bucket_fn, num_buckets=num_buckets)
            )

    # ---- exploding rules: per-rule legacy path ---------------------------
    for i, rule in enumerate(rules):
        if not rule.is_exploding:
            continue
        ds_keys = derive_block_keys(explode_for_rule(records_ds, rule), rules)
        hot_map: dict = {}
        if analyze_skew or collect_metrics:
            m, hot_map = analyze_rule_skew(
                ds_keys,
                i,
                settings.hot_key_threshold,
                settings.target_rows_per_salted_block,
                settings.max_pairs_per_block,
            )
            metrics["rules"].append(m)
        if rule.salting_partitions > 1:
            hot_map = {"*": rule.salting_partitions, **hot_map}
        hot_ref = broadcast(hot_map) if hot_map else None
        expanded = ds_keys.map_batches(
            _SaltExpander(hot_ref, bk_col(i), uid),
            batch_format="pyarrow",
        )
        earlier = [bk_col(j) for j in range(i)]

        def _mk(rule_idx, earlier_bks):
            def _pg(t: pa.Table) -> pa.Table:
                out = _pairgen_bucket(
                    t,
                    rule_idx,
                    uid,
                    out_cols,
                    earlier_bks,
                    settings.max_pairs_per_block,
                    settings.link_type,
                    settings.source_dataset_column_name,
                )
                # exploded records appear once per array element: two copies
                # of the SAME record can land in one block (repeated element)
                # — drop the self-pairs the row-position triangle emits
                return out.filter(pc.not_equal(out[f"{uid}_l"], out[f"{uid}_r"]))

            return _pg

        pairs_i = keyed_map(expanded, PG_COL, _mk(i, earlier), num_buckets=num_buckets)
        pairs_i = dedupe_pairs(pairs_i, uid, num_buckets)
        pair_dss.append(pairs_i)

    metrics["rules"].sort(key=lambda m: m["rule"])
    pairs = pair_dss[0]
    for p in pair_dss[1:]:
        pairs = pairs.union(p)
    return pairs, metrics


def dedupe_pairs(pairs_ds, uid: str, num_buckets: int | None = None):
    """Exact pair-id dedup for exploding rules (B5): keep first by match_key."""

    def _first(t: pa.Table) -> pa.Table:
        from .exchange import group_starts

        key = pc.binary_join_element_wise(
            pc.cast(t[f"{uid}_l"], pa.string()), pc.cast(t[f"{uid}_r"], pa.string()), "\x1f"
        )
        t = t.append_column("__pair", key)
        t = t.sort_by([("__pair", "ascending"), (MATCH_KEY_COL, "ascending")])
        keep = np.zeros(len(t), bool)
        keep[group_starts(t["__pair"])] = True
        return t.filter(pa.array(keep)).drop_columns(["__pair"])

    def _key(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t[f"{uid}_l"], pa.string()), pc.cast(t[f"{uid}_r"], pa.string()), "\x1f"
        )
        return t.append_column("__pairkey", key)

    ds = pairs_ds.map_batches(_key, batch_format="pyarrow")
    out = keyed_map(ds, "__pairkey", _first, num_buckets=num_buckets)
    return out.drop_columns(["__pairkey"])


def cumulative_comparisons_data(records_ds, settings: Settings, num_buckets=None):
    """B7: per-rule pair counts AFTER cross-rule exclusion + running total —
    the data behind the reference's ``cumulative_comparisons_…_chart``
    (``splink/internals/blocking_analysis.py``). Returns a pandas DataFrame
    (rule, description, n_pairs, cumulative)."""
    from ray.data.aggregate import Count

    pairs, _ = generate_pairs(
        records_ds, settings, num_buckets=num_buckets,
        analyze_skew=False, collect_metrics=False,
    )
    counts = (
        pairs.groupby(MATCH_KEY_COL).aggregate(Count(alias_name="n_pairs")).to_pandas()
    )
    rules = settings.blocking_rules_to_generate_predictions
    out = []
    cum = 0
    for i, rule in enumerate(rules):
        row = counts[counts[MATCH_KEY_COL] == i]
        n = int(row["n_pairs"].iloc[0]) if len(row) else 0
        cum += n
        out.append(
            {"rule": i, "description": rule.description, "n_pairs": n, "cumulative": cum}
        )
    return pd.DataFrame(out)
