"""The ``predict()`` pipeline — splink's flagship inference flow.

Reference trace (SURVEY.md §3.1; ``splink/internals/linker_components/
inference.py::predict``; /root/reference empty — §0):

    validate → vertical concat → term frequencies → blocking →
    comparison vectors → FS score → threshold filter

Ray shape (one streaming graph; the records input is materialized once since
blocking rules + tf each branch from it):

    read → [canonicalize] → union+source_dataset → materialize →
    tf partial-agg (broadcast dicts) → derive bk_* → salt-expand →
    hash-exchange pairgen (salted+capped) → fused gamma+score map_batches
    (actor pool) → filter(expr) → write_parquet / consume
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..settings import Settings
from ..stages.blocking import generate_pairs
from ..stages.exchange import broadcast
from ..stages.scoring import score_pairs
def vertically_concatenate(datasets: dict, settings: Settings):
    """M1: UNION ALL with an injected ``source_dataset`` literal per input.

    Reference: ``splink/internals/vertically_concatenate.py``.
    ``datasets`` maps source name → Dataset. Single-input dedupe jobs skip
    the source column entirely (like the reference)."""
    items = list(datasets.items())
    if len(items) == 1 and settings.link_type == "dedupe_only":
        return items[0][1]
    src_col = settings.source_dataset_column_name

    out = None
    for name, ds in items:
        def _add(t: pa.Table, name=name) -> pa.Table:
            if src_col in t.column_names:
                return t
            return t.append_column(src_col, pa.array([name] * len(t), pa.string()))

        d = ds.map_batches(_add, batch_format="pyarrow")
        out = d if out is None else out.union(d)
    return out


def predict(
    records_ds,
    settings: Settings,
    threshold_match_probability: float | None = None,
    threshold_match_weight: float | None = None,
    num_buckets: int | None = None,
    analyze_skew: bool = True,
    materialize_records: bool = True,
):
    """records Dataset → scored candidate-pair Dataset + blocking metrics.

    The input must already be flat entity records (run
    ``stages.canonicalize.canonicalize`` first for transcript payloads).
    """
    tf_cols = settings.tf_columns()
    # materialize the records only when something consumes them MORE than
    # once (tf branch, per-exploding-rule re-derivation). The plain pairgen
    # path materializes its own narrow keyed projection inside
    # generate_pairs, so materializing the full-width records there would
    # only add an object-store copy of payload columns nothing reads.
    reads_records_twice = bool(tf_cols) or any(
        r.is_exploding for r in settings.blocking_rules_to_generate_predictions
    )
    if materialize_records and reads_records_twice:
        records_ds = records_ds.materialize()
    tf_refs = None
    extra_cols = None
    if tf_cols:
        from ..stages.tf import TF_FROM_COLUMNS, prepare_tf

        records_ds, maps, join_cols = prepare_tf(
            records_ds, tf_cols, settings.tf_broadcast_limit
        )
        tf_refs = {c: broadcast(m) for c, m in maps.items()}
        for c in join_cols:  # huge-cardinality: tf rides the pair columns
            tf_refs[c] = TF_FROM_COLUMNS
        extra_cols = [f"tf_{c}" for c in join_cols] or None

    fuse = not settings.retain_matching_columns and not any(
        r.is_exploding for r in settings.blocking_rules_to_generate_predictions
    )
    if fuse:
        # fast path: pairgen + gamma + scoring in one bucket task — the wide
        # pair table never crosses the object store (see _FusedPairScoreBucket)
        scored, metrics = generate_pairs(
            records_ds,
            settings,
            num_buckets=num_buckets,
            analyze_skew=analyze_skew,
            score_inline=True,
            tf_refs=tf_refs,
            extra_record_cols=extra_cols,
        )
        if threshold_match_probability is not None:
            scored = scored.filter(expr=f"match_probability >= {threshold_match_probability}")
        elif threshold_match_weight is not None:
            scored = scored.filter(expr=f"match_weight >= {threshold_match_weight}")
        return scored, metrics

    pairs, metrics = generate_pairs(
        records_ds, settings, num_buckets=num_buckets, analyze_skew=analyze_skew,
        extra_record_cols=extra_cols,
    )
    scored = score_pairs(
        pairs,
        settings,
        tf_refs=tf_refs,
        threshold_match_probability=threshold_match_probability,
        threshold_match_weight=threshold_match_weight,
    )
    return scored, metrics


def predict_to_partitioned(
    records_ds,
    settings: Settings,
    scored_dir: str,
    threshold_match_probability: float | None = None,
    num_buckets: int | None = None,
    analyze_skew: bool = True,
    edge_dir: str | None = None,
    edge_threshold: float | None = None,
):
    """Fused predict whose output is written as one parquet partition PER
    BUCKET (``{scored_dir}/bucket-<id>/`` with atomic tmp+rename and a
    ``_DONE`` marker), so a killed run resumes at bucket granularity —
    already-finished buckets are skipped without rescoring (north_rule).

    Returns (scored Dataset reading ``scored_dir``, blocking metrics,
    bucket-stats DataFrame with a ``skipped`` flag per bucket). Requires the
    fused path (no retain_matching_columns, no exploding rules)."""
    import os

    import ray.data as rd

    from ..stages.exchange import default_num_buckets

    if settings.retain_matching_columns:
        raise ValueError(
            "predict_to_partitioned requires retain_matching_columns=False "
            "(the fused scoring path)"
        )
    if num_buckets is None:
        num_buckets = default_num_buckets()
    os.makedirs(scored_dir, exist_ok=True)

    tf_cols = settings.tf_columns()
    tf_refs = None
    extra_cols = None
    if tf_cols:
        from ..stages.tf import TF_FROM_COLUMNS, prepare_tf

        records_ds, maps, join_cols = prepare_tf(
            records_ds, tf_cols, settings.tf_broadcast_limit
        )
        tf_refs = {c: broadcast(m) for c, m in maps.items()}
        for c in join_cols:
            tf_refs[c] = TF_FROM_COLUMNS
        extra_cols = [f"tf_{c}" for c in join_cols] or None

    stats_ds, metrics = generate_pairs(
        records_ds,
        settings,
        num_buckets=num_buckets,
        analyze_skew=analyze_skew,
        score_inline=True,
        tf_refs=tf_refs,
        sink_dir=scored_dir,
        sink_threshold=threshold_match_probability,
        extra_record_cols=extra_cols,
        edge_dir=edge_dir,
        edge_threshold=edge_threshold,
    )
    stats = stats_ds.to_pandas()  # ≤ num_buckets rows
    scored = rd.read_parquet(scored_dir)
    return scored, metrics, stats


def find_matches_to_new_records(
    records_ds,
    new_tbl: pa.Table,
    settings: Settings,
    threshold_match_probability: float | None = None,
):
    """R1: block + score a SMALL batch of new records against the corpus.

    Reference: ``splink/internals/find_matches_to_new_records.py``. The new
    records (with their per-rule blocking keys precomputed driver-side) are
    broadcast via ``ray.put`` into a stateful matcher pool; each corpus batch
    derives its own keys and emits only new×base pairs for matching keys —
    gamma + FS scoring fused in the same task. ONE streaming pass over the
    corpus, no exchange, no corpus self-join (round-1 verdict finding #4:
    the old path scored the full self-join and discarded ~all of it).

    Pair orientation: ``_l`` = new record, ``_r`` = corpus record;
    ``match_key`` = index of the first blocking rule that matched
    (cross-rule exclusion identical to ``generate_pairs``)."""
    from ..stages.blocking import bk_col
    from ..stages.exchange import default_parallelism
    from ..stages.scoring import score_pair_batch
    from ..stages.tf import compute_tf_maps

    rules = settings.blocking_rules_to_generate_predictions
    if not rules:
        raise ValueError("no blocking rules configured")
    if any(r.is_exploding for r in rules):
        raise ValueError("find_matches_to_new_records does not support exploding rules")
    from ..validation import validate_settings_against_dataset, validate_settings_columns

    validate_settings_against_dataset(settings, records_ds)
    validate_settings_columns(settings, new_tbl.column_names)
    uid = settings.unique_id_column_name
    out_cols = sorted(settings.columns_needed() - {uid})

    new_keyed = new_tbl
    for i, rule in enumerate(rules):
        new_keyed = new_keyed.append_column(bk_col(i), rule.key_values(new_tbl))
    new_ref = broadcast(new_keyed)

    tf_cols = settings.tf_columns()
    tf_refs = None
    if tf_cols:
        maps = compute_tf_maps(records_ds, tf_cols)
        tf_refs = {c: broadcast(m) for c, m in maps.items()}

    class _NewRecordMatcher:
        def __init__(self, new_ref, settings, tf_refs):
            import ray

            from ..settings import make_eval_context

            self.new: pa.Table = ray.get(new_ref)
            self.settings = settings
            self.ctx = make_eval_context(settings)
            from ..stages.tf import tf_map_to_arrays

            # convert value→tf dicts to Arrow arrays once per actor
            self.tf_maps = {
                c: (r if isinstance(r, str) else tf_map_to_arrays(ray.get(r)))
                for c, r in (tf_refs or {}).items()
            }
            self.rules = settings.blocking_rules_to_generate_predictions
            # per-rule new-record keys (object ndarray) + non-null (key, row)
            # frame for the vectorized corpus merge
            self.new_keys: list[np.ndarray] = []
            self.new_frames: list = []
            for i in range(len(self.rules)):
                keys = np.asarray(self.new[bk_col(i)].to_pylist(), dtype=object)
                self.new_keys.append(keys)
                nn = np.flatnonzero(pd.notna(keys))
                self.new_frames.append(
                    pd.DataFrame({"__k": keys[nn], "__ni": nn.astype(np.int64)})
                )

        def __call__(self, t: pa.Table) -> pa.Table:
            s = self.settings
            uid = s.unique_id_column_name
            base_keys = [rule.key_values(t) for rule in self.rules]
            base_arrs = [
                np.asarray(bk.to_pylist(), dtype=object) for bk in base_keys
            ]
            parts = []
            for i in range(len(self.rules)):
                nf = self.new_frames[i]
                if nf.empty:
                    continue
                barr = base_arrs[i]
                bnn = np.flatnonzero(pd.notna(barr))
                if not len(bnn):
                    continue
                # vectorized hash-join of corpus keys against the (small)
                # new-record keys; left order = (corpus row asc, new row asc)
                # — identical to the former per-row index walk
                m = pd.DataFrame({"__k": barr[bnn], "__bi": bnn.astype(np.int64)}).merge(
                    nf, on="__k"
                )
                if m.empty:
                    continue
                ni = m["__ni"].to_numpy()
                bi = m["__bi"].to_numpy()
                # cross-rule exclusion: drop pairs an earlier rule already
                # emitted — one elementwise equality per earlier rule
                keep = np.ones(len(ni), bool)
                for j in range(i):
                    nk = self.new_keys[j][ni]
                    bk = base_arrs[j][bi]
                    keep &= ~((nk == bk) & pd.notna(nk))
                ni, bi = ni[keep], bi[keep]
                if not len(ni):
                    continue
                lt = self.new.select([uid] + out_cols).take(pa.array(ni))
                rt = t.select([uid] + out_cols).take(pa.array(bi))
                data = {f"{uid}_l": lt[uid], f"{uid}_r": rt[uid]}
                for c in out_cols:
                    data[f"{c}_l"] = lt[c]
                    data[f"{c}_r"] = rt[c]
                data["match_key"] = pa.array(np.full(len(ni), i, np.int32), pa.int32())
                parts.append(pa.table(data))
            if not parts:
                # emit an empty, correctly-typed pair table (Ray drops the
                # schema of columnless empties)
                lt = self.new.select([uid] + out_cols).slice(0, 0)
                data = {f"{uid}_l": lt[uid], f"{uid}_r": lt[uid]}
                for c in out_cols:
                    data[f"{c}_l"] = lt[c]
                    data[f"{c}_r"] = lt[c]
                data["match_key"] = pa.array([], pa.int32())
                wide = pa.table(data)
            else:
                wide = parts[0] if len(parts) == 1 else pa.concat_tables(parts)
            return score_pair_batch(wide, s, self.ctx, self.tf_maps, None)

    p = default_parallelism()
    scored = records_ds.map_batches(
        _NewRecordMatcher,
        batch_format="pyarrow",
        concurrency=(max(1, p // 2), max(2, p)),
        num_cpus=1,
        fn_constructor_kwargs={
            "new_ref": new_ref, "settings": settings, "tf_refs": tf_refs,
        },
    )
    if threshold_match_probability is not None:
        scored = scored.filter(expr=f"match_probability >= {threshold_match_probability}")
    return scored


def deterministic_link(records_ds, settings: Settings, num_buckets: int | None = None):
    """B6: pairs from the blocking rules only, probability 1, no model.

    Reference: ``linker_components/inference.py::deterministic_link``."""
    pairs, metrics = generate_pairs(
        records_ds, settings, num_buckets=num_buckets, analyze_skew=False,
        collect_metrics=False,
    )
    def _p1(t: pa.Table) -> pa.Table:
        import numpy as np

        return t.append_column(
            "match_probability", pa.array(np.ones(len(t)), pa.float64())
        )

    return pairs.map_batches(_p1, batch_format="pyarrow"), metrics
