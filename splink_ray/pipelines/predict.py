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

import pyarrow as pa

from ..settings import Settings
from ..stages.blocking import generate_pairs
from ..stages.exchange import broadcast
from ..stages.scoring import score_pairs
from ..stages.tf import compute_tf_maps


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
    if materialize_records:
        # blocking rules + tf tables branch from the records; materializing
        # once avoids re-reading the input per branch (SURVEY.md §2.1 S4)
        records_ds = records_ds.materialize()

    tf_cols = settings.tf_columns()
    tf_refs = None
    if tf_cols:
        maps = compute_tf_maps(records_ds, tf_cols)
        tf_refs = {c: broadcast(m) for c, m in maps.items()}

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
        )
        if threshold_match_probability is not None:
            scored = scored.filter(expr=f"match_probability >= {threshold_match_probability}")
        elif threshold_match_weight is not None:
            scored = scored.filter(expr=f"match_weight >= {threshold_match_weight}")
        return scored, metrics

    pairs, metrics = generate_pairs(
        records_ds, settings, num_buckets=num_buckets, analyze_skew=analyze_skew
    )
    scored = score_pairs(
        pairs,
        settings,
        tf_refs=tf_refs,
        threshold_match_probability=threshold_match_probability,
        threshold_match_weight=threshold_match_weight,
    )
    return scored, metrics


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
