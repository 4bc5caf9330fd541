"""Comparison-vector computation + Fellegi-Sunter scoring, fused.

Reference: ``splink/internals/comparison_vector_values.py::
compute_comparison_vector_values_sql`` (V1) and ``splink/internals/
predict.py::predict_from_comparison_vectors_sqls`` (§2.5/§2.6; /root/reference
empty — SURVEY.md §0). The reference materializes gammas then scores in a
second CTE; here both run in ONE ``map_batches`` pass over each zero-copy
Arrow pair batch — gamma cascade (ordered first-true-wins, vectorized) then
log2-Bayes-factor accumulation — so the pair table is scanned once.

Stateful actor pool: each actor holds the model settings, an embedded
single-thread DuckDB connection for string kernels, and the term-frequency
lookup tables (fetched once per actor from ``ray.put`` refs — broadcast, not
re-shipped per batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..model import score_gamma_table
from ..settings import Settings, make_eval_context


def _tf_lookup(tf_maps: dict, pairs: pa.Table, column: str) -> tuple[np.ndarray, np.ndarray]:
    from .tf import TF_FROM_COLUMNS, tf_map_to_arrays, tf_take

    m = tf_maps.get(column)
    if m is None:
        n = len(pairs)
        return np.full(n, np.nan), np.full(n, np.nan)
    if isinstance(m, str) and m == TF_FROM_COLUMNS:
        # huge-cardinality column: tf was attached to the records by a
        # distributed join (stages.tf.prepare_tf) and doubled into the pair
        # table — read it instead of a driver-built dict
        tl = pairs[f"tf_{column}_l"].to_numpy(zero_copy_only=False).astype(np.float64)
        tr = pairs[f"tf_{column}_r"].to_numpy(zero_copy_only=False).astype(np.float64)
        return tl, tr
    if isinstance(m, dict):  # driver-side callers (compare_two_records)
        m = tf_map_to_arrays(m)
    keys, vals = m
    return tf_take(pairs[f"{column}_l"], keys, vals), tf_take(
        pairs[f"{column}_r"], keys, vals
    )


def score_pair_batch(
    pairs: pa.Table,
    settings: Settings,
    ctx,
    tf_maps: dict,
    keep_cols: list | None,
    compute_score: bool = True,
) -> pa.Table:
    """Gamma cascade + FS scoring over one Arrow pair batch (pure function;
    shared by the standalone scorer actors and the fused pairgen+score
    bucket stage)."""
    gammas: dict[str, np.ndarray] = {}
    tf_values: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    tf_value_cols: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for comp in settings.comparisons:
        gammas[comp.gamma_column_name] = comp.compute_gamma(pairs, ctx)
        tf_cols = {
            lv.tf_adjustment_column
            for lv in comp.comparison_levels
            if lv.tf_adjustment_column
        }
        if tf_cols:
            col = tf_cols.pop()
            tf_values[comp.output_column_name] = _tf_lookup(tf_maps, pairs, col)
            tf_value_cols[col] = tf_values[comp.output_column_name]

    if hasattr(ctx, "clear_cache"):
        ctx.clear_cache()
    out = pairs
    if keep_cols is not None:
        out = out.select([c for c in keep_cols if c in out.column_names])
    for i, name in enumerate(out.column_names):
        col = out[name]
        if pa.types.is_dictionary(col.type):
            # fused pairgen dict-encodes comparison columns; anything the
            # caller retains goes back out as plain values
            out = out.set_column(i, name, col.cast(col.type.value_type))
    for name, g in gammas.items():
        # int8: gamma ∈ [−1, #levels) — 4× narrower than int32 through the
        # object store and the scored parquet (measured ~15 B/pair saved)
        out = out.append_column(name, pa.array(g.astype(np.int8), pa.int8()))
    if settings.retain_intermediate_calculation_columns:
        # reference parity: the tf_<col>_l / tf_<col>_r columns users of
        # splink's __splink__df_concat_with_tf inspect (SURVEY §2.7)
        for col, (tl, tr) in tf_value_cols.items():
            if f"tf_{col}_l" in out.column_names:
                continue  # already doubled from join-attached records
            out = out.append_column(f"tf_{col}_l", pa.array(tl, pa.float64()))
            out = out.append_column(f"tf_{col}_r", pa.array(tr, pa.float64()))
    if compute_score:
        scores = score_gamma_table(settings, gammas, tf_values)
        for name in sorted(scores):
            out = out.append_column(name, pa.array(scores[name], pa.float64()))
    return out


class GammaScorer:
    """Callable class for ``map_batches(GammaScorer, concurrency=(m, n),
    fn_constructor_kwargs=...)``."""

    def __init__(
        self,
        settings: Settings,
        tf_refs: dict | None = None,
        compute_score: bool = True,
        keep_cols: list | None = None,
    ):
        self.settings = settings
        self.ctx = make_eval_context(settings)
        self.compute_score = compute_score
        self.keep_cols = keep_cols
        self.tf_maps: dict[str, dict] = {}
        if tf_refs:
            import ray

            from .tf import tf_map_to_arrays

            # string values are sentinels (TF_FROM_COLUMNS), not object refs;
            # dicts convert to Arrow arrays ONCE per actor for pc.index_in
            self.tf_maps = {
                c: (
                    ref
                    if isinstance(ref, str)
                    else tf_map_to_arrays(ray.get(ref))
                )
                for c, ref in tf_refs.items()
            }

    def __call__(self, pairs: pa.Table) -> pa.Table:
        return score_pair_batch(
            pairs,
            self.settings,
            self.ctx,
            self.tf_maps,
            self.keep_cols,
            self.compute_score,
        )


def score_pairs(
    pairs_ds,
    settings: Settings,
    tf_refs: dict | None = None,
    threshold_match_probability: float | None = None,
    threshold_match_weight: float | None = None,
    batch_size: int = 16384,
    concurrency=None,
):
    """pair Dataset → + gamma_* / match_weight / match_probability columns.

    Column retention follows ``settings.retain_matching_columns`` /
    ``retain_intermediate_calculation_columns`` (M5).
    """
    uid = settings.unique_id_column_name
    keep = None
    if not settings.retain_matching_columns:
        keep = [f"{uid}_l", f"{uid}_r", "match_key"] + [
            f"{c}_{s}"
            for c in settings.additional_columns_to_retain
            for s in ("l", "r")
        ]
    if concurrency is None:
        from .exchange import default_parallelism

        # autoscaling from 1 actor ramps far too slowly for a short stage —
        # start the pool near cluster size (measured 54s → 8s on 22M pairs)
        p = default_parallelism()
        concurrency = (max(2, p // 2), max(2, p))
    scored = pairs_ds.map_batches(
        GammaScorer,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=1,
        fn_constructor_kwargs={
            "settings": settings,
            "tf_refs": tf_refs,
            "keep_cols": keep,
        },
    )
    if threshold_match_probability is not None:
        scored = scored.filter(expr=f"match_probability >= {threshold_match_probability}")
    elif threshold_match_weight is not None:
        scored = scored.filter(expr=f"match_weight >= {threshold_match_weight}")
    return scored
