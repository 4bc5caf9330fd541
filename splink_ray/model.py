"""Fellegi–Sunter scoring math — pure numpy functions, unit-testable.

Reference: ``splink/internals/predict.py::predict_from_comparison_vectors_sqls``
(≈250 LoC of generated SQL; /root/reference empty — SURVEY.md §0 / §2.6).

Per pair:
- prior odds = λ/(1−λ), λ = probability_two_random_records_match;
- per comparison c with gamma k: BF_c = m_ck / u_ck; gamma −1 (null) → BF 1;
- TF adjustment on levels with ``tf_adjustment_column``:
  u_tf = max(tf(v_l), tf(v_r)) clamped below by ``tf_minimum_u_value``;
  BF_tf = m_ck/u_tf; BF_c ← BF_c · (BF_tf/BF_c)^w (w = tf_adjustment_weight);
- match_weight = log2(prior odds) + Σ_c log2(BF_c);
  match_probability = 2^w / (1 + 2^w).

Summation is in log2 space, fixed comparison order, float64 — deterministic
(SURVEY.md §7.4 float watch item).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .settings import Comparison, Settings


def log2_bayes_factor_for_comparison(
    comparison: Comparison,
    gamma: np.ndarray,
    tf_l: "np.ndarray | None" = None,
    tf_r: "np.ndarray | None" = None,
) -> tuple[np.ndarray, np.ndarray]:
    """→ (log2 BF array, log2 TF-adjustment array) per pair.

    ``tf_l``/``tf_r`` are term-frequency values (nan where unseen/null) for
    the comparison's tf-adjusted column, or None when no level is adjusted.
    The returned total log2 BF is their sum; they are split so the caller can
    materialize splink's ``bf_<c>`` / ``bf_tf_adj_<c>`` columns.
    """
    m, u = comparison.m_u_arrays()
    if np.isnan(m).any() or np.isnan(u).any():
        missing = [i for i in range(len(m)) if np.isnan(m[i]) or np.isnan(u[i])]
        raise ValueError(
            f"comparison {comparison.output_column_name!r} has untrained m/u at "
            f"gamma values {missing}; train or set them explicitly"
        )
    # lookup tables indexed by gamma+1 (gamma −1 → slot 0 → BF 1)
    bf_lut = np.empty(len(m) + 1, np.float64)
    bf_lut[0] = 1.0
    with np.errstate(divide="ignore"):
        bf_lut[1:] = m / u
    g = np.clip(gamma + 1, 0, len(m))
    log2_bf = np.log2(bf_lut[g])

    log2_tf = np.zeros_like(log2_bf)
    for lv in comparison.non_null_levels():
        if not lv.tf_adjustment_column or tf_l is None:
            continue
        k = lv.comparison_vector_value
        at_level = gamma == k
        if not at_level.any():
            continue
        u_tf = np.fmax(tf_l, tf_r)  # fmax: nan-ignoring max
        have_tf = ~np.isnan(u_tf)
        rows = at_level & have_tf
        if not rows.any():
            continue
        u_tf = np.maximum(u_tf[rows], max(lv.tf_minimum_u_value, 1e-300))
        bf_tf = m[k] / u_tf
        bf_generic = m[k] / u[k]
        adj = lv.tf_adjustment_weight * (np.log2(bf_tf) - np.log2(bf_generic))
        log2_tf[rows] = adj
    return log2_bf, log2_tf


def score_gamma_table(
    settings: Settings,
    gammas: dict[str, np.ndarray],
    tf_values: "dict[str, tuple[np.ndarray, np.ndarray]] | None" = None,
) -> dict[str, np.ndarray]:
    """Score pairs given per-comparison gamma arrays.

    ``gammas`` maps ``gamma_<name>`` → int array; ``tf_values`` maps
    comparison output name → (tf_l, tf_r) arrays. Returns a dict with
    ``match_weight``, ``match_probability`` and (for
    retain_intermediate_calculation_columns) ``bf_<name>`` / ``bf_tf_adj_<name>``.
    """
    n = len(next(iter(gammas.values())))
    w = np.full(n, settings.prior_log2_odds(), np.float64)
    out: dict[str, np.ndarray] = {}
    for comp in settings.comparisons:
        g = gammas[comp.gamma_column_name]
        tfl = tfr = None
        if tf_values and comp.output_column_name in tf_values:
            tfl, tfr = tf_values[comp.output_column_name]
        log2_bf, log2_tf = log2_bayes_factor_for_comparison(comp, g, tfl, tfr)
        w += log2_bf + log2_tf
        if settings.retain_intermediate_calculation_columns:
            out[f"bf_{comp.output_column_name}"] = np.exp2(log2_bf)
            out[f"bf_tf_adj_{comp.output_column_name}"] = np.exp2(log2_tf)
    out["match_weight"] = w
    with np.errstate(over="ignore"):
        out["match_probability"] = 1.0 / (1.0 + np.exp2(-w))
    return out


def match_weight_sql(settings: Settings, tf_adjusted: bool = False) -> str:
    """DuckDB expression computing match_weight from gamma_* columns (oracle).

    TF-adjusted scoring is exercised through the python path + pytest oracle
    instead (the SQL would need the tf tables joined in).
    """
    lam = settings.probability_two_random_records_match
    terms = [f"log2({lam!r} / (1 - {lam!r}))"]
    for comp in settings.comparisons:
        m, u = comp.m_u_arrays()
        cases = " ".join(
            f"WHEN {v} THEN log2({m[v]!r} / {u[v]!r})" for v in range(len(m))
        )
        terms.append(f"(CASE gamma_{comp.output_column_name} {cases} ELSE 0 END)")
    return " + ".join(terms)


def truth_space_from_scores(
    scores: pd.DataFrame,
    label_col: str = "clerical_match_score",
    collapse_rounded: int | None = None,
) -> pd.DataFrame:
    """Threshold sweep → TP/FP/FN/TN + precision/recall/F1 per threshold.

    Reference: ``splink/internals/accuracy.py::truth_space_table…`` (§2.10).
    ``scores`` holds one row per labeled pair with ``match_weight``,
    ``match_probability`` and the clerical label (≥0.5 ⇒ positive).
    Driver-side pandas — label sets are small (SURVEY.md §2.10 A2).

    ``collapse_rounded=d``: round thresholds to ``d`` decimals and collapse
    equal rounded thresholds to one row carrying the GROUP-END counts —
    exactly the SQL ``sum(y) OVER (ORDER BY w DESC)`` default-RANGE-frame
    (peers included) + rounded-threshold ``GROUP BY max(...)`` semantics the
    driver oracle uses: distinct exact weights that round to the same
    threshold share the cumulative through the LAST of them. Metrics are
    recomputed from the collapsed counts and rounded half-away (DuckDB
    ``round`` parity); count columns return as int64.
    """
    df = scores.sort_values("match_weight", ascending=False, kind="mergesort")
    y = (df[label_col].to_numpy() >= 0.5).astype(np.int64)
    p_total = int(y.sum())
    n_total = int(len(y) - p_total)
    tp = np.cumsum(y)
    fp = np.cumsum(1 - y)
    fn = p_total - tp
    tn = n_total - fp
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(tp + fp > 0, tp / (tp + fp), 0.0)
        recall = np.where(p_total > 0, tp / p_total, 0.0)
        f1 = np.where(precision + recall > 0, 2 * precision * recall / (precision + recall), 0.0)
    out = pd.DataFrame(
        {
            "truth_threshold": df["match_weight"].to_numpy(),
            "match_probability": df["match_probability"].to_numpy(),
            "tp": tp, "fp": fp, "fn": fn, "tn": tn,
            "precision": precision, "recall": recall, "f1": f1,
        }
    )
    if collapse_rounded is None:
        return out
    from .kernels import round_half_away

    out = out.drop(columns=["match_probability"])
    out["truth_threshold"] = round_half_away(
        out["truth_threshold"], collapse_rounded
    )
    g = out.groupby("truth_threshold", as_index=False).agg(
        tp=("tp", "max"), fp=("fp", "max"), fn=("fn", "min"), tn=("tn", "min")
    )
    tp = g["tp"].to_numpy()
    fp = g["fp"].to_numpy()
    p_tot = tp + g["fn"].to_numpy()
    with np.errstate(divide="ignore", invalid="ignore"):
        prec = np.where(tp + fp > 0, tp / np.maximum(tp + fp, 1), 0.0)
        rec = np.where(p_tot > 0, tp / np.maximum(p_tot, 1), 0.0)
        f1 = np.where(prec + rec > 0, 2 * prec * rec / np.maximum(prec + rec, 1e-300), 0.0)
    g["precision"] = round_half_away(prec, collapse_rounded)
    g["recall"] = round_half_away(rec, collapse_rounded)
    g["f1"] = round_half_away(f1, collapse_rounded)
    for c in ("tp", "fp", "fn", "tn"):
        g[c] = g[c].astype("int64")
    return g
