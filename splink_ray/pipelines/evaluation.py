"""Evaluation & exploratory operators (SURVEY.md §2.10/§2.11/§2.13 data).

Reference: ``splink/internals/accuracy.py`` (A2/A3),
``splink/internals/unlinkables.py`` (A4), ``splink/internals/profile_data.py``
(P1), ``splink/internals/completeness.py`` (P2), chart-data tables of
``splink/internals/charts.py`` (§2.13) — /root/reference empty, SURVEY.md §0.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..model import truth_space_from_scores
from ..settings import Settings


# ---------------------------------------------------------------------------
# A2/A3 — truth space / accuracy vs labeled pairs
# ---------------------------------------------------------------------------


def predictions_with_labels(predictions_ds, labels_ds, uid: str = "unique_id"):
    """Inner-join scored pairs ↔ labeled pairs on (uid_l, uid_r); labeled
    pairs missing from predictions get match_weight −inf (never blocked)."""
    from ..stages.exchange import default_parallelism

    lab = labels_ds
    out = lab.join(
        predictions_ds,
        join_type="left_outer",
        num_partitions=max(2, default_parallelism() // 2),
        on=("unique_id_l", "unique_id_r"),
        right_on=(f"{uid}_l", f"{uid}_r"),
    )
    return out


def truth_space_table(
    predictions_ds,
    labels_ds,
    uid: str = "unique_id",
    collapse_rounded: int | None = None,
) -> pd.DataFrame:
    """Threshold sweep TP/FP/FN/TN + precision/recall/F1 (A2). Label sets are
    small → driver-side pandas after the join (SURVEY.md §2.10).
    ``collapse_rounded``: see :func:`splink_ray.model.truth_space_from_scores`
    (SQL RANGE-peers collapse at rounded thresholds)."""
    df = predictions_with_labels(predictions_ds, labels_ds, uid).to_pandas()
    df["match_weight"] = df["match_weight"].fillna(-np.inf)
    df["match_probability"] = df["match_probability"].fillna(0.0)
    return truth_space_from_scores(df, collapse_rounded=collapse_rounded)


def accuracy_at_threshold(
    predictions_ds, labels_ds, threshold_match_probability: float, uid: str = "unique_id"
) -> dict:
    """Pairwise precision/recall/F1 at one threshold (the A5 driver gate)."""
    df = predictions_with_labels(predictions_ds, labels_ds, uid).to_pandas()
    df["match_probability"] = df["match_probability"].fillna(0.0)
    pred = df["match_probability"] >= threshold_match_probability
    truth = df["clerical_match_score"] >= 0.5
    tp = int((pred & truth).sum())
    fp = int((pred & ~truth).sum())
    fn = int((~pred & truth).sum())
    tn = int((~pred & ~truth).sum())
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": precision, "recall": recall, "f1": f1,
    }


def prediction_errors_from_labels_table(
    predictions_ds, labels_ds, threshold: float = 0.5, uid: str = "unique_id"
) -> pd.DataFrame:
    """FP/FN example pairs (A3)."""
    df = predictions_with_labels(predictions_ds, labels_ds, uid).to_pandas()
    df["match_probability"] = df["match_probability"].fillna(0.0)
    pred = df["match_probability"] >= threshold
    truth = df["clerical_match_score"] >= 0.5
    out = df[pred != truth].copy()
    out["error_type"] = np.where(pred[pred != truth], "FP", "FN")
    return out


# ---------------------------------------------------------------------------
# A4 — unlinkables
# ---------------------------------------------------------------------------


def unlinkables_table(predictions_ds, uid: str = "unique_id") -> pd.DataFrame:
    """Per-record best match weight → cumulative share below x (A4).

    Distributed per-record max via symmetrized groupby; small histogram out."""
    from ray.data.aggregate import Max

    def _sym(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [t[f"{uid}_l"].combine_chunks(), t[f"{uid}_r"].combine_chunks()]
                ),
                "match_weight": pa.concat_arrays(
                    [t["match_weight"].combine_chunks(), t["match_weight"].combine_chunks()]
                ),
            }
        )

    best = (
        predictions_ds.map_batches(_sym, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Max("match_weight", alias_name="best_weight"))
        .to_pandas()
    )
    best = best.sort_values("best_weight").reset_index(drop=True)
    best["cum_share"] = (np.arange(len(best)) + 1) / max(len(best), 1)
    return best


# ---------------------------------------------------------------------------
# P1/P2 — profiling
# ---------------------------------------------------------------------------


def profile_columns(ds, columns: list[str], top_k: int = 10) -> dict[str, dict]:
    """Per column: distinct count, null share, top-k/bottom-k frequencies."""
    from ray.data.aggregate import Sum

    out: dict[str, dict] = {}
    n_total = ds.count()
    for c in columns:

        def _partial(t: pa.Table, c=c) -> pa.Table:
            arr = t[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            nulls = len(arr) - len(arr.drop_null())
            vt = pa.table({c: pc.cast(arr.drop_null(), pa.string())})
            if len(vt) == 0:
                return pa.table(
                    {"value": pa.array([], pa.string()), "n": pa.array([], pa.int64()),
                     "nulls": pa.array([], pa.int64())}
                )
            g = vt.group_by(c, use_threads=False).aggregate([([], "count_all")])
            g = g.rename_columns(["value", "n"])
            return g.append_column("nulls", pa.array([nulls] + [0] * (len(g) - 1), pa.int64()))

        counts = (
            ds.map_batches(_partial, batch_format="pyarrow")
            .groupby("value")
            .aggregate(Sum("n", alias_name="n"), Sum("nulls", alias_name="nulls"))
        )
        pdf = counts.to_pandas()
        nulls = int(pdf["nulls"].sum())
        pdf = pdf.drop(columns=["nulls"]).sort_values(
            ["n", "value"], ascending=[False, True]
        )
        out[c] = {
            "n_distinct": int(len(pdf)),
            "null_share": nulls / max(n_total, 1),
            "top_k": pdf.head(top_k).reset_index(drop=True),
            "bottom_k": pdf.tail(top_k).reset_index(drop=True),
        }
    return out


def completeness_chart_data(ds, columns: list[str], source_col: str | None = None) -> pd.DataFrame:
    """Non-null share per column (per source_dataset when present) — P2."""
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        src = (
            t[source_col].to_pylist()
            if source_col and source_col in t.column_names
            else ["all"] * len(t)
        )
        rows = {"source_dataset": [], "column": [], "non_null": [], "total": []}
        sdf = pd.DataFrame({"src": src})
        for c in columns:
            valid = pc.is_valid(t[c]).to_numpy(zero_copy_only=False)
            g = sdf.assign(v=valid).groupby("src")["v"].agg(["sum", "count"])
            for s, row in g.iterrows():
                rows["source_dataset"].append(s)
                rows["column"].append(c)
                rows["non_null"].append(int(row["sum"]))
                rows["total"].append(int(row["count"]))
        return pa.table(rows)

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["source_dataset", "column"])
        .aggregate(Sum("non_null", alias_name="non_null"), Sum("total", alias_name="total"))
        .to_pandas()
    )
    agg["completeness"] = agg["non_null"] / agg["total"].clip(lower=1)
    return agg.sort_values(["source_dataset", "column"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# §2.13 — chart-data tables (m/u table, waterfall decomposition)
# ---------------------------------------------------------------------------


def m_u_parameters_table(settings: Settings) -> pd.DataFrame:
    rows = []
    for comp in settings.comparisons:
        for lv in comp.non_null_levels():
            m, u = lv.m_probability, lv.u_probability
            bf = (m / u) if (m and u) else np.nan
            rows.append(
                {
                    "comparison": comp.output_column_name,
                    "level": lv.default_label,
                    "gamma": lv.comparison_vector_value,
                    "m_probability": m,
                    "u_probability": u,
                    "bayes_factor": bf,
                    "log2_bayes_factor": np.log2(bf) if bf and bf > 0 else np.nan,
                }
            )
    return pd.DataFrame(rows)


def waterfall_data(settings: Settings, gamma_row: dict) -> pd.DataFrame:
    """Per-comparison weight decomposition for one pair (waterfall chart
    data; R2 ``compare_two_records`` uses this)."""
    rows = [
        {
            "comparison": "prior",
            "gamma": None,
            "log2_bayes_factor": settings.prior_log2_odds(),
        }
    ]
    for comp in settings.comparisons:
        g = gamma_row[comp.gamma_column_name]
        if g < 0:
            lbf = 0.0
        else:
            lv = comp.level_for_value(int(g))
            lbf = float(np.log2(lv.m_probability / lv.u_probability))
        rows.append(
            {"comparison": comp.output_column_name, "gamma": int(g), "log2_bayes_factor": lbf}
        )
    df = pd.DataFrame(rows)
    df["cumulative_weight"] = df["log2_bayes_factor"].cumsum()
    return df


def comparison_viewer_data(
    predictions_ds, settings: Settings, examples_per_pattern: int = 2
) -> pd.DataFrame:
    """§2.13: the data behind splink's ``comparison_viewer_dashboard`` —
    one row per distinct gamma PATTERN with its pair count, mean match
    weight, and up to ``examples_per_pattern`` example pair ids.

    Pattern counts come from per-batch partial aggregation (the agreement-
    patterns trick: ≤ Π(levels+1) rows cross the wire); examples ride along
    as per-batch ``min`` aggregates — ONE distributed pass total."""
    gamma_cols = [c.gamma_column_name for c in settings.comparisons]
    uid = settings.unique_id_column_name

    def _partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            cols = {c: pa.array([], pa.int8()) for c in gamma_cols}
            cols["n"] = pa.array([], pa.int64())
            cols["w_sum"] = pa.array([], pa.float64())
            cols["example"] = pa.array([], pa.string())
            return pa.table(cols)
        key = pc.binary_join_element_wise(
            pc.cast(t[f"{uid}_l"], pa.string()), pc.cast(t[f"{uid}_r"], pa.string()), "|"
        )
        sub = t.select(gamma_cols + ["match_weight"]).append_column("example", key)
        g = sub.group_by(gamma_cols, use_threads=False).aggregate(
            [([], "count_all"), (["match_weight"], "sum"), (["example"], "min")]
        )
        return g.rename_columns(gamma_cols + ["n", "w_sum", "example"])

    from ray.data.aggregate import Min, Sum

    merged = (
        predictions_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(gamma_cols)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("w_sum", alias_name="w_sum"),
            Min("example", alias_name="example"),
        )
        .to_pandas()
    )
    merged["mean_match_weight"] = merged["w_sum"] / merged["n"]
    return (
        merged.drop(columns=["w_sum"])
        .sort_values("n", ascending=False)
        .reset_index(drop=True)
    )


def parameter_estimate_comparisons(settings: Settings) -> pd.DataFrame:
    """§2.13: per-level m estimates across EM training sessions (the data
    behind splink's ``parameter_estimate_comparisons_chart``) — reads the
    ``_m_session_estimates`` history the EM write-back keeps."""
    rows = []
    for comp in settings.comparisons:
        for lv in comp.non_null_levels():
            hist = getattr(lv, "_m_session_estimates", [])
            for i, m in enumerate(hist):
                rows.append(
                    {
                        "comparison": comp.output_column_name,
                        "level": lv.default_label,
                        "gamma": lv.comparison_vector_value,
                        "estimate_session": i,
                        "m_probability": m,
                    }
                )
    return pd.DataFrame(
        rows, columns=["comparison", "level", "gamma", "estimate_session", "m_probability"]
    )
