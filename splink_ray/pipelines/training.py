"""Training / estimation (SURVEY.md §2.8, §3.2).

Reference modules (public splink 4 layout; /root/reference empty — §0):

- ``splink/internals/estimate_prob_two_random_records_match.py`` (E1)
- ``splink/internals/estimate_u.py`` (E2)
- ``splink/internals/estimate_m_from_label_column.py`` / ``…_utils`` (E3)
- ``splink/internals/em_training_session.py::EMTrainingSession`` +
  ``splink/internals/expectation_maximisation.py`` (E4/E5)

The EM implementation uses splink's own performance trick: aggregate the
comparison-vector table to **agreement patterns** (``GROUP BY gamma_*``) in
ONE distributed pass — at most Π(levels) rows — then iterate E/M driver-side
in numpy on that tiny table. One shuffle total; iterations are microseconds,
so there is no driver-side bottleneck on the hot path (north_rule scaling
item §4.2.5).
"""

from __future__ import annotations

import copy

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..blocking_rule_library import BlockingRule, KeyFunctionRule
from ..settings import Comparison, Settings
from ..stages.blocking import generate_pairs
from ..stages.exchange import hash_bucket_array
from ..stages.scoring import GammaScorer


# ---------------------------------------------------------------------------
# E1 — λ from deterministic rules
# ---------------------------------------------------------------------------


def estimate_probability_two_random_records_match(
    records_ds, deterministic_rules: list[BlockingRule], recall: float
) -> float:
    """λ ≈ (#deterministic-rule pairs / recall) / #possible pairs."""
    if not 0 < recall <= 1:
        raise ValueError("recall must be in (0, 1]")
    n = records_ds.count()
    tmp = Settings(blocking_rules_to_generate_predictions=list(deterministic_rules))
    pairs, _ = generate_pairs(
        records_ds, tmp, analyze_skew=False, collect_metrics=False
    )
    found = pairs.count()
    possible = n * (n - 1) / 2
    lam = min(1.0, (found / recall) / max(possible, 1.0))
    return float(lam)


# ---------------------------------------------------------------------------
# E2 — u from random sampling
# ---------------------------------------------------------------------------


def _deterministic_sample(records_ds, uid: str, frac: float, method: str = "hash"):
    """Hash-based deterministic sample (independent of block layout/seed
    plumbing — SURVEY.md §7.4 u-sampling watch item).

    ``method="md5"`` selects rows where ``md5(str(uid))`` is below the
    fraction cut — slower (per-row digest) but reproducible in ANSI SQL
    (``md5(CAST(uid AS VARCHAR)) < '<cut_hex>'``), which gives the E2
    estimate an independent DuckDB oracle."""
    if frac >= 1.0:
        return records_ds
    if method == "md5":
        import hashlib

        cut_hex = format(int(frac * 16**8), "08x")

        def _f5(t: pa.Table) -> pa.Table:
            vals = pc.cast(t[uid], pa.string()).to_pylist()
            keep = [hashlib.md5(v.encode()).hexdigest() < cut_hex for v in vals]
            return t.filter(pa.array(keep))

        return records_ds.map_batches(_f5, batch_format="pyarrow")
    cut = int(frac * 1_000_000)

    def _f(t: pa.Table) -> pa.Table:
        arr = t[uid]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        h = hash_bucket_array(arr, 1_000_000)
        return t.filter(pa.array(h < cut))

    return records_ds.map_batches(_f, batch_format="pyarrow")


def estimate_u_using_random_sampling(
    records_ds, settings: Settings, max_pairs: float = 1e6,
    sample_method: str = "hash",
) -> None:
    """Random record pairs are almost surely non-matches ⇒ their gamma
    distribution estimates u. Updates ``settings`` in place (levels with
    ``fix_u_probability`` untouched)."""
    uid = settings.unique_id_column_name
    n = records_ds.count()
    m_target = int(np.ceil((2 * max_pairs) ** 0.5)) + 1
    frac = min(1.0, m_target / max(n, 1))
    sample = _deterministic_sample(records_ds, uid, frac, method=sample_method)

    # all-pairs over the sample: constant blocking key; the standard salting
    # machinery splits it if the sample exceeds the hot-key threshold
    tmp = copy.deepcopy(settings)
    tmp.blocking_rules_to_generate_predictions = [
        KeyFunctionRule(key_fn=lambda t: pa.array(["1"] * len(t)), name="u_sample")
    ]
    tmp.max_pairs_per_block = None
    tmp.hot_key_threshold = 2000
    tmp.target_rows_per_salted_block = 1000
    pairs, _ = generate_pairs(sample, tmp, analyze_skew=True, collect_metrics=False)
    patterns = agreement_patterns(pairs, settings)
    for comp in settings.comparisons:
        g = patterns[comp.gamma_column_name].to_numpy()
        cnt = patterns["n"].to_numpy().astype(np.float64)
        valid = g >= 0
        denom = cnt[valid].sum()
        if denom == 0:
            continue
        m_arr, u_arr = comp.m_u_arrays()
        for lv in comp.non_null_levels():
            if lv.fix_u_probability:
                continue
            k = lv.comparison_vector_value
            u = cnt[valid & (g == k)].sum() / denom
            lv.u_probability = float(max(u, 1e-9))


# ---------------------------------------------------------------------------
# E3 — m from labels
# ---------------------------------------------------------------------------


def estimate_m_from_label_column(records_ds, settings: Settings, label_col: str) -> None:
    """Pairs sharing a ground-truth label column are matches; their gamma
    histogram estimates m. Updates ``settings`` in place."""
    tmp = copy.deepcopy(settings)
    tmp.blocking_rules_to_generate_predictions = [BlockingRule([label_col])]
    tmp.max_pairs_per_block = None
    pairs, _ = generate_pairs(records_ds, tmp, analyze_skew=True, collect_metrics=False)
    patterns = agreement_patterns(pairs, settings)
    _assign_m_from_patterns(patterns, settings)


def estimate_m_from_pairwise_labels(records_ds, labels_ds, settings: Settings) -> None:
    """Explicit labeled pairs (unique_id_l, unique_id_r[, clerical_match_score])
    → join record features on both sides → gamma histogram → m."""
    pairs = pairs_from_labels(records_ds, labels_ds, settings)
    patterns = agreement_patterns(pairs, settings)
    _assign_m_from_patterns(patterns, settings)


def pairs_from_labels(records_ds, labels_ds, settings: Settings):
    """Labels → pair table with column doubling (A1/A2 machinery)."""
    from ..stages.exchange import default_parallelism

    uid = settings.unique_id_column_name
    cols = sorted(settings.columns_needed() - {uid})
    n_parts = max(2, default_parallelism() // 2)

    if hasattr(labels_ds, "to_arrow_refs"):
        lab = labels_ds
    else:
        import ray.data as rd

        lab = rd.from_arrow(labels_ds)
    left = records_ds.select_columns([uid] + cols).rename_columns(
        {c: f"{c}_l" for c in [uid] + cols}
    )
    right = records_ds.select_columns([uid] + cols).rename_columns(
        {c: f"{c}_r" for c in [uid] + cols}
    )
    out = lab.join(
        left, join_type="inner", num_partitions=n_parts, on=("unique_id_l",),
        right_on=(f"{uid}_l",),
    )
    out = out.join(
        right, join_type="inner", num_partitions=n_parts, on=("unique_id_r",),
        right_on=(f"{uid}_r",),
    )
    return out


def _assign_m_from_patterns(patterns: pd.DataFrame, settings: Settings) -> None:
    for comp in settings.comparisons:
        g = patterns[comp.gamma_column_name].to_numpy()
        cnt = patterns["n"].to_numpy().astype(np.float64)
        valid = g >= 0
        denom = cnt[valid].sum()
        if denom == 0:
            continue
        for lv in comp.non_null_levels():
            if lv.fix_m_probability:
                continue
            k = lv.comparison_vector_value
            lv.m_probability = float(
                max(cnt[valid & (g == k)].sum() / denom, 1e-9)
            )


# ---------------------------------------------------------------------------
# E4 — EM on agreement patterns
# ---------------------------------------------------------------------------


def agreement_patterns(pairs_ds, settings: Settings) -> pd.DataFrame:
    """ONE distributed pass: gamma per pair → GROUP BY gamma tuple → counts.

    Reference: ``expectation_maximisation.py::compute_new_parameters_sql``'s
    input aggregation. Result ≤ Π(levels+1) rows — driver-side safe."""
    gamma_cols = [c.gamma_column_name for c in settings.comparisons]

    from ..stages.exchange import default_parallelism

    p = default_parallelism()
    gammas = pairs_ds.map_batches(
        GammaScorer,
        batch_format="pyarrow",
        batch_size=16384,
        zero_copy_batch=True,
        # start the pool near cluster size: autoscaling from 1 ramps too
        # slowly for short stages (see scoring.score_pairs)
        concurrency=(max(1, p // 2), max(2, p)),
        num_cpus=1,
        fn_constructor_kwargs={
            "settings": settings,
            "compute_score": False,
            "keep_cols": [],
        },
    )

    def _partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            cols = {c: pa.array([], pa.int32()) for c in gamma_cols}
            cols["n"] = pa.array([], pa.int64())
            return pa.table(cols)
        g = t.select(gamma_cols).group_by(gamma_cols, use_threads=False).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(gamma_cols + ["n"])

    from ray.data.aggregate import Sum

    out = (
        gammas.map_batches(_partial, batch_format="pyarrow")
        .groupby(gamma_cols)
        .aggregate(Sum("n", alias_name="n"))
    )
    return out.to_pandas()


def seed_missing_m_u(comparisons: list[Comparison]) -> None:
    """Seed default starting m/u for levels that were never estimated.

    The reference seeds untrained parameters before EM (a level with m=None
    would otherwise poison the E-step with NaN). Seeds are asymmetric —
    m mass concentrated on the strongest (highest-gamma) levels, u on the
    weakest — because a symmetric m=u seed is a degenerate EM fixed point."""
    for comp in comparisons:
        k = comp.num_levels
        v = np.arange(k, dtype=np.float64)
        m_seed = np.exp2(v)
        m_seed /= m_seed.sum()
        u_seed = np.exp2(k - 1 - v)
        u_seed /= u_seed.sum()
        for lv in comp.non_null_levels():
            g = lv.comparison_vector_value
            if lv.m_probability is None:
                lv.m_probability = float(m_seed[g])
            if lv.u_probability is None:
                lv.u_probability = float(u_seed[g])


def em_on_patterns(
    patterns: pd.DataFrame,
    comparisons: list[Comparison],
    lam_init: float,
    fix_m: bool = False,
    fix_u: bool = False,
    tol: float = 1e-4,
    max_iter: int = 25,
) -> dict:
    """Driver-side numpy EM. Returns {"lambda", "iterations", "history"};
    mutates the comparisons' m/u in place (respecting per-level fix flags).
    Levels with unset m/u are seeded first (:func:`seed_missing_m_u`)."""
    seed_missing_m_u(comparisons)
    for comp in comparisons:
        m_arr, u_arr = comp.m_u_arrays()
        if np.isnan(m_arr).any() or np.isnan(u_arr).any():
            raise ValueError(
                f"comparison '{comp.output_column_name}' has unset m/u after "
                "seeding — check fix_m/fix_u flags on levels with no value"
            )
    cnt = patterns["n"].to_numpy().astype(np.float64)
    G = {c.output_column_name: patterns[c.gamma_column_name].to_numpy() for c in comparisons}
    lam = float(lam_init)
    history = []
    it = 0
    for it in range(1, max_iter + 1):
        # E-step: log2 posterior odds per pattern
        w = np.full(len(cnt), np.log2(lam / (1 - lam)))
        for comp in comparisons:
            m_arr, u_arr = comp.m_u_arrays()
            g = G[comp.output_column_name]
            bf = np.ones(len(cnt))
            for k in range(len(m_arr)):
                bf = np.where(g == k, m_arr[k] / u_arr[k], bf)
            w += np.log2(bf)
        p = 1.0 / (1.0 + np.exp2(-w))

        # M-step
        max_delta = 0.0
        new_lam = float((p * cnt).sum() / cnt.sum())
        max_delta = max(max_delta, abs(new_lam - lam))
        lam = min(max(new_lam, 1e-9), 1 - 1e-9)
        for comp in comparisons:
            g = G[comp.output_column_name]
            valid = g >= 0
            m_arr, u_arr = comp.m_u_arrays()
            pm = (p * cnt)[valid]
            pu = ((1 - p) * cnt)[valid]
            gm = g[valid]
            m_den, u_den = pm.sum(), pu.sum()
            for lv in comp.non_null_levels():
                k = lv.comparison_vector_value
                if not fix_m and not lv.fix_m_probability and m_den > 0:
                    new_m = max(pm[gm == k].sum() / m_den, 1e-9)
                    max_delta = max(max_delta, abs(new_m - m_arr[k]))
                    lv.m_probability = float(new_m)
                if not fix_u and not lv.fix_u_probability and u_den > 0:
                    new_u = max(pu[gm == k].sum() / u_den, 1e-9)
                    max_delta = max(max_delta, abs(new_u - u_arr[k]))
                    lv.u_probability = float(new_u)
        history.append({"iteration": it, "max_delta": max_delta, "lambda": lam})
        if max_delta < tol:
            break
    return {"lambda": lam, "iterations": it, "history": history}


def estimate_parameters_using_expectation_maximisation(
    records_ds,
    settings: Settings,
    blocking_rule: BlockingRule,
    fix_m_probabilities: bool = False,
    fix_u_probabilities: bool = False,
    num_buckets: int | None = None,
) -> dict:
    """One EM training session blocked on ``blocking_rule`` (§3.2).

    Comparisons whose columns appear in the blocking rule are EXCLUDED from
    the session (their agreement is forced by the block) — reference
    ``EMTrainingSession``. m estimates from multiple sessions are averaged
    via each level's ``_m_session_estimates`` history.

    Choose a TIGHT blocking rule (high in-block match rate): on loose rules
    the unconstrained mixture can collapse to a degenerate λ→1 local optimum
    (m ≈ marginal distribution) — the same failure mode the reference warns
    about. A session λ near 1.0 together with m ≈ u is the signature; rerun
    with a tighter rule."""
    rule_cols = blocking_rule.columns_used()
    trained = [c for c in settings.comparisons if not (c.columns_used() & rule_cols)]
    if not trained:
        raise ValueError("blocking rule covers every comparison; nothing to train")

    session = copy.deepcopy(settings)
    session.blocking_rules_to_generate_predictions = [blocking_rule]
    session.comparisons = [c for c in session.comparisons
                           if not (c.columns_used() & rule_cols)]
    session.max_pairs_per_block = settings.max_pairs_per_block

    pairs, _ = generate_pairs(
        records_ds, session, num_buckets=num_buckets,
        analyze_skew=True, collect_metrics=False,
    )
    patterns = agreement_patterns(pairs, session)
    result = em_on_patterns(
        patterns,
        session.comparisons,
        lam_init=settings.probability_two_random_records_match,
        fix_m=fix_m_probabilities,
        fix_u=fix_u_probabilities,
        tol=settings.em_convergence,
        max_iter=settings.max_iterations,
    )

    # write back with cross-session m averaging (reference:
    # parameter_estimate_comparisons behavior)
    by_name = {c.output_column_name: c for c in session.comparisons}
    for comp in settings.comparisons:
        src = by_name.get(comp.output_column_name)
        if src is None:
            continue
        for lv, lv_src in zip(comp.non_null_levels(), src.non_null_levels()):
            if not fix_m_probabilities and not lv.fix_m_probability:
                hist = getattr(lv, "_m_session_estimates", [])
                hist.append(lv_src.m_probability)
                lv._m_session_estimates = hist
                lv.m_probability = float(np.mean(hist))
            if not fix_u_probabilities and not lv.fix_u_probability:
                lv.u_probability = lv_src.u_probability
    result["trained_comparisons"] = [c.output_column_name for c in session.comparisons]
    # degenerate-collapse detection (λ→1 with m ≈ marginals) — the failure
    # mode of weakly-separating training rules; surface it loudly
    if result["lambda"] > 0.99 or result["lambda"] < 1e-6:
        import warnings

        result["degenerate"] = True
        warnings.warn(
            f"EM session on rule '{blocking_rule.description}' converged to "
            f"lambda={result['lambda']:.4f} — likely a degenerate one-class "
            "optimum; retrain with a tighter blocking rule",
            stacklevel=2,
        )
    return result
