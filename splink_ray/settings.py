"""Settings / Comparison model objects.

Reference: ``splink/internals/settings.py::Settings, CoreModelSettings`` and
``splink/internals/settings_creator.py::SettingsCreator`` (public layout;
/root/reference empty — SURVEY.md §0). Plain dataclasses, JSON
round-trippable, captured by closure / ``fn_constructor_kwargs`` into Ray
workers.

Gamma numbering (splink convention): levels are listed in order and evaluated
first-true-wins; null levels → gamma −1; the K non-null levels are numbered
K−1 (strongest, listed first) down to 0 (ElseLevel, listed last).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa

from .comparison_level_library import ComparisonLevel, ElseLevel, EvalContext
from .blocking_rule_library import BlockingRule


class Comparison:
    """Ordered list of comparison levels over one (or more) columns."""

    def __init__(
        self,
        output_column_name: str,
        comparison_levels: list[ComparisonLevel],
        comparison_description: str | None = None,
    ):
        self.output_column_name = output_column_name
        self.comparison_description = comparison_description or output_column_name
        self.comparison_levels = list(comparison_levels)
        if not any(isinstance(lv, ElseLevel) for lv in self.comparison_levels):
            self.comparison_levels.append(ElseLevel())
        non_null = [lv for lv in self.comparison_levels if not lv.is_null_level]
        k = len(non_null)
        for i, lv in enumerate(non_null):
            lv.comparison_vector_value = k - 1 - i
        for lv in self.comparison_levels:
            if lv.is_null_level:
                lv.comparison_vector_value = -1

    # ------------------------------------------------------------------
    @property
    def gamma_column_name(self) -> str:
        return f"gamma_{self.output_column_name}"

    @property
    def num_levels(self) -> int:
        return sum(1 for lv in self.comparison_levels if not lv.is_null_level)

    def non_null_levels(self) -> list[ComparisonLevel]:
        return [lv for lv in self.comparison_levels if not lv.is_null_level]

    def level_for_value(self, value: int) -> ComparisonLevel:
        for lv in self.comparison_levels:
            if lv.comparison_vector_value == value and not lv.is_null_level:
                return lv
        raise KeyError(value)

    def columns_used(self) -> set[str]:
        out: set[str] = set()
        for lv in self.comparison_levels:
            out |= lv.columns_used()
        return out

    # ------------------------------------------------------------------
    def compute_gamma(self, pairs: pa.Table, ctx: EvalContext) -> np.ndarray:
        """First-true-wins cascade → int32 gamma per pair row.

        Reference: ``splink/internals/comparison_vector_values.py::
        compute_comparison_vector_values_sql`` (ordered CASE WHEN). Levels
        are evaluated only on rows not yet assigned (mirrors SQL
        short-circuiting; saves string-kernel work after exact matches hit).
        """
        n = len(pairs)
        gamma = np.zeros(n, np.int32)
        assigned = np.zeros(n, bool)
        for lv in self.comparison_levels:
            if assigned.all():
                break
            if isinstance(lv, ElseLevel):
                gamma[~assigned] = lv.comparison_vector_value
                break
            # full-batch evaluation (masked afterwards) so threshold ladders
            # sharing a kernel hit the EvalContext kernel cache — one JW/lev
            # evaluation per (batch, column) instead of one per level
            cond = lv.evaluate(pairs, ctx)
            newly = cond & ~assigned
            gamma[newly] = lv.comparison_vector_value
            assigned |= newly
        return gamma

    def gamma_case_sql(self) -> str:
        """DuckDB CASE WHEN equivalent of :meth:`compute_gamma` (oracle)."""
        parts = ["CASE"]
        for lv in self.comparison_levels:
            if isinstance(lv, ElseLevel):
                continue
            parts.append(f"WHEN {lv.sql()} THEN {lv.comparison_vector_value}")
        parts.append("ELSE 0 END")
        return " ".join(parts)

    # ------------------------------------------------------------------
    def m_u_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        """(m, u) float64 arrays indexed by gamma value (0..K−1)."""
        k = self.num_levels
        m = np.full(k, np.nan)
        u = np.full(k, np.nan)
        for lv in self.non_null_levels():
            if lv.m_probability is not None:
                m[lv.comparison_vector_value] = lv.m_probability
            if lv.u_probability is not None:
                u[lv.comparison_vector_value] = lv.u_probability
        return m, u

    def set_m_u(self, m: np.ndarray, u: np.ndarray) -> None:
        for lv in self.non_null_levels():
            v = lv.comparison_vector_value
            if not np.isnan(m[v]) and not lv.fix_m_probability:
                lv.m_probability = float(m[v])
            if not np.isnan(u[v]) and not lv.fix_u_probability:
                lv.u_probability = float(u[v])

    def to_dict(self) -> dict:
        return {
            "output_column_name": self.output_column_name,
            "comparison_description": self.comparison_description,
            "comparison_levels": [lv.to_dict() for lv in self.comparison_levels],
        }


@dataclass
class Settings:
    """Linkage model + pipeline configuration (JSON round-trippable)."""

    link_type: str = "dedupe_only"  # dedupe_only | link_only | link_and_dedupe
    unique_id_column_name: str = "unique_id"
    source_dataset_column_name: str = "source_dataset"
    probability_two_random_records_match: float = 1e-4
    blocking_rules_to_generate_predictions: list[BlockingRule] = field(default_factory=list)
    comparisons: list[Comparison] = field(default_factory=list)
    retain_matching_columns: bool = True
    retain_intermediate_calculation_columns: bool = False
    additional_columns_to_retain: list[str] = field(default_factory=list)
    em_convergence: float = 1e-4
    max_iterations: int = 25

    # scale knobs (SURVEY.md §4.2) — defaults sized for the sandbox
    hot_key_threshold: int = 5000       # rows per blocking key before salting
    target_rows_per_salted_block: int = 2000
    max_pairs_per_block: int | None = None  # cap; overflow logged to metrics
    use_duckdb_kernels: bool = True
    # TF columns with more distinct values than this skip the driver-side
    # broadcast dict (OOM hazard at ~10⁸ values) and attach tf_<col> to the
    # records via a distributed join instead (SURVEY §2.7 T2 second mapping)
    tf_broadcast_limit: int = 1_000_000

    def columns_needed(self) -> set[str]:
        cols = {self.unique_id_column_name}
        for c in self.comparisons:
            cols |= c.columns_used()
        for r in self.blocking_rules_to_generate_predictions:
            cols |= r.columns_used()
        cols |= set(self.additional_columns_to_retain)
        return cols

    def tf_columns(self) -> list[str]:
        out: list[str] = []
        for c in self.comparisons:
            for lv in c.comparison_levels:
                if lv.tf_adjustment_column and lv.tf_adjustment_column not in out:
                    out.append(lv.tf_adjustment_column)
        return out

    def prior_log2_odds(self) -> float:
        lam = self.probability_two_random_records_match
        return float(np.log2(lam / (1.0 - lam)))

    def to_dict(self) -> dict:
        # every output-affecting field must appear here: config_hash() keys
        # checkpoint manifests, so an omitted field means a stale-cache reuse
        # when it changes (ADVICE r01)
        return {
            "link_type": self.link_type,
            "unique_id_column_name": self.unique_id_column_name,
            "source_dataset_column_name": self.source_dataset_column_name,
            "probability_two_random_records_match": self.probability_two_random_records_match,
            "blocking_rules_to_generate_predictions": [
                r.to_dict() for r in self.blocking_rules_to_generate_predictions
            ],
            "comparisons": [c.to_dict() for c in self.comparisons],
            "retain_matching_columns": self.retain_matching_columns,
            "retain_intermediate_calculation_columns": self.retain_intermediate_calculation_columns,
            "additional_columns_to_retain": list(self.additional_columns_to_retain),
            "em_convergence": self.em_convergence,
            "max_iterations": self.max_iterations,
            "hot_key_threshold": self.hot_key_threshold,
            "target_rows_per_salted_block": self.target_rows_per_salted_block,
            "max_pairs_per_block": self.max_pairs_per_block,
        }

    def config_hash(self) -> str:
        """Stable hash of the model config — keys checkpoint manifests."""
        js = json.dumps(self.to_dict(), sort_keys=True, default=str)
        return hashlib.sha256(js.encode()).hexdigest()[:16]


# splink 4 public API calls this SettingsCreator
SettingsCreator = Settings


def _threshold_floors(settings: Settings) -> dict:
    """Per (kernel fn, column expression): the MINIMUM threshold any level
    in ANY comparison applies to that similarity kernel.

    Values below this floor can never flip a gamma (every consumer is a
    ``v >= threshold`` test with threshold >= floor, including inside
    And/Or/Not compositions), so the native jaro kernels may early-exit
    below it and return 0.0 instead of the exact value. The floor spans all
    comparisons because the per-batch kernel cache is shared across them."""
    from .comparison_level_library import _StringDistanceLevel

    floors: dict = {}

    def walk(lv):
        if isinstance(lv, _StringDistanceLevel) and lv._higher_is_better and (
            lv._fn in ("jaro", "jaro_winkler")
        ):
            key = (lv._fn, lv.col_expression)
            t = float(lv._threshold)
            floors[key] = min(floors.get(key, t), t)
        for sub in getattr(lv, "sub_levels", ()) or ():
            walk(sub)
        sub1 = getattr(lv, "sub_level", None)
        if sub1 is not None:
            walk(sub1)

    for comp in settings.comparisons:
        for lv in comp.comparison_levels:
            walk(lv)
    return floors


def make_eval_context(settings: Settings, tf_tables: dict | None = None) -> EvalContext:
    ctx = EvalContext(use_duckdb=settings.use_duckdb_kernels, tf_tables=tf_tables)
    ctx.threshold_floors = _threshold_floors(settings)
    return ctx
