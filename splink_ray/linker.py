"""Linker — the splink-4-shaped public facade.

Reference: ``splink/internals/linker.py::Linker`` and its namespaced
components ``linker.inference / training / clustering / evaluation /
visualisations / table_management`` (public layout; /root/reference empty —
SURVEY.md §0). A user of the reference writes::

    linker = Linker(df, settings, db_api)
    linker.training.estimate_u_using_random_sampling(max_pairs=1e6)
    linker.training.estimate_parameters_using_expectation_maximisation(rule)
    df_predict = linker.inference.predict(threshold_match_probability=0.9)
    clusters = linker.clustering.cluster_pairwise_predictions_at_threshold(
        df_predict, 0.95)

Here the ``db_api`` argument is replaced by Ray Data: inputs are
``ray.data.Dataset``s (or pandas / Arrow, converted), intermediates are
Datasets, and heavy outputs should be consumed via ``write_parquet``.
The Linker never calls ``ray.init()`` — the caller owns the session.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
import pyarrow as pa

from .blocking_rule_library import BlockingRule
from .settings import Settings, make_eval_context


def _to_dataset(data: Any):
    import ray.data as rd

    if isinstance(data, pa.Table):
        return rd.from_arrow(data)
    if isinstance(data, pd.DataFrame):
        return rd.from_pandas(data)
    return data  # already a Dataset


def _to_arrow_table(data: Any) -> pa.Table:
    """Small-side inputs (new records, labels) → driver-side Arrow table."""
    if isinstance(data, pa.Table):
        return data
    if isinstance(data, pd.DataFrame):
        return pa.Table.from_pandas(data, preserve_index=False)
    import ray

    return pa.concat_tables(ray.get(data.to_arrow_refs()))


class _Inference:
    def __init__(self, linker: "Linker"):
        self._l = linker

    def predict(
        self,
        threshold_match_probability: float | None = None,
        threshold_match_weight: float | None = None,
    ):
        from .pipelines.predict import predict

        scored, metrics = predict(
            self._l._records(),
            self._l.settings,
            threshold_match_probability=threshold_match_probability,
            threshold_match_weight=threshold_match_weight,
        )
        self._l.last_blocking_metrics = metrics
        self._l.last_predictions = scored
        return scored

    def deterministic_link(self):
        from .pipelines.predict import deterministic_link

        ds, _ = deterministic_link(self._l._records(), self._l.settings)
        return ds

    def compare_two_records(self, record_1: dict, record_2: dict) -> pd.DataFrame:
        """R2: score one explicit pair through the same kernels (debug)."""
        import numpy as np

        from .model import score_gamma_table

        s = self._l.settings
        cols = sorted(s.columns_needed())
        data = {}
        for c in cols:
            data[f"{c}_l"] = [record_1.get(c)]
            data[f"{c}_r"] = [record_2.get(c)]
        pairs = pa.table(data)
        ctx = make_eval_context(s)
        gammas = {c.gamma_column_name: c.compute_gamma(pairs, ctx) for c in s.comparisons}
        scores = score_gamma_table(s, gammas)
        row = {k: v[0] for k, v in {**gammas, **scores}.items()}
        return pd.DataFrame([row])

    def find_matches_to_new_records(self, new_records, threshold_match_probability=None):
        """R1: block+score a small batch of new records against the corpus.

        Reference: ``find_matches_to_new_records.py``. The new records are
        broadcast (``ray.put``) into a stateful matcher pool; one streaming
        pass over the corpus emits and scores only new×base pairs whose
        blocking keys match — never the corpus self-join
        (``pipelines.predict.find_matches_to_new_records``)."""
        from .pipelines.predict import find_matches_to_new_records

        return find_matches_to_new_records(
            self._l._records(),
            _to_arrow_table(new_records),
            self._l.settings,
            threshold_match_probability=threshold_match_probability,
        )


class _Training:
    def __init__(self, linker: "Linker"):
        self._l = linker

    def estimate_probability_two_random_records_match(
        self, deterministic_matching_rules: list[BlockingRule], recall: float
    ) -> float:
        from .pipelines.training import estimate_probability_two_random_records_match

        lam = estimate_probability_two_random_records_match(
            self._l._records(), deterministic_matching_rules, recall
        )
        self._l.settings.probability_two_random_records_match = lam
        return lam

    def estimate_u_using_random_sampling(self, max_pairs: float = 1e6) -> None:
        from .pipelines.training import estimate_u_using_random_sampling

        estimate_u_using_random_sampling(self._l._records(), self._l.settings, max_pairs)

    def estimate_m_from_label_column(self, label_column: str) -> None:
        from .pipelines.training import estimate_m_from_label_column

        estimate_m_from_label_column(self._l._records(), self._l.settings, label_column)

    def estimate_m_from_pairwise_labels(self, labels) -> None:
        from .pipelines.training import estimate_m_from_pairwise_labels

        estimate_m_from_pairwise_labels(
            self._l._records(), _to_dataset(labels), self._l.settings
        )

    def estimate_parameters_using_expectation_maximisation(
        self,
        blocking_rule: BlockingRule,
        fix_m_probabilities: bool = False,
        fix_u_probabilities: bool = False,
    ) -> dict:
        from .pipelines.training import (
            estimate_parameters_using_expectation_maximisation,
        )

        return estimate_parameters_using_expectation_maximisation(
            self._l._records(),
            self._l.settings,
            blocking_rule,
            fix_m_probabilities=fix_m_probabilities,
            fix_u_probabilities=fix_u_probabilities,
        )


class _Clustering:
    def __init__(self, linker: "Linker"):
        self._l = linker

    def cluster_pairwise_predictions_at_threshold(
        self,
        df_predict,
        threshold_match_probability: float = 0.95,
        method: str = "auto",
        checkpoint_dir: str | None = None,
    ):
        from .pipelines.clustering import cluster_pairwise_predictions_at_threshold

        clustered, info = cluster_pairwise_predictions_at_threshold(
            self._l._records(),
            df_predict,
            threshold_match_probability,
            uid=self._l.settings.unique_id_column_name,
            method=method,
            checkpoint_dir=checkpoint_dir,
        )
        self._l.last_clustering_info = info
        return clustered

    def compute_graph_metrics(self, df_predict, df_clustered, threshold: float):
        from .pipelines.clustering import compute_graph_metrics

        return compute_graph_metrics(
            df_predict, df_clustered, threshold, uid=self._l.settings.unique_id_column_name
        )


class _Evaluation:
    def __init__(self, linker: "Linker"):
        self._l = linker

    def truth_space_table_from_labels_table(self, labels):
        from .pipelines.evaluation import truth_space_table

        return truth_space_table(self._l.last_predictions, _to_dataset(labels))

    def accuracy_analysis_from_labels_table(self, labels, threshold_match_probability=0.5):
        from .pipelines.evaluation import accuracy_at_threshold

        return accuracy_at_threshold(
            self._l.last_predictions, _to_dataset(labels), threshold_match_probability
        )

    def prediction_errors_from_labels_table(self, labels, threshold=0.5):
        from .pipelines.evaluation import prediction_errors_from_labels_table

        return prediction_errors_from_labels_table(
            self._l.last_predictions, _to_dataset(labels), threshold
        )

    def unlinkables_table(self, df_predict):
        from .pipelines.evaluation import unlinkables_table

        return unlinkables_table(df_predict, uid=self._l.settings.unique_id_column_name)


class _Visualisations:
    """§2.13 — the data tables behind splink's charts (no HTML)."""

    def __init__(self, linker: "Linker"):
        self._l = linker

    def m_u_parameters_table(self):
        from .pipelines.evaluation import m_u_parameters_table

        return m_u_parameters_table(self._l.settings)

    def match_weights_table(self):
        df = self.m_u_parameters_table()
        return df[["comparison", "level", "gamma", "log2_bayes_factor"]]

    def waterfall_data(self, gamma_row: dict):
        from .pipelines.evaluation import waterfall_data

        return waterfall_data(self._l.settings, gamma_row)

    def comparison_viewer_data(self, df_predict=None, examples_per_pattern: int = 2):
        from .pipelines.evaluation import comparison_viewer_data

        preds = df_predict if df_predict is not None else self._l.last_predictions
        return comparison_viewer_data(preds, self._l.settings, examples_per_pattern)

    def parameter_estimate_comparisons(self):
        from .pipelines.evaluation import parameter_estimate_comparisons

        return parameter_estimate_comparisons(self._l.settings)


class _Exploratory:
    def __init__(self, linker: "Linker"):
        self._l = linker

    def profile_columns(self, columns: list[str], top_k: int = 10):
        from .pipelines.evaluation import profile_columns

        return profile_columns(self._l._records(), columns, top_k)

    def completeness_chart_data(self, columns: list[str]):
        from .pipelines.evaluation import completeness_chart_data

        return completeness_chart_data(
            self._l._records(), columns, self._l.settings.source_dataset_column_name
        )


class _TableManagement:
    def __init__(self, linker: "Linker"):
        self._l = linker

    def register_labels_table(self, labels):
        self._l.labels = _to_dataset(labels)
        return self._l.labels

    def compute_tf_table(self, column: str) -> pd.DataFrame:
        """Reference: ``table_management.compute_tf_table`` — the per-column
        term-frequency table (value, tf_<column>)."""
        from .stages.tf import term_frequency_table

        return term_frequency_table(self._l._records(), column)

    def concat_with_tf(self):
        """Records Dataset + ``tf_<col>`` columns for every tf-adjusted
        column — the reference's ``__splink__df_concat_with_tf``."""
        from .stages.tf import attach_tf_columns, compute_tf_maps

        cols = self._l.settings.tf_columns()
        maps = compute_tf_maps(self._l._records(), cols)
        return attach_tf_columns(self._l._records(), maps)


class Linker:
    """``Linker(data, settings)`` where ``data`` is a Dataset / Arrow table /
    pandas DataFrame, or a dict of them for multi-source link jobs."""

    def __init__(self, data, settings: Settings):
        self.settings = settings
        if isinstance(data, dict):
            datasets = {k: _to_dataset(v) for k, v in data.items()}
        else:
            datasets = {"__input__": _to_dataset(data)}
        from .pipelines.predict import vertically_concatenate

        self._records_ds = vertically_concatenate(datasets, settings)
        self._materialized = None
        self.last_predictions = None
        self.last_blocking_metrics = None
        self.last_clustering_info = None
        self.labels = None

        self.inference = _Inference(self)
        self.training = _Training(self)
        self.clustering = _Clustering(self)
        self.evaluation = _Evaluation(self)
        self.visualisations = _Visualisations(self)
        self.exploratory = _Exploratory(self)
        self.table_management = _TableManagement(self)

    def _records(self):
        if self._materialized is None:
            self._materialized = self._records_ds.materialize()
        return self._materialized

    def misc_save_model_to_json(self, path: str) -> None:
        import json

        with open(path, "w") as f:
            json.dump(self.settings.to_dict(), f, indent=2, default=str)
