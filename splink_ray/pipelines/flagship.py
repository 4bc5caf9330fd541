"""Flagship transcript-linkage model (BASELINE.json north_star).

The comparisons mirror the bundles SURVEY.md §2.3 names for transcripts:
per-turn-text exact (hash of the stable-ordered turn list), first-message
Jaro-Winkler, ``tool_set`` array-intersect, ``n_turns`` absolute difference,
``ts_min`` absolute time difference. m/u values here are sensible priors;
EM training (pipelines/training.py) can refit them.
"""

from __future__ import annotations

import splink_ray.comparison_level_library as cll
from ..blocking_rule_library import block_on
from ..expressions import col
from ..settings import Comparison, Settings


def transcript_settings(
    threshold_days_key: bool = True,
    probability_two_random_records_match: float = 0.01,
) -> Settings:
    turn_hash = Comparison(
        "text_concat_hash",
        [
            cll.NullLevel("text_concat_hash"),
            cll.ExactMatchLevel(
                "text_concat_hash",
                label="All turn texts equal (stable order)",
                m_probability=0.6,
                u_probability=1e-6,
            ),
            cll.ElseLevel(m_probability=0.4, u_probability=1.0),
        ],
    )
    fut = Comparison(
        "first_user_text",
        [
            cll.NullLevel("first_user_text"),
            cll.JaroWinklerLevel(
                "first_user_text", 0.95, m_probability=0.9, u_probability=1e-4
            ),
            cll.JaroWinklerLevel(
                "first_user_text", 0.88, m_probability=0.05, u_probability=1e-3
            ),
            cll.ElseLevel(m_probability=0.05, u_probability=0.9989),
        ],
    )
    tools = Comparison(
        "tool_set",
        [
            cll.NullLevel("tool_set"),
            cll.ArrayIntersectLevel("tool_set", 1, m_probability=0.5, u_probability=0.3),
            cll.ElseLevel(m_probability=0.5, u_probability=0.7),
        ],
    )
    nturns = Comparison(
        "n_turns",
        [
            cll.NullLevel("n_turns"),
            cll.AbsoluteDifferenceLevel("n_turns", 1, m_probability=0.95, u_probability=0.3),
            cll.ElseLevel(m_probability=0.05, u_probability=0.7),
        ],
    )
    ts = Comparison(
        "ts_min",
        [
            cll.NullLevel("ts_min"),
            # copies jitter ±3h from the entity base time → within-entity
            # spread < 6h always; same-day strangers often share the exact
            # base time, so u is high — weakly discriminative by design
            cll.AbsoluteTimeDifferenceLevel(
                "ts_min", 8, "hour", m_probability=0.95, u_probability=0.5
            ),
            cll.ElseLevel(m_probability=0.05, u_probability=0.5),
        ],
    )
    rules = [block_on("ts_day")]
    if threshold_days_key:
        rules.append(block_on(col("first_user_text").substr(1, 12)))
    return Settings(
        link_type="dedupe_only",
        probability_two_random_records_match=probability_two_random_records_match,
        blocking_rules_to_generate_predictions=rules,
        comparisons=[turn_hash, fut, tools, nturns, ts],
        retain_matching_columns=False,
    )
