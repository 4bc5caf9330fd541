"""splink_ray — a Ray-Data-native probabilistic record-linkage engine.

From-scratch reimplementation of the query/data-processing capabilities of
``debiatan/splink`` (a fork of the public moj-analytical-services/splink
Fellegi-Sunter library), re-expressed as Ray Data pipelines over Arrow
batches. See SURVEY.md for the operator inventory and architecture.

Public API (mirrors splink 4's surface):

    from splink_ray import Linker, SettingsCreator, block_on, col
    import splink_ray.comparison_library as cl
    import splink_ray.comparison_level_library as cll
"""

from .blocking_rule_library import BlockingRule, KeyFunctionRule, block_on
from .expressions import ColumnExpression, col
from .settings import Comparison, Settings, SettingsCreator

__all__ = [
    "BlockingRule",
    "ColumnExpression",
    "Comparison",
    "KeyFunctionRule",
    "Linker",
    "Settings",
    "SettingsCreator",
    "block_on",
    "col",
]


def __getattr__(name):
    if name == "Linker":
        from .linker import Linker

        return Linker
    raise AttributeError(name)
