"""Pre-composed comparison bundles.

Reference: ``splink/internals/comparison_library.py`` (≈1,200 LoC public
layout; /root/reference empty — SURVEY.md §0 / §2.3). Each factory returns a
:class:`~splink_ray.settings.Comparison` whose ordered levels mirror the
reference bundle's level structure (null → strongest → … → else).
"""

from __future__ import annotations

from .comparison_level_library import (
    AbsoluteDifferenceLevel,
    AbsoluteTimeDifferenceLevel,
    ArrayIntersectLevel,
    ColumnsReversedLevel,
    CosineSimilarityLevel,
    DamerauLevenshteinLevel,
    DistanceFunctionLevel,
    DistanceInKMLevel,
    ElseLevel,
    ExactMatchLevel,
    JaccardLevel,
    JaroLevel,
    JaroWinklerLevel,
    LevenshteinLevel,
    NullLevel,
)
from .expressions import ColumnExpression, col, ensure_expression
from .settings import Comparison


def ExactMatch(c, term_frequency_adjustments: bool = False) -> Comparison:
    e = ensure_expression(c)
    exact = ExactMatchLevel(e, label="Exact match")
    if term_frequency_adjustments:
        exact.tf_adjustment_column = e.column
    return Comparison(e.column, [NullLevel(e), exact, ElseLevel()])


def _at_thresholds(level_cls, c, thresholds, include_exact, kw=None) -> Comparison:
    e = ensure_expression(c)
    levels = [NullLevel(e)]
    if include_exact:
        levels.append(ExactMatchLevel(e, label="Exact match"))
    for t in thresholds:
        levels.append(level_cls(e, t, **(kw or {})))
    levels.append(ElseLevel())
    return Comparison(e.column, levels)


def LevenshteinAtThresholds(c, distance_thresholds=(1, 2)) -> Comparison:
    return _at_thresholds(LevenshteinLevel, c, distance_thresholds, True)


def DamerauLevenshteinAtThresholds(c, distance_thresholds=(1, 2)) -> Comparison:
    return _at_thresholds(DamerauLevenshteinLevel, c, distance_thresholds, True)


def JaroAtThresholds(c, score_thresholds=(0.9, 0.7)) -> Comparison:
    return _at_thresholds(JaroLevel, c, score_thresholds, True)


def JaroWinklerAtThresholds(c, score_thresholds=(0.9, 0.7)) -> Comparison:
    return _at_thresholds(JaroWinklerLevel, c, score_thresholds, True)


def JaccardAtThresholds(c, score_thresholds=(0.9, 0.7)) -> Comparison:
    return _at_thresholds(JaccardLevel, c, score_thresholds, True)


def CosineSimilarityAtThresholds(c, score_thresholds=(0.9, 0.7)) -> Comparison:
    e = ensure_expression(c)
    levels = [NullLevel(e)]
    for t in score_thresholds:
        levels.append(CosineSimilarityLevel(e, t))
    levels.append(ElseLevel())
    return Comparison(e.column, levels)


def DistanceFunctionAtThresholds(
    c, distance_function, thresholds, higher_is_more_similar=True, sql_expression=None
) -> Comparison:
    e = ensure_expression(c)
    levels = [NullLevel(e)]
    for t in thresholds:
        levels.append(
            DistanceFunctionLevel(
                e,
                distance_function,
                t,
                higher_is_more_similar,
                sql_expression=sql_expression,
            )
        )
    levels.append(ElseLevel())
    return Comparison(e.column, levels)


def AbsoluteTimeDifferenceAtThresholds(
    c, metrics=("hour", "day"), thresholds=(1, 1)
) -> Comparison:
    e = ensure_expression(c)
    levels = [NullLevel(e), ExactMatchLevel(e, label="Exact match")]
    for metric, t in zip(metrics, thresholds):
        levels.append(AbsoluteTimeDifferenceLevel(e, t, metric))
    levels.append(ElseLevel())
    return Comparison(e.column, levels)


AbsoluteDateDifferenceAtThresholds = AbsoluteTimeDifferenceAtThresholds


def AbsoluteDifferenceAtThresholds(c, thresholds=(1.0, 10.0)) -> Comparison:
    e = ensure_expression(c)
    levels = [NullLevel(e)]
    for t in thresholds:
        levels.append(AbsoluteDifferenceLevel(e, t))
    levels.append(ElseLevel())
    return Comparison(e.column, levels)


def ArrayIntersectAtSizes(c, size_thresholds=(1,)) -> Comparison:
    e = ensure_expression(c)
    levels = [NullLevel(e)]
    for s in sorted(size_thresholds, reverse=True):
        levels.append(ArrayIntersectLevel(e, s))
    levels.append(ElseLevel())
    return Comparison(e.column, levels)


def DistanceInKMAtThresholds(lat_col, long_col, km_thresholds=(1, 10)) -> Comparison:
    levels = [
        NullLevel(ensure_expression(lat_col)),
        NullLevel(ensure_expression(long_col)),
    ]
    for km in km_thresholds:
        levels.append(DistanceInKMLevel(lat_col, long_col, km))
    levels.append(ElseLevel())
    return Comparison(f"{ensure_expression(lat_col).column}_km", levels)


def NameComparison(c, jaro_winkler_thresholds=(0.92, 0.88, 0.7)) -> Comparison:
    """Reference: ``comparison_library.NameComparison`` — exact / dmeta-free
    JW ladder over a single name column."""
    e = ensure_expression(c)
    levels = [NullLevel(e), ExactMatchLevel(e, label="Exact match")]
    for t in jaro_winkler_thresholds:
        levels.append(JaroWinklerLevel(e, t))
    levels.append(ElseLevel())
    return Comparison(e.column, levels)


def ForenameSurnameComparison(
    forename, surname, jaro_winkler_thresholds=(0.92, 0.88)
) -> Comparison:
    """Reference: ``comparison_library.ForenameSurnameComparison`` — exact
    both / reversed / exact-one-side / JW ladder."""
    f = ensure_expression(forename)
    s = ensure_expression(surname)
    from .comparison_level_library import And, Or

    levels = [
        Or(NullLevel(f), NullLevel(s)),
        And(ExactMatchLevel(f), ExactMatchLevel(s), label="Exact match both"),
        # symmetrical: a true swap requires equality both ways (reference
        # passes symmetrical=True here)
        ColumnsReversedLevel(f, s, symmetrical=True, label="Forename/surname reversed"),
        ExactMatchLevel(s, label="Surname exact"),
        ExactMatchLevel(f, label="Forename exact"),
    ]
    for t in jaro_winkler_thresholds:
        levels.append(
            And(JaroWinklerLevel(f, t), JaroWinklerLevel(s, t), label=f"JW both >= {t}")
        )
    levels.append(ElseLevel())
    return Comparison(f"{f.column}_{s.column}", levels)


def DateOfBirthComparison(c, datetime_thresholds=(1, 10), datetime_metrics=("month", "year")) -> Comparison:
    """Reference: ``comparison_library.DateOfBirthComparison`` — exact /
    damerau-1 on the string form / time-delta ladder."""
    e = ensure_expression(c)
    levels = [
        NullLevel(e),
        ExactMatchLevel(e, label="Exact match"),
        DamerauLevenshteinLevel(e.cast_to_string(), 1, label="DL<=1 on string"),
    ]
    for t, metric in zip(datetime_thresholds, datetime_metrics):
        levels.append(AbsoluteTimeDifferenceLevel(e, t, metric))
    levels.append(ElseLevel())
    return Comparison(e.column, levels)


def PostcodeComparison(c) -> Comparison:
    """Reference: ``comparison_library.PostcodeComparison`` — full / sector /
    district / area prefix levels via regex extraction."""
    e = ensure_expression(c)
    sector = e.regex_extract(r"^[A-Za-z]{1,2}\d[A-Za-z0-9]? ?\d")
    district = e.regex_extract(r"^[A-Za-z]{1,2}\d[A-Za-z0-9]?")
    area = e.regex_extract(r"^[A-Za-z]{1,2}")
    return Comparison(
        e.column,
        [
            NullLevel(e),
            ExactMatchLevel(e, label="Full postcode"),
            ExactMatchLevel(sector, label="Sector"),
            ExactMatchLevel(district, label="District"),
            ExactMatchLevel(area, label="Area"),
            ElseLevel(),
        ],
    )


def EmailComparison(c) -> Comparison:
    """Reference: ``comparison_library.EmailComparison`` — exact / username /
    JW on username / domain."""
    e = ensure_expression(c)
    username = e.regex_extract(r"^[^@]+")
    domain = e.regex_extract(r"[^@]+$")
    return Comparison(
        e.column,
        [
            NullLevel(e),
            ExactMatchLevel(e, label="Exact email"),
            ExactMatchLevel(username, label="Username exact"),
            JaroWinklerLevel(username, 0.88, label="Username JW>=0.88"),
            ExactMatchLevel(domain, label="Domain exact"),
            ElseLevel(),
        ],
    )


def CustomComparison(output_column_name: str, comparison_levels: list) -> Comparison:
    return Comparison(output_column_name, comparison_levels)
