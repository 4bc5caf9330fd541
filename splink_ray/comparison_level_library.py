"""Comparison levels — declarative, vectorized, SQL-renderable.

Reference semantics: ``splink/internals/comparison_level_library.py`` and
``…/comparison_level.py::ComparisonLevel`` (public splink 4.x layout;
/root/reference is empty — SURVEY.md §0). Levels are evaluated in listed
order, first-true-wins; the null level yields gamma −1 (Bayes factor 1);
the remaining K levels are numbered K−1 … 0 top-down (ElseLevel = 0).

Each level is a dataclass that can:
- ``evaluate(pairs, ctx)`` → boolean numpy mask over an Arrow pair-table
  (columns ``<col>_l`` / ``<col>_r``), vectorized (pyarrow.compute / numpy /
  embedded-DuckDB kernels — see duckdb_kernels.py);
- ``sql()`` → the equivalent DuckDB predicate (drives the driver's
  ``oracle_sql()`` generation and documents parity with the reference SQL).
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields
from typing import Any, Callable, ClassVar

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import kernels
from .expressions import ColumnExpression, ensure_expression

_TIME_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "month": 2629800,  # splink uses 1/12 julian year
    "year": 31557600,
}


class EvalContext:
    """Per-worker evaluation context: optional DuckDB kernel + TF tables."""

    def __init__(self, use_duckdb: bool = True, tf_tables: dict | None = None):
        self.use_duckdb = use_duckdb
        self.tf_tables = tf_tables or {}
        self._duck = None
        # per-batch kernel-value cache: AtThresholds ladders (JW 0.95 then
        # 0.88, lev 1 then 2, …) evaluate the SAME similarity kernel per
        # level; caching halves string-kernel cost vs splink's CASE WHEN,
        # which recomputes. Cleared by the scorer after each batch.
        self.kernel_cache: dict = {}
        # per-(fn, col_expression) minimum ladder threshold — set by
        # make_eval_context; native kernels may early-exit below it
        self.threshold_floors: dict = {}

    def clear_cache(self):
        self.kernel_cache.clear()

    @property
    def duck(self):
        if not self.use_duckdb:
            return None
        if self._duck is None:
            from .duckdb_kernels import get_kernel

            self._duck = get_kernel()
        return self._duck


def _side(expr: ColumnExpression, side: str) -> ColumnExpression:
    return ColumnExpression(f"{expr.column}_{side}", expr.ops)


def _pair_arrays(level_expr: ColumnExpression, pairs: pa.Table) -> tuple[pa.Array, pa.Array]:
    l = _side(level_expr, "l").evaluate(pairs)
    r = _side(level_expr, "r").evaluate(pairs)
    return l, r


def _to_np_bool(arr) -> np.ndarray:
    """Arrow boolean (possibly with nulls) → numpy bool, null → False."""
    if isinstance(arr, np.ndarray):
        return arr.astype(bool)
    return pc.fill_null(arr, False).to_numpy(zero_copy_only=False).astype(bool)


def _valid_pair_mask(l: pa.Array, r: pa.Array) -> np.ndarray:
    return _to_np_bool(pc.and_(pc.is_valid(l), pc.is_valid(r)))


def _plain(arr: pa.Array) -> pa.Array:
    """Decode dictionary-encoded columns for levels that compare across
    different dictionaries (or against literals)."""
    if pa.types.is_dictionary(arr.type):
        return arr.cast(arr.type.value_type)
    return arr


def _dict_index_safe(d: pa.Array) -> bool:
    """Index equality implies value equality only when the dictionary's
    values are unique and non-null. pairgen-produced ``pc.dictionary_encode``
    columns always satisfy this; a caller-supplied DictionaryArray with
    duplicate or null dictionary entries (legal Arrow) would otherwise
    report equal values as non-matching (ADVICE r4). The check is O(dict),
    tiny next to the per-pair work it gates."""
    return d.null_count == 0 and len(d) == len(pc.unique(d))


def _plain_table(t: pa.Table) -> pa.Table:
    """Decode every dictionary-encoded column — user-extension callables
    (CustomLevel.predicate, DistanceFunctionLevel.distance_function) are
    written against plain string/value arrays and must not see the fused
    pairgen path's dictionary encoding (ADVICE r4)."""
    for i, f in enumerate(t.schema):
        if pa.types.is_dictionary(f.type):
            t = t.set_column(i, f.name, t.column(i).cast(f.type.value_type))
    return t


def _same_dictionary(a: pa.Array, b: pa.Array) -> bool:
    """True when two DictionaryArrays share the same dictionary memory
    (same source column, e.g. the _l/_r doubles of one encoded record
    column) — their indices are then directly comparable."""
    da, db = a.dictionary, b.dictionary
    if da is db:
        return True
    if len(da) != len(db):
        return False
    ba, bb = da.buffers(), db.buffers()
    if len(ba) != len(bb):
        return False
    for x, y in zip(ba, bb):
        if (x is None) != (y is None):
            return False
        if x is not None and (x.address != y.address or x.size != y.size):
            return False
    return da.offset == db.offset


def _strings(arr: pa.Array, mask: np.ndarray) -> list:
    vals = arr.to_pylist()
    return [vals[i] if mask[i] else "" for i in range(len(vals))]


@dataclass
class ComparisonLevel:
    """Base. Subclasses set ``kind`` and implement ``_evaluate``/``sql``."""

    kind: ClassVar[str] = "base"
    label: str | None = field(default=None, kw_only=True)
    m_probability: float | None = field(default=None, kw_only=True)
    u_probability: float | None = field(default=None, kw_only=True)
    is_null_level: ClassVar[bool] = False
    tf_adjustment_column: str | None = field(default=None, kw_only=True)
    tf_adjustment_weight: float = field(default=1.0, kw_only=True)
    tf_minimum_u_value: float = field(default=0.0, kw_only=True)
    fix_m_probability: bool = field(default=False, kw_only=True)
    fix_u_probability: bool = field(default=False, kw_only=True)

    # assigned by Comparison at build time
    comparison_vector_value: int = field(default=-2, kw_only=True)

    def evaluate(self, pairs: pa.Table, ctx: EvalContext) -> np.ndarray:
        return self._evaluate(pairs, ctx)

    def _evaluate(self, pairs: pa.Table, ctx: EvalContext) -> np.ndarray:
        raise NotImplementedError

    def sql(self) -> str:
        raise NotImplementedError

    def columns_used(self) -> set[str]:
        raise NotImplementedError

    @property
    def default_label(self) -> str:
        return self.label or self.kind

    def to_dict(self) -> dict:
        d: dict[str, Any] = {"kind": self.kind}
        for f in fields(self):
            v = getattr(self, f.name)
            if isinstance(v, ColumnExpression):
                v = {"__expr__": v.to_dict()}
            elif isinstance(v, (list, tuple)) and v and isinstance(v[0], ComparisonLevel):
                v = [x.to_dict() for x in v]
            elif isinstance(v, ComparisonLevel):
                v = v.to_dict()
            elif callable(v):
                v = f"<callable:{getattr(v, '__name__', 'fn')}>"
            d[f.name] = v
        return d


# ---------------------------------------------------------------------------


@dataclass
class NullLevel(ComparisonLevel):
    """Either side null (or failing ``valid_string_pattern``) → gamma −1.

    Reference: ``comparison_level_library.NullLevel``.
    """

    col_expression: ColumnExpression | str = "col"
    valid_string_pattern: str | None = None
    kind: ClassVar[str] = "null"
    is_null_level: ClassVar[bool] = True

    def __post_init__(self):
        self.col_expression = ensure_expression(self.col_expression)

    def _evaluate(self, pairs, ctx):
        l, r = _pair_arrays(self.col_expression, pairs)
        nulls = pc.or_(pc.is_null(l), pc.is_null(r))
        if self.valid_string_pattern and pa.types.is_dictionary(l.type):
            l = l.cast(l.type.value_type)
        if self.valid_string_pattern and pa.types.is_dictionary(r.type):
            r = r.cast(r.type.value_type)
        if self.valid_string_pattern:
            ok_l = pc.match_substring_regex(l, self.valid_string_pattern)
            ok_r = pc.match_substring_regex(r, self.valid_string_pattern)
            nulls = pc.or_(nulls, pc.invert(pc.and_(ok_l, ok_r)))
        return _to_np_bool(pc.fill_null(nulls, True))

    def sql(self):
        ls = _side(self.col_expression, "l").sql()
        rs = _side(self.col_expression, "r").sql()
        base = f"({ls} IS NULL OR {rs} IS NULL)"
        if self.valid_string_pattern:
            p = self.valid_string_pattern.replace("'", "''")
            base = (
                f"({base} OR NOT (regexp_matches({ls}, '{p}')"
                f" AND regexp_matches({rs}, '{p}')))"
            )
        return base

    def columns_used(self):
        return {self.col_expression.column}


@dataclass
class ExactMatchLevel(ComparisonLevel):
    col_expression: ColumnExpression | str = "col"
    kind: ClassVar[str] = "exact"

    def __post_init__(self):
        self.col_expression = ensure_expression(self.col_expression)

    def _evaluate(self, pairs, ctx):
        l, r = _pair_arrays(self.col_expression, pairs)
        if pa.types.is_dictionary(l.type) and pa.types.is_dictionary(r.type):
            if _same_dictionary(l, r) and _dict_index_safe(l.dictionary):
                # dictionary values are unique & non-null, so value equality
                # == index equality (null indices propagate through pc.equal)
                return _to_np_bool(pc.equal(l.indices, r.indices))
            l = l.cast(l.type.value_type)
            r = r.cast(r.type.value_type)
        return _to_np_bool(pc.equal(l, r))

    def sql(self):
        return f"{_side(self.col_expression, 'l').sql()} = {_side(self.col_expression, 'r').sql()}"

    def columns_used(self):
        return {self.col_expression.column}


@dataclass
class LiteralMatchLevel(ComparisonLevel):
    col_expression: ColumnExpression | str = "col"
    literal_value: str = ""
    side: str = "both"  # 'left' | 'right' | 'both'
    kind: ClassVar[str] = "literal"

    def __post_init__(self):
        self.col_expression = ensure_expression(self.col_expression)

    def _evaluate(self, pairs, ctx):
        l, r = _pair_arrays(self.col_expression, pairs)
        l, r = _plain(l), _plain(r)
        eq_l = _to_np_bool(pc.equal(l, self.literal_value))
        eq_r = _to_np_bool(pc.equal(r, self.literal_value))
        if self.side == "left":
            return eq_l
        if self.side == "right":
            return eq_r
        return eq_l & eq_r

    def sql(self):
        lit = "'" + str(self.literal_value).replace("'", "''") + "'"
        ls = _side(self.col_expression, "l").sql()
        rs = _side(self.col_expression, "r").sql()
        if self.side == "left":
            return f"{ls} = {lit}"
        if self.side == "right":
            return f"{rs} = {lit}"
        return f"({ls} = {lit} AND {rs} = {lit})"

    def columns_used(self):
        return {self.col_expression.column}


@dataclass
class ColumnsReversedLevel(ComparisonLevel):
    """Swapped-column equality (e.g. forename/surname reversed).

    Reference: ``comparison_level_library.ColumnsReversedLevel`` —
    ``symmetrical=False`` (default) is the one-directional condition
    ``col1_l = col2_r``; ``symmetrical=True`` additionally requires
    ``col2_l = col1_r`` (the pair holds both ways).
    """

    col_expression_1: ColumnExpression | str = "a"
    col_expression_2: ColumnExpression | str = "b"
    symmetrical: bool = False
    kind: ClassVar[str] = "columns_reversed"

    def __post_init__(self):
        self.col_expression_1 = ensure_expression(self.col_expression_1)
        self.col_expression_2 = ensure_expression(self.col_expression_2)

    def _evaluate(self, pairs, ctx):
        a_l = _plain(_side(self.col_expression_1, "l").evaluate(pairs))
        b_r = _plain(_side(self.col_expression_2, "r").evaluate(pairs))
        fwd = _to_np_bool(pc.equal(a_l, b_r))
        if not self.symmetrical:
            return fwd
        a_r = _plain(_side(self.col_expression_1, "r").evaluate(pairs))
        b_l = _plain(_side(self.col_expression_2, "l").evaluate(pairs))
        return fwd & _to_np_bool(pc.equal(b_l, a_r))

    def sql(self):
        a_l = _side(self.col_expression_1, "l").sql()
        b_r = _side(self.col_expression_2, "r").sql()
        if not self.symmetrical:
            return f"({a_l} = {b_r})"
        a_r = _side(self.col_expression_1, "r").sql()
        b_l = _side(self.col_expression_2, "l").sql()
        return f"({a_l} = {b_r} AND {b_l} = {a_r})"

    def columns_used(self):
        return {self.col_expression_1.column, self.col_expression_2.column}


@dataclass
class _StringDistanceLevel(ComparisonLevel):
    """Shared machinery for levenshtein/damerau/jaro/jw/jaccard thresholds."""

    col_expression: ColumnExpression | str = "col"
    _fn: ClassVar[str] = ""
    _sql_fn: ClassVar[str] = ""
    _higher_is_better: ClassVar[bool] = True

    def __post_init__(self):
        self.col_expression = ensure_expression(self.col_expression)

    @property
    def _threshold(self) -> float:
        raise NotImplementedError

    def _duck_expr(self) -> str:
        return f"{self._sql_fn}(l, r)"

    def _sql_call(self, ls: str, rs: str) -> str:
        return f"{self._sql_fn}({ls}, {rs})"

    def _evaluate(self, pairs, ctx):
        key = (id(pairs), self._fn, self.col_expression)
        cached = ctx.kernel_cache.get(key)
        if cached is not None:
            v, valid = cached
        else:
            l, r = _pair_arrays(self.col_expression, pairs)
            valid = _valid_pair_mask(l, r)
            if not valid.any():
                v = np.zeros(len(pairs), np.float64)
            elif ctx.duck is not None:
                cutoff = None
                if self._higher_is_better and self._fn in ("jaro", "jaro_winkler"):
                    cutoff = getattr(ctx, "threshold_floors", {}).get(
                        (self._fn, self.col_expression)
                    )
                vals = ctx.duck.eval_expr(self._duck_expr(), l, r, cutoff)
                fill = -1e18 if self._higher_is_better else 1e18
                v = pc.fill_null(vals, fill).to_numpy(zero_copy_only=False).astype(np.float64)
            else:
                la, ra = _strings(l, valid), _strings(r, valid)
                v = getattr(kernels, self._fn)(la, ra).astype(np.float64)
            ctx.kernel_cache[key] = (v, valid)
        ok = (v >= self._threshold) if self._higher_is_better else (v <= self._threshold)
        return ok & valid

    def sql(self):
        ls = _side(self.col_expression, "l").sql()
        rs = _side(self.col_expression, "r").sql()
        op = ">=" if self._higher_is_better else "<="
        return f"{self._sql_call(ls, rs)} {op} {self._threshold}"

    def columns_used(self):
        return {self.col_expression.column}


@dataclass
class LevenshteinLevel(_StringDistanceLevel):
    distance_threshold: int = 1
    kind: ClassVar[str] = "levenshtein"
    _fn: ClassVar[str] = "levenshtein"
    _sql_fn: ClassVar[str] = "levenshtein"
    _higher_is_better: ClassVar[bool] = False

    @property
    def _threshold(self):
        return self.distance_threshold


@dataclass
class DamerauLevenshteinLevel(_StringDistanceLevel):
    distance_threshold: int = 1
    kind: ClassVar[str] = "damerau_levenshtein"
    _fn: ClassVar[str] = "damerau_levenshtein"
    _sql_fn: ClassVar[str] = "damerau_levenshtein"
    _higher_is_better: ClassVar[bool] = False

    @property
    def _threshold(self):
        return self.distance_threshold


@dataclass
class JaroLevel(_StringDistanceLevel):
    distance_threshold: float = 0.9
    kind: ClassVar[str] = "jaro"
    _fn: ClassVar[str] = "jaro"
    _sql_fn: ClassVar[str] = "jaro_similarity"
    _higher_is_better: ClassVar[bool] = True

    @property
    def _threshold(self):
        return self.distance_threshold


@dataclass
class JaroWinklerLevel(_StringDistanceLevel):
    distance_threshold: float = 0.9
    kind: ClassVar[str] = "jaro_winkler"
    _fn: ClassVar[str] = "jaro_winkler"
    _sql_fn: ClassVar[str] = "jaro_winkler_similarity"
    _higher_is_better: ClassVar[bool] = True

    @property
    def _threshold(self):
        return self.distance_threshold


@dataclass
class JaccardLevel(_StringDistanceLevel):
    """Char-set Jaccard, DuckDB ``jaccard()`` semantics (empty → 0)."""

    distance_threshold: float = 0.9
    kind: ClassVar[str] = "jaccard"
    _fn: ClassVar[str] = "jaccard_charset"
    _sql_fn: ClassVar[str] = "jaccard"
    _higher_is_better: ClassVar[bool] = True

    @property
    def _threshold(self):
        return self.distance_threshold

    def _duck_expr(self):
        return "CASE WHEN length(l) > 0 AND length(r) > 0 THEN jaccard(l, r) ELSE 0.0 END"

    def _sql_call(self, ls, rs):
        return f"CASE WHEN length({ls}) > 0 AND length({rs}) > 0 THEN jaccard({ls}, {rs}) ELSE 0.0 END"


@dataclass
class CosineSimilarityLevel(ComparisonLevel):
    """Cosine over list<float> embedding columns ≥ threshold."""

    col_expression: ColumnExpression | str = "col"
    similarity_threshold: float = 0.9
    kind: ClassVar[str] = "cosine"

    def __post_init__(self):
        self.col_expression = ensure_expression(self.col_expression)

    def _evaluate(self, pairs, ctx):
        l, r = _pair_arrays(self.col_expression, pairs)
        valid = _valid_pair_mask(l, r)
        out = np.zeros(len(pairs), bool)
        if not valid.any():
            return out
        lv, rv = l.to_pylist(), r.to_pylist()
        idx = np.flatnonzero(valid)
        a = np.asarray([lv[i] for i in idx], np.float64)
        b = np.asarray([rv[i] for i in idx], np.float64)
        out[idx] = kernels.cosine_similarity(a, b) >= self.similarity_threshold
        return out

    def sql(self):
        ls = _side(self.col_expression, "l").sql()
        rs = _side(self.col_expression, "r").sql()
        return f"list_cosine_similarity({ls}, {rs}) >= {self.similarity_threshold}"

    def columns_used(self):
        return {self.col_expression.column}


@dataclass
class DistanceFunctionLevel(ComparisonLevel):
    """UDF escape hatch: custom callable (l_array, r_array) -> np.ndarray of
    scores, compared against a threshold. ``sql_expression`` optional for
    oracle generation."""

    col_expression: ColumnExpression | str = "col"
    distance_function: Callable | None = None
    distance_threshold: float = 0.0
    higher_is_more_similar: bool = True
    sql_expression: str | None = None
    kind: ClassVar[str] = "distance_function"

    def __post_init__(self):
        self.col_expression = ensure_expression(self.col_expression)

    def _evaluate(self, pairs, ctx):
        l, r = _pair_arrays(self.col_expression, pairs)
        valid = _valid_pair_mask(l, r)
        # user callables see plain arrays, never pairgen's dictionary encoding
        v = np.asarray(self.distance_function(_plain(l), _plain(r)), np.float64)
        ok = (
            (v >= self.distance_threshold)
            if self.higher_is_more_similar
            else (v <= self.distance_threshold)
        )
        return ok & valid

    def sql(self):
        if not self.sql_expression:
            raise NotImplementedError("custom level has no SQL rendering")
        op = ">=" if self.higher_is_more_similar else "<="
        ls = _side(self.col_expression, "l").sql()
        rs = _side(self.col_expression, "r").sql()
        return f"{self.sql_expression.format(l=ls, r=rs)} {op} {self.distance_threshold}"

    def columns_used(self):
        return {self.col_expression.column}


@dataclass
class AbsoluteDifferenceLevel(ComparisonLevel):
    col_expression: ColumnExpression | str = "col"
    difference_threshold: float = 0.0
    kind: ClassVar[str] = "abs_difference"

    def __post_init__(self):
        self.col_expression = ensure_expression(self.col_expression)

    def _evaluate(self, pairs, ctx):
        l, r = _pair_arrays(self.col_expression, pairs)
        d = pc.abs(pc.subtract(pc.cast(l, pa.float64()), pc.cast(r, pa.float64())))
        return _to_np_bool(pc.less_equal(d, self.difference_threshold))

    def sql(self):
        ls = _side(self.col_expression, "l").sql()
        rs = _side(self.col_expression, "r").sql()
        return f"abs(CAST({ls} AS DOUBLE) - CAST({rs} AS DOUBLE)) <= {self.difference_threshold}"

    def columns_used(self):
        return {self.col_expression.column}


@dataclass
class AbsoluteTimeDifferenceLevel(ComparisonLevel):
    """|ts_l − ts_r| ≤ threshold, unit-aware (second/minute/hour/day/month/year).

    Reference: ``comparison_level_library.AbsoluteTimeDifferenceLevel`` /
    ``AbsoluteDateDifferenceLevel``.
    """

    col_expression: ColumnExpression | str = "col"
    threshold: float = 1.0
    metric: str = "day"
    kind: ClassVar[str] = "abs_time_difference"

    def __post_init__(self):
        self.col_expression = ensure_expression(self.col_expression)

    def _evaluate(self, pairs, ctx):
        l, r = _pair_arrays(self.col_expression, pairs)
        li = pc.cast(pc.cast(l, pa.timestamp("us")), pa.int64())
        ri = pc.cast(pc.cast(r, pa.timestamp("us")), pa.int64())
        lim = self.threshold * _TIME_UNIT_SECONDS[self.metric] * 1_000_000
        d = pc.abs(pc.subtract(li, ri))
        return _to_np_bool(pc.less_equal(pc.cast(d, pa.float64()), lim))

    def sql(self):
        ls = _side(self.col_expression, "l").sql()
        rs = _side(self.col_expression, "r").sql()
        lim = self.threshold * _TIME_UNIT_SECONDS[self.metric] * 1_000_000
        return (
            f"abs(CAST(epoch_us(CAST({ls} AS TIMESTAMP)) AS DOUBLE) - "
            f"CAST(epoch_us(CAST({rs} AS TIMESTAMP)) AS DOUBLE)) <= {lim}"
        )

    def columns_used(self):
        return {self.col_expression.column}


AbsoluteDateDifferenceLevel = AbsoluteTimeDifferenceLevel


@dataclass
class DistanceInKMLevel(ComparisonLevel):
    lat_col: ColumnExpression | str = "lat"
    long_col: ColumnExpression | str = "lng"
    km_threshold: float = 1.0
    kind: ClassVar[str] = "distance_in_km"

    def __post_init__(self):
        self.lat_col = ensure_expression(self.lat_col)
        self.long_col = ensure_expression(self.long_col)

    def _evaluate(self, pairs, ctx):
        lat_l = _side(self.lat_col, "l").evaluate(pairs)
        lat_r = _side(self.lat_col, "r").evaluate(pairs)
        lng_l = _side(self.long_col, "l").evaluate(pairs)
        lng_r = _side(self.long_col, "r").evaluate(pairs)
        valid = _valid_pair_mask(lat_l, lat_r) & _valid_pair_mask(lng_l, lng_r)
        km = kernels.haversine_km(
            *(
                pc.fill_null(pc.cast(x, pa.float64()), 0.0).to_numpy()
                for x in (lat_l, lng_l, lat_r, lng_r)
            )
        )
        return (km <= self.km_threshold) & valid

    def sql(self):
        la_l = _side(self.lat_col, "l").sql()
        la_r = _side(self.lat_col, "r").sql()
        lo_l = _side(self.long_col, "l").sql()
        lo_r = _side(self.long_col, "r").sql()
        return (
            f"2*6371*asin(sqrt(pow(sin(radians({la_r}-{la_l})/2),2) + "
            f"cos(radians({la_l}))*cos(radians({la_r}))*"
            f"pow(sin(radians({lo_r}-{lo_l})/2),2))) <= {self.km_threshold}"
        )

    def columns_used(self):
        return {self.lat_col.column, self.long_col.column}


@dataclass
class PercentageDifferenceLevel(ComparisonLevel):
    """|a−b| / max(|a|,|b|) ≤ p (splink: relative to the larger magnitude)."""

    col_expression: ColumnExpression | str = "col"
    percentage_threshold: float = 0.1
    kind: ClassVar[str] = "percentage_difference"

    def __post_init__(self):
        self.col_expression = ensure_expression(self.col_expression)

    def _evaluate(self, pairs, ctx):
        l, r = _pair_arrays(self.col_expression, pairs)
        a = pc.cast(l, pa.float64()).to_numpy(zero_copy_only=False)
        b = pc.cast(r, pa.float64()).to_numpy(zero_copy_only=False)
        valid = ~(np.isnan(a) | np.isnan(b))
        a = np.nan_to_num(a)
        b = np.nan_to_num(b)
        denom = np.maximum(np.abs(a), np.abs(b))
        with np.errstate(divide="ignore", invalid="ignore"):
            rel = np.where(denom > 0, np.abs(a - b) / denom, 0.0)
        return (rel <= self.percentage_threshold) & valid

    def sql(self):
        ls = _side(self.col_expression, "l").sql()
        rs = _side(self.col_expression, "r").sql()
        return (
            f"(CASE WHEN greatest(abs(CAST({ls} AS DOUBLE)), abs(CAST({rs} AS DOUBLE))) > 0 "
            f"THEN abs(CAST({ls} AS DOUBLE) - CAST({rs} AS DOUBLE)) / "
            f"greatest(abs(CAST({ls} AS DOUBLE)), abs(CAST({rs} AS DOUBLE))) ELSE 0 END) "
            f"<= {self.percentage_threshold}"
        )

    def columns_used(self):
        return {self.col_expression.column}


@dataclass
class ArrayIntersectLevel(ComparisonLevel):
    col_expression: ColumnExpression | str = "col"
    min_intersection: int = 1
    kind: ClassVar[str] = "array_intersect"

    def __post_init__(self):
        self.col_expression = ensure_expression(self.col_expression)

    def _evaluate(self, pairs, ctx):
        l, r = _pair_arrays(self.col_expression, pairs)
        if ctx.duck is not None:
            # C++ list kernel — per-pair python set ops are ~10× slower
            vals = ctx.duck.eval_expr("len(list_intersect(l, r))", l, r)
            v = pc.fill_null(vals, -1).to_numpy(zero_copy_only=False)
            return v >= self.min_intersection
        sizes = kernels.array_intersect_size(l.to_pylist(), r.to_pylist())
        valid = _valid_pair_mask(l, r)
        return (sizes >= self.min_intersection) & valid

    def sql(self):
        ls = _side(self.col_expression, "l").sql()
        rs = _side(self.col_expression, "r").sql()
        return f"len(list_intersect({ls}, {rs})) >= {self.min_intersection}"

    def columns_used(self):
        return {self.col_expression.column}


@dataclass
class ArraySubsetLevel(ComparisonLevel):
    col_expression: ColumnExpression | str = "col"
    kind: ClassVar[str] = "array_subset"

    def __post_init__(self):
        self.col_expression = ensure_expression(self.col_expression)

    def _evaluate(self, pairs, ctx):
        l, r = _pair_arrays(self.col_expression, pairs)
        if ctx.duck is not None:
            expr = (
                "coalesce(len(list_intersect(l, r)) = "
                "least(len(list_distinct(l)), len(list_distinct(r))) "
                "AND least(len(list_distinct(l)), len(list_distinct(r))) > 0, FALSE)"
            )
            return _to_np_bool(ctx.duck.eval_expr(expr, l, r))
        return kernels.array_subset(l.to_pylist(), r.to_pylist())

    def sql(self):
        ls = _side(self.col_expression, "l").sql()
        rs = _side(self.col_expression, "r").sql()
        return (
            f"(len(list_intersect({ls}, {rs})) = least(len(list_distinct({ls})), "
            f"len(list_distinct({rs}))) AND least(len(list_distinct({ls})), "
            f"len(list_distinct({rs}))) > 0)"
        )

    def columns_used(self):
        return {self.col_expression.column}


@dataclass
class ElseLevel(ComparisonLevel):
    kind: ClassVar[str] = "else"

    def _evaluate(self, pairs, ctx):
        return np.ones(len(pairs), bool)

    def sql(self):
        return "TRUE"

    def columns_used(self):
        return set()


@dataclass
class CustomLevel(ComparisonLevel):
    """Custom callable ``(pairs: pa.Table) -> np.ndarray[bool]``; the user
    extension seam (SURVEY.md §2.14)."""

    predicate: Callable | None = None
    sql_condition: str | None = None
    used_columns: tuple[str, ...] = ()
    kind: ClassVar[str] = "custom"

    def _evaluate(self, pairs, ctx):
        # user callables see plain columns, never pairgen's dictionary encoding
        return np.asarray(self.predicate(_plain_table(pairs)), bool)

    def sql(self):
        if not self.sql_condition:
            raise NotImplementedError("custom level has no SQL rendering")
        return self.sql_condition

    def columns_used(self):
        return set(self.used_columns)


# ---- boolean composition (comparison_level_composition.py) -----------------


@dataclass
class And(ComparisonLevel):
    sub_levels: tuple[ComparisonLevel, ...] = ()
    kind: ClassVar[str] = "and"

    def __init__(self, *levels: ComparisonLevel, **kw):
        super().__init__(**kw)
        self.sub_levels = tuple(levels)
        # composition of null levels is itself a null level (splink
        # comparison_level_composition semantics)
        self.is_null_level = all(lv.is_null_level for lv in levels)

    def _evaluate(self, pairs, ctx):
        out = np.ones(len(pairs), bool)
        for lv in self.sub_levels:
            out &= lv.evaluate(pairs, ctx)
        return out

    def sql(self):
        return "(" + " AND ".join(lv.sql() for lv in self.sub_levels) + ")"

    def columns_used(self):
        return set().union(*(lv.columns_used() for lv in self.sub_levels))


@dataclass
class Or(ComparisonLevel):
    sub_levels: tuple[ComparisonLevel, ...] = ()
    kind: ClassVar[str] = "or"

    def __init__(self, *levels: ComparisonLevel, **kw):
        super().__init__(**kw)
        self.sub_levels = tuple(levels)
        self.is_null_level = all(lv.is_null_level for lv in levels)

    def _evaluate(self, pairs, ctx):
        out = np.zeros(len(pairs), bool)
        for lv in self.sub_levels:
            out |= lv.evaluate(pairs, ctx)
        return out

    def sql(self):
        return "(" + " OR ".join(lv.sql() for lv in self.sub_levels) + ")"

    def columns_used(self):
        return set().union(*(lv.columns_used() for lv in self.sub_levels))


@dataclass
class Not(ComparisonLevel):
    sub_level: ComparisonLevel | None = None
    kind: ClassVar[str] = "not"

    def __init__(self, level: ComparisonLevel, **kw):
        super().__init__(**kw)
        self.sub_level = level

    def _evaluate(self, pairs, ctx):
        return ~self.sub_level.evaluate(pairs, ctx)

    def sql(self):
        return f"(NOT {self.sub_level.sql()})"

    def columns_used(self):
        return self.sub_level.columns_used()
