"""ColumnExpression — a tiny derived-column DSL.

Reference semantics: ``splink/internals/column_expression.py::ColumnExpression``
(public splink 4.x layout; the /root/reference checkout is empty — see
SURVEY.md §0). The reference builds dialect SQL strings; here each expression
is doubly interpretable:

- ``evaluate(table)`` → ``pyarrow.Array`` via vectorized ``pyarrow.compute``
  kernels (the Ray Data hot path, zero-copy over Arrow batches), and
- ``sql(prefix)`` → an equivalent DuckDB SQL fragment (used to auto-generate
  the driver's ``oracle_sql()`` strings and for documentation parity).

Expressions are pure data (JSON round-trippable) so they can be captured in
closures shipped to Ray workers without pickling surprises.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


@dataclass(frozen=True)
class ColumnExpression:
    """A base column with a chain of transforms applied."""

    column: str
    ops: tuple[tuple[str, tuple[Any, ...]], ...] = field(default_factory=tuple)

    # ---- builder API -----------------------------------------------------
    def _chain(self, name: str, *args: Any) -> "ColumnExpression":
        return ColumnExpression(self.column, self.ops + ((name, args),))

    def lower(self) -> "ColumnExpression":
        return self._chain("lower")

    def upper(self) -> "ColumnExpression":
        return self._chain("upper")

    def substr(self, start: int, length: int) -> "ColumnExpression":
        """1-based start, like SQL substr."""
        return self._chain("substr", start, length)

    def cast_to_string(self) -> "ColumnExpression":
        return self._chain("cast_to_string")

    def regex_extract(self, pattern: str) -> "ColumnExpression":
        """First match of ``pattern`` (empty string when no match)."""
        return self._chain("regex_extract", pattern)

    def try_parse_timestamp(self, fmt: str = "%Y-%m-%d %H:%M:%S") -> "ColumnExpression":
        return self._chain("try_parse_timestamp", fmt)

    def try_parse_date(self, fmt: str = "%Y-%m-%d") -> "ColumnExpression":
        return self._chain("try_parse_date", fmt)

    def date_trunc_day(self) -> "ColumnExpression":
        """Timestamp → 'YYYY-MM-DD' string (blocking-key friendly)."""
        return self._chain("date_trunc_day")

    def str_len(self) -> "ColumnExpression":
        return self._chain("str_len")

    # ---- evaluation ------------------------------------------------------
    def evaluate(self, table: pa.Table) -> pa.Array:
        arr: pa.ChunkedArray | pa.Array = table[self.column]
        if isinstance(arr, pa.ChunkedArray):
            # single-chunk columns (the common case for take-built pair
            # chunks) are unwrapped zero-copy; combine_chunks would COPY the
            # strings and dominated the scoring profile
            arr = arr.chunk(0) if arr.num_chunks == 1 else arr.combine_chunks()
        if self.ops and pa.types.is_dictionary(arr.type):
            # transform chains operate on values: decode once (dict-encoded
            # columns only appear on the fused scoring path; untransformed
            # columns pass through encoded for the index-aware kernels)
            arr = arr.cast(arr.type.value_type)
        for name, args in self.ops:
            if name == "lower":
                arr = pc.utf8_lower(arr)
            elif name == "upper":
                arr = pc.utf8_upper(arr)
            elif name == "substr":
                start, length = args
                arr = pc.utf8_slice_codeunits(arr, start - 1, start - 1 + length)
            elif name == "cast_to_string":
                arr = pc.cast(arr, pa.string())
            elif name == "regex_extract":
                # pattern must not contain unnamed capture groups (Arrow
                # restriction); null when no match (SQL side uses CASE to align)
                (pattern,) = args
                st = pc.extract_regex(arr, pattern=f"(?P<m>{pattern})")
                arr = pc.struct_field(st, "m")
            elif name == "try_parse_timestamp":
                (fmt,) = args
                arr = pc.strptime(arr, format=fmt, unit="us", error_is_null=True)
            elif name == "try_parse_date":
                (fmt,) = args
                arr = pc.cast(
                    pc.strptime(arr, format=fmt, unit="us", error_is_null=True),
                    pa.date32(),
                )
            elif name == "date_trunc_day":
                arr = pc.strftime(arr, format="%Y-%m-%d")
            elif name == "str_len":
                arr = pc.utf8_length(arr)
            else:  # pragma: no cover
                raise ValueError(f"unknown ColumnExpression op {name!r}")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return arr

    # ---- SQL rendering (DuckDB dialect — oracle generation) --------------
    def sql(self, prefix: str = "") -> str:
        expr = f'{prefix}"{self.column}"' if prefix else f'"{self.column}"'
        for name, args in self.ops:
            if name == "lower":
                expr = f"lower({expr})"
            elif name == "upper":
                expr = f"upper({expr})"
            elif name == "substr":
                start, length = args
                expr = f"substr({expr}, {start}, {length})"
            elif name == "cast_to_string":
                expr = f"CAST({expr} AS VARCHAR)"
            elif name == "regex_extract":
                # DuckDB regexp_extract returns '' on no match; emit NULL to
                # align with the Arrow path
                (pattern,) = args
                p = _sql_quote(pattern)
                expr = (
                    f"(CASE WHEN regexp_matches({expr}, {p}) "
                    f"THEN regexp_extract({expr}, {p}) ELSE NULL END)"
                )
            elif name == "try_parse_timestamp":
                (fmt,) = args
                expr = f"try_strptime({expr}, {_sql_quote(fmt)})"
            elif name == "try_parse_date":
                (fmt,) = args
                expr = f"CAST(try_strptime({expr}, {_sql_quote(fmt)}) AS DATE)"
            elif name == "date_trunc_day":
                expr = f"strftime({expr}, '%Y-%m-%d')"
            elif name == "str_len":
                expr = f"length({expr})"
            else:  # pragma: no cover
                raise ValueError(f"unknown ColumnExpression op {name!r}")
        return expr

    # ---- JSON round trip -------------------------------------------------
    def to_dict(self) -> dict:
        return {"column": self.column, "ops": [[n, list(a)] for n, a in self.ops]}

    @classmethod
    def from_dict(cls, d: dict) -> "ColumnExpression":
        return cls(d["column"], tuple((n, tuple(a)) for n, a in d["ops"]))

    @property
    def output_name(self) -> str:
        if not self.ops:
            return self.column
        tags = "_".join(op for op, _ in self.ops)
        return f"{self.column}__{tags}"


def col(name: str) -> ColumnExpression:
    return ColumnExpression(name)


def ensure_expression(x: "str | ColumnExpression") -> ColumnExpression:
    return x if isinstance(x, ColumnExpression) else ColumnExpression(x)
