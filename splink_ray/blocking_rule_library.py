"""Blocking rules — declarative key derivation.

Reference: ``splink/internals/blocking_rule_library.py::block_on, CustomRule``
and ``splink/internals/blocking.py::BlockingRule, SaltedBlockingRule,
ExplodingBlockingRule`` (public layout; /root/reference empty — SURVEY.md §0).

The reference renders each rule as a SQL equi-join condition. Here a rule is
a list of :class:`ColumnExpression` key components; the Ray mapping derives a
single string join key per record (components joined with a \\x1f separator,
null if any component is null) which becomes the hash-shuffle key for
``groupby(bk).map_groups(pairgen)`` — SURVEY.md §2.4 B1-B5.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

from .expressions import ColumnExpression, ensure_expression

_SEP = "\x1f"


@dataclass
class BlockingRule:
    key_expressions: list[ColumnExpression] = field(default_factory=list)
    salting_partitions: int = 1  # static salting hint (SaltedBlockingRule)
    # ExplodingBlockingRule: explode these list-columns before keying
    array_columns_to_explode: list[str] = field(default_factory=list)
    description: str = ""

    def __post_init__(self):
        self.key_expressions = [ensure_expression(e) for e in self.key_expressions]
        if not self.description:
            self.description = " AND ".join(
                f"l.{e.sql()} = r.{e.sql()}" for e in self.key_expressions
            )

    @property
    def is_exploding(self) -> bool:
        return bool(self.array_columns_to_explode)

    def columns_used(self) -> set[str]:
        return {e.column for e in self.key_expressions} | set(self.array_columns_to_explode)

    def key_values(self, tbl: pa.Table) -> pa.Array:
        """One string key per record; null if any component null."""
        parts = []
        for e in self.key_expressions:
            arr = e.evaluate(tbl)
            if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
                arr = pc.cast(arr, pa.string())
            parts.append(arr)
        if len(parts) == 1:
            return parts[0]
        return pc.binary_join_element_wise(*parts, _SEP, null_handling="emit_null")

    def sql_join_condition(self, l: str = "l", r: str = "r") -> str:
        """DuckDB equi-join condition (oracle generation / parity docs)."""
        return " AND ".join(
            f"{e.sql(l + '.')} = {e.sql(r + '.')}" for e in self.key_expressions
        )

    def sql_key_expr(self, prefix: str = "") -> str:
        """DuckDB expression equal to :meth:`key_values` (string key)."""
        parts = [f"CAST({e.sql(prefix)} AS VARCHAR)" for e in self.key_expressions]
        if len(parts) == 1:
            return parts[0]
        joined = ", ".join(parts)
        return f"concat_ws(chr(31), {joined})"

    def to_dict(self) -> dict:
        return {
            "key_expressions": [e.to_dict() for e in self.key_expressions],
            "salting_partitions": self.salting_partitions,
            "array_columns_to_explode": list(self.array_columns_to_explode),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "BlockingRule":
        return cls(
            [ColumnExpression.from_dict(e) for e in d["key_expressions"]],
            d.get("salting_partitions", 1),
            d.get("array_columns_to_explode", []),
        )


@dataclass
class KeyFunctionRule(BlockingRule):
    """Custom blocking key: callable ``pa.Table -> pa.Array`` (user-extension
    seam, SURVEY.md §2.14). No SQL rendering — driver check is rows-only."""

    key_fn: Callable | None = None
    name: str = "custom"

    def key_values(self, tbl: pa.Table) -> pa.Array:
        arr = self.key_fn(tbl)
        if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
            arr = pa.array(arr)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if not pa.types.is_string(arr.type):
            arr = pc.cast(arr, pa.string())
        return arr

    def columns_used(self) -> set[str]:
        return set()

    def sql_join_condition(self, l: str = "l", r: str = "r") -> str:
        raise NotImplementedError("custom key function has no SQL rendering")


def block_on(*cols: "str | ColumnExpression", salting_partitions: int = 1) -> BlockingRule:
    """``block_on("city", col("email").lower())`` — splink 4 public API."""
    return BlockingRule([ensure_expression(c) for c in cols], salting_partitions)
