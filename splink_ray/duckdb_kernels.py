"""DuckDB-embedded batch kernels — the string-similarity hot path.

splink's DuckDB backend executes its comparison-level SQL with DuckDB's C++
vectorized string kernels (``splink/internals/comparison_level_library.py`` →
dialect SQL; /root/reference empty, SURVEY.md §0). We get exact semantic
parity *and* C++ speed by running the same functions over the zero-copy Arrow
batch inside a Ray ``map_batches`` stage: each actor owns one single-threaded
in-memory DuckDB connection (``PRAGMA threads=1`` so Ray's CPU accounting
stays truthful) created once in ``__init__``.

The numpy implementations in ``kernels.py`` are the reference/fallback and
the unit-test cross-check; this module is purely a performance substitution
with identical results.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class DuckKernel:
    """One per worker/actor: evaluates string-similarity expressions over an
    Arrow table of (l, r) string columns via an embedded DuckDB connection."""

    def __init__(self) -> None:
        import duckdb

        self.con = duckdb.connect(":memory:")
        self.con.execute("PRAGMA threads=1")

    def eval_expr(self, expr_sql: str, l: pa.Array, r: pa.Array) -> np.ndarray:
        """Evaluate ``expr_sql`` (over columns named l, r) per row.

        Returns a numpy array; null inputs yield the function's SQL-null
        result which we surface as numpy nan / 0 per caller masking.
        """
        tbl = pa.table({"l": l, "r": r})
        self.con.register("_pairs", tbl)
        out = self.con.execute(
            f"SELECT {expr_sql} AS v FROM _pairs"
        ).fetch_arrow_table()
        self.con.unregister("_pairs")
        col = out["v"].combine_chunks()
        return col

    def levenshtein(self, l: pa.Array, r: pa.Array) -> pa.Array:
        return self.eval_expr("levenshtein(l, r)", l, r)

    def damerau_levenshtein(self, l: pa.Array, r: pa.Array) -> pa.Array:
        return self.eval_expr("damerau_levenshtein(l, r)", l, r)

    def jaro(self, l: pa.Array, r: pa.Array) -> pa.Array:
        return self.eval_expr("jaro_similarity(l, r)", l, r)

    def jaro_winkler(self, l: pa.Array, r: pa.Array) -> pa.Array:
        return self.eval_expr("jaro_winkler_similarity(l, r)", l, r)

    def jaccard(self, l: pa.Array, r: pa.Array) -> pa.Array:
        # DuckDB's jaccard raises on empty strings; define empty → 0.0
        return self.eval_expr(
            "CASE WHEN length(l) > 0 AND length(r) > 0 THEN jaccard(l, r) ELSE 0.0 END",
            l, r,
        )


_GLOBAL: DuckKernel | None = None


def get_kernel() -> DuckKernel:
    """Process-local singleton (one connection per Ray worker process)."""
    global _GLOBAL
    if _GLOBAL is None:
        _GLOBAL = DuckKernel()
    return _GLOBAL
