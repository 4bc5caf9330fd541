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
        # retain arenas between per-chunk queries: the default 128 MB flush
        # threshold returns pages to the OS after every chunk, and this
        # environment's first-touch faults (~150 MB/s, no THP) then dominate
        # the kernel wall time. Bounded at 512 MB — full retention across 32
        # workers caused memory pressure at the dense bench scale.
        try:
            self.con.execute("SET allocator_flush_threshold='512mb'")
        except Exception:
            pass

    def eval_expr(
        self, expr_sql: str, l: pa.Array, r: pa.Array, cutoff: float | None = None
    ) -> np.ndarray:
        """Evaluate ``expr_sql`` (over columns named l, r) per row.

        Returns a numpy array; null inputs yield the function's SQL-null
        result which we surface as numpy nan / 0 per caller masking.

        Duplicate (l, r) value pairs are evaluated ONCE and scattered back:
        near-duplicate-heavy blocks repeat the same string pair across many
        record pairs (every copy-combination of the same two entities), so
        this cuts the C++ kernel work by the mean copy-product while staying
        byte-exact.

        ``cutoff`` (threshold ladders only): values >= cutoff stay exact;
        rows provably below it may return 0.0 — legal only when every
        consumer compares the result against thresholds >= cutoff. Ignored
        by the DuckDB path (which is always exact, a superset of the
        contract); honored by the native jaro kernels' early exit."""
        n = len(l)

        def _group_key(arr):
            """(codes int64 | None, dictionary | None, arr) for dedup:
            strings group on their values; ALREADY-dictionary-encoded string
            columns (the fused pairgen path encodes once per bucket) reuse
            their indices directly — no per-chunk re-hash; string lists
            group on an order-sensitive serialization (conservative —
            identical key ⟹ identical value, so results stay byte-exact;
            a null key only arises from a null value, and every kernel is
            null-in → null-out, so grouping nulls together is sound)."""
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            t = arr.type
            if pa.types.is_dictionary(t) and (
                pa.types.is_string(t.value_type) or pa.types.is_large_string(t.value_type)
            ):
                codes = arr.indices.fill_null(-1).to_numpy(zero_copy_only=False)
                return codes.astype(np.int64), arr.dictionary, arr
            if pa.types.is_string(t) or pa.types.is_large_string(t):
                enc = pa.compute.dictionary_encode(arr)
                codes = enc.indices.fill_null(-1).to_numpy(zero_copy_only=False)
                return codes.astype(np.int64), enc.dictionary, arr
            if pa.types.is_list(t) and (
                pa.types.is_string(t.value_type)
                or pa.types.is_large_string(t.value_type)
            ):
                enc = pa.compute.dictionary_encode(
                    pa.compute.binary_join(arr, "\x1f")
                )
                codes = enc.indices.fill_null(-1).to_numpy(zero_copy_only=False)
                return codes.astype(np.int64), None, arr
            return None, None, arr

        li, ldict, l = _group_key(l)
        ri, rdict, r = _group_key(r)
        if n >= 2048 and li is not None and ri is not None:
            width = np.int64(int(ri.max(initial=-1)) + 3)
            comb = (li + 1) * width + (ri + 1)
            # hash-based factorize (no sort) + reverse-scatter for first
            # occurrence — ~5× cheaper than np.unique here. ALWAYS measure
            # the true distinct ratio: the former |dict_l|·|dict_r| >= 0.8n
            # pre-bail skipped dedup on dense entity blocks whose PRODUCT
            # bound is huge but whose actual distinct (l,r) ratio is ~0.68
            # (measured on the 1000-entities/day bench bucket — r3 verdict
            # item #6); the factorize itself is ~0.4% of one JW evaluation
            # over the same rows, so measuring always is free
            import pandas as pd

            inverse, uniques = pd.factorize(comb, sort=False)
            k = len(uniques)
            if k <= 0.9 * n:
                first_idx = np.empty(k, np.int64)
                first_idx[inverse[::-1]] = np.arange(n - 1, -1, -1, dtype=np.int64)
                # order the unique pairs by LEFT code so consecutive rows
                # share their left string — the native jaro kernel reuses
                # its pattern-match table across them (dense blocks repeat
                # each left value against hundreds of rights)
                order = np.argsort(li[first_idx], kind="stable")
                first_idx = first_idx[order]
                rank = np.empty(k, np.int64)
                rank[order] = np.arange(k, dtype=np.int64)
                inverse = rank[inverse]
                res = None
                winkler = self._NATIVE.get(expr_sql)
                if winkler is not None and ldict is not None and rdict is not None:
                    # dictionary-indexed native path: the kernel reads the
                    # (tiny) dictionaries; no unique-row string gathers
                    from .native import jaro_arrow_idx

                    res = jaro_arrow_idx(
                        ldict, li[first_idx], rdict, ri[first_idx],
                        winkler, cutoff,
                    )
                if res is None:
                    res = self._eval_raw(
                        expr_sql,
                        l.take(pa.array(first_idx)),
                        r.take(pa.array(first_idx)),
                        cutoff,
                    )
                if res.null_count == 0 and pa.types.is_floating(res.type):
                    # numpy gather beats Arrow take for the dense scatter
                    rn = res.to_numpy(zero_copy_only=False)
                    return pa.array(rn[inverse])
                return res.take(pa.array(inverse))
        return self._eval_raw(expr_sql, l, r, cutoff)

    # expressions with a native (C, DuckDB-bit-parity) fast path
    _NATIVE = {
        "jaro_winkler_similarity(l, r)": True,  # -> winkler flag
        "jaro_similarity(l, r)": False,
    }

    def _eval_raw(
        self, expr_sql: str, l: pa.Array, r: pa.Array, cutoff: float | None = None
    ):
        if pa.types.is_dictionary(l.type):
            l = l.cast(l.type.value_type)
        if pa.types.is_dictionary(r.type):
            r = r.cast(r.type.value_type)
        winkler = self._NATIVE.get(expr_sql)
        if winkler is not None:
            from .native import jaro_arrow

            out = jaro_arrow(l, r, winkler, cutoff)
            if out is not None:
                return out
        tbl = pa.table({"l": l, "r": r})
        self.con.register("_pairs", tbl)
        out = self.con.execute(
            f"SELECT {expr_sql} AS v FROM _pairs"
        ).fetch_arrow_table()
        self.con.unregister("_pairs")
        col = out["v"].combine_chunks()
        return col

    def md5_u32(self, v) -> "np.ndarray":
        """Vectorized ``('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 8))::UINT64``
        — the deterministic-sampling hash. Running it through DuckDB keeps
        bit-parity with the SQL oracles by construction (same md5, same
        VARCHAR rendering of the key)."""
        import numpy as np

        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        tbl = pa.table({"v": v})
        self.con.register("_keys", tbl)
        out = self.con.execute(
            "SELECT ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 8))::UBIGINT AS h "
            "FROM _keys"
        ).fetch_arrow_table()
        self.con.unregister("_keys")
        return out["h"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)

    def aes_key(self, k, w) -> pa.Array:
        """Efraimidis–Spirakis reservoir key ``pow(u, 1/w)`` with
        ``u = (md5_u32(k) + 0.5) / 2^32`` ∈ (0, 1). Evaluated in DuckDB so
        the double-precision ``pow`` is bit-identical to the SQL oracle by
        construction (libm ``pow`` may differ by 1 ulp across
        implementations — enough to flip a top-n boundary)."""
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        tbl = pa.table({"k": k, "w": w})
        self.con.register("_keys", tbl)
        out = self.con.execute(
            "SELECT pow((('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::UBIGINT"
            " + 0.5) / 4294967296.0, 1.0 / CAST(w AS DOUBLE)) AS v FROM _keys"
        ).fetch_arrow_table()
        self.con.unregister("_keys")
        return out["v"].combine_chunks()

    def md5_hex(self, v) -> pa.Array:
        """Vectorized ``md5(v)`` hexdigest (lowercase, identical to
        ``hashlib.md5(...).hexdigest()``) — C++ throughput for the
        canonicalize concat-hash instead of a per-group Python loop, and
        bit-parity with the ``md5(string_agg(...))`` oracle by construction.
        Null in → null out."""
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        tbl = pa.table({"v": v})
        self.con.register("_keys", tbl)
        out = self.con.execute("SELECT md5(v) AS h FROM _keys").fetch_arrow_table()
        self.con.unregister("_keys")
        return out["h"].combine_chunks()

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
