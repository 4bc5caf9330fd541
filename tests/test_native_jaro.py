"""Native bit-parallel jaro kernels: DuckDB bit-parity + cutoff semantics.

The native path (splink_ray/native/jaro.c) must be byte-for-byte
indistinguishable from DuckDB's jaro/jaro_winkler (which the oracle SQL
uses) — these tests fuzz that, exercise the dictionary-indexed entry, and
pin the threshold-cutoff contract (exact at/above cutoff, anything below).
"""

import random

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from splink_ray.native import get_lib, jaro_arrow, jaro_arrow_idx

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="no C compiler: native kernels disabled"
)


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()

    def f(fn, L, R):
        t = pa.table({"l": L, "r": R})
        con.register("_t", t)
        out = con.execute(f"SELECT {fn}(l, r) AS v FROM _t").fetch_arrow_table()
        con.unregister("_t")
        return out["v"].combine_chunks()

    return f


def _rand_strings(n, maxlen, alphabet, seed):
    rng = random.Random(seed)
    return pa.array(
        ["".join(rng.choice(alphabet) for _ in range(rng.randrange(maxlen))) for _ in range(n)]
    )


@pytest.mark.parametrize(
    "alphabet,maxlen",
    [
        ("ab", 8),
        ("abcdef", 40),
        ("abcdefghij klmnop", 130),
        ("abcdefghijklmnopqrstuvwxyz 0123456789", 300),
        ("aáé日", 60),  # multi-byte: byte semantics, like DuckDB
    ],
)
@pytest.mark.parametrize("winkler", [False, True])
def test_fuzz_bit_parity(duck, alphabet, maxlen, winkler):
    L = _rand_strings(8000, maxlen, alphabet, seed=hash((alphabet, winkler)) & 0xFFFF)
    R = _rand_strings(8000, maxlen, alphabet, seed=(hash((alphabet, winkler)) >> 4) & 0xFFFF)
    fn = "jaro_winkler_similarity" if winkler else "jaro_similarity"
    mine = jaro_arrow(L, R, winkler).to_numpy(zero_copy_only=False)
    ref = duck(fn, L, R).to_numpy(zero_copy_only=False)
    assert np.array_equal(mine, ref)  # bitwise, no tolerance


def test_edge_cases(duck):
    L = pa.array(["", "a", "", "ab", None, "x", "martha", "dixon", "x" * 2100])
    R = pa.array(["", "", "a", "ba", "y", None, "marhta", "dicksonx", "x" * 2100])
    out = jaro_arrow(L, R, True)
    if out is None:
        # >2048-byte strings force the DuckDB fallback for the whole batch
        L2, R2 = L.slice(0, 8), R.slice(0, 8)
        out = jaro_arrow(L2, R2, True)
        ref = duck("jaro_winkler_similarity", L2, R2)
        assert out.equals(ref.cast(pa.float64()))
    else:
        ref = duck("jaro_winkler_similarity", L, R)
        assert out.equals(ref.cast(pa.float64()))


def test_dictionary_indexed_path(duck):
    L = _rand_strings(20000, 120, "abcdefgh ijk", seed=3)
    R = _rand_strings(20000, 120, "abcdefgh ijk", seed=4)
    ld, rd = pc.dictionary_encode(L), pc.dictionary_encode(R)
    li = ld.indices.to_numpy(zero_copy_only=False).astype(np.int32).copy()
    ri = rd.indices.to_numpy(zero_copy_only=False).astype(np.int32).copy()
    li[7] = -1  # null row
    out = jaro_arrow_idx(ld.dictionary, li, rd.dictionary, ri, True)
    ref = duck("jaro_winkler_similarity", L, R).to_numpy(zero_copy_only=False)
    vals = out.to_numpy(zero_copy_only=False)
    assert out.null_count == 1 and not out[7].is_valid
    keep = np.arange(len(L)) != 7
    assert np.array_equal(vals[keep], ref[keep])


def test_cutoff_exact_at_or_above(duck):
    L = _rand_strings(30000, 120, "abcdef gh", seed=5)
    R = _rand_strings(30000, 120, "abcdef gh", seed=6)
    exact = jaro_arrow(L, R, True).to_numpy(zero_copy_only=False)
    for cutoff in (0.7, 0.88, 0.95):
        cut = jaro_arrow(L, R, True, cutoff).to_numpy(zero_copy_only=False)
        hi = exact >= cutoff
        # exact region: bitwise identical
        assert np.array_equal(cut[hi], exact[hi])
        # below-cutoff region: whatever came back must still be below cutoff
        assert (cut[~hi] < cutoff).all()


def test_fused_predict_native_equals_duckdb(tmp_path):
    """End-to-end: the fused scoring bucket output is identical with the
    native kernels force-disabled (DuckDB reference path)."""
    import splink_ray.native as nat
    from splink_ray.comparison_level_library import (
        ElseLevel, ExactMatchLevel, JaroWinklerLevel, NullLevel,
    )
    from splink_ray.settings import Comparison, Settings, make_eval_context
    from splink_ray.stages.scoring import score_pair_batch

    rng = random.Random(9)
    words = ["mar" + str(i) for i in range(40)]

    def txt():
        return " ".join(rng.choice(words) for _ in range(12))

    n = 3000
    base = [txt() for _ in range(300)]
    lvals = [rng.choice(base) for _ in range(n)] + [None]
    rvals = [rng.choice(base) for _ in range(n)] + [None]
    pairs = pa.table(
        {
            "unique_id_l": pa.array([str(i) for i in range(n + 1)]),
            "unique_id_r": pa.array([str(i + 9000) for i in range(n + 1)]),
            "name_l": pa.array(lvals),
            "name_r": pa.array(rvals),
        }
    )
    comp = Comparison(
        "name",
        [
            NullLevel("name"),
            ExactMatchLevel("name", m_probability=0.7, u_probability=1e-4),
            JaroWinklerLevel("name", 0.92, m_probability=0.2, u_probability=1e-3),
            JaroWinklerLevel("name", 0.7, m_probability=0.05, u_probability=0.1),
            ElseLevel(m_probability=0.05, u_probability=0.8989),
        ],
    )
    settings = Settings(comparisons=[comp])
    keep = ["unique_id_l", "unique_id_r"]

    # dict-encoded pair columns (the fused pairgen shape)
    dpairs = pairs
    for c in ("name_l", "name_r"):
        i = dpairs.column_names.index(c)
        dpairs = dpairs.set_column(
            i, c, pc.dictionary_encode(dpairs[c].combine_chunks())
        )

    outs = {}
    for label, disabled in (("native", False), ("duckdb", True)):
        nat._lib, nat._lib_failed = None, disabled
        ctx = make_eval_context(settings)
        outs[label] = {
            "plain": score_pair_batch(pairs, settings, ctx, {}, keep),
            "dict": score_pair_batch(dpairs, settings, ctx, {}, keep),
        }
    nat._lib, nat._lib_failed = None, False
    assert outs["native"]["plain"].equals(outs["duckdb"]["plain"])
    assert outs["native"]["dict"].equals(outs["duckdb"]["dict"])
    assert outs["native"]["plain"].equals(outs["native"]["dict"])
