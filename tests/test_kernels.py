"""Kernel oracle tests: numpy reference implementations vs DuckDB 1.0 C++
built-ins (SURVEY.md §5.2.1). DuckDB is also the hot-path engine
(duckdb_kernels.py), so these tests prove the two paths agree."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings as hsettings
from hypothesis import strategies as st

from splink_ray import kernels
from splink_ray.duckdb_kernels import DuckKernel

CORPUS = [
    "", "a", "ab", "abc", "kitten", "sitting", "martha", "marhta",
    "dixon", "dicksonx", "jellyfish", "smellyfish", "café", "cafe",
    "ünïcødé", "unicode", "aaaa", "aaab", "the quick brown fox",
    "the quick brown fix", "ABBA", "BABA", "CA", "ABC", "xy", "yx",
]


def _pairs():
    a, b = [], []
    for x in CORPUS:
        for y in CORPUS:
            a.append(x)
            b.append(y)
    return a, b


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    return con


def _duck_fn(con, fn, a, b):
    tbl = pa.table({"a": a, "b": b})
    con.register("t", tbl)
    out = con.execute(f"SELECT {fn}(a, b) AS v FROM t").fetchnumpy()["v"]
    con.unregister("t")
    return out


def test_levenshtein_vs_duckdb(duck):
    a, b = _pairs()
    ours = kernels.levenshtein(a, b)
    ref = _duck_fn(duck, "levenshtein", a, b)
    np.testing.assert_array_equal(ours, ref)


def test_damerau_vs_duckdb(duck):
    a, b = _pairs()
    ours = kernels.damerau_levenshtein(a, b)
    ref = _duck_fn(duck, "damerau_levenshtein", a, b)
    np.testing.assert_array_equal(ours, ref)


def test_jaro_vs_duckdb(duck):
    a, b = _pairs()
    ours = kernels.jaro(a, b)
    ref = _duck_fn(duck, "jaro_similarity", a, b)
    np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_jaro_winkler_vs_duckdb(duck):
    a, b = _pairs()
    ours = kernels.jaro_winkler(a, b)
    ref = _duck_fn(duck, "jaro_winkler_similarity", a, b)
    np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_jaccard_vs_duckdb(duck):
    a, b = _pairs()
    ours = kernels.jaccard_charset(a, b)
    tbl = pa.table({"a": a, "b": b})
    duck.register("t", tbl)
    ref = duck.execute(
        "SELECT CASE WHEN length(a) > 0 AND length(b) > 0 "
        "THEN jaccard(a, b) ELSE 0.0 END AS v FROM t"
    ).fetchnumpy()["v"]
    duck.unregister("t")
    np.testing.assert_allclose(ours, ref, atol=1e-9)


@hsettings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(max_size=12), st.text(max_size=12)),
        min_size=1,
        max_size=20,
    )
)
def test_levenshtein_hypothesis(pairs):
    a = [x for x, _ in pairs]
    b = [y for _, y in pairs]
    con = duckdb.connect()
    ours = kernels.levenshtein(a, b)
    ref = _duck_fn(con, "levenshtein", a, b)
    np.testing.assert_array_equal(ours, ref)


def test_duck_kernel_batch_path():
    dk = DuckKernel()
    a = pa.array(["kitten", "martha", None])
    b = pa.array(["sitting", "marhta", "x"])
    lev = dk.levenshtein(a, b)
    assert lev.to_pylist() == [3, 2, None]
    jw = dk.jaro_winkler(a, b).to_pylist()
    assert abs(jw[1] - 0.9611111111111111) < 1e-12


def test_array_and_vector_kernels():
    assert list(kernels.array_intersect_size([["a", "b"], None], [["b", "c"], ["a"]])) == [1, 0]
    assert list(kernels.array_subset([["a"], ["a", "z"]], [["a", "b"], ["a", "b"]])) == [True, False]
    a = np.array([[1.0, 0.0], [1.0, 1.0]])
    b = np.array([[1.0, 0.0], [-1.0, -1.0]])
    np.testing.assert_allclose(kernels.cosine_similarity(a, b), [1.0, -1.0], atol=1e-12)
    km = kernels.haversine_km([51.5], [-0.12], [48.85], [2.35])
    assert 340 < km[0] < 350  # London→Paris ≈ 344 km
