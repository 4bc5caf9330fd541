"""Regression tests for the round-1 ADVICE findings:

1. ColumnsReversedLevel symmetrical semantics (one-directional default)
2. TF denominator excludes nulls + single-pass compute_tf_maps
3. EM seeds unset m/u instead of silently producing NaN
4. Local clustering keeps the uid column's native type (numeric min rep)
   and auto mode never materializes more than the edge limit driver-side
5. Checkpoint stage keys include input fingerprint + thresholds
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import splink_ray.comparison_level_library as cll
from splink_ray.settings import Comparison, Settings


@pytest.fixture(params=[True, False], ids=["duckdb", "numpy"])
def ctx(request):
    return cll.EvalContext(use_duckdb=request.param)


# ---------------------------------------------------------------------------
# 1. ColumnsReversedLevel
# ---------------------------------------------------------------------------


def test_columns_reversed_one_directional_default(ctx):
    lv_default = cll.ColumnsReversedLevel("fn", "sn")
    lv_sym = cll.ColumnsReversedLevel("fn", "sn", symmetrical=True)
    # fn_l == sn_r holds, sn_l == fn_r does NOT
    pairs = pa.table(
        {
            "fn_l": ["ann"], "sn_l": ["x"],
            "fn_r": ["q"], "sn_r": ["ann"],
        }
    )
    assert list(lv_default.evaluate(pairs, ctx)) == [True]
    assert list(lv_sym.evaluate(pairs, ctx)) == [False]
    # both ways → both levels true
    both = pa.table(
        {"fn_l": ["ann"], "sn_l": ["lee"], "fn_r": ["lee"], "sn_r": ["ann"]}
    )
    assert list(lv_default.evaluate(both, ctx)) == [True]
    assert list(lv_sym.evaluate(both, ctx)) == [True]


def test_columns_reversed_sql_matches_evaluate():
    import duckdb

    lv_default = cll.ColumnsReversedLevel("fn", "sn")
    lv_sym = cll.ColumnsReversedLevel("fn", "sn", symmetrical=True)
    df = pd.DataFrame(
        {
            "fn_l": ["a", "a", "b"],
            "sn_l": ["x", "b", "a"],
            "fn_r": ["y", "b", "z"],
            "sn_r": ["a", "a", "q"],
        }
    )
    con = duckdb.connect()
    con.register("p", df)
    ctx = cll.EvalContext(use_duckdb=False)
    for lv in (lv_default, lv_sym):
        got = list(lv.evaluate(pa.Table.from_pandas(df), ctx))
        sql = con.execute(f"SELECT {lv.sql()} FROM p").fetchall()
        want = [bool(r[0]) if r[0] is not None else False for r in sql]
        assert got == want


# ---------------------------------------------------------------------------
# 2. TF maps: non-null denominator, one pass for all string columns
# ---------------------------------------------------------------------------


class _CountingDS:
    """Delegating proxy that counts map_batches invocations."""

    def __init__(self, ds):
        self._ds = ds
        self.map_batches_calls = 0

    def map_batches(self, *a, **k):
        self.map_batches_calls += 1
        return self._ds.map_batches(*a, **k)

    def __getattr__(self, name):
        return getattr(self._ds, name)


def test_tf_denominator_excludes_nulls(ray_session):
    import ray.data as rd

    from splink_ray.stages.tf import compute_tf_maps

    t = pa.table(
        {
            "city": ["a", "a", "b", None, None],
            "state": ["x", None, "y", "y", "y"],
        }
    )
    ds = rd.from_arrow(t)
    maps = compute_tf_maps(ds, ["city", "state"])
    # city: 3 non-null → a=2/3, b=1/3 (NOT /5)
    assert maps["city"]["a"] == pytest.approx(2 / 3)
    assert maps["city"]["b"] == pytest.approx(1 / 3)
    # state: 4 non-null → x=1/4, y=3/4
    assert maps["state"]["x"] == pytest.approx(1 / 4)
    assert maps["state"]["y"] == pytest.approx(3 / 4)


def test_tf_maps_single_pass(ray_session):
    import ray.data as rd

    from splink_ray.stages.tf import compute_tf_maps

    t = pa.table(
        {
            "a": ["p", "q", "p"],
            "b": ["r", "r", "s"],
            "c": ["t", "u", "v"],
        }
    )
    proxy = _CountingDS(rd.from_arrow(t))
    maps = compute_tf_maps(proxy, ["a", "b", "c"])
    assert proxy.map_batches_calls == 1  # one execution for N tf columns
    assert maps["a"]["p"] == pytest.approx(2 / 3)
    assert maps["c"]["t"] == pytest.approx(1 / 3)


# ---------------------------------------------------------------------------
# 3. EM seeding
# ---------------------------------------------------------------------------


def test_em_seeds_missing_m_u():
    from splink_ray.pipelines.training import em_on_patterns

    comp = Comparison(
        "name",
        [
            cll.NullLevel("name"),
            cll.ExactMatchLevel("name"),  # m/u unset
            cll.ElseLevel(),
        ],
    )
    # 2-level agreement patterns: mostly disagreeing pairs, some agreeing
    patterns = pd.DataFrame({"gamma_name": [1, 0, -1], "n": [50, 1000, 10]})
    out = em_on_patterns(patterns, [comp], lam_init=0.05)
    assert np.isfinite(out["lambda"]) and 0 < out["lambda"] < 1
    for lv in comp.non_null_levels():
        assert lv.m_probability is not None and np.isfinite(lv.m_probability)
        assert lv.u_probability is not None and np.isfinite(lv.u_probability)
    # EM learned that gamma=1 is more likely under match than non-match
    exact = comp.level_for_value(1)
    assert exact.m_probability > exact.u_probability


# ---------------------------------------------------------------------------
# 4. Clustering: native uid types + bounded auto probe
# ---------------------------------------------------------------------------


def test_cluster_native_int_ids(ray_session):
    import ray.data as rd

    from splink_ray.pipelines.clustering import (
        cluster_pairwise_predictions_at_threshold,
    )

    records = rd.from_arrow(pa.table({"unique_id": pa.array([9, 10, 11, 3], pa.int64())}))
    preds = rd.from_arrow(
        pa.table(
            {
                "unique_id_l": pa.array([9], pa.int64()),
                "unique_id_r": pa.array([10], pa.int64()),
                "match_probability": pa.array([1.0]),
            }
        )
    )
    clustered, info = cluster_pairwise_predictions_at_threshold(records, preds, 0.5)
    df = clustered.to_pandas().set_index("unique_id")
    assert df["cluster_id"].dtype == np.int64  # native type preserved
    # numeric min: min(9, 10) = 9 (string ordering would give '10')
    assert df.loc[9, "cluster_id"] == 9
    assert df.loc[10, "cluster_id"] == 9
    assert df.loc[11, "cluster_id"] == 11


def test_cluster_auto_switches_to_distributed_over_limit(ray_session):
    import ray.data as rd

    from splink_ray.pipelines.clustering import (
        cluster_pairwise_predictions_at_threshold,
    )

    records = rd.from_arrow(pa.table({"unique_id": pa.array(list(range(10)), pa.int64())}))
    edges = pa.table(
        {
            "unique_id_l": pa.array([0, 1, 2, 3], pa.int64()),
            "unique_id_r": pa.array([1, 2, 3, 4], pa.int64()),
            "match_probability": pa.array([1.0] * 4),
        }
    )
    preds = rd.from_arrow(edges)
    clustered, info = cluster_pairwise_predictions_at_threshold(
        records, preds, 0.5, local_edge_limit=2
    )
    assert info["method"] == "distributed"  # probe saw > limit edges
    df = clustered.to_pandas().set_index("unique_id")
    for node in range(5):
        assert df.loc[node, "cluster_id"] == 0
    assert df.loc[7, "cluster_id"] == 7


# ---------------------------------------------------------------------------
# 5. Checkpoint keys
# ---------------------------------------------------------------------------


def test_config_hash_covers_scale_knobs():
    s1 = Settings()
    s2 = Settings(max_pairs_per_block=1000)
    s3 = Settings(source_dataset_column_name="src")
    assert s1.config_hash() != s2.config_hash()
    assert s1.config_hash() != s3.config_hash()


def test_checkpoint_invalidates_on_input_and_threshold(ray_session, tmp_path):
    import ray.data as rd

    from splink_ray.datasets import generate_transcripts
    from splink_ray.pipelines.flagship import transcript_settings
    from splink_ray.stages.canonicalize import canonicalize_bucket
    from splink_ray.state.checkpoint import predict_with_checkpoints

    def recs(seed):
        tables = generate_transcripts(n_entities=30, seed=seed)
        return rd.from_arrow(canonicalize_bucket(tables["transcripts"])).materialize()

    s = transcript_settings()
    run_dir = str(tmp_path / "run")
    a = recs(1)
    out1, info1 = predict_with_checkpoints(a, s, run_dir, threshold_match_probability=0.5)
    n1 = out1.count()
    assert info1["skipped"] == []

    # same input, same threshold → all skipped
    _, info2 = predict_with_checkpoints(a, s, run_dir, threshold_match_probability=0.5)
    assert set(info2["skipped"]) == {"records", "scored"}

    # different threshold → scored recomputed (was silently reused before)
    out3, info3 = predict_with_checkpoints(a, s, run_dir, threshold_match_probability=0.99)
    assert "scored" not in info3["skipped"]

    # different input data → records + scored recomputed
    b = recs(2)
    _, info4 = predict_with_checkpoints(b, s, run_dir, threshold_match_probability=0.99)
    assert "records" not in info4["skipped"]
    assert "scored" not in info4["skipped"]


# ---------------------------------------------------------------------------
# Settings validation (SURVEY §1.1; round-1 verdict "what's missing" #1)
# ---------------------------------------------------------------------------


def test_typod_column_raises_before_execution(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from splink_ray.blocking_rule_library import block_on
    from splink_ray.pipelines.predict import predict
    from splink_ray.validation import SettingsColumnError

    records = rd.from_arrow(
        pa.table({"unique_id": ["a", "b"], "city": ["x", "x"], "name": ["n", "n"]})
    )
    s = Settings(
        blocking_rules_to_generate_predictions=[block_on("city")],
        comparisons=[
            Comparison(
                "name",
                [
                    cll.NullLevel("nmae"),  # typo
                    cll.ExactMatchLevel("nmae", m_probability=0.9, u_probability=0.01),
                    cll.ElseLevel(m_probability=0.1, u_probability=0.99),
                ],
            )
        ],
    )
    with pytest.raises(SettingsColumnError, match="nmae"):
        predict(records, s, materialize_records=False)

    s2 = Settings(blocking_rules_to_generate_predictions=[block_on("ctiy")])
    with pytest.raises(SettingsColumnError, match="ctiy"):
        predict(records, s2, materialize_records=False)


def test_tf_columns_materialized_and_concat_with_tf(ray_session):
    """SURVEY §2.7 parity: tf_<col>_l/r pair columns under
    retain_intermediate_calculation_columns, and the concat_with_tf records
    surface."""
    import pyarrow as pa
    import ray.data as rd

    from splink_ray import Linker
    from splink_ray.blocking_rule_library import block_on

    records = pa.table(
        {
            "unique_id": ["a", "b", "c", "d"],
            "city": ["x", "x", "x", "y"],
        }
    )
    comp = Comparison(
        "city",
        [
            cll.NullLevel("city"),
            cll.ExactMatchLevel(
                "city", m_probability=0.9, u_probability=0.1,
                tf_adjustment_column="city",
            ),
            cll.ElseLevel(m_probability=0.1, u_probability=0.9),
        ],
    )
    s = Settings(
        blocking_rules_to_generate_predictions=[block_on("city")],
        comparisons=[comp],
        retain_intermediate_calculation_columns=True,
    )
    linker = Linker(rd.from_arrow(records), s)
    preds = linker.inference.predict().to_pandas()
    assert {"tf_city_l", "tf_city_r", "bf_city", "bf_tf_adj_city"} <= set(preds.columns)
    # city 'x' appears 3/4 → tf = 0.75 on both sides of every x-block pair
    assert np.allclose(preds["tf_city_l"], 0.75)

    cwt = linker.table_management.concat_with_tf().to_pandas().set_index("unique_id")
    assert cwt.loc["a", "tf_city"] == pytest.approx(0.75)
    assert cwt.loc["d", "tf_city"] == pytest.approx(0.25)
    tf_tbl = linker.table_management.compute_tf_table("city")
    assert set(tf_tbl.columns) == {"city", "tf_city"}


def test_tf_high_cardinality_join_path_matches_broadcast(ray_session):
    """SURVEY §2.7 T2 second mapping: a TF column whose cardinality exceeds
    ``settings.tf_broadcast_limit`` must route through the distributed
    tf-join (no driver dict) and produce IDENTICAL scores to the broadcast
    path (round-2 verdict missing-item #1)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import splink_ray.comparison_level_library as cll
    from splink_ray import Settings, block_on
    from splink_ray.pipelines.predict import predict
    from splink_ray.settings import Comparison

    rng = np.random.default_rng(7)
    n = 400
    city = [f"city_{int(x)}" for x in rng.integers(0, 120, n)]  # high cardinality
    blk = [f"b{int(x)}" for x in rng.integers(0, 12, n)]
    tbl = pa.table(
        {
            "unique_id": pa.array(np.arange(n), pa.int64()),
            "city": pa.array(city),
            "blk": pa.array(blk),
        }
    )

    def _settings(limit: int) -> Settings:
        cmp_city = Comparison(
            "city",
            [
                cll.NullLevel("city"),
                cll.ExactMatchLevel(
                    "city", m_probability=0.8, u_probability=0.01,
                    tf_adjustment_column="city", tf_adjustment_weight=1.0,
                ),
                cll.ElseLevel(m_probability=0.2, u_probability=0.99),
            ],
        )
        s = Settings(
            blocking_rules_to_generate_predictions=[block_on("blk")],
            comparisons=[cmp_city],
            retain_matching_columns=False,
        )
        s.tf_broadcast_limit = limit
        return s

    def _run(limit: int):
        ds = rd.from_arrow(tbl)
        scored, _ = predict(ds, _settings(limit))
        df = scored.to_pandas().sort_values(["unique_id_l", "unique_id_r"])
        return df.reset_index(drop=True)

    a = _run(1_000_000)  # broadcast-dict path
    b = _run(10)         # forced join path (120 distinct > 10)
    assert len(a) == len(b) > 0
    np.testing.assert_allclose(
        a["match_weight"].to_numpy(), b["match_weight"].to_numpy(), rtol=1e-12
    )
    np.testing.assert_array_equal(
        a["gamma_city"].to_numpy(), b["gamma_city"].to_numpy()
    )


def test_prefix_jaccard_against_matches_bruteforce(ray_session):
    """ADVICE r4: the prefix-filter candidate scheme must have EXACT recall —
    compare against the O(n*m) brute-force token Jaccard on random docs with
    many borderline pairs (the regime where LSH recall degrades)."""
    import itertools

    import ray.data as rd

    from splink_ray.stages.dedup import prefix_jaccard_against

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]

    def mkdoc():
        n = rng.integers(4, 12)
        return " ".join(sorted(rng.choice(vocab, size=n, replace=False)))

    corpus = [(i, mkdoc()) for i in range(80)]
    # reference: perturbed copies (near-dups at every jaccard level) + fresh
    ref = []
    for j in range(60):
        base = corpus[j][1].split()
        drop = rng.integers(0, max(len(base) - 2, 1))
        ref.append((1000 + j, " ".join(base[drop:])))
    for j in range(20):
        ref.append((2000 + j, mkdoc()))

    def tok(s):
        return set(s.split())

    t = 0.6
    expected = set()
    for (ci, ct), (ri, rt) in itertools.product(corpus, ref):
        a, b = tok(ct), tok(rt)
        if not a and not b:
            continue
        j = len(a & b) / len(a | b)
        if j >= t:
            expected.add((ci, ri))

    cds = rd.from_arrow(
        pa.table({"doc_id": [c[0] for c in corpus],
                  "text": [c[1] for c in corpus]})
    ).repartition(4)
    rds = rd.from_arrow(
        pa.table({"doc_id": [r[0] for r in ref],
                  "text": [r[1] for r in ref]})
    ).repartition(3)
    out = prefix_jaccard_against(
        cds, rds, "text", "doc_id", threshold=t
    ).to_pandas()
    got = set(zip(out["doc_id"], out["ref_id"]))
    assert got == expected and len(expected) > 30


def test_bm25_string_id_tie_break(ray_session):
    """ADVICE r3: with string ids and tied scores at the k boundary, the
    per-batch prune must keep the rows the global (score DESC, id ASC) sort
    would keep."""
    import ray.data as rd

    from splink_ray.stages.search import bm25_search

    # 6 identical docs -> identical scores; ids chosen so lexical order
    # disagrees with insertion order inside the batch
    ids = ["z9", "a1", "m5", "b2", "y8", "c3"]
    docs = pa.table({"doc_id": ids, "text": ["hash spark window"] * 6})
    out = bm25_search(
        rd.from_arrow(docs).repartition(1),
        "text", "doc_id", ["hash", "spark", "window"], k=3,
    ).to_pandas()
    assert list(out["doc_id"]) == ["a1", "b2", "c3"]


def test_pagerank_rejects_unsymmetrized_edges(ray_session):
    """ADVICE r3: a dst never appearing as src must raise, not silently
    attribute rank mass to the wrong node — both local and distributed."""
    import ray.data as rd

    from splink_ray.pipelines.clustering import pagerank

    edges = pa.table({"src": [1, 2], "dst": [2, 99]})  # 99 never a src
    with pytest.raises(ValueError, match="symmetrize"):
        pagerank(rd.from_arrow(edges)).to_pandas()
    with pytest.raises(ValueError, match="symmetrize"):
        pagerank(rd.from_arrow(edges), local_edge_limit=0).to_pandas()


def test_pagerank_symmetrized_still_works(ray_session):
    import ray.data as rd

    from splink_ray.pipelines.clustering import pagerank

    edges = pa.table({"src": [1, 2, 2, 3], "dst": [2, 1, 3, 2]})
    out = pagerank(rd.from_arrow(edges)).to_pandas()
    assert len(out) == 3 and abs(out["rank"].sum() - 1.0) < 1e-4


def test_truth_space_tied_rounded_weights_match_sql_range_peers():
    """r3 verdict #8: two pairs with DISTINCT exact weights that round to
    the same 6-decimal threshold must collapse to one row carrying the
    group-end counts — exactly DuckDB's sum() OVER (ORDER BY w DESC)
    default RANGE frame + rounded-threshold GROUP BY max()."""
    import duckdb

    from splink_ray.model import truth_space_from_scores

    # w1 != w2 but round(w,6) equal; labels differ so the collapse visibly
    # merges their counts; plus exact ties and a distinct third threshold
    df = pd.DataFrame(
        {
            "match_weight": [2.0, 0.1234561, 0.1234564, 0.1234564, -1.5],
            "match_probability": [0.9, 0.52, 0.52, 0.52, 0.2],
            "clerical_match_score": [1.0, 1.0, 0.0, 1.0, 0.0],
        }
    )
    got = truth_space_from_scores(df, collapse_rounded=6).sort_values(
        "truth_threshold"
    ).reset_index(drop=True)

    con = duckdb.connect()
    con.register("g", df.rename(columns={"match_weight": "w"}))
    exp = con.execute(
        "WITH lab AS (SELECT w, CASE WHEN clerical_match_score >= 0.5 "
        "THEN 1 ELSE 0 END AS y FROM g), "
        "tot AS (SELECT sum(y) AS p_total, count(*) - sum(y) AS n_total FROM lab), "
        "cum AS (SELECT round(w, 6) AS t, "
        "sum(y) OVER (ORDER BY w DESC) AS tp, "
        "sum(1 - y) OVER (ORDER BY w DESC) AS fp FROM lab), "
        "coll AS (SELECT t, CAST(max(tp) AS BIGINT) AS tp, "
        "CAST(max(fp) AS BIGINT) AS fp FROM cum GROUP BY t) "
        "SELECT t AS truth_threshold, tp, fp, "
        "CAST((SELECT p_total FROM tot) - tp AS BIGINT) AS fn, "
        "CAST((SELECT n_total FROM tot) - fp AS BIGINT) AS tn, "
        "round(CASE WHEN tp + fp > 0 THEN tp::DOUBLE / (tp + fp) ELSE 0 END, 6) "
        "AS \"precision\", "
        "round(CASE WHEN (SELECT p_total FROM tot) > 0 "
        "THEN tp::DOUBLE / (SELECT p_total FROM tot) ELSE 0 END, 6) AS recall "
        "FROM coll ORDER BY t"
    ).df().reset_index(drop=True)

    # the two 0.123456x weights collapsed into ONE row
    assert len(got) == 3 and len(exp) == 3
    for c in ("truth_threshold", "tp", "fp", "fn", "tn", "precision", "recall"):
        assert got[c].dtype == exp[c].dtype, c
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    # group-end semantics: the collapsed row carries counts through the
    # LAST tied pair (tp=3 of 3 positives seen, fp=1), not the first
    mid = got[got["truth_threshold"].between(0.12, 0.13)].iloc[0]
    assert (mid["tp"], mid["fp"]) == (3, 1)


def test_prefix_jaccard_pairs_matches_bruteforce(ray_session):
    """Self-join prefix filter: exact recall vs the O(n^2) token Jaccard."""
    import itertools

    import ray.data as rd

    from splink_ray.stages.dedup import prefix_jaccard_pairs

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(70):
        n = rng.integers(3, 10)
        docs.append((i, " ".join(sorted(rng.choice(vocab, size=n, replace=False)))))
    # inject exact and near duplicates
    for i in range(70, 90):
        base = docs[i - 70][1].split()
        docs.append((i, " ".join(base[: max(len(base) - 1, 1)])))

    t = 0.55
    expected = {}
    for (ai, at), (bi, bt) in itertools.combinations(docs, 2):
        a, b = set(at.split()), set(bt.split())
        j = len(a & b) / len(a | b)
        if j >= t:
            expected[(ai, bi)] = j

    out = prefix_jaccard_pairs(
        rd.from_arrow(
            pa.table({"doc_id": [d[0] for d in docs],
                      "text": [d[1] for d in docs]})
        ).repartition(5),
        "text", "doc_id", threshold=t,
    ).to_pandas()
    got = dict(zip(zip(out["id_l"], out["id_r"]), out["jaccard"]))
    assert set(got) == set(expected) and len(expected) >= 20
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-6, k


# ---------------------------------------------------------------------------
# ADVICE r4: dictionary-path guards + secure native-kernel cache
# ---------------------------------------------------------------------------


def test_exact_match_duplicate_dictionary_entries_decode():
    """A caller-supplied DictionaryArray whose dictionary holds DUPLICATE
    values (legal Arrow) must not take the index-equality fast path: rows
    encoded with different indices of the same value are still equal."""
    dic = pa.array(["x", "x", "y"])  # "x" appears twice
    l = pa.DictionaryArray.from_arrays(pa.array([0, 2], pa.int32()), dic)
    r = pa.DictionaryArray.from_arrays(pa.array([1, 2], pa.int32()), dic)
    pairs = pa.table({"col_l": l, "col_r": r})
    lv = cll.ExactMatchLevel("col")
    got = lv.evaluate(pairs, cll.EvalContext(use_duckdb=False))
    # values are [x,y] vs [x,y]: both rows equal (index path would say F,T)
    assert got.tolist() == [True, True]
    # and the unique-dictionary fast path still engages for encoded columns
    enc = pa.table(
        {"v": pa.array(["a", "b", "a", "c"])}
    )["v"].combine_chunks().dictionary_encode()
    assert cll._dict_index_safe(enc.dictionary)
    assert not cll._dict_index_safe(dic)


def test_user_callables_receive_plain_arrays():
    """DistanceFunctionLevel.distance_function and CustomLevel.predicate are
    the user-extension seam: they must see decoded columns even when the
    fused pairgen path dictionary-encodes pair columns."""
    seen_types = []

    def dist(l, r):
        seen_types.append((l.type, r.type))
        return np.ones(len(l))

    def pred(t: pa.Table):
        assert not any(pa.types.is_dictionary(f.type) for f in t.schema)
        return np.ones(len(t), bool)

    enc = pa.chunked_array([pa.array(["a", "b"])]).combine_chunks().dictionary_encode()
    pairs = pa.table({"col_l": enc, "col_r": enc})
    ctx0 = cll.EvalContext(use_duckdb=False)

    lv = cll.DistanceFunctionLevel("col", distance_function=dist, distance_threshold=0.5)
    assert lv.evaluate(pairs, ctx0).all()
    assert all(not pa.types.is_dictionary(t) for pair in seen_types for t in pair)

    cl = cll.CustomLevel(predicate=pred, used_columns=("col",))
    assert cl.evaluate(pairs, ctx0).all()


def test_native_kernel_cache_dir_is_private():
    """The compiled-kernel cache must live in a user-owned, non-group/other
    writable directory (never a predictable world-writable /tmp name)."""
    import os

    from splink_ray import native

    d = native._cache_dir()
    if d is None:
        pytest.skip("no securable cache dir on this host")
    st = os.stat(d)
    assert st.st_uid == os.getuid()
    assert not (st.st_mode & 0o022)
