"""Regression tests for the Dataset.join → shuffle_join hardening.

Ray 2.49's hash-shuffle ``Dataset.join`` raises ``ArrowInvalid`` when an
entire join partition consists of schema-less empty blocks —
``groupby().map_groups()`` / ``aggregate()`` emit such blocks for empty
partitions, and the failure is parallelism-dependent (it killed the
``dedup_against_docs`` driver run at num_cpus=32 / CORRECTNESS_r04 while
passing at 8). These tests (a) pin the Ray behavior the hardening is built
around, and (b) force the empty-bucket condition (num_buckets ≫ distinct
keys) through every migrated call site.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_schema_less_empty_blocks_bypass_map_batches(ray_session):
    """The hazard premise: map_groups emits schema-less EMPTY blocks for
    empty partitions, and a downstream map_batches UDF never sees them —
    so a schema-fixing pass cannot repair them. If this starts failing on
    a Ray upgrade, the shuffle_join workaround can be revisited."""
    import ray
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"k": ["a", "b"], "v": [1, 2]})).repartition(8)
    seen = []

    def probe(t: pa.Table) -> pa.Table:
        seen.append((t.num_rows, tuple(t.column_names)))
        return t

    out = ds.groupby("k").map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    ).map_batches(probe, batch_format="pyarrow")
    empties = 0
    for ref in out.get_internal_block_refs():
        blk = ray.get(ref)
        ncols = len(blk.columns) if isinstance(blk, pd.DataFrame) else blk.num_columns
        if ncols == 0:
            empties += 1
    # schema-less empties exist in the output => they bypassed the UDF
    assert empties > 0
    assert all(cols == ("k", "v") for _, cols in seen if cols)


@pytest.mark.parametrize("how", ["inner", "left_outer"])
def test_shuffle_join_matches_pandas(ray_session, how):
    """Semantics vs pandas merge: duplicate keys (cross product), null keys
    (never match; survive a left_outer), clash suffix, and BOTH sides fed
    through a groupby (injecting schema-less empty blocks) at
    num_buckets=64 ≫ distinct keys (forcing empty buckets)."""
    import ray.data as rd

    from splink_ray.stages.joins import shuffle_join

    left = pd.DataFrame(
        {"k": ["a", "a", "b", "c", None], "x": [1, 2, 3, 4, 5]}
    )
    right = pd.DataFrame(
        {"kk": ["a", "a", "c", "d"], "x": [10.0, 11.0, 12.0, 13.0]}
    )
    lds = rd.from_pandas(left).repartition(4)
    # right side through map_groups => schema-less empty blocks upstream
    rds = (
        rd.from_pandas(right)
        .repartition(6)
        .groupby("kk")
        .map_groups(lambda t: t, batch_format="pyarrow")
    )
    out = shuffle_join(
        lds, rds, on="k", right_on="kk", how=how,
        left_schema=pa.schema([("k", pa.string()), ("x", pa.int64())]),
        right_schema=pa.schema([("kk", pa.string()), ("x", pa.float64())]),
        num_buckets=64,
    ).to_pandas()
    exp = left.merge(
        right.rename(columns={"kk": "k", "x": "x_r"}),
        on="k",
        how="inner" if how == "inner" else "left",
    )
    assert sorted(out.columns) == sorted(exp.columns)
    key = lambda df: df.fillna({"k": "~", "x_r": -1}).sort_values(
        ["k", "x", "x_r"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(out)[exp.columns], key(exp), check_dtype=False)


@pytest.mark.parametrize("how", ["inner", "left_outer"])
def test_shuffle_join_composite_key_matches_pandas(ray_session, how):
    """Multi-key path: co-locates on a combined hash of the key tuple but
    matches on the real columns, so rows equal on one key and different on
    the other must NOT join; null in ANY key column never matches."""
    import ray.data as rd

    from splink_ray.stages.joins import shuffle_join

    left = pd.DataFrame(
        {
            "k1": ["a", "a", "b", "b", None],
            "k2": [1, 2, 1, 2, 1],
            "x": [10, 20, 30, 40, 50],
        }
    )
    right = pd.DataFrame(
        {
            "r1": ["a", "a", "b", "c"],
            "r2": [1, 1, 2, 1],
            "y": [1.0, 2.0, 3.0, 4.0],
        }
    )
    lds = rd.from_pandas(left).repartition(4)
    rds = (
        rd.from_pandas(right)
        .repartition(5)
        .groupby("r1")
        .map_groups(lambda t: t, batch_format="pyarrow")
    )
    out = shuffle_join(
        lds, rds, on=["k1", "k2"], right_on=["r1", "r2"], how=how,
        left_schema=pa.schema(
            [("k1", pa.string()), ("k2", pa.int64()), ("x", pa.int64())]
        ),
        right_schema=pa.schema(
            [("r1", pa.string()), ("r2", pa.int64()), ("y", pa.float64())]
        ),
        num_buckets=64,
    ).to_pandas()
    exp = left.merge(
        right.rename(columns={"r1": "k1", "r2": "k2"}),
        on=["k1", "k2"],
        how="inner" if how == "inner" else "left",
    )
    assert sorted(out.columns) == sorted(exp.columns)
    key = lambda df: df.fillna({"k1": "~", "y": -1.0}).sort_values(
        ["k1", "k2", "x", "y"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(out)[exp.columns], key(exp), check_dtype=False)


def test_dedup_against_empty_bucket_condition(ray_session):
    """The exact condition that killed the r04 driver run: far more
    partitions than distinct hashes. The keyed-exchange anti-join must
    survive it and produce the right survivors."""
    import ray.data as rd

    from splink_ray.stages.dedup import dedup_against

    corpus = pa.table(
        {"doc_id": [1, 2, 3, 4, 5],
         "text": ["alpha", "beta", "gamma", "alpha", "delta"]}
    )
    ref = pa.table({"text": ["alpha", "gamma", "gamma"]})
    out = (
        dedup_against(
            rd.from_arrow(corpus).repartition(3),
            rd.from_arrow(ref).repartition(4),
            "text", "doc_id", num_partitions=64,
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out.doc_id.tolist() == [2, 5]
    assert list(out.columns) == ["doc_id", "text"]


def test_forced_join_paths_survive_high_bucket_counts(ray_session, monkeypatch):
    """Every migrated join site, with SPLINK_RAY_NUM_BUCKETS pinned far above
    the key count so keyed exchanges produce mostly-empty buckets."""
    import ray.data as rd

    from splink_ray.stages import corpus
    from splink_ray.stages.dedup import (
        ngram_jaccard_against,
        ngram_jaccard_lsh_verified,
        prefix_jaccard_pairs,
    )

    monkeypatch.setenv("SPLINK_RAY_NUM_BUCKETS", "48")
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy cat",
                "completely different content here entirely now",
                "the quick brown fox jumps over the lazy dog",
            ],
        }
    )
    ds = rd.from_arrow(docs).repartition(3)

    # unigram_logprob huge-vocab fallback (shuffle_join on the token)
    lp = corpus.unigram_logprob(ds, "text", "doc_id", broadcast_threshold=0)
    lp_bc = corpus.unigram_logprob(ds, "text", "doc_id")
    a = lp.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = lp_bc.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # top_distinctive_terms huge-vocab fallback
    tt = corpus.top_distinctive_terms(
        ds, "text", "doc_id", k=2, broadcast_threshold=0
    ).to_pandas()
    tt_bc = corpus.top_distinctive_terms(ds, "text", "doc_id", k=2).to_pandas()
    key = ["doc_id", "rank"]
    pd.testing.assert_frame_equal(
        tt.sort_values(key).reset_index(drop=True)[tt_bc.columns],
        tt_bc.sort_values(key).reset_index(drop=True),
    )

    # LSH-verified self near-dup join-back
    pairs = ngram_jaccard_lsh_verified(
        ds, "text", "doc_id", threshold=0.5, num_perm=32, bands=16
    ).to_pandas()
    assert {(1, 4)} <= set(zip(pairs.id_l, pairs.id_r))

    # exact-recall prefix-filter join-back
    ppairs = prefix_jaccard_pairs(ds, "text", "doc_id", threshold=0.5).to_pandas()
    assert (1, 4) in set(zip(ppairs.id_l, ppairs.id_r))

    # cross-corpus fuzzy decontamination join-back
    ref = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([10], pa.int64()),
             "text": ["the quick brown fox jumps over the lazy dog"]}
        )
    )
    cross = ngram_jaccard_against(
        ds, ref, "text", "doc_id", threshold=0.8, num_perm=32, bands=16
    ).to_pandas()
    assert {1, 4} <= set(cross.doc_id)


@pytest.mark.parametrize("how", ["left_semi", "left_anti"])
def test_shuffle_join_semi_anti(ray_session, how):
    """Semi/anti semantics: duplicate right keys emit each matching left
    row at most once (semi); null left keys never match (excluded from
    semi, KEPT by anti — SQL NOT EXISTS); right value columns never appear
    in the output; the right side passes through a groupby (schema-less
    empty blocks) with num_buckets ≫ keys (empty buckets)."""
    import ray.data as rd

    from splink_ray.stages.joins import shuffle_join

    left = pd.DataFrame(
        {"k": ["a", "a", "b", "c", None], "x": [1, 2, 3, 4, 5]}
    )
    right = pd.DataFrame({"kk": ["a", "a", "d"], "y": [10.0, 11.0, 12.0]})
    lds = rd.from_pandas(left).repartition(4)
    rds = (
        rd.from_pandas(right)
        .repartition(6)
        .groupby("kk")
        .map_groups(lambda t: t, batch_format="pyarrow")
    )
    out = shuffle_join(
        lds, rds, on="k", right_on="kk", how=how,
        left_schema=pa.schema([("k", pa.string()), ("x", pa.int64())]),
        right_schema=pa.schema([("kk", pa.string()), ("y", pa.float64())]),
        num_buckets=64,
    ).to_pandas()
    assert sorted(out.columns) == ["k", "x"]
    matched = left["k"].isin(set(right["kk"]))
    exp = left[matched] if how == "left_semi" else left[~matched]
    key = lambda df: df.fillna({"k": "~"}).sort_values(["k", "x"]).reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(
        key(out)[["k", "x"]], key(exp)[["k", "x"]], check_dtype=False
    )


def test_semi_anti_partition_union_is_left(ray_session):
    """semi(L, R) ∪ anti(L, R) == L row-for-row, at an empty-bucket-forcing
    bucket count — no row lost or duplicated by the exchange."""
    import ray.data as rd

    from splink_ray.stages.joins import shuffle_join

    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {"k": rng.integers(0, 50, 500), "x": np.arange(500)}
    )
    right = pd.DataFrame({"k": rng.integers(25, 75, 100)})
    ls = pa.schema([("k", pa.int64()), ("x", pa.int64())])
    rs = pa.schema([("k", pa.int64())])
    parts = []
    for how in ("left_semi", "left_anti"):
        parts.append(
            shuffle_join(
                rd.from_pandas(left).repartition(8),
                rd.from_pandas(right).repartition(8),
                on="k", how=how, left_schema=ls, right_schema=rs,
                num_buckets=256,
            ).to_pandas()
        )
    both = pd.concat(parts).sort_values("x").reset_index(drop=True)
    assert both["x"].tolist() == left["x"].tolist()


def test_interval_join_matches_pandas(ray_session):
    """interval_join vs a pandas cross-merge + range mask, all three
    ``closed`` modes, with boundary-exact timestamps included."""
    import ray.data as rd

    from splink_ray.stages.joins import interval_join

    ts = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "u": [1, 1, 1, 2, 2, 3],
            "ts": [
                ts,
                ts + pd.Timedelta(minutes=30),
                ts + pd.Timedelta(hours=1),  # exactly on an end boundary
                ts,
                ts + pd.Timedelta(hours=5),
                ts,
            ],
            "eid": [0, 1, 2, 3, 4, 5],
        }
    )
    right = pd.DataFrame(
        {
            "u": [1, 2, 4],
            "start": [ts, ts, ts],
            "end": [ts + pd.Timedelta(hours=1)] * 3,
            "aid": [100, 101, 102],
        }
    )
    ls = pa.schema(
        [("u", pa.int64()), ("ts", pa.timestamp("ns")), ("eid", pa.int64())]
    )
    rs = pa.schema(
        [
            ("u", pa.int64()),
            ("start", pa.timestamp("ns")),
            ("end", pa.timestamp("ns")),
            ("aid", pa.int64()),
        ]
    )
    exp_all = left.merge(right, on="u")
    for closed, lo_ok, hi_ok in [
        ("left", lambda m: m["ts"] >= m["start"], lambda m: m["ts"] < m["end"]),
        ("both", lambda m: m["ts"] >= m["start"], lambda m: m["ts"] <= m["end"]),
        (
            "neither",
            lambda m: m["ts"] > m["start"],
            lambda m: m["ts"] < m["end"],
        ),
    ]:
        out = interval_join(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(4),
            on="u", left_ts="ts", right_start="start", right_end="end",
            closed=closed, left_schema=ls, right_schema=rs, num_buckets=32,
        ).to_pandas()
        exp = exp_all[lo_ok(exp_all) & hi_ok(exp_all)]
        assert sorted(out["eid"].tolist()) == sorted(exp["eid"].tolist()), closed
        assert sorted(out.columns) == sorted(exp.columns)


def test_weighted_sample_partition_invariant_and_biased(ray_session):
    """weighted_sample: identical winners at any partitioning (1 vs 13
    blocks), exact n, and heavier rows measurably over-represented vs the
    population weight share."""
    import ray.data as rd

    from splink_ray.stages.sampling import weighted_sample

    n_rows = 2000
    df = pd.DataFrame(
        {
            "id": np.arange(n_rows),
            # 100 heavy rows (w=500) among 1900 light (w=5)
            "w": np.where(np.arange(n_rows) < 100, 500, 5),
        }
    )
    picks = []
    for parts in (1, 13):
        out = weighted_sample(
            rd.from_pandas(df).repartition(parts), "id", "w", n=200
        ).to_pandas()
        assert len(out) == 200
        picks.append(sorted(out["id"].tolist()))
    assert picks[0] == picks[1]
    heavy = sum(1 for i in picks[0] if i < 100)
    # heavy mass share = 100*500 / (100*500 + 1900*5) ≈ 0.84; uniform would
    # give 100/2000 = 5% of the sample. Loose gate well above uniform.
    assert heavy > 40


def test_weighted_sample_excludes_nonpositive_weights(ray_session):
    import ray.data as rd

    from splink_ray.stages.sampling import weighted_sample

    df = pd.DataFrame(
        {"id": [1, 2, 3, 4, 5], "w": [0, -3, None, 10, 1]}
    )
    out = weighted_sample(rd.from_pandas(df), "id", "w", n=5).to_pandas()
    assert sorted(out["id"].tolist()) == [4, 5]


def test_shuffle_join_full_outer_matches_duckdb(ray_session):
    """FULL OUTER semantics vs DuckDB: unmatched rows of BOTH sides
    survive, keys coalesce under the left name, null keys never match but
    are emitted unmatched, duplicate keys cross-product; both sides fed
    through a groupby (schema-less empty blocks) at num_buckets=64 ≫
    distinct keys."""
    import duckdb
    import ray.data as rd

    from splink_ray.stages.joins import shuffle_join

    left = pd.DataFrame(
        {"k": ["a", "a", "b", "c", None], "x": [1, 2, 3, 4, 5]}
    )
    right = pd.DataFrame(
        {"kk": ["a", "c", "d", "d", None], "y": [10.0, 12.0, 13.0, 14.0, 15.0]}
    )
    # null keys can't ride Ray's groupby (its sort rejects None), so the
    # schema-less-block hazard is injected on the right via a groupby over
    # the non-null rows unioned with the null-key remainder; empty buckets
    # come from num_buckets=64 ≫ 5 distinct keys either way
    lds = rd.from_pandas(left).repartition(4)
    rds = (
        rd.from_pandas(right.dropna(subset=["kk"]))
        .repartition(6)
        .groupby("kk")
        .map_groups(lambda t: t, batch_format="pyarrow")
        .union(rd.from_pandas(right[right["kk"].isna()]))
    )
    out = shuffle_join(
        lds, rds, on="k", right_on="kk", how="full_outer",
        left_schema=pa.schema([("k", pa.string()), ("x", pa.int64())]),
        right_schema=pa.schema([("kk", pa.string()), ("y", pa.float64())]),
        num_buckets=64,
    ).to_pandas()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.execute(
        "SELECT COALESCE(l.k, r.kk) AS k, l.x, r.y "
        "FROM l FULL OUTER JOIN r ON l.k = r.kk"
    ).df()
    key = lambda df: df.fillna({"k": "~", "x": -1, "y": -1.0}).sort_values(
        ["k", "x", "y"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        key(out)[exp.columns], key(exp), check_dtype=False
    )
    # both-side unmatched rows actually present
    assert out["x"].isna().any() and out["y"].isna().any()


def test_shuffle_join_full_outer_empty_sides(ray_session):
    """full_outer with an entirely empty side degrades to the other side
    with nulls (and keeps the declared schema when both are empty)."""
    import ray.data as rd

    from splink_ray.stages.joins import shuffle_join

    ls = pa.schema([("k", pa.int64()), ("x", pa.int64())])
    rs = pa.schema([("k", pa.int64()), ("y", pa.string())])
    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                    "x": pa.array([], pa.int64())}))
    right = rd.from_pandas(pd.DataFrame({"k": [7, 8], "y": ["a", "b"]}))
    out = shuffle_join(
        empty, right, on="k", how="full_outer",
        left_schema=ls, right_schema=rs, num_buckets=16,
    ).to_pandas()
    assert sorted(out.columns) == ["k", "x", "y"]
    assert sorted(out["k"]) == [7, 8] and out["x"].isna().all()
