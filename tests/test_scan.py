"""Distributed prefix-scan / sequence packing (stages/scan.py) and quota
capping (stages/sampling.top_n_per_group)."""

import numpy as np
import pyarrow as pa
import pytest


def test_prefix_sum_matches_numpy_any_partitioning(ray_session):
    import ray.data as rd

    from splink_ray.stages.scan import prefix_sum

    rng = np.random.default_rng(7)
    keys = rng.permutation(1000).astype(np.int64)  # arrive in shuffled order
    vals = rng.integers(0, 50, 1000).astype(np.int64)
    expected = {}
    order = np.argsort(keys)
    excl = np.concatenate([[0], np.cumsum(vals[order])[:-1]])
    for k, e in zip(keys[order], excl):
        expected[int(k)] = int(e)

    for nparts in (1, 5):
        ds = rd.from_arrow(pa.table({"k": keys, "v": vals})).repartition(nparts)
        out = prefix_sum(ds, "k", "v", out_col="ps", bucket_width=37).to_pandas()
        got = dict(zip(out.k, out.ps))
        assert got == expected, f"nparts={nparts}"


def test_pack_sequences_long_doc_spans_packs(ray_session):
    import ray.data as rd

    from splink_ray.stages.scan import pack_sequences

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["a b c", " ".join(["w"] * 25), "", "x y"],
            }
        )
    )
    out = (
        pack_sequences(ds, "text", "doc_id", seq_len=10, bucket_width=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out.n_tokens) == [3, 25, 0, 2]
    assert list(out.token_offset) == [0, 3, 28, 28]
    assert list(out.pack_id) == [0, 0, 2, 2]
    assert list(out.pack_offset) == [0, 3, 8, 8]
    # doc 2: tokens 3..27 -> packs 0,1,2 ; empty doc 3 spans its single pack
    assert list(out.n_packs) == [1, 3, 1, 1]


def test_top_n_per_group_deterministic_cut(ray_session):
    import ray.data as rd

    from splink_ray.stages.sampling import top_n_per_group

    t = pa.table(
        {
            "g": ["a"] * 5 + ["b"] * 2,
            "o": [3, 1, 2, 5, 4, 9, 8],
            "id": [10, 11, 12, 13, 14, 20, 21],
        }
    )
    for nparts in (1, 4):
        ds = rd.from_arrow(t).repartition(nparts)
        out = (
            top_n_per_group(ds, "g", 3, ["o", "id"])
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        # group a keeps the 3 smallest o (1,2,3) -> ids 11,12,10; b keeps both
        assert sorted(out.id) == [10, 11, 12, 20, 21]
