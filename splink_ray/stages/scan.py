"""Distributed prefix-scan and sequence packing.

No splink analogue — first-class extras per the task brief. A global
ordered cumulative sum is the primitive behind tokenizer sharding /
sequence packing ("concatenate the corpus in a canonical order and cut it
into fixed-length training sequences"): every document needs its global
token offset, which no per-batch transform can know alone.

Textbook two-phase scan, expressed Ray-Data-first:

1. **range-bucket partials** — each row is assigned a deterministic range
   bucket ``order_key // bucket_width`` (id-range partitioning; no sort, no
   sampling) and one streaming ``map_batches`` pass pre-aggregates the
   per-bucket value sums — only ``O(num_buckets)`` tiny rows leave the
   corpus scan;
2. **driver prefix over bucket partials** — ``O(num_buckets)`` work on the
   driver (the ONLY driver-side step; bounded by the bucket count, never by
   rows), broadcast back as a base-offset dict;
3. **per-bucket local scan** — one hash exchange on the bucket id
   co-locates each range; inside a bucket rows sort by the order key and a
   vectorized ``cumsum`` plus the bucket base yields the exact global
   exclusive prefix.

At a fixed ``bucket_width`` the plan is identical at any cluster size (the
scaling-bench property: only the schedule changes with parallelism).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SCAN_BUCKET_COL = "__scan_bucket"


def prefix_sum(
    ds,
    order_col: str,
    value_col: str,
    out_col: str = "prefix_sum",
    bucket_width: int = 100_000,
):
    """Adds ``out_col`` = exclusive cumulative sum of ``value_col`` in
    global ``order_col`` order (int keys; ties impossible — the order key
    must be unique, which record ids are).

    Oracle: ``sum(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND
    1 PRECEDING)`` with ``coalesce(..., 0)``."""
    from .exchange import broadcast, keyed_map

    def _bucket_of(t: pa.Table) -> pa.Table:
        k = t[order_col]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        b = pc.divide(k, bucket_width)  # int truncating divide; keys >= 0
        return t.append_column(SCAN_BUCKET_COL, pc.cast(b, pa.int64()))

    bucketed = ds.map_batches(_bucket_of, batch_format="pyarrow")

    # phase 1: per-bucket partial sums (tiny aggregate; only these shuffle)
    def _partials(t: pa.Table) -> pa.Table:
        g = (
            t.select([SCAN_BUCKET_COL, value_col])
            .group_by(SCAN_BUCKET_COL, use_threads=False)
            .aggregate([(value_col, "sum")])
        )
        return g.rename_columns([SCAN_BUCKET_COL, "s"])

    parts = bucketed.map_batches(_partials, batch_format="pyarrow").take_all()

    # phase 2: driver prefix over bucket partials — O(num_buckets), bounded
    sums: dict[int, int] = {}
    for r in parts:
        sums[r[SCAN_BUCKET_COL]] = sums.get(r[SCAN_BUCKET_COL], 0) + int(r["s"])
    bases: dict[int, int] = {}
    acc = 0
    for b in sorted(sums):
        bases[b] = acc
        acc += sums[b]
    base_ref = broadcast(bases)

    # phase 3: per-range local scan. A hash bucket can hold SEVERAL ranges
    # (range ids hash independently), so the cumsum is segmented per range:
    # sort by (range, key), per-run exclusive cumsum, plus the range's base.
    def _scan(t: pa.Table) -> pa.Table:
        from .blocking import _fetch_broadcast
        from .exchange import group_starts

        base_map = _fetch_broadcast(base_ref)
        idx = pc.sort_indices(
            t,
            sort_keys=[(SCAN_BUCKET_COL, "ascending"), (order_col, "ascending")],
        )
        t = t.take(idx)
        v = t[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vals = v.to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[SCAN_BUCKET_COL]
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        starts = group_starts(b)
        lens = np.diff(np.append(starts, len(t)))
        excl = np.concatenate([[0], np.cumsum(vals)[:-1]])
        excl -= np.repeat(excl[starts], lens)  # per-range exclusive cumsum
        run_buckets = b.take(pa.array(starts)).to_pylist()
        bases_per_run = np.fromiter(
            (base_map.get(rb, 0) for rb in run_buckets), np.int64, len(starts)
        )
        out = excl + np.repeat(bases_per_run, lens)
        t = t.append_column(out_col, pa.array(out, pa.int64()))
        return t.drop_columns([SCAN_BUCKET_COL])

    return keyed_map(bucketed, SCAN_BUCKET_COL, _scan)


def pack_sequences(
    ds,
    text_col: str,
    id_col: str,
    seq_len: int = 2048,
    bucket_width: int = 100_000,
):
    """Sequence packing for pretraining: concatenate documents in ``id_col``
    order and cut the token stream into fixed ``seq_len`` windows. Per doc:
    ``n_tokens`` (whitespace tokens), global ``token_offset`` (exclusive
    prefix sum), ``pack_id`` = offset // seq_len, ``pack_offset`` = offset %
    seq_len, and ``n_packs`` the window span (long docs cross packs).

    The only non-streaming step is the O(num_buckets) driver prefix of
    :func:`prefix_sum`."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")

    def _count(t: pa.Table) -> pa.Table:
        from .corpus import _token_lists

        _, ntok = _token_lists(t[text_col])
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({id_col: ids, "n_tokens": pa.array(ntok, pa.int64())})

    # narrow (id, n_tokens) projection — materialized so the two consumers
    # of the scan (partials pass + local scan) don't re-tokenize the corpus;
    # 16 B/row, not the text
    counted = ds.map_batches(_count, batch_format="pyarrow").materialize()
    scanned = prefix_sum(
        counted, id_col, "n_tokens", out_col="token_offset", bucket_width=bucket_width
    )

    def _place(t: pa.Table) -> pa.Table:
        off = t["token_offset"].combine_chunks() if isinstance(
            t["token_offset"], pa.ChunkedArray
        ) else t["token_offset"]
        ntok = t["n_tokens"].combine_chunks() if isinstance(
            t["n_tokens"], pa.ChunkedArray
        ) else t["n_tokens"]
        o = off.to_numpy(zero_copy_only=False).astype(np.int64)
        nt = ntok.to_numpy(zero_copy_only=False).astype(np.int64)
        pack = o // seq_len
        last = (o + np.maximum(nt, 1) - 1) // seq_len  # empty docs span 1
        t = t.append_column("pack_id", pa.array(pack, pa.int64()))
        t = t.append_column("pack_offset", pa.array(o % seq_len, pa.int64()))
        return t.append_column("n_packs", pa.array(last - pack + 1, pa.int64()))

    return scanned.map_batches(_place, batch_format="pyarrow")
