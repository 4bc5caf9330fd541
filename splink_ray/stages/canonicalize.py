"""Canonicalize: transcript turns → one entity record per conv_id.

Payload-specific stage with no splink analogue (SURVEY.md §1.2 / §2.2 M6):
splink's unit of linkage is a flat record, so transcript rows
(conv_id, turn_idx, role, text, tool, ts) are aggregated into one linkage
record per conversation, with the **stable turn ordering invariant** — turns
sorted by turn_idx before any order-sensitive feature (per-turn text
equality ⇔ equality of the ordered turn list / its hash).

Ray shape: hash-exchange on conv_id (stages/exchange.keyed_map) → one
vectorized pass per bucket. Within the bucket everything except the
concat-hash and role-sequence strings is numpy ``reduceat`` / Arrow
offset-slicing over the sorted table — the ``turn_texts`` list column is a
zero-copy ``ListArray`` view over the sorted text array. Output schema =
FIXTURES.md F2.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .exchange import keyed_map

ENTITY_SCHEMA = pa.schema(
    [
        ("unique_id", pa.string()),
        ("n_turns", pa.int32()),
        ("first_user_text", pa.string()),
        ("first_assistant_text", pa.string()),
        ("turn_texts", pa.list_(pa.string())),
        ("text_concat_hash", pa.string()),
        ("role_seq", pa.string()),
        ("tool_set", pa.list_(pa.string())),
        ("ts_min", pa.timestamp("us")),
        ("ts_day", pa.string()),
    ]
)

_SEP = "\x1f"


def _first_by_mask(starts: np.ndarray, ends: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Index of the first True in each [start, end) group, or −1 (vectorized:
    min-reduceat over positions with non-matching rows pushed to +inf)."""
    n = len(mask)
    pos = np.where(mask, np.arange(n, dtype=np.int64), n)
    first = np.minimum.reduceat(pos, starts)
    # reduceat on a group extends to the next start; groups are contiguous
    first = np.where(first < ends, first, -1)
    return first


def canonicalize_bucket(tbl: pa.Table) -> pa.Table:
    """All turns of each conv_id in ``tbl`` → one row per conv_id.

    Pure function over an Arrow table (unit-testable without Ray); sorted by
    conv_id so output order is deterministic within a bucket.
    """
    if len(tbl) == 0:
        return ENTITY_SCHEMA.empty_table()
    t = tbl.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    conv_arr = t["conv_id"].combine_chunks()
    text_arr = pc.fill_null(t["text"].combine_chunks(), "")
    role_arr = t["role"].combine_chunks()
    ts = t["ts"].combine_chunks().cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)

    n = len(conv_arr)
    from .exchange import group_starts

    starts = group_starts(conv_arr)  # C-level adjacent-slice not_equal
    ends = np.append(starts[1:], n)
    n_groups = len(starts)

    uid = conv_arr.take(pa.array(starts))
    n_turns = (ends - starts).astype(np.int32)
    ts_min = np.minimum.reduceat(ts, starts)

    # first user / assistant text per group — vectorized index math
    is_user = pc.equal(role_arr, "user").to_numpy(zero_copy_only=False)
    is_asst = pc.equal(role_arr, "assistant").to_numpy(zero_copy_only=False)
    fu_idx = _first_by_mask(starts, ends, np.nan_to_num(is_user, nan=False).astype(bool))
    fa_idx = _first_by_mask(starts, ends, np.nan_to_num(is_asst, nan=False).astype(bool))

    def _take_or_null(idx: np.ndarray) -> pa.Array:
        taken = text_arr.take(pa.array(np.where(idx >= 0, idx, 0), pa.int64()))
        return pc.if_else(pa.array(idx >= 0), taken, pa.scalar(None, pa.string()))

    first_user = _take_or_null(fu_idx)
    first_asst = _take_or_null(fa_idx)

    # turn_texts: zero-copy list view over the sorted text array
    offsets = pa.array(np.append(starts, n).astype(np.int32))
    turn_texts = pa.ListArray.from_arrays(offsets, text_arr)

    # concat hash + role_seq: per-group python (hashing is inherently
    # per-value); operate on pre-fetched lists to avoid per-row Arrow calls.
    # md5 (not blake2b) so the hash is reproducible in a DuckDB oracle:
    # md5(string_agg(text, chr(31) ORDER BY turn_idx))
    texts = text_arr.to_pylist()
    roles = role_arr.to_pylist()
    thash = np.empty(n_groups, dtype=object)
    rseq = np.empty(n_groups, dtype=object)
    for g, (s, e) in enumerate(zip(starts, ends)):
        thash[g] = hashlib.md5(_SEP.join(texts[s:e]).encode()).hexdigest()
        rseq[g] = "".join((r or "?")[0] for r in roles[s:e])

    # tool_set: only visit groups that contain any tool
    tool_arr = pc.fill_null(t["tool"].combine_chunks(), "")
    has_tool = pc.not_equal(tool_arr, "").to_numpy(zero_copy_only=False)
    tsets: list = [[]] * n_groups
    if has_tool.any():
        group_has = np.add.reduceat(has_tool.astype(np.int64), starts) > 0
        tools = tool_arr.to_pylist()
        for g in np.flatnonzero(group_has):
            s, e = starts[g], ends[g]
            tsets[g] = sorted({x for x in tools[s:e] if x})

    ts_min64 = ts_min.astype("datetime64[us]")
    return pa.table(
        {
            "unique_id": uid,
            "n_turns": pa.array(n_turns, pa.int32()),
            "first_user_text": first_user,
            "first_assistant_text": first_asst,
            "turn_texts": turn_texts,
            "text_concat_hash": pa.array(thash, pa.string()),
            "role_seq": pa.array(rseq, pa.string()),
            "tool_set": pa.array(tsets, pa.list_(pa.string())),
            "ts_min": pa.array(ts_min64, pa.timestamp("us")),
            "ts_day": pa.array(
                np.datetime_as_string(ts_min64.astype("datetime64[D]")), pa.string()
            ),
        }
    )


def canonicalize(ds, num_buckets: int | None = None):
    """transcripts Dataset → entity-record Dataset (one row per conv_id)."""
    return keyed_map(ds, "conv_id", canonicalize_bucket, num_buckets=num_buckets)
