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


import numpy as np

from ..kernels import round_half_away
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

    # concat hash + role_seq, fully vectorized: one C++ binary_join over
    # the zero-copy list view, then DuckDB's md5() (hexdigest-identical to
    # hashlib.md5 and to the oracle's md5(string_agg(text, chr(31) ORDER BY
    # turn_idx)) by construction). Replaced a per-group Python join+hash
    # loop over to_pylist()-boxed strings — the canonicalize profile was
    # dominated by the boxing, not the hashing.
    from ..duckdb_kernels import get_kernel

    joined = pc.binary_join(turn_texts, _SEP)
    thash = get_kernel().md5_hex(joined)
    # role_seq: first codepoint per role ("?" for null/empty), joined per
    # group through the same list-offset view
    r1 = pc.utf8_slice_codeunits(pc.fill_null(role_arr, "?"), 0, 1)
    r1 = pc.if_else(pc.equal(r1, ""), pa.scalar("?", pa.string()), r1)
    rseq = pc.binary_join(pa.ListArray.from_arrays(offsets, r1), "")

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
            "text_concat_hash": thash,
            "role_seq": rseq,
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


def conversation_stats(ds, num_buckets: int | None = None):
    """Per-conversation turn statistics over the transcript shape
    (conv_id, turn_idx, role, text, ...): n_turns, n_user_turns,
    total_chars, avg_turn_chars (round 6), per conversation.

    Pure partial aggregation — per-batch (conv, partials) rows are the only
    thing that shuffles (counts/sums are associative, so no co-location is
    needed); one small ``groupby.sum`` finishes. Returns a Dataset.
    """
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        is_user = pc.cast(pc.equal(t["role"], "user"), pa.int64())
        nchars = pc.utf8_length(pc.fill_null(t["text"], "")).cast(pa.int64())
        g = (
            pa.table(
                {
                    "conv_id": t["conv_id"],
                    "__u": is_user,
                    "__c": nchars,
                }
            )
            .group_by("conv_id", use_threads=False)
            .aggregate([([], "count_all"), ("__u", "sum"), ("__c", "sum")])
        )
        return g.rename_columns(["conv_id", "n_turns", "n_user_turns", "total_chars"])

    merged = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(
            Sum("n_turns", alias_name="n_turns"),
            Sum("n_user_turns", alias_name="n_user_turns"),
            Sum("total_chars", alias_name="total_chars"),
        )
    )

    def _finish(t: pa.Table) -> pa.Table:
        if "n_turns" not in t.column_names:  # schema-less empty agg partition
            return pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "n_turns": pa.array([], pa.int64()),
                    "n_user_turns": pa.array([], pa.int64()),
                    "total_chars": pa.array([], pa.int64()),
                    "avg_turn_chars": pa.array([], pa.float64()),
                }
            )
        n = t["n_turns"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = t["total_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "n_turns": t["n_turns"].cast(pa.int64()),
                "n_user_turns": t["n_user_turns"].cast(pa.int64()),
                "total_chars": t["total_chars"].cast(pa.int64()),
                "avg_turn_chars": pa.array(round_half_away(c / n, 6), pa.float64()),
            }
        )

    return merged.map_batches(_finish, batch_format="pyarrow")


def turn_repetition(ds, num_buckets: int | None = None):
    """Consecutive-turn token-set Jaccard per conversation — the transcript
    self-repetition quality signal (assistants looping / users re-pasting).

    One exchange on conv_id (adjacent turns must co-locate); inside a bucket
    turns sort by (conv, turn_idx) and every consecutive pair goes through
    the vectorized token-id set-intersection kernel (no per-pair Python set
    ops). Returns a Dataset (conv_id, n_pairs, mean_jaccard round 6);
    single-turn conversations report n_pairs = 0, mean_jaccard = 0.0.
    """
    from .dedup import _jaccard_tokens_fast
    from .exchange import keyed_map

    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "n_pairs": pa.array([], pa.int64()),
            "mean_jaccard": pa.array([], pa.float64()),
        }
    )

    def _bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        conv = t["conv_id"].combine_chunks()
        cv = conv.to_numpy(zero_copy_only=False)
        n = len(t)
        change = np.empty(n, bool)
        change[0] = True
        change[1:] = cv[1:] != cv[:-1]
        cont = np.flatnonzero(~change)  # rows pairing with their predecessor
        texts = t["text"].combine_chunks()
        if len(cont):
            jac = _jaccard_tokens_fast(
                texts.take(pa.array(cont - 1)), texts.take(pa.array(cont))
            )
        else:
            jac = np.empty(0, np.float64)
        codes = np.cumsum(change) - 1
        n_convs = int(codes[-1]) + 1
        n_pairs = np.bincount(codes[cont], minlength=n_convs)
        sums = np.bincount(codes[cont], weights=jac, minlength=n_convs)
        mean = np.where(n_pairs > 0, sums / np.maximum(n_pairs, 1), 0.0)
        first_rows = np.flatnonzero(change)
        return pa.table(
            {
                "conv_id": conv.take(pa.array(first_rows)),
                "n_pairs": pa.array(n_pairs, pa.int64()),
                "mean_jaccard": pa.array(round_half_away(mean, 6), pa.float64()),
            }
        )

    return keyed_map(ds, "conv_id", _bucket, num_buckets=num_buckets)


def last_k_turns(ds, k: int = 3, sep: str = "\x1f", num_buckets: int | None = None):
    """Context-window extraction over transcripts: for every conversation,
    the concatenation of its LAST ``k`` turns (by turn_idx, ``sep``-joined)
    — the standard "recent context" construction for dialogue training
    examples. Returns a Dataset (conv_id, n_context_turns, context_text).

    One exchange on conv_id; inside a bucket the tail-gather is vectorized
    (group starts → clamped tail ranges → one take + ListArray/binary_join),
    no per-conversation Python.
    """
    from .exchange import group_starts, keyed_map

    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "n_context_turns": pa.array([], pa.int64()),
            "context_text": pa.array([], pa.string()),
        }
    )

    def _bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        conv = t["conv_id"].combine_chunks()
        starts = group_starts(conv)
        ends = np.append(starts[1:], len(t))
        tail_starts = np.maximum(ends - k, starts)
        lens = ends - tail_starts
        from .corpus import _segment_arange

        gather = np.repeat(tail_starts, lens) + _segment_arange(lens)
        texts = t["text"].combine_chunks().take(pa.array(gather))
        offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), texts), sep
        )
        return pa.table(
            {
                "conv_id": conv.take(pa.array(starts)),
                "n_context_turns": pa.array(lens, pa.int64()),
                "context_text": joined,
            }
        )

    return keyed_map(ds, "conv_id", _bucket, num_buckets=num_buckets)
