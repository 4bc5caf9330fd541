"""Canonicalize: transcript turns → one entity record per conv_id.

Payload-specific stage with no splink analogue (SURVEY.md §1.2 / §2.2 M6):
splink's unit of linkage is a flat record, so transcript rows
(conv_id, turn_idx, role, text, tool, ts) are aggregated into one linkage
record per conversation, with the **stable turn ordering invariant** — turns
sorted by turn_idx before any order-sensitive feature (per-turn text
equality ⇔ equality of the ordered turn list / its hash).

Ray shape: hash-exchange on conv_id (stages/exchange.keyed_map) → one
vectorized pass per bucket. Output schema = FIXTURES.md F2.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

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


def canonicalize_bucket(tbl: pa.Table) -> pa.Table:
    """All turns of each conv_id in ``tbl`` → one row per conv_id.

    Pure function over an Arrow table (unit-testable without Ray); sorted by
    conv_id so output order is deterministic within a bucket.
    """
    if len(tbl) == 0:
        return ENTITY_SCHEMA.empty_table()
    t = tbl.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    conv = np.asarray(t["conv_id"].to_pylist(), dtype=object)
    texts = t["text"].to_pylist()
    roles = t["role"].to_pylist()
    tools = t["tool"].to_pylist()
    ts = t["ts"].combine_chunks().cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)

    # group boundaries on the sorted conv array
    change = np.empty(len(conv), bool)
    change[0] = True
    change[1:] = conv[1:] != conv[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(conv))

    uid, n_turns, fu, fa, tlists, thash, rseq, tsets, tsmin = (
        [], [], [], [], [], [], [], [], []
    )
    for s, e in zip(starts, ends):
        uid.append(conv[s])
        n_turns.append(e - s)
        g_texts = texts[s:e]
        g_roles = roles[s:e]
        first_user = next((g_texts[i] for i in range(e - s) if g_roles[i] == "user"), None)
        first_asst = next(
            (g_texts[i] for i in range(e - s) if g_roles[i] == "assistant"), None
        )
        fu.append(first_user)
        fa.append(first_asst)
        tlists.append(g_texts)
        thash.append(
            hashlib.blake2b(
                _SEP.join(x or "" for x in g_texts).encode(), digest_size=12
            ).hexdigest()
        )
        rseq.append("".join((r or "?")[0] for r in g_roles))
        tsets.append(sorted({x for x in tools[s:e] if x}))
        tsmin.append(ts[s:e].min())

    return pa.table(
        {
            "unique_id": pa.array(uid, pa.string()),
            "n_turns": pa.array(n_turns, pa.int32()),
            "first_user_text": pa.array(fu, pa.string()),
            "first_assistant_text": pa.array(fa, pa.string()),
            "turn_texts": pa.array(tlists, pa.list_(pa.string())),
            "text_concat_hash": pa.array(thash, pa.string()),
            "role_seq": pa.array(rseq, pa.string()),
            "tool_set": pa.array(tsets, pa.list_(pa.string())),
            "ts_min": pa.array(np.array(tsmin, dtype="datetime64[us]"), pa.timestamp("us")),
            "ts_day": pa.array(
                np.datetime_as_string(np.array(tsmin, dtype="datetime64[D]")),
                pa.string(),
            ),
        }
    )


def canonicalize(ds, num_buckets: int | None = None):
    """transcripts Dataset → entity-record Dataset (one row per conv_id)."""
    return keyed_map(ds, "conv_id", canonicalize_bucket, num_buckets=num_buckets)
