"""Fuzzy string self-join: all pairs within Levenshtein distance 1.

No splink analogue as a standalone operator (splink reaches edit distance
through comparison levels on already-blocked pairs —
``comparison_level_library::LevenshteinLevel``); a first-class
training-data-pipeline extra: near-identical titles/names/URLs are the
classic symptom of scraped-corpus duplication, and an *exact-recall*
distance-1 join is the cheap deterministic sweep that LSH methods cannot
guarantee.

Algorithm — FastSS deletion neighbourhood (Bocek, Hunt & Stiller 2007,
"Fast Similarity Search in Large Dictionaries", U. Zurich TR ifi-2007.02):
for radius 1, ``lev(u, v) <= 1`` implies ``u`` and ``v`` share a string in
``{s} ∪ del1(s)`` (the string itself plus every single-codepoint deletion):

- ``u == v``           → share ``u`` itself;
- ``v = delete(u, i)`` → ``u``'s variant ``i`` equals ``v``'s own key;
- ``v = insert(u, ·)`` → symmetric to deletion;
- ``v = subst(u, i)``  → ``delete(u, i) == delete(v, i)``.

so candidate generation keyed on neighbourhood strings provably misses
nothing (exact recall by construction); false positives (e.g. ``ab``/``ba``
share key ``b`` at distance 2) are removed by an exact Levenshtein verify.

Ray-Data shape at scale: one streaming pass emits ``O(rows × (L + 1))``
``(key, id, len)`` rows — never the quadratic pair space; keys exchange
once (hash buckets); in-bucket triangle pair generation with the
``|len_u − len_v| <= 1`` necessary-condition filter; one pair-keyed
exchange dedups candidates that share several keys; texts join back via
the hardened ``shuffle_join`` (never ``Dataset.join`` — Ray 2.49
schema-less-empty-block hazard, see stages/joins.py); the verify is the
batch-vectorized DP kernel (``kernels.levenshtein``, byte-level = DuckDB
semantics). Intended domain is short keys (names, titles, URLs): the key
explosion is ``L + 1`` per row and the verify DP is ``O(L²)`` vector ops
per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels import levenshtein
from .dedup import _attach_pair_texts, _pairs_in_buckets
from .exchange import keyed_map

# past any real key column; utf8_slice_codeunits clamps to the string end
_END = 1 << 30


def _deletion_key_rows(col: str, id_col: str):
    """Per-batch map: (id, s) → distinct (``__key``, ``__jid``, ``__len``)
    rows for ``{s} ∪ del1(s)``. Vectorized over the batch: the only Python
    loop is over codepoint POSITIONS (bounded by the longest string in the
    batch), each iteration a whole-column Arrow slice/concat."""

    def _f(t: pa.Table) -> pa.Table:
        s = t[col]
        ids = t[id_col]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        valid = pc.is_valid(s)  # null keys never match anything
        s, ids = s.filter(valid), ids.filter(valid)
        empty = pa.table(
            {
                "__key": pa.array([], pa.string()),
                "__jid": ids.slice(0, 0),
                "__len": pa.array([], pa.int64()),
            }
        )
        if len(s) == 0:
            return empty
        lens = pc.utf8_length(s)
        max_len = pc.max(lens).as_py() or 0
        keys, kids, klens = [s], [ids], [lens]
        for p in range(max_len):
            m = pc.greater(lens, p)
            sub, idsub, lsub = s.filter(m), ids.filter(m), lens.filter(m)
            keys.append(
                pc.binary_join_element_wise(
                    pc.utf8_slice_codeunits(sub, 0, p),
                    pc.utf8_slice_codeunits(sub, p + 1, _END),
                    "",
                )
            )
            kids.append(idsub)
            klens.append(lsub)
        out = pa.table(
            {
                "__key": pa.concat_arrays([k.cast(pa.string()) for k in keys]),
                "__jid": pa.concat_arrays(kids),
                "__len": pa.concat_arrays([a.cast(pa.int64()) for a in klens]),
            }
        )
        # repeated chars give duplicate (key, id) rows within one string —
        # local distinct keeps the exchange volume at true neighbourhood size
        return out.group_by(
            ["__key", "__jid", "__len"], use_threads=False
        ).aggregate([])

    return _f


def edit_distance_join(
    ds, col: str, id_col: str, max_dist: int = 1, num_buckets=None
):
    """All ``(id_l < id_r)`` pairs with ``levenshtein(s_l, s_r) <= max_dist``
    over a string column — exact recall AND exact precision.

    Only ``max_dist`` ∈ {0, 1} is supported: the radius-1 deletion
    neighbourhood is the FastSS sweet spot (radius d needs all
    ``C(L, <=d)`` deletion variants — the key volume grows ``L^d`` and a
    q-gram/partitioning scheme wins beyond 1). Returns a Dataset of
    ``(id_l, id_r, dist)`` with ``dist`` int64.

    Oracle: the quadratic cross join ``levenshtein(l, r) <= max_dist``
    (DuckDB ``levenshtein`` — byte-level, the same semantics as
    ``kernels.levenshtein``)."""
    if max_dist not in (0, 1):
        raise ValueError(
            "edit_distance_join supports max_dist 0 or 1 (FastSS radius-1 "
            "deletion neighbourhood); larger radii need q-gram blocking"
        )

    if max_dist == 0:
        # degenerate: exact-equality pairs — key on the string itself
        def _self_rows(t: pa.Table) -> pa.Table:
            s, ids = t[col], t[id_col]
            if isinstance(s, pa.ChunkedArray):
                s = s.combine_chunks()
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            valid = pc.is_valid(s)
            s, ids = s.filter(valid), ids.filter(valid)
            return pa.table(
                {
                    "__key": s,
                    "__jid": ids,
                    "__len": pc.utf8_length(s).cast(pa.int64()),
                }
            )

        exploded = ds.select_columns([id_col, col]).map_batches(
            _self_rows, batch_format="pyarrow"
        )
    else:
        exploded = ds.select_columns([id_col, col]).map_batches(
            _deletion_key_rows(col, id_col), batch_format="pyarrow"
        )

    def _cand_bucket(t: pa.Table) -> pa.Table:
        li, ri, ts = _pairs_in_buckets(t, "__key", "__jid")
        ids = ts["__jid"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        empty = pa.table(
            {"id_l": pa.array([], ids.type), "id_r": pa.array([], ids.type)}
        )
        if len(li) == 0:
            return empty
        ln = ts["__len"].to_numpy(zero_copy_only=False)
        ok = np.abs(ln[li] - ln[ri]) <= max_dist  # necessary condition
        li, ri = li[ok], ri[ok]
        if len(li) == 0:
            return empty
        # local dedup: one pair can share several keys in the same bucket
        return (
            pa.table(
                {"id_l": ids.take(pa.array(li)), "id_r": ids.take(pa.array(ri))}
            )
            .group_by(["id_l", "id_r"], use_threads=False)
            .aggregate([])
        )

    cand = keyed_map(exploded, "__key", _cand_bucket, num_buckets=num_buckets)

    def _distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["id_l", "id_r"], use_threads=False).aggregate([])

    # global dedup: the same pair emitted from different key buckets
    cand = keyed_map(cand, "id_l", _distinct, num_buckets=num_buckets)

    j = _attach_pair_texts(cand, ds, ds, id_col, col, num_buckets=num_buckets)

    def _verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "id_l": t["id_l"],
                    "id_r": t["id_r"],
                    "dist": pa.array([], pa.int64()),
                }
            )
        d = levenshtein(
            t["__text_l"].to_pylist(), t["__text_r"].to_pylist()
        )
        keep = d <= max_dist
        return pa.table(
            {
                "id_l": t["id_l"].filter(pa.array(keep)),
                "id_r": t["id_r"].filter(pa.array(keep)),
                "dist": pa.array(d[keep], pa.int64()),
            }
        )

    return j.map_batches(_verify, batch_format="pyarrow")
