"""Full-text retrieval over a document corpus: BM25 scoring.

No splink analogue — a first-class training-data-pipeline extra (quality
retrieval / dedup triage / curriculum selection all start from "find the
docs most relevant to a probe query"). Design is Ray-Data-first:

- **Pass 1 (corpus statistics)** — one streaming ``map_batches`` emits
  per-batch partials: document count, total token count, and per-query-term
  document frequencies. Only ``O(|query| + 2)`` rows per batch reach the
  ``groupby.sum``; the merged stats are a handful of scalars.
- **Pass 2 (score + local top-k)** — stats are closed over (tiny), each
  batch computes the BM25 score of its docs fully vectorized (one
  ``index_in`` over the flattened token stream + ``bincount`` per doc×term)
  and emits only its LOCAL top-k rows; the global ``sort().limit(k)`` then
  touches ``O(k × num_batches)`` rows, never the corpus.

At 100-TB scale nothing materializes: the corpus streams twice (stats are
scalars, candidates are pruned to top-k per batch before the only — tiny —
sort). The scoring uses the Lucene BM25 formulation
``idf(t) = ln((N − df + 0.5) / (df + 0.5) + 1)`` which is strictly
positive, so a doc scores > 0 iff it contains ≥ 1 query term.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .corpus import _token_lists

# sentinel keys for the scalar partials; real tokens are whitespace-split
# words and can never contain "\x00"
_NDOCS_KEY = "\x00ndocs"
_NTOK_KEY = "\x00ntok"


def _round6(x: np.ndarray) -> np.ndarray:
    # half-up at 6 decimals — identical formula to the SQL oracle's
    # floor(x * 1e6 + 0.5) / 1e6 (numpy round() is half-to-even; DuckDB
    # round() is half-away; this avoids depending on either)
    return np.floor(x * 1e6 + 0.5) / 1e6


def corpus_stats(ds, text_col: str, query_terms: list[str]):
    """(N docs, total token count, df per query term) in one streaming pass
    with per-batch pre-aggregation — only (term, partial) rows shuffle."""
    from ray.data.aggregate import Sum

    qset = pa.array(sorted(set(query_terms)), pa.string())

    def _partial(t: pa.Table) -> pa.Table:
        flat, ntok = _token_lists(t[text_col])
        n = len(ntok)
        seg = np.repeat(np.arange(n, dtype=np.int64), ntok)
        terms = [_NDOCS_KEY, _NTOK_KEY]
        vals = [n, int(ntok.sum())]
        if len(flat):
            qidx = (
                pc.index_in(flat, value_set=qset)
                .fill_null(-1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            hit = qidx >= 0
            if hit.any():
                # distinct (doc, term) presence -> per-term doc counts
                key = seg[hit] * len(qset) + qidx[hit]
                uq = np.unique(key) % len(qset)
                df = np.bincount(uq, minlength=len(qset))
                for i, term in enumerate(qset.to_pylist()):
                    if df[i]:
                        terms.append(term)
                        vals.append(int(df[i]))
        return pa.table(
            {"term": pa.array(terms, pa.string()), "v": pa.array(vals, pa.int64())}
        )

    rows = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("v", alias_name="v"))
        .take_all()
    )
    stats = {r["term"]: r["v"] for r in rows}
    n_docs = int(stats.pop(_NDOCS_KEY, 0))
    n_tokens = int(stats.pop(_NTOK_KEY, 0))
    df = {t: int(stats.get(t, 0)) for t in qset.to_pylist()}
    return n_docs, n_tokens, df


def bm25_search(
    ds,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Top-``k`` documents by BM25 score for a bag-of-words query.

    Returns a Dataset of (``id_col``, ``score``) — score half-up-rounded to
    6 decimals, ordered by (score DESC, id ASC) with deterministic
    tie-break. Oracle: tf/df/avgdl CTEs + the same Lucene idf formula
    (``__ray_entry__._bm25_sql``)."""
    n_docs, n_tokens, df_map = corpus_stats(ds, text_col, query_terms)
    if n_docs == 0:
        return ds.select_columns([id_col]).limit(0)
    avgdl = n_tokens / n_docs
    qlist = sorted(set(query_terms))
    qset = pa.array(qlist, pa.string())
    idf = np.array(
        [
            np.log((n_docs - df_map[t] + 0.5) / (df_map[t] + 0.5) + 1.0)
            for t in qlist
        ],
        np.float64,
    )

    def _score(t: pa.Table) -> pa.Table:
        flat, ntok = _token_lists(t[text_col])
        n = len(ntok)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        empty = pa.table(
            {id_col: ids.slice(0, 0), "score": pa.array([], pa.float64())}
        )
        if n == 0 or len(flat) == 0:
            return empty
        seg = np.repeat(np.arange(n, dtype=np.int64), ntok)
        qidx = (
            pc.index_in(flat, value_set=qset)
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        hit = qidx >= 0
        if not hit.any():
            return empty
        tf = np.bincount(
            seg[hit] * len(qlist) + qidx[hit], minlength=n * len(qlist)
        ).reshape(n, len(qlist)).astype(np.float64)
        norm = k1 * (1.0 - b + b * (ntok / avgdl))[:, None]
        # zero-tf terms contribute exactly 0.0, so the plain sum equals the
        # oracle's sum over tf>0 rows bit-for-bit
        score = ((tf * (k1 + 1.0)) / (tf + norm) * idf[None, :]).sum(axis=1)
        keep = np.flatnonzero(score > 0)
        if len(keep) == 0:
            return empty
        score6 = _round6(score[keep])
        # local top-k prune: only k rows per batch reach the global sort;
        # tie-break matches the global (score DESC, id ASC) order so the
        # prune never changes the final top-k
        if len(keep) > k:
            idv = ids.take(pa.array(keep))
            idv_np = idv.to_numpy(zero_copy_only=False)
            if np.issubdtype(idv_np.dtype, np.number):
                tie = idv_np
            else:
                # non-numeric ids: lexical ranks via Arrow sort (ADVICE r3 —
                # batch-local positions could drop a row that ties at the k
                # boundary but wins the global (score DESC, id ASC) sort)
                tie = np.empty(len(keep), np.int64)
                tie[
                    pc.sort_indices(idv)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ] = np.arange(len(keep), dtype=np.int64)
            order = np.lexsort((tie, -score6))[:k]
            keep, score6 = keep[order], score6[order]
        return pa.table(
            {
                id_col: ids.take(pa.array(keep)),
                "score": pa.array(score6, pa.float64()),
            }
        )

    return (
        ds.map_batches(_score, batch_format="pyarrow")
        .sort(["score", id_col], descending=[True, False])
        .limit(k)
    )
