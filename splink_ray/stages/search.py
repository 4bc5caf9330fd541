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


def hybrid_rrf_search(
    docs_ds,
    emb_ds,
    text_col: str,
    doc_id_col: str,
    query_terms: list[str],
    query_vec,
    vec_col: str,
    vec_id_col: str,
    k_each: int = 20,
    k: int = 10,
    c: int = 60,
) -> pa.Table:
    """Hybrid sparse+dense retrieval fused with Reciprocal Rank Fusion
    (Cormack, Clarke & Büttcher, SIGIR'09: ``rrf(d) = Σ 1/(c + rank_i(d))``
    over the ranked lists that contain ``d``; c = 60 per the paper).

    Components are the two existing distributed retrievers — BM25 top-k
    (two streaming corpus passes, per-batch prune) and brute-force cosine
    top-k (broadcast query, distributed per-query merge); vec ids and doc
    ids share the key space. The fusion itself touches only the two
    ``k_each``-row ranked lists — a BOUNDED driver-side merge (the same
    bounded-aggregate exception the repo's driver-pull audit documents),
    returned as an Arrow table of (``doc_id_col``, ``rrf``) rounded half-up
    to 6 decimals, ordered by (rrf DESC, id ASC), top ``k``.

    Determinism: BM25 ranks order by (score₆ DESC, id ASC); cosine ranks
    come from :func:`..ann.knn_brute_force` (score₁₂ DESC, id ASC); the rrf
    sum is computed sparse-term-first so the float matches the SQL oracle's
    ``coalesce(bm,0) + coalesce(kn,0)`` bit-for-bit."""
    from .ann import knn_brute_force

    bm = bm25_search(
        docs_ds, text_col, doc_id_col, query_terms, k=k_each
    ).to_pandas()
    kn = (
        knn_brute_force(
            emb_ds, vec_col, vec_id_col,
            np.asarray([query_vec], np.float64), [0], k=k_each,
        )
        .select_columns([vec_id_col, "rank"])
        .to_pandas()
    )
    # bm25 rank: position under (score DESC, id ASC); scores are already
    # rounded to 6 decimals so the order is reproducible in SQL
    order = np.lexsort((bm[doc_id_col].to_numpy(), -bm["score"].to_numpy()))
    bm_rank = {int(bm[doc_id_col].iloc[i]): r + 1 for r, i in enumerate(order)}
    kn_rank = {
        int(i): int(r) for i, r in zip(kn[vec_id_col], kn["rank"])
    }
    ids = sorted(set(bm_rank) | set(kn_rank))
    rrf6 = _round6(
        np.array(
            [
                (1.0 / (c + bm_rank[i]) if i in bm_rank else 0.0)
                + (1.0 / (c + kn_rank[i]) if i in kn_rank else 0.0)
                for i in ids
            ],
            np.float64,
        )
    )
    # order on the ROUNDED value (matching the oracle's ORDER BY) so the
    # doc-id tie-break fires identically at the k boundary
    top = np.lexsort((np.array(ids, np.int64), -rrf6))[:k]
    return pa.table(
        {
            doc_id_col: pa.array([ids[i] for i in top], pa.int64()),
            "rrf": pa.array(rrf6[top], pa.float64()),
        }
    )
