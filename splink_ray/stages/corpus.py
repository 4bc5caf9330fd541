"""Corpus-preparation operators for large-scale training-data pipelines.

No splink analogue — first-class extras per the task brief, alongside
stages/dedup.py and functions/text.py:

- :func:`normalize_text` — canonical text form (lowercase, whitespace
  collapse, strip), one vectorized Arrow pass;
- :func:`chunk_documents` — overlapping word-window chunking (the shape
  LLM-pretraining tokenizer sharding needs), fully vectorized: token lists
  via ``utf8_split_whitespace``, segmented gather, ``binary_join``;
- :func:`top_k_ngrams` — corpus-wide word n-gram counts via per-batch
  partial aggregation → one small ``groupby.sum`` (never shuffles raw
  n-gram rows) → driver-side top-k;
- :func:`clean_corpus` — the composed cleaning pipeline (normalize →
  quality gate → language filter → exact dedup), each stage streaming.

Every operator here has a DuckDB oracle in ``__ray_entry__`` (the chunking
and n-gram SQL mirrors the list-slice CTE pattern proven for the
canonicalize oracle).
"""

from __future__ import annotations

import numpy as np

from ..kernels import round_half_away
import pyarrow as pa
import pyarrow.compute as pc


def _segment_arange(counts: np.ndarray) -> np.ndarray:
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    cum0 = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return np.arange(total, dtype=np.int64) - np.repeat(cum0, counts)


def normalize_text(texts) -> pa.Array:
    """Lowercase, collapse unicode whitespace runs to single spaces, strip.

    Oracle: ``lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))``."""
    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(
        texts, pa.string()
    )
    arr = pc.utf8_lower(arr)
    arr = pc.replace_substring_regex(arr, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(arr)


def _token_lists(arr: pa.Array):
    """(flat tokens Array, per-doc token counts int64) with empty tokens
    dropped (python .split() semantics)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "")
    toks = pc.utf8_split_whitespace(arr)
    ntok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    valid = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    if not valid.all():
        seg = np.repeat(np.arange(len(ntok), dtype=np.int64), ntok)
        ntok = np.bincount(seg[valid], minlength=len(ntok)).astype(np.int64)
        flat = flat.filter(pa.array(valid))
    return flat, ntok


def _window_join(
    flat: pa.Array, win_starts: np.ndarray, win_lens: np.ndarray, sep: str = " ",
) -> pa.Array:
    """Join ``win_lens[i]`` consecutive tokens starting at absolute token
    index ``win_starts[i]`` into one string per window — segmented gather +
    one Arrow ``binary_join``."""
    gather = np.repeat(win_starts, win_lens) + _segment_arange(win_lens)
    values = flat.take(pa.array(gather))
    offsets = np.concatenate([[0], np.cumsum(win_lens)]).astype(np.int32)
    lists = pa.ListArray.from_arrays(pa.array(offsets), values)
    return pc.binary_join(lists, sep)


def chunk_documents(
    ds, text_col: str, id_col: str, chunk_tokens: int = 64, overlap: int = 8,
):
    """Overlapping word-window chunks: one output row per chunk with
    (id, chunk_idx, chunk_text, n_tokens). Chunk i covers tokens
    ``[i*stride, i*stride + chunk_tokens)``, stride = chunk_tokens − overlap;
    every document emits ≥ 1 chunk (empty docs → one empty chunk)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    def _chunk(t: pa.Table) -> pa.Table:
        flat, ntok = _token_lists(t[text_col])
        n = len(ntok)
        doc_starts = np.concatenate([[0], np.cumsum(ntok)[:-1]]).astype(np.int64)
        # chunk starts: 0, stride, ... while start < ntok (≥1 chunk always)
        # simple start grid (0, stride, …, < ntok) keeps SQL parity
        # (generate_series by stride); every doc emits >= 1 chunk
        nchunks = np.maximum((ntok + stride - 1) // stride, 1)
        chunk_idx = _segment_arange(nchunks)
        starts_rel = chunk_idx * stride
        starts_abs = np.repeat(doc_starts, nchunks) + starts_rel
        ends_rel = np.minimum(starts_rel + chunk_tokens, np.repeat(ntok, nchunks))
        lens = np.maximum(ends_rel - starts_rel, 0)
        texts = _window_join(flat, starts_abs, lens)
        ids_col = t[id_col]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        rep = np.repeat(np.arange(n, dtype=np.int64), nchunks)
        return pa.table(
            {
                id_col: ids_col.take(pa.array(rep)),
                "chunk_idx": pa.array(chunk_idx.astype(np.int32), pa.int32()),
                "chunk_text": texts,
                "n_tokens": pa.array(lens, pa.int64()),
            }
        )

    return ds.map_batches(_chunk, batch_format="pyarrow")


def top_k_ngrams(ds, text_col: str, n: int = 2, k: int = 20):
    """Top-k whitespace word n-grams by corpus count (ties broken by the
    n-gram string ascending — deterministic). Pre-aggregated per batch; only
    (ngram, partial count) rows shuffle. Returns a pandas DataFrame
    (ngram, n)."""
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        flat, ntok = _token_lists(t[text_col])
        counts = np.maximum(ntok - n + 1, 0)  # docs shorter than n emit none
        doc_starts = np.concatenate([[0], np.cumsum(ntok)[:-1]]).astype(np.int64)
        starts_abs = np.repeat(doc_starts, counts) + _segment_arange(counts)
        lens = np.full(len(starts_abs), n, np.int64)
        grams = _window_join(flat, starts_abs, lens)
        if len(grams) == 0:
            return pa.table(
                {"ngram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        g = pa.table({"ngram": grams}).group_by("ngram", use_threads=False).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["ngram", "n"])

    merged = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("ngram")
        .aggregate(Sum("n", alias_name="n"))
    )
    out = merged.sort(["n", "ngram"], descending=[True, False]).limit(k).to_pandas()
    return out.reset_index(drop=True)


def clean_corpus(
    ds,
    text_col: str,
    id_col: str,
    min_tokens: int = 5,
    max_punct_ratio: float = 0.3,
    languages: tuple = ("en",),
    num_buckets=None,
):
    """Composed cleaning pipeline: normalize → token/punct quality gate →
    language filter → exact dedup on the normalized text (min-id survivor).
    Every stage is a streaming batch transform; the dedup is the one
    (narrow) exchange. Returns the surviving rows with ``norm_text``."""
    from ..functions.text import detect_language, quality_scores
    from .dedup import exact_dedup

    def _prep(t: pa.Table) -> pa.Table:
        norm = normalize_text(t[text_col])
        t = t.append_column("norm_text", norm)
        q = quality_scores(norm)
        keep = (q["n_tokens"] >= min_tokens) & (q["punct_ratio"] <= max_punct_ratio)
        if languages:
            langs = detect_language(norm)
            keep &= np.isin(langs, np.asarray(languages, dtype=object))
        return t.filter(pa.array(keep))

    prepped = ds.map_batches(_prep, batch_format="pyarrow")
    return exact_dedup(prepped, "norm_text", id_col, num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# RE2 patterns (pyarrow and DuckDB both compile RE2, so the SAME strings run
# in the engine and in the SQL oracle with identical match semantics).
# Order matters and is part of the contract: email → ip → ssn → phone.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[ .-]\d{3}[ .-]\d{4}\b", "<PHONE>"),
)


def scrub_pii_batch(texts, counts: bool = True):
    """Redact PII spans in a string array; one vectorized RE2 pass per
    pattern (training-data pipelines scrub before any text leaves the
    worker — emails, IPs, SSNs, US-style phone numbers).

    Returns ``(scrubbed: pa.Array, counts: dict[str, pa.Array])`` —
    per-category match counts are taken on the ORIGINAL text (categories
    are disjoint by construction; replacements run sequentially in
    :data:`PII_PATTERNS` order).

    Oracle: nested ``regexp_replace(..., 'g')`` in the same order +
    ``len(regexp_extract_all(text, pat))`` per category."""
    arr = texts if isinstance(texts, pa.Array) else pa.chunked_array([texts]).combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out_counts: dict[str, pa.Array] = {}
    scrubbed = arr
    for name, pat, repl in PII_PATTERNS:
        if counts:
            out_counts[f"n_{name}"] = pc.count_substring_regex(arr, pat)
        scrubbed = pc.replace_substring_regex(scrubbed, pat, repl)
    return scrubbed, out_counts


def scrub_pii(ds, text_col: str, out_col: str | None = None, counts: bool = True):
    """Dataset wrapper: adds ``out_col`` (default ``<text_col>_scrubbed``)
    plus ``n_email / n_ip / n_ssn / n_phone`` count columns. Streaming
    ``map_batches``, no exchange."""
    out = out_col or f"{text_col}_scrubbed"

    def _scrub(t: pa.Table) -> pa.Table:
        scrubbed, cnts = scrub_pii_batch(t[text_col], counts=counts)
        t = t.append_column(out, scrubbed)
        for k, v in cnts.items():
            t = t.append_column(k, v)
        return t

    return ds.map_batches(_scrub, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Repetition stats (Gopher-style quality signals)
# ---------------------------------------------------------------------------


def _ngram_windows(texts, n: int):
    """(grams: pa.Array, seg: np.ndarray doc index per gram, n_docs) for
    whitespace word n-grams — segmented gather + one Arrow binary_join."""
    flat, ntok = _token_lists(texts)
    counts = np.maximum(ntok - n + 1, 0)
    doc_starts = np.concatenate([[0], np.cumsum(ntok)[:-1]]).astype(np.int64)
    starts_abs = np.repeat(doc_starts, counts) + _segment_arange(counts)
    grams = _window_join(flat, starts_abs, np.full(len(starts_abs), n, np.int64))
    seg = np.repeat(np.arange(len(ntok), dtype=np.int64), counts)
    return grams, seg, len(ntok)


def repetition_stats(ds, text_col: str, id_col: str):
    """Per-document repetition quality signals (the Gopher-rules shape):

    - ``n_tokens`` — whitespace token count;
    - ``dup_word_frac`` — ``1 − n_distinct_words / n_tokens`` (0.0 when
      empty);
    - ``top_bigram_frac`` — occurrences of the most frequent word bigram
      over total bigrams (0.0 when fewer than 2 tokens).

    Fully vectorized: dictionary-encode tokens once, per-doc distinct and
    per-(doc, bigram) counts via int64 key ``np.unique`` + ``reduceat`` —
    no Python loop over docs. Streaming ``map_batches``, no exchange.

    Oracle: str_split + list_distinct + a LATERAL bigram unnest, see
    ``__ray_entry__._repetition_sql``."""

    def _stats(t: pa.Table) -> pa.Table:
        flat, ntok = _token_lists(t[text_col])
        n = len(ntok)
        seg = np.repeat(np.arange(n, dtype=np.int64), ntok)
        if len(flat):
            codes = (
                pc.dictionary_encode(flat)
                .indices.to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            K = int(codes.max()) + 1
            uk = np.unique(seg * K + codes)
            n_dist = np.bincount(uk // K, minlength=n)
        else:
            codes = np.empty(0, np.int64)
            K = 1
            n_dist = np.zeros(n, np.int64)
        mc = np.zeros(n, np.int64)
        if len(codes) >= 2:
            same = seg[1:] == seg[:-1]
            b_seg, c1, c2 = seg[:-1][same], codes[:-1][same], codes[1:][same]
            if len(b_seg):
                if n * K * K < 2**62:
                    ukb, cnts = np.unique(
                        (b_seg * K + c1) * K + c2, return_counts=True
                    )
                    docs_b = ukb // (K * K)
                else:  # huge batches: same result via lexsorted 3-column key
                    order = np.lexsort((c2, c1, b_seg))
                    b_seg, c1, c2 = b_seg[order], c1[order], c2[order]
                    new = np.empty(len(b_seg), bool)
                    new[0] = True
                    new[1:] = (
                        (b_seg[1:] != b_seg[:-1])
                        | (c1[1:] != c1[:-1])
                        | (c2[1:] != c2[:-1])
                    )
                    starts_u = np.flatnonzero(new)
                    cnts = np.diff(np.append(starts_u, len(b_seg)))
                    docs_b = b_seg[starts_u]
                bounds = np.concatenate(
                    [[0], np.flatnonzero(np.diff(docs_b)) + 1]
                )
                mc[docs_b[bounds]] = np.maximum.reduceat(cnts, bounds)
        nb = np.maximum(ntok - 1, 0)
        dup = np.where(ntok > 0, 1.0 - n_dist / np.maximum(ntok, 1), 0.0)
        top = np.where(nb > 0, mc / np.maximum(nb, 1), 0.0)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                id_col: ids,
                "n_tokens": pa.array(ntok, pa.int64()),
                "dup_word_frac": pa.array(dup, pa.float64()),
                "top_bigram_frac": pa.array(top, pa.float64()),
            }
        )

    return ds.map_batches(_stats, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


def ngram_blocklist(ds, text_col: str, n: int = 5) -> pa.Array:
    """Distinct word n-grams of a (benchmark-sized, SMALL) dataset as one
    Arrow string array — the broadcast side of :func:`decontaminate`.

    Per-batch distinct n-grams stream back and union on the driver; bounded
    by the blocklist size (a benchmark suite, not the corpus — the corpus
    side never materializes)."""

    def _distinct(t: pa.Table) -> pa.Table:
        grams, _, _ = _ngram_windows(t[text_col], n)
        return pa.table({"ngram": pc.unique(grams)})

    parts = ds.map_batches(_distinct, batch_format="pyarrow").take_all()
    vals = sorted({r["ngram"] for r in parts})
    return pa.array(vals, pa.string())


def decontaminate(ds, text_col: str, id_col: str, blocklist, n: int = 5):
    """Flag training documents sharing any word ``n``-gram with a benchmark
    blocklist: per doc, ``n_contaminated`` (occurrences, counting repeats)
    and ``contaminated``. The blocklist is broadcast ONCE via ``ray.put``
    and fetched per worker process (never re-shipped per batch); the match
    is one vectorized ``pc.is_in`` over the flattened n-gram windows.
    Streaming, no exchange.

    Oracle: LATERAL n-gram unnest JOIN a distinct-ngram CTE, grouped per
    doc (``__ray_entry__._decontaminate_sql``)."""
    from .blocking import _fetch_broadcast
    from .exchange import broadcast

    if not isinstance(blocklist, pa.Array):
        blocklist = pa.array(list(blocklist), pa.string())
    ref = broadcast(blocklist)

    def _check(t: pa.Table) -> pa.Table:
        bl = _fetch_broadcast(ref)
        grams, seg, n_docs = _ngram_windows(t[text_col], n)
        hits = np.zeros(n_docs, np.int64)
        if len(grams) and len(bl):
            mask = pc.is_in(grams, value_set=bl).to_numpy(zero_copy_only=False)
            if mask.any():
                hits = np.bincount(seg[mask], minlength=n_docs)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                id_col: ids,
                "n_contaminated": pa.array(hits, pa.int64()),
                "contaminated": pa.array(hits > 0),
            }
        )

    return ds.map_batches(_check, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Distinctive terms (TF / document-frequency ranking)
# ---------------------------------------------------------------------------


def top_distinctive_terms(
    ds, text_col: str, id_col: str, k: int = 3,
    broadcast_threshold: int = 2_000_000,
):
    """Per-document top-``k`` distinctive terms: rank a doc's terms by
    (term frequency DESC, global document frequency ASC, term ASC) — the
    integer-keyed version of tf-idf ranking (no float log, so the order is
    bit-reproducible in SQL).

    Two passes over the corpus:

    1. **global DF** — per-batch DISTINCT (doc, term) pairs collapse to
       per-term partial doc-counts; only (term, count) rows reach the
       ``groupby.sum``.
    2. **per-doc ranking** — if the vocabulary fits
       (``<= broadcast_threshold``) the DF map broadcasts once via
       ``ray.put`` and batches rank locally (dictionary-code ``np.unique``
       counts, ``pc.index_in`` DF attach, one ``np.lexsort`` + group-run
       cut). Above the threshold (100-TB open vocabulary) nothing is pulled
       to the driver: exploded (doc, term, tf) rows attach DF via a
       distributed ``ds.join`` on the term, then rank inside
       doc-keyed exchange buckets — the same huge-cardinality fallback
       ``unigram_logprob`` and stages/tf.py use.

    Oracle: tf/df CTEs + ``row_number()`` window
    (``__ray_entry__._distinctive_terms_sql``)."""
    from ray.data.aggregate import Sum

    from .blocking import _fetch_broadcast
    from .exchange import broadcast, default_parallelism, keyed_map

    def _doc_term(t: pa.Table):
        flat, ntok = _token_lists(t[text_col])
        n = len(ntok)
        seg = np.repeat(np.arange(n, dtype=np.int64), ntok)
        if len(flat) == 0:
            return None, None, None, n
        d = pc.dictionary_encode(flat)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        K = len(d.dictionary)
        uk, tf_counts = np.unique(seg * K + codes, return_counts=True)
        return d.dictionary, uk // K, (uk % K, tf_counts), n

    def _df_partial(t: pa.Table) -> pa.Table:
        vocab, docs, ct, _ = _doc_term(t)
        if vocab is None:
            return pa.table({"term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        codes_u = ct[0]
        # distinct (doc, term) pairs -> per-term doc counts
        per_term = np.bincount(codes_u, minlength=len(vocab)).astype(np.int64)
        keep = per_term > 0
        return pa.table(
            {
                "term": vocab.filter(pa.array(keep)),
                "df": pa.array(per_term[keep], pa.int64()),
            }
        )

    counts_ds = (
        ds.map_batches(_df_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .materialize()  # vocab-sized (term, df) rows, stays distributed
    )

    if counts_ds.count() > broadcast_threshold:
        return _top_distinctive_terms_join(
            ds, text_col, id_col, k, counts_ds, _doc_term,
            default_parallelism, keyed_map,
        )

    df_tbl = counts_ds.to_pandas()
    vocab_arr = pa.array(df_tbl["term"].to_numpy(), pa.string())
    df_arr = df_tbl["df"].to_numpy().astype(np.int64)
    ref = broadcast((vocab_arr, df_arr))

    def _rank(t: pa.Table) -> pa.Table:
        vocab_g, df_g = _fetch_broadcast(ref)
        vocab, docs, ct, n = _doc_term(t)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if vocab is None:
            return pa.table(
                {
                    id_col: ids.slice(0, 0),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        codes_u, tf_counts = ct
        df_local = df_g[
            pc.index_in(vocab, value_set=vocab_g)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        ]
        # alphabetical rank of each dictionary entry (double argsort)
        alpha = np.empty(len(vocab), np.int64)
        alpha[
            pc.sort_indices(vocab).to_numpy(zero_copy_only=False).astype(np.int64)
        ] = np.arange(len(vocab), dtype=np.int64)
        dfs = df_local[codes_u]
        order = np.lexsort((alpha[codes_u], dfs, -tf_counts, docs))
        docs_s = docs[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(docs_s)) + 1])
        lens = np.diff(np.append(starts, len(docs_s)))
        rank = np.arange(len(docs_s), dtype=np.int64) - np.repeat(starts, lens)
        keep = rank < k
        sel = order[keep]
        return pa.table(
            {
                id_col: ids.take(pa.array(docs[sel])),
                "term": vocab.take(pa.array(codes_u[sel])),
                "tf": pa.array(tf_counts[sel], pa.int64()),
                "df": pa.array(dfs[sel], pa.int64()),
                "rank": pa.array(rank[keep] + 1, pa.int64()),
            }
        )

    return ds.map_batches(_rank, batch_format="pyarrow")


def _top_distinctive_terms_join(
    ds, text_col, id_col, k, counts_ds, _doc_term, default_parallelism, keyed_map
):
    """Huge-vocabulary path for :func:`top_distinctive_terms`: no
    driver-side DF table. Exploded per-doc (id, term, tf) rows join the
    distributed (term, df) aggregate, then each doc's rows rank inside a
    doc-keyed exchange bucket (vectorized lexsort + group-run cut)."""

    def _explode_tf(t: pa.Table) -> pa.Table:
        vocab, docs, ct, _n = _doc_term(t)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if vocab is None:
            return pa.table(
                {
                    id_col: ids.slice(0, 0),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        codes_u, tf_counts = ct
        return pa.table(
            {
                id_col: ids.take(pa.array(docs)),
                "term": vocab.take(pa.array(codes_u)),
                "tf": pa.array(tf_counts, pa.int64()),
            }
        )

    def _df_side(t: pa.Table) -> pa.Table:
        # Ray 2.49: empty shuffled aggregate partitions lose their schema
        if "df" not in t.column_names:
            return pa.table(
                {"__term": pa.array([], pa.string()),
                 "df": pa.array([], pa.int64())}
            )
        return pa.table({"__term": t["term"], "df": t["df"].cast(pa.int64())})

    # hardened sort-exchange join, NOT Dataset.join: counts_ds is a groupby
    # aggregate whose empty partitions emit schema-less blocks that break
    # the hash-shuffle join, and the guard in _df_side above cannot repair
    # them — Ray routes empty blocks around map_batches UDFs entirely
    # (stages/joins.py::shuffle_join hazard writeup)
    from .joins import _as_schema, shuffle_join

    id_type = _as_schema(ds).field(id_col).type
    joined = shuffle_join(
        ds.map_batches(_explode_tf, batch_format="pyarrow"),
        counts_ds.map_batches(_df_side, batch_format="pyarrow"),
        on="term", right_on="__term", how="inner",
        left_schema=pa.schema(
            [(id_col, id_type), ("term", pa.string()), ("tf", pa.int64())]
        ),
        right_schema=pa.schema([("__term", pa.string()), ("df", pa.int64())]),
    )

    def _rank_bucket(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        terms = t["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        dfv = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        # group key codes for ids (any dtype) + alphabetical term ranks
        id_codes = pc.dictionary_encode(ids).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        alpha = np.empty(len(terms), np.int64)
        alpha[
            pc.sort_indices(terms).to_numpy(zero_copy_only=False).astype(np.int64)
        ] = np.arange(len(terms), dtype=np.int64)
        order = np.lexsort((alpha, dfv, -tf, id_codes))
        ids_s = id_codes[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(ids_s)) + 1])
        lens = np.diff(np.append(starts, len(ids_s)))
        rank = np.arange(len(ids_s), dtype=np.int64) - np.repeat(starts, lens)
        keep = rank < k
        sel = order[keep]
        return pa.table(
            {
                id_col: ids.take(pa.array(sel)),
                "term": terms.take(pa.array(sel)),
                "tf": pa.array(tf[sel], pa.int64()),
                "df": pa.array(dfv[sel], pa.int64()),
                "rank": pa.array(rank[keep] + 1, pa.int64()),
            }
        )

    return keyed_map(joined, id_col, _rank_bucket)


# ---------------------------------------------------------------------------
# Exact-substring duplication signal (Lee et al., "Deduplicating Training
# Data Makes Language Models Better" — the span-level dedup statistic)
# ---------------------------------------------------------------------------


def dup_span_stats(ds, text_col: str, id_col: str, n: int = 5, num_buckets=None):
    """Per-document duplicated-span statistics at word ``n``-gram
    granularity: ``n_spans`` (distinct n-grams in the doc), ``n_shared``
    (of those, how many also occur in ≥ 1 OTHER document) and
    ``dup_frac = n_shared / max(n_spans, 1)`` (half-up, 6 decimals) — the
    signal exact-substring dedup thresholds on.

    Shape at scale: one streaming pass emits per-batch DISTINCT
    (ngram, doc) pairs; ONE hash exchange keyed on the n-gram co-locates
    each gram (``keyed_map`` bucket granularity, vectorized group-run scan
    inside the bucket — no per-group dispatch); per-doc shared counts
    pre-aggregate inside the bucket so only (doc, partial) rows reach the
    final small ``groupby.sum``; the per-doc totals stream in a second
    pass and meet the shared counts in a keyed ``join`` (never a driver
    materialization). At 100 TB the n-gram key should be a 128-bit hash
    instead of the string (same plan, narrower exchange).

    Oracle: DISTINCT-gram LATERAL unnest + doc-count CTE
    (``__ray_entry__._dup_spans_sql``)."""
    from .exchange import default_parallelism, group_starts, keyed_map

    def _distinct_pairs(t: pa.Table) -> pa.Table:
        grams, seg, n_docs = _ngram_windows(t[text_col], n)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if len(grams) == 0:
            return pa.table({"ngram": pa.array([], pa.string()),
                             id_col: ids.slice(0, 0)})
        d = pc.dictionary_encode(grams)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        K = len(d.dictionary)
        uk = np.unique(seg * K + codes)
        return pa.table(
            {
                "ngram": d.dictionary.take(pa.array(uk % K)),
                id_col: ids.take(pa.array(uk // K)),
            }
        )

    def _totals(t: pa.Table) -> pa.Table:
        grams, seg, n_docs = _ngram_windows(t[text_col], n)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n_spans = np.zeros(n_docs, np.int64)
        if len(grams):
            d = pc.dictionary_encode(grams)
            codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            K = len(d.dictionary)
            uk = np.unique(seg * K + codes)
            n_spans = np.bincount(uk // K, minlength=n_docs)
        return pa.table({id_col: ids, "n_spans": pa.array(n_spans, pa.int64())})

    def _bucket_shared(t: pa.Table) -> pa.Table:
        # all rows of every gram hashing here; rows are (gram, doc) distinct
        order = pc.sort_indices(t["ngram"])
        g = t["ngram"].take(order)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids = ids.take(order)
        starts = group_starts(g)
        sizes = np.diff(np.append(starts, len(g)))
        shared = np.repeat(sizes >= 2, sizes)
        ids_sh = ids.filter(pa.array(shared))
        if len(ids_sh) == 0:
            return pa.table({id_col: ids.slice(0, 0),
                             "n_shared": pa.array([], pa.int64())})
        vc = pc.value_counts(ids_sh)
        return pa.table(
            {id_col: vc.field("values"),
             "n_shared": vc.field("counts").cast(pa.int64())}
        )

    from ray.data.aggregate import Sum

    pairs = ds.map_batches(_distinct_pairs, batch_format="pyarrow")
    shared = (
        keyed_map(pairs, "ngram", _bucket_shared, num_buckets=num_buckets)
        .groupby(id_col)
        .aggregate(Sum("n_shared", alias_name="n_shared"))
        .rename_columns({id_col: "__sid"})
    )
    totals = ds.map_batches(_totals, batch_format="pyarrow")
    # hardened sort-exchange join, NOT Dataset.join: `shared` descends from
    # keyed_map + a groupby aggregate, whose empty partitions emit
    # schema-less blocks that break the hash-shuffle join at high partition
    # counts (stages/joins.py::shuffle_join hazard writeup)
    from .joins import _as_schema, shuffle_join

    id_type = _as_schema(ds).field(id_col).type
    joined = shuffle_join(
        totals,
        shared,
        on=id_col, right_on="__sid", how="left_outer",
        left_schema=pa.schema([(id_col, id_type), ("n_spans", pa.int64())]),
        right_schema=pa.schema([("__sid", id_type), ("n_shared", pa.int64())]),
    )

    def _finish(t: pa.Table) -> pa.Table:
        ns = pc.fill_null(t["n_shared"], 0).cast(pa.int64())
        nsp = t["n_spans"].combine_chunks() if isinstance(
            t["n_spans"], pa.ChunkedArray
        ) else t["n_spans"]
        spans = nsp.to_numpy(zero_copy_only=False).astype(np.float64)
        frac = ns.to_numpy(zero_copy_only=False) / np.maximum(spans, 1.0)
        frac6 = round_half_away(frac, 6)
        return pa.table(
            {
                id_col: t[id_col],
                "n_spans": t["n_spans"],
                "n_shared": ns,
                "dup_frac": pa.array(frac6, pa.float64()),
            }
        )

    return joined.map_batches(_finish, batch_format="pyarrow")


def pmi_collocations(ds, text_col: str, k: int = 20, min_count: int = 5):
    """Top-k bigram collocations ranked by pointwise mutual information.

    PMI(w1, w2) = ln( (n12/B) / ((n1/T) * (n2/T)) ) over whitespace word
    tokens, where T/B are the corpus unigram/bigram totals; only bigrams
    seen at least ``min_count`` times rank (the classic low-frequency PMI
    guard).

    Scale shape: one pass over the corpus emits per-batch pre-aggregated
    (gram, kind, partial n) rows — raw tokens never shuffle; the merged
    count table (vocab-sized, NOT corpus-sized) is materialized once and
    reused for totals, candidates and unigram sides; unigram counts attach
    to the min_count-filtered candidates via bounded hash joins, so the
    vocabulary is never collected on the driver. Returns a pandas DataFrame
    (gram, n, pmi) with pmi rounded to 6 decimals, ordered by
    (pmi desc, gram asc).
    """
    from ray.data.aggregate import Sum

    from .exchange import default_parallelism

    empty_counts = pa.table(
        {
            "gram": pa.array([], pa.string()),
            "kind": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def _partial(t: pa.Table) -> pa.Table:
        flat, ntok = _token_lists(t[text_col])
        if len(flat) == 0:
            return empty_counts
        uni = (
            pa.table({"gram": flat})
            .group_by("gram", use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["gram", "n"])
        )
        uni = uni.append_column("kind", pa.array(["u"] * len(uni), pa.string()))
        parts = [uni.select(["gram", "kind", "n"])]
        counts = np.maximum(ntok - 1, 0)
        if counts.sum() > 0:
            doc_starts = np.concatenate([[0], np.cumsum(ntok)[:-1]]).astype(np.int64)
            starts_abs = np.repeat(doc_starts, counts) + _segment_arange(counts)
            grams = _window_join(flat, starts_abs, np.full(len(starts_abs), 2, np.int64))
            big = (
                pa.table({"gram": grams})
                .group_by("gram", use_threads=False)
                .aggregate([([], "count_all")])
                .rename_columns(["gram", "n"])
            )
            big = big.append_column("kind", pa.array(["b"] * len(big), pa.string()))
            parts.append(big.select(["gram", "kind", "n"]))
        return pa.concat_tables(parts)

    counts = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["gram", "kind"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # vocab-sized aggregate, reused 3x below
    )

    totals = counts.groupby("kind").aggregate(Sum("n", alias_name="tot")).to_pandas()
    tot = dict(zip(totals["kind"], totals["tot"]))
    T = float(tot.get("u", 0))
    B = float(tot.get("b", 0))
    if B == 0 or T == 0:
        import pandas as pd

        return pd.DataFrame({"gram": [], "n": [], "pmi": []})

    def _cand(t: pa.Table) -> pa.Table:
        if "kind" not in t.column_names:  # schema-less empty agg partition
            t = empty_counts
        t = t.filter(
            pc.and_(pc.equal(t["kind"], "b"), pc.greater_equal(t["n"], min_count))
        )
        if len(t) == 0:
            return pa.table(
                {
                    "gram": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                }
            )
        parts = pc.split_pattern(t["gram"].combine_chunks(), " ")
        return pa.table(
            {
                "gram": t["gram"],
                "n": t["n"],
                "w1": pc.list_element(parts, 0),
                "w2": pc.list_element(parts, 1),
            }
        )

    def _uni(suffix):
        def fn(t: pa.Table) -> pa.Table:
            if "kind" not in t.column_names:
                t = empty_counts
            t = t.filter(pc.equal(t["kind"], "u"))
            return pa.table({f"__w{suffix}": t["gram"], f"n{suffix}": t["n"]})

        return fn

    cand = counts.map_batches(_cand, batch_format="pyarrow")
    # hardened sort-exchange joins, NOT Dataset.join: both sides descend
    # from the `counts` groupby aggregate, whose schema-less empty
    # partitions break the hash-shuffle join at high partition counts, and
    # the _cand/_uni guards cannot repair them — Ray routes empty blocks
    # around map_batches UDFs (stages/joins.py::shuffle_join)
    from .joins import shuffle_join

    cand_schema = pa.schema(
        [("gram", pa.string()), ("n", pa.int64()),
         ("w1", pa.string()), ("w2", pa.string())]
    )
    j = shuffle_join(
        cand,
        counts.map_batches(_uni(1), batch_format="pyarrow"),
        on="w1", right_on="__w1", how="inner",
        left_schema=cand_schema,
        right_schema=pa.schema([("__w1", pa.string()), ("n1", pa.int64())]),
    )
    j = shuffle_join(
        j,
        counts.map_batches(_uni(2), batch_format="pyarrow"),
        on="w2", right_on="__w2", how="inner",
        left_schema=pa.schema(
            [("w1", pa.string()), ("gram", pa.string()), ("n", pa.int64()),
             ("w2", pa.string()), ("n1", pa.int64())]
        ),
        right_schema=pa.schema([("__w2", pa.string()), ("n2", pa.int64())]),
    )

    def _pmi(t: pa.Table) -> pa.Table:
        n12 = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        n1 = t["n1"].to_numpy(zero_copy_only=False).astype(np.float64)
        n2 = t["n2"].to_numpy(zero_copy_only=False).astype(np.float64)
        # mirror the oracle's arithmetic order exactly
        pmi = np.log((n12 / B) / ((n1 / T) * (n2 / T)))
        return pa.table(
            {
                "gram": t["gram"],
                "n": t["n"],
                "pmi": pa.array(round_half_away(pmi, 6), pa.float64()),
            }
        )

    out = (
        j.map_batches(_pmi, batch_format="pyarrow")
        .sort(["pmi", "gram"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return out.reset_index(drop=True)


def unigram_logprob(
    ds, text_col: str, id_col: str, broadcast_threshold: int = 2_000_000,
):
    """Mean unigram log-probability per document — a corpus-typicality /
    fluency quality score: ``avg over the doc's tokens of ln(c_w / T)``
    where ``c_w`` is the corpus-wide count of the token and ``T`` the corpus
    token total. Low scores flag documents full of rare tokens (OCR noise,
    boilerplate hashes); the classic cheap stand-in for LM perplexity.

    Scale shape: counts come from per-batch partial aggregation (raw tokens
    never shuffle); if the vocabulary fits (``<= broadcast_threshold``) the
    count table broadcasts once via ``ray.put`` and each batch attaches
    log-probs with a zero-copy Arrow C++ hash join; otherwise the exploded
    (doc, token) rows attach via a distributed ``ds.join`` on the token
    (the same huge-cardinality fallback the TF stage uses). Returns a
    Dataset (id, n_tokens, logprob) with logprob rounded to 6 decimals.
    """
    import ray
    from ray.data.aggregate import Count, Sum

    from .exchange import default_parallelism

    def _partial(t: pa.Table) -> pa.Table:
        flat, _ = _token_lists(t[text_col])
        if len(flat) == 0:
            return pa.table(
                {"g": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        g = (
            pa.table({"g": flat})
            .group_by("g", use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["g", "n"])

    counts = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # vocab-sized
    )
    T = float(counts.sum("n") or 0)
    if T == 0:
        import pandas as pd

        return ray.data.from_pandas(
            pd.DataFrame({id_col: [], "n_tokens": [], "logprob": []})
        )
    vocab = counts.count()

    if vocab <= broadcast_threshold:
        cnt_pd = counts.to_pandas()
        lp_tbl = pa.table(
            {
                "g": pa.array(cnt_pd["g"], pa.string()),
                "__lp": pa.array(
                    np.log(cnt_pd["n"].to_numpy(np.float64) / T), pa.float64()
                ),
            }
        )
        ref = ray.put(lp_tbl)

        def _score(t: pa.Table) -> pa.Table:
            flat, ntok = _token_lists(t[text_col])
            keep = ntok > 0
            if not keep.any():
                return pa.table(
                    {
                        id_col: pa.array([], t[id_col].type),
                        "n_tokens": pa.array([], pa.int64()),
                        "logprob": pa.array([], pa.float64()),
                    }
                )
            seg = np.repeat(np.arange(len(ntok), dtype=np.int64), ntok)
            j = pa.table({"g": flat, "__seg": seg}).join(
                ray.get(ref), keys="g", join_type="left outer"
            )
            lp = pc.fill_null(j["__lp"], 0.0).to_numpy(zero_copy_only=False)
            sj = j["__seg"].to_numpy(zero_copy_only=False)
            sums = np.bincount(sj, weights=lp, minlength=len(ntok))
            mean = sums[keep] / ntok[keep]
            return pa.table(
                {
                    id_col: t[id_col].filter(pa.array(keep)),
                    "n_tokens": pa.array(ntok[keep], pa.int64()),
                    "logprob": pa.array(round_half_away(mean, 6), pa.float64()),
                }
            )

        return ds.map_batches(_score, batch_format="pyarrow")

    # huge-vocab fallback: distributed join on the token
    def _explode(t: pa.Table) -> pa.Table:
        flat, ntok = _token_lists(t[text_col])
        ids = t[id_col].combine_chunks().take(
            pa.array(np.repeat(np.arange(len(ntok), dtype=np.int64), ntok))
        )
        return pa.table({id_col: ids, "g": flat})

    def _lp(t: pa.Table) -> pa.Table:
        if "n" not in t.column_names:  # schema-less empty agg partition
            return pa.table(
                {"__g": pa.array([], pa.string()), "__lp": pa.array([], pa.float64())}
            )
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {"__g": t["g"], "__lp": pa.array(np.log(n / T), pa.float64())}
        )

    # hardened sort-exchange join, NOT Dataset.join (schema-less empty agg
    # blocks break the hash-shuffle join; the _lp guard can't repair them —
    # stages/joins.py::shuffle_join)
    from .joins import _as_schema, shuffle_join

    id_type = _as_schema(ds).field(id_col).type
    j = shuffle_join(
        ds.map_batches(_explode, batch_format="pyarrow"),
        counts.map_batches(_lp, batch_format="pyarrow"),
        on="g", right_on="__g", how="inner",
        left_schema=pa.schema([(id_col, id_type), ("g", pa.string())]),
        right_schema=pa.schema([("__g", pa.string()), ("__lp", pa.float64())]),
    )
    agg = j.groupby(id_col).aggregate(
        Sum("__lp", alias_name="__s"), Count(alias_name="n_tokens")
    )

    def _finish(t: pa.Table) -> pa.Table:
        if "__s" not in t.column_names:  # schema-less empty agg partition
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "logprob": pa.array([], pa.float64()),
                }
            )
        s = t["__s"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": t["n_tokens"].cast(pa.int64()),
                "logprob": pa.array(round_half_away(s / n, 6), pa.float64()),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def _bigram_keys(t: pa.Table, text_col: str):
    """Per batch: (flat "w1 w2" bigram keys, per-doc bigram counts int64).
    Tokens are whitespace-split so the single-space joint key is
    unambiguous and matches the SQL ``w1 || ' ' || w2``."""
    flat, ntok = _token_lists(t[text_col])
    nbig = np.maximum(ntok - 1, 0)
    if nbig.sum() == 0:
        return pa.array([], pa.string()), nbig
    seg = np.repeat(np.arange(len(ntok), dtype=np.int64), ntok)
    is_last = np.empty(len(seg), bool)
    is_last[-1] = True
    is_last[:-1] = seg[1:] != seg[:-1]
    left_idx = np.flatnonzero(~is_last)
    li = pa.array(left_idx, pa.int64())
    ri = pa.array(left_idx + 1, pa.int64())
    big = pc.binary_join_element_wise(flat.take(li), flat.take(ri), " ")
    return big, nbig


def bigram_logprob(
    ds, text_col: str, id_col: str, alpha: float = 0.1,
    broadcast_threshold: int = 2_000_000,
):
    """Mean bigram log-probability per document under an add-α-smoothed
    bigram LM trained on the corpus itself — the KenLM-style fluency /
    perplexity proxy one order above :func:`unigram_logprob`:

        score(doc) = mean over adjacent token pairs (w1, w2) of
                     ln((c(w1 w2) + α) / (c1(w1) + α·V))

    with ``c`` the corpus bigram count, ``c1`` the count of ``w1`` as a
    bigram left context and ``V`` the corpus unigram vocabulary size.
    Documents with fewer than two tokens have no bigrams and are dropped.
    Returns a Dataset ``(id, n_bigrams, logprob)`` (logprob half-away
    rounded to 6 decimals).

    Scale shape (same as unigram_logprob): bigram counts come from
    per-batch partial aggregation — raw tokens never shuffle; the
    vocab²-bounded count table either broadcasts once via ``ray.put``
    (≤ ``broadcast_threshold`` rows) with per-bigram log-probs precomputed
    driver-side, or attaches via the hardened sort-exchange
    ``joins.shuffle_join`` on the bigram key. Self-scoring means every
    scored bigram exists in the counts table; unseen bigrams (when scoring
    a different corpus through the same tables) fall back to ln(1/V).
    Reference: splink has no analogue; semantics follow KenLM-style
    interpolated-count LMs reduced to one add-α order."""
    import ray
    from ray.data.aggregate import Count, Sum

    def _partial(t: pa.Table) -> pa.Table:
        big, _ = _bigram_keys(t, text_col)
        if len(big) == 0:
            return pa.table(
                {"g": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        g = (
            pa.table({"g": big})
            .group_by("g", use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["g", "n"])

    def _uni_partial(t: pa.Table) -> pa.Table:
        flat, _ = _token_lists(t[text_col])
        return pa.table({"g": pc.unique(flat)})

    counts = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # vocab²-bounded
    )
    V = float(
        ds.map_batches(_uni_partial, batch_format="pyarrow")
        .groupby("g")
        .count()
        .count()
    )
    n_bigrams_total = counts.count()
    if n_bigrams_total == 0 or V == 0:
        import pandas as pd

        return ray.data.from_pandas(
            pd.DataFrame({id_col: [], "n_bigrams": [], "logprob": []})
        )
    unseen_lp = float(np.log(1.0 / V))

    if n_bigrams_total <= broadcast_threshold:
        cnt_pd = counts.to_pandas()
        g = cnt_pd["g"].to_numpy()
        c = cnt_pd["n"].to_numpy(np.float64)
        w1 = np.array([s.split(" ", 1)[0] for s in g], dtype=object)
        import pandas as pd

        c1 = pd.Series(c).groupby(pd.Series(w1)).transform("sum").to_numpy()
        lp_tbl = pa.table(
            {
                "g": pa.array(g, pa.string()),
                "__lp": pa.array(
                    np.log((c + alpha) / (c1 + alpha * V)), pa.float64()
                ),
            }
        )
        ref = ray.put(lp_tbl)

        def _score(t: pa.Table) -> pa.Table:
            big, nbig = _bigram_keys(t, text_col)
            keep = nbig > 0
            if not keep.any():
                return pa.table(
                    {
                        id_col: pa.array([], t[id_col].type),
                        "n_bigrams": pa.array([], pa.int64()),
                        "logprob": pa.array([], pa.float64()),
                    }
                )
            seg = np.repeat(np.arange(len(nbig), dtype=np.int64), nbig)
            j = pa.table({"g": big, "__seg": seg}).join(
                ray.get(ref), keys="g", join_type="left outer"
            )
            lp = pc.fill_null(j["__lp"], unseen_lp).to_numpy(zero_copy_only=False)
            sj = j["__seg"].to_numpy(zero_copy_only=False)
            sums = np.bincount(sj, weights=lp, minlength=len(nbig))
            mean = sums[keep] / nbig[keep]
            return pa.table(
                {
                    id_col: t[id_col].filter(pa.array(keep)),
                    "n_bigrams": pa.array(nbig[keep], pa.int64()),
                    "logprob": pa.array(round_half_away(mean, 6), pa.float64()),
                }
            )

        return ds.map_batches(_score, batch_format="pyarrow")

    # huge-vocab fallback: two hardened sort-exchange joins (never
    # Dataset.join — stages/joins.py::shuffle_join)
    from .joins import _as_schema, shuffle_join

    def _left_tok(t: pa.Table) -> pa.Table:
        if "n" not in t.column_names:  # schema-less empty agg partition
            return pa.table(
                {
                    "g": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "__w1": pa.array([], pa.string()),
                }
            )
        first = pc.list_element(pc.split_pattern(t["g"], " ", max_splits=1), 0)
        return pa.table({"g": t["g"], "n": t["n"], "__w1": first})

    keyed = counts.map_batches(_left_tok, batch_format="pyarrow")
    from ray.data.aggregate import Sum as _Sum

    c1_ds = keyed.groupby("__w1").aggregate(_Sum("n", alias_name="__c1"))

    def _c1_fix(t: pa.Table) -> pa.Table:
        if "__c1" not in t.column_names:
            return pa.table(
                {"__w1c": pa.array([], pa.string()), "__c1": pa.array([], pa.int64())}
            )
        return pa.table({"__w1c": t["__w1"], "__c1": t["__c1"].cast(pa.int64())})

    j1 = shuffle_join(
        keyed,
        c1_ds.map_batches(_c1_fix, batch_format="pyarrow"),
        on="__w1", right_on="__w1c", how="inner",
        left_schema=pa.schema(
            [("g", pa.string()), ("n", pa.int64()), ("__w1", pa.string())]
        ),
        right_schema=pa.schema([("__w1c", pa.string()), ("__c1", pa.int64())]),
    )

    def _lp(t: pa.Table) -> pa.Table:
        c = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = t["__c1"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "__g": t["g"],
                "__lp": pa.array(
                    np.log((c + alpha) / (c1 + alpha * V)), pa.float64()
                ),
            }
        )

    lp_ds = j1.map_batches(_lp, batch_format="pyarrow")

    def _explode(t: pa.Table) -> pa.Table:
        big, nbig = _bigram_keys(t, text_col)
        ids = t[id_col].combine_chunks().take(
            pa.array(np.repeat(np.arange(len(nbig), dtype=np.int64), nbig))
        )
        return pa.table({id_col: ids, "g": big})

    id_type = _as_schema(ds).field(id_col).type
    # left join + fill keeps unseen-bigram semantics identical to the
    # broadcast path (ln(1/V) floor, n_bigrams counts every bigram)
    j2 = shuffle_join(
        ds.map_batches(_explode, batch_format="pyarrow"),
        lp_ds,
        on="g", right_on="__g", how="left_outer",
        left_schema=pa.schema([(id_col, id_type), ("g", pa.string())]),
        right_schema=pa.schema([("__g", pa.string()), ("__lp", pa.float64())]),
    )

    def _fill(t: pa.Table) -> pa.Table:
        i = t.column_names.index("__lp")
        return t.set_column(i, "__lp", pc.fill_null(t["__lp"], unseen_lp))

    agg = (
        j2.map_batches(_fill, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("__lp", alias_name="__s"), Count(alias_name="n_bigrams"))
    )

    def _finish(t: pa.Table) -> pa.Table:
        if "__s" not in t.column_names:  # schema-less empty agg partition
            return pa.table(
                {
                    id_col: pa.array([], id_type),
                    "n_bigrams": pa.array([], pa.int64()),
                    "logprob": pa.array([], pa.float64()),
                }
            )
        s = t["__s"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n_bigrams"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                id_col: t[id_col],
                "n_bigrams": t["n_bigrams"].cast(pa.int64()),
                "logprob": pa.array(round_half_away(s / n, 6), pa.float64()),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def dsir_importance(
    ds, text_col: str, id_col: str, target_col: str, n_buckets: int = 1024,
):
    """DSIR hashed-unigram importance weights (Xie et al. 2023,
    arXiv:2302.03169): score every document by how much more likely its
    tokens are under the TARGET domain's hashed-unigram LM than under the
    raw corpus's — ``log w(x) = Σ_tokens [ln p_t(b) − ln p_r(b)]`` with
    ``b = md5_u32(token) % n_buckets`` and Laplace ``+1`` smoothing over the
    ``n_buckets`` feature space (the hashing + smoothing are what make the
    ratio defined for tokens unseen in the target). High-weight documents
    are the ones importance resampling would keep.

    ``target_col`` names a boolean column of ``ds`` marking target-domain
    rows (they also count into the raw distribution, as in the paper's
    raw-vs-target formulation). Returns (id, n_tokens, log_weight) with
    log_weight half-away-rounded to 6 decimals.

    Ray shape: ONE streaming counts pass emitting ≤ n_buckets-row partials
    per batch (raw tokens never shuffle) → a bucket-keyed groupby of
    bounded size → the dense log-ratio vector (n_buckets floats) broadcasts
    once via ``ray.put`` → ONE scoring pass. No token-level exchange at any
    scale. Oracle: ``__ray_entry__._dsir_sql`` (same md5-cut hash the
    sampling stages use, so DuckDB parity is by construction)."""
    import ray
    from ray.data.aggregate import Sum

    from ..duckdb_kernels import get_kernel

    K = int(n_buckets)

    def _bucket_of(flat: pa.Array) -> np.ndarray:
        # hash per DISTINCT token, then scatter: md5 runs once per unique
        # word per batch, not once per token instance
        distinct = pc.unique(flat)
        h = get_kernel().md5_u32(distinct) % np.uint64(K)
        codes = pc.index_in(flat, distinct).to_numpy(zero_copy_only=False)
        return h[codes].astype(np.int64)

    empty_counts = pa.table(
        {
            "b": pa.array([], pa.int64()),
            "n_r": pa.array([], pa.int64()),
            "n_t": pa.array([], pa.int64()),
        }
    )

    def _partial(t: pa.Table) -> pa.Table:
        flat, ntok = _token_lists(t[text_col])
        if len(flat) == 0:
            return empty_counts
        b = _bucket_of(flat)
        is_t = np.repeat(
            t[target_col].to_numpy(zero_copy_only=False).astype(bool), ntok
        )
        n_r = np.bincount(b, minlength=K)
        n_t = np.bincount(b[is_t], minlength=K)
        keep = n_r > 0
        return pa.table(
            {
                "b": pa.array(np.flatnonzero(keep), pa.int64()),
                "n_r": pa.array(n_r[keep], pa.int64()),
                "n_t": pa.array(n_t[keep], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("n_r", alias_name="n_r"), Sum("n_t", alias_name="n_t"))
        .take_all()
    )  # ≤ n_buckets rows — the one driver-side object, by design
    n_r = np.zeros(K, np.float64)
    n_t = np.zeros(K, np.float64)
    for r in agg:
        n_r[int(r["b"])] = r["n_r"]
        n_t[int(r["b"])] = r["n_t"]
    t_r, t_t = n_r.sum(), n_t.sum()
    # mirror the oracle's arithmetic order exactly
    d = np.log((n_t + 1.0) / (t_t + K)) - np.log((n_r + 1.0) / (t_r + K))
    ref = ray.put(d)

    def _score(t: pa.Table) -> pa.Table:
        dv = ray.get(ref)
        flat, ntok = _token_lists(t[text_col])
        keep = ntok > 0
        if not keep.any():
            return pa.table(
                {
                    id_col: pa.array([], t[id_col].type),
                    "n_tokens": pa.array([], pa.int64()),
                    "log_weight": pa.array([], pa.float64()),
                }
            )
        b = _bucket_of(flat)
        seg = np.repeat(np.arange(len(ntok), dtype=np.int64), ntok)
        sums = np.bincount(seg, weights=dv[b], minlength=len(ntok))
        return pa.table(
            {
                id_col: t[id_col].filter(pa.array(keep)),
                "n_tokens": pa.array(ntok[keep], pa.int64()),
                "log_weight": pa.array(
                    round_half_away(sums[keep], 6), pa.float64()
                ),
            }
        )

    return ds.map_batches(_score, batch_format="pyarrow")


def split_sentences(ds, text_col: str, id_col: str):
    """Sentence segmentation: one output row per sentence with
    (id, sent_idx, sentence, n_chars). Sentences split on the RE2 pattern
    ``[.!?] +`` (terminator followed by spaces — the terminator stays on the
    sentence's tail is NOT preserved, matching ``regexp_split_to_array``);
    ``sent_idx`` is the 0-based position among ALL split parts, and empty
    parts are dropped AFTER indexing, so indices are stable.

    Fully vectorized flat-map: ``split_pattern_regex`` → ListArray flatten
    with a segmented ordinal — no per-row Python. Streams batch-by-batch;
    no shuffle at all.
    """

    def _split(t: pa.Table) -> pa.Table:
        arr = t[text_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = pc.fill_null(arr, "")
        parts = pc.split_pattern_regex(arr, pattern="[.!?] +")
        nparts = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        flat = pc.list_flatten(parts)
        idx = _segment_arange(nparts)
        ids_col = t[id_col]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        ids = ids_col.take(
            pa.array(np.repeat(np.arange(len(nparts), dtype=np.int64), nparts))
        )
        nchars = pc.utf8_length(flat)
        keep = pc.greater(nchars, 0)
        out = pa.table(
            {
                id_col: ids,
                "sent_idx": pa.array(idx, pa.int64()),
                "sentence": flat,
                "n_chars": nchars.cast(pa.int64()),
            }
        )
        return out.filter(keep)

    return ds.map_batches(_split, batch_format="pyarrow")


def remove_dup_spans(ds, text_col: str, id_col: str, n: int = 5, num_buckets=None):
    """Exact duplicated-span REMOVAL (the rewrite step of Lee et al.'s
    "Deduplicating Training Data Makes Language Models Better" — dup_span_
    stats is the measurement, this is the cure): every token covered by a
    word ``n``-gram that appears in ≥ 2 distinct documents is dropped from
    all documents EXCEPT the gram's keeper (the min-id document containing
    it). Returns a Dataset (id, clean_text, n_tokens_kept, n_tokens_removed).

    Scale shape (two exchanges + one distributed join, all on pre-shrunk
    rows): (1) per-batch DISTINCT (gram, doc) rows — globally distinct
    because a document never splits across batches — feed one
    ``groupby(gram)`` producing (keeper, n_docs); (2) the exploded
    occurrence rows (doc, pos, gram) join the ``n_docs ≥ 2`` grams on the
    gram (O(tokens) shuffle — the same shape as the original map-reduce);
    (3) surviving (doc, pos) marks union with the (doc, text) rows and
    co-locate via ONE doc-keyed exchange, where coverage masks and the
    token-filtered rebuild are fully vectorized (segment offsets +
    ListArray + binary_join — no per-doc Python).
    """
    from ray.data.aggregate import Count, Min

    from .exchange import keyed_map

    def _gram_windows(t: pa.Table):
        flat, ntok = _token_lists(t[text_col])
        counts = np.maximum(ntok - n + 1, 0)
        doc_starts = np.concatenate([[0], np.cumsum(ntok)[:-1]]).astype(np.int64)
        starts_abs = np.repeat(doc_starts, counts) + _segment_arange(counts)
        grams = _window_join(flat, starts_abs, np.full(len(starts_abs), n, np.int64))
        ids_col = t[id_col]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        rep = np.repeat(np.arange(len(ntok), dtype=np.int64), counts)
        return grams, ids_col.take(pa.array(rep)), _segment_arange(counts)

    def _gram_doc(t: pa.Table) -> pa.Table:
        grams, ids, _ = _gram_windows(t)
        if len(grams) == 0:
            return pa.table(
                {"g": pa.array([], pa.string()), "__d": pa.array([], pa.int64())}
            )
        return (
            pa.table({"g": grams, "__d": ids.cast(pa.int64())})
            .group_by(["g", "__d"], use_threads=False)
            .aggregate([])
        )

    gstats = (
        ds.map_batches(_gram_doc, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Min("__d", alias_name="__keeper"), Count(alias_name="__nd"))
    )

    def _shared(t: pa.Table) -> pa.Table:
        if "__nd" not in t.column_names:  # schema-less empty agg partition
            return pa.table(
                {
                    "g": pa.array([], pa.string()),
                    id_col: pa.array([], pa.int64()),
                    "__pos": pa.array([], pa.int64()),
                    "__keeper": pa.array([], pa.int64()),
                }
            )
        t = t.filter(pc.greater_equal(t["__nd"], 2))
        return pa.table(
            {
                "g": t["g"],
                id_col: pa.nulls(len(t), pa.int64()),
                "__pos": pa.nulls(len(t), pa.int64()),
                "__keeper": t["__keeper"].cast(pa.int64()),
            }
        )

    shared = gstats.map_batches(_shared, batch_format="pyarrow")

    def _occ(t: pa.Table) -> pa.Table:
        grams, ids, pos = _gram_windows(t)
        return pa.table(
            {
                "g": grams,
                id_col: ids.cast(pa.int64()),
                "__pos": pa.array(pos, pa.int64()),
                "__keeper": pa.nulls(len(grams), pa.int64()),
            }
        )

    # gram-keyed exchange instead of Dataset.join: Ray 2.49 loses the schema
    # of EMPTY shuffled aggregate partitions, which breaks a downstream
    # pyarrow join's key resolution at tiny inputs (same workaround as the
    # graph-metrics partial-union in pipelines/clustering.py). The in-bucket
    # join is the Arrow C++ hash join.
    occ_and_shared = ds.map_batches(_occ, batch_format="pyarrow").union(shared)

    def _match(t: pa.Table) -> pa.Table:
        is_shared = pc.is_valid(t["__keeper"]).to_numpy(zero_copy_only=False)
        out_empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "__pos": pa.array([], pa.int64()),
                text_col: pa.array([], pa.string()),
            }
        )
        if is_shared.all() or not is_shared.any():
            return out_empty
        sh = t.filter(pa.array(is_shared)).select(["g", "__keeper"])
        oc = t.filter(pa.array(~is_shared)).select(["g", id_col, "__pos"])
        j = oc.join(sh, keys="g", join_type="inner")
        j = j.filter(pc.not_equal(j[id_col], j["__keeper"]))
        return pa.table(
            {
                id_col: j[id_col],
                "__pos": j["__pos"],
                text_col: pa.nulls(len(j), pa.string()),
            }
        )

    marks = keyed_map(occ_and_shared, "g", _match, num_buckets=num_buckets)

    def _doc_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t[id_col].cast(pa.int64()),
                "__pos": pa.nulls(len(t), pa.int64()),
                text_col: t[text_col],
            }
        )

    tagged = ds.map_batches(_doc_rows, batch_format="pyarrow").union(marks)

    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "clean_text": pa.array([], pa.string()),
            "n_tokens_kept": pa.array([], pa.int64()),
            "n_tokens_removed": pa.array([], pa.int64()),
        }
    )

    def _rebuild(t: pa.Table) -> pa.Table:
        is_doc = pc.is_valid(t[text_col]).to_numpy(zero_copy_only=False)
        if not is_doc.any():
            return empty
        docs = t.filter(pa.array(is_doc)).sort_by([(id_col, "ascending")])
        flat, ntok = _token_lists(docs[text_col])
        doc_starts = np.concatenate([[0], np.cumsum(ntok)[:-1]]).astype(np.int64)
        total = int(ntok.sum())
        covered = np.zeros(total, bool)
        pos_rows = t.filter(pa.array(~is_doc))
        if len(pos_rows):
            doc_ids = docs[id_col].to_numpy(zero_copy_only=False)
            pid = pos_rows[id_col].to_numpy(zero_copy_only=False)
            ppos = pos_rows["__pos"].to_numpy(zero_copy_only=False)
            di = np.searchsorted(doc_ids, pid)
            starts = doc_starts[di] + ppos
            idx = np.repeat(starts, n) + np.tile(
                np.arange(n, dtype=np.int64), len(starts)
            )
            covered[idx] = True
        kept = ~covered
        seg = np.repeat(np.arange(len(ntok), dtype=np.int64), ntok)
        kept_per_doc = np.bincount(seg[kept], minlength=len(ntok)).astype(np.int64)
        flat_kept = flat.filter(pa.array(kept))
        offsets = np.concatenate([[0], np.cumsum(kept_per_doc)]).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets), flat_kept)
        clean = pc.binary_join(lists, " ")
        return pa.table(
            {
                id_col: docs[id_col],
                "clean_text": clean,
                "n_tokens_kept": pa.array(kept_per_doc, pa.int64()),
                "n_tokens_removed": pa.array(ntok - kept_per_doc, pa.int64()),
            }
        )

    return keyed_map(tagged, id_col, _rebuild, num_buckets=num_buckets)

def gram_novelty(ds, text_col: str, id_col: str, n: int = 3, num_buckets=None):
    """Per-document n-gram novelty: over each document's DISTINCT word
    n-grams, the count and fraction whose global FIRST owner (minimum
    ``id_col``) is this document — "how much of this doc is new to the
    corpus", the diversity/novelty signal used to down-weight boilerplate
    when composing training mixes. Returns
    ``(id, n_grams, n_introduced, novelty)`` for every document with at
    least one n-gram.

    Scale shape: per-batch DISTINCT (gram, id) rows are the only rows that
    shuffle (the dup_spans exchange class); ONE gram-keyed exchange both
    resolves each gram's minimum owner AND reduces to per-document partial
    counts in-bucket — a single exchange where a join-then-aggregate plan
    would take two; a final (document-domain) groupby sums partials. The
    novelty ratio is a pure double law of two int64 counts.

    Oracle: DISTINCT grams CTE + ``min(doc_id) GROUP BY gram`` + per-doc
    conditional count (``__ray_entry__`` gram_novelty SQL)."""
    from ray.data.aggregate import Sum

    from .exchange import group_starts, keyed_map
    from .joins import _as_schema

    id_type = _as_schema(ds).field(id_col).type

    def _empty() -> pa.Table:
        return pa.table(
            {
                id_col: pa.array([], id_type),
                "n_grams": pa.array([], pa.int64()),
                "n_introduced": pa.array([], pa.int64()),
            }
        )

    def _gram_rows(t: pa.Table) -> pa.Table:
        grams, seg, _ = _ngram_windows(t[text_col], n)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if len(grams) == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             id_col: pa.array([], id_type)})
        return (
            pa.table({"g": grams, id_col: ids.take(pa.array(seg))})
            .group_by(["g", id_col], use_threads=False)
            .aggregate([])
        )

    rows = ds.select_columns([text_col, id_col]).map_batches(
        _gram_rows, batch_format="pyarrow"
    )

    def _bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "g" not in t.column_names:
            return _empty()
        d = t.group_by(["g", id_col], use_threads=False).aggregate([])
        d = d.sort_by([("g", "ascending"), (id_col, "ascending")])
        g = d["g"]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        starts = group_starts(g)
        sizes = np.diff(np.append(starts, len(d)))
        # sorted (gram, id): the first row of each gram run IS the min owner
        intro = np.zeros(len(d), np.int64)
        intro[starts] = 1
        p = (
            pa.table({id_col: d[id_col], "__i": pa.array(intro)})
            .group_by(id_col, use_threads=False)
            .aggregate([("__i", "sum"), ([], "count_all")])
        )
        return p.rename_columns([id_col, "n_introduced", "n_grams"]).select(
            [id_col, "n_grams", "n_introduced"]
        )

    partials = keyed_map(rows, "g", _bucket, num_buckets=num_buckets)
    agg = partials.groupby(id_col).aggregate(
        Sum("n_grams", alias_name="n_grams"),
        Sum("n_introduced", alias_name="n_introduced"),
    )

    def _finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "n_grams" not in t.column_names:
            return pa.table(
                {
                    id_col: pa.array([], id_type),
                    "n_grams": pa.array([], pa.int64()),
                    "n_introduced": pa.array([], pa.int64()),
                    "novelty": pa.array([], pa.float64()),
                }
            )
        ng = t["n_grams"].to_numpy(zero_copy_only=False).astype(np.float64)
        ni = t["n_introduced"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                id_col: t[id_col],
                "n_grams": pc.cast(t["n_grams"], pa.int64()),
                "n_introduced": pc.cast(t["n_introduced"], pa.int64()),
                "novelty": pa.array(ni / ng, pa.float64()),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")
