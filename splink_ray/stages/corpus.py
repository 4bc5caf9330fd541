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
