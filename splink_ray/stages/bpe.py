"""Byte-pair-encoding tokenizer training + application (LLM-data extra).

Reference: the BPE algorithm of Sennrich et al. 2016 (arXiv:1508.07909) as
used by modern tokenizer trainers: corpus → word-frequency table → greedy
merge loop over the word table. splink has no analogue; this is a
first-class training-data-pipeline operator (SURVEY.md §8).

Scale shape: the ONLY corpus-sized pass is the word count — per-batch
partial aggregation (raw tokens never shuffle) followed by one vocab-keyed
exchange of (word, n) rows. The merge loop then runs driver-side over the
bounded word-frequency table, exactly as single-node tokenizer trainers do
(the table is vocabulary-sized, ≪ data, by Heaps' law; a ``max_vocab``
guard caps the driver object and reports what was dropped). Encoding is an
actor-pool ``map_batches`` stage: merge ranks load once per actor in
``__init__``; per batch, only the UNIQUE words are encoded (then scattered
back), with a persistent word→ids cache across batches — the same
unique-word memoization real tokenizers use, which keeps the per-row work
amortized O(1) for natural-language word distributions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

END = "</w>"


# ---------------------------------------------------------------------------
# distributed word counts (the corpus-sized pass)
# ---------------------------------------------------------------------------


def word_counts(ds, text_col: str):
    """Dataset (word, n) — whitespace words, per-batch partial counts,
    one vocab-keyed exchange."""
    from ray.data.aggregate import Sum

    from .corpus import _token_lists

    def _partial(t: pa.Table) -> pa.Table:
        flat, _ = _token_lists(t[text_col])
        if len(flat) == 0:
            return pa.table(
                {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        g = (
            pa.table({"word": flat})
            .group_by("word", use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["word", "n"])

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )


# ---------------------------------------------------------------------------
# driver-side merge loop (vocabulary-sized input, standard algorithm)
# ---------------------------------------------------------------------------


def bpe_from_word_counts(
    words: list[str], counts: list[int] | np.ndarray, num_merges: int
) -> list[tuple[str, str]]:
    """Classic greedy BPE over a word-frequency dict. Deterministic:
    ties broken by lexicographic (left, right). Returns ≤ num_merges
    (left, right) merge pairs in rank order; stops early when no pair
    occurs twice. Words are symbol sequences of their characters plus a
    terminal ``</w>`` marker (Sennrich et al. 2016 formulation)."""
    seqs = [tuple(w) + (END,) for w in words]
    cnt = [int(c) for c in counts]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for s, c in zip(seqs, cnt):
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        top_n = max(pair_counts.values())
        if top_n < 2:
            break
        best_pair = min(p for p, n in pair_counts.items() if n == top_n)
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        new_seqs = []
        for s in seqs:
            if a not in s:
                new_seqs.append(s)
                continue
            out = []
            i = 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new_seqs.append(tuple(out))
        seqs = new_seqs
    return merges


def train_bpe(
    ds, text_col: str, num_merges: int = 200, max_vocab: int = 1_000_000,
):
    """Train BPE on a corpus: distributed word count → driver-side greedy
    merge loop. Returns a pyarrow Table (rank, left, right, merged) in
    merge order, plus a ``dropped_words`` count in the table metadata when
    the word table exceeded ``max_vocab`` (the top-``max_vocab`` words by
    (count desc, word asc) are kept — never silently)."""
    wc = word_counts(ds, text_col).materialize()  # ONE corpus-sized pass
    n_vocab = wc.count()
    if n_vocab == 0:
        # empty corpus: the aggregate emits only schema-less empty blocks
        # (the documented Ray 2.49 hazard) — return an empty merges table
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "left": pa.array([], pa.string()),
                "right": pa.array([], pa.string()),
                "merged": pa.array([], pa.string()),
            }
        ).replace_schema_metadata({"dropped_words": "0"})
    dropped = 0
    if n_vocab > max_vocab:
        dropped = n_vocab - max_vocab
        wc = wc.sort(["n", "word"], descending=[True, False]).limit(max_vocab)
    pdf = wc.to_pandas()
    # deterministic driver-side order (input partitioning must not matter)
    pdf = pdf.sort_values(["n", "word"], ascending=[False, True]).reset_index(
        drop=True
    )
    merges = bpe_from_word_counts(
        pdf["word"].tolist(), pdf["n"].to_numpy(), num_merges
    )
    t = pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([a for a, _ in merges], pa.string()),
            "right": pa.array([b for _, b in merges], pa.string()),
            "merged": pa.array([a + b for a, b in merges], pa.string()),
        }
    )
    return t.replace_schema_metadata({"dropped_words": str(dropped)})


# ---------------------------------------------------------------------------
# actor-pool encoder (merges load once per actor; unique-word memoization)
# ---------------------------------------------------------------------------


class BPEEncoder:
    """map_batches actor: applies a trained merge table to count BPE tokens
    per row. Merge ranks parse once in ``__init__``; encoded words are
    cached across batches (word repetition makes the amortized per-token
    cost O(1)). Output: (id, n_words, n_bpe_tokens)."""

    def __init__(self, merges_ref, id_col: str, text_col: str):
        import ray

        t = ray.get(merges_ref) if not isinstance(merges_ref, pa.Table) else merges_ref
        self.ranks = {
            (l, r): i
            for i, (l, r) in enumerate(
                zip(t["left"].to_pylist(), t["right"].to_pylist())
            )
        }
        self.id_col = id_col
        self.text_col = text_col
        self.cache: dict[str, int] = {}

    def _encode_len(self, w: str) -> int:
        hit = self.cache.get(w)
        if hit is not None:
            return hit
        s = list(w) + [END]
        ranks = self.ranks
        while len(s) > 1:
            best_i, best_rank = -1, None
            for i in range(len(s) - 1):
                rk = ranks.get((s[i], s[i + 1]))
                if rk is not None and (best_rank is None or rk < best_rank):
                    best_i, best_rank = i, rk
            if best_rank is None:
                break
            s[best_i : best_i + 2] = [s[best_i] + s[best_i + 1]]
        n = len(s)
        self.cache[w] = n
        return n

    def __call__(self, t: pa.Table) -> pa.Table:
        from .corpus import _token_lists

        flat, ntok = _token_lists(t[self.text_col])
        if len(flat) == 0:
            return pa.table(
                {
                    self.id_col: t[self.id_col],
                    "n_words": pa.array(np.zeros(len(t), np.int64)),
                    "n_bpe_tokens": pa.array(np.zeros(len(t), np.int64)),
                }
            )
        uniq = pc.unique(flat)
        lens = np.fromiter(
            (self._encode_len(w) for w in uniq.to_pylist()),
            np.int64,
            count=len(uniq),
        )
        codes = pc.index_in(flat, uniq).to_numpy(zero_copy_only=False)
        per_tok = lens[codes]
        seg = np.repeat(np.arange(len(ntok), dtype=np.int64), ntok)
        sums = np.bincount(seg, weights=per_tok, minlength=len(ntok)).astype(
            np.int64
        )
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "n_words": pa.array(ntok, pa.int64()),
                "n_bpe_tokens": pa.array(sums, pa.int64()),
            }
        )


def bpe_token_counts(
    ds, text_col: str, id_col: str, merges: pa.Table, concurrency=(1, 4),
):
    """Count BPE tokens per row with a trained merge table (actor pool;
    merges broadcast once via ray.put, parsed once per actor)."""
    import ray

    ref = ray.put(merges)
    return ds.map_batches(
        BPEEncoder,
        fn_constructor_kwargs={
            "merges_ref": ref, "id_col": id_col, "text_col": text_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
