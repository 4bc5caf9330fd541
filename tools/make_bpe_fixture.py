"""Generate the committed BPE-merges oracle fixture for sf0.01.

ENGINE-INDEPENDENT on purpose: word counts come from DuckDB SQL and the
merge loop is the dict-formulation reference implementation (same one
tests/test_bpe.py::test_bpe_pure_reference_agreement holds against the
engine) — so the fixture pins the driver oracle without circularity.

Usage: python tools/make_bpe_fixture.py [sf_dir] [num_merges]
Writes fixtures/bpe_merges_sf001.parquet.
"""

import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

END = "</w>"


def ref_bpe(vocab: dict, n: int):
    vocab = {tuple(w) + (END,): c for w, c in vocab.items()}
    out = []
    for _ in range(n):
        pairs = {}
        for s, c in vocab.items():
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] = pairs.get((s[i], s[i + 1]), 0) + c
        if not pairs:
            break
        m = max(pairs.values())
        if m < 2:
            break
        p = min(k for k, v in pairs.items() if v == m)
        out.append(p)
        nv = {}
        for s, c in vocab.items():
            r, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == p:
                    r.append(s[i] + s[i + 1])
                    i += 2
                else:
                    r.append(s[i])
                    i += 1
            nv[tuple(r)] = nv.get(tuple(r), 0) + c
        vocab = nv
    return out


def ref_encode_len(word: str, ranks: dict) -> int:
    """Standard BPE application: repeatedly merge the lowest-rank adjacent
    pair until none applies; return the symbol count."""
    s = list(word) + [END]
    while len(s) > 1:
        best_i, best_rank = -1, None
        for i in range(len(s) - 1):
            rk = ranks.get((s[i], s[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_i, best_rank = i, rk
        if best_rank is None:
            break
        s[best_i : best_i + 2] = [s[best_i] + s[best_i + 1]]
    return len(s)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    num_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    wc = duckdb.sql(
        "SELECT tok AS word, count(*) AS n FROM (SELECT unnest(str_split("
        f"text, ' ')) AS tok FROM read_parquet('{sf_dir}/documents.parquet')) "
        "WHERE length(tok) > 0 GROUP BY tok"
    ).df()
    merges = ref_bpe(dict(zip(wc["word"], wc["n"])), num_merges)
    t = pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([a for a, _ in merges], pa.string()),
            "right": pa.array([b for _, b in merges], pa.string()),
            "merged": pa.array([a + b for a, b in merges], pa.string()),
        }
    )
    out = "fixtures/bpe_merges_sf001.parquet"
    pq.write_table(t, out)
    print(f"wrote {out}: {len(t)} merges")

    # per-doc BPE token counts under those merges (reference encoder)
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    docs = duckdb.sql(
        "SELECT doc_id, str_split(text, ' ') AS w FROM read_parquet("
        f"'{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).df()
    cache: dict[str, int] = {}
    ids, n_words, n_bpe = [], [], []
    for doc_id, words in zip(docs["doc_id"], docs["w"]):
        words = [w for w in words if w]
        total = 0
        for w in words:
            if w not in cache:
                cache[w] = ref_encode_len(w, ranks)
            total += cache[w]
        ids.append(int(doc_id))
        n_words.append(len(words))
        n_bpe.append(total)
    t2 = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
        }
    )
    out2 = "fixtures/bpe_token_counts_sf001.parquet"
    pq.write_table(t2, out2)
    print(f"wrote {out2}: {len(t2)} docs")


if __name__ == "__main__":
    main()
