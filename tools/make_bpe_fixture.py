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


if __name__ == "__main__":
    main()
