"""Corpus-preparation operators (stages/corpus.py): chunking semantics,
n-gram counts, normalization, and the composed cleaning pipeline."""

import numpy as np
import pyarrow as pa
import pytest

from splink_ray.stages import corpus


def test_normalize_text():
    out = corpus.normalize_text(["  Hello\t WORLD \n", "a  b", None, ""]).to_pylist()
    assert out == ["hello world", "a b", None, ""]  # null propagates (SQL parity)


def test_chunk_documents_windows(ray_session):
    import ray.data as rd

    words = [f"w{i}" for i in range(10)]
    ds = rd.from_arrow(
        pa.table({"doc_id": [1, 2], "text": [" ".join(words), ""]})
    )
    out = (
        corpus.chunk_documents(ds, "text", "doc_id", chunk_tokens=4, overlap=1)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    d1 = out[out.doc_id == 1]
    # stride 3: starts 0,3,6,9 → windows [0:4],[3:7],[6:10],[9:10]
    assert list(d1.chunk_text) == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9", "w9",
    ]
    assert list(d1.n_tokens) == [4, 4, 4, 1]
    # empty doc still emits one (empty) chunk
    d2 = out[out.doc_id == 2]
    assert len(d2) == 1 and d2.iloc[0].chunk_text == "" and d2.iloc[0].n_tokens == 0


def test_top_k_ngrams_counts_and_ties(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"text": ["a b c a b", "a b x", "z z z"]})
    )
    out = corpus.top_k_ngrams(ds, "text", n=2, k=3)
    # bigrams: 'a b'×3, 'z z'×2, then ties at 1 broken lexicographically
    assert list(out.ngram[:2]) == ["a b", "z z"]
    assert list(out.n[:2]) == [3, 2]
    assert out.ngram[2] == "b c"  # first 1-count bigram lexicographically


def test_clean_corpus_pipeline(ray_session):
    import ray.data as rd

    rows = {
        1: "The cat and the dog sat in the house for hours",   # en, kept
        2: "the  CAT and the dog sat in the house for hours",  # normalizes to dup of 1? (case+ws)
        3: "der hund und die katze ist nicht hier mit uns",    # de → filtered
        4: "too short",                                        # < 5 tokens
        5: "the and of to in is that it for was good words",   # en, kept
    }
    # row 2 normalizes to the same string as row 1 → exact-dup removed
    rows[2] = rows[1].upper().replace(" ", "  ")
    ds = rd.from_arrow(
        pa.table({"doc_id": list(rows), "text": list(rows.values())})
    )
    out = corpus.clean_corpus(ds, "text", "doc_id", min_tokens=5, languages=("en",))
    got = sorted(out.to_pandas().doc_id)
    assert got == [1, 5]


def test_embedding_dedup_groups_transitive(ray_session):
    import ray.data as rd

    from splink_ray.stages.dedup import embedding_dedup_groups

    # a≈b, b≈c (chain at 25° steps: cos 25° ≈ 0.906 ≥ t, cos 50° ≈ 0.64 < t)
    # → transitive closure puts {1,2,3} in one group; d orthogonal
    def at(theta):
        return [float(np.cos(theta)), float(np.sin(theta)), 0.0, 0.0]

    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": [1, 2, 3, 4],
                "embedding": [
                    at(0.0), at(np.deg2rad(25)), at(np.deg2rad(50)),
                    [0.0, 0.0, 1.0, 0.0],
                ],
            }
        )
    )
    out = embedding_dedup_groups(ds, "embedding", "vec_id", threshold=0.85, brute=True)
    m = dict(zip(*(out.to_pandas()[c] for c in ("vec_id", "dup_group_id"))))
    assert m[1] == m[2] == m[3] == 1
    assert m[4] == 4


def test_scrub_pii_batch_redacts_and_counts():
    texts = [
        "mail a.b-c%d@foo.co.uk or 10.0.0.1 ssn 123-45-6789 call 555-123-4567",
        "no pii here",
        None,
        "two mails: x@y.io y@z.org; ip 999.1.2.3",
    ]
    scrubbed, cnts = corpus.scrub_pii_batch(pa.array(texts))
    got = scrubbed.to_pylist()
    assert got[0] == "mail <EMAIL> or <IP> ssn <SSN> call <PHONE>"
    assert got[1] == "no pii here"
    assert got[2] is None
    assert got[3] == "two mails: <EMAIL> <EMAIL>; ip <IP>"  # RE2 \d{1,3} matches 999
    assert cnts["n_email"].to_pylist() == [1, 0, None, 2]
    assert cnts["n_ip"].to_pylist() == [1, 0, None, 1]
    assert cnts["n_ssn"].to_pylist() == [1, 0, None, 0]
    assert cnts["n_phone"].to_pylist() == [1, 0, None, 0]


def test_scrub_pii_matches_duckdb(ray_session):
    """Engine-vs-oracle parity on awkward strings (overlaps, boundaries)."""
    import duckdb
    import ray.data as rd

    texts = [
        "a@b.io 1.2.3.4 111-22-3333 222-333-4444",
        "phone-ish 123-456-78901 (5 trailing digits: no \\b match)",
        "dot sep 123.456.7890 and space sep 123 456 7890",
        "edge@case.museum.",
        "ip at end 8.8.8.8",
    ]
    ds = rd.from_arrow(pa.table({"i": list(range(len(texts))), "t": texts}))
    out = corpus.scrub_pii(ds, "t").to_pandas().sort_values("i").reset_index(drop=True)

    scrub = "t"
    for _, pat, repl in corpus.PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{repl}', 'g')"
    counts = ", ".join(
        f"len(regexp_extract_all(t, '{pat}')) AS n_{name}"
        for name, pat, _ in corpus.PII_PATTERNS
    )
    con = duckdb.connect()
    con.register("src", pa.table({"i": list(range(len(texts))), "t": texts}))
    exp = con.execute(
        f"SELECT i, {scrub} AS t_scrubbed, {counts} FROM src ORDER BY i"
    ).df()
    for col in ("t_scrubbed", "n_email", "n_ip", "n_ssn", "n_phone"):
        assert list(out[col]) == list(exp[col]), col
