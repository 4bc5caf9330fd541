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


def test_repetition_stats_hand_computed(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "a a a b",        # 4 toks, 2 distinct; bigrams: aa aa ab -> top 2/3
                    "x y z",          # all distinct; bigrams xy yz -> top 1/2
                    "",               # empty
                    None,             # null == empty
                ],
            }
        )
    )
    out = (
        corpus.repetition_stats(ds, "text", "doc_id")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out.n_tokens) == [4, 3, 0, 0]
    assert out.dup_word_frac.tolist() == pytest.approx([0.5, 0.0, 0.0, 0.0])
    assert out.top_bigram_frac.tolist() == pytest.approx([2 / 3, 0.5, 0.0, 0.0])


def test_decontaminate_counts_occurrences(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "p q r s t u p q r s t",  # "p q r s t" twice (positions 0 and rolled)
                    "no overlap at all here now",
                    "p q r s t",
                ],
            }
        )
    )
    out = (
        corpus.decontaminate(ds, "text", "doc_id", ["p q r s t"], n=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # doc1 windows: 7 of them; "p q r s t" occurs at window 0 and window 6? no —
    # tokens p q r s t u p q r s t: window starting at idx 6 is "p q r s t" -> 2 hits
    assert list(out.n_contaminated) == [2, 0, 1]
    assert list(out.contaminated) == [True, False, True]


def test_stratified_sample_partitioning_invariant(ray_session):
    import ray.data as rd

    from splink_ray.stages.sampling import stratified_sample

    t = pa.table(
        {
            "k": list(range(2000)),
            "s": ["a" if i % 3 == 0 else "b" for i in range(2000)],
        }
    )
    kept = []
    for nparts in (1, 7):
        ds = rd.from_arrow(t).repartition(nparts)
        out = stratified_sample(
            ds, "k", rates={"a": 0.8}, strata_col="s", default_rate=0.2
        ).to_pandas()
        kept.append(sorted(out.k))
    assert kept[0] == kept[1]  # same rows at any partitioning
    a = sum(1 for k in kept[0] if k % 3 == 0)
    b = len(kept[0]) - a
    # rates hold approximately (667 'a' rows, 1333 'b' rows)
    assert abs(a / 667 - 0.8) < 0.08 and abs(b / 1333 - 0.2) < 0.08


def test_top_distinctive_terms_global_df(ray_session):
    import ray.data as rd

    docs = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "apple apple banana common",
                "banana common",
                "common common cherry",
            ],
        }
    )
    # global df: apple 1, banana 2, common 3, cherry 1
    for nparts in (1, 3):  # df must be global, not per-batch
        out = (
            corpus.top_distinctive_terms(
                rd.from_arrow(docs).repartition(nparts), "text", "doc_id", k=2
            )
            .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
        )
        got = list(zip(out.doc_id, out.term, out.tf, out.df, out["rank"]))
        assert got == [
            (1, "apple", 2, 1, 1),   # tf 2 wins
            (1, "banana", 1, 2, 2),  # tie tf=1: df 2 < 3 beats common
            (2, "banana", 1, 2, 1),
            (2, "common", 1, 3, 2),
            (3, "common", 2, 3, 1),
            (3, "cherry", 1, 1, 2),
        ], f"nparts={nparts}"


def test_top_distinctive_terms_join_fallback_matches_broadcast(ray_session):
    """broadcast_threshold=0 forces the huge-vocab ds.join path; a synthetic
    high-cardinality vocabulary (unique tokens per doc + shared ties) must
    produce byte-identical rankings to the broadcast path."""
    import ray.data as rd

    rows = []
    for i in range(60):
        uniq = " ".join(f"tok{i}_{j}" for j in range(5))  # 300 distinct terms
        rows.append((i, f"{uniq} shared{i % 7} shared{i % 7} common"))
    docs = pa.table(
        {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
    )
    for nparts in (1, 5):
        ds = rd.from_arrow(docs).repartition(nparts)
        bc = (
            corpus.top_distinctive_terms(ds, "text", "doc_id", k=3)
            .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
        )
        jn = (
            corpus.top_distinctive_terms(
                ds, "text", "doc_id", k=3, broadcast_threshold=0
            )
            .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
        )
        assert list(bc.columns) == list(jn.columns)
        assert bc.equals(jn), f"nparts={nparts}"


def test_dup_span_stats_hand_computed(ray_session):
    import ray.data as rd

    # docs 1 & 2 share the 3-gram "a b c"; doc 3 is disjoint; doc 4 too short
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["a b c d", "x a b c", "p q r s", "u v"],
            }
        )
    )
    out = (
        corpus.dup_span_stats(ds, "text", "doc_id", n=3, num_buckets=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.n_spans.tolist() == [2, 2, 2, 0]
    assert out.n_shared.tolist() == [1, 1, 0, 0]
    assert out.dup_frac.tolist() == [0.5, 0.5, 0.0, 0.0]


def test_dup_span_stats_counts_distinct_not_positional(ray_session):
    import ray.data as rd

    # "a b a b a b": positional 2-grams = 5, DISTINCT = {"a b", "b a"} = 2
    ds = rd.from_arrow(
        pa.table({"doc_id": [1, 2], "text": ["a b a b a b", "b a x"]})
    )
    out = (
        corpus.dup_span_stats(ds, "text", "doc_id", n=2, num_buckets=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.n_spans.tolist() == [2, 2]  # distinct grams per doc
    assert out.n_shared.tolist() == [1, 1]  # "b a" shared


def test_pmi_collocations_hand_computed(ray_session):
    import math

    import ray.data as rd

    from splink_ray.stages.corpus import pmi_collocations

    # "a b" occurs 3x; unigrams: a=3, b=4, c=2; T=9, B=6
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b c", "a b c b", "a b"], pa.string()),
        }
    )
    out = pmi_collocations(rd.from_arrow(docs), "text", k=10, min_count=2)
    row = out[out["gram"] == "a b"].iloc[0]
    expect = round(math.log((3 / 6) / ((3 / 9) * (4 / 9))), 6)
    assert row["n"] == 3
    assert abs(row["pmi"] - expect) < 1e-9
    # min_count guard: "b c" occurs 2x (kept), "c b"/"c a" occur <2 (dropped)
    assert set(out["gram"]) == {"a b", "b c"}
    # ordering: pmi desc, gram asc
    assert list(out["pmi"]) == sorted(out["pmi"], reverse=True)


def test_unigram_logprob_hand_computed(ray_session):
    import math

    import ray.data as rd

    from splink_ray.stages.corpus import unigram_logprob

    # corpus: a a b -> c(a)=2, c(b)=1, T=3
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a a", "b"], pa.string()),
        }
    )
    for thresh in (10**6, 0):  # broadcast path, then ds.join path
        out = (
            unigram_logprob(rd.from_arrow(docs), "text", "doc_id", broadcast_threshold=thresh)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(out["n_tokens"]) == [2, 1]
        assert abs(out["logprob"][0] - round(math.log(2 / 3), 6)) < 1e-9
        assert abs(out["logprob"][1] - round(math.log(1 / 3), 6)) < 1e-9


def test_bigram_logprob_hand_computed(ray_session):
    import math

    import ray.data as rd

    from splink_ray.stages.corpus import bigram_logprob

    # corpus: "a b a b" + "b a" -> bigrams: (a b)x2, (b a)x2
    # c1(a)=2, c1(b)=2, V=3 (a, b, solo), alpha=0.1
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b a b", "b a", "solo"], pa.string()),
        }
    )
    lp_ab = math.log((2 + 0.1) / (2 + 0.1 * 3))  # V=3: a, b, solo
    lp_ba = math.log((2 + 0.1) / (2 + 0.1 * 3))
    for thresh in (10**6, 0):  # broadcast path, then shuffle_join path
        out = (
            bigram_logprob(
                rd.from_arrow(docs), "text", "doc_id", broadcast_threshold=thresh
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # doc 2 has one token -> no bigrams -> dropped
        assert list(out["doc_id"]) == [0, 1]
        assert list(out["n_bigrams"]) == [3, 1]
        exp0 = round((2 * lp_ab + lp_ba) / 3, 6)
        exp1 = round(lp_ba, 6)
        assert abs(out["logprob"][0] - exp0) < 1e-6
        assert abs(out["logprob"][1] - exp1) < 1e-6


def test_bigram_logprob_paths_agree(ray_session):
    import pandas as pd
    import ray.data as rd

    from splink_ray.stages.corpus import bigram_logprob

    rng = np.random.default_rng(7)
    words = np.array(["alpha", "beta", "gamma", "delta", "eps"])
    texts = [
        " ".join(rng.choice(words, size=rng.integers(1, 12)).tolist())
        for _ in range(40)
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = rd.from_arrow(docs).repartition(5)
    a = (
        bigram_logprob(ds, "text", "doc_id")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        bigram_logprob(ds, "text", "doc_id", broadcast_threshold=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_split_sentences_indices_stable(ray_session):
    import ray.data as rd

    from splink_ray.stages.corpus import split_sentences

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["Hi there. Bye! ", "One? Two. "], pa.string()),
        }
    )
    out = (
        split_sentences(rd.from_arrow(docs), "text", "doc_id")
        .to_pandas()
        .sort_values(["doc_id", "sent_idx"])
        .reset_index(drop=True)
    )
    # trailing "! " / ". " produce an empty final part: dropped, idx stable
    assert list(out["sentence"]) == ["Hi there", "Bye", "One", "Two"]
    assert list(out["sent_idx"]) == [0, 1, 0, 1]
    assert list(out["n_chars"]) == [8, 3, 3, 3]


def test_remove_dup_spans_keeper_semantics(ray_session):
    import ray.data as rd

    from splink_ray.stages.corpus import remove_dup_spans

    shared = "one two three four five"
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    f"alpha {shared} beta",      # keeper (min doc_id)
                    f"gamma {shared} delta",     # span removed
                    "unrelated text entirely here now",  # untouched
                ],
                pa.string(),
            ),
        }
    )
    out = (
        remove_dup_spans(rd.from_arrow(docs).repartition(3), "text", "doc_id", n=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["clean_text"][0] == f"alpha {shared} beta"  # keeper untouched
    assert out["clean_text"][1] == "gamma delta"
    assert out["n_tokens_removed"][1] == 5
    assert out["clean_text"][2] == "unrelated text entirely here now"
    assert out["n_tokens_removed"].tolist() == [0, 5, 0]


def test_remove_dup_spans_overlapping_coverage(ray_session):
    """Two overlapping shared 5-grams cover a 6-token span: removed once."""
    import ray.data as rd

    from splink_ray.stages.corpus import remove_dup_spans

    span6 = "a b c d e f"  # contains two 5-grams: a..e and b..f
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([f"{span6} tail", f"head {span6}"], pa.string()),
        }
    )
    out = (
        remove_dup_spans(rd.from_arrow(docs), "text", "doc_id", n=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["clean_text"][0] == f"{span6} tail"
    assert out["clean_text"][1] == "head"
    assert out["n_tokens_removed"].tolist() == [0, 6]


def test_remove_dup_spans_partitioning_invariant(ray_session):
    import pandas as pd
    import ray.data as rd

    from splink_ray.stages.corpus import remove_dup_spans

    shared = "p q r s t"
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": pa.array(
                [f"d{i} {shared} tail{i % 2}" for i in range(5)] + ["solo text"],
                pa.string(),
            ),
        }
    )
    outs = []
    for nb, parts in ((2, 1), (7, 4)):
        outs.append(
            remove_dup_spans(
                rd.from_arrow(docs).repartition(parts), "text", "doc_id",
                n=5, num_buckets=nb,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # keeper (doc 0) intact. Doc 1 only shares "p q r s t" (it IS the keeper
    # of "q r s t tail1") -> 5 removed; docs 2-4 also share their
    # "q r s t tailX" gram with an earlier keeper -> overlapping coverage of
    # 6 tokens; the solo doc is untouched.
    assert outs[0]["n_tokens_removed"].tolist() == [0, 5, 6, 6, 6, 0]
