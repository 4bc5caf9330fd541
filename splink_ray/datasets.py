"""Deterministic synthetic datasets (transcripts + labels + golden clusters).

Reference analogue: ``splink/internals/datasets/__init__.py::splink_datasets``
(lazy-downloaded demo CSVs; /root/reference empty — SURVEY.md §0 / §2.1 S2).
No network here, so the bundled dataset is a seeded generator producing the
``BASELINE.json::input_hint`` transcript shape:

    (conv_id: string, turn_idx: int32, role: string, text: string,
     tool: string, ts: timestamp[us])

Generation model (FIXTURES.md F1): ``n_entities`` ground-truth conversations;
each emitted as 1–5 near-duplicate copies (conv_id = "c{entity:07d}-{copy}").
Copy 0 is the original; further copies get seeded perturbations — character
edits in non-first turns, timestamp jitter (minutes), tool add/drop,
occasional truncated tail — mild enough that planted clusters are recoverable
at F1≥0.99 with the flagship settings. Pure function of the seed: same
arguments ⇒ identical tables.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SYLLABLES = [
    "ka", "lo", "mi", "ta", "re", "su", "ne", "vo", "pa", "zi",
    "del", "mar", "ton", "ber", "lin", "qua", "fex", "gor", "hul", "jem",
]
_TOOLS = ["search", "python", "browser", "calculator", "files", "sql"]
_ROLES = ["user", "assistant"]


def _vocab(rng: np.random.Generator, size: int = 600) -> np.ndarray:
    syl = rng.integers(0, len(_SYLLABLES), size=(size, 3))
    return np.array(["".join(_SYLLABLES[j] for j in row) for row in syl])


def _edit(text: str, rng: np.random.Generator, n_edits: int) -> str:
    """Seeded character insert/delete/swap edits."""
    s = list(text)
    for _ in range(n_edits):
        if len(s) < 4:
            break
        op = rng.integers(0, 3)
        i = int(rng.integers(1, len(s) - 1))
        if op == 0:
            s.insert(i, chr(ord("a") + int(rng.integers(0, 26))))
        elif op == 1:
            del s[i]
        else:
            s[i], s[i - 1] = s[i - 1], s[i]
    return "".join(s)


def generate_transcripts(
    n_entities: int = 200,
    seed: int = 42,
    entities_per_day: int = 15,
    hard_copy_rate: float = 0.3,
) -> dict[str, pa.Table]:
    """→ {"transcripts", "labels", "expected_clusters"} Arrow tables.

    Every within-entity copy pair shares the ``ts_day`` blocking key by
    construction (midday base time, jitter < 4h), so blocking recall is 1.0
    for the flagship rule and the F1 gate measures model quality only.
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)
    n_days = max(1, n_entities // entities_per_day)
    base = np.datetime64("2025-03-01T12:00:00", "us")

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[np.datetime64] = []

    label_l: list[str] = []
    label_r: list[str] = []
    label_score: list[float] = []
    cluster_uid: list[str] = []
    cluster_id: list[str] = []
    entity_day: list[int] = []

    for e in range(n_entities):
        n_turns = int(rng.integers(2, 10))
        day = int(rng.integers(0, n_days))
        entity_day.append(day)
        ent_base = base + np.timedelta64(day, "D").astype("timedelta64[us]")
        # entity master turns
        turn_texts = []
        turn_roles = []
        turn_tools = []
        for t in range(n_turns):
            n_words = int(rng.integers(5, 18))
            words = vocab[rng.integers(0, len(vocab), n_words)]
            turn_texts.append(" ".join(words))
            turn_roles.append(_ROLES[t % 2])
            turn_tools.append(
                _TOOLS[int(rng.integers(0, len(_TOOLS)))] if rng.random() < 0.2 and t % 2 == 1 else ""
            )
        n_copies = int(rng.choice([1, 2, 2, 3, 3, 4, 5]))
        copy_ids = []
        for c in range(n_copies):
            cid = f"c{e:07d}-{c}"
            copy_ids.append(cid)
            hard = c > 0 and rng.random() < hard_copy_rate
            truncate = hard and n_turns > 3 and rng.random() < 0.25
            ct = n_turns - 1 if truncate else n_turns
            jitter_us = int(rng.integers(-180, 180)) * 60_000_000 if c > 0 else 0
            for t in range(ct):
                text = turn_texts[t]
                if hard and t > 0 and rng.random() < 0.4:
                    text = _edit(text, rng, int(rng.integers(1, 4)))
                tool = turn_tools[t]
                if hard and tool and rng.random() < 0.3:
                    tool = ""  # drop a tool
                conv_ids.append(cid)
                turn_idxs.append(t)
                roles.append(turn_roles[t])
                texts.append(text)
                tools.append(tool)
                tss.append(ent_base + np.timedelta64(jitter_us + t * 45_000_000, "us"))
        rep = min(copy_ids)
        for cid in copy_ids:
            cluster_uid.append(cid)
            cluster_id.append(rep)
        for i in range(len(copy_ids)):
            for j in range(i + 1, len(copy_ids)):
                label_l.append(copy_ids[i])
                label_r.append(copy_ids[j])
                label_score.append(1.0)

    # hard negatives: entity pairs sharing a day (same blocking key)
    by_day: dict[int, list[int]] = {}
    for e, d in enumerate(entity_day):
        by_day.setdefault(d, []).append(e)
    neg_rng = np.random.default_rng(seed + 1)
    for d, ents in sorted(by_day.items()):
        if len(ents) < 2:
            continue
        k = min(len(ents) - 1, 3)
        for _ in range(k):
            i, j = neg_rng.choice(len(ents), 2, replace=False)
            a, b = f"c{ents[i]:07d}-0", f"c{ents[j]:07d}-0"
            if a > b:
                a, b = b, a
            label_l.append(a)
            label_r.append(b)
            label_score.append(0.0)

    transcripts = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )
    labels = pa.table(
        {
            "unique_id_l": pa.array(label_l, pa.string()),
            "unique_id_r": pa.array(label_r, pa.string()),
            "clerical_match_score": pa.array(label_score, pa.float64()),
        }
    )
    clusters = pa.table(
        {
            "unique_id": pa.array(cluster_uid, pa.string()),
            "cluster_id": pa.array(cluster_id, pa.string()),
        }
    )
    return {"transcripts": transcripts, "labels": labels, "expected_clusters": clusters}


def write_transcript_fixture(out_dir: str, n_entities: int = 200, seed: int = 42) -> dict[str, str]:
    """Write the three tables as parquet under ``out_dir``; returns paths.

    Used by tests and bench; cached by (n_entities, seed) in the dir name by
    callers so repeated runs skip generation.
    """
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    tables = generate_transcripts(n_entities=n_entities, seed=seed)
    paths = {}
    for name, tbl in tables.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths


def transcripts_from_documents(sf_dir: str, copies_per_doc: int = 2) -> pa.Table:
    """Deterministically derive a transcripts-shaped table from the driver's
    read-only ``documents`` testdata (TESTDATA.md) — used by
    ``__ray_entry__.entry()`` so the flagship pipeline runs over driver data
    without external inputs.

    Each document is split into sentence-ish turns; each doc yields
    ``copies_per_doc`` near-duplicate conversations (copy 1 gets a token
    dropped from turn 1), so the linkage pipeline has real work to do.
    """
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    base = np.datetime64("2025-01-01T12:00:00", "us")
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    for doc_id, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        words = (text or "").split()
        if not words:
            words = ["empty"]
        # split into up to 6 turns of ~8 words
        turns = [" ".join(words[i : i + 8]) for i in range(0, min(len(words), 48), 8)]
        for c in range(copies_per_doc):
            cid = f"d{doc_id:07d}-{c}"
            for t, turn in enumerate(turns):
                if c > 0 and t == 1 and len(turn.split()) > 2:
                    turn = " ".join(turn.split()[:-1])  # deterministic edit
                conv_ids.append(cid)
                turn_idxs.append(t)
                roles.append(_ROLES[t % 2])
                texts.append(turn)
                tools.append("")
                tss.append(
                    base
                    + np.timedelta64(int(doc_id) % 365, "D").astype("timedelta64[us]")
                    + np.timedelta64(c * 7 + t, "m").astype("timedelta64[us]")
                )
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )


def generate_transcripts_fast(
    n_turns_target: int = 1_000_000,
    seed: int = 42,
    entities_per_day: int = 50,
) -> pa.Table:
    """Vectorized bench-scale transcript generator (numpy end to end).

    Same schema and linkage structure as :func:`generate_transcripts`
    (entities × near-duplicate copies sharing a ts_day blocking key; copy 0
    unperturbed, later copies get a deterministic suffix edit on non-first
    turns) but built from array ops so 10⁶+ turns generate in seconds.
    Deterministic: pure function of the arguments.
    """
    rng = np.random.default_rng(seed)
    avg_turns = 6.5
    avg_copies = 2.0
    n_entities = max(1, int(n_turns_target / (avg_turns * avg_copies)))

    vocab = _vocab(rng, 800)

    ent_turns = rng.integers(3, 11, n_entities)          # turns per entity
    ent_copies = rng.integers(1, 4, n_entities)          # copies per entity
    ent_day = rng.integers(0, max(1, n_entities // entities_per_day), n_entities)

    # one row per (entity, copy): entity/copy indices
    copy_ent = np.repeat(np.arange(n_entities), ent_copies)
    copy_idx = np.concatenate([np.arange(c) for c in ent_copies])
    copy_turns = ent_turns[copy_ent]

    # one row per turn
    turn_copy = np.repeat(np.arange(len(copy_ent)), copy_turns)
    turn_ent = copy_ent[turn_copy]
    turn_cidx = copy_idx[turn_copy]
    t_idx = np.concatenate([np.arange(c) for c in copy_turns]).astype(np.int32)
    n_rows = len(turn_ent)

    # entity-level per-turn word choices: derive 8 word ids per (entity, turn)
    # from a counter-based hash so all copies of an entity share base text.
    # murmur-style finalizer: without full 64-bit mixing, word ids depend on
    # the key only mod |vocab| and distinct entities collide on WHOLE turns
    # (~1/|vocab|), planting spurious matches
    def _mix(h: np.ndarray) -> np.ndarray:
        h = h.copy()
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)
        return h

    ent_turn_key = _mix(
        turn_ent.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        + t_idx.astype(np.uint64)
    )
    words = []
    for w in range(14):  # ~115-char turns — realistic transcript length
        h = _mix(ent_turn_key + np.uint64(w + 1)) % np.uint64(len(vocab))
        words.append(vocab[h.astype(np.int64)])
    text = words[0]
    for w in words[1:]:
        text = np.char.add(np.char.add(text, " "), w)

    # perturbation: later copies get a copy-specific suffix on ~40% of
    # non-first turns (changes the turn hash; first turn stays linkable)
    perturb = (turn_cidx > 0) & (t_idx > 0) & (
        ((ent_turn_key + turn_cidx.astype(np.uint64)) % np.uint64(5)) < 2
    )
    suffix = np.where(perturb, np.char.add(" zq", turn_cidx.astype(str)), "")
    text = np.char.add(text, suffix)

    conv_id = np.char.add(
        np.char.add("c", np.char.zfill(turn_ent.astype(str), 8)),
        np.char.add("-", turn_cidx.astype(str)),
    )
    role = np.where(t_idx % 2 == 0, "user", "assistant")
    tool_pool = np.array(_TOOLS)
    has_tool = (t_idx % 2 == 1) & ((ent_turn_key % np.uint64(7)) == 0)
    tool = np.where(has_tool, tool_pool[(ent_turn_key % np.uint64(len(_TOOLS))).astype(np.int64)], "")

    base = np.datetime64("2025-03-01T12:00:00", "us")
    jitter_min = ((ent_turn_key % np.uint64(240)).astype(np.int64) - 120) * (turn_cidx > 0)
    ts = (
        base
        + ent_day[turn_ent].astype("timedelta64[D]").astype("timedelta64[us]")
        + (jitter_min * 60_000_000).astype("timedelta64[us]")
        + (t_idx.astype(np.int64) * 45_000_000).astype("timedelta64[us]")
    )

    return pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(t_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
