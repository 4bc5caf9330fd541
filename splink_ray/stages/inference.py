"""Batched model inference as an actor-pool stage.

The brief's "stateful stages are actor pools" shape for model scoring:
setup (model load) happens ONCE per actor in ``__init__``; ``__call__``
embeds a whole Arrow batch vectorized. The container ships no ML runtime,
so the default "model" is a deterministic stand-in — a fixed-seed random
projection over a byte-histogram featurization — with the load/embed hooks
(`_load_model` / `_embed`) as the documented plug-in point for a real
encoder. Everything around the model (actor signature, batch sizing,
zero-copy featurization, list<float32> output schema, ANN hand-off) is
real and tested.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def train_hashed_trigram_encoder(
    path: str, vocab: int = 4096, dim: int = 64, seed: int = 7
) -> str:
    """Build and persist a REAL loadable encoder artifact: a hashed
    character-trigram projection matrix (``vocab`` hash buckets × ``dim``),
    written as parquet with the hyperparameters in file metadata. The rows
    are a fixed-seed Gaussian basis — a random projection preserves cosine
    geometry (Johnson–Lindenstrauss), so nearest-neighbour structure over
    the trigram profile survives. The artifact is what the
    ``TextEmbedder._load_model`` plug-in contract needs to exercise:
    nontrivial per-actor state (vocab·dim·4 bytes) loaded from disk once
    per actor, never per batch."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    w = rng.standard_normal((vocab, dim)).astype(np.float32)
    flat = pa.array(w.reshape(-1), pa.float32())
    offsets = pa.array(np.arange(0, (vocab + 1) * dim, dim, dtype=np.int32))
    tbl = pa.table({"w": pa.ListArray.from_arrays(offsets, flat)})
    tbl = tbl.replace_schema_metadata(
        {b"vocab": str(vocab).encode(), b"dim": str(dim).encode(),
         b"ngram": b"3"}
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(tbl, path)
    return path


class TextEmbedder:
    """Callable class for ``ds.map_batches(TextEmbedder, concurrency=N,
    batch_size=B, fn_constructor_kwargs=...)``: adds ``out_col`` =
    list<float32> L2-normalised embedding of ``text_col``.

    Two encoders behind one actor contract:

    - ``model_path=None`` (default): the in-code stand-in — fixed-seed
      projection over a byte histogram; no disk artifact.
    - ``model_path=<parquet>``: a real persisted encoder from
      :func:`train_hashed_trigram_encoder` — hashed char-trigram counts
      projected through the on-disk matrix. The artifact is read from disk
      exactly once per actor in ``__init__`` (``load_log`` records each
      load for the load-once-per-actor test)."""

    def __init__(
        self, text_col: str = "text", out_col: str = "embedding",
        dim: int = 64, seed: int = 7, model_path: str | None = None,
        load_log: str | None = None,
    ):
        self.text_col = text_col
        self.out_col = out_col
        self.model_path = model_path
        if model_path is not None:
            self._proj, self.vocab, self.ngram = self._load_artifact(model_path)
            self.dim = self._proj.shape[1]
        else:
            self.dim = dim
            self.vocab, self.ngram = 256, None
            self._proj = self._load_model(dim, seed)  # once per actor
        if load_log:  # test hook: one line per model load (== per actor)
            with open(load_log, "a") as f:
                f.write(f"{os.getpid()}\n")

    @staticmethod
    def _load_model(dim: int, seed: int) -> np.ndarray:
        """The model-load hook. Stand-in: a fixed-seed projection matrix.
        A real deployment returns a loaded encoder here instead."""
        rng = np.random.default_rng(seed)
        return rng.standard_normal((256, dim)).astype(np.float32)

    @staticmethod
    def _load_artifact(path: str) -> tuple[np.ndarray, int, int]:
        """Real model load: read the persisted projection matrix + its
        hyperparameters from the parquet artifact."""
        import pyarrow.parquet as pq

        tbl = pq.read_table(path)
        meta = tbl.schema.metadata or {}
        vocab = int(meta.get(b"vocab", b"4096"))
        ngram = int(meta.get(b"ngram", b"3"))
        lists = tbl["w"].combine_chunks()
        flat = lists.flatten().to_numpy(zero_copy_only=False)
        w = np.asarray(flat, np.float32).reshape(vocab, -1)
        return w, vocab, ngram

    @staticmethod
    def _string_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        """(byte data, per-row offsets) zero-copy over the Arrow buffers."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        import pyarrow.compute as pc

        arr = pc.fill_null(arr, "")
        buf_off, buf_data = arr.buffers()[1], arr.buffers()[2]
        offsets = np.frombuffer(buf_off, np.int32, len(arr) + 1, arr.offset * 4)
        data = np.frombuffer(buf_data, np.uint8, offsets[-1]) if buf_data else np.empty(0, np.uint8)
        return data, offsets

    def _featurize(self, arr: pa.Array) -> np.ndarray:
        """Per-text byte histogram (n, 256) — zero-copy over the Arrow
        string buffers, one ``np.add.at`` scatter, no per-row Python."""
        data, offsets = self._string_bytes(arr)
        n = len(offsets) - 1
        lens = np.diff(offsets).astype(np.int64)
        seg = np.repeat(np.arange(n, dtype=np.int64), lens)
        hist = np.zeros(n * 256, np.float32)
        np.add.at(hist, seg * 256 + data[offsets[0] :][: int(lens.sum())], 1.0)
        return hist.reshape(n, 256)

    def _featurize_trigrams(self, arr: pa.Array) -> np.ndarray:
        """Hashed char-``ngram`` counts (n, vocab) — rolling byte windows
        bucketed by a Knuth multiplicative hash, fully vectorized."""
        data, offsets = self._string_bytes(arr)
        n = len(offsets) - 1
        lens = np.diff(offsets).astype(np.int64)
        g = self.ngram
        counts = np.maximum(lens - g + 1, 0)
        # offsets index ``data`` ABSOLUTELY (frombuffer starts at byte 0), so
        # doc starts must stay absolute — subtracting offsets[0] here broke
        # any array whose slice offset left offsets[0] != 0
        doc_starts = offsets[:-1].astype(np.int64)
        within = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
        )
        starts = np.repeat(doc_starts, counts) + within
        code = np.zeros(len(starts), np.uint64)
        for j in range(g):
            code = code * np.uint64(257) + data[starts + j].astype(np.uint64)
        bucket = ((code * np.uint64(2654435761)) % np.uint64(2**32)) % np.uint64(
            self.vocab
        )
        seg = np.repeat(np.arange(n, dtype=np.int64), counts)
        hist = np.zeros(n * self.vocab, np.float32)
        np.add.at(hist, seg * self.vocab + bucket.astype(np.int64), 1.0)
        return hist.reshape(n, self.vocab)

    def _embed(self, feats: np.ndarray) -> np.ndarray:
        """The inference hook. Stand-in: matmul + L2 norm. A real encoder
        runs its batched forward pass here."""
        v = feats.astype(np.float64) @ self._proj.astype(np.float64)
        norms = np.linalg.norm(v, axis=1, keepdims=True)
        v = v / np.maximum(norms, 1e-12)
        # 6-decimal rounding (repo convention) sits far above BLAS blocking
        # noise (~1e-8 between batch sizes), so output is batch-invariant
        return np.round(v, 6).astype(np.float32)

    def __call__(self, t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column(
                self.out_col, pa.array([], pa.list_(pa.float32()))
            )
        feats = (
            self._featurize_trigrams(t[self.text_col])
            if self.model_path is not None
            else self._featurize(t[self.text_col])
        )
        vecs = self._embed(feats)
        flat = pa.array(vecs.reshape(-1), pa.float32())
        offsets = pa.array(
            np.arange(0, (len(t) + 1) * self.dim, self.dim, dtype=np.int32)
        )
        return t.append_column(
            self.out_col, pa.ListArray.from_arrays(offsets, flat)
        )


def embed_text(
    ds, text_col: str = "text", out_col: str = "embedding",
    dim: int = 64, seed: int = 7, concurrency: int | None = None,
    batch_size: int = 1024, model_path: str | None = None,
    load_log: str | None = None,
):
    """Embed a text column with the actor-pool inference stage. Sized for
    model inference: bounded ``batch_size`` (activation memory) and an
    explicit actor ``concurrency`` (model replicas) rather than a task pool
    re-loading the model per task."""
    from .exchange import default_parallelism

    if concurrency is None:
        concurrency = max(2, default_parallelism() // 4)
    return ds.map_batches(
        TextEmbedder,
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
        fn_constructor_kwargs={
            "text_col": text_col, "out_col": out_col, "dim": dim, "seed": seed,
            "model_path": model_path, "load_log": load_log,
        },
    )
