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

import numpy as np
import pyarrow as pa


class TextEmbedder:
    """Callable class for ``ds.map_batches(TextEmbedder, concurrency=N,
    batch_size=B, fn_constructor_kwargs=...)``: adds ``out_col`` =
    list<float32> L2-normalised embedding of ``text_col``."""

    def __init__(
        self, text_col: str = "text", out_col: str = "embedding",
        dim: int = 64, seed: int = 7,
    ):
        self.text_col = text_col
        self.out_col = out_col
        self.dim = dim
        self._proj = self._load_model(dim, seed)  # once per actor

    @staticmethod
    def _load_model(dim: int, seed: int) -> np.ndarray:
        """The model-load hook. Stand-in: a fixed-seed projection matrix.
        A real deployment returns a loaded encoder here instead."""
        rng = np.random.default_rng(seed)
        return rng.standard_normal((256, dim)).astype(np.float32)

    def _featurize(self, arr: pa.Array) -> np.ndarray:
        """Per-text byte histogram (n, 256) — zero-copy over the Arrow
        string buffers, one ``np.add.at`` scatter, no per-row Python."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        import pyarrow.compute as pc

        arr = pc.fill_null(arr, "")
        buf_off, buf_data = arr.buffers()[1], arr.buffers()[2]
        offsets = np.frombuffer(buf_off, np.int32, len(arr) + 1, arr.offset * 4)
        data = np.frombuffer(buf_data, np.uint8, offsets[-1])
        n = len(arr)
        lens = np.diff(offsets).astype(np.int64)
        seg = np.repeat(np.arange(n, dtype=np.int64), lens)
        hist = np.zeros(n * 256, np.float32)
        np.add.at(hist, seg * 256 + data[offsets[0] :][: int(lens.sum())], 1.0)
        return hist.reshape(n, 256)

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
        vecs = self._embed(self._featurize(t[self.text_col]))
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
    batch_size: int = 1024,
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
        },
    )
