"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as actor-pool ``map_batches``
stages with small batch sizes (large payloads → few rows per batch so a
batch × concurrency fits worker heap — task brief).

Codec status (``functions/codecs.py``):

- **REAL pure-numpy decode** for uncompressed formats: PPM/PGM (netpbm),
  24-bit BI_RGB BMP, 16-bit PCM WAV — plus real nearest-neighbour resize
  on the decoded pixels;
- compressed formats (JPEG/PNG/…) raise ``UnsupportedFormat`` naming the
  missing dependency (pillow) — ``strict=True`` surfaces it, the default
  path skips the row with nulls;
- the repo's synthetic header format (first 8 bytes = width/height
  uint32-LE, rest = pixel bytes) remains supported for fixtures.

Everything Ray-side — schema, batch sizing, actor signatures, output
layout, feature vectors usable by stages/ann.py — is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("meta", pa.string()),  # JSON sidecar metadata
    ]
)

FEATURE_DIM = 16


def synth_payload(media_id: int, width: int, height: int) -> bytes:
    """Deterministic synthetic 'image': 8-byte header + seeded pixel bytes."""
    rng = np.random.default_rng(media_id)
    header = int(width).to_bytes(4, "little") + int(height).to_bytes(4, "little")
    return header + rng.integers(0, 256, width * height, dtype=np.uint8).tobytes()


class ImageDecoder:
    """Actor: payload → (width, height, mean_pixel, format).

    PPM/PGM/BMP decode for real (pure numpy); the synthetic header format
    is parsed for fixtures; compressed formats raise under ``strict=True``
    and yield null dimensions otherwise."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions import codecs

        payloads = t["payload"].to_pylist()
        n = len(payloads)
        w = np.zeros(n, np.int32)
        h = np.zeros(n, np.int32)
        mean = np.zeros(n, np.float64)
        fmt = np.empty(n, dtype=object)
        for i, p in enumerate(payloads):
            if p is None or len(p) < 8:
                fmt[i] = "unknown"
                continue
            kind = codecs.sniff_format(p)
            fmt[i] = kind
            try:
                img = codecs.decode_image(p)
            except codecs.UnsupportedFormat:
                if self.strict:
                    raise
                continue
            if img is not None:
                h[i], w[i] = img.shape[0], img.shape[1]
                mean[i] = float(img.mean())
            else:  # synthetic fixture header
                w[i] = int.from_bytes(p[0:4], "little")
                h[i] = int.from_bytes(p[4:8], "little")
                body = np.frombuffer(p, np.uint8, offset=8)
                if len(body):
                    mean[i] = float(body.mean())
        return (
            t.append_column("width", pa.array(w))
            .append_column("height", pa.array(h))
            .append_column("mean_pixel", pa.array(mean))
            .append_column("format", pa.array(fmt, pa.string()))
        )


class ImageFeatureExtractor:
    """Actor: payload → fixed-dim byte-histogram feature vector
    (list<float>, FEATURE_DIM bins, L1-normalized) — feeds stages/ann.py."""

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        feats = np.zeros((len(payloads), FEATURE_DIM), np.float64)
        for i, p in enumerate(payloads):
            if p is None or len(p) <= 8:
                continue
            body = np.frombuffer(p, np.uint8, offset=8)
            hist, _ = np.histogram(body, bins=FEATURE_DIM, range=(0, 256))
            s = hist.sum()
            if s:
                feats[i] = hist / s
        return t.append_column(
            "features", pa.array(list(feats), pa.list_(pa.float64()))
        )


class ImageResizer:
    """Actor: REAL nearest-neighbour resize for decodable formats
    (PPM/PGM/BMP → resized PPM output); synthetic fixture payloads are
    cropped/padded; compressed formats raise under ``strict=True``."""

    def __init__(self, width: int, height: int, strict: bool = False):
        self.w, self.h = width, height
        self.strict = strict

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions import codecs

        payloads = t["payload"].to_pylist()
        out = []
        for p in payloads:
            if p is None or len(p) < 8:
                out.append(p)
                continue
            try:
                img = codecs.decode_image(p)
            except codecs.UnsupportedFormat:
                if self.strict:
                    raise
                out.append(p)
                continue
            if img is not None:
                out.append(codecs.encode_ppm(codecs.nn_resize(img, self.w, self.h)))
                continue
            body = p[8 : 8 + self.w * self.h]
            body = body.ljust(self.w * self.h, b"\x00")
            out.append(
                int(self.w).to_bytes(4, "little")
                + int(self.h).to_bytes(4, "little")
                + body
            )
        return t.set_column(
            t.column_names.index("payload"), "payload", pa.array(out, pa.binary())
        )


class AudioFeatureExtractor:
    """Actor: REAL audio features from PCM-16 WAV payloads (pure numpy
    decode): duration_s, rms, zero-crossing rate, sample_rate. Non-WAV
    payloads yield nulls (or raise under ``strict=True``)."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions import codecs

        payloads = t["payload"].to_pylist()
        n = len(payloads)
        dur = np.full(n, np.nan)
        rms = np.full(n, np.nan)
        zcr = np.full(n, np.nan)
        rate = np.zeros(n, np.int32)
        for i, p in enumerate(payloads):
            if p is None or codecs.sniff_format(p) != "wav":
                if self.strict:
                    raise codecs.UnsupportedFormat("payload is not PCM WAV")
                continue
            samples, sr = codecs.decode_wav(p)
            mono = samples.astype(np.float64).mean(axis=1)
            rate[i] = sr
            dur[i] = len(mono) / sr if sr else np.nan
            rms[i] = float(np.sqrt(np.mean(mono**2))) if len(mono) else np.nan
            if len(mono) > 1:
                zcr[i] = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        return (
            t.append_column("duration_s", pa.array(dur, pa.float64()))
            .append_column("rms", pa.array(rms, pa.float64()))
            .append_column("zero_crossing_rate", pa.array(zcr, pa.float64()))
            .append_column("sample_rate", pa.array(rate, pa.int32()))
        )


def extract_audio_features(ds, batch_size: int = 64, concurrency=None, strict: bool = False):
    if concurrency is None:
        concurrency = _pool()
    return ds.map_batches(
        AudioFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
        fn_constructor_kwargs={"strict": strict},
    )


def frame_sample(ds, every_n: int = 10, frame_bytes: int = 256, concurrency=(1, 4)):
    """Video → sampled frame rows. The payload is treated as concatenated
    fixed-size frames (fake container); real demuxing is the codec stub.
    Emits one row per sampled frame (media_id, frame_idx, payload)."""

    def _sample(t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_pylist()
        payloads = t["payload"].to_pylist()
        out_id, out_idx, out_frame = [], [], []
        for mid, p in zip(ids, payloads):
            if p is None:
                continue
            body = p[8:]
            n_frames = len(body) // frame_bytes
            for fi in range(0, n_frames, every_n):
                out_id.append(mid)
                out_idx.append(fi)
                out_frame.append(body[fi * frame_bytes : (fi + 1) * frame_bytes])
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.string()),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "payload": pa.array(out_frame, pa.binary()),
            }
        )

    # small batches: payloads are wide; 64 rows × ~payload size per batch
    return ds.map_batches(
        _sample, batch_format="pyarrow", batch_size=64
    )


def _pool():
    from .exchange import default_parallelism

    p = default_parallelism()
    return (max(1, p // 2), max(2, p))


def decode_images(ds, strict: bool = False, batch_size: int = 64, concurrency=None):
    if concurrency is None:
        concurrency = _pool()
    return ds.map_batches(
        ImageDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
        fn_constructor_kwargs={"strict": strict},
    )


def extract_image_features(ds, batch_size: int = 64, concurrency=None):
    if concurrency is None:
        concurrency = _pool()
    return ds.map_batches(
        ImageFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def resize_images(ds, width: int, height: int, strict: bool = False, batch_size: int = 64):
    return ds.map_batches(
        ImageResizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool(),
        num_cpus=1,
        fn_constructor_kwargs={"width": width, "height": height, "strict": strict},
    )
