"""Pure-numpy media codecs for UNCOMPRESSED formats.

The container has no image/audio libraries, but several standard formats
need none: PPM/PGM (netpbm), 24-bit uncompressed BMP, and 16-bit PCM WAV
are header-plus-raw-bytes, decodable with numpy alone. These make the
multimodal stage's decode/resize/feature steps REAL for those formats;
compressed formats (JPEG/PNG/MP3/…) remain honestly stubbed behind
``NotImplementedError`` naming the missing dependency.

All functions are deterministic and byte-exact round-trippable where an
encoder exists (PPM/PGM/WAV).
"""

from __future__ import annotations

import numpy as np


class UnsupportedFormat(NotImplementedError):
    """Compressed/unknown format — needs a codec library we don't ship."""


def sniff_format(payload: bytes) -> str:
    """'ppm' | 'pgm' | 'bmp' | 'wav' | 'jpeg' | 'png' | 'synthetic' | 'unknown'."""
    if payload is None or len(payload) < 8:
        return "unknown"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return "synthetic"


# ---------------------------------------------------------------------------
# netpbm (PPM P6 / PGM P5)
# ---------------------------------------------------------------------------


def _pnm_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
    """First ``n`` integer tokens after the magic (comments skipped);
    returns (tokens, offset-of-first-raster-byte)."""
    toks: list[int] = []
    i = 2
    cur = b""
    while len(toks) < n and i < len(payload):
        c = payload[i : i + 1]
        i += 1
        if c == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
            continue
        if c.isspace():
            if cur:
                toks.append(int(cur))
                cur = b""
            continue
        cur += c
    if cur and len(toks) < n:
        toks.append(int(cur))
    return toks, i


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 → (h, w, 3) uint8."""
    (w, h, maxval), off = _pnm_tokens(payload, 3)
    if maxval > 255:
        raise UnsupportedFormat("16-bit netpbm not supported")
    arr = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=off)
    return arr.reshape(h, w, 3)


def decode_pgm(payload: bytes) -> np.ndarray:
    """P5 → (h, w) uint8."""
    (w, h, maxval), off = _pnm_tokens(payload, 3)
    if maxval > 255:
        raise UnsupportedFormat("16-bit netpbm not supported")
    arr = np.frombuffer(payload, np.uint8, count=w * h, offset=off)
    return arr.reshape(h, w)


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def encode_pgm(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 3:
        img = img.mean(axis=2).astype(np.uint8)
    h, w = img.shape
    return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed BI_RGB)
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP → (h, w, 3) uint8 RGB (bottom-up rows flipped)."""
    if payload[:2] != b"BM":
        raise UnsupportedFormat("not a BMP")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise UnsupportedFormat(f"BMP bpp={bpp} compression={comp} needs a codec library")
    bottom_up = h > 0
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.frombuffer(payload, np.uint8, count=stride * h, offset=off).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if bottom_up:
        img = img[::-1]
    return np.ascontiguousarray(img)


# ---------------------------------------------------------------------------
# WAV (16-bit PCM)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM-16 → ((n_samples, channels) int16, sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise UnsupportedFormat("not a WAV")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise UnsupportedFormat("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise UnsupportedFormat(f"WAV format={audio_format} bits={bits} needs a codec library")
    samples = np.frombuffer(data, "<i2")
    n = len(samples) // channels
    return samples[: n * channels].reshape(n, channels), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n[, ch]) int16 → minimal PCM-16 RIFF/WAVE bytes."""
    s = np.asarray(samples, "<i2")
    if s.ndim == 1:
        s = s[:, None]
    ch = s.shape[1]
    data = s.tobytes()
    fmt = (
        (1).to_bytes(2, "little") + ch.to_bytes(2, "little")
        + int(rate).to_bytes(4, "little")
        + int(rate * ch * 2).to_bytes(4, "little")
        + int(ch * 2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


# ---------------------------------------------------------------------------
# real operations on decoded pixels
# ---------------------------------------------------------------------------


def nn_resize(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resize (pure index grid, no interpolation libs)."""
    h, w = img.shape[:2]
    yi = (np.arange(height) * (h / height)).astype(np.int64).clip(0, h - 1)
    xi = (np.arange(width) * (w / width)).astype(np.int64).clip(0, w - 1)
    return img[yi][:, xi]


def decode_image(payload: bytes) -> "np.ndarray | None":
    """Any supported still-image payload → (h, w[, 3]) uint8, or None for
    the repo's synthetic header format; raises UnsupportedFormat for
    compressed formats."""
    kind = sniff_format(payload)
    if kind == "ppm":
        return decode_ppm(payload)
    if kind == "pgm":
        return decode_pgm(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind in ("jpeg", "png"):
        raise UnsupportedFormat(
            f"{kind} decoding requires a codec library (pillow) not present here"
        )
    return None
