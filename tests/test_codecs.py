"""Pure-numpy media codecs (functions/codecs.py) + the now-real multimodal
decode/resize/audio paths."""

import numpy as np
import pyarrow as pa
import pytest

from splink_ray.functions import codecs


def _bmp_bytes(img: np.ndarray) -> bytes:
    """Minimal 24-bit BI_RGB BMP writer (test-side reference encoder)."""
    h, w = img.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    off = 14 + 40
    header = b"BM" + (off + len(data)).to_bytes(4, "little") + b"\x00" * 4 + off.to_bytes(4, "little")
    dib = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + dib + data


@pytest.fixture
def rgb():
    rng = np.random.default_rng(3)
    return rng.integers(0, 256, (5, 7, 3), np.uint8)


def test_ppm_roundtrip(rgb):
    enc = codecs.encode_ppm(rgb)
    assert codecs.sniff_format(enc) == "ppm"
    np.testing.assert_array_equal(codecs.decode_ppm(enc), rgb)
    np.testing.assert_array_equal(codecs.decode_image(enc), rgb)


def test_pgm_roundtrip():
    g = np.arange(24, dtype=np.uint8).reshape(4, 6)
    enc = codecs.encode_pgm(g)
    assert codecs.sniff_format(enc) == "pgm"
    np.testing.assert_array_equal(codecs.decode_pgm(enc), g)


def test_bmp_decode(rgb):
    payload = _bmp_bytes(rgb)
    assert codecs.sniff_format(payload) == "bmp"
    np.testing.assert_array_equal(codecs.decode_bmp(payload), rgb)


def test_wav_roundtrip():
    t = np.arange(0, 800)
    samples = (np.sin(t / 10) * 3000).astype(np.int16)
    enc = codecs.encode_wav(samples, 8000)
    assert codecs.sniff_format(enc) == "wav"
    dec, rate = codecs.decode_wav(enc)
    assert rate == 8000
    np.testing.assert_array_equal(dec[:, 0], samples)


def test_nn_resize_exact_downscale(rgb):
    small = codecs.nn_resize(rgb, 3, 2)
    assert small.shape == (2, 3, 3)
    # nearest-neighbour picks exact source pixels
    assert small[0, 0].tolist() == rgb[0, 0].tolist()


def test_compressed_formats_raise():
    fake_png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
    with pytest.raises(codecs.UnsupportedFormat, match="pillow"):
        codecs.decode_image(fake_png)


def test_multimodal_real_decode_resize_audio(ray_session, rgb):
    import ray.data as rd

    from splink_ray.stages import multimodal as mm

    wav = codecs.encode_wav((np.sin(np.arange(1600) / 5) * 1000).astype(np.int16), 16000)
    tbl = pa.table(
        {
            "media_id": ["ppm1", "bmp1", "wav1", "synth1"],
            "payload": pa.array(
                [codecs.encode_ppm(rgb), _bmp_bytes(rgb), wav, mm.synth_payload(7, 6, 4)],
                pa.binary(),
            ),
            "mime": ["image/ppm", "image/bmp", "audio/wav", "application/x-synth"],
            "meta": ["{}"] * 4,
        }
    )
    ds = rd.from_arrow(tbl)
    dec = mm.decode_images(ds).to_pandas().set_index("media_id")
    assert dec.loc["ppm1", "width"] == 7 and dec.loc["ppm1", "height"] == 5
    assert dec.loc["bmp1", "width"] == 7 and dec.loc["bmp1", "height"] == 5
    assert dec.loc["ppm1", "mean_pixel"] == pytest.approx(float(rgb.mean()))
    assert dec.loc["synth1", "format"] == "synthetic"

    rs = mm.resize_images(ds, 3, 2).to_pandas().set_index("media_id")
    out = codecs.decode_image(rs.loc["ppm1", "payload"])
    assert out.shape == (2, 3, 3)

    au = (
        mm.extract_audio_features(rd.from_arrow(tbl.slice(2, 1)))
        .to_pandas()
        .iloc[0]
    )
    assert au["sample_rate"] == 16000
    assert au["duration_s"] == pytest.approx(0.1)
    assert au["rms"] > 0 and 0 < au["zero_crossing_rate"] < 1
