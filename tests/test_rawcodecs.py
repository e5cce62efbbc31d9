"""Real-format codec tests: PNG decode across every filter type, JPEG and
WAV probes, and the multimodal layer's format dispatch over genuine files."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from lvm_datapipe_spark.operators import multimodal as MM
from lvm_datapipe_spark.operators import rawcodecs as RC


def _rand_img(h, w, ch, seed=7):
    return np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_encode_decode_roundtrip(ch):
    img = _rand_img(13, 17, ch)
    data = RC.encode_png(img)
    assert RC.is_png(data)
    got = RC.decode_png(data)
    np.testing.assert_array_equal(got, img)
    assert RC.probe_png(data) == {
        "height": 13, "width": 17, "channels": ch, "format": "png",
    }


def _forward_filter(img: np.ndarray, ftype: int) -> bytes:
    """Independent forward implementation of the PNG filters, to prove the
    decoder reverses each type (the in-repo encoder only emits type 0)."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    out = b""
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        line = np.zeros(stride, np.int32)
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[x] = (cur[x] - pred) & 0xFF
        out += bytes([ftype]) + line.astype(np.uint8).tobytes()
    return out


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decoder_reverses_every_filter_type(ftype):
    img = _rand_img(9, 11, 3, seed=ftype)

    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", 11, 9, 8, 2, 0, 0, 0)
    data = (
        RC.PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(_forward_filter(img, ftype)))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(RC.decode_png(data), img)


def test_png_decode_rejects_corruption():
    data = RC.encode_png(_rand_img(4, 4, 3))
    with pytest.raises((ValueError, zlib.error)):
        RC.decode_png(data[:40] + b"\x00" * 10)  # truncated/garbled payload
    assert RC.probe_png(b"definitely not a png") is None


def _minimal_jpeg(h, w, channels=3):
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 8 + 3 * channels) + b"\x08"
        + struct.pack(">HH", h, w) + bytes([channels])
        + b"".join(bytes([i + 1, 0x11, 0]) for i in range(channels))
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_jpeg_probe_reads_sof_dimensions():
    data = _minimal_jpeg(480, 640)
    assert RC.is_jpeg(data)
    assert RC.probe_jpeg(data) == {
        "height": 480, "width": 640, "channels": 3, "format": "jpeg",
    }
    assert RC.probe_jpeg(b"\xff\xd8\xff\xd9") is None  # no SOF


def test_wav_roundtrip_and_probe():
    rng = np.random.default_rng(3)
    samples = rng.integers(-30000, 30000, 800, dtype=np.int16)
    data = RC.encode_wav(samples, 8000)
    assert RC.is_wav(data)
    got, sr = RC.decode_wav(data)
    assert sr == 8000
    np.testing.assert_array_equal(got, samples)
    assert RC.probe_wav(data) == {
        "sample_rate": 8000, "n_samples": 800, "duration_s": 0.1, "format": "wav",
    }


def test_decode_image_dispatches_png_and_fimg():
    img = _rand_img(6, 8, 3)
    np.testing.assert_array_equal(MM.decode_image(RC.encode_png(img)), img)
    np.testing.assert_array_equal(MM.decode_image(MM.encode_image(img)), img)
    with pytest.raises(ValueError):
        MM.decode_image(b"mystery bytes")  # no PIL in this container


def test_decode_audio_dispatches_wav_and_faud():
    samples = np.arange(-400, 400, dtype=np.int16)
    got_wav, sr = MM.decode_audio(RC.encode_wav(samples, 16000))
    np.testing.assert_array_equal(got_wav, samples)
    assert sr == 16000
    got_faud, sr2 = MM.decode_audio(MM.encode_audio(samples, 8000))
    np.testing.assert_array_equal(got_faud, samples)
    assert sr2 == 8000
    with pytest.raises(ValueError):
        MM.decode_audio(b"mystery bytes")


def test_probe_images_mixed_formats_through_spark(spark):
    img = _rand_img(5, 7, 3)
    rows = [
        ("a.png", bytearray(RC.encode_png(img))),
        ("b.jpg", bytearray(_minimal_jpeg(32, 64))),
        ("c.fimg", bytearray(MM.encode_image(img))),
        ("d.bin", bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, ["path", "content"])
    got = {r.path: r.image_meta for r in MM.probe_images(df).collect()}
    assert got["a.png"].asDict() == {"height": 5, "width": 7, "channels": 3, "format": "png"}
    assert got["b.jpg"].asDict() == {"height": 32, "width": 64, "channels": 3, "format": "jpeg"}
    assert got["c.fimg"].format == "fimg"
    assert got["d.bin"] is None


def test_image_features_and_resize_on_real_png(spark):
    img = _rand_img(16, 16, 3)
    df = spark.createDataFrame([("a.png", bytearray(RC.encode_png(img)))], ["path", "content"])
    feats = MM.image_features(df).collect()[0].features
    assert len(feats) == 3 + 3 + 8 and feats[0] == pytest.approx(img[:, :, 0].mean())
    resized = MM.resize_images(df, 8, 8).collect()[0].resized
    assert MM.decode_image(bytes(resized)).shape == (8, 8, 3)


def test_audio_features_on_real_wav(spark):
    samples = (8000 * np.sin(np.arange(1600) / 10)).astype(np.int16)
    df = spark.createDataFrame(
        [("a.wav", bytearray(RC.encode_wav(samples, 16000)))], ["path", "content"]
    )
    got = MM.probe_audio(df).collect()[0].audio_meta
    assert got.asDict() == {
        "sample_rate": 16000, "n_samples": 1600, "duration_s": 0.1, "format": "wav",
    }
    feats = MM.audio_features(df).collect()[0].features
    assert len(feats) == 3 and 0 < feats[0] < 1
