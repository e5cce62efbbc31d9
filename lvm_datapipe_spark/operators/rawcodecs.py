"""Dependency-free real-format codecs for the multimodal layer.

The container ships no PIL/soundfile, but several real interchange formats
are decodable with the standard library alone:

- **PNG** — full decode (zlib inflate + scanline unfiltering, ISO/IEC
  15948): 8-bit gray / gray+alpha / RGB / RGBA, non-interlaced.  Also a
  minimal encoder (filter-0 scanlines) used by tests to produce genuine PNG
  fixtures.
- **JPEG** — header-only probe: walk the marker stream to SOFn and read
  height/width/components (decode itself needs a DCT codec → PIL adapter).
- **WAV** — PCM16 decode/encode via the stdlib ``wave`` module.

``pil_decode`` / ``soundfile_decode`` are the import-guarded adapters for
everything else (jpeg decode, flac/ogg/mp3); when those libs are absent the
callers fall through to null-row semantics.
"""

from __future__ import annotations

import importlib.util
import io
import struct
import zlib

import numpy as np

# -- PNG ---------------------------------------------------------------------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


def is_png(data: bytes | None) -> bool:
    return data is not None and data[:8] == PNG_MAGIC


def _png_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        payload = data[pos + 8 : pos + 8 + length]
        yield ctype, payload
        pos += 12 + length  # length + type + payload + crc
        if ctype == b"IEND":
            return


def probe_png(data: bytes) -> dict | None:
    """Header-only: IHDR is required to be the first chunk."""
    if not is_png(data) or len(data) < 33:
        return None
    w, h, depth, color = struct.unpack_from(">IIBB", data, 16)
    channels = _PNG_CHANNELS.get(color)
    if channels is None:
        return None
    return {"height": h, "width": w, "channels": channels, "format": "png"}


def _unfilter(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4).  Row layout: 1 filter byte +
    w*ch sample bytes.  Vectorized per row; the Paeth/Sub recurrences are
    per-pixel within a row but rows are short relative to corpus size."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, stride + 1)
    for y in range(h):
        ftype = rows[y, 0]
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(ch, stride):
                cur[x] = (cur[x] + cur[x - ch]) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, ch)


def decode_png(data: bytes) -> np.ndarray:
    """Full PNG decode → uint8 (H, W, C).  Supports bit depth 8, color types
    0/2/4/6, no interlacing — the shapes a data pipeline actually stores."""
    meta = probe_png(data)
    if meta is None:
        raise ValueError("not a decodable PNG")
    w_, h_ = meta["width"], meta["height"]
    depth, color, _comp, _filt, interlace = struct.unpack_from(">BBBBB", data, 24)
    if depth != 8 or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, interlace={interlace})")
    ch = _PNG_CHANNELS[color]
    idat = b"".join(p for t, p in _png_chunks(data) if t == b"IDAT")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    if raw.size != h_ * (w_ * ch + 1):
        raise ValueError("PNG payload size mismatch")
    return _unfilter(raw, h_, w_, ch)


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal encoder (filter 0, one zlib stream) for gray/RGB/RGBA uint8 —
    produces bona fide PNG files; used to build real fixtures in tests."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    body = b"".join(
        b"\x00" + pixels[y].astype(np.uint8).tobytes() for y in range(h)
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(body))
        + chunk(b"IEND", b"")
    )


# -- JPEG (probe only) -------------------------------------------------------

_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def is_jpeg(data: bytes | None) -> bool:
    return data is not None and data[:3] == b"\xff\xd8\xff"


def probe_jpeg(data: bytes) -> dict | None:
    """Marker walk to the first SOFn frame header (height, width, channels).
    Header-only — actual decode requires a DCT codec (PIL adapter)."""
    if not is_jpeg(data):
        return None
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            return None
        seg_len = struct.unpack_from(">H", data, pos + 2)[0]
        if marker in _SOF_MARKERS:
            if pos + 9 > n:
                return None
            h, w = struct.unpack_from(">HH", data, pos + 5)
            channels = data[pos + 9]
            return {"height": h, "width": w, "channels": channels, "format": "jpeg"}
        pos += 2 + seg_len
    return None


# -- WAV (stdlib) ------------------------------------------------------------


def is_wav(data: bytes | None) -> bool:
    return (
        data is not None and len(data) >= 12
        and data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    )


def probe_wav(data: bytes) -> dict | None:
    import wave

    if not is_wav(data):
        return None
    try:
        with wave.open(io.BytesIO(data)) as wf:
            sr, n = wf.getframerate(), wf.getnframes()
            return {
                "sample_rate": sr,
                "n_samples": n,
                "duration_s": n / sr if sr else None,
                "format": "wav",
            }
    except Exception:  # noqa: BLE001
        return None


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV → (mono int16 samples, sample_rate); multi-channel input is
    averaged to mono (the pipeline's audio contract is single-channel)."""
    import wave

    with wave.open(io.BytesIO(data)) as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported without soundfile")
        frames = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
        ch = wf.getnchannels()
        if ch > 1:
            frames = frames.reshape(-1, ch).mean(axis=1).astype("<i2")
        return frames, wf.getframerate()


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


# -- import-guarded library adapters ----------------------------------------


def have_pil() -> bool:
    return importlib.util.find_spec("PIL") is not None


def pil_decode(data: bytes) -> np.ndarray:  # pragma: no cover — needs PIL
    """Adapter for formats the pure-Python path can't decode (jpeg, webp,
    interlaced/16-bit png, ...)."""
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)))


def have_soundfile() -> bool:
    return importlib.util.find_spec("soundfile") is not None


def soundfile_decode(data: bytes) -> tuple[np.ndarray, int]:  # pragma: no cover
    """Adapter for flac/ogg/mp3; output normalized to the int16 mono
    contract."""
    import soundfile as sf

    samples, sr = sf.read(io.BytesIO(data), dtype="int16", always_2d=True)
    return samples.mean(axis=1).astype("<i2"), int(sr)
