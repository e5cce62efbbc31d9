"""Multimodal columns: image/audio as opaque binary columns with typed
metadata and Arrow-batched processing UDFs (task north-star: the operators a
training-data pipeline needs beyond the reference's video-only surface).

Same design as the video layer (operators/media.py): real Spark plumbing —
schemas, mapInPandas batch shapes, null-on-failure.  Decode/probe dispatch
by format: the in-repo FIMG/FAUD codecs, REAL interchange formats via the
dependency-free decoders in ``operators/rawcodecs.py`` (PNG full decode,
JPEG header probe, WAV PCM16 via stdlib), and import-guarded PIL/soundfile
adapters for everything else (absent from this container).

Formats (little-endian):
    FIMG: magic 4s | u16 height | u16 width | u8 channels | pixels (uint8)
    FAUD: magic 4s | u32 sample_rate | u32 n_samples | i16 samples
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMG_MAGIC = b"FIMG"
# plain format strings, not struct.Struct instances: compiled Structs are not
# picklable and mapInPandas closures are cloudpickled by value
_IMG_FMT = "<4sHHB"
_IMG_SIZE = struct.calcsize(_IMG_FMT)
AUD_MAGIC = b"FAUD"
_AUD_FMT = "<4sII"
_AUD_SIZE = struct.calcsize(_AUD_FMT)

# -- codecs ------------------------------------------------------------------


def encode_image(pixels: np.ndarray) -> bytes:
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    return struct.pack(_IMG_FMT, IMG_MAGIC, h, w, c) + pixels.astype(np.uint8).tobytes()


def decode_image(data: bytes) -> np.ndarray:
    """Format-dispatching image decode → uint8 (H, W, C): FIMG header →
    in-repo codec; PNG → pure-Python decoder (operators/rawcodecs.py, stdlib
    zlib); anything else → PIL adapter when importable, else decode failure
    (null row)."""
    from lvm_datapipe_spark.operators import rawcodecs as RC

    magic = data[:4] if data is not None and len(data) >= 4 else b""
    if magic == IMG_MAGIC:
        _, h, w, c = struct.unpack_from(_IMG_FMT, data, 0)
        arr = np.frombuffer(data, np.uint8, count=h * w * c, offset=_IMG_SIZE)
        return arr.reshape(h, w, c)
    if RC.is_png(data):
        return RC.decode_png(data)
    if RC.have_pil():
        arr = RC.pil_decode(data)
        return arr[:, :, None] if arr.ndim == 2 else arr
    raise ValueError("undecodable image payload")


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    return struct.pack(_AUD_FMT, AUD_MAGIC, sample_rate, len(samples)) + samples.astype(
        "<i2"
    ).tobytes()


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Format-dispatching audio decode → (mono int16, sample_rate): FAUD →
    in-repo codec; RIFF/WAVE → stdlib wave decoder (PCM16); anything else →
    soundfile adapter when importable, else decode failure (null row)."""
    from lvm_datapipe_spark.operators import rawcodecs as RC

    magic = data[:4] if data is not None and len(data) >= 4 else b""
    if magic == AUD_MAGIC:
        _, sr, n = struct.unpack_from(_AUD_FMT, data, 0)
        return np.frombuffer(data, "<i2", count=n, offset=_AUD_SIZE), int(sr)
    if RC.is_wav(data):
        return RC.decode_wav(data)
    if RC.have_soundfile():
        return RC.soundfile_decode(data)
    raise ValueError("undecodable audio payload")


def generate_image(seed_id: str, height: int = 16, width: int = 20, channels: int = 3) -> bytes:
    from lvm_datapipe_spark.fakevideo import hash_str

    rng = np.random.default_rng(hash_str(seed_id) % (2**31))
    return encode_image(rng.integers(0, 256, (height, width, channels), dtype=np.uint8))


def generate_audio(seed_id: str, sample_rate: int = 8000, seconds: float = 0.5) -> bytes:
    from lvm_datapipe_spark.fakevideo import hash_str

    rng = np.random.default_rng(hash_str(seed_id) % (2**31))
    n = int(sample_rate * seconds)
    t = np.arange(n) / sample_rate
    freq = 200 + (hash_str(seed_id) % 800)
    wave = 8000 * np.sin(2 * np.pi * freq * t) + rng.normal(0, 100, n)
    return encode_audio(np.clip(wave, -32768, 32767), sample_rate)


# -- typed metadata (probe) --------------------------------------------------

IMAGE_META = T.StructType(
    [
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

AUDIO_META = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("format", T.StringType()),
    ]
)


def probe_images(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach typed image metadata from a header-only parse (mapInPandas so
    the batch shape carries through: Iterator[pd.DataFrame] in/out, schema
    declared up front, decode failures → null struct)."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("image_meta", IMAGE_META)])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from lvm_datapipe_spark.operators import rawcodecs as RC

        for pdf in batches:
            metas = []
            for data in pdf[content_col]:
                try:
                    if data is not None and data[:4] == IMG_MAGIC:
                        _, h, w, c = struct.unpack_from(_IMG_FMT, data, 0)
                        metas.append(
                            {"height": h, "width": w, "channels": c, "format": "fimg"}
                        )
                    elif RC.is_png(data):
                        metas.append(RC.probe_png(data))
                    elif RC.is_jpeg(data):
                        metas.append(RC.probe_jpeg(data))
                    else:
                        metas.append(None)
                except Exception:  # noqa: BLE001
                    metas.append(None)
            pdf = pdf.copy()
            pdf["image_meta"] = metas
            yield pdf

    return df.mapInPandas(fn, out_schema)


def probe_audio(df: DataFrame, content_col: str = "content") -> DataFrame:
    out_schema = T.StructType(df.schema.fields + [T.StructField("audio_meta", AUDIO_META)])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from lvm_datapipe_spark.operators import rawcodecs as RC

        for pdf in batches:
            metas = []
            for data in pdf[content_col]:
                try:
                    if data is not None and data[:4] == AUD_MAGIC:
                        _, sr, n = struct.unpack_from(_AUD_FMT, data, 0)
                        metas.append(
                            {
                                "sample_rate": sr,
                                "n_samples": n,
                                "duration_s": n / sr,
                                "format": "faud",
                            }
                        )
                    elif RC.is_wav(data):
                        metas.append(RC.probe_wav(data))
                    else:
                        metas.append(None)
                except Exception:  # noqa: BLE001
                    metas.append(None)
            pdf = pdf.copy()
            pdf["audio_meta"] = metas
            yield pdf

    return df.mapInPandas(fn, out_schema)


# -- transforms --------------------------------------------------------------


def resize_images(
    df: DataFrame, height: int, width: int, content_col: str = "content", out_col: str = "resized"
) -> DataFrame:
    """Nearest-neighbor resize (numpy index grid — a real pipeline swaps in
    PIL/cv2 interpolation behind the same column contract)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for data in pdf[content_col]:
                try:
                    img = decode_image(data)
                    ys = (np.arange(height) * img.shape[0] // height).clip(0, img.shape[0] - 1)
                    xs = (np.arange(width) * img.shape[1] // width).clip(0, img.shape[1] - 1)
                    out.append(encode_image(img[np.ix_(ys, xs)]))
                except Exception:  # noqa: BLE001
                    out.append(None)
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.BinaryType())])
    return df.mapInPandas(fn, out_schema)


def image_features(
    df: DataFrame, content_col: str = "content", out_col: str = "features", n_bins: int = 8
) -> DataFrame:
    """Deterministic feature vector (per-channel mean/std + luminance
    histogram) — the embedding-extraction stand-in; a CLIP adapter plugs in
    behind the same array<double> column."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for data in pdf[content_col]:
                try:
                    img = decode_image(data).astype(np.float64)
                    means = img.mean(axis=(0, 1))
                    stds = img.std(axis=(0, 1))
                    lum = img.mean(axis=2)
                    hist, _ = np.histogram(lum, bins=n_bins, range=(0, 255))
                    feat = np.concatenate([means, stds, hist / lum.size])
                    out.append([float(x) for x in feat])
                except Exception:  # noqa: BLE001
                    out.append(None)
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )
    return df.mapInPandas(fn, out_schema)


def audio_features(df: DataFrame, content_col: str = "content", out_col: str = "features") -> DataFrame:
    """RMS energy + zero-crossing rate + peak — deterministic waveform
    features (librosa MFCC adapter point)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for data in pdf[content_col]:
                try:
                    samples, sr = decode_audio(data)
                    x = samples.astype(np.float64) / 32768.0
                    rms = float(np.sqrt((x**2).mean()))
                    zcr = float((np.diff(np.signbit(x)) != 0).mean())
                    peak = float(np.abs(x).max())
                    out.append([rms, zcr, peak])
                except Exception:  # noqa: BLE001
                    out.append(None)
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )
    return df.mapInPandas(fn, out_schema)


# -- perceptual near-dup hashing (aHash) -------------------------------------


def ahash64(pixels: np.ndarray, grid: int = 8) -> int:
    """Average-hash of one image: gray (rounded BT.601, the repo-wide
    media.py convention) → grid×grid block means (trailing rows/cols that
    don't fill a block are truncated) → bit b set iff block b's mean is
    strictly above the mean of the block means.  Row-major, bit 0 = LSB;
    returned as a SIGNED 64-bit int so it stores in a Spark LongType
    column unchanged.  Deterministic: float64 block means from uint8
    pixels, no resampling kernels involved."""
    if pixels.ndim == 3:
        if pixels.shape[2] >= 3:
            p = pixels[:, :, :3].astype(np.float64)
            gray = np.rint(
                0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]
            ).astype(np.uint8)
        else:
            gray = pixels[:, :, 0]
    else:
        gray = pixels
    h, w = gray.shape
    bh, bw = h // grid, w // grid
    if bh == 0 or bw == 0:
        raise ValueError(f"image {h}x{w} smaller than the {grid}x{grid} grid")
    g = gray[: bh * grid, : bw * grid].astype(np.float64)
    blocks = g.reshape(grid, bh, grid, bw).mean(axis=(1, 3))
    mean = blocks.mean()
    bits = (blocks > mean).astype(np.uint64).ravel()
    val = np.uint64(0)
    for i, b in enumerate(bits):
        val |= np.uint64(b) << np.uint64(i)
    return int(np.int64(val))


def image_ahash(
    df: DataFrame,
    content_col: str = "content",
    out_col: str = "ahash",
    grid: int = 8,
) -> DataFrame:
    """Attach a 64-bit perceptual average-hash to every image row — the
    image-modality analog of SimHash for text: near-duplicate frames/
    thumbnails land within a few Hamming bits of each other while
    unrelated images are ~32 bits apart.  Arrow-batched mapInPandas over
    the opaque binary column; decode failures yield a null hash (the F4/F5
    null-row convention), so one corrupt file never kills a 100 TB scan."""
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.LongType())])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for data in pdf[content_col]:
                try:
                    vals.append(ahash64(decode_image(data), grid))
                except Exception:  # noqa: BLE001 — null-row on decode failure
                    vals.append(None)
            pdf = pdf.copy()
            pdf[out_col] = pd.array(vals, dtype="Int64")
            yield pdf

    return df.mapInPandas(fn, out_schema)


def ahash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "image_id",
    hash_col: str = "ahash",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate image pairs with Hamming(aHash) ≤ max_hamming.

    Same pigeonhole-banding scale path as dedup.simhash_pairs, operating
    directly on the packed 64-bit hash: the hash splits into ``bands``
    contiguous slices (shiftrightunsigned — sign-safe), any pair within
    ``max_hamming ≤ bands − 1`` differing bits shares at least one exact
    band, so candidates come from a (band, slice) equi-join — never a
    corpus × corpus product — and the final check is one
    bit_count(xor).  EXACT for max_hamming ≤ bands − 1.
    """
    assert max_hamming <= bands - 1, "banding is only exact for max_hamming <= bands-1"
    assert 64 % bands == 0
    width = 64 // bands
    mask = (1 << width) - 1
    h = df.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col), F.col(hash_col).alias("_h")
    )
    band_entries = [
        F.struct(
            F.lit(b).alias("band"),
            F.expr(f"shiftrightunsigned(_h, {b * width}) & {mask}").alias("piece"),
        )
        for b in range(bands)
    ]
    ex = h.select(
        F.col(id_col), F.col("_h"), F.explode(F.array(*band_entries)).alias("bb")
    ).select(id_col, "_h", "bb.band", "bb.piece")
    a = ex.select(F.col(id_col).alias("id_a"), F.col("_h").alias("h_a"), "band", "piece")
    b_ = ex.select(F.col(id_col).alias("id_b"), F.col("_h").alias("h_b"), "band", "piece")
    return (
        a.join(b_, ["band", "piece"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


# -- audio perceptual hashing (energy-delta fingerprint) ---------------------


def audio_hash64(samples: np.ndarray, n_frames: int = 65) -> int:
    """Energy-delta fingerprint of one clip: split the waveform into
    ``n_frames`` equal frames (trailing remainder truncated), compute
    per-frame RMS energy, and set bit i iff energy rises from frame i to
    frame i+1 — the Haitsma-Kalker bit convention that is invariant to
    GAIN (scaling every sample scales every energy, deltas keep sign) and
    robust to mild noise.  65 frames → 64 delta bits, bit 0 = LSB,
    returned as a signed 64-bit int (LongType-storable).  Deterministic:
    float64 energies, strict > comparison."""
    x = samples.astype(np.float64)
    if x.ndim > 1:
        x = x.mean(axis=1)
    flen = len(x) // n_frames
    if flen == 0:
        raise ValueError(f"clip of {len(x)} samples too short for {n_frames} frames")
    frames = x[: flen * n_frames].reshape(n_frames, flen)
    energy = (frames * frames).mean(axis=1)
    bits = (energy[1:] > energy[:-1]).astype(np.uint64)
    val = np.uint64(0)
    for i, b in enumerate(bits):
        val |= np.uint64(b) << np.uint64(i)
    return int(np.int64(val))


def audio_ahash(
    df: DataFrame, content_col: str = "content", out_col: str = "ahash"
) -> DataFrame:
    """Attach the 64-bit energy-delta fingerprint to every audio row —
    the audio-modality member of the near-dup family (text SimHash /
    image aHash / audio energy-hash all share the banded-Hamming
    candidate plan, ``ahash_near_dup_pairs``).  Arrow-batched
    mapInPandas; decode failures yield a null hash."""
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.LongType())])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for data in pdf[content_col]:
                try:
                    samples, _ = decode_audio(data)
                    vals.append(audio_hash64(samples))
                except Exception:  # noqa: BLE001
                    vals.append(None)
            pdf = pdf.copy()
            pdf[out_col] = pd.array(vals, dtype="Int64")
            yield pdf

    return df.mapInPandas(fn, out_schema)
