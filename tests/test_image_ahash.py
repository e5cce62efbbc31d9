"""Perceptual average-hash image dedup: exact bit semantics on constructed
images, noise invariance, banding == brute force, and the no-cartesian
candidate plan."""

from __future__ import annotations

import itertools

import numpy as np
from pyspark.sql import functions as F

from lvm_datapipe_spark.operators import multimodal as MM
from lvm_datapipe_spark.operators import rawcodecs as RC


def _checkerboard(lo=40, hi=200, block=4, grid=8, phase=0):
    # grid x grid blocks of block x block pixels, alternating lo/hi
    img = np.zeros((grid * block, grid * block), np.uint8)
    for r in range(grid):
        for c in range(grid):
            v = hi if (r + c + phase) % 2 == 0 else lo
            img[r * block : (r + 1) * block, c * block : (c + 1) * block] = v
    return img


def test_ahash_known_bit_pattern():
    img = _checkerboard()
    h = MM.ahash64(img)
    # bright blocks ((r+c) even) are above the mean -> bit set, row-major
    expect = 0
    for i, (r, c) in enumerate(itertools.product(range(8), range(8))):
        if (r + c) % 2 == 0:
            expect |= 1 << i
    assert h == int(np.int64(np.uint64(expect)))


def test_ahash_invariant_to_small_noise():
    base = _checkerboard()
    rng = np.random.default_rng(7)
    noisy = np.clip(
        base.astype(np.int16) + rng.integers(-2, 3, base.shape), 0, 255
    ).astype(np.uint8)
    assert MM.ahash64(base) == MM.ahash64(noisy)


def test_ahash_inverted_image_flips_every_bit():
    base = _checkerboard(phase=0)
    inv = _checkerboard(phase=1)
    xor = np.uint64(np.int64(MM.ahash64(base))) ^ np.uint64(np.int64(MM.ahash64(inv)))
    assert bin(int(xor)).count("1") == 64


def test_spark_ahash_groups_near_dups(spark):
    rng = np.random.default_rng(11)

    def noisy(img, seed):
        r = np.random.default_rng(seed)
        return np.clip(
            img.astype(np.int16) + r.integers(-2, 3, img.shape), 0, 255
        ).astype(np.uint8)

    a = _checkerboard(block=4)
    b = (rng.integers(0, 2, (8, 8)).astype(np.uint8) * 160 + 40).repeat(4, 0).repeat(4, 1)
    rows = [
        ("a0", MM.encode_image(a)),
        ("a1", MM.encode_image(noisy(a, 1))),
        ("a2", RC.encode_png(noisy(a, 2))),       # PNG path too
        ("b0", MM.encode_image(b)),
        ("b1", MM.encode_image(noisy(b, 3))),
        ("bad", b"\x00not-an-image"),
    ]
    df = spark.createDataFrame(rows, "image_id string, content binary")
    hashed = MM.image_ahash(df)
    got = {r["image_id"]: r["ahash"] for r in hashed.collect()}
    assert got["bad"] is None
    pairs = MM.ahash_near_dup_pairs(hashed, max_hamming=3)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {("a0", "a1"), ("a0", "a2"), ("a1", "a2"), ("b0", "b1")} <= found
    assert not any({p[0][0], p[1][0]} == {"a", "b"} for p in found)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_banding_matches_brute_force(spark):
    # random 64-bit hashes + perturbed copies: the banded candidate path
    # must find exactly the pairs brute-force hamming finds
    rng = np.random.default_rng(5)
    hashes = {}
    base_vals = rng.integers(0, 2**63, 40, dtype=np.int64)
    for i, v in enumerate(base_vals):
        hashes[f"h{i}"] = int(v)
        if i % 4 == 0:  # a near-dup 1-3 bits away
            flip = np.uint64(0)
            for b in rng.choice(64, size=int(rng.integers(1, 4)), replace=False):
                flip |= np.uint64(1) << np.uint64(b)
            hashes[f"h{i}x"] = int(np.int64(np.uint64(v) ^ flip))
    df = spark.createDataFrame(
        [(k, v) for k, v in hashes.items()], "image_id string, ahash long"
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in MM.ahash_near_dup_pairs(df, max_hamming=3).collect()
    }
    want = set()
    for x, y in itertools.combinations(sorted(hashes), 2):
        d = bin(int(np.uint64(np.int64(hashes[x])) ^ np.uint64(np.int64(hashes[y])))).count("1")
        if d <= 3:
            want.add((x, y, d))
    assert got == want


# --- audio energy-delta fingerprint (same banded candidate plan) ------------


def _tone(freq, seconds=0.5, sr=8000, gain=8000.0, seed=None):
    t = np.arange(int(sr * seconds)) / sr
    x = gain * np.sin(2 * np.pi * freq * t)
    # amplitude envelope so frame energies vary
    x *= 0.5 + 0.5 * np.sin(2 * np.pi * 3 * t)
    if seed is not None:
        x = x + np.random.default_rng(seed).normal(0, 20, len(x))
    return np.clip(x, -32768, 32767)


def test_audio_hash_gain_invariant_and_noise_robust():
    base = _tone(440)
    assert MM.audio_hash64(base * 0.25) == MM.audio_hash64(base)  # gain
    noisy = MM.audio_hash64(_tone(440, seed=5))
    d = bin(
        int(np.uint64(np.int64(MM.audio_hash64(base))) ^ np.uint64(np.int64(noisy)))
    ).count("1")
    assert d <= 6, d  # mild noise flips only near-tie delta bits


def test_spark_audio_ahash_groups_near_dups(spark):
    rows = [
        ("t440", MM.encode_audio(_tone(440), 8000)),
        ("t440n", MM.encode_audio(_tone(440, seed=3), 8000)),
        ("t441q", MM.encode_audio(_tone(440) * 0.5, 8000)),
        ("sweep", MM.encode_audio(_tone(97, seconds=0.31), 8000)),
        ("bad", b"\x00nope"),
    ]
    df = spark.createDataFrame(rows, "audio_id string, content binary")
    hashed = MM.audio_ahash(df)
    got = {r["audio_id"]: r["ahash"] for r in hashed.collect()}
    assert got["bad"] is None
    assert got["t440"] == got["t441q"]  # gain-invariant: identical hash
    pairs = MM.ahash_near_dup_pairs(
        hashed, id_col="audio_id", max_hamming=6, bands=8
    )
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert ("t440", "t440n") in found or ("t440n", "t440") in found
    assert ("t440", "t441q") in found
    assert not any("sweep" in p for p in found)
