"""Multimodal column plumbing tests: binary columns + typed metadata +
mapInPandas transforms, with null-row failure semantics."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from lvm_datapipe_spark.operators import multimodal as M


def _images(spark, n=6):
    rows = [(f"img_{i}", bytearray(M.generate_image(f"img_{i}"))) for i in range(n)]
    rows.append(("bad", bytearray(b"NOTANIMAGE")))
    return spark.createDataFrame(rows, ["id", "content"])


def _audio(spark, n=4):
    rows = [(f"aud_{i}", bytearray(M.generate_audio(f"aud_{i}"))) for i in range(n)]
    rows.append(("bad", bytearray(b"XX")))
    return spark.createDataFrame(rows, ["id", "content"])


def test_image_codec_roundtrip():
    img = np.random.default_rng(0).integers(0, 256, (5, 7, 3), dtype=np.uint8)
    assert np.array_equal(M.decode_image(M.encode_image(img)), img)


def test_probe_images(spark):
    out = M.probe_images(_images(spark))
    good = out.filter(F.col("image_meta").isNotNull())
    assert good.count() == 6
    row = good.first()
    assert (row.image_meta.height, row.image_meta.width, row.image_meta.channels) == (16, 20, 3)
    assert out.filter(F.col("id") == "bad").first().image_meta is None


def test_resize_images(spark):
    out = M.resize_images(_images(spark), 8, 10)
    row = out.filter(F.col("id") == "img_0").first()
    resized = M.decode_image(row.resized)
    assert resized.shape == (8, 10, 3)
    assert out.filter(F.col("id") == "bad").first().resized is None


def test_image_features_shape(spark):
    out = M.image_features(_images(spark))
    row = out.filter(F.col("id") == "img_1").first()
    assert len(row.features) == 3 + 3 + 8  # means + stds + histogram
    hist = row.features[6:]
    assert abs(sum(hist) - 1.0) < 1e-9  # normalized histogram
    # deterministic: same seed id -> same features
    again = M.image_features(_images(spark)).filter(F.col("id") == "img_1").first()
    assert again.features == row.features


def test_probe_audio_and_features(spark):
    out = M.probe_audio(_audio(spark))
    good = out.filter(F.col("audio_meta").isNotNull())
    assert good.count() == 4
    row = good.first()
    assert row.audio_meta.sample_rate == 8000
    assert abs(row.audio_meta.duration_s - 0.5) < 1e-9
    feats = M.audio_features(_audio(spark)).filter(F.col("id") == "aud_0").first()
    rms, zcr, peak = feats.features
    assert 0 < rms < 1 and 0 < zcr < 1 and 0 < peak <= 1


def test_multimodal_joins_with_relational(spark):
    """Binary columns compose with the relational layer: features feed the
    similarity operators."""
    from lvm_datapipe_spark.operators.similarity import embedding_near_dup_pairs

    imgs = _images(spark, n=5)
    feats = (
        M.image_features(imgs)
        .filter(F.col("features").isNotNull())
        .select(F.col("id").alias("vec_id"), F.col("features").alias("embedding"))
    )
    dup = feats.unionByName(
        feats.limit(1).withColumn("vec_id", F.lit("img_0_copy"))
    )
    pairs = embedding_near_dup_pairs(dup, threshold=0.999999, dim=14)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert ("img_0", "img_0_copy") in got
