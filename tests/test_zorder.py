"""Z-order clustered writes: Morton math vs a Python model, and the layout
property that makes it matter — every output file covers a small
rectangle of the 2-D space, so min-max pruning works on BOTH dimensions."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from lvm_datapipe_spark.plans.zorder import morton_key, write_zordered, zorder_bucket


def _py_morton(a: int, b: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_morton_key_matches_python_model(spark):
    df = spark.createDataFrame(
        [(a, b) for a in range(16) for b in range(16)], "a int, b int"
    )
    rows = df.withColumn("k", morton_key("a", "b", bits=4)).collect()
    for r in rows:
        assert r["k"] == _py_morton(r["a"], r["b"], 4), (r["a"], r["b"])


def test_zorder_bucket_is_monotone_and_clamped(spark):
    df = spark.createDataFrame([(x,) for x in [-5.0, 0.0, 2.5, 9.99, 10.0, 50.0]], "x double")
    got = [
        r["b"]
        for r in df.select(F.expr(zorder_bucket("x", 0.0, 10.0, bits=3)).alias("b"))
        .collect()
    ]
    assert got == sorted(got)
    assert got[0] == 0 and got[-1] == 7  # clamped at both ends


def test_zordered_files_cover_small_rectangles(spark, tmp_path):
    # 4096 points on a 64x64 grid; plain a-sort gives full-span b per file,
    # z-order must give every file a small span on BOTH axes
    df = spark.createDataFrame(
        [(a, b, a * 64 + b) for a in range(64) for b in range(64)],
        "a int, b int, v long",
    )
    out = str(tmp_path / "z")
    write_zordered(df, out, "a", "b", bits=6, n_files=16)

    spans_a, spans_b = [], []
    for f in glob.glob(out + "/part-*.parquet"):
        t = pq.read_table(f, columns=["a", "b"])
        aa, bb = t.column("a").to_pylist(), t.column("b").to_pylist()
        spans_a.append(max(aa) - min(aa))
        spans_b.append(max(bb) - min(bb))
    assert len(spans_a) >= 8
    # every file's rectangle is far below the 63 global span on BOTH axes
    assert max(spans_a) <= 32
    assert max(spans_b) <= 32
    # round-trip completeness
    back = spark.read.parquet(out)
    assert back.count() == 4096
    assert back.agg(F.sum("v")).first()[0] == sum(range(4096))


def _xy2d(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_python_model(spark):
    from lvm_datapipe_spark.plans.zorder import hilbert_key_udf

    bits, n = 4, 16
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "x: long, y: long")
    key = hilbert_key_udf(bits)
    got = {
        (r["x"], r["y"]): r["d"]
        for r in df.select("x", "y", key("x", "y").alias("d")).collect()
    }
    assert got == {(x, y): _xy2d(n, x, y) for x, y in pts}
    # the curve visits every cell exactly once, and consecutive positions
    # are ADJACENT cells (the locality property Morton lacks)
    inv = {d: xy for xy, d in got.items()}
    assert sorted(inv) == list(range(n * n))
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_files_cover_small_rectangles(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from lvm_datapipe_spark.plans.zorder import write_hilbert, zorder_bucket

    n = 4096
    df = (
        spark.range(n)
        .withColumn("a", (F.col("id") * 7919) % 256)
        .withColumn("b", (F.col("id") * 104729) % 256)
    )
    out = str(tmp_path / "hil")
    write_hilbert(
        df, out,
        zorder_bucket("a", 0, 256, 8), zorder_bucket("b", 0, 256, 8),
        bits=8, n_files=8,
    )
    # each file must cover a small rectangle of (a, b) space — the whole
    # point of curve clustering; without it every file spans ~full range
    spans = []
    for f in os.listdir(out):
        if not f.endswith(".parquet"):
            continue
        part = spark.read.parquet(os.path.join(out, f))
        row = part.agg(
            F.min("a"), F.max("a"), F.min("b"), F.max("b")
        ).collect()[0]
        spans.append((row[1] - row[0]) * (row[3] - row[2]))
    assert len(spans) >= 4
    # average file rectangle area ≪ full space (256*256)
    assert sum(spans) / len(spans) < 256 * 256 / 3


def test_hilbert_null_buckets_yield_null_key(spark):
    from lvm_datapipe_spark.plans.zorder import hilbert_key_udf

    df = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None)], "a: long, b: long"
    )
    key = hilbert_key_udf(4)
    rows = df.select(key("a", "b").alias("d")).collect()
    # matches the Morton expression's null arithmetic — never a garbage
    # platform-dependent curve position from a NaN cast
    assert rows[0]["d"] is not None
    assert rows[1]["d"] is None and rows[2]["d"] is None
