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
