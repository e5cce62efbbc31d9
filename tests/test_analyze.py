"""Direct tests for the corpus-analytics module (analyze_vids parity)."""

from __future__ import annotations

from lvm_datapipe_spark.operators import analyze


def test_duration_histogram_reference_bins(spark):
    durations = [2.0, 7.0, 30.0, 120.0, 400.0, 700.0, 2000.0, 4000.0, 4.9]
    df = spark.createDataFrame([(d,) for d in durations], ["clip_duration"])
    out = {r.label: r.n for r in analyze.duration_histogram(df).collect()}
    assert out == {
        "0-5s": 2,
        "5-10s": 1,
        "10-60s": 1,
        "1-5min": 1,
        "5-10min": 1,
        "10-30min": 1,
        "30-60min": 1,
        ">1h": 1,
    }


def test_duration_stats(spark):
    df = spark.createDataFrame([(1.0,), (3.0,)], ["clip_duration"])
    row = analyze.duration_stats(df).first()
    assert (row.total, row.mean, row.min, row.max, row.n) == (4.0, 2.0, 1.0, 3.0, 2)


def test_category_counts(spark):
    df = spark.createDataFrame([("a",), ("b",), ("a",)], ["category"])
    out = {r.category: r.n for r in analyze.category_counts(df).collect()}
    assert out == {"a": 2, "b": 1}
