"""Corpus analytics (``analyze/analyze_vids.py`` parity): duration stats,
bucket histograms with the reference's exact bin edges, category counts.

The reference loops over metadata dicts and matplotlib-pies the result
(analyze_vids.py:42-51); here each is one aggregation over the clips/videos
snapshot and returns a DataFrame (plot-ready, engine-agnostic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lvm_datapipe_spark.operators.aggregates import corpus_stats, histogram, value_counts

# analyze_vids.py:43 — np.histogram bins (last bin unbounded)
DURATION_BINS = [0.0, 5.0, 10.0, 60.0, 300.0, 600.0, 1800.0, 3600.0]
DURATION_LABELS = [
    "0-5s",
    "5-10s",
    "10-60s",
    "1-5min",
    "5-10min",
    "10-30min",
    "30-60min",
    ">1h",
]


def duration_stats(clips: DataFrame, col: str = "clip_duration") -> DataFrame:
    """analyze_vids.py:42 — sum + mean (plus min/max/count for free)."""
    return corpus_stats(clips, col)


def duration_histogram(clips: DataFrame, col: str = "clip_duration") -> DataFrame:
    """analyze_vids.py:43-51 — the pie-chart bucket counts, labeled."""
    from pyspark.sql import functions as F

    out = histogram(clips, col, DURATION_BINS)
    label = None
    for i, name in enumerate(DURATION_LABELS):
        label = (
            F.when(F.col("bucket") == i, name) if label is None else label.when(F.col("bucket") == i, name)
        )
    return out.withColumn("label", label)


def category_counts(videos: DataFrame, col: str = "category") -> DataFrame:
    """analyze_vids.py:11-26 — per-category video counts."""
    return value_counts(videos, col)
