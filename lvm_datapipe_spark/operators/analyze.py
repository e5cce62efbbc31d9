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


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-scan numeric column profiling: (column, n_rows, n_nulls, min,
    max, decimal-exact mean) per requested column — the table-health
    report a pipeline prints before processing a new drop.  ALL columns
    profile in a SINGLE aggregate (4 conditional aggregations per column,
    map-side partials) and a stack() unpivot turns the one wide row into
    |cols| rows — k columns never cost k scans (the validate.row_checks
    discipline)."""
    from pyspark.sql import functions as F

    from lvm_datapipe_spark.operators.aggregates import decimal_avg

    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"nn_{i}"),
            F.min(F.col(c).cast("double")).alias(f"mn_{i}"),
            F.max(F.col(c).cast("double")).alias(f"mx_{i}"),
            decimal_avg(F.col(c).cast("double")).alias(f"av_{i}"),
        ]
    wide = df.agg(*aggs, F.count(F.lit(1)).cast("long").alias("n"))
    pairs = ", ".join(
        f"'{c}', nn_{i}, mn_{i}, mx_{i}, av_{i}" for i, c in enumerate(cols)
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {pairs}) AS (column, n_nulls, min_value, max_value, mean_value)",
        "n AS n_rows",
    ).select("column", "n_rows", "n_nulls", "min_value", "max_value", "mean_value")


def partition_stats(df: DataFrame) -> DataFrame:
    """Physical-layout skew probe: rows per Spark partition → one summary
    row (n_partitions, min/max/avg rows, skew = max/avg).

    The first thing to look at when a stage straggles: a skew ratio ≫ 1
    after a keyed exchange means a hot key (reach for
    ``operators/skew.salted_*`` or AQE skew-join), while skew ≈ 1 with
    stragglers points at data-dependent WORK per row instead.  One narrow
    job — a per-partition count (``spark_partition_id`` groupBy) and a
    single-row rollup; nothing is collected beyond the summary.

    Per-partition counts come from ONE ``mapInPandas`` pass that emits a
    row for EVERY partition — including empty ones, via the TaskContext
    partition id.  A groupBy on ``spark_partition_id()`` alone never sees
    empty partitions (an all-rows-on-one-key layout would report skew 1.0
    instead of n_partitions — the exact situation the probe exists to
    flag), and deriving the denominator separately (``df.rdd``) both
    re-executes the plan under AQE and risks describing a different
    execution than the one counted."""
    import pandas as pd
    from pyspark.sql import functions as F

    def count_rows(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        for pdf in batches:
            n += len(pdf)
        yield pd.DataFrame({"pid": [pid], "n": [n]})

    per = df.mapInPandas(count_rows, schema="pid int, n long")
    return per.agg(
        F.count(F.lit(1)).alias("n_partitions"),
        F.sum((F.col("n") > 0).cast("int")).alias("n_nonempty"),
        F.min("n").alias("min_rows"),
        F.max("n").alias("max_rows"),
        (F.sum("n") / F.count(F.lit(1))).alias("avg_rows"),
        (F.max("n") * F.count(F.lit(1)) / F.sum("n")).alias("skew"),
    )
