"""Bucketed (co-located) joins — the repeat-join scale path.

At 100 TB the fact↔fact join (e.g. clips ⋈ per-clip scores, lineitem ⋈
orders) dominated by its shuffle.  Writing both sides bucketed by the join
key once means every subsequent join reads pre-partitioned, pre-sorted
buckets: the sort-merge join planss with NO Exchange on either side.  The
write costs one shuffle; every downstream join is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str | list[str],
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table.  n_buckets
    should match downstream parallelism; both join sides must agree.
    Composite keys (e.g. the LSH ``(band, bucket)``) bucket on all columns."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *cols)
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planned without
    a shuffle on either side (verify: no Exchange above the scans in
    ``.explain``)."""
    return spark.table(left_table).join(spark.table(right_table), on=key, how=how)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes in the physical plan (test/debug
    helper for asserting co-location)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
