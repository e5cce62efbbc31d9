"""Catalog: resolve the driver's parquet test tables and register views.

Mirrors the reference's YAML-config catalog (``configs/meta_config.yaml:1-4``,
``data_schema/macvid.py:78-93`` — data_root + META list resolved to a dataset)
as a plain loader over a directory of parquet tables.  At 100 TB each table
would be a partitioned parquet/iceberg location; the API is the same.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Column names stored as parquet TIMESTAMP(NANOS), which Spark's reader
    rejects outright (PARQUET_TYPE_ILLEGAL)."""
    import pyarrow.parquet as pq

    out = []
    try:
        schema = pq.read_schema(_first_parquet_file(path))
    except Exception:  # noqa: BLE001 - fall through to the plain reader
        return out
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return out


def _first_parquet_file(path: str) -> str:
    if os.path.isdir(path):
        for entry in sorted(os.listdir(path)):
            if entry.endswith(".parquet"):
                return os.path.join(path, entry)
    return path


# Files below this size stay unsplit (dims like region/nation) — repartition
# overhead would exceed any parallelism win.
_MIN_SPLIT_BYTES = 128 * 1024

# path -> whether the scan needs rebalancing.  The probe reads parquet FOOTER
# metadata with pyarrow (row-group count = Spark's max scan parallelism for a
# file; row groups are the split unit) — no Spark plan materialization, no
# py4j round-trip, cacheable across sessions since it's a property of the file.
_REBALANCE_CACHE: dict[str, bool] = {}


def _scan_parallelism_limit(path: str) -> int:
    """Upper bound on scan partitions: total row groups across the table's
    files (Spark can split parquet only at row-group boundaries)."""
    import pyarrow.parquet as pq

    files = (
        [os.path.join(path, e) for e in sorted(os.listdir(path)) if e.endswith(".parquet")]
        if os.path.isdir(path)
        else [path]
    )
    total = 0
    for f in files:
        try:
            total += pq.ParquetFile(f).metadata.num_row_groups
        except Exception:  # noqa: BLE001 — unreadable footer: assume 1 unit
            total += 1
    return max(total, 1)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, rebalance: bool = True
) -> DataFrame:
    """Load one parquet table. Scans stay lazy → Catalyst pushes filters and
    prunes columns down to the parquet reader.

    Two robustness/scale fixes applied at the source:

    - TIMESTAMP(NANOS) parquet columns (written by pandas/arrow, e.g. the
      driver's ``events`` table) are rejected by Spark's reader outright;
      they are read via ``spark.sql.legacy.parquet.nanosAsLong`` and
      converted to microsecond timestamps with ``timestamp_micros`` — still
      a native columnar scan, no Python in the path.
    - **Under-partitioned scans are rebalanced.**  A single-row-group parquet
      file is unsplittable, so every downstream narrow transformation would
      run in ONE task regardless of cluster size.  When the scan yields far
      fewer partitions than the session's parallelism (and the file is big
      enough to matter), insert a round-robin repartition: one cheap shuffle
      buys full-width execution for all per-row compute (md5/shingle/vector
      math).  On a real multi-file 100 TB table the scan already has
      thousands of splits and this branch never triggers.
    """
    # timestamps must collect as UTC wall-clock to match the (naive) values
    # the DuckDB oracle sees — the driver's own session may not set this
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = table_path(sf_dir, name)
    nanos_cols = _nanos_timestamp_columns(path)
    if not nanos_cols:
        df = spark.read.parquet(path)
    else:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # INT96-encoded files (Spark's own default writer) also report as
        # timestamp[ns] in the arrow footer, but Spark reads them as native
        # TIMESTAMP — only convert columns that actually surfaced as longs.
        dtypes = dict(df.dtypes)
        for c in nanos_cols:
            if dtypes.get(c) == "bigint":
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    if rebalance:
        target = spark.sparkContext.defaultParallelism
        needed = _REBALANCE_CACHE.get(path)
        if needed is None:
            try:
                size = os.path.getsize(_first_parquet_file(path))
            except OSError:
                size = 0
            needed = (
                size >= _MIN_SPLIT_BYTES
                and _scan_parallelism_limit(path) < max(2, target // 4)
            )
            _REBALANCE_CACHE[path] = needed
        if needed:
            df = df.repartition(target)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names if os.path.exists(table_path(sf_dir, n))}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view so ``spark.sql`` queries and the
    DataFrame API see the same catalog."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
