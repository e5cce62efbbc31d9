"""SparkSession factory tuned for the engine's workload.

The reference hand-manages parallelism (slice sharding, DistributedSampler,
joblib fan-out — SURVEY.md §2.3); here the scheduler owns it, and the session
carries the configs that matter at 100 TB scale:

- AQE on (runtime coalesce, skew-join splitting, dynamic join selection),
- Arrow on (pandas-UDF batches for the media/model kernels),
- UTC session timezone (timestamp semantics identical to the DuckDB oracle),
- shuffle partitions sized to the local core count by default; on a real
  cluster AQE coalesces the 2000-partition default down to useful sizes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_LOCAL_CORES = os.environ.get("SPARK_GRAFT_CPUS", "*")


def get_spark(
    app_name: str = "lvm-datapipe-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    On a cluster, pass ``master=None`` and let spark-submit decide; locally
    defaults to ``local[$SPARK_GRAFT_CPUS]``.
    """
    if master is None:
        master = f"local[{DEFAULT_LOCAL_CORES}]"
    if shuffle_partitions is None:
        try:
            n = int(DEFAULT_LOCAL_CORES)
        except ValueError:
            n = os.cpu_count() or 8
        shuffle_partitions = max(8, n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
