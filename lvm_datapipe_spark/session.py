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
    # transformWithState needs google.protobuf in the driver AND every
    # spawned Python process (daemon workers + the tws driver worker, which
    # Spark execs directly).  When the runtime only resolves via the
    # fallback path probe (this container), expose the sitecustomize
    # bootstrap dir through PYTHONPATH before the JVM launches — spawned
    # interpreters then self-apply the same bootstrap at startup.  On a
    # properly provisioned cluster this is a no-op.
    from lvm_datapipe_spark.protobuf_compat import needs_worker_bootstrap

    if needs_worker_bootstrap():
        boot = os.path.join(os.path.dirname(__file__), "_pybootstrap")
        existing = os.environ.get("PYTHONPATH", "")
        if boot not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                boot + (os.pathsep + existing if existing else "")
            )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def gpu_conf(
    gpus_per_executor: int = 1,
    gpus_per_task: float = 1.0,
    discovery_script: str | None = None,
) -> dict[str, str]:
    """Resource configs that bind model-scorer tasks to GPUs — the Spark
    analog of the reference's one-process-per-GPU launch (it exports one
    CUDA device per worker rank, ``scripts/aestheticscore.sh:11-19``;
    SURVEY.md §4 item 2).

    With ``gpus_per_task=1`` every scorer task owns a whole device, so the
    per-executor lazy model singletons (``operators/model_adapters.py``)
    map 1:1 onto GPUs; a fractional amount (e.g. ``0.5``) co-schedules two
    model tasks per device when memory allows.  Pass the returned dict as
    ``extra_conf`` to :func:`get_spark`, or merge it into spark-submit
    confs.  ``discovery_script`` is required on standalone/YARN clusters
    (k8s injects discovery automatically); Spark exposes the assigned
    device in ``TaskContext.get().resources()["gpu"]``, which adapters can
    map to ``CUDA_VISIBLE_DEVICES`` at ``_load`` time.
    """
    conf = {
        "spark.executor.resource.gpu.amount": str(gpus_per_executor),
        "spark.task.resource.gpu.amount": str(gpus_per_task),
    }
    if discovery_script is not None:
        conf["spark.executor.resource.gpu.discoveryScript"] = discovery_script
    return conf
