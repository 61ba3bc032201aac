"""SparkSession construction with scale-aware defaults.

Local testing runs ``local[N]`` in one JVM, but every config here is chosen
to also be the right default on a multi-executor cluster: AQE on (runtime
shuffle coalescing + skew-join splitting), Arrow for the Python boundary,
UTC session timezone so results are comparable with external oracles,
and shuffle partitions sized to the parallelism rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dbt_decodable_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    On a real cluster ``master``/memory come from spark-submit; everything
    set here is cluster-safe (AQE, Arrow, UTC, partition sizing).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: ~cores; on a cluster AQE coalesces down from this.
        shuffle_partitions = max(cpus, 32)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # read un-annotated parquet timestamps as LTZ (UTC epoch) straight
        # from the scan — an NTZ read + cast would block range-predicate
        # pushdown (the round-6 tpch regression: PushedFilters lost the
        # shipdate/orderdate bounds)
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # files.maxPartitionBytes default 128MB is right for the 100 TB
        # target (keeps map tasks ~128MB); don't shrink it for local runs.
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
