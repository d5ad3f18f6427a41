"""SparkSession factory tuned for the engine's workload shape.

Local testing runs ``local[N]`` single-JVM; the same configs are the ones
that matter on a real multi-executor cluster (AQE, adaptive skew join,
Arrow batch transfer, shuffle-partition sizing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "zen3geo_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: parallelism for local mode (default: $SPARK_GRAFT_CPUS or all).
    shuffle_partitions: defaults to max(cores, 32) — sized so that at
    sf0.1-local each shuffle partition fits comfortably in memory, and on a
    real cluster is overridden by AQE coalescing anyway.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 32)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # geometry tables are tiny relative to point tables: let Spark
        # broadcast aggressively (dimension side of every spatial join)
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local mode runs every task thread in the driver JVM: size the heap
        # for cores x concurrent task allocations (string-heavy scans GC-
        # thrash in 8g at 32 threads)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "20g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
