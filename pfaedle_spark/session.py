"""SparkSession factory tuned for this engine.

Local mode for tests/bench; the same config block is what we'd pass to
``spark-submit --py-files pfaedle_spark.zip`` on a real cluster — AQE
for runtime skew handling, Arrow for the pandas-UDF hot paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "pfaedle_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing, parallelism-first (the default): KB-scale
        # shuffles collapse to one task (minPartitionSize floor), while
        # CPU-heavy shuffles keep one partition per core — byte-first
        # sizing (parallelismFirst=false) was measured to serialize the
        # candidate-join stages and cap scaling efficiency at ~0.47.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # shuffle/spill dir: this box has ONE virtual disk — a shared
        # resource that serializes shuffle I/O regardless of core count
        # (a cluster's per-node local SSDs scale with executors). tmpfs
        # restores the per-core I/O a real deployment has.
        .config(
            "spark.local.dir",
            os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
