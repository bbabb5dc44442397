"""SparkSession factory with the engine's scale-tuned defaults.

These settings encode the 100TB design decisions so every entry point
(tests, bench, driver) runs the same physical configuration:

- AQE on (runtime coalescing + skew-join splitting — the backstop for
  hot-cell skew beyond our explicit salting),
- shuffle partitions sized to cores at local scale (cluster deploys
  override via spark-submit conf; AQE coalesces down anyway),
- Arrow enabled with a bounded batch size: the pandas-UDF kernels are
  O(batch) memory, and 10k rows x 3 float64 arrays keeps each Python
  worker's resident set small even with 32 concurrent tasks,
- broadcast threshold raised to 64MB: polygon edge lists, grid
  catalogs, and query-point sets are all designed to be broadcast
  (zero-shuffle joins for the 10^12-row probe side).
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app: str = "proj-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or max(2 * cpus, 32)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
