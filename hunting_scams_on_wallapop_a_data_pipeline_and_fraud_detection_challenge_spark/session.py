"""SparkSession factory tuned for this engine.

Defaults are chosen for scale-out behavior (AQE on, skew-join handling,
Arrow for the few pandas UDF paths) while remaining correct on
``local[*]``. On a real cluster the same settings hold; only
``shuffle_partitions`` should scale with executor count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "wallapop-hunting-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    - AQE enabled: runtime coalescing of small shuffle partitions and
      skew-join splitting — at 100 TB the skewed seller/category keys
      of the listing corpus are handled by AQE instead of manual salting.
    - Arrow enabled: the spec-extraction pandas UDF path (SURVEY §2.10)
      moves batches, not rows.
    - Session timezone pinned to UTC: the reference mixes epoch-millis,
      ISO strings and ES dates; we canonicalize to UTC timestamps.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
