"""SparkSession factory tuned for the sandbox (local[N]) and documented for
the 1000-executor design point.

Scale notes (100 TB / 10^10-URL frontier):
- AQE on: runtime shuffle-partition coalescing + skew-join splitting.
- shuffle.partitions tracks parallelism locally; on a real cluster this is
  2-3× total cores and the frontier's explicit `part` bucketing (frontier.py)
  keeps the hot-path window/merge shuffles partition-aligned regardless.
- Arrow enabled: every pandas UDF crosses the JVM↔Python boundary in Arrow
  batches (BASELINE.json input_hint: vectorized, no per-row Python).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "dumb_crawler_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
