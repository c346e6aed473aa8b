"""SparkSession factory.

Local testing runs one JVM with N threads (local[N]); the configuration
below is nevertheless written for the 1000-executor / 100 TB design point:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  broadcast conversion) — the single most important knob at scale.
- shuffle.partitions sized to cores locally; at cluster scale this is
  overridden per-job (rule of thumb: ~2-3x total executor cores, with AQE
  coalescing down).
- Arrow enabled: every pandas-UDF boundary is columnar, not pickled rows.
- UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "hdr-spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
