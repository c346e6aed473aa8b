"""Loaders for the driver-generated synthetic tables (TESTDATA.md).

The reference reads text lines from HDFS directories
(/root/reference/driver.java:161, TextInputFormat); the engine standard is
columnar Parquet with schema-on-read enforcement — scans get predicate
pushdown and column pruning for free (SURVEY.md S1/S2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() queries run
    against the same names the DuckDB oracle uses."""
    for t in TABLE_NAMES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
