"""Central query registry.

Every implemented operator from SURVEY.md §2 registers one named query
(a `(spark, sf_dir) -> DataFrame` callable) and, when SQL-expressible, a
DuckDB oracle SQL string computing the identical result on the same
parquet tables. The driver harness compares row count + schema +
order-insensitive value hash at sf0.01 (t2 gate).

Conventions that keep the hash comparison stable:
- alias every computed column identically on both sides;
- round floating aggregates (4-9 digits depending on magnitude);
- make every ranking deterministic with explicit tiebreakers;
- cast to types DuckDB agrees on (bigint for counts/sums of ints,
  double for floats).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; `oracle=None` marks it rows-only (non-SQL-expressible)."""
    def deco(fn):
        from functools import wraps

        from .shipping import ensure_shipped

        @wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_shipped(spark)
            return fn(spark, sf_dir)

        SPARK_QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return wrapped
    return deco
