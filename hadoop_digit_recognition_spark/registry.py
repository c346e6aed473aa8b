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
# name -> (why no oracle can exist, pytest that bounds the result anyway);
# REQUIRED for every oracle=None registration (tests enforce it), so each
# rows-only row in QUERIES.md carries its justification + bounding test.
ROWS_ONLY: dict[str, tuple[str, str]] = {}
# Queries that EXECUTE a Spark job at construction time (before the caller
# acts on the returned frame) — e.g. the Observation-API audit, whose
# metrics only exist after its noop-sink pass runs. Registry-level metadata
# (ADVICE r07) so callers that only want the lazy plan know they will pay a
# scan; the plan-hygiene test derives its exemption from this set.
EAGER_QUERIES: set[str] = set()


def query(name: str, oracle: str | None = None,
          rows_only: tuple[str, str] | None = None,
          eager: bool = False):
    """Register a query; `oracle=None` marks it rows-only (non-SQL-expressible)
    and then requires `rows_only=(reason, bounding_test_name)`. `eager=True`
    declares that CALLING the query runs a Spark job before returning."""
    def deco(fn):
        from functools import wraps

        from .shipping import ensure_shipped

        @wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_shipped(spark)
            return fn(spark, sf_dir)

        SPARK_QUERIES[name] = wrapped
        if eager:
            EAGER_QUERIES.add(name)
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        elif rows_only is not None:
            ROWS_ONLY[name] = rows_only
        return wrapped
    return deco
