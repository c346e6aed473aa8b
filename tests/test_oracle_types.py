"""Oracle result-type sweep.

The driver's value hash is TYPE-SENSITIVE: a DuckDB HUGEINT column
materializes through pandas as object/float and hashes differently from
Spark's int64 even when every value is equal (this made
q12_shipping_mode_priority the one red row of round 3). DuckDB promotes
`sum(<integer>)` to HUGEINT, so any oracle that sums ints without a
::BIGINT cast is a scheduled future failure.

Separately, the driver's canonicalizer (pandas sort_values over the
result frame) CANNOT HASH NON-SCALAR CELLS: a LIST/STRUCT/MAP output
column raises `TypeError: unhashable type` before any compare runs
(this made agg_collect_sorted the one red row of round 4, and
arr_normalize the red of round 1). Array-valued results must be joined
to strings (array_join / array_to_string) before registration; keep
array forms as pytest-only twins.

This sweep binds (not executes) every registered oracle against the
sf0.001 views and asserts no output column is HUGEINT/UHUGEINT and no
output column is LIST/ARRAY/STRUCT/MAP typed.
"""

import os

import duckdb
import pytest

from hadoop_digit_recognition_spark.all_queries import ORACLE_SQL

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

BANNED = {"HUGEINT", "UHUGEINT"}
# Non-scalar output types break the driver's pandas-based canonicalizer
# (unhashable cells). Matched structurally because DuckDB renders them
# parameterized: VARCHAR[], BIGINT[], STRUCT(a INT, ...), MAP(K, V).
def _is_nonscalar(type_str: str) -> bool:
    t = type_str.upper()
    return t.endswith("[]") or any(
        t.startswith(m) for m in ("STRUCT(", "MAP(", "UNION(", "LIST("))


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_oracle_returns_hugeint(con):
    offenders = {}
    for name, sql in sorted(ORACLE_SQL.items()):
        rel = con.sql(sql)
        bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
               if str(t).upper() in BANNED]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"{len(offenders)} oracle(s) return HUGEINT columns (driver hash "
        f"will mismatch Spark's int64): {offenders}"
    )


def test_no_oracle_returns_nonscalar(con):
    """LIST/STRUCT/MAP output columns crash the driver's canonicalizer
    (pandas sort_values → `unhashable type`). r01 arr_normalize and r04
    agg_collect_sorted both died this way; this bans the class."""
    offenders = {}
    for name, sql in sorted(ORACLE_SQL.items()):
        rel = con.sql(sql)
        bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
               if _is_nonscalar(str(t))]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"{len(offenders)} oracle(s) return non-scalar columns (driver "
        f"canonicalizer cannot hash list/struct/map cells): {offenders}"
    )


def test_no_spark_query_returns_nonscalar(spark):
    """The Spark side of every oracle-checked query must also emit only
    scalar columns — check the declared schemas without executing."""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = {}
    for name in sorted(ORACLE_SQL):
        df = SPARK_QUERIES[name](spark, SF_DIR)
        bad = [(f.name, f.dataType.simpleString()) for f in df.schema.fields
               if isinstance(f.dataType, (ArrayType, MapType, StructType))]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"{len(offenders)} registered Spark quer(ies) return non-scalar "
        f"columns (driver canonicalizer cannot hash them): {offenders}"
    )
