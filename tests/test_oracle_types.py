"""Oracle result-type sweep.

The driver's value hash is TYPE-SENSITIVE: a DuckDB HUGEINT column
materializes through pandas as object/float and hashes differently from
Spark's int64 even when every value is equal (this made
q12_shipping_mode_priority the one red row of round 3). DuckDB promotes
`sum(<integer>)` to HUGEINT, so any oracle that sums ints without a
::BIGINT cast is a scheduled future failure.

This sweep binds (not executes) every registered oracle against the
sf0.001 views and asserts no output column is HUGEINT/UHUGEINT.
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
