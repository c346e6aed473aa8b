from __future__ import annotations

import pytest

from hadoop_digit_recognition_spark.all_queries import ORACLE_SQL, SPARK_QUERIES
from hadoop_digit_recognition_spark.operators import arrays  # noqa: F401

from .conftest import SF_ORACLE
from .oracle_harness import compare

ARRAY_QUERIES = [
    "arr_normalize", "arr_sigmoid", "arr_quantize", "arr_posexplode",
    "arr_concat_ws", "vec_self_dot", "vec_zip_ops", "arr_stats", "gemm_sql",
    "matrix_transpose_sql", "matrix_reshape_colpacked", "arr_explode_outer",
    "arr_higher_order_funcs",
]


@pytest.mark.parametrize("name", ARRAY_QUERIES)
def test_array_vs_duckdb(spark, duck, name):
    df = SPARK_QUERIES[name](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL[name], name)


def test_arr_normalize_array_matches_exploded(spark):
    """The pytest-only array-valued form re-exploded equals the registered
    exploded-scalar query (driver cannot hash array cells, so only the
    scalar form is registered)."""
    from pyspark.sql import functions as F

    arr = arrays.arr_normalize_array(spark, SF_ORACLE)
    re_exploded = (arr.select("vec_id", F.posexplode("norm").alias("i", "norm"))
                   .select("vec_id", F.col("i").cast("bigint").alias("i"), "norm"))
    registered = SPARK_QUERIES["arr_normalize"](spark, SF_ORACLE)
    assert re_exploded.exceptAll(registered).count() == 0
    assert registered.exceptAll(re_exploded).count() == 0
