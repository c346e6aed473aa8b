from __future__ import annotations

import pytest

from hadoop_digit_recognition_spark.all_queries import ORACLE_SQL, SPARK_QUERIES
from hadoop_digit_recognition_spark.operators import arrays  # noqa: F401

from .conftest import SF_ORACLE
from .oracle_harness import compare

ARRAY_QUERIES = [
    "arr_normalize", "arr_sigmoid", "arr_quantize", "arr_posexplode",
    "arr_concat_ws", "vec_self_dot", "vec_zip_ops", "arr_stats", "gemm_sql",
    "matrix_transpose_sql", "matrix_reshape_colpacked",
]


@pytest.mark.parametrize("name", ARRAY_QUERIES)
def test_array_vs_duckdb(spark, duck, name):
    df = SPARK_QUERIES[name](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL[name], name)
