"""Import every operator module for its registration side effects and
expose the populated registry. `__spark_entry__.py` re-exports these."""

from __future__ import annotations

from .registry import ORACLE_SQL, SPARK_QUERIES

from .rbm import queries as _rbm_queries  # noqa: F401,E402

_OPTIONAL_MODULES = [
    "hadoop_digit_recognition_spark.operators.relational",
    "hadoop_digit_recognition_spark.operators.arrays",
    "hadoop_digit_recognition_spark.operators.dedup",
    "hadoop_digit_recognition_spark.operators.similarity",
    "hadoop_digit_recognition_spark.operators.text",
    "hadoop_digit_recognition_spark.operators.multimodal",
    "hadoop_digit_recognition_spark.operators.windows",
    "hadoop_digit_recognition_spark.operators.physical",
    "hadoop_digit_recognition_spark.operators.sketches",
    "hadoop_digit_recognition_spark.operators.corpus",
    "hadoop_digit_recognition_spark.operators.pandas_udfs",
    "hadoop_digit_recognition_spark.ml.queries",
    "hadoop_digit_recognition_spark.ml.lsh",
    "hadoop_digit_recognition_spark.streaming.queries",
    "hadoop_digit_recognition_spark.sources.queries",
]

import importlib

for _m in _OPTIONAL_MODULES:
    try:
        importlib.import_module(_m)
    except ModuleNotFoundError as _e:
        # Only "module not built yet" is ignorable. A missing TRANSITIVE
        # dependency (pandas, pyspark.ml, ...) must re-raise — swallowing it
        # would silently shrink the registry the driver verifies.
        if _e.name != _m:
            raise

__all__ = ["SPARK_QUERIES", "ORACLE_SQL"]
