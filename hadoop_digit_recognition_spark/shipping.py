"""Ship the engine package to Spark Python workers.

Pandas-UDF closures reference module-level helpers; cloudpickle
serializes those by module reference, so every executor's Python worker
must be able to import `hadoop_digit_recognition_spark`. The consuming
process (the driver harness, a user notebook) may run with any cwd, so we
zip the package once per SparkContext and `addPyFile` it — the same
mechanism you'd use to deploy this engine to a real 1000-executor
cluster."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(tempfile.gettempdir(), f"hdr_spark_pkg_{os.getpid()}.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    sc.addPyFile(zpath)
    _SHIPPED.add(key)
