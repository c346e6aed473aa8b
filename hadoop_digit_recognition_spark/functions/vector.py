"""Vector column functions over array<float|double> embedding columns.

Built on F.zip_with / F.aggregate so the arithmetic stays JVM-side
(no Python). Used by similarity search and the SQL-expressible parts of
the linear-algebra kernel (SURVEY.md M5-M10).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two array columns, in float64."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (l2norm_col(a) * l2norm_col(b))


def det_hash64(s: Column) -> Column:
    """Deterministic 32-bit-range hash shared bit-for-bit with the DuckDB
    oracle: first 8 hex chars of md5, parsed as an integer. Used for
    minhash signatures and deterministic sampling, where Spark's native
    xxhash64/hash would diverge from any other engine."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
