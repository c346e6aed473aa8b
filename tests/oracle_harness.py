"""Local replica of the driver's t2 comparison: run a registered Spark
query and its DuckDB oracle on the same parquet, compare row count, column
names/dtypes, and an order-insensitive multiset of values."""

from __future__ import annotations

import math

import numpy as np


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, np.ndarray):
        return tuple(_norm_cell(x) for x in v.tolist())
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 vs 0.0 mismatches after rounding
        return v + 0.0 if v != 0 else 0.0
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


def compare(spark_df, duck_con, sql: str, name: str = "?") -> None:
    sdf = spark_df.toPandas()
    ddf = duck_con.sql(sql).df()
    s_cols = sorted(sdf.columns)
    d_cols = sorted(ddf.columns)
    assert s_cols == d_cols, f"{name}: columns differ {s_cols} vs {d_cols}"
    assert len(sdf) == len(ddf), f"{name}: row count {len(sdf)} vs {len(ddf)}"
    s_rows = _rows_multiset(list(sdf.columns), sdf.itertuples(index=False, name=None))
    d_rows = _rows_multiset(list(ddf.columns), ddf.itertuples(index=False, name=None))
    mism = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    assert not mism, f"{name}: {len(mism)} mismatched rows; first: {mism[:3]}"
