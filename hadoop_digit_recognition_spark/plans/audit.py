"""Inspect executed/optimized physical plans as text.

Uses the same rendering as df.explain() (QueryExecution.explainString),
captured instead of printed, so audits can assert on it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The df.explain('formatted') text (scan details incl. PushedFilters
    and ReadSchema, operator tree, codegen ids)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters list that reaches a file scan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", explain_formatted(df)):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame, table_hint: str = "") -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning audit).
    table_hint filters to scans whose Location mentions the substring."""
    txt = explain_formatted(df)
    cols: list[list[str]] = []
    # operator detail blocks are separated by `\n(n) <Operator>` headers
    for block in re.split(r"\n\(\d+\) ", txt):
        if not block.startswith("Scan parquet"):
            continue
        if table_hint and table_hint not in block:
            continue
        m = re.search(r"ReadSchema: struct<(.*?)>", block, re.S)
        if m:
            cols.append([c.split(":")[0].strip()
                         for c in m.group(1).replace("\n", "").split(",")
                         if c.strip()])
    return cols


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_formatted(df)


def has_cartesian_product(df: DataFrame) -> bool:
    return "CartesianProduct" in explain_formatted(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """Map-side (partial) aggregation before the exchange — the combiner
    the reference never configured (SURVEY.md O1). Rendered as
    `Functions [n]: [partial_<agg>(...)]` in the map-side HashAggregate."""
    return "[partial_" in explain_formatted(df)


def wholestage_codegen_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans, from the simple-mode rendering's
    `*(n)` operator prefixes (wider/more spans = more of the plan fused
    into generated JVM loops)."""
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    return len(set(re.findall(r"\*\((\d+)\)", txt)))
