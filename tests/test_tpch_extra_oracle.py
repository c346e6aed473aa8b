"""Oracle comparison for the TPC-H shape analogs in operators/tpch_extra.py
(Q2/Q4/Q7-Q12/Q15-Q18/Q20-Q22) at sf0.01 — same t2-style compare as the
driver: row count, column names, order-insensitive value multiset."""

from __future__ import annotations

import pytest

from hadoop_digit_recognition_spark.all_queries import ORACLE_SQL, SPARK_QUERIES
from hadoop_digit_recognition_spark.operators import tpch_extra  # noqa: F401

from .conftest import SF_ORACLE
from .oracle_harness import compare

TPCH_EXTRA = [
    "q2_min_cost_supplier", "q4_order_priority", "q7_volume_shipping",
    "q8_national_market_share", "q9_product_type_profit",
    "q10_returned_item_reporting", "q11_important_stock",
    "q12_shipping_mode_priority", "q15_top_supplier",
    "q16_parts_supplier_count", "q17_small_quantity_revenue",
    "q18_large_volume_customer", "q20_excess_suppliers",
    "q21_suppliers_kept_waiting", "q22_dormant_customers",
]


def test_all_registered():
    missing = [n for n in TPCH_EXTRA if n not in SPARK_QUERIES]
    assert not missing, missing
    no_oracle = [n for n in TPCH_EXTRA if n not in ORACLE_SQL]
    assert not no_oracle, no_oracle


@pytest.mark.parametrize("name", TPCH_EXTRA)
def test_tpch_extra_vs_duckdb(spark, duck, name):
    df = SPARK_QUERIES[name](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL[name], name)


def test_q10_topk_plan_is_take_ordered(spark):
    """Q10's LIMIT 20 over ORDER BY must plan as TakeOrderedAndProject
    (per-partition heaps), not a global sort — the shape that survives a
    100 TB lineitem."""
    df = SPARK_QUERIES["q10_returned_item_reporting"](spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]
