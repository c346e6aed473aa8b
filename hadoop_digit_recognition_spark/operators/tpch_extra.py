"""Remaining TPC-H query shapes (Q2/Q4/Q15/Q17/Q18/Q21/Q22 analogs).

The reference has no joins at all (SURVEY.md §2.5) — these are engine
extensions completing the TPC-H shape coverage begun with Q1/Q3/Q5/Q6/
Q13/Q14/Q19. Each query is the SHAPE of its TPC-H namesake adapted to
the driver's star schema (FIXTURES.md §B: no partsupp/commitdate/
receiptdate/phone columns — supply cost derives from lineitem unit
prices, lateness from shipdate vs orderdate+lag, customer segment from
the trailing name digit).

All seven run through the spark.sql SQL PATH on registered temp views —
the point is Catalyst's subquery machinery: correlated scalar subqueries
(Q2, Q17), correlated EXISTS/NOT EXISTS (Q4, Q21, Q22), IN over a
grouped HAVING (Q18), and an uncorrelated scalar max over a CTE (Q15)
all decorrelate into joins/semi-joins/anti-joins — the same plans the
DataFrame API spells explicitly in operators/relational.py
(join_semi/join_anti/lateral_topk_per_group). Where the SQL dialects
agree, oracle text == Spark text; the correctness gate is then purely
about the optimizer rewrite, not the query wording.

At 100 TB: every decorrelated subquery becomes an equi-join on a key
column (partkey/orderkey/custkey/suppkey) — shuffle-partitioned,
AQE-coalesced; the grouped CTEs (cost, lat, revenue) pre-aggregate
before joining so the join inputs are group-count-sized, not
row-count-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..tables import register_views

_Q2 = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem WHERE l_quantity > 0
  GROUP BY l_partkey, l_suppkey
)
SELECT p.p_partkey, s.s_suppkey, s.s_name, n.n_name,
       round(c.unit_cost, 6) AS unit_cost
FROM part p
JOIN cost c ON c.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = c.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_size < 10
  AND c.unit_cost = (SELECT min(c2.unit_cost) FROM cost c2
                     WHERE c2.l_partkey = p.p_partkey)
"""


@query("q2_min_cost_supplier", oracle=_Q2)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each small part, the supplier(s) achieving the
    minimum observed unit cost — a CORRELATED SCALAR MIN subquery against
    a grouped CTE. Catalyst decorrelates it into an aggregate-then-join;
    the per-(part,supplier) cost CTE keeps the join input group-sized.
    Ties keep every minimal supplier (as in the real Q2)."""
    register_views(spark, sf_dir)
    return spark.sql(_Q2)


_Q4 = """
SELECT o_orderpriority, count(*) AS n
FROM orders o
WHERE year(o_orderdate) = 1996
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


@query("q4_order_priority", oracle=_Q4)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority counts of 1996 orders having at least one
    lineitem shipped 60+ days after the order date (the schema's stand-in
    for commitdate < receiptdate). The correlated EXISTS carries a
    NON-EQUI outer reference (shipdate vs orderdate+lag) on top of the
    orderkey equi-link; Catalyst still decorrelates to a left-semi join
    with the residual as join condition."""
    register_views(spark, sf_dir)
    return spark.sql(_Q4)


_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE year(l_shipdate) = 1996 AND quarter(l_shipdate) = 2
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, round(r.total_revenue, 4) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@query("q15_top_supplier", oracle=_Q15)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the quarter's top-revenue supplier via an
    UNCORRELATED scalar max subquery over the same revenue CTE (TPC-H
    spells it as a view used twice) — Spark plans the subquery once as a
    ReusedSubquery/scalar and broadcasts the one-row max into the filter.
    The max comparison runs on the unrounded sum (rounding only the
    output) so both engines pick the winner from identical values."""
    register_views(spark, sf_dir)
    return spark.sql(_Q15)


_Q17 = """
SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
"""


@query("q17_small_quantity_revenue", oracle=_Q17)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders — a
    correlated scalar AVG subquery per part key. Catalyst decorrelates it
    into a per-partkey aggregate joined back to the fact; at scale that is
    one extra keyed aggregation of the fact table, not a per-row probe."""
    register_views(spark, sf_dir)
    return spark.sql(_Q17)


_Q18 = """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice,
       round(sum(l.l_quantity), 2) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY l_orderkey HAVING sum(l_quantity) > 220)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice
"""


@query("q18_large_volume_customer", oracle=_Q18)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders via IN over a grouped HAVING
    subquery (threshold 220 ~ top few % of orders here). The IN-subquery
    plans as a left-semi join against the pre-aggregated orderkey set —
    the aggregate runs once over lineitem, not per outer row."""
    register_views(spark, sf_dir)
    return spark.sql(_Q18)


_Q21 = """
WITH lat AS (
  SELECT l.l_orderkey, l.l_suppkey,
         max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey, l.l_suppkey
)
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lat l1 ON l1.l_suppkey = s.s_suppkey
WHERE l1.late = 1
  AND EXISTS (SELECT 1 FROM lat l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lat l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.late = 1)
GROUP BY s.s_name
"""


@query("q21_suppliers_kept_waiting", oracle=_Q21)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: per supplier, the finished multi-supplier orders
    where THEY were the only late participant (late = shipped 90+ days
    after order date). EXISTS and NOT EXISTS over the same grouped CTE
    decorrelate into one semi- and one anti-join on orderkey; grouping
    lineitem to (orderkey, suppkey, late) FIRST keeps both join inputs
    group-sized — the form that survives a 100 TB lineitem."""
    register_views(spark, sf_dir)
    return spark.sql(_Q21)


_Q22 = """
SELECT substring(c_name, 18, 1) AS seg,
       count(*) AS numcust,
       round(sum(c_acctbal), 4) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND year(o.o_orderdate) >= 2000)
GROUP BY 1
"""


@query("q22_dormant_customers", oracle=_Q22)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers (balance above the positive
    mean — uncorrelated scalar subquery) with no recent orders (correlated
    NOT EXISTS -> anti-join), grouped by the name's trailing digit (the
    schema's stand-in for the phone country code)."""
    register_views(spark, sf_dir)
    return spark.sql(_Q22)
