"""Relational operator coverage (SURVEY.md §2.5 phase 1).

The reference has NO joins, sorts, windows, set ops or SQL functions —
its only shuffle operators are a keyed sum and an identity pass-through
(/root/reference/rbmreducer.java:20-30, propreducer.java:16-23; absence
documented in SURVEY.md §2.5). Everything here is therefore engine
extension built purely from Spark built-ins, so Catalyst owns pushdown,
pruning, join selection and partial aggregation (SURVEY.md §4 O10).

Scale notes (100 TB posture) are attached per query where a plan choice
matters: broadcast hints for dimension tables, deterministic tiebreakers
instead of nondeterministic row_number ties, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.vector import det_hash64
from ..registry import query
from ..tables import load

# --------------------------------------------------------------------------
# Scans / filters / projections (S1, P1-P2 analogs)
# --------------------------------------------------------------------------


@query("scan_filter_project", oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 4) AS net_price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_quantity < 10
""")
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level scan->filter->project; both predicates and the 4-column
    read schema push down to the parquet scan (verify via .explain:
    PushedFilters + ReadSchema)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_quantity") < 10))
        .select(
            "l_orderkey", "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            .alias("net_price"))
    )


@query("q1_pricing_summary", oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4)                                        AS sum_qty,
       round(sum(l_extendedprice), 4)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
       round(avg(l_quantity), 6)                                        AS avg_qty,
       round(avg(l_extendedprice), 6)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical wide-agg scan. Catalyst plans partial
    (map-side) + final HashAggregate — the combiner the reference never
    configured (SURVEY.md O1)."""
    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
             F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
             F.round(F.sum(disc), 4).alias("sum_disc_price"),
             F.round(F.sum(disc * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
             F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
             F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
             F.round(F.avg("l_discount"), 6).alias("avg_disc"),
             F.count(F.lit(1)).alias("count_order"))
    )


@query("q6_forecast_revenue", oracle="""
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""")
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: fully-pushable conjunctive filter + global agg."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4)
             .alias("revenue"))
    )


@query("sample_deterministic", oracle="""
SELECT l_orderkey, l_linenumber
FROM lineitem
WHERE ('0x' || substr(md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)), 1, 8))::BIGINT % 100 < 25
""")
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~25% Bernoulli sample via a content hash — the
    engine's answer to the reference's fresh-unseeded-Random sampling
    (P6 / SURVEY.md §7 'distributed RNG'): same rows on any cluster, any
    partitioning, any engine."""
    li = load(spark, sf_dir, "lineitem")
    key = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")
    return (li.filter(det_hash64(key) % 100 < 25)
            .select("l_orderkey", "l_linenumber"))


# --------------------------------------------------------------------------
# Joins (absent in reference; closest analog is weight broadcast S4)
# --------------------------------------------------------------------------


@query("join_broadcast_dim", oracle="""
SELECT p.p_brand,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       count(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""")
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact x small-dim equi-join with an explicit broadcast hint: the
    100 TB plan is BroadcastHashJoin (dim ships to every executor, fact
    never shuffles) — the table-vs-table form of the reference's
    DistributedCache weight broadcast (/root/reference/driver.java:141)."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("p_brand")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


@query("join_star_nation_revenue", oracle="""
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""")
def join_star_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join. Fact-fact (lineitem-orders) goes
    sort-merge/shuffle-hash on the shared key; all dims broadcast. At
    100 TB the orders-lineitem co-location would come from bucketing both
    on orderkey (see SCALE.md)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s),
              (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("revenue"))
    )


@query("join_left_outer", oracle="""
SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
       round(coalesce(sum(o.o_totalprice), 0.0), 4) AS total_spent
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
""")
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: every left row survives; unmatched right side nulls."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"),
             F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4)
             .alias("total_spent"))
    )


@query("join_semi", oracle="""
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""")
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left_semi: probe side streams, no row duplication."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .select("c_custkey", "c_mktsegment"))


@query("join_anti", oracle="""
SELECT c_custkey, c_acctbal FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""")
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left_anti (customers with no large order — the
    unfiltered variant is empty on this data, which would verify nothing)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_acctbal"))


@query("join_full_outer", oracle="""
SELECT coalesce(cu.k, su.k) AS n_nationkey,
       coalesce(cu.n_cust, 0) AS n_cust,
       coalesce(su.n_supp, 0) AS n_supp
FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) cu
FULL OUTER JOIN
     (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) su
ON cu.k = su.k
""")
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join keeps unmatched rows from BOTH sides (null-padded)."""
    cu = (load(spark, sf_dir, "customer").groupBy(F.col("c_nationkey").alias("k"))
          .agg(F.count(F.lit(1)).alias("n_cust")))
    su = (load(spark, sf_dir, "supplier").groupBy(F.col("s_nationkey").alias("k"))
          .agg(F.count(F.lit(1)).alias("n_supp")))
    return (
        cu.join(su, "k", "full_outer")
        .select(F.col("k").alias("n_nationkey"),
                F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
                F.coalesce("n_supp", F.lit(0)).alias("n_supp"))
    )


@query("join_nonequi_band", oracle="""
SELECT s.s_suppkey, count(*) AS n_pricier,
       round(sum(l.l_extendedprice), 4) AS total
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
              AND l.l_extendedprice > s.s_acctbal
GROUP BY s.s_suppkey
""")
def join_nonequi_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + theta residual: hash join on suppkey, residual filter
    evaluated inside the join — not a nested-loop over the fact table."""
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    return (
        l.join(F.broadcast(s),
               (l.l_suppkey == s.s_suppkey)
               & (l.l_extendedprice > s.s_acctbal))
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_pricier"),
             F.round(F.sum("l_extendedprice"), 4).alias("total"))
    )


@query("join_theta_bnl", oracle="""
SELECT r.r_name, count(*) AS n_nations
FROM region r JOIN nation n ON n.n_regionkey < r.r_regionkey
GROUP BY r.r_name
""")
def join_theta_bnl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta join (no equi key) -> BroadcastNestedLoopJoin; only ever
    sane between small/broadcastable inputs, which is exactly this shape."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey < r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


# --------------------------------------------------------------------------
# Aggregation variants (A1 generalizations)
# --------------------------------------------------------------------------


@query("agg_having", oracle="""
SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 4) AS total
FROM orders GROUP BY o_custkey HAVING count(*) >= 15
""")
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregate + post-aggregation HAVING filter over orders."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 4).alias("total"))
        .filter(F.col("n_orders") >= 15)
    )


@query("agg_distinct", oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
""")
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple count-distincts in one agg: Catalyst expands to
    grouping-id based partial aggregation, no per-key row explosion."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n_parts"),
             F.countDistinct("l_suppkey").alias("n_supps"),
             F.count(F.lit(1)).alias("n_rows"))
    )


@query("agg_stats", oracle="""
SELECT l_linestatus,
       round(stddev_samp(l_quantity), 6) AS sd_qty,
       round(var_samp(l_quantity), 6)    AS var_qty,
       round(min(l_extendedprice), 4)    AS min_price,
       round(max(l_extendedprice), 4)    AS max_price,
       round(avg(l_tax), 6)              AS avg_tax
FROM lineitem GROUP BY l_linestatus
""")
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-statistic aggregate (sum/avg/min/max/stddev/variance) per line status."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
             F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
             F.round(F.min("l_extendedprice"), 4).alias("min_price"),
             F.round(F.max("l_extendedprice"), 4).alias("max_price"),
             F.round(F.avg("l_tax"), 6).alias("avg_tax"))
    )


@query("agg_rollup", oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
""")
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals: (flag, status) -> flag -> grand total, grouping-id tagged."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
             F.grouping_id().cast("bigint").alias("gid"))
    )


@query("agg_cube", oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
""")
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (flag, status): every grouping combination in one pass."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
             F.grouping_id().cast("bigint").alias("gid"))
    )


_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@query("agg_grouping_sets", oracle=_GROUPING_SETS_SQL)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same SQL text runs on both engines (SQL API surface)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUPING_SETS_SQL)


@query("distinct_pairs", oracle="""
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
""")
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a projected pair: one shuffle on both columns."""
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@query("window_rank_topk", oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t
WHERE rn <= 3
""")
def window_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: window + filter. Deterministic because the sort
    carries a unique tiebreaker (orderkey) — row_number over a non-unique
    ordering is nondeterministic under any distributed engine."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (o.select("o_custkey", "o_orderkey", "o_totalprice",
                     F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") <= 3))


@query("window_running_sum", oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       round(sum(l_quantity) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_qty
FROM lineitem
""")
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum frame (rows unbounded preceding to current) per
    supplier. The ORDER BY must be TOTAL for the prefix sums to be
    engine-invariant: regenerated testdata can contain duplicate
    (orderkey, linenumber) rows, and a tie lets each engine pick which
    of the pair gets the smaller prefix. l_quantity closes the order —
    any rows still tied are value-identical, so their order cannot
    change any prefix."""
    li = load(spark, sf_dir, "lineitem")
    w = (W.partitionBy("l_suppkey")
         .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return li.select("l_suppkey", "l_orderkey", "l_linenumber",
                     F.round(F.sum("l_quantity").over(w), 4).alias("running_qty"))


@query("window_lag_lead", oracle="""
SELECT event_id, user_id,
       lag(event_id)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_id,
       lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_id
FROM events
""")
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytic window: previous and next value per user ordered by time."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select("event_id", "user_id",
                     F.lag("event_id").over(w).alias("prev_id"),
                     F.lead("event_id").over(w).alias("next_id"))


@query("sort_limit_topk", oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 10
""")
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heaps + driver merge of k rows, never a full sort at scale."""
    li = load(spark, sf_dir, "lineitem")
    return (li.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
            .select("l_orderkey", "l_linenumber", "l_extendedprice")
            .limit(10))


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------


@query("set_union", oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
""")
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two projections; duplicates collapse in one shuffle."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query("set_intersect", oracle="""
SELECT o_custkey AS k FROM orders WHERE o_totalprice > 350000
INTERSECT
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
""")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: distinct rows present on both sides."""
    a = (load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
         .select(F.col("o_custkey").alias("k")))
    b = (load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
         .select(F.col("c_custkey").alias("k")))
    return a.intersect(b)


@query("set_except", oracle="""
SELECT c_custkey AS k FROM customer
EXCEPT
SELECT o_custkey FROM orders WHERE o_totalprice > 300000
""")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: multiset difference with duplicate multiplicity preserved."""
    a = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    b = (load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
         .select(F.col("o_custkey").alias("k")))
    # subtract == EXCEPT DISTINCT (exceptAll().distinct() differs when a
    # row appears more often left than right)
    return a.subtract(b)


# --------------------------------------------------------------------------
# Scalar function surface (string / date / math / JSON / conditional)
# --------------------------------------------------------------------------


@query("string_funcs", oracle="""
SELECT p_partkey,
       upper(p_brand)                  AS brand_u,
       substring(p_name, 1, 8)         AS name_pfx,
       CAST(length(p_name) AS BIGINT)  AS name_len,
       replace(p_type, ' ', '_')       AS type_u,
       concat_ws('|', p_brand, p_type) AS tag
FROM part WHERE p_name LIKE '%ol%'
""")
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar surface: upper/lower/substring/trim/concat/length/replace."""
    p = load(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").like("%ol%"))
        .select("p_partkey",
                F.upper("p_brand").alias("brand_u"),
                F.substring("p_name", 1, 8).alias("name_pfx"),
                F.length("p_name").cast("bigint").alias("name_len"),
                F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_u"),
                F.concat_ws("|", "p_brand", "p_type").alias("tag"))
    )


@query("date_funcs", oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT)  AS y,
       CAST(month(o_orderdate) AS BIGINT) AS m,
       date_trunc('month', o_orderdate)   AS month_start,
       count(*) AS n, round(sum(o_totalprice), 4) AS total
FROM orders
GROUP BY 1, 2, 3
""")
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface: year/month extraction and month truncation over orders."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").cast("bigint").alias("y"),
                  F.month("o_orderdate").cast("bigint").alias("m"),
                  F.date_trunc("month", F.col("o_orderdate")).alias("month_start"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("o_totalprice"), 4).alias("total"))
    )


@query("math_funcs", oracle="""
SELECT l_orderkey, l_linenumber,
       round(sqrt(l_extendedprice), 6)          AS sqrt_price,
       round(ln(l_extendedprice), 6)            AS ln_price,
       round(pow(1 + l_discount, 3), 6)         AS disc_cubed,
       round(abs(l_tax - l_discount), 6)        AS tax_gap,
       CAST(ceil(l_quantity) AS BIGINT)         AS qty_ceil,
       CAST(floor(l_extendedprice) AS BIGINT)   AS price_floor
FROM lineitem WHERE l_orderkey % 37 = 0
""")
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar surface: abs/ceil/floor/sqrt/exp/ln/pow/mod kept JVM-side."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") % 37 == 0)
        .select("l_orderkey", "l_linenumber",
                F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
                F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
                F.round(F.pow(F.lit(1) + F.col("l_discount"), 3), 6).alias("disc_cubed"),
                F.round(F.abs(F.col("l_tax") - F.col("l_discount")), 6).alias("tax_gap"),
                F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
                F.floor("l_extendedprice").cast("bigint").alias("price_floor"))
    )


@query("case_when_bucket", oracle="""
SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
            WHEN o_totalprice < 250000 THEN 'mid'
            ELSE 'high' END AS bucket,
       count(*) AS n, round(avg(o_totalprice), 6) AS avg_price
FROM orders GROUP BY 1
""")
def case_when_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing into value bands, then counts per band."""
    o = load(spark, sf_dir, "orders")
    bucket = (F.when(F.col("o_totalprice") < 100000, "low")
              .when(F.col("o_totalprice") < 250000, "mid")
              .otherwise("high").alias("bucket"))
    return (o.groupBy(bucket)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("o_totalprice"), 6).alias("avg_price")))


@query("json_extract", oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       count(*) AS n, round(avg(value), 6) AS avg_value
FROM events GROUP BY 1
""")
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.props is a JSON string column (FIXTURES.md)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (ev.groupBy((k % 10).alias("k_bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("value"), 6).alias("avg_value")))


@query("pivot_conditional", oracle="""
SELECT user_id,
       round(sum(CASE WHEN event_type = 'click'    THEN value ELSE 0 END), 6) AS click_v,
       round(sum(CASE WHEN event_type = 'view'     THEN value ELSE 0 END), 6) AS view_v,
       round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 6) AS purchase_v,
       count(*) AS n_events
FROM events GROUP BY user_id
""")
def pivot_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot via conditional aggregation — shuffle-count identical to a
    plain groupBy regardless of pivot width (vs .pivot() which needs a
    distinct-values pass or an explicit value list)."""
    ev = load(spark, sf_dir, "events")

    def piv(t):
        return F.round(
            F.sum(F.when(F.col("event_type") == t, F.col("value")).otherwise(0.0)), 6)

    return (ev.groupBy("user_id")
            .agg(piv("click").alias("click_v"),
                 piv("view").alias("view_v"),
                 piv("purchase").alias("purchase_v"),
                 F.count(F.lit(1)).alias("n_events")))


@query("join_null_safe", oracle="""
WITH e AS (
  SELECT event_id,
         CASE WHEN event_id % 10 = 0 THEN NULL ELSE event_type END AS k,
         value
  FROM events
),
d AS (SELECT NULL AS k, -1.0 AS w UNION ALL
      SELECT 'click', 1.0 UNION ALL SELECT 'view', 0.5)
SELECT coalesce(e.k, '<null>') AS k, count(*) AS n,
       round(sum(e.value * d.w), 6) AS weighted
FROM e JOIN d ON e.k IS NOT DISTINCT FROM d.k
GROUP BY 1
""")
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of vanishing — the semantic corner every
    engine must define (standard equi-join drops NULL keys on both
    sides). Executed as a plain hash join; the null bucket is just
    another key."""
    ev = (load(spark, sf_dir, "events")
          .select("event_id",
                  F.when(F.col("event_id") % 10 == 0, F.lit(None))
                  .otherwise(F.col("event_type")).alias("k"),
                  "value"))
    dim = spark.createDataFrame(
        [(None, -1.0), ("click", 1.0), ("view", 0.5)],
        "k string, w double")
    return (ev.join(F.broadcast(dim), ev.k.eqNullSafe(dim.k))
            .groupBy(F.coalesce(ev.k, F.lit("<null>")).alias("k"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum(ev.value * dim.w), 6).alias("weighted")))


@query("agg_median_quartiles", oracle="""
SELECT event_type,
       round(median(value), 6) AS med,
       round(quantile_cont(value, 0.25), 6) AS q1,
       round(quantile_cont(value, 0.75), 6) AS q3
FROM events GROUP BY event_type
""")
def agg_median_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median and quartiles (continuous interpolation — the same
    definition as SQL percentile_cont). Exact percentiles need the full
    group's values; the bounded-state alternative at 100 TB is
    sketch_quantiles."""
    ev = load(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.round(F.median("value"), 6).alias("med"),
                 F.round(F.expr("percentile(value, 0.25)"), 6).alias("q1"),
                 F.round(F.expr("percentile(value, 0.75)"), 6).alias("q3")))


@query("scalar_subquery_filter", oracle="""
SELECT event_id, round(value, 6) AS value
FROM events
WHERE value > 2 * (SELECT avg(value) FROM events)
""")
def scalar_subquery_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery through the spark.sql entry path
    (every other query uses the DataFrame API; this one proves the SQL
    front door compiles to the same Catalyst plans — the subquery becomes
    a broadcast scalar, SURVEY.md §4 O10 'subquery handling')."""
    from ..tables import register_views
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT event_id, round(value, 6) AS value
        FROM events
        WHERE value > 2 * (SELECT avg(value) FROM events)
    """)


@query("exists_subquery", oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
""")
def exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery (SQL path): Catalyst decorrelates it
    into a left-semi hash join — the plan join_semi builds explicitly,
    derived here by the optimizer from the nested form."""
    from ..tables import register_views
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    """)


@query("unpivot_measures", oracle="""
SELECT measure, count(*) AS n, round(sum(val), 4) AS total
FROM (
  SELECT 'quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'discount', l_discount FROM lineitem
  UNION ALL SELECT 'tax', l_tax FROM lineitem
) GROUP BY measure
""")
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide measure columns -> long (measure, val) rows,
    then a per-measure aggregate. Spark's unpivot is a narrow expression
    expansion (each input row emits 4 — no shuffle, no join); the oracle
    states the same operation as the classic UNION ALL. The inverse of
    pivot_conditional."""
    li = load(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[], values=["l_quantity", "l_extendedprice", "l_discount",
                        "l_tax"],
        variableColumnName="measure", valueColumnName="val")
    measure = F.regexp_replace("measure", "^l_", "")
    return (long.select(measure.alias("measure"), "val")
            .groupBy("measure")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("val"), 4).alias("total")))


@query("map_funcs", oracle="""
WITH kv AS (
  SELECT k.key,
         CAST(json_extract_string(e.props, '$.' || k.key) AS BIGINT) AS val
  FROM events e, unnest(json_keys(e.props)) k(key)
)
SELECT key, count(*) AS n,
       CAST(sum(val) AS BIGINT) AS total,
       CAST(min(val) AS BIGINT) AS lo,
       CAST(max(val) AS BIGINT) AS hi
FROM kv GROUP BY key
""")
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: JSON props parsed to map<string,bigint>
    (from_json), entries exploded to (key, value) rows, per-key
    aggregation — the schema-on-read path for semi-structured columns
    whose key set is open. The oracle walks the same JSON generically via
    unnest(json_keys(...)) + json_extract per key. Explode of a map is a narrow generator; only the
    per-key aggregate shuffles (distinct keys, not rows, after partial
    agg)."""
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (ev.select(F.explode(m).alias("key", "val"))
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("val").alias("total"),
                 F.min("val").alias("lo"),
                 F.max("val").alias("hi")))


@query("sample_stratified", oracle="""
SELECT event_id, event_type
FROM events
WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 100 <
      CASE event_type WHEN 'purchase' THEN 90
                      WHEN 'click' THEN 20
                      ELSE 5 END
""")
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified Bernoulli sample with per-stratum rates (keep 90% of
    rare purchases, 20% of clicks, 5% of everything else) — the
    class-rebalancing downsample every imbalanced corpus needs. Same
    content-hash determinism as sample_deterministic (df.sampleBy is
    partition-order-sensitive and engine-private, so it cannot be
    oracle-checked); a narrow filter, no shuffle, trivially reproducible
    on any cluster."""
    ev = load(spark, sf_dir, "events")
    rate = (F.when(F.col("event_type") == "purchase", 90)
            .when(F.col("event_type") == "click", 20)
            .otherwise(5))
    return (ev.filter(det_hash64(F.col("event_id").cast("string")) % 100 < rate)
            .select("event_id", "event_type"))


@query("window_first_last_nth", oracle="""
SELECT event_id, user_id,
       first_value(event_id) OVER w AS first_id,
       last_value(event_id) OVER
         (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_id,
       nth_value(event_id, 3) OVER
         (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_id,
       first_value(CASE WHEN event_type = 'purchase' THEN event_id END
                   IGNORE NULLS) OVER w AS first_purchase_id
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window analytics: first_value, whole-partition
    last_value / nth_value (explicit unbounded frame — the default frame
    ends at CURRENT ROW, the classic last_value gotcha), and
    first_value(... IGNORE NULLS) for 'first event of a kind' feature
    extraction."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    purchase_id = F.when(F.col("event_type") == "purchase", F.col("event_id"))
    return ev.select(
        "event_id", "user_id",
        F.first("event_id").over(w).alias("first_id"),
        F.last("event_id").over(wfull).alias("last_id"),
        F.nth_value("event_id", 3).over(wfull).alias("third_id"),
        F.first(purchase_id, ignorenulls=True).over(w)
        .alias("first_purchase_id"))


@query("error_safe_funcs", oracle="""
SELECT event_id,
       CASE WHEN (event_id % 7) = 0 THEN NULL
            ELSE round(value / (event_id % 7), 6) END AS safe_div,
       TRY_CAST(CASE WHEN event_type = 'view' THEN 'x' || event_type
                     ELSE CAST(event_id AS VARCHAR) END AS BIGINT) AS maybe_id,
       nullif(event_type, 'view') AS type_or_null
FROM events
""")
def error_safe_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression surface: try_divide (NULL on /0 instead of a
    job-killing exception under ANSI mode), try_cast (NULL on malformed
    input — the dirty-data survival function every 100 TB ingest needs),
    nullif. The oracle states the same semantics with CASE/TRY_CAST."""
    ev = load(spark, sf_dir, "events")
    denom = F.col("event_id") % 7
    maybe_num = F.when(F.col("event_type") == "view",
                       F.concat(F.lit("x"), F.col("event_type"))
                       ).otherwise(F.col("event_id").cast("string"))
    return ev.select(
        "event_id",
        F.round(F.try_divide(F.col("value"), denom), 6).alias("safe_div"),
        maybe_num.try_cast("bigint").alias("maybe_id"),
        F.nullif(F.col("event_type"), F.lit("view")).alias("type_or_null"))


@query("q3_shipping_priority", oracle="""
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       o.o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-06-01'
  AND l.l_shipdate  > TIMESTAMP '1997-06-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""")
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact join -> agg -> top-k.

    The scale-shaped plan: the filtered customer side broadcasts into
    orders (BHJ, no shuffle of the fact), orders joins lineitem on the
    shared orderkey (SMJ on the big pair), aggregation is partial+final,
    and the ORDER BY .. LIMIT plans as TakeOrderedAndProject — no global
    sort ever materializes. Reference analog: none (joins absent,
    SURVEY.md 2.5); this is the engine-extension star-query workhorse."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp_ntz")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp_ntz")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (li.join(orders.join(F.broadcast(cust),
                                F.col("o_custkey") == F.col("c_custkey"))
                    .select("o_orderkey", "o_orderdate", "o_orderpriority"),
                    F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4).alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
            .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
            .limit(10))


@query("q13_customer_distribution", oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""")
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with a predicate INSIDE the join
    condition (rows failing it keep the customer, null the order — a
    filter-above-join would wrongly drop customers), then two stacked
    aggregations. Scale shape: both aggs are partial+final; the second
    agg's input is one row per customer, already tiny. The first groupBy
    reuses the join's hash partitioning on c_custkey when AQE keeps the
    exchange — no extra shuffle."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (cust.join(orders,
                          (F.col("c_custkey") == F.col("o_custkey"))
                          & (F.col("o_orderpriority") != "1-URGENT"),
                          "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


@query("window_distribution_ranks", oracle="""
SELECT event_id, event_type,
       round(percent_rank() OVER w, 9) AS pct_rank,
       round(cume_dist()    OVER w, 9) AS cdist,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
""")
def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist / ntile
    per event_type. The (value, event_id) ordering is total, so every
    rank is deterministic and engine-independent. One shuffle on the
    partition key; each partition sorts locally — no global sort."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id", "event_type",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cdist"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"))


@query("lateral_topk_per_group", oracle="""
SELECT n.n_name, c.c_name, c.c_acctbal
FROM nation n JOIN LATERAL (
  SELECT c_name, c_acctbal FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2) c ON true
""")
def lateral_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 customers per nation) through
    the spark.sql path — the modern SQL spelling of per-group top-k.
    Catalyst decorrelates the lateral into a join + per-key window
    rather than executing one subquery per outer row; semantically
    identical to window_rank_topk's row_number form."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql("""
      SELECT n.n_name, c.c_name, c.c_acctbal
      FROM nation_v n JOIN LATERAL (
        SELECT c_name, c_acctbal FROM customer_v
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name LIMIT 2) c""")


@query("agg_regression_stats", oracle="""
SELECT event_type,
       round(regr_slope(value, user_id), 6)     AS slope,
       round(regr_intercept(value, user_id), 6) AS intercept,
       round(regr_r2(value, user_id), 6)        AS r2,
       round(corr(value, user_id), 6)           AS corr_vu,
       round(covar_samp(value, user_id), 6)     AS covar_vu
FROM events GROUP BY event_type
""")
def agg_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistical aggregates (least-squares fit, correlation,
    covariance) per key — single-pass partial+final aggregation of the
    (n, sum x, sum y, sum xy, sum x2, sum y2) moment state, the same
    mergeable-state shape as every other agg here. Rounded to 6 digits
    so the float summation order cannot flip the hash."""
    ev = load(spark, sf_dir, "events")
    y, x = F.col("value"), F.col("user_id")
    return (ev.groupBy("event_type")
            .agg(F.round(F.regr_slope(y, x), 6).alias("slope"),
                 F.round(F.regr_intercept(y, x), 6).alias("intercept"),
                 F.round(F.regr_r2(y, x), 6).alias("r2"),
                 F.round(F.corr(y, x), 6).alias("corr_vu"),
                 F.round(F.covar_samp(y, x), 6).alias("covar_vu")))


@query("agg_argmax_conditional", oracle="""
WITH ranked AS (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id DESC) AS rmax,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value ASC, event_id ASC) AS rmin
  FROM events
),
args AS (
  SELECT event_type,
         max(CASE WHEN rmax = 1 THEN event_id END) AS top_event,
         max(CASE WHEN rmin = 1 THEN event_id END) AS bottom_event
  FROM ranked GROUP BY event_type
)
SELECT a.event_type, a.top_event, a.bottom_event,
       c.n_high, c.any_extreme, c.all_positive
FROM args a JOIN (
  SELECT event_type,
         count(*) FILTER (WHERE value > 50) AS n_high,
         bool_or(value > 99)  AS any_extreme,
         bool_and(value > 0)  AS all_positive
  FROM events GROUP BY event_type) c ON c.event_type = a.event_type
""")
def agg_argmax_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin (max_by/min_by) and conditional aggregates
    (count_if, bool_or, bool_and) per key — all single-pass mergeable
    aggregates. The struct ordering key (value, event_id) makes the
    arg-extremes deterministic under ties; the oracle states the same
    selection with ranked windows, so the semantics (not just the
    built-in's name) are what is verified."""
    ev = load(spark, sf_dir, "events")
    key = F.struct(F.col("value"), F.col("event_id"))
    return (ev.groupBy("event_type")
            .agg(F.max_by("event_id", key).alias("top_event"),
                 F.min_by("event_id", key).alias("bottom_event"),
                 F.count_if(F.col("value") > 50).alias("n_high"),
                 F.bool_or(F.col("value") > 99).alias("any_extreme"),
                 F.bool_and(F.col("value") > 0).alias("all_positive")))


@query("q14_promo_revenue", oracle="""
SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-02-01'
""")
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: time-sliced fact scan, dimension broadcast join,
    conditional-vs-total revenue ratio in ONE aggregate pass (both sums
    share the partial-agg state; no second scan, no self-join). The
    month filter prunes at the parquet scan."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp_ntz"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(F.broadcast(part),
                    F.col("l_partkey") == F.col("p_partkey"))
            .agg(F.round(100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev)
                                       .otherwise(0.0)) / F.sum(rev), 6)
                 .alias("promo_pct")))


@query("q19_disjunctive_join", oracle="""
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       count(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_type = 'PROMO'    AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_type = 'ECONOMY'  AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity >= 20 AND l.l_quantity <= 40)
""")
def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive predicates spanning
    BOTH join sides. Catalyst derives the per-side implied filters
    (p_type IN (...), l_quantity BETWEEN min..max) and pushes them below
    the join, so each scan prunes before the (broadcast) join and only
    the residual OR is evaluated on joined rows — the OR never forces a
    full cross evaluation."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type", "p_size")
    cond = (
        ((F.col("p_type") == "PROMO") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(10, 30))
        | ((F.col("p_type") == "ECONOMY") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(20, 40)))
    return (li.join(F.broadcast(part),
                    F.col("l_partkey") == F.col("p_partkey"))
            .filter(cond)
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4).alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))


@query("variant_semi_structured", oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       event_type AS et,
       round(value, 6) AS val
FROM events
""")
def variant_semi_structured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured data through Spark 4's VARIANT type: the stored
    JSON column parses once into a variant (binary-encoded, typed-path
    access without re-parsing — the open-format answer to a string
    column you json-extract five times), and a struct -> to_json ->
    parse_json -> typed variant_get round trip must reproduce the
    original columns exactly (losslessness of the encoding, not just
    the happy path). variant_get paths are evaluated JVM-side; at scale
    a variant column shreds into parquet like any other column while
    staying schema-flexible."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    nested = F.parse_json(F.to_json(F.struct("event_type", "value")))
    return (ev.select("event_id", v.alias("v"), nested.alias("nv"))
            .select("event_id",
                    F.expr("variant_get(v, '$.k', 'long')").alias("k"),
                    F.expr("variant_get(nv, '$.event_type', 'string')")
                    .alias("et"),
                    F.round(F.expr("variant_get(nv, '$.value', 'double')"), 6)
                    .alias("val")))


@query("ab_test_welch", oracle="""
WITH g AS (
  SELECT event_type,
         count(*) AS n, avg(value) AS m, var_samp(value) AS v
  FROM events WHERE event_type IN ('view', 'purchase')
  GROUP BY event_type
),
a AS (SELECT * FROM g WHERE event_type = 'view'),
b AS (SELECT * FROM g WHERE event_type = 'purchase')
SELECT CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
       round(a.m - b.m, 6) AS mean_diff,
       round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 6) AS t_stat,
       round(pow(a.v / a.n + b.v / b.n, 2)
             / (pow(a.v / a.n, 2) / (a.n - 1)
                + pow(b.v / b.n, 2) / (b.n - 1)), 6) AS welch_df
FROM a, b
""")
def ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Welch t-test computed relationally (the A/B readout
    every experimentation pipeline runs): both arms' (n, mean, var_samp)
    come from ONE conditional-aggregation pass over the events — no
    per-arm subqueries, no join of 1-row aggregates (which would plan as
    a nested-loop join; conditional aggregation is the hygiene-clean
    spelling) — then the t statistic and Welch-Satterthwaite degrees of
    freedom are scalar arithmetic on that single row. All moment state
    is mergeable, so the same query runs over raw events or
    pre-aggregated per-partition moments unchanged."""
    ev = (load(spark, sf_dir, "events")
          .filter(F.col("event_type").isin("view", "purchase")))
    va = F.when(F.col("event_type") == "view", F.col("value"))
    vb = F.when(F.col("event_type") == "purchase", F.col("value"))
    g = ev.agg(F.count(va).alias("na"), F.avg(va).alias("ma"),
               F.var_samp(va).alias("va"),
               F.count(vb).alias("nb"), F.avg(vb).alias("mb"),
               F.var_samp(vb).alias("vb"))
    va_n = F.col("va") / F.col("na")
    vb_n = F.col("vb") / F.col("nb")
    return g.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round(F.col("ma") - F.col("mb"), 6).alias("mean_diff"),
        F.round((F.col("ma") - F.col("mb")) / F.sqrt(va_n + vb_n), 6)
        .alias("t_stat"),
        F.round(F.pow(va_n + vb_n, 2)
                / (F.pow(va_n, 2) / (F.col("na") - 1)
                   + F.pow(vb_n, 2) / (F.col("nb") - 1)), 6)
        .alias("welch_df"))


HIST_BUCKETS = 10


@query("histogram_equi_width", oracle=f"""
WITH bounds AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
b AS (
  SELECT least(CAST(floor((e.value - bounds.lo)
                          / ((bounds.hi - bounds.lo) / {HIST_BUCKETS}.0))
                    AS BIGINT), {HIST_BUCKETS - 1}) AS bucket
  FROM events e, bounds
)
SELECT bucket, count(*) AS n FROM b GROUP BY bucket
""")
def histogram_equi_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram: global min/max collected as ONE scalar row
    (weight-matrix-sized driver state), folded back as literals so the
    bucketing pass is a narrow map + one keyed count — the two-pass
    shape every distributed histogram uses (a 1-row crossJoin would
    plan as BNLJ and trip the fleet-wide hygiene ban; literal folding is
    this repo's standard scalar-broadcast idiom)."""
    ev = load(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("value"), F.max("value")).first()
    if lo is None:  # empty input: no buckets, not a null-division crash
        return spark.createDataFrame([], "bucket bigint, n bigint")
    width = (hi - lo) / float(HIST_BUCKETS)
    if width == 0.0:  # all values equal: everything lands in bucket 0
        bucket = F.lit(0).cast("bigint")
    else:
        bucket = F.least(
            F.floor((F.col("value") - F.lit(lo)) / F.lit(width)).cast("bigint"),
            F.lit(HIST_BUCKETS - 1))
    return (ev.select(bucket.alias("bucket"))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")))


@query("sort_global_range_partitioned", oracle="""
SELECT event_id, user_id FROM events WHERE value > 99
""")
def sort_global_range_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL total-order sort (no limit): Spark samples the sort key to
    build range boundaries, range-partitions the data, and sorts within
    partitions — the only distributed total order that scales (a single-
    partition sort would serialize 100 TB through one task). The plan
    must show Exchange rangepartitioning, NOT a coalesce-to-1 —
    plan-asserted in tests. The driver's value-hash is order-insensitive,
    so the oracle states only the row SET; the ordering guarantee is the
    plan's RangePartitioning + per-partition sort."""
    ev = load(spark, sf_dir, "events")
    return (ev.filter(F.col("value") > 99)
            .select("event_id", "user_id")
            .orderBy("event_id"))


@query("sample_weighted_topk", oracle="""
WITH keyed AS (
  SELECT o_orderkey, o_totalprice,
         pow((('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
              % 16777216 + 1) / 16777216.0,
             1.0 / o_totalprice) AS k
  FROM orders WHERE o_totalprice > 0
)
SELECT o_orderkey, round(o_totalprice, 4) AS o_totalprice
FROM (SELECT *, row_number() OVER (ORDER BY round(k, 12) DESC,
                                   o_orderkey) AS rn
      FROM keyed)
WHERE rn <= 100
""")
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted random sampling without replacement (Efraimidis-Spirakis
    A-Res): each row draws u from its CONTENT HASH (det_hash64 -> (0,1],
    partition- and engine-invariant like sample_deterministic) and keeps
    key u^(1/w); the global top-k by key is a weighted sample — heavier
    rows win proportionally more often. One narrow keyed pass + a
    TakeOrderedAndProject top-k: no shuffle of the population, no RNG
    state, reproducible on any cluster. Ranking uses the ROUNDED key
    with id tiebreak so both engines cut the same set."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    u = ((det_hash64(F.col("o_orderkey").cast("string")) % 16777216 + 1)
         / F.lit(16777216.0))
    k = F.pow(u, F.lit(1.0) / F.col("o_totalprice"))
    return (o.select("o_orderkey",
                     F.round("o_totalprice", 4).alias("o_totalprice"),
                     F.round(k, 12).alias("__k"))
            .orderBy(F.desc("__k"), "o_orderkey").limit(100)
            .drop("__k"))


@query("sql_udf_and_params", oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS disc_total
FROM lineitem
WHERE l_quantity >= 30
GROUP BY l_returnflag
""")
def sql_udf_and_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL-language surface: a SQL-DEFINED scalar function
    (CREATE TEMPORARY FUNCTION ... RETURN expr — INLINED by Catalyst at
    resolution, so it costs nothing at runtime, unlike a Python UDF) and
    a PARAMETERIZED query (named :marker binding — the injection-safe way
    to template queries). The oracle states the expanded, bound form;
    identical results prove both surfaces are sugar, not semantics."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION hdr_disc_price"
              "(p DOUBLE, d DOUBLE) RETURNS DOUBLE RETURN p * (1 - d)")
    return spark.sql(
        """SELECT l_returnflag,
                  CAST(count(*) AS BIGINT) AS n,
                  round(sum(hdr_disc_price(l_extendedprice, l_discount)), 4)
                    AS disc_total
           FROM lineitem
           WHERE l_quantity >= :min_qty
           GROUP BY l_returnflag""",
        args={"min_qty": 30})


@query("sql_pivot_unpivot_clause", oracle="""
WITH p AS (
  SELECT l_returnflag,
         CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS F_cnt,
         CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END)
              AS BIGINT) AS O_cnt
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'F_cnt' AS status_col, F_cnt AS n FROM p
UNION ALL
SELECT l_returnflag, 'O_cnt' AS status_col, O_cnt AS n FROM p
""")
def sql_pivot_unpivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-native PIVOT and UNPIVOT clauses round-tripped in ONE
    statement: lineitem counts pivot wide by linestatus, then unpivot
    back to long — the syntax surface (Spark 3.4+) next to the
    DataFrame-API twins pivot_conditional / unpivot_measures. Catalyst
    compiles PIVOT to the same conditional-aggregate plan the oracle
    states, and UNPIVOT to an Expand — no extra shuffle beyond the one
    aggregation. NULL semantics: a flag with no rows in a status pivots
    to NULL; coalesce restores the count-zero the long form expects."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT l_returnflag, status_col, coalesce(n, 0) AS n
        FROM (
          SELECT * FROM (SELECT l_returnflag, l_linestatus FROM lineitem)
          PIVOT (count(*) FOR l_linestatus IN ('F' AS F_cnt, 'O' AS O_cnt))
        )
        UNPIVOT INCLUDE NULLS (n FOR status_col IN (F_cnt, O_cnt))""")


@query("sql_lateral_view_explode", oracle="""
SELECT word, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
HAVING count(*) >= 100
""")
def sql_lateral_view_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-compat LATERAL VIEW explode — the syntax every legacy
    HiveQL/Hadoop migration carries (the reference's ecosystem dialect);
    semantically identical to the generator-expression form the engine
    uses elsewhere (Catalyst plans both as Generate). Word counts over
    the corpus with a HAVING floor keep the output stable."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql("""
        SELECT word, count(*) AS n
        FROM documents
        LATERAL VIEW explode(split(text, ' ')) w AS word
        WHERE word <> ''
        GROUP BY word
        HAVING count(*) >= 100""")


@query("sql_distribute_sort_by", oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber
FROM lineitem WHERE l_quantity >= 49
""")
def sql_distribute_sort_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-compat DISTRIBUTE BY ... SORT BY — partition-then-local-sort
    without a global order, the write-preparation idiom (co-locate by
    key, sort within files for row-group skipping) that predates
    repartition()/sortWithinPartitions(). The result SET is
    order-insensitive (the driver's hash is too); the plan carries
    hashpartitioning + a non-global Sort — asserted in tests."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT l_suppkey, l_orderkey, l_linenumber
        FROM lineitem WHERE l_quantity >= 49
        DISTRIBUTE BY l_suppkey SORT BY l_suppkey, l_orderkey""")


@query("join_relational_division", oracle="""
WITH pr AS (SELECT count(DISTINCT o_orderpriority) AS np FROM orders),
cu AS (SELECT o_custkey, count(DISTINCT o_orderpriority) AS nc
       FROM orders GROUP BY o_custkey)
SELECT c.c_custkey, c.c_name, CAST(cu.nc AS BIGINT) AS n_priorities
FROM cu
JOIN customer c ON c.c_custkey = cu.o_custkey
CROSS JOIN pr
WHERE cu.nc = pr.np
""")
def join_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELATIONAL DIVISION (the classic "suppliers who supply ALL parts"
    operator, Codd's ÷): customers whose orders cover EVERY distinct
    order priority. Neither SQL nor the DataFrame API has a division
    operator; the canonical rewrite is the count-coverage form — per-
    divisor-group distinct count equals the divisor's cardinality. The
    double-NOT-EXISTS spelling decorrelates to two anti-joins; the count
    form is one combiner'd aggregate + a 1-row scalar compared in a
    broadcast cross join, which is strictly cheaper and skew-free.
    At 100 TB: the per-customer distinct count is a partial-agg'd keyed
    shuffle on custkey; the divisor cardinality is a 1-row broadcast;
    the customer join broadcasts the dim or shuffles on the same key."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    pr = o.agg(F.count_distinct("o_orderpriority").alias("np"))
    cu = (o.groupBy("o_custkey")
          .agg(F.count_distinct("o_orderpriority").cast("bigint")
               .alias("n_priorities")))
    return (cu.crossJoin(F.broadcast(pr))
            .filter(F.col("n_priorities") == F.col("np"))
            .join(c, cu.o_custkey == c.c_custkey)
            .select("c_custkey", "c_name", "n_priorities"))


# ---------------------------------------------------------------------------
# CUPED variance-reduced A/B readout.

_CUPED_SPLIT = "2024-01-16"     # pre-period < split <= post-period


@query("ab_cuped_adjustment", eager=True, oracle=f"""
WITH u AS (
  SELECT user_id,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|arm'), 1, 8))
           ::BIGINT % 2 AS arm,
         sum(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                  THEN value ELSE 0 END) AS x,
         sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                  THEN value ELSE 0 END) AS y
  FROM events GROUP BY user_id),
pool AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM u),
th AS (
  SELECT CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
              ELSE round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9)
         END AS theta,
         round(sx / n, 9) AS mx
  FROM pool),
adj AS (
  SELECT u.arm, u.y, u.y - th.theta * (u.x - th.mx) AS yc
  FROM u, th)
SELECT CAST(arm AS BIGINT) AS arm,
       CAST(count(*) AS BIGINT) AS n_users,
       round(avg(y), 6) AS mean_y,
       round(avg(yc), 6) AS mean_y_cuped,
       round(var_samp(y), 6) AS var_y,
       round(var_samp(yc), 6) AS var_y_cuped,
       CASE WHEN var_samp(y) IS NULL OR var_samp(y) = 0 THEN NULL
            ELSE round(1 - var_samp(yc) / var_samp(y), 6)
       END AS var_reduction
FROM adj GROUP BY arm
""")
def ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi & Walker WSDM 2013 —
    the adjustment every large experimentation platform applies before
    reading an A/B test): each user's post-period metric Y is adjusted
    by their own PRE-period covariate X, Y_cuped = Y - theta (X - E[X])
    with theta = cov(X,Y)/var(X) fitted on the POOLED pre-period —
    pre-period behavior cannot be affected by treatment, so the
    adjustment is unbiased while stripping the between-user variance
    that dominates A/B noise. The report shows both arms' raw and
    adjusted means plus the realized variance-reduction fraction (the
    number that decides how much traffic the platform just saved).

    Arms are the deterministic det_hash64 user split (the engine's
    standard seedless assignment); the pre/post boundary is the fixed
    calendar split, and users missing a period carry 0 (enrolled,
    inactive — standard CUPED treatment). Float discipline follows
    ab_test_welch: exact conditional sums, scalar theta algebra on the
    1-row pooled moments, round(6) only at the reported surface.

    Scale shape: one combiner'd groupBy(user) pass builds the per-user
    (x, y) table; pooled moments are ONE scalar row folded back as a
    broadcast; the per-arm report is a 2-row groupBy. At 100 TB this is
    two keyed passes over events-sized data — the same shape the
    platform's nightly metrics job already runs."""
    ev = load(spark, sf_dir, "events")
    from ..functions.vector import det_hash64

    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    u = (ev.groupBy("user_id")
         .agg(F.sum(F.when(F.col("ts") < split, F.col("value"))
                    .otherwise(0.0)).alias("x"),
              F.sum(F.when(F.col("ts") >= split, F.col("value"))
                    .otherwise(0.0)).alias("y"))
         .withColumn("arm", det_hash64(
             F.concat(F.col("user_id").cast("string"),
                      F.lit("|arm"))) % 2))
    pool = u.agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"),
                 F.sum("y").alias("sy"),
                 F.sum(F.col("x") * F.col("y")).alias("sxy"),
                 F.sum(F.col("x") * F.col("x")).alias("sxx")).collect()[0]
    n, sx, sy, sxy, sxx = (pool["n"], pool["sx"], pool["sy"],
                           pool["sxy"], pool["sxx"])
    # snap the fitted scalars to a 9-digit grid on BOTH sides so a
    # summation-order ulp in the pooled moments cannot survive into
    # every adjusted row (the probability-snap lesson from the KN
    # perplexity filter); a degenerate covariate (zero pre-period
    # variance — e.g. every event lands post-split) fits theta = 0,
    # i.e. no adjustment, on both engines. round_half_away, not
    # Python round(): DuckDB round() is half-away-from-zero while
    # Python's is banker's, and a theta landing on a 9th-digit half
    # boundary would put the engines on adjacent grid points
    from ..functions.math import round_half_away

    den = n * sxx - sx * sx
    theta = 0.0 if den == 0 else round_half_away(
        (n * sxy - sx * sy) / den, 9)
    mx = round_half_away(sx / n, 9)
    adj = u.select("arm", "y",
                   (F.col("y") - F.lit(theta) * (F.col("x") - F.lit(mx)))
                   .alias("yc"))
    return (adj.groupBy(F.col("arm").cast("bigint").alias("arm"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"),
                 F.round(F.avg("y"), 6).alias("mean_y"),
                 F.round(F.avg("yc"), 6).alias("mean_y_cuped"),
                 F.round(F.var_samp("y"), 6).alias("var_y"),
                 F.round(F.var_samp("yc"), 6).alias("var_y_cuped"),
                 # an all-identical-y arm (e.g. every event pre-split)
                 # has var_y = 0: reduction undefined -> NULL on both
                 # engines (ANSI "/" would raise where DuckDB NULLs)
                 F.when(F.var_samp("y").isNull()
                        | (F.var_samp("y") == 0), F.lit(None))
                 .otherwise(F.round(1 - F.var_samp("yc")
                                    / F.var_samp("y"), 6))
                 .alias("var_reduction")))


# ---------------------------------------------------------------------------
# Propensity subclassification (stratified treatment-effect table).

_PS_STRATA = 5


@query("ab_propensity_strata", oracle=f"""
WITH u AS (
  SELECT user_id,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|arm'), 1, 8))
           ::BIGINT % 2 AS arm,
         sum(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                  THEN 1 ELSE 0 END) AS pre_n,
         sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                  THEN value ELSE 0 END) AS y
  FROM events GROUP BY user_id),
s AS (SELECT user_id, arm, y,
             ntile({_PS_STRATA}) OVER (ORDER BY pre_n, user_id)
               AS stratum
      FROM u),
g AS (
  SELECT stratum,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_treat,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ctrl,
         sum(CASE WHEN arm = 1 THEN y END) AS sy1,
         sum(CASE WHEN arm = 0 THEN y END) AS sy0
  FROM s GROUP BY stratum),
n AS (SELECT CAST(sum(n_treat + n_ctrl) AS BIGINT) AS nn FROM g)
SELECT CAST(stratum AS BIGINT) AS stratum, n_treat, n_ctrl,
       round(sy1 / n_treat, 6) AS mean_y_treat,
       round(sy0 / n_ctrl, 6) AS mean_y_ctrl,
       CASE WHEN n_treat = 0 OR n_ctrl = 0 THEN NULL
            ELSE round(sy1 / n_treat - sy0 / n_ctrl, 6) END AS ate,
       CAST((1000000 * (n_treat + n_ctrl)) // n.nn AS BIGINT) AS w_e6
FROM g, n
""")
def ab_propensity_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROPENSITY SUBCLASSIFICATION (Rosenbaum & Rubin 1983; the 1984
    five-subclass result showing quintile stratification removes ~90%
    of covariate bias) — the observational-causal companion to the
    randomized A/B shelf (welch, CUPED, SPRT, diff-in-diff): users are
    stratified into {_PS_STRATA} quintiles of their PRE-period activity
    (the propensity proxy — pre-treatment behavior is the confounder
    that both selects into exposure and predicts outcome), and the
    treatment-control outcome gap is reported WITHIN each stratum,
    where the covariate is approximately balanced. The stratified
    table (per-stratum ATE + population weight w_e6) is the estimator's
    evidence; the scalar weighted ATE is one dot product the reader
    folds — deliberately NOT emitted as a cross-strata float sum.

    Determinism: arm is the standard det_hash64 user split; strata cut
    by ntile over (pre_count, user_id) — an integer sort key with a
    total order, so quintile boundaries are identical cross-engine;
    weights are exact integer micro-units; means round(6) at the
    surface only (the ab_test_welch float discipline). A stratum
    missing an arm reports NULL ate on both engines.

    Scale shape: one combiner'd groupBy(user) pass, one global ntile
    (range-partitioned sort at 100 TB — the prefix-sum plan), one
    {_PS_STRATA}-row grouped fold. The events-table nightly-metrics
    budget, same as CUPED."""
    ev = load(spark, sf_dir, "events")
    from ..functions.vector import det_hash64
    from pyspark.sql import Window as W

    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    u = (ev.groupBy("user_id")
         .agg(F.sum(F.when(F.col("ts") < split, 1).otherwise(0))
              .alias("pre_n"),
              F.sum(F.when(F.col("ts") >= split, F.col("value"))
                    .otherwise(0.0)).alias("y"))
         .withColumn("arm", det_hash64(
             F.concat(F.col("user_id").cast("string"),
                      F.lit("|arm"))) % 2))
    s = u.withColumn("stratum", F.ntile(_PS_STRATA).over(
        W.orderBy("pre_n", "user_id")))
    g = (s.groupBy("stratum")
         .agg(F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
              .cast("bigint").alias("n_treat"),
              F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
              .cast("bigint").alias("n_ctrl"),
              F.sum(F.when(F.col("arm") == 1, F.col("y"))).alias("sy1"),
              F.sum(F.when(F.col("arm") == 0, F.col("y"))).alias("sy0")))
    n = g.agg(F.sum(F.col("n_treat") + F.col("n_ctrl"))
              .cast("bigint").alias("nn"))
    return (g.crossJoin(F.broadcast(n))
            .select(F.col("stratum").cast("bigint").alias("stratum"),
                    "n_treat", "n_ctrl",
                    F.round(F.col("sy1") / F.col("n_treat"), 6)
                    .alias("mean_y_treat"),
                    F.round(F.col("sy0") / F.col("n_ctrl"), 6)
                    .alias("mean_y_ctrl"),
                    F.when((F.col("n_treat") == 0)
                           | (F.col("n_ctrl") == 0), F.lit(None))
                    .otherwise(F.round(F.col("sy1") / F.col("n_treat")
                                       - F.col("sy0") / F.col("n_ctrl"),
                                       6)).alias("ate"),
                    F.expr("CAST((1000000 * (n_treat + n_ctrl)) DIV nn "
                           "AS BIGINT)").alias("w_e6")))


# ---------------------------------------------------------------------------
# Simpson's-paradox check: crude vs stratum-adjusted effect direction.


def _simpsons_oracle() -> str:
    from ..registry import ORACLE_SQL
    return f"""
WITH strata AS MATERIALIZED ({ORACLE_SQL["ab_propensity_strata"]}),
u AS (
  SELECT user_id,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|arm'), 1, 8))
           ::BIGINT % 2 AS arm,
         sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                  THEN value ELSE 0 END) AS y
  FROM events GROUP BY user_id),
crude AS (
  SELECT CAST(floor(1000000.0 *
           (round(sum(CASE WHEN arm = 1 THEN y END), 6)
              / sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
            - round(sum(CASE WHEN arm = 0 THEN y END), 6)
              / sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)))
         AS BIGINT) AS crude_ate_e6
  FROM u),
s AS (
  SELECT CAST(count(CASE WHEN ate IS NOT NULL THEN 1 END) AS BIGINT)
           AS n_strata_both,
         CAST(sum(CASE WHEN ate > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pos,
         CAST(sum(CASE WHEN ate < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_neg,
         CAST(sum(CASE WHEN ate IS NOT NULL THEN
               CAST(floor(1000000.0 * ate * (n_treat + n_ctrl)) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS ate_w_sum,
         CAST(sum(CASE WHEN ate IS NOT NULL
                       THEN n_treat + n_ctrl ELSE 0 END) AS BIGINT)
           AS n_both
  FROM strata)
SELECT crude.crude_ate_e6, s.n_strata_both, s.n_pos, s.n_neg,
       CAST(CASE WHEN s.n_both = 0 THEN NULL
            ELSE s.ate_w_sum // s.n_both END AS BIGINT) AS adj_ate_e6,
       (crude.crude_ate_e6 > 0 AND s.n_pos = 0 AND s.n_neg > 0)
       OR (crude.crude_ate_e6 < 0 AND s.n_neg = 0 AND s.n_pos > 0)
         AS simpson_flag
FROM crude, s
"""


@query("ab_simpsons_paradox_check", oracle=_simpsons_oracle())
def ab_simpsons_paradox_check(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """SIMPSON'S-PARADOX check (Simpson 1951; the Bickel et al. 1975
    Berkeley admissions case is the canonical instance): compare the
    CRUDE treatment-control gap against the STRATUM-ADJUSTED picture —
    if every within-stratum effect points one way while the pooled
    effect points the other, the pooled number is confounded and a
    report that ships it unstratified is wrong. The detector every
    experimentation platform runs before trusting a topline metric.

    Composition: strata come from the REGISTERED ab_propensity_strata
    builder/oracle (per-stratum ate already rounded, weights integer),
    so stratification semantics cannot drift; the crude estimate uses
    the same hash arm and outcome definition. Numerics: the per-arm
    outcome sums are ROUND-6 SNAPPED before the crude difference is
    floored to e6 micro-units (ADVICE r10 — raw cross-row float sums
    are summation-order dependent, so both engines snap to the
    ab_test_welch round-6 surface first; residual risk is the accepted
    round-6 float-aggregate class, a sum within an ulp of the .5e-6
    grid midpoint), each stratum's weighted term floors the ALREADY
    round-6 ate, and the adjusted estimate is an integer
    floor-division — the verdict columns (sign counts, flag) are pure
    integer logic on both engines.

    Scale shape: one events-sized grouped pass (shared shape with the
    strata builder) + 5-row arithmetic."""
    from ..functions.vector import det_hash64

    strata = ab_propensity_strata(spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    u = (ev.groupBy("user_id")
         .agg(F.sum(F.when(F.col("ts") >= split, F.col("value"))
                    .otherwise(0.0)).alias("y"))
         .withColumn("arm", det_hash64(
             F.concat(F.col("user_id").cast("string"),
                      F.lit("|arm"))) % 2))
    # the per-arm float sums are snapped to 6 decimals BEFORE the
    # difference/floor (ADVICE r10: cross-row float sums are partial-
    # aggregation-order dependent, so flooring the raw difference can
    # flip the e6 integer — and potentially simpson_flag — when a sum
    # lands within an ulp of a grid boundary; the snap puts both
    # engines on the ab_test_welch round-6 surface before any integer
    # is cut, leaving only the accepted round-6 float-aggregate class)
    crude = u.agg(
        F.floor(F.lit(1000000.0) *
                (F.round(F.sum(F.when(F.col("arm") == 1, F.col("y"))), 6)
                 / F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
                 - F.round(F.sum(F.when(F.col("arm") == 0, F.col("y"))), 6)
                 / F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))))
        .cast("bigint").alias("crude_ate_e6"))
    both = F.col("ate").isNotNull()
    s = strata.agg(
        F.count(F.when(both, 1)).cast("bigint").alias("n_strata_both"),
        F.sum(F.when(F.col("ate") > 0, 1).otherwise(0)).cast("bigint")
        .alias("n_pos"),
        F.sum(F.when(F.col("ate") < 0, 1).otherwise(0)).cast("bigint")
        .alias("n_neg"),
        F.sum(F.when(both, F.floor(
            F.lit(1000000.0) * F.col("ate")
            * (F.col("n_treat") + F.col("n_ctrl"))).cast("bigint"))
              .otherwise(0)).cast("bigint").alias("ate_w_sum"),
        F.sum(F.when(both, F.col("n_treat") + F.col("n_ctrl"))
              .otherwise(0)).cast("bigint").alias("n_both"))
    flag = (((F.col("crude_ate_e6") > 0) & (F.col("n_pos") == 0)
             & (F.col("n_neg") > 0))
            | ((F.col("crude_ate_e6") < 0) & (F.col("n_neg") == 0)
               & (F.col("n_pos") > 0)))
    return (crude.crossJoin(F.broadcast(s))
            .select("crude_ate_e6", "n_strata_both", "n_pos", "n_neg",
                    F.when(F.col("n_both") == 0, F.lit(None)).otherwise(
                        F.expr("ate_w_sum DIV n_both")).cast("bigint")
                    .alias("adj_ate_e6"),
                    flag.alias("simpson_flag")))
