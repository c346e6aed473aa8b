"""Batch MERGE / slowly-changing-dimension maintenance.

The streaming side already has upsert semantics (foreachBatch MERGE into a
keyed store, streaming/pipeline.py); this module is the BATCH half every
warehouse needs: apply a change batch to a dimension with full SCD Type 2
history — close out changed rows, append their new versions, insert
brand-new keys, pass unchanged rows through.

No Delta/Iceberg in this environment, so the transactional wrapper is out
of scope — but the PLAN is exactly what those engines run under their
MERGE INTO: one equi-join of target vs source on the business key, a
row-level action decision (UPDATE/INSERT/NOOP), and a union of the
outcomes. At 100 TB: one shuffle on the business key (or zero if the
dimension is bucketed on it — join_bucketed_colocated shows that path);
the change batch is typically small enough to broadcast, which Spark picks
via AQE when it is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..tables import load

# Deterministic change batch derived from the data itself:
# - RESEGMENT: customers with >= 40 lineitems in 1997 move to segment 'VIP'
# - INSERT: one new customer per nation, key = 10_000_000 + nationkey
_UPDATES_SQL = """
  SELECT c.c_custkey,
         c.c_name,
         c.c_acctbal,
         'VIP' AS c_mktsegment
  FROM customer c
  JOIN (SELECT o.o_custkey, count(*) AS n
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE year(o.o_orderdate) = 1997
        GROUP BY o.o_custkey
        HAVING count(*) >= 40) b ON b.o_custkey = c.c_custkey
  WHERE c.c_mktsegment <> 'VIP'
  UNION ALL
  SELECT 10000000 + n.n_nationkey AS c_custkey,
         concat('Customer#NEW_', n.n_name) AS c_name,
         cast(0.0 AS DOUBLE) AS c_acctbal,
         'NEW' AS c_mktsegment
  FROM nation n
"""

_SCD2_ORACLE = f"""
WITH updates AS ({_UPDATES_SQL}),
base AS (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
         '1995-01-01' AS valid_from,
         CAST(NULL AS VARCHAR) AS valid_to,
         TRUE AS is_current
  FROM customer
)
SELECT b.c_custkey, b.c_name, b.c_acctbal, b.c_mktsegment,
       b.valid_from, b.valid_to, b.is_current
FROM base b
WHERE b.c_custkey NOT IN (SELECT c_custkey FROM updates)
UNION ALL
SELECT b.c_custkey, b.c_name, b.c_acctbal, b.c_mktsegment,
       b.valid_from, '1998-01-01' AS valid_to, FALSE AS is_current
FROM base b
WHERE b.c_custkey IN (SELECT c_custkey FROM updates)
UNION ALL
SELECT u.c_custkey, u.c_name, u.c_acctbal, u.c_mktsegment,
       '1998-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
       TRUE AS is_current
FROM updates u
"""


@query("merge_scd2_dimension", oracle=_SCD2_ORACLE)
def merge_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 MERGE: apply a derived change batch to the customer
    dimension, keeping full history. Three row actions, decided by ONE
    semi/anti-join pair on the business key then unioned:

      unchanged  = target ANTI-join source            (pass-through)
      closed-out = target SEMI-join source            (valid_to set,
                                                       is_current false)
      new rows   = source as-is (updates of existing keys AND inserts of
                   new keys both become the current version)

    The change batch itself derives deterministically from the fact table
    (heavy-activity customers re-segmented to VIP, plus one synthetic new
    customer per nation) so the query needs no out-of-band input.
    Validity bounds are ISO-date strings (not DATE) so the cross-engine
    hash comparison is stable for NULL open intervals."""
    for t in ("customer", "orders", "lineitem", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)

    updates = spark.sql(_UPDATES_SQL)
    base = (load(spark, sf_dir, "customer")
            .withColumn("valid_from", F.lit("1995-01-01"))
            .withColumn("valid_to", F.lit(None).cast("string"))
            .withColumn("is_current", F.lit(True)))

    keys = updates.select("c_custkey")
    unchanged = base.join(keys, "c_custkey", "left_anti")
    closed = (base.join(keys, "c_custkey", "left_semi")
              .withColumn("valid_to", F.lit("1998-01-01"))
              .withColumn("is_current", F.lit(False)))
    fresh = (updates
             .withColumn("valid_from", F.lit("1998-01-01"))
             .withColumn("valid_to", F.lit(None).cast("string"))
             .withColumn("is_current", F.lit(True)))

    cols = ["c_custkey", "c_name", "c_acctbal", "c_mktsegment",
            "valid_from", "valid_to", "is_current"]
    return (unchanged.select(*cols)
            .unionByName(closed.select(*cols))
            .unionByName(fresh.select(*cols)))


# Snapshot v2 = v1 with the SCD2 change batch applied as in-place updates
# (Type 1), one synthetic insert per nation, and deep-debt customers
# (acctbal < -900) deleted.
_CDC_ORACLE = f"""
WITH updates AS ({_UPDATES_SQL}),
v1 AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
v2 AS (
  SELECT c.c_custkey, c.c_acctbal,
         coalesce(u.c_mktsegment, c.c_mktsegment) AS c_mktsegment
  FROM customer c
  LEFT JOIN updates u ON u.c_custkey = c.c_custkey
  WHERE c.c_acctbal >= -900
  UNION ALL
  SELECT c_custkey, c_acctbal, c_mktsegment FROM updates
  WHERE c_custkey >= 10000000
)
SELECT coalesce(v1.c_custkey, v2.c_custkey) AS c_custkey,
       CASE WHEN v1.c_custkey IS NULL THEN 'I'
            WHEN v2.c_custkey IS NULL THEN 'D'
            ELSE 'U' END AS change_type,
       v1.c_mktsegment AS old_segment,
       v2.c_mktsegment AS new_segment
FROM v1
FULL OUTER JOIN v2 ON v1.c_custkey = v2.c_custkey
WHERE v1.c_custkey IS NULL OR v2.c_custkey IS NULL
   OR v1.c_mktsegment <> v2.c_mktsegment
"""


@query("cdc_snapshot_diff", oracle=_CDC_ORACLE)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture by snapshot diff: given two versions of a
    dimension, emit the I/U/D change rows — the batch fallback every
    pipeline needs when the source has no change log (and the inverse of
    merge_scd2_dimension, which CONSUMES such a batch). One full outer
    join on the business key; change classification and the
    unchanged-row filter are row-local. At 100 TB: a single co-shuffle
    of the two snapshots on the key (zero exchange if both snapshots are
    bucketed on it), never a row-by-row compare on the driver."""
    for t in ("customer", "orders", "lineitem", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_CDC_ORACLE)


_MV_CUTOVER = "1999-01-01"


@query("mv_incremental_refresh", oracle=f"""
WITH base AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         sum(o_totalprice) AS revenue,
         count(*) AS n_orders,
         min(o_totalprice) AS min_price
  FROM orders WHERE o_orderdate < DATE '{_MV_CUTOVER}'
  GROUP BY date_trunc('month', o_orderdate)
),
delta AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         sum(o_totalprice) AS revenue,
         count(*) AS n_orders,
         min(o_totalprice) AS min_price
  FROM orders WHERE o_orderdate >= DATE '{_MV_CUTOVER}'
  GROUP BY date_trunc('month', o_orderdate)
),
merged AS (
  SELECT * FROM base UNION ALL SELECT * FROM delta
)
SELECT month,
       round(sum(revenue), 4) AS revenue,
       CAST(sum(n_orders) AS BIGINT) AS n_orders,
       round(min(min_price), 4) AS min_price,
       round(sum(revenue) / sum(n_orders), 6) AS avg_price
FROM merged GROUP BY month
""")
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a monthly revenue
    rollup kept current by merging the STORED aggregate state with a
    delta batch's partial aggregate — never re-scanning history. The
    per-month state carries mergeable partials (sum, count, min; avg is
    DERIVED at read time from sum/count — the decomposition every IVM
    engine uses, since avg itself does not merge).

    Here both halves compute from the same table split on a cutover
    date, which makes the refresh oracle-checkable: merge(base-agg,
    delta-agg) must equal the full recompute. At 100 TB the base agg is
    the stored MV (months x metrics — tiny), so a refresh costs one
    delta-sized scan + partial agg + a state-sized merge shuffle; the
    full-history scan happens zero times. Merge = unionByName + re-agg,
    which Spark plans as partial/final HashAggregate with the delta side
    map-side-combined."""
    orders = load(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate")).alias("month")

    def partial(df: DataFrame) -> DataFrame:
        return (df.groupBy(month)
                .agg(F.sum("o_totalprice").alias("revenue"),
                     F.count(F.lit(1)).alias("n_orders"),
                     F.min("o_totalprice").alias("min_price")))

    cut = F.lit(_MV_CUTOVER).cast("date")
    base = partial(orders.filter(F.col("o_orderdate") < cut))
    delta = partial(orders.filter(F.col("o_orderdate") >= cut))
    return (base.unionByName(delta)
            .groupBy("month")
            .agg(F.round(F.sum("revenue"), 4).alias("revenue"),
                 F.sum("n_orders").cast("bigint").alias("n_orders"),
                 F.round(F.min("min_price"), 4).alias("min_price"),
                 F.round(F.sum("revenue") / F.sum("n_orders"), 6)
                 .alias("avg_price")))


_TEMPORAL_ORACLE = f"""
WITH dim AS ({_SCD2_ORACLE.strip()})
SELECT d.c_mktsegment AS segment_asof,
       CAST(year(o.o_orderdate) AS BIGINT) AS yr,
       round(sum(o.o_totalprice), 4) AS revenue,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
JOIN dim d
  ON d.c_custkey = o.o_custkey
 AND o.o_orderdate >= CAST(d.valid_from AS DATE)
 AND (d.valid_to IS NULL OR o.o_orderdate < CAST(d.valid_to AS DATE))
GROUP BY d.c_mktsegment, year(o.o_orderdate)
"""


@query("temporal_scd2_lookup", oracle=_TEMPORAL_ORACLE)
def temporal_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-table (point-in-time) join: every order looks up the
    dimension version that was valid AT ITS ORDER DATE, so pre-cutover
    orders of later-upgraded customers attribute revenue to the segment
    they belonged to THEN — the correctness property SCD2 history exists
    to provide (a Type-1 dim would silently rewrite history).

    Physical shape: an EQUI-join on the business key with the validity
    window as a residual post-join predicate — never a range cross-join,
    because a key matches at most version-count rows (2 here). At 100 TB
    the versioned dimension stays dimension-sized and broadcasts; the
    fact never shuffles. Output: revenue by as-of segment x order year
    (the split proves the time travel: VIP revenue exists only from the
    cutover year on)."""
    dim = merge_scd2_dimension(spark, sf_dir)
    orders = load(spark, sf_dir, "orders")
    cond = ((dim.c_custkey == orders.o_custkey)
            & (orders.o_orderdate >= dim.valid_from.cast("date"))
            & (dim.valid_to.isNull()
               | (orders.o_orderdate < dim.valid_to.cast("date"))))
    return (orders.join(F.broadcast(dim), cond)
            .groupBy(dim.c_mktsegment.alias("segment_asof"),
                     F.year(orders.o_orderdate).cast("bigint").alias("yr"))
            .agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"),
                 F.count(F.lit(1)).alias("n_orders")))


# Deterministic key-space split for the upsert demo: the target
# dimension holds users with user_id % 5 != 0 (the rest are "not yet
# onboarded" -> INSERT candidates), and the change stream carries users
# with user_id % 3 != 0 (the rest have no changes -> KEEP rows).
_UPSERT_CUTOVER = "2024-01-08"


@query("merge_dedup_upsert", oracle=f"""
WITH tgt0 AS (
  SELECT user_id, event_type, value, ts, event_id
  FROM events
  WHERE ts < TIMESTAMP '{_UPSERT_CUTOVER}' AND user_id % 5 != 0),
tgt AS (
  SELECT user_id, event_type, value, ts FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM tgt0) WHERE rn = 1),
src0 AS (
  SELECT user_id, event_type, value, ts, event_id
  FROM events
  WHERE ts >= TIMESTAMP '{_UPSERT_CUTOVER}' AND user_id % 3 != 0),
src AS (
  SELECT user_id, event_type, value, ts, n_changes FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n_changes
    FROM src0) WHERE rn = 1)
SELECT coalesce(t.user_id, s.user_id) AS user_id,
       CASE WHEN t.user_id IS NULL THEN 'INSERT'
            WHEN s.user_id IS NULL THEN 'KEEP'
            ELSE 'UPDATE' END AS action,
       coalesce(s.event_type, t.event_type) AS event_type,
       coalesce(s.value, t.value) AS value,
       coalesce(s.ts, t.ts) AS updated_at,
       CAST(coalesce(s.n_changes, 0) AS BIGINT) AS n_changes
FROM tgt t FULL OUTER JOIN src s ON s.user_id = t.user_id
""")
def merge_dedup_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC batch compaction + latest-wins upsert — the other half of
    MERGE INTO that merge_scd2_dimension doesn't cover: a raw change
    stream carries MANY rows per key, so the batch is first COMPACTED
    to one latest row per key (ts desc, event_id desc tie-break, with
    the collapsed change count kept for audit), and only then merged —
    matched keys UPDATE, unmatched source keys INSERT, untouched target
    keys KEEP. Every Delta/Iceberg/Hudi upsert pipeline runs exactly
    this compact-then-merge shape; skipping the compaction makes the
    merge join multiply target rows by per-key change counts (the
    classic "MERGE found duplicate source rows" failure).

    The target is the pre-cutover latest state of users with
    user_id % 5 != 0; the change stream is post-cutover events of users
    with user_id % 3 != 0 — a deterministic key-space split that makes
    all three actions non-empty on the fixture. Scale shape: two
    user-keyed row_number windows (partial nothing — windows, but each
    key's partition is its event history, never global) and ONE
    user-keyed full-outer join of two 1-row-per-key tables; at 100 TB
    the compaction bounds the join input to |keys| rows per side
    regardless of change volume, and AQE broadcasts the batch side when
    it fits. Cites reference semantics: none (reference has no merge
    operator; §2.5 extension)."""
    from pyspark.sql import Window as W

    events = load(spark, sf_dir, "events")
    cut = F.lit(_UPSERT_CUTOVER).cast("timestamp")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))

    tgt = (events.filter((F.col("ts") < cut) & (F.col("user_id") % 5 != 0))
           .withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") == 1)
           .select("user_id", "event_type", "value", "ts"))
    src = (events.filter((F.col("ts") >= cut) & (F.col("user_id") % 3 != 0))
           .withColumn("rn", F.row_number().over(w))
           .withColumn("n_changes",
                       F.count(F.lit(1)).over(W.partitionBy("user_id")))
           .filter(F.col("rn") == 1)
           .select("user_id", "event_type", "value", "ts", "n_changes"))

    t = tgt.alias("t")
    s = src.alias("s")
    tu, su = F.col("t.user_id"), F.col("s.user_id")
    return (t.join(s, tu == su, "full_outer")
            .select(
                F.coalesce(tu, su).alias("user_id"),
                F.when(tu.isNull(), "INSERT")
                .when(su.isNull(), "KEEP")
                .otherwise("UPDATE").alias("action"),
                F.coalesce(F.col("s.event_type"), F.col("t.event_type"))
                .alias("event_type"),
                F.coalesce(F.col("s.value"), F.col("t.value"))
                .alias("value"),
                F.coalesce(F.col("s.ts"), F.col("t.ts")).alias("updated_at"),
                F.coalesce(F.col("s.n_changes"), F.lit(0)).cast("bigint")
                .alias("n_changes")))
