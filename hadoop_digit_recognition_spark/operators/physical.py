"""Physical-strategy operators: the shuffle-shaping patterns that keep
joins and aggregations alive at 100 TB (SURVEY.md §7 phase 6; the
reference has exactly one physical strategy — hash-partition everything —
driver.java:155-156).

Five patterns, each with a DuckDB oracle because they change ONLY the
physical distribution, never the result:

- bucketed co-located join: both fact tables persisted bucketed+sorted on
  the join key -> SortMergeJoin with ZERO exchange and zero sort at read
  time (the recurring-join amortization every warehouse lives on);
- salted two-phase aggregation: groupBy(key) where one key dominates ->
  groupBy(key, salt) partial then groupBy(key) merge, so the hot key's
  rows spread over S reducers instead of one straggler;
- salted skew join: replicate the small side S ways, salt the big side
  deterministically -> the hot key's probe rows fan over S tasks;
- range-bucketed interval join: time-bucket replication turns a range
  predicate into an equi-join (no BNLJ, bounded probe width);
- partitioned layout + partition pruning: date-partitioned writes let a
  range query skip directories at file listing, before any I/O.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..tables import load

N_BUCKETS = 8
N_SALTS = 8


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Persist lineitem+orders bucketed and sorted by orderkey (external
    tables under /tmp so the driver's cwd stays untouched). Idempotent per
    (session, sf)."""
    from ..tables import dataset_tag
    tag = dataset_tag(sf_dir, "lineitem", "orders")
    li, orders = f"li_bkt_{tag}", f"ord_bkt_{tag}"
    base = os.path.join(tempfile.gettempdir(), "hdr_bucketed", tag)
    if not spark.catalog.tableExists(li):
        (load(spark, sf_dir, "lineitem")
         .write.bucketBy(N_BUCKETS, "l_orderkey").sortBy("l_orderkey")
         .option("path", os.path.join(base, "lineitem"))
         .mode("overwrite").saveAsTable(li))
    if not spark.catalog.tableExists(orders):
        (load(spark, sf_dir, "orders")
         .write.bucketBy(N_BUCKETS, "o_orderkey").sortBy("o_orderkey")
         .option("path", os.path.join(base, "orders"))
         .mode("overwrite").saveAsTable(orders))
    return li, orders


@query("join_bucketed_colocated", oracle="""
SELECT o.o_orderpriority,
       count(*) AS n_lines,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))
                      * CAST(1 - l.l_discount AS DECIMAL(14,2)))
                  AS DOUBLE), 4) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""")
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem x orders on the bucketed layout: the join requires
    hashpartitioning(orderkey, 8) and both scans already PROVIDE it, so
    the plan has no Exchange below the join — asserted in tests. The
    `merge` hint pins SortMergeJoin: at test SF Catalyst would (rightly)
    broadcast the small orders side, but at 100 TB neither side fits in
    memory and the bucketed SMJ is the plan this layout exists for.
    Amortization argument: one bucketed write, every subsequent orderkey
    join is shuffle-free."""
    li_name, ord_name = _bucketed_tables(spark, sf_dir)
    li, o = spark.table(li_name), spark.table(ord_name).hint("merge")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 # DECIMAL-exact money sum: a double sum of ~600k products
                 # at sf0.1 carries summation-order noise past the 1e-4
                 # rounding grid; decimal aggregation is exact in both
                 # engines at ANY scale factor
                 F.round(F.sum(F.col("l_extendedprice").cast("decimal(14,2)")
                               * (F.lit(1) - F.col("l_discount"))
                               .cast("decimal(14,2)")).cast("double"), 4)
                 .alias("revenue")))


@query("agg_skew_salted_twophase", oracle="""
SELECT event_type, count(*) AS n, round(sum(value), 6) AS total
FROM events GROUP BY event_type
""")
def agg_skew_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation over a low-cardinality hot key: phase 1
    groups by (key, salt) with salt = pmod(hash(event_id), S) so each hot
    key spreads over S partial rows; phase 2 merges the S partials. Same
    result as the direct groupBy (the oracle), but the heaviest reducer
    carries 1/S of the hot key. (Catalyst's partial agg already handles
    THIS data shape; the pattern is for keys whose post-combine groups
    still skew, e.g. high-cardinality-value aggs and collect-type
    functions.)"""
    ev = load(spark, sf_dir, "events")
    salt = F.pmod(F.xxhash64("event_id"), F.lit(N_SALTS)).alias("salt")
    phase1 = (ev.groupBy("event_type", salt)
              .agg(F.count(F.lit(1)).alias("pn"), F.sum("value").alias("pv")))
    return (phase1.groupBy("event_type")
            .agg(F.sum("pn").alias("n"),
                 F.round(F.sum("pv"), 6).alias("total")))


@query("join_skew_salted", oracle="""
SELECT e.event_type, t.weight,
       count(*) AS n,
       round(sum(e.value * t.weight), 6) AS weighted
FROM events e
JOIN (SELECT 'click' AS event_type, 1.0 AS weight UNION ALL
      SELECT 'view', 0.1 UNION ALL SELECT 'purchase', 10.0) t
  ON e.event_type = t.event_type
GROUP BY e.event_type, t.weight
""")
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join on a skewed key: the probe side salts
    deterministically (hash of its unique id), the build side replicates
    each row N_SALTS ways, and the join key becomes (key, salt) — the hot
    key's rows land on S reducers instead of one. Identical result to the
    plain join (the oracle proves it). In production prefer AQE skew-join
    or a broadcast when the small side fits; salting is the pattern for
    when neither applies (both sides large, skew beyond AQE's splitting)."""
    ev = load(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.1), ("purchase", 10.0)],
        "event_type string, weight double")
    salted_ev = ev.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(N_SALTS)).cast("int"))
    salted_dim = dim.select(
        "event_type", "weight",
        F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1))).alias("salt"))
    joined = salted_ev.join(salted_dim.hint("shuffle_hash"),
                            ["event_type", "salt"])
    return (joined.groupBy("event_type", "weight")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum(F.col("value") * F.col("weight")), 6)
                 .alias("weighted")))


@query("join_range_bucketed", oracle="""
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id
 AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL '1 hour'
""")
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (purchases within 1h after a click, per user) via
    range bucketing: each click replicates into the 1-hour buckets its
    window overlaps (<= 2), each purchase keeps its own bucket, and the
    join becomes an EQUI-join on (user_id, bucket) + residual range
    filter. The naive plan is an equi-join on user_id with the range as a
    post-filter — fine until one user's history is huge; bucketing bounds
    each probe to two buckets regardless of history length, and with no
    equi-key at all it is the difference between BNLJ (quadratic) and a
    shuffle join. Bucket width = range width, the standard choice."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "ts_us")
    hour_us = 3_600_000_000
    # integer `div`, not `/`: float division truncated at an exact bucket
    # boundary can land one bucket low (same ulp trap as the events loader)
    b = F.expr(f"ts_us div {hour_us}")
    clicks = (ev.filter(F.col("event_type") == "click")
              .withColumn("bkt", F.explode(F.array(b, b + 1)))
              .select(F.col("event_id").alias("click_id"), "user_id",
                      F.col("ts_us").alias("c_us"), "bkt"))
    purch = (ev.filter(F.col("event_type") == "purchase")
             .select(F.col("event_id").alias("purchase_id"),
                     F.col("user_id").alias("p_user"),
                     F.col("ts_us").alias("p_us"), b.alias("bkt")))
    return (clicks.join(purch, (F.col("user_id") == F.col("p_user"))
                        & (clicks.bkt == purch.bkt))
            .filter((F.col("p_us") >= F.col("c_us"))
                    & (F.col("p_us") < F.col("c_us") + hour_us))
            .select("click_id", "purchase_id", "user_id"))


@query("partition_pruned_scan", oracle="""
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
       count(*) AS n, round(sum(value), 6) AS total
FROM events
WHERE ts >= (SELECT min(ts) FROM events)
  AND ts <  (SELECT min(ts) FROM events) + INTERVAL '3 days'
GROUP BY 1
""")
def partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partition pruning: events written once partitioned by
    event date; a date-range query then reads ONLY the matching
    directories (PartitionFilters in the scan — asserted in tests). At
    100 TB this is the first and cheapest data-skipping layer: pruning
    happens at file listing, before any I/O."""
    from ..tables import dataset_tag
    tag = dataset_tag(sf_dir, "events")
    base = os.path.join(tempfile.gettempdir(), "hdr_part", tag)
    marker = os.path.join(base, "_SUCCESS")
    if not os.path.exists(marker):
        (load(spark, sf_dir, "events")
         .withColumn("d", F.to_date("ts"))
         .write.partitionBy("d").mode("overwrite").parquet(base))
    ev = spark.read.parquet(base)
    lo = load(spark, sf_dir, "events").agg(F.min("ts")).first()[0]
    lo_d = lo.date()
    hi_d = lo_d + __import__("datetime").timedelta(days=3)
    pruned = ev.filter((F.col("d") >= F.lit(lo_d)) & (F.col("d") < F.lit(hi_d)))
    # partition column d is DATE; restrict rows to the same [min_ts,
    # min_ts+3d) window the oracle uses (date-partition pruning is the
    # coarse cut; the residual ts filter is exact)
    pruned = pruned.filter(
        (F.col("ts") >= F.lit(lo))
        & (F.col("ts") < F.lit(lo) + F.expr("INTERVAL 3 DAYS")))
    return (pruned.groupBy(F.col("d").cast("string").alias("d"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 6).alias("total")))


def aqe_skew_join_demo(spark: SparkSession, n_rows: int = 150_000,
                       n_keys: int = 64) -> DataFrame:
    """Planted-skew sort-merge join for demonstrating AQE's runtime
    skew-split (spark.sql.adaptive.skewJoin) — the alternative to manual
    salting (join_skew_salted) when skew is discoverable at runtime.

    90% of left rows share key 0; the remainder spread over n_keys keys.
    The pad column is hex (md5-derived, incompressible enough) so the hot
    partition's SHUFFLE BYTES — what AQE's skew detector measures —
    dominate the median. The final filter references columns from BOTH
    sides so Catalyst cannot push it below the join and the full skewed
    shuffle actually happens; it selects nothing, so executing the plan
    is cheap. Callers (tests/test_plans.py) lower
    skewedPartitionThresholdInBytes to trigger the split at test scale
    and assert `skew=true` in the FINAL adaptive plan."""
    left = spark.range(n_rows).select(
        F.when(F.pmod(F.col("id"), F.lit(10)) < 9, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(n_keys))).alias("k"),
        F.col("id").alias("lid"),
        F.concat(F.md5(F.col("id").cast("string")),
                 F.md5((F.col("id") + 1).cast("string")),
                 F.md5((F.col("id") + 2).cast("string")),
                 F.md5((F.col("id") + 3).cast("string"))).alias("pad"))
    right = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("weight"))
    joined = left.join(right.hint("merge"), "k")
    # references both sides -> not pushable below the join; always false
    # (len(pad)=128, weight <= 2*n_keys) -> empty, cheap to execute
    return joined.filter(F.length("pad") + F.col("weight") > F.lit(100_000))


def runtime_bloom_join_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective-build-side fact-fact join for demonstrating Catalyst's
    RUNTIME BLOOM FILTER (spark.sql.optimizer.runtime.bloomFilter.*):
    when one side of a shuffle join carries a selective filter, the
    optimizer aggregates a bloom filter over that side's join keys and
    injects `might_contain(...)` into the OTHER side's scan — rows that
    cannot match are dropped before the shuffle instead of after it. At
    100 TB this is the semi-join reduction that turns "shuffle the whole
    fact table" into "shuffle the ~1/5th that can possibly join".

    Plan + value assertions live in tests/test_plans.py (the filter is
    injected at optimization time, so the demonstration needs the conf
    set on the running session — same structure as aqe_skew_join_demo).
    On a default session the query still runs with identical results,
    just without the reduction."""
    from ..tables import load

    orders = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT")
              .select("o_orderkey", "o_orderpriority"))
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount")
    return (li.join(orders.hint("merge"),
                    F.col("l_orderkey") == F.col("o_orderkey"))
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                 .alias("urgent_revenue")))


_DPP_ORACLE = """
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
       count(*) AS n, round(sum(value), 6) AS total
FROM events
WHERE CAST(ts AS DATE) <
      CAST((SELECT min(ts) FROM events) AS DATE) + 3
GROUP BY 1
"""


@query("join_dpp_partitioned", oracle=_DPP_ORACLE)
def join_dpp_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning: the fact is date-partitioned (same
    layout as partition_pruned_scan), but the date predicate lives on a
    dimension table — the fact's pruning filter only materializes at
    runtime from the dim side of the join (Spark reuses the broadcast as
    `dynamicpruningexpression` in the scan's PartitionFilters — asserted
    in tests). At 100 TB this is how star-schema date filters skip fact
    partitions without the user ever touching the partition column."""
    from ..tables import dataset_tag
    tag = dataset_tag(sf_dir, "events")
    base = os.path.join(tempfile.gettempdir(), "hdr_part", tag)
    if not os.path.exists(os.path.join(base, "_SUCCESS")):
        (load(spark, sf_dir, "events")
         .withColumn("d", F.to_date("ts"))
         .write.partitionBy("d").mode("overwrite").parquet(base))
    dim_dir = os.path.join(tempfile.gettempdir(), "hdr_dpp_dim", tag)
    if not os.path.exists(os.path.join(dim_dir, "_SUCCESS")):
        ev = load(spark, sf_dir, "events")
        lo = ev.agg(F.min("ts")).first()[0].date()
        (ev.select(F.to_date("ts").alias("d")).distinct()
         .withColumn(
             "period",
             F.when(F.col("d") < F.lit(
                 lo + __import__("datetime").timedelta(days=3)), "early")
             .otherwise("late"))
         .write.mode("overwrite").parquet(dim_dir))
    fact = spark.read.parquet(base)
    # equality comparison, not a bare boolean column: the PartitionPruning
    # rule only injects for "likely selective" predicate shapes
    # (BinaryComparison/In/...), which a lone boolean attribute is not
    dim = spark.read.parquet(dim_dir).filter(F.col("period") == "early")
    return (fact.join(dim, "d")
            .groupBy(F.col("d").cast("string").alias("d"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 6).alias("total")))


def bloom_filter_join_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning (InjectRuntimeFilter): a
    selective filter on one side of a SHUFFLE join gets compiled into a
    bloom_filter_agg on that side and a might_contain pre-filter on the
    other — the probe side drops non-matching rows BEFORE the shuffle.
    At 100 TB this is the difference between shuffling the whole fact
    and shuffling only the ~selectivity fraction that can join.

    Broadcast joins don't need (or get) the rule, so the demo clones the
    session (newSession shares the context but not runtime conf) and
    disables autoBroadcastJoinThreshold to force the shuffle join — the
    driver-facing registered queries never mutate session conf. Returns
    the joined aggregate; tests assert bloom_filter_agg/might_contain in
    the optimized plan and that results match the un-filtered twin."""
    s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
                "100MB")
    o = load(s2, sf_dir, "orders").filter(
        (F.year("o_orderdate") == 1997) & (F.col("o_orderpriority") == "1-URGENT"))
    li = load(s2, sf_dir, "lineitem")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
                 .alias("revenue")))


@query("join_hint_shuffle_hash", oracle="""
SELECT o.o_orderstatus, count(*) AS n,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))) AS DOUBLE), 4)
         AS total
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderstatus
""")
def join_hint_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy HINT control: the same fact-fact join Catalyst would
    plan as broadcast (small side under the threshold at test SF) or
    sort-merge, forced to SHUFFLED HASH via .hint('shuffle_hash') —
    plan-asserted in tests. The knob that matters at 100 TB: when the
    build side fits executor memory per partition but not in a
    broadcast, shuffled-hash skips both the broadcast AND the sort-merge
    sort phases. Results are strategy-invariant (the oracle doesn't know
    or care which join ran)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").hint("shuffle_hash")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 # decimal-exact sum — see join_bucketed_colocated
                 F.round(F.sum(F.col("l_extendedprice")
                               .cast("decimal(14,2)")).cast("double"), 4)
                 .alias("total")))


@query("layout_zorder_files", oracle="""
WITH b AS (
  SELECT CAST(user_id % 16 AS INTEGER) AS ub,
         CAST(least(floor(value / 6.25), 15) AS INTEGER) AS vb
  FROM events
),
z AS (
  SELECT ub, vb,
         ((ub & 1) << 1) | (vb & 1)
         | (((ub >> 1) & 1) << 3) | (((vb >> 1) & 1) << 2)
         | (((ub >> 2) & 1) << 5) | (((vb >> 2) & 1) << 4)
         | (((ub >> 3) & 1) << 7) | (((vb >> 3) & 1) << 6) AS zkey
  FROM b
)
SELECT CAST(zkey >> 4 AS BIGINT) AS file_id,
       CAST(min(ub) AS BIGINT) AS ub_min, CAST(max(ub) AS BIGINT) AS ub_max,
       CAST(min(vb) AS BIGINT) AS vb_min, CAST(max(vb) AS BIGINT) AS vb_max,
       CAST(count(*) AS BIGINT) AS n
FROM z GROUP BY zkey >> 4
""")
def layout_zorder_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) data layout: interleave the bits of two
    bucketed dimensions (user bucket, value bucket — 4 bits each) into
    one sort key, split the keyspace into 16 'files', and publish each
    file's per-dimension min/max — the footer statistics a lakehouse
    OPTIMIZE ZORDER exists to tighten. Because Morton order localizes
    BOTH dimensions, every file's bounding box is a 4x4 cell (asserted
    in tests): a predicate on EITHER dimension skips 3/4 of the files,
    which a single-column sort can only do for its leading column.

    The interleave is pure integer bit arithmetic (shiftleft/and/or) —
    narrow, codegen-friendly; the only shuffle is the file_id-keyed
    stats aggregate. At 100 TB the same expression feeds
    `repartitionByRange(zkey)` + sortWithinPartitions before a parquet
    write — the stats query here is the audit that proves the layout
    clusters."""
    events = load(spark, sf_dir, "events")
    b = events.select(
        (F.col("user_id") % 16).cast("int").alias("ub"),
        F.least(F.floor(F.col("value") / 6.25), F.lit(15))
        .cast("int").alias("vb"))

    def bit(c, i):
        return F.shiftright(F.col(c), i).bitwiseAND(F.lit(1))

    zkey = sum(
        (F.shiftleft(bit("ub", i), 2 * i + 1)
         + F.shiftleft(bit("vb", i), 2 * i))
        for i in range(4))
    z = b.select("ub", "vb", zkey.alias("zkey"))
    return (z.groupBy(F.shiftright(F.col("zkey"), 4).cast("bigint")
                      .alias("file_id"))
            .agg(F.min("ub").cast("bigint").alias("ub_min"),
                 F.max("ub").cast("bigint").alias("ub_max"),
                 F.min("vb").cast("bigint").alias("vb_min"),
                 F.max("vb").cast("bigint").alias("vb_max"),
                 F.count(F.lit(1)).alias("n")))


_SPATIAL_R = 1.0  # neighbor radius; grid cell size == r (3x3 probe)


@query("spatial_grid_neighbor_join", oracle=f"""
WITH p AS (
  SELECT c_custkey AS id,
         (c_custkey * 37 % 1000) / 10.0 AS x,
         (c_custkey * 73 % 1000) / 10.0 AS y
  FROM customer
)
SELECT a.id AS id_a, b.id AS id_b,
       round(sqrt((a.x - b.x) * (a.x - b.x)
                  + (a.y - b.y) * (a.y - b.y)), 6) AS dist
FROM p a JOIN p b ON a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= {_SPATIAL_R} * {_SPATIAL_R}
""")
def spatial_grid_neighbor_join(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Spatial proximity join (all point pairs within radius r) via
    GRID BUCKETING — the pattern that makes spatial joins scale: each
    point probes its own cell plus the 8 neighbors (cell size == r, so
    any pair within r shares a probe cell), turning the quadratic
    distance join into an EQUI-join on cell id with exact distance
    verification on candidates only. The ORACLE is the all-pairs
    ground-truth form — the equality check proves the grid loses no
    pair, the same grading as minhash-banded vs exact Jaccard.

    Each qualifying pair is found exactly once: the probe explodes the
    LEFT side 9x and the right side keys on its single home cell, with
    id_a < id_b deduping direction. Coordinates derive from integer
    arithmetic (custkey*k % 1000 / 10) so both engines compute
    bit-identical doubles. At 100 TB: shuffle keys on cell id; skewed
    cells (urban hot spots) salt like any hot join key; cost is
    sum-of-squared-cell-occupancies, never n^2."""
    pts = (load(spark, sf_dir, "customer")
           .select(F.col("c_custkey").alias("id"),
                   ((F.col("c_custkey") * 37 % 1000) / 10.0).alias("x"),
                   ((F.col("c_custkey") * 73 % 1000) / 10.0).alias("y"))
           .withColumn("cx", F.floor(F.col("x") / _SPATIAL_R).cast("int"))
           .withColumn("cy", F.floor(F.col("y") / _SPATIAL_R).cast("int")))
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    probe = (pts.select("id", "x", "y", "cx", "cy",
                        F.explode(offsets).alias("o"))
             .select("id", "x", "y",
                     (F.col("cx") + F.col("o.dx")).alias("gx"),
                     (F.col("cy") + F.col("o.dy")).alias("gy")))
    home = pts.select(F.col("id").alias("id_b"),
                      F.col("x").alias("xb"), F.col("y").alias("yb"),
                      F.col("cx").alias("gx"), F.col("cy").alias("gy"))
    d2 = ((F.col("x") - F.col("xb")) * (F.col("x") - F.col("xb"))
          + (F.col("y") - F.col("yb")) * (F.col("y") - F.col("yb")))
    return (probe.join(home, ["gx", "gy"])
            .filter((F.col("id") < F.col("id_b"))
                    & (d2 <= F.lit(_SPATIAL_R * _SPATIAL_R)))
            .select(F.col("id").alias("id_a"), "id_b",
                    F.round(F.sqrt(d2), 6).alias("dist")))


# File-skipping simulation: predicate window (6 weeks) and the random
# layout's file count.
_SKIP_LO, _SKIP_HI = "1997-03-01", "1997-04-15"
_SKIP_NFILES = 64


@query("layout_file_skipping_stats", oracle=f"""
WITH f AS (
  SELECT o_orderkey, o_orderdate,
         CAST(datepart('year', o_orderdate) * 12
              + datepart('month', o_orderdate) AS BIGINT) AS fid_sorted,
         CAST(o_orderkey % {_SKIP_NFILES} AS BIGINT) AS fid_random
  FROM orders
),
layouts AS (
  SELECT 'time_partitioned' AS layout, fid_sorted AS fid, o_orderdate FROM f
  UNION ALL
  SELECT 'random', fid_random, o_orderdate FROM f
),
stats AS (
  SELECT layout, fid,
         min(o_orderdate) AS lo, max(o_orderdate) AS hi,
         count(*) AS n,
         sum(CASE WHEN o_orderdate >= TIMESTAMP '{_SKIP_LO}'
                   AND o_orderdate < TIMESTAMP '{_SKIP_HI}'
                  THEN 1 ELSE 0 END) AS matched
  FROM layouts GROUP BY layout, fid
)
SELECT layout,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN hi >= TIMESTAMP '{_SKIP_LO}'
                      AND lo < TIMESTAMP '{_SKIP_HI}'
                     THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       CAST(sum(CASE WHEN hi >= TIMESTAMP '{_SKIP_LO}'
                      AND lo < TIMESTAMP '{_SKIP_HI}'
                     THEN n ELSE 0 END) AS BIGINT) AS rows_read,
       CAST(sum(matched) AS BIGINT) AS rows_matched
FROM stats GROUP BY layout
""")
def layout_file_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-SKIPPING audit: simulate parquet footer min/max pruning for a
    6-week date predicate under two physical layouts of the same table —
    month-partitioned (the production `PARTITIONED BY (month)` / Iceberg
    partition-transform shape) vs hash-scattered (orderkey % N). Per
    layout: file count, files whose [min,max] interval intersects the
    predicate (these must be SCANNED), rows inside scanned files (actual
    IO), and rows truly matching. The gap between rows_read and
    rows_matched under 'random' vs 'time_partitioned' is the entire
    case for clustering: same table, same predicate, ~30x the IO.

    Everything is counts and min/max over exact timestamps — no float
    path. Scale shape: one combiner'd groupBy per layout on the file key
    (the UNION ALL doubles the scan but stays narrow); the final rollup
    is |files|-sized. This is the audit companion to layout_zorder_files
    (which clusters TWO dimensions; here the win is one-dimensional
    partition pruning, the `partition_pruned_scan` fast path)."""
    orders = load(spark, sf_dir, "orders")
    lo = F.lit(_SKIP_LO).cast("timestamp")
    hi = F.lit(_SKIP_HI).cast("timestamp")
    f = orders.select(
        "o_orderkey", "o_orderdate",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint").alias("fid_sorted"),
        (F.col("o_orderkey") % _SKIP_NFILES).cast("bigint")
        .alias("fid_random"))
    layouts = (
        f.select(F.lit("time_partitioned").alias("layout"),
                 F.col("fid_sorted").alias("fid"), "o_orderdate")
        .unionAll(
            f.select(F.lit("random").alias("layout"),
                     F.col("fid_random").alias("fid"), "o_orderdate")))
    in_pred = (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    stats = (layouts.groupBy("layout", "fid")
             .agg(F.min("o_orderdate").alias("flo"),
                  F.max("o_orderdate").alias("fhi"),
                  F.count(F.lit(1)).alias("n"),
                  F.sum(F.when(in_pred, 1).otherwise(0)).alias("matched")))
    scanned = (F.col("fhi") >= lo) & (F.col("flo") < hi)
    return (stats.groupBy("layout")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_files"),
                 F.sum(F.when(scanned, 1).otherwise(0)).cast("bigint")
                  .alias("files_scanned"),
                 F.sum(F.when(scanned, F.col("n")).otherwise(0))
                  .cast("bigint").alias("rows_read"),
                 F.sum("matched").cast("bigint").alias("rows_matched")))
