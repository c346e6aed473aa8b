"""Sketch aggregates: sublinear-state approximations for the
aggregations whose exact form cannot hold its state at 100 TB.

Exact distinct-count state is O(cardinality); HyperLogLog state is a few
KB at any cardinality. Exact percentile needs a full sort (or a
collected array); a quantile summary (GK/KLL-style, Spark's
percentile_approx) is bounded by 1/accuracy. Each sketch query here is
rows-only for the driver (the approximation algorithm differs across
engines, so no value-exact SQL oracle can exist) and is instead graded
by tests/test_sketches.py against the EXACT answers with the algorithm's
published error bound — a stronger check than value equality with a
same-algorithm oracle would be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..tables import load


@query("sketch_hll_distinct", rows_only=(
    "approx_count_distinct's HLL++ register layout and xxhash64 seed "
    "are Spark-internal — no other engine reproduces the estimate "
    "(sketch_hll_registers is the oracle-exact twin)",
    "test_hll_within_rsd"))
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event_type (rsd=2%) next to the
    exact count. Shuffle carries one HLL register block per key instead
    of every distinct user id."""
    ev = load(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", rsd=0.02)
                 .alias("approx_users"),
                 F.countDistinct("user_id").alias("exact_users"))
            .orderBy("event_type"))


@query("sketch_quantiles", oracle="""
SELECT event_type, 0.5 AS p,
       round(quantile_disc(value, 0.5), 6) AS approx_v,
       round(quantile_cont(value, 0.5), 6) AS exact_v
FROM events GROUP BY event_type
UNION ALL
SELECT event_type, 0.95,
       round(quantile_disc(value, 0.95), 6),
       round(quantile_cont(value, 0.95), 6)
FROM events GROUP BY event_type
UNION ALL
SELECT event_type, 0.99,
       round(quantile_disc(value, 0.99), 6),
       round(quantile_cont(value, 0.99), 6)
FROM events GROUP BY event_type
""")
def sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95/p99 of event value per type via Spark's
    quantile summary (percentile_approx), exact percentiles alongside —
    one exploded row per (event_type, p) so every value is a scalar the
    driver hasher can compare.

    Oracle note: a GK-style summary with accuracy A stores every value
    until n > A, so at verification scale (n per group << 1e6) the
    "approximation" is EXACTLY the lower discrete quantile — DuckDB's
    quantile_disc — while Spark's exact `percentile` is interpolated,
    matching quantile_cont. The sketch's bounded-state machinery is what
    runs (state <= 1/accuracy regardless of n); the oracle pins its
    small-n behavior, and the rank-error bound at large n is covered by
    tests/test_physical_sketches.py."""
    ev = load(spark, sf_dir, "events")
    pcts = [0.5, 0.95, 0.99]
    agg = (ev.groupBy("event_type")
           .agg(F.percentile_approx(
                    "value", F.array(*[F.lit(p) for p in pcts]), 1_000_000)
                .alias("ap"),
                F.expr("percentile(value, array(0.5, 0.95, 0.99))")
                .alias("ep")))
    pairs = F.array(*[
        F.struct(F.lit(p).alias("p"),
                 F.round(F.element_at("ap", i + 1), 6).alias("approx_v"),
                 F.round(F.element_at("ep", i + 1), 6).alias("exact_v"))
        for i, p in enumerate(pcts)
    ])
    return (agg.select("event_type", F.explode(pairs).alias("x"))
            .select("event_type", "x.p", "x.approx_v", "x.exact_v"))


@query("sketch_cms_heavy_hitters", rows_only=(
    "count_min_sketch's binary serialization and hash seeds are "
    "Spark-internal (sketch_cms_registers is the oracle-exact twin)",
    "test_cms_builtin_point_estimates_bounded"))
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch point estimates for the heavy-hitter users: build
    one CMS over user_id (eps=0.1%, conf=99%), query the top-10 exact
    users against it. CMS never under-counts; over-count is bounded by
    eps * N."""
    ev = load(spark, sf_dir, "events")
    top = (ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
           .orderBy(F.desc("exact_n"), "user_id").limit(10))
    cms = ev.agg(F.expr(
        "hex(count_min_sketch(user_id, 0.001d, 0.99d, 42))").alias("sk"))
    # Spark has no SQL built-in for CMS point queries; the query surfaces
    # the sketch (built as one distributed aggregate) next to the exact
    # top-10, demonstrating the mergeable-sketch shuffle shape.
    return (top.crossJoin(F.broadcast(cms))
            .select("user_id", "exact_n",
                    (F.length("sk") / 2).cast("bigint").alias("sketch_bytes")))


@query("sketch_hll_registers", oracle="""
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS hv
  FROM events
),
r AS (
  SELECT event_type, hv % 256 AS bucket, hv // 256 AS w FROM h
),
reg AS (
  SELECT event_type, bucket,
         max(CASE WHEN w = 0 THEN 25
                  ELSE 24 - CAST(floor(log2(w)) AS BIGINT) END) AS register
  FROM r GROUP BY event_type, bucket
)
SELECT event_type, bucket, register FROM reg
""")
def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-rolled HyperLogLog built RELATIONALLY with a content hash —
    the oracle-exact twin of the opaque built-in (sketch_hll_distinct):
    h = det_hash64(user_id) (32-bit), bucket = low 8 bits' complement
    split h % 256, w = remaining 24 bits, register = max over the bucket
    of (leading-zero count of w in 24 bits) + 1 = 24 - floor(log2(w))
    (25 when w = 0). The (event_type, bucket) -> max aggregation IS the
    sketch state: 256 small integers per key, mergeable by max —
    the exact shuffle shape HLL buys at 100 TB, with every register
    bit-reproducible in any engine. The estimate derived from these
    registers is graded against the exact distinct count (published HLL
    error bound) in tests/test_physical_sketches.py."""
    from ..functions.vector import det_hash64

    ev = load(spark, sf_dir, "events")
    hv = det_hash64(F.col("user_id").cast("string"))
    w = F.floor(hv / 256)
    register = F.when(w == 0, F.lit(25)).otherwise(
        24 - F.floor(F.log2(w.cast("double")))).cast("bigint")
    return (ev.select("event_type", (hv % 256).alias("bucket"),
                      register.alias("reg"))
            .groupBy("event_type", "bucket")
            .agg(F.max("reg").alias("register")))


def hll_estimate_from_registers(reg_df: DataFrame, m: int = 256) -> DataFrame:
    """Fold (key, bucket, register) sketch state into the HLL cardinality
    estimate (Flajolet et al. 2007): E = alpha_m * m^2 / (V + sum 2^-Mj)
    over PRESENT buckets, V = number of EMPTY buckets (2^-0 each), with
    the small-range linear-counting correction E <= 2.5m -> m*ln(m/V).
    Pure relational fold of the register rows — runs anywhere the state
    lives, which is the point of a mergeable sketch."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = (reg_df.groupBy("event_type")
           .agg(F.sum(F.pow(F.lit(2.0), -F.col("register"))).alias("s"),
                F.count(F.lit(1)).alias("present")))
    v = F.lit(float(m)) - F.col("present")  # empty buckets
    e_raw = F.lit(alpha * m * m) / (F.col("s") + v)
    e = F.when((e_raw <= 2.5 * m) & (v > 0),
               F.lit(float(m)) * F.log(F.lit(float(m)) / v)
               ).otherwise(e_raw)
    return agg.select("event_type", e.alias("hll_estimate"))


@query("sketch_hll_merge_rollup", oracle="""
WITH h AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS hv
  FROM events
),
daily AS (
  SELECT event_type, day, hv % 256 AS bucket,
         max(CASE WHEN hv // 256 = 0 THEN 25
                  ELSE 24 - CAST(floor(log2(hv // 256)) AS BIGINT) END)
           AS register
  FROM h GROUP BY event_type, day, bucket
)
SELECT event_type, bucket,
       max(register) AS register,
       count(*) AS days_present
FROM daily GROUP BY event_type, bucket
""")
def sketch_hll_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ROLLUP: the continuous-aggregate pattern a 100 TB pipeline
    actually runs. Build per-(event_type, DAY) HLL register state (the
    stored pre-aggregate — what a streaming job would upsert hourly),
    then MERGE the daily sketches up to event_type level with a plain
    max per register.

    The oracle recomputes the registers directly from the raw rows, so a
    hash-MATCH here is a machine-checked proof that merge(daily sketches)
    == sketch(all rows) — the algebraic property (max is commutative,
    associative, idempotent) that lets register state roll up across any
    time partitioning without rescanning history. days_present counts how
    many daily sketches each merged register actually folded. Estimation
    from the merged registers: hll_estimate_from_registers (tested with
    the published error bound in tests/test_physical_sketches.py)."""
    from ..functions.vector import det_hash64

    ev = load(spark, sf_dir, "events")
    hv = det_hash64(F.col("user_id").cast("string"))
    w = F.floor(hv / 256)
    register = F.when(w == 0, F.lit(25)).otherwise(
        24 - F.floor(F.log2(w.cast("double")))).cast("bigint")
    daily = (ev.select("event_type",
                       F.date_trunc("day", "ts").cast("date").alias("day"),
                       (hv % 256).alias("bucket"), register.alias("reg"))
             .groupBy("event_type", "day", "bucket")
             .agg(F.max("reg").alias("register")))
    return (daily.groupBy("event_type", "bucket")
            .agg(F.max("register").alias("register"),
                 F.count(F.lit(1)).alias("days_present")))


@query("rollup_reaggregation", oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         count(*) AS n, sum(CAST(value AS DECIMAL(18,6))) AS s,
         min(value) AS mn, max(value) AS mx
  FROM events GROUP BY 1, 2
)
SELECT strftime(CAST(date_trunc('day', h) AS DATE), '%Y-%m-%d') AS day, event_type,
       CAST(sum(n) AS BIGINT) AS n,
       round(CAST(sum(s) AS DOUBLE) / sum(n), 6) AS avg_value,
       round(min(mn), 6) AS min_value,
       round(max(mx), 6) AS max_value
FROM hourly GROUP BY 1, 2
""")
def rollup_reaggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate rollup done RIGHT: the hourly pre-aggregate
    stores the mergeable state (count, sum, min, max) — never the
    derived mean — and the daily view re-derives avg as merged-sum /
    merged-count. Averaging the hourly averages would weight every hour
    equally regardless of row count; the oracle recomputes daily stats
    through the same hourly state, and the hash MATCH certifies the
    re-aggregation algebra end-to-end.

    At 100 TB this is the hypertable/materialized-rollup pattern: raw
    events age out, hourly state is ~5 rows/key/day, and every coarser
    granularity derives from it without rescanning history — the plain-
    aggregate sibling of sketch_hll_merge_rollup (registers for
    distinct-count, (n, sum, min, max) for moments). The stored sum is
    DECIMAL so merging is exact integer arithmetic — the merged result
    is bit-identical under ANY partitioning or merge order, which is the
    property a distributed rollup must have (float sums are
    order-dependent and flipped a rounding midpoint in testing)."""
    ev = load(spark, sf_dir, "events")
    hourly = (ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
                   F.min("value").alias("mn"), F.max("value").alias("mx")))
    return (hourly.groupBy(F.date_format(F.date_trunc("day", "h"), "yyyy-MM-dd").alias("day"),
                           "event_type")
            .agg(F.sum("n").cast("bigint").alias("n"),
                 F.round(F.sum("s").cast("double") / F.sum("n"), 6)
                 .alias("avg_value"),
                 F.round(F.min("mn"), 6).alias("min_value"),
                 F.round(F.max("mx"), 6).alias("max_value")))


_CMS_D, _CMS_W = 4, 32

_CMS_REG_ORACLE = f"""
WITH h AS (
  SELECT e.user_id, r.j,
         ('0x' || substr(md5(CAST(r.j AS VARCHAR) || '|' ||
                             CAST(e.user_id AS VARCHAR)), 1, 8))::BIGINT
           % {_CMS_W} AS b
  FROM events e CROSS JOIN range({_CMS_D}) r(j)
),
cms AS (SELECT j, b, count(*) AS c FROM h GROUP BY j, b),
top AS (SELECT user_id, count(*) AS exact_n FROM events
        GROUP BY user_id ORDER BY exact_n DESC, user_id LIMIT 10),
probe AS (
  SELECT t.user_id, t.exact_n, r.j,
         ('0x' || substr(md5(CAST(r.j AS VARCHAR) || '|' ||
                             CAST(t.user_id AS VARCHAR)), 1, 8))::BIGINT
           % {_CMS_W} AS b
  FROM top t CROSS JOIN range({_CMS_D}) r(j)
)
SELECT p.user_id, p.exact_n, CAST(min(c.c) AS BIGINT) AS est_n
FROM probe p JOIN cms c ON c.j = p.j AND c.b = p.b
GROUP BY p.user_id, p.exact_n
"""


@query("sketch_cms_registers", oracle=_CMS_REG_ORACLE)
def sketch_cms_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch, ORACLE-EXACT — the relational twin of
    sketch_cms_heavy_hitters (whose built-in count_min_sketch has an
    opaque serialization no other engine can replay). The d x w counter
    grid is an ordinary keyed aggregate over md5-derived row hashes
    (engine-invariant, same recipe as sketch_hll_registers); the top-10
    heavy users then probe it with est = min over rows of their bucket
    counts. CMS's one-sided guarantee (est_n >= exact_n) is asserted in
    tests. At 100 TB: the sketch build is one map-side-combined
    aggregate into d*w counters — mergeable state, the rollup shape —
    and the probe touches d rows per queried key."""
    from ..functions.vector import det_hash64

    ev = load(spark, sf_dir, "events")
    js = F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("j")
    b = (det_hash64(F.concat_ws("|", F.col("j"), F.col("user_id")))
         % _CMS_W).alias("b")
    cms = (ev.select("user_id").select("user_id", js).select("j", b)
           .groupBy("j", "b").agg(F.count(F.lit(1)).alias("c")))
    top = (ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
           .orderBy(F.desc("exact_n"), "user_id").limit(10))
    probe = top.select("user_id", "exact_n", js).select(
        "user_id", "exact_n", "j", b)
    return (probe.join(F.broadcast(cms), ["j", "b"])
            .groupBy("user_id", "exact_n")
            .agg(F.min("c").cast("bigint").alias("est_n")))


@query("sketch_hll_datasketches", rows_only=(
    "DataSketches HLL estimates depend on the library's internal "
    "hash/estimator; DuckDB cannot replay them",
    "test_hll_datasketches_error_bound"))
def sketch_hll_datasketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache DataSketches HLL surface (Spark 4 built-ins): per-type
    sketches via hll_sketch_agg, MERGED with hll_union_agg into a global
    sketch — the two-level rollup pattern (partial sketches are
    mergeable state, so re-aggregation needs no raw-data re-scan).
    Rows-only by design: the DataSketches binary is engine-opaque (the
    oracle-exact relational twin is sketch_hll_registers); tests bound
    the estimates against exact distinct counts instead. At 100 TB the
    sketch bytes per group replace a count-distinct shuffle of raw ids."""
    ev = load(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events")
    per_type = spark.sql("""
        SELECT event_type,
               hll_sketch_estimate(hll_sketch_agg(user_id)) AS approx_users,
               hll_sketch_agg(user_id) AS sk
        FROM events GROUP BY event_type""")
    per_type.createOrReplaceTempView("hdr_hll_per_type")
    merged = spark.sql("""
        SELECT 'ALL' AS event_type,
               hll_sketch_estimate(hll_union_agg(sk)) AS approx_users
        FROM hdr_hll_per_type""")
    return (per_type.select("event_type", "approx_users")
            .unionByName(merged))


@query("sketch_hll_intersection", oracle="""
WITH h AS (
  SELECT event_type, user_id,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS hv
  FROM events
),
reg AS (
  SELECT event_type, hv % 256 AS bucket,
         max(CASE WHEN hv // 256 = 0 THEN 25
                  ELSE 24 - CAST(floor(log2(hv // 256)) AS BIGINT) END)
           AS register
  FROM h GROUP BY event_type, hv % 256
),
types AS (SELECT DISTINCT event_type FROM events),
pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb
  FROM types a JOIN types b ON a.event_type < b.event_type
),
est AS (
  SELECT event_type,
         CASE WHEN 0.7213 / (1.0 + 1.079 / 256) * 65536.0
                   / (sum(pow(2.0, -register)) + 256 - count(*)) <= 640.0
                   AND 256 - count(*) > 0
              THEN 256.0 * ln(256.0 / (256 - count(*)))
              ELSE 0.7213 / (1.0 + 1.079 / 256) * 65536.0
                   / (sum(pow(2.0, -register)) + 256 - count(*)) END AS e
  FROM reg GROUP BY event_type
),
ureg AS (
  SELECT p.ta, p.tb, r.bucket, max(r.register) AS register
  FROM pairs p JOIN reg r ON r.event_type IN (p.ta, p.tb)
  GROUP BY p.ta, p.tb, r.bucket
),
estu AS (
  SELECT ta, tb,
         CASE WHEN 0.7213 / (1.0 + 1.079 / 256) * 65536.0
                   / (sum(pow(2.0, -register)) + 256 - count(*)) <= 640.0
                   AND 256 - count(*) > 0
              THEN 256.0 * ln(256.0 / (256 - count(*)))
              ELSE 0.7213 / (1.0 + 1.079 / 256) * 65536.0
                   / (sum(pow(2.0, -register)) + 256 - count(*)) END AS eu
  FROM ureg GROUP BY ta, tb
),
du AS (SELECT DISTINCT event_type, user_id FROM events),
ex AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         count(*) AS exact_intersection
  FROM du a JOIN du b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT p.ta AS type_a, p.tb AS type_b,
       round(ea.e, 4) AS est_a,
       round(eb.e, 4) AS est_b,
       round(estu.eu, 4) AS est_union,
       round(ea.e + eb.e - estu.eu, 4) AS est_intersection,
       CAST(coalesce(ex.exact_intersection, 0) AS BIGINT)
         AS exact_intersection
FROM pairs p
JOIN est ea ON ea.event_type = p.ta
JOIN est eb ON eb.event_type = p.tb
JOIN estu ON estu.ta = p.ta AND estu.tb = p.tb
LEFT JOIN ex ON ex.ta = p.ta AND ex.tb = p.tb
""")
def sketch_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from SKETCH STATE ALONE: pairwise
    event-type user overlap via inclusion-exclusion
    (|A∩B| ≈ E(A) + E(B) - E(A∪B)), where the union sketch is just the
    per-bucket max of the two register sets — the operation that makes
    HLL state composable (same max-merge as the rollup). The exact
    intersection rides along as ground truth, so the result row itself
    documents the estimator's error.

    Register sums are dyadic rationals (2^-k) — EXACT in float64, so the
    only cross-engine float hazard is one ln per estimate, absorbed by
    the 4-digit grid. At 100 TB the register state per key is 256 rows;
    every pairwise union is state x state work, never data x data — the
    reason ad-tech audience systems store sketches, not user lists."""
    from ..functions.vector import det_hash64

    ev = load(spark, sf_dir, "events")
    hv = det_hash64(F.col("user_id").cast("string"))
    w = F.floor(hv / 256)
    register = F.when(w == 0, F.lit(25)).otherwise(
        24 - F.floor(F.log2(w.cast("double")))).cast("bigint")
    reg = (ev.select("event_type", (hv % 256).alias("bucket"),
                     register.alias("reg"))
           .groupBy("event_type", "bucket")
           .agg(F.max("reg").alias("register")))

    def estimate(grouped):
        alpha = 0.7213 / (1.0 + 1.079 / 256)
        s = F.sum(F.pow(F.lit(2.0), -F.col("register")))
        present = F.count(F.lit(1))
        v = F.lit(256.0) - present
        e_raw = F.lit(alpha * 65536.0) / (s + v)
        return grouped.agg(
            F.when((e_raw <= 640.0) & (v > 0),
                   F.lit(256.0) * F.log(F.lit(256.0) / v))
            .otherwise(e_raw).alias("e"))

    est = estimate(reg.groupBy("event_type"))
    types = ev.select("event_type").distinct()
    pairs = (types.select(F.col("event_type").alias("ta"))
             .join(types.select(F.col("event_type").alias("tb")),
                   F.col("ta") < F.col("tb")))
    ureg = (pairs.join(reg, reg.event_type.isin(F.col("ta"), F.col("tb")))
            .groupBy("ta", "tb", "bucket")
            .agg(F.max("register").alias("register")))
    estu = estimate(ureg.groupBy("ta", "tb")).withColumnRenamed("e", "eu")
    du = ev.select("event_type", "user_id").distinct()
    ex = (du.alias("a")
          .join(du.alias("b"),
                (F.col("a.user_id") == F.col("b.user_id"))
                & (F.col("a.event_type") < F.col("b.event_type")))
          .groupBy(F.col("a.event_type").alias("ta"),
                   F.col("b.event_type").alias("tb"))
          .agg(F.count(F.lit(1)).alias("exact_intersection")))
    ea = est.select(F.col("event_type").alias("ta"), F.col("e").alias("e_a"))
    eb = est.select(F.col("event_type").alias("tb"), F.col("e").alias("e_b"))
    return (pairs.join(ea, "ta").join(eb, "tb")
            .join(estu, ["ta", "tb"])
            .join(ex, ["ta", "tb"], "left")
            .select(F.col("ta").alias("type_a"),
                    F.col("tb").alias("type_b"),
                    F.round("e_a", 4).alias("est_a"),
                    F.round("e_b", 4).alias("est_b"),
                    F.round("eu", 4).alias("est_union"),
                    F.round(F.col("e_a") + F.col("e_b") - F.col("eu"), 4)
                    .alias("est_intersection"),
                    F.coalesce("exact_intersection", F.lit(0))
                    .cast("bigint").alias("exact_intersection")))


# ---------------------------------------------------------------------------
# Relational Bloom filter with measured false-positive rate.

_BLOOM_M = 4096   # filter bits
_BLOOM_K = 3      # hash functions per element


@query("sketch_bloom_membership", oracle=f"""
WITH members AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
),
allu AS (SELECT DISTINCT user_id FROM events),
bits AS (
  SELECT DISTINCT
         ('0x' || substr(md5(CAST(m.user_id AS VARCHAR) || '|' ||
                             CAST(k.j AS VARCHAR)), 1, 8))::BIGINT
           % {_BLOOM_M} AS pos
  FROM members m CROSS JOIN range({_BLOOM_K}) k(j)
),
probe AS (
  SELECT a.user_id,
         ('0x' || substr(md5(CAST(a.user_id AS VARCHAR) || '|' ||
                             CAST(k.j AS VARCHAR)), 1, 8))::BIGINT
           % {_BLOOM_M} AS pos
  FROM allu a CROSS JOIN range({_BLOOM_K}) k(j)
),
verdict AS (
  SELECT p.user_id,
         CAST(count(b.pos) AS BIGINT) = {_BLOOM_K} AS positive,
         max(CASE WHEN m.user_id IS NOT NULL THEN 1 ELSE 0 END) = 1
           AS is_member
  FROM probe p
  LEFT JOIN bits b ON b.pos = p.pos
  LEFT JOIN members m ON m.user_id = p.user_id
  GROUP BY p.user_id
)
SELECT CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
         AS n_members,
       CAST(count(*) AS BIGINT) AS n_tested,
       CAST(sum(CASE WHEN positive AND NOT is_member THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       round(sum(CASE WHEN positive AND NOT is_member THEN 1 ELSE 0 END)
             * 1.0
             / nullif(sum(CASE WHEN NOT is_member THEN 1 ELSE 0 END), 0),
             6) AS fpr
FROM verdict
""")
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational Bloom filter, built AND audited: k=3 det-hash
    bit positions per member (purchasing users), the distinct-position
    set IS the filter, every known user probes it, and the one-row
    report publishes the measured false-positive rate — the audit a
    pipeline runs before trusting a Bloom pre-filter (fill is bounded
    by k x n_members / m, derivable from the report) (bloom_filter_join_demo is the engine-native runtime
    version; this one is engine-portable and oracle-exact, the same
    relationship sketch_hll_registers has to sketch_hll_distinct).

    Scale shape: the filter is a DISTINCT over m=4096 possible
    positions (bounded state, mergeable by union — the Bloom property);
    probes equi-join on the position key. Membership truth rides a
    broadcast of the member list here; the production audit samples
    probes instead of testing every key, same plan."""
    from ..functions.vector import det_hash64

    ev = load(spark, sf_dir, "events")
    members = (ev.filter(F.col("event_type") == "purchase")
               .select("user_id").distinct())
    allu = ev.select("user_id").distinct()
    ks = F.explode(F.array(*[F.lit(j) for j in range(_BLOOM_K)])).alias("j")
    pos = (det_hash64(F.concat_ws("|", F.col("user_id"), F.col("j")))
           % _BLOOM_M).alias("pos")
    bits = members.select("user_id", ks).select(pos).distinct()
    probe = allu.select("user_id", ks).select("user_id", pos)
    verdict = (probe
               .join(bits.withColumn("hit", F.lit(1)), "pos", "left")
               .join(F.broadcast(members.withColumn("is_m", F.lit(1))),
                     "user_id", "left")
               .groupBy("user_id")
               .agg((F.count("hit") == _BLOOM_K).alias("positive"),
                    (F.max(F.coalesce("is_m", F.lit(0))) == 1)
                    .alias("is_member")))
    fp = F.sum(F.when(F.col("positive") & ~F.col("is_member"), 1)
               .otherwise(0))
    non_m = F.sum(F.when(~F.col("is_member"), 1).otherwise(0))
    return (verdict.agg(
        F.sum(F.when(F.col("is_member"), 1).otherwise(0)).cast("bigint")
        .alias("n_members"),
        F.count(F.lit(1)).cast("bigint").alias("n_tested"),
        fp.cast("bigint").alias("n_false_pos"),
        F.round(fp * 1.0 / F.nullif(non_m, F.lit(0)), 6).alias("fpr")))


# KMV sketch size.
_KMV_K = 64


@query("sketch_kmv_distinct", oracle=f"""
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS hv
  FROM events
),
rk AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n_distinct_hashes
  FROM h
)
SELECT event_type,
       CAST(max(rn) AS BIGINT) AS k_kept,
       CAST(max(hv) AS BIGINT) AS kth_min_hash,
       CAST(max(n_distinct_hashes) AS BIGINT) AS n_distinct_hashes
FROM rk WHERE rn <= {_KMV_K}
GROUP BY event_type
""")
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) DISTINCT sketch (Bar-Yossef et al. 2002;
    Beyer et al. 2007) — the second mergeable cardinality-estimator
    family next to HLL (sketch_hll_registers): keep the K smallest
    distinct 32-bit hashes per key; the unbiased estimate is
    (K - 1) * 2^32 / kth_min_hash (decoded and graded against the exact
    distinct count in tests/test_physical_sketches.py — estimates are
    floats, the SHIPPED state is integers). Unlike HLL, a KMV also
    supports set intersection via the k-min union trick, which is why
    theta-sketch engines build on it. Output: the sketch boundary
    (k_kept, kth_min_hash) plus the exact distinct-hash count the test
    uses as its reference.

    Scale shape: a distinct on (key, hash) — combiner'd, the hash is
    8 bytes — then one key-partitioned window for the k smallest.
    MERGE of two KMVs = union the value sets, re-take the k smallest:
    relationally a unionByName + the same window, the continuous-
    aggregate shape of sketch_hll_merge_rollup. The per-key window is
    safe because state per key is K values; the distinct before it is
    the corpus-wide edge and carries ONLY (key, 8-byte hash)."""
    from pyspark.sql import Window as W

    from ..functions.vector import det_hash64

    ev = load(spark, sf_dir, "events")
    h = (ev.select("event_type",
                   det_hash64(F.col("user_id").cast("string")).alias("hv"))
         .distinct())
    wk = W.partitionBy("event_type").orderBy("hv")
    wall = W.partitionBy("event_type")
    rk = (h.withColumn("rn", F.row_number().over(wk))
          .withColumn("n_distinct_hashes", F.count(F.lit(1)).over(wall)))
    return (rk.filter(F.col("rn") <= _KMV_K)
            .groupBy("event_type")
            .agg(F.max("rn").cast("bigint").alias("k_kept"),
                 F.max("hv").cast("bigint").alias("kth_min_hash"),
                 F.max("n_distinct_hashes").cast("bigint")
                 .alias("n_distinct_hashes")))


@query("sketch_kmv_intersection", oracle=f"""
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS hv
  FROM events),
rk AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h),
sk AS (SELECT event_type, hv FROM rk WHERE rn <= {_KMV_K}),
th AS (SELECT event_type, max(hv) AS theta, count(*) AS k_kept
       FROM sk GROUP BY event_type),
pr AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         least(a.theta, b.theta) AS theta
  FROM th a JOIN th b ON a.event_type < b.event_type),
cm AS (
  SELECT p.type_a, p.type_b, count(*) AS common
  FROM pr p
  JOIN sk sa ON sa.event_type = p.type_a AND sa.hv <= p.theta
  JOIN sk sb ON sb.event_type = p.type_b AND sb.hv = sa.hv
  GROUP BY p.type_a, p.type_b),
ub AS (
  SELECT p.type_a, p.type_b, count(DISTINCT s.hv) AS union_below
  FROM pr p
  JOIN sk s ON s.event_type IN (p.type_a, p.type_b) AND s.hv <= p.theta
  GROUP BY p.type_a, p.type_b),
ex AS (
  SELECT u1.event_type AS type_a, u2.event_type AS type_b,
         count(*) AS exact_common
  FROM (SELECT DISTINCT event_type, user_id FROM events) u1
  JOIN (SELECT DISTINCT event_type, user_id FROM events) u2
    ON u1.user_id = u2.user_id AND u1.event_type < u2.event_type
  GROUP BY 1, 2),
est AS (
  SELECT p.type_a, p.type_b, p.theta,
         COALESCE(c.common, 0) AS common,
         u.union_below,
         COALESCE(c.common, 0) * 1.0 / NULLIF(u.union_below, 0) AS jc,
         (u.union_below - 1) * 4294967296.0 / NULLIF(p.theta, 0) AS ue
  FROM pr p
  LEFT JOIN cm c ON c.type_a = p.type_a AND c.type_b = p.type_b
  JOIN ub u ON u.type_a = p.type_a AND u.type_b = p.type_b)
SELECT e.type_a, e.type_b, CAST(e.theta AS BIGINT) AS theta,
       CAST(e.common AS BIGINT) AS common,
       CAST(e.union_below AS BIGINT) AS union_below,
       round(e.jc, 6) AS jaccard_est,
       round(e.ue, 6) AS union_est,
       round(e.jc * e.ue, 6) AS inter_est,
       CAST(COALESCE(x.exact_common, 0) AS BIGINT) AS exact_common
FROM est e
LEFT JOIN ex x ON x.type_a = e.type_a AND x.type_b = e.type_b
""")
def sketch_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/THETA-sketch SET INTERSECTION (Beyer et al. 2007 k-min
    synopses; the Dasgupta et al. theta-sketch framework): for every
    pair of event types, combine their K-minimum-value sketches with
    the k-min union trick — theta = min(theta_a, theta_b), keep each
    side's sample BELOW theta, estimate Jaccard as |common|/|union
    sample|, union cardinality as (|union sample|-1)*2^32/theta, and
    intersection as their product. This is THE reason KMV exists next
    to HLL: sketch_hll_intersection can only inclusion-exclude (error
    grows with |A|+|B| over the true overlap), while the k-min union
    trick estimates the overlap from a DIRECT sample of it —
    audience-overlap at 100 TB runs on this sketch algebra. The exact distinct intersection rides along as the
    demonstration column (production drops it — it is the corpus-wide
    join the sketch replaces).

    Determinism: the same md5-prefix 32-bit hash as sketch_kmv_distinct
    (det_hash64), all sketch state integer; the three estimates divide
    exact int64s with identical expression trees both engines, rounded
    once at output.

    Scale shape: one distinct on (key, hash) then a per-key window —
    identical to sketch_kmv_distinct; everything pairwise happens on
    K-sized sketch state (K*|keys| rows, broadcast-joinable model
    state). |keys| choose 2 pairs of K-row intersections is sketch
    algebra, not data movement."""
    from pyspark.sql import Window as W

    from ..functions.vector import det_hash64

    ev = load(spark, sf_dir, "events")
    h = (ev.select("event_type",
                   det_hash64(F.col("user_id").cast("string")).alias("hv"))
         .distinct())
    wk = W.partitionBy("event_type").orderBy("hv")
    sk = (h.withColumn("rn", F.row_number().over(wk))
          .filter(F.col("rn") <= _KMV_K).select("event_type", "hv"))
    th = (sk.groupBy("event_type")
          .agg(F.max("hv").alias("theta"), F.count(F.lit(1)).alias("k_kept")))
    a, b = th.alias("a"), th.alias("b")
    pr = (a.join(b, F.col("a.event_type") < F.col("b.event_type"))
          .select(F.col("a.event_type").alias("type_a"),
                  F.col("b.event_type").alias("type_b"),
                  F.least("a.theta", "b.theta").alias("theta")))
    sa, sb = sk.alias("sa"), sk.alias("sb")
    cm = (pr.alias("p")
          .join(sa, (F.col("sa.event_type") == F.col("p.type_a"))
                & (F.col("sa.hv") <= F.col("p.theta")))
          .join(sb, (F.col("sb.event_type") == F.col("p.type_b"))
                & (F.col("sb.hv") == F.col("sa.hv")))
          .groupBy("p.type_a", "p.type_b")
          .agg(F.count(F.lit(1)).alias("common")))
    s = sk.alias("s")
    ub = (pr.alias("p")
          .join(s, ((F.col("s.event_type") == F.col("p.type_a"))
                    | (F.col("s.event_type") == F.col("p.type_b")))
                & (F.col("s.hv") <= F.col("p.theta")))
          .groupBy("p.type_a", "p.type_b")
          .agg(F.countDistinct("s.hv").alias("union_below")))
    u1 = ev.select("event_type", "user_id").distinct().alias("u1")
    u2 = ev.select("event_type", "user_id").distinct().alias("u2")
    ex = (u1.join(u2, (F.col("u1.user_id") == F.col("u2.user_id"))
                  & (F.col("u1.event_type") < F.col("u2.event_type")))
          .groupBy(F.col("u1.event_type").alias("type_a"),
                   F.col("u2.event_type").alias("type_b"))
          .agg(F.count(F.lit(1)).alias("exact_common")))
    est = (pr.join(cm, ["type_a", "type_b"], "left")
           .join(ub, ["type_a", "type_b"])
           .withColumn("common", F.coalesce("common", F.lit(0)))
           # NULLIF guards (ADVICE r07): theta==0 (a key whose only member
           # hashes to md5-prefix 0) or an empty union sample would divide
           # by zero, and the two engines disagree on 0/0. Mirrored NULLIF
           # in the oracle keeps the degenerate case NULL on both sides.
           .withColumn("jc", F.col("common") * 1.0
                       / F.nullif(F.col("union_below"), F.lit(0)))
           .withColumn("ue", (F.col("union_below") - 1) * 4294967296.0
                       / F.nullif(F.col("theta"), F.lit(0))))
    return (est.join(ex, ["type_a", "type_b"], "left")
            .select("type_a", "type_b",
                    F.col("theta").cast("bigint").alias("theta"),
                    F.col("common").cast("bigint").alias("common"),
                    F.col("union_below").cast("bigint").alias("union_below"),
                    F.round("jc", 6).alias("jaccard_est"),
                    F.round("ue", 6).alias("union_est"),
                    F.round(F.col("jc") * F.col("ue"), 6).alias("inter_est"),
                    F.coalesce("exact_common", F.lit(0)).cast("bigint")
                    .alias("exact_common")))


# AMS tug-of-war F2 sketch: 40 sign counters in 5 groups of 8 — the
# median-of-means layout from the paper. 5 groups give a TRUE median
# (3rd order statistic, no averaging of middle elements), and means
# over 8 are exact dyadic doubles, so the estimate is deterministic
# integer algebra until the single output rounding.
_AMS_GROUPS, _AMS_PER_GROUP = 5, 8
_AMS_K = _AMS_GROUPS * _AMS_PER_GROUP


@query("sketch_moments_ams", oracle=f"""
WITH f AS (
  SELECT event_type, user_id, count(*) AS fv
  FROM events GROUP BY event_type, user_id),
sgn AS (
  SELECT f.event_type, f.fv, j.j,
         CASE WHEN ('0x' || substr(md5(CAST(f.user_id AS VARCHAR)
                                        || ':' || CAST(j.j AS VARCHAR)),
                    1, 8))::BIGINT % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM f CROSS JOIN generate_series(0, {_AMS_K - 1}) j(j)),
x AS (SELECT event_type, j, sum(fv * s) AS xj
      FROM sgn GROUP BY event_type, j),
gm AS (SELECT event_type, j // {_AMS_PER_GROUP} AS g,
              CAST(sum(xj * xj) AS DOUBLE) / {_AMS_PER_GROUP} AS mean2
       FROM x GROUP BY event_type, j // {_AMS_PER_GROUP}),
med AS (
  SELECT event_type, mean2 AS f2_est FROM (
    SELECT event_type, mean2,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY mean2, g) AS rn
    FROM gm) WHERE rn = {_AMS_GROUPS // 2 + 1}),
ex AS (SELECT event_type, sum(fv * fv) AS f2_exact FROM f
       GROUP BY event_type)
SELECT e.event_type, CAST(e.f2_exact AS BIGINT) AS f2_exact,
       round(m.f2_est, 6) AS f2_est,
       round(abs(m.f2_est - e.f2_exact) / e.f2_exact, 6) AS rel_err
FROM ex e JOIN med m USING (event_type)
""")
def sketch_moments_ams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS "tug-of-war" SECOND-MOMENT sketch (Alon, Matias & Szegedy
    1996 — the Godel-prize streaming result): estimate F2 = sum_v f_v^2
    (self-join size / repeat-rate, the quantity a join optimizer and a
    skew detector both want) from {_AMS_K} integer counters per key
    instead of a value-frequency table. Each counter X_j = sum_v f_v *
    s_j(v) with deterministic +/-1 hashes; E[X_j^2] = F2, and the
    median of {_AMS_GROUPS} means of {_AMS_PER_GROUP} squares gives the
    paper's (eps, delta) guarantee. The exact F2 rides along as the
    demonstration column (production drops it — it is the full
    frequency aggregation the sketch replaces).

    Determinism: signs come from det_hash64(user:counter) parity (the
    KMV/minhash hash family), counters are exact int64 sums, squares
    and group sums are int64, the mean divides by the power-of-two
    {_AMS_PER_GROUP} (exact in float64), and the median is an order
    statistic on those exact doubles with a group-id tiebreak — both
    engines pick the same row; rounding happens once at output.

    Scale shape: one grouped count to f_v (combiner'd), one explode by
    {_AMS_K} (narrow), one (key, counter) aggregate whose output is
    {_AMS_K} x |keys| rows — model-sized sketch state, mergeable across
    shards/days by ADDITION like every linear sketch (the HLL-rollup
    argument); the estimate algebra never touches corpus-sized data
    again. At 100 TB: same two shuffles as a plain count, plus
    constant-factor fan-out."""
    from pyspark.sql import Window as W

    from ..functions.vector import det_hash64

    ev = load(spark, sf_dir, "events")
    f = (ev.groupBy("event_type", "user_id")
         .agg(F.count(F.lit(1)).alias("fv")))
    j = spark.range(_AMS_K).select(F.col("id").cast("int").alias("j"))
    sgn = (f.crossJoin(F.broadcast(j))
           .withColumn(
               "s", F.when(
                   det_hash64(F.concat(F.col("user_id").cast("string"),
                                       F.lit(":"),
                                       F.col("j").cast("string"))) % 2 == 0,
                   1).otherwise(-1)))
    x = (sgn.groupBy("event_type", "j")
         .agg(F.sum(F.col("fv") * F.col("s")).alias("xj")))
    gm = (x.groupBy("event_type",
                    (F.col("j") / _AMS_PER_GROUP).cast("int").alias("g"))
          .agg((F.sum(F.col("xj") * F.col("xj")).cast("double")
                / _AMS_PER_GROUP).alias("mean2")))
    rn = F.row_number().over(
        W.partitionBy("event_type").orderBy("mean2", "g"))
    med = (gm.withColumn("rn", rn)
           .filter(F.col("rn") == _AMS_GROUPS // 2 + 1)
           .select("event_type", F.col("mean2").alias("f2_est")))
    ex = (f.groupBy("event_type")
          .agg(F.sum(F.col("fv") * F.col("fv")).alias("f2_exact")))
    return (ex.join(med, "event_type")
            .select("event_type",
                    F.col("f2_exact").cast("bigint").alias("f2_exact"),
                    F.round("f2_est", 6).alias("f2_est"),
                    F.round(F.abs(F.col("f2_est") - F.col("f2_exact"))
                            / F.col("f2_exact"), 6).alias("rel_err")))


# Bitmap-index distinct counting: 32-bit chunks (user_id >> 5 selects
# the chunk, bit user_id & 31 within it) — chunk values stay far from
# BIGINT sign overflow, and bit_count/<<, | semantics agree across
# engines on non-negative operands.
_BMP_SHIFT, _BMP_MASK = 5, 31


@query("sketch_bitmap_distinct", oracle=f"""
WITH chunks AS (
  SELECT event_type, user_id >> {_BMP_SHIFT} AS chunk,
         bit_or(CAST(1 AS BIGINT) << (user_id & {_BMP_MASK})) AS bits
  FROM events GROUP BY 1, 2)
SELECT event_type,
       CAST(sum(bit_count(bits)) AS BIGINT) AS n_distinct,
       CAST(count(*) AS BIGINT) AS n_chunks,
       round(sum(bit_count(bits)) * 1.0 / (count(*) * {_BMP_MASK + 1}),
             6) AS fill_ratio
FROM chunks GROUP BY event_type
""")
def sketch_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via BITMAP INDEXES (the roaring-bitmap
    technique ClickHouse/Druid/Pinot use for COUNT(DISTINCT user) at
    scale; Chambi et al. 2016): integer keys partition into 32-bit
    chunks (key >> {_BMP_SHIFT}), each chunk OR-accumulates a bit per
    present key, and the distinct count is the popcount sum. Unlike
    HLL (sketch_hll_distinct, ~2% error) this is EXACT, and unlike
    count(DISTINCT) the shuffle carries (group, chunk, 8-byte bitmap)
    rows — for dense key ranges that is 32 keys per 8-byte value,
    and bit_or partial-aggregates map-side, so re-aggregation across
    partitions is free union-by-OR (the same merge HLL registers get
    in sketch_hll_merge_rollup, but lossless).

    Determinism: pure integer bit algebra end-to-end — shift, OR,
    popcount — identical in any engine; fill_ratio is the one display
    division.

    Scale shape: one combiner'd groupBy on (group, chunk); state is
    bounded by key-range/32 per group, the reason bitmap indexes win
    EXACTLY when key domains are dense (sparse domains -> HLL or
    dictionary-encode first). Roaring's container switching is this
    plan with an adaptive chunk encoding."""
    ev = load(spark, sf_dir, "events")
    chunks = (ev.groupBy("event_type",
                         F.shiftright("user_id", _BMP_SHIFT)
                         .alias("chunk"))
              # the Python shiftleft() wrapper only takes a literal
              # shift amount; the SQL function accepts an expression
              .agg(F.bit_or(F.expr(
                  f"shiftleft(cast(1 as bigint), "
                  f"cast(user_id % {_BMP_MASK + 1} as int))"))
                  .alias("bits")))
    return (chunks.groupBy("event_type")
            .agg(F.sum(F.bit_count("bits")).cast("bigint")
                 .alias("n_distinct"),
                 F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
                 F.round(F.sum(F.bit_count("bits")) * 1.0
                         / (F.count(F.lit(1)) * (_BMP_MASK + 1)), 6)
                 .alias("fill_ratio")))


# DDSketch relative-error quantile sketch (Masson, Rim & Lee, VLDB
# 2019): bucket i = ceil(ln(v)/ln(gamma)) with gamma = (1+a)/(1-a)
# guarantees |est/exact - 1| <= a for every quantile. alpha = 1%.
_DD_ALPHA = 0.01
_DD_GAMMA = (1 + _DD_ALPHA) / (1 - _DD_ALPHA)
_DD_QS = (0.5, 0.95, 0.99)


@query("sketch_ddsketch_quantiles", oracle=f"""
WITH pos AS (SELECT event_type, value, event_id FROM events
             WHERE value > 0),
zn AS (SELECT event_type,
              CAST(sum(CASE WHEN value <= 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_nonpos
       FROM events GROUP BY 1),
b AS (SELECT event_type,
             CAST(ceil(ln(value) / ln({_DD_GAMMA})) AS BIGINT) AS bkt,
             CAST(count(*) AS BIGINT) AS c
      FROM pos GROUP BY 1, 2),
tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_buckets
        FROM b GROUP BY 1),
cum AS (SELECT event_type, bkt,
               sum(c) OVER (PARTITION BY event_type ORDER BY bkt) AS cc
        FROM b),
qs AS (SELECT unnest([{", ".join(str(q) for q in _DD_QS)}]) AS q),
tgt AS (SELECT t.event_type, qs.q, t.n, t.n_buckets,
               CAST(floor(qs.q * (t.n - 1)) AS BIGINT) + 1 AS target
        FROM tot t CROSS JOIN qs),
pick AS (SELECT tg.event_type, tg.q, min(c.bkt) AS bkt
         FROM tgt tg
         JOIN cum c ON c.event_type = tg.event_type
                   AND c.cc >= tg.target
         GROUP BY 1, 2),
ranked AS (SELECT event_type, value,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS rn
           FROM pos)
SELECT p.event_type, p.q, tg.n, tg.n_buckets, p.bkt,
       round(2 * pow({_DD_GAMMA}, p.bkt) / ({_DD_GAMMA} + 1), 6) AS est_v,
       r.value AS exact_v,
       zn.n_nonpos
FROM pick p
JOIN tgt tg ON tg.event_type = p.event_type AND tg.q = p.q
JOIN ranked r ON r.event_type = p.event_type AND r.rn = tg.target
JOIN zn ON zn.event_type = p.event_type
""")
def sketch_ddsketch_quantiles(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """DDSKETCH relative-error quantiles (Masson, Rim & Lee, VLDB
    2019 — the production latency-quantile sketch): values map to
    logarithmic buckets i = ceil(ln(v)/ln(gamma)) with gamma =
    (1+a)/(1-a) at a = {_DD_ALPHA}, so the bucket table IS the sketch —
    INTEGER state, trivially MERGEABLE (bucket-wise count addition:
    the property that lets per-partition sketches combine in one
    combiner'd shuffle, unlike rank-based GK/KLL whose merge is
    order-sensitive), with the guarantee |est/exact - 1| <= a at
    every quantile. Completes the sketch family's quantile gap next to
    distinct-count (HLL/KMV/bitmap), frequency (CMS), membership
    (Bloom), and moments (AMS); sketch_quantiles is the exact-compute
    twin. Emits, per (event_type, q in {_DD_QS}): the integer bucket
    index and counts (hash-exact), the decoded estimate 2*gamma^i /
    (gamma+1), and the exact same-rank value — so the error bound is
    VISIBLE in the result and test-pinned. Non-positive values cannot
    enter the log; they are counted out-of-band (n_nonpos), the
    standard DDSketch zero-bucket treatment.

    Determinism: buckets are ceil of identical doubles (bucket edges
    are powers of gamma — irrational, so 2-decimal data never sits on
    an edge); counts, targets, and the min-bucket pick are exact
    integers; est_v derives from pow on the same (gamma, int) in both
    engines; exact_v is a row_number rank pick under a total order.

    Scale shape: ONE combiner'd groupBy to (type, bucket) — ~300
    buckets per type at any data size (state is resolution-sized, not
    data-sized); the cumulative pick is a window over the bucket
    table. At 100 TB this is the canonical mergeable-sketch plan: map-
    side partial bucket counts, one tiny shuffle, driver-sized decode.
    The exact_v rank pick is the TEST apparatus, not the sketch — a
    production job ships only the bucket table. Reference scope: no
    sketch surface in the reference (SURVEY §2.5); declared
    extension."""
    from pyspark.sql import Window as W2

    ev = load(spark, sf_dir, "events")
    pos = ev.filter(F.col("value") > 0).select(
        "event_type", "value", "event_id")
    zn = ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("value") <= 0, 1).otherwise(0))
        .cast("bigint").alias("n_nonpos"))
    b = (pos.select(
            "event_type",
            F.ceil(F.log("value") / F.log(F.lit(_DD_GAMMA)))
            .cast("bigint").alias("bkt"))
         .groupBy("event_type", "bkt")
         .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    tot = b.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"))
    cum = b.select(
        "event_type", "bkt",
        F.sum("c").over(W2.partitionBy("event_type").orderBy("bkt"))
        .alias("cc"))
    qs = spark.createDataFrame([(q,) for q in _DD_QS], "q double")
    tgt = (tot.crossJoin(F.broadcast(qs))
           .select("event_type", "q", "n", "n_buckets",
                   (F.floor(F.col("q") * (F.col("n") - 1)) + 1)
                   .cast("bigint").alias("target")))
    pick = (tgt.join(cum, "event_type")
            .filter(F.col("cc") >= F.col("target"))
            .groupBy("event_type", "q")
            .agg(F.min("bkt").alias("bkt")))
    ranked = pos.select(
        "event_type", "value",
        F.row_number().over(
            W2.partitionBy("event_type").orderBy("value", "event_id"))
        .alias("rn"))
    est = F.round(2 * F.pow(F.lit(_DD_GAMMA), F.col("bkt"))
                  / (_DD_GAMMA + 1), 6)
    exact = ranked.select(F.col("event_type").alias("et"),
                          F.col("rn").alias("xrn"),
                          F.col("value").alias("exact_v"))
    return (pick
            .join(tgt, ["event_type", "q"])
            .join(exact, (F.col("et") == F.col("event_type"))
                  & (F.col("xrn") == F.col("target")))
            .join(zn.withColumnRenamed("event_type", "et2"),
                  F.col("et2") == F.col("event_type"))
            .select("event_type", "q", "n", "n_buckets", "bkt",
                    est.alias("est_v"), "exact_v", "n_nonpos"))
