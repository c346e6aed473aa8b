"""Data-quality validation — expectations-style checks as ONE pass.

A training-data pipeline gates every ingest batch on validation
(null rates, domain ranges, referential orphans, duplicate keys) before
anything downstream sees it. The engine form: all row-local checks
compile into a SINGLE conditional-aggregate scan (one job, no
per-check passes), cross-table checks (orphans, duplicate keys) each
add exactly one keyed operation, and the report unpivots into one row
per check so the gate is a trivial `violations == 0` filter.

At 100 TB: the scan-side checks are free riders on one full scan
(predicates never leave whole-stage codegen); the orphan check is an
anti-join on the key it would shuffle for anyway; the duplicate check is
a keyed count. Nothing collects to the driver but the per-check summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..tables import load

_DQ_ORACLE = """
WITH scan AS (
  SELECT
    count(*) AS n_rows,
    sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS null_quantity,
    sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
      AS range_quantity,
    sum(CASE WHEN l_discount < 0 OR l_discount > 0.08 THEN 1 ELSE 0 END)
      AS range_discount,
    sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
      AS nonpositive_price,
    sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END)
      AS domain_returnflag,
    sum(CASE WHEN l_shipdate < TIMESTAMP '1995-01-01' THEN 1 ELSE 0 END)
      AS stale_shipdate
  FROM lineitem
),
orphans AS (
  SELECT count(*) AS n FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_orderkey = l.l_orderkey)
),
dupkeys AS (
  SELECT count(*) AS n FROM (
    SELECT l_orderkey, l_linenumber FROM lineitem
    GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1
  )
)
SELECT ck.check_name,
       ck.violations::BIGINT AS violations,
       s.n_rows,
       round(ck.violations / s.n_rows, 9) AS violation_rate
FROM scan s CROSS JOIN (
  SELECT 'null_quantity' AS check_name, null_quantity AS violations FROM scan
  UNION ALL SELECT 'range_quantity', range_quantity FROM scan
  UNION ALL SELECT 'range_discount', range_discount FROM scan
  UNION ALL SELECT 'nonpositive_price', nonpositive_price FROM scan
  UNION ALL SELECT 'domain_returnflag', domain_returnflag FROM scan
  UNION ALL SELECT 'stale_shipdate', stale_shipdate FROM scan
  UNION ALL SELECT 'orphan_orderkey', n FROM orphans
  UNION ALL SELECT 'dup_line_key', n FROM dupkeys
) ck
"""


@query("dq_validation_summary", oracle=_DQ_ORACLE)
def dq_validation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eight expectations over lineitem in TWO aggregates: six row-local
    checks AND the orphan check fused into one conditional-aggregate scan
    (the referential probe is a cardinality-preserving left join against
    the unique orders key), plus one keyed duplicate-key check —
    unpivoted to a (check_name, violations, n_rows, violation_rate)
    report. The range_discount bound (0.08) deliberately trips on real
    rows so the report demonstrably counts, not just zeroes."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")

    # Orphan detection rides the same scan as the row-local checks: a
    # LEFT join against the (unique-key) orders side preserves lineitem
    # cardinality, so ONE aggregate yields n_rows, all six local checks,
    # and the orphan count — no second pass, no joining of 1-row
    # summaries (whose constant-key equi-joins would fold to BNLJ).
    li = li.join(F.broadcast(orders.select("o_orderkey")),
                 li.l_orderkey == F.col("o_orderkey"), "left")

    scan = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0))
        .alias("null_quantity"),
        F.sum(F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
              .otherwise(0)).alias("range_quantity"),
        F.sum(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.08),
                     1).otherwise(0)).alias("range_discount"),
        F.sum(F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0))
        .alias("nonpositive_price"),
        F.sum(F.when(~F.col("l_returnflag").isin("A", "N", "R"), 1)
              .otherwise(0)).alias("domain_returnflag"),
        F.sum(F.when(F.col("l_shipdate")
                     < F.lit("1995-01-01").cast("timestamp_ntz"), 1)
              .otherwise(0)).alias("stale_shipdate"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .alias("orphan_orderkey"),
    )
    # duplicate-key check: keyed count, then summarize — carries its own
    # n_rows (= sum of group counts) so it needs no join back to the scan
    dup_n = (li.groupBy("l_orderkey", "l_linenumber")
             .agg(F.count(F.lit(1)).alias("c"))
             .agg(F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
                  .cast("bigint").alias("violations"),
                  F.sum("c").alias("n_rows"))
             .withColumn("check_name", F.lit("dup_line_key"))
             .select("check_name", "violations", "n_rows"))

    checks = ["null_quantity", "range_quantity", "range_discount",
              "nonpositive_price", "domain_returnflag", "stale_shipdate",
              "orphan_orderkey"]
    unpivoted = scan.selectExpr(
        "n_rows",
        "stack({}, {}) AS (check_name, violations)".format(
            len(checks),
            ", ".join(f"'{c}', {c}" for c in checks)),
    ).select("check_name", "violations", "n_rows")

    return (unpivoted.unionByName(dup_n)
            .withColumn("violation_rate",
                        F.round(F.col("violations") / F.col("n_rows"), 9)))


_DRIFT_CUT = "1999-01-01"


@query("dq_profile_drift", oracle=f"""
WITH prof AS (
  SELECT CASE WHEN o_orderdate < DATE '{_DRIFT_CUT}'
              THEN 'baseline' ELSE 'current' END AS snapshot,
         count(*) AS n_rows,
         count(DISTINCT o_custkey) AS n_customers,
         avg(o_totalprice) AS mean_price,
         sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
           * 1.0 / count(*) AS null_rate_priority,
         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
           * 1.0 / count(*) AS frac_status_f
  FROM orders GROUP BY 1
),
b AS (SELECT * FROM prof WHERE snapshot = 'baseline'),
c AS (SELECT * FROM prof WHERE snapshot = 'current')
SELECT m.metric,
       round(m.base, 6) AS baseline,
       round(m.cur, 6) AS current,
       round(CASE WHEN m.base <> 0
                  THEN (m.cur - m.base) / m.base END, 6) AS rel_drift,
       CAST(CASE WHEN m.base <> 0
                 AND abs((m.cur - m.base) / m.base) > 0.10
            THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM (
  SELECT 'n_rows' AS metric, b.n_rows * 1.0 AS base, c.n_rows * 1.0
    AS cur FROM b, c
  UNION ALL
  SELECT 'n_customers', b.n_customers * 1.0, c.n_customers * 1.0
    FROM b, c
  UNION ALL
  SELECT 'mean_price', b.mean_price, c.mean_price FROM b, c
  UNION ALL
  SELECT 'null_rate_priority', b.null_rate_priority,
         c.null_rate_priority FROM b, c
  UNION ALL
  SELECT 'frac_status_f', b.frac_status_f, c.frac_status_f FROM b, c
) m
""")
def dq_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-profile drift detection — the monitoring half of data
    quality (dq_validation_summary is the gating half): profile the
    same table's baseline and current slices (row count, entity count,
    mean, null rate, categorical mix), compute relative drift per
    metric, and flag anything moving more than 10%. This is what pages
    an on-call before a silently-shrunken upstream feed poisons a
    training run.

    One grouped scan computes BOTH profiles (a single pass splitting on
    the snapshot predicate — not two scans), then the metric comparison
    unpivots profile-sized state: the whole diff stage operates on 2
    rows regardless of table size. At 100 TB the only corpus-wide work
    is the one partial-aggregated scan."""
    orders = load(spark, sf_dir, "orders")
    snap = F.when(F.col("o_orderdate") < F.lit(_DRIFT_CUT).cast("date"),
                  "baseline").otherwise("current")
    prof = (orders.groupBy(snap.alias("snapshot"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.countDistinct("o_custkey").alias("n_customers"),
                 F.avg("o_totalprice").alias("mean_price"),
                 (F.sum(F.when(F.col("o_orderpriority").isNull(), 1)
                        .otherwise(0)) / F.count(F.lit(1)))
                 .alias("null_rate_priority"),
                 (F.sum(F.when(F.col("o_orderstatus") == "F", 1)
                        .otherwise(0)) / F.count(F.lit(1)))
                 .alias("frac_status_f")))
    metrics = ["n_rows", "n_customers", "mean_price",
               "null_rate_priority", "frac_status_f"]
    long = prof.selectExpr(
        "snapshot",
        "stack({}, {}) AS (metric, val)".format(
            len(metrics),
            ", ".join(f"'{m}', CAST({m} AS DOUBLE)" for m in metrics)))
    b = (long.filter(F.col("snapshot") == "baseline")
         .select("metric", F.col("val").alias("base")))
    c = (long.filter(F.col("snapshot") == "current")
         .select("metric", F.col("val").alias("cur")))
    rel = F.when(F.col("base") != 0,
                 (F.col("cur") - F.col("base")) / F.col("base"))
    return (b.join(c, "metric")
            .select("metric",
                    F.round("base", 6).alias("baseline"),
                    F.round("cur", 6).alias("current"),
                    F.round(rel, 6).alias("rel_drift"),
                    F.when(rel.isNotNull() & (F.abs(rel) > 0.10), 1)
                    .otherwise(0).cast("bigint").alias("flagged")))


# k-anonymity threshold and the quasi-identifier size-bucket width.
K_ANON, QI_BUCKET = 5, 32


@query("dq_k_anonymity", oracle=f"""
WITH g AS (SELECT lang, source, n_chars // {QI_BUCKET} AS size_bucket,
                  count(*) AS n
           FROM documents GROUP BY 1, 2, 3)
SELECT lang, source, CAST(size_bucket AS BIGINT) AS size_bucket,
       CAST(n AS BIGINT) AS group_size,
       n < {K_ANON} AS violates_k
FROM g
""")
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY audit (privacy/governance gate): group the corpus by
    its quasi-identifier tuple (lang, source, bucketed length) and flag
    every equivalence class smaller than k=5 — the classes a release
    pipeline must suppress or generalize before the data leaves the
    boundary, and the census-style re-identification check that
    precedes any sharing of 'anonymized' corpora. Composes with
    text_pii_redact (direct identifiers) the way real governance
    stacks layer the two.

    One combiner'd grouped count over the QI tuple — identical scale
    shape to dedup_exact's survivor aggregate; generalization ladders
    (widen the bucket, drop a QI) only change the group key."""
    docs = load(spark, sf_dir, "documents")
    g = (docs.groupBy(
            "lang", "source",
            F.floor(F.col("n_chars") / QI_BUCKET).cast("bigint")
             .alias("size_bucket"))
         .agg(F.count(F.lit(1)).cast("bigint").alias("group_size")))
    return g.select("lang", "source", "size_bucket", "group_size",
                    (F.col("group_size") < K_ANON).alias("violates_k"))


@query("dq_benford_test", oracle="""
WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS digit
           FROM orders WHERE o_totalprice >= 1),
c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
t AS (SELECT sum(n) AS tot FROM c)
SELECT c.digit, CAST(c.n AS BIGINT) AS n,
       round(c.n * 1.0 / t.tot, 6) AS observed,
       round(log10(1 + 1.0 / c.digit), 6) AS expected,
       round((c.n - t.tot * log10(1 + 1.0 / c.digit))
             * (c.n - t.tot * log10(1 + 1.0 / c.digit))
             / (t.tot * log10(1 + 1.0 / c.digit)), 6) AS chi2_term
FROM c CROSS JOIN t
""")
def dq_benford_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD'S-LAW first-digit audit (the forensic data-quality
    check): leading digits of order values against the log10(1 + 1/d)
    law, with per-digit chi-square contributions — fabricated or
    truncated financial columns announce themselves here before any
    model consumes them. (Synthetic uniform-ish prices WON'T follow
    Benford; the large chi2 terms are the demonstration, not a bug.)
    First digits extract via INTEGER-part string formatting — never
    floor(log10(x)), whose value at exact powers of ten is one ulp
    below the integer in some libms and flips the digit
    engine-dependently. One grouped count + a 9-row broadcast; the
    1-row total is a scalar the same way."""
    o = load(spark, sf_dir, "orders")
    d = (o.filter(F.col("o_totalprice") >= 1)
         .select(F.substring(F.floor("o_totalprice").cast("bigint")
                             .cast("string"), 1, 1).cast("int")
                 .alias("digit")))
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("tot"))
    e = F.log10(1 + 1.0 / F.col("digit"))
    dev = F.col("n") - F.col("tot") * e
    return (c.crossJoin(F.broadcast(t))
            .select("digit", F.col("n").cast("bigint").alias("n"),
                    F.round(F.col("n") * 1.0 / F.col("tot"), 6)
                    .alias("observed"),
                    F.round(e, 6).alias("expected"),
                    F.round(dev * dev / (F.col("tot") * e), 6)
                    .alias("chi2_term")))


# PSI price-bin width / cap, and the snapshot split reused from
# dq_profile_drift. Conventional PSI alert bands: <0.1 stable,
# 0.1-0.25 moderate, >0.25 action.
_PSI_BIN_W, _PSI_BIN_CAP = 25000, 9


@query("dq_psi_distribution_drift", oracle=f"""
WITH base AS (
  SELECT CASE WHEN o_orderdate < DATE '{_DRIFT_CUT}'
              THEN 'baseline' ELSE 'current' END AS snapshot,
         stacked.dim, stacked.bin
  FROM orders CROSS JOIN LATERAL (
    SELECT 'price_bin' AS dim,
           CAST(least(CAST(floor(o_totalprice / {_PSI_BIN_W}) AS BIGINT),
                      {_PSI_BIN_CAP}) AS VARCHAR) AS bin
    UNION ALL SELECT 'priority', o_orderpriority
  ) stacked
),
c AS (SELECT dim, bin, snapshot, count(*) AS n
      FROM base GROUP BY 1, 2, 3),
bins AS (SELECT dim, bin,
                coalesce(sum(CASE WHEN snapshot = 'baseline' THEN n END), 0)
                  AS n_base,
                coalesce(sum(CASE WHEN snapshot = 'current' THEN n END), 0)
                  AS n_cur
         FROM c GROUP BY 1, 2),
tot AS (SELECT dim, sum(n_base) AS t_base, sum(n_cur) AS t_cur,
               count(*) AS n_bins
        FROM bins GROUP BY 1),
terms AS (
  SELECT b.dim, b.bin, b.n_base, b.n_cur,
         (b.n_base + 1.0) / (t.t_base + t.n_bins) AS p_base,
         (b.n_cur + 1.0) / (t.t_cur + t.n_bins) AS p_cur
  FROM bins b JOIN tot t USING (dim))
SELECT dim, bin, CAST(n_base AS BIGINT) AS n_base,
       CAST(n_cur AS BIGINT) AS n_cur,
       round(p_base, 6) AS p_base, round(p_cur, 6) AS p_cur,
       round((p_cur - p_base) * ln(p_cur / p_base), 6) AS psi_term
FROM terms
""")
def dq_psi_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POPULATION STABILITY INDEX drift audit — the industry-standard
    DISTRIBUTION drift metric (dq_profile_drift watches scalar metrics;
    PSI watches the whole shape): bin the monitored column per snapshot,
    Laplace-smooth the bin shares so empty bins stay finite, and emit
    the per-bin PSI contribution (p_cur - p_base) * ln(p_cur / p_base).
    Total PSI per dimension is the sum of its terms (the report keeps
    terms so the alert can say WHICH bins moved); >0.25 is the
    conventional act-now band. Two dimensions in one pass: fixed-width
    capped price bins (numeric) and order priority (categorical).

    One scan fans each row into its two (dim, bin) features via an
    inline 2-row lateral (Spark: explode over a 2-element struct
    array — no second scan), then a combiner'd grouped count; bin and
    total tables are dims x bins sized (~15 rows), so everything after
    the count is driver-trivial broadcast work. Smoothing uses
    (n + 1) / (N + n_bins) with n_bins the OBSERVED bin count per
    dimension — derived identically in both engines, never a config."""
    orders = load(spark, sf_dir, "orders")
    snap = F.when(F.col("o_orderdate") < F.lit(_DRIFT_CUT).cast("date"),
                  "baseline").otherwise("current")
    # floor(x / W), never CAST(x AS BIGINT): DuckDB's double->int CAST
    # ROUNDS while Spark's truncates, and an order priced at a bin
    # boundary flips bins between engines (caught by the sf0.1 sweep).
    price_bin = F.least(
        F.floor(F.col("o_totalprice") / F.lit(_PSI_BIN_W)).cast("bigint"),
        F.lit(_PSI_BIN_CAP)).cast("string")
    feats = (orders
             .select(snap.alias("snapshot"), F.explode(F.array(
                 F.struct(F.lit("price_bin").alias("dim"),
                          price_bin.alias("bin")),
                 F.struct(F.lit("priority").alias("dim"),
                          F.col("o_orderpriority").alias("bin"))))
                 .alias("f"))
             .select("snapshot", "f.dim", "f.bin"))
    c = feats.groupBy("dim", "bin", "snapshot").agg(
        F.count(F.lit(1)).alias("n"))
    bins = (c.groupBy("dim", "bin")
            .agg(F.coalesce(F.sum(F.when(F.col("snapshot") == "baseline",
                                         F.col("n"))), F.lit(0))
                 .alias("n_base"),
                 F.coalesce(F.sum(F.when(F.col("snapshot") == "current",
                                         F.col("n"))), F.lit(0))
                 .alias("n_cur")))
    tot = (bins.groupBy("dim")
           .agg(F.sum("n_base").alias("t_base"),
                F.sum("n_cur").alias("t_cur"),
                F.count(F.lit(1)).alias("n_bins")))
    p_base = (F.col("n_base") + 1.0) / (F.col("t_base") + F.col("n_bins"))
    p_cur = (F.col("n_cur") + 1.0) / (F.col("t_cur") + F.col("n_bins"))
    return (bins.join(F.broadcast(tot), "dim")
            .select("dim", "bin",
                    F.col("n_base").cast("bigint").alias("n_base"),
                    F.col("n_cur").cast("bigint").alias("n_cur"),
                    F.round(p_base, 6).alias("p_base"),
                    F.round(p_cur, 6).alias("p_cur"),
                    F.round((p_cur - p_base) * F.log(p_cur / p_base), 6)
                    .alias("psi_term")))


# KS bucket width: fixed price ranges so the prefix-sum stage is
# bucket-count sized (~14 buckets at any SF), never a global window.
_KS_BUCKET_W = 25000


@query("dq_ks_two_sample", oracle="""
WITH s AS (SELECT o_totalprice AS v, o_orderstatus AS g FROM orders
           WHERE o_orderstatus IN ('F', 'O')),
n AS (SELECT sum(CASE WHEN g = 'F' THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN g = 'O' THEN 1 ELSE 0 END) AS n2 FROM s),
d AS (SELECT v, sum(CASE WHEN g = 'F' THEN 1 ELSE 0 END) AS c1,
             sum(CASE WHEN g = 'O' THEN 1 ELSE 0 END) AS c2
      FROM s GROUP BY v),
cum AS (SELECT v,
               sum(c1) OVER (ORDER BY v) AS f1,
               sum(c2) OVER (ORDER BY v) AS f2
        FROM d),
dd AS (SELECT v, abs(f1 * (SELECT n2 FROM n) - f2 * (SELECT n1 FROM n))
                 AS d_num
       FROM cum),
mx AS (SELECT max(d_num) AS best FROM dd)
SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
       CAST(mx.best AS BIGINT) AS d_numerator,
       round(mx.best * 1.0 / (n.n1 * n.n2), 9) AS d_stat,
       round(mx.best * 1.0 / (n.n1 * n.n2)
             * sqrt(n.n1 * n.n2 * 1.0 / (n.n1 + n.n2)), 6) AS ks_scaled,
       (SELECT min(v) FROM dd WHERE d_num = mx.best) AS at_value
FROM n CROSS JOIN mx
""")
def dq_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KOLMOGOROV-SMIRNOV statistic — the
    nonparametric distribution-equality test between two slices
    (finished vs open orders' value distributions here; in a corpus
    pipeline, feature distributions between training snapshots). The
    supremum |F1(x) - F2(x)| is computed in INTEGER arithmetic:
    D's numerator max|cum1 * N2 - cum2 * N1| is exact, and the only
    divisions happen on the final 1-row report (d_stat, and the
    sqrt(n1 n2/(n1+n2))-scaled form the critical tables use).

    Scale shape: the oracle's global cumulative window is replaced by a
    TWO-PHASE prefix sum (the corpus_shard_assign precedent) — phase 1
    cumulates within fixed price-range buckets (windows partitioned by
    bucket, all parallel), phase 2 adds each bucket's offset computed
    from the ~14-row bucket-total table (window over bucket totals
    only, then broadcast back). No task ever sorts more than one
    bucket's distinct values; the final max is a plain aggregate."""
    o = (load(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus").isin("F", "O"))
         .select(F.col("o_totalprice").alias("v"),
                 F.col("o_orderstatus").alias("g")))
    n = o.agg(F.sum(F.when(F.col("g") == "F", 1).otherwise(0)).alias("n1"),
              F.sum(F.when(F.col("g") == "O", 1).otherwise(0)).alias("n2"))
    d = (o.groupBy("v")
         .agg(F.sum(F.when(F.col("g") == "F", 1).otherwise(0)).alias("c1"),
              F.sum(F.when(F.col("g") == "O", 1).otherwise(0)).alias("c2"))
         .withColumn("bkt", F.floor(F.col("v") / _KS_BUCKET_W)))
    from pyspark.sql import Window as W
    in_bkt = W.partitionBy("bkt").orderBy("v")
    local = d.select(
        "bkt", "v",
        F.sum("c1").over(in_bkt).alias("l1"),
        F.sum("c2").over(in_bkt).alias("l2"),
        F.col("c1"), F.col("c2"))
    btot = (d.groupBy("bkt")
            .agg(F.sum("c1").alias("b1"), F.sum("c2").alias("b2")))
    off_w = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    offs = btot.select(
        "bkt",
        F.coalesce(F.sum("b1").over(off_w), F.lit(0)).alias("o1"),
        F.coalesce(F.sum("b2").over(off_w), F.lit(0)).alias("o2"))
    cum = (local.join(F.broadcast(offs), "bkt")
           .select("v", (F.col("l1") + F.col("o1")).alias("f1"),
                   (F.col("l2") + F.col("o2")).alias("f2")))
    dd = cum.crossJoin(F.broadcast(n)).select(
        "v", F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))
        .alias("d_num"))
    mx = dd.agg(F.max("d_num").alias("best"))
    at_v = (dd.join(F.broadcast(mx), F.col("d_num") == F.col("best"))
            .agg(F.min("v").alias("at_value")))
    return (n.crossJoin(F.broadcast(mx)).crossJoin(F.broadcast(at_v))
            .select(F.col("n1").cast("bigint").alias("n1"),
                    F.col("n2").cast("bigint").alias("n2"),
                    F.col("best").cast("bigint").alias("d_numerator"),
                    F.round(F.col("best") * 1.0 / (F.col("n1") * F.col("n2")),
                            9).alias("d_stat"),
                    F.round(F.col("best") * 1.0 / (F.col("n1") * F.col("n2"))
                            * F.sqrt(F.col("n1") * F.col("n2") * 1.0
                                     / (F.col("n1") + F.col("n2"))), 6)
                    .alias("ks_scaled"),
                    "at_value"))


@query("dq_observe_inflight_metrics", oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_null_price,
       CAST(min(o_orderkey) AS BIGINT) AS min_key,
       CAST(max(o_orderkey) AS BIGINT) AS max_key
FROM orders
""", eager=True)
def dq_observe_inflight_metrics(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """IN-FLIGHT data-quality metrics via Spark's Observation API
    (df.observe): the row count, integer-cents money total, null
    count, and key range are collected AS A SIDE CHANNEL of the same
    single pass that processes the data — the Delta-Live-Tables
    "expectations" pattern, and the only way to audit a 100 TB pipeline
    run without paying a second full scan for the audit. The observed
    metrics are accumulator-backed (exactly-once per row for
    deterministic actions), so they are the numbers the RUN actually
    saw, not a later re-read that a concurrent writer could skew.

    The pass itself is a noop-sink write (the pipeline stand-in); the
    returned one-row frame is the observation, and the DuckDB oracle
    recomputes the same five aggregates from the source — money sums in
    exact integer cents (round(x*100) per row, bigint addition: the
    fixed-width source's float-ulp lesson). Scale: ONE scan, metrics
    combine map-side in the accumulator tree, zero extra shuffles."""
    from pyspark.sql import Observation

    orders = load(spark, sf_dir, "orders")
    obs = Observation("dq_inflight")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .alias("sum_cents"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0))
        .alias("n_null_price"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"))
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get

    # On an EMPTY source, sum/min/max observe NULL (and the SQL oracle
    # returns NULL for the same aggregates) — preserve the NULL instead of
    # crashing in int(None) or coercing to a 0 the oracle wouldn't emit.
    def _opt_int(v):
        return None if v is None else int(v)

    return spark.createDataFrame(
        [(int(m["n_rows"]), _opt_int(m["sum_cents"]),
          _opt_int(m["n_null_price"]), _opt_int(m["min_key"]),
          _opt_int(m["max_key"]))],
        "n_rows bigint, sum_cents bigint, n_null_price bigint, "
        "min_key bigint, max_key bigint")


# l-diversity threshold and its (coarser-than-k-anonymity) QI bucket:
# wider classes make the sensitive-value distribution the interesting
# part, which is exactly what l-diversity audits.
L_DIV, LDIV_BUCKET = 3, 64


@query("dq_l_diversity", oracle=f"""
WITH cnt AS (
  SELECT source, n_chars // {LDIV_BUCKET} AS size_bucket, lang,
         count(*) AS n
  FROM documents GROUP BY 1, 2, 3),
w AS (
  SELECT source, size_bucket, lang, n,
         sum(n) OVER (PARTITION BY source, size_bucket) AS gs,
         count(*) OVER (PARTITION BY source, size_bucket) AS n_langs
  FROM cnt)
SELECT source, CAST(size_bucket AS BIGINT) AS size_bucket,
       CAST(gs AS BIGINT) AS group_size,
       CAST(n_langs AS BIGINT) AS n_langs,
       round(-sum((n * 1.0 / gs) * log2(n * 1.0 / gs)), 6) + 0.0
         AS entropy_l,
       n_langs < {L_DIV} AS violates_l
FROM w GROUP BY source, size_bucket, gs, n_langs
""")
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-DIVERSITY audit (Machanavajjhala et al. 2007) — the privacy
    gate k-anonymity misses: a class can satisfy k and still leak the
    sensitive attribute when every member SHARES it (the homogeneity
    attack). Group the corpus by its quasi-identifier tuple
    (source, coarse length bucket), treat `lang` as the sensitive
    attribute, and report per-class distinct-l (how many sensitive
    values appear) plus Shannon entropy of the sensitive distribution
    (the entropy-l-diversity refinement); classes with fewer than l=3
    distinct values are flagged for suppression/generalization.
    Composes with dq_k_anonymity (class SIZE) the way the paper layers
    the two definitions.

    The violation FLAG is an integer distinct-count test — never the
    float entropy (a p=1/3-uniform class lands exactly on the log2(l)
    boundary, where cross-engine ulp would flip it); entropy is
    reported as a metric only, on the text_word_entropy precedent.

    Zero-sign canonicalization: single-language classes have entropy
    `-sum(1*log2(1))` — DuckDB's negation of the 0.0 sum yields −0.0
    while Spark yields +0.0; numerically equal, different bit
    patterns, so a bit-sensitive value hash diverges (driver r08 red).
    Both sides add `+ 0.0` after the rounded entropy (IEEE 754:
    −0.0 + 0.0 = +0.0) so the reported metric is sign-canonical.

    Scale shape: one combiner'd count over (QI, sensitive) — sensitive-
    cardinality × class-count rows, corpus-independent state — then a
    window + re-aggregate on the CLASS key only. At 100 TB the only
    corpus-wide work is the first grouped count; the entropy stage
    runs on model-sized state."""
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    cnt = (docs.groupBy(
               "source",
               F.floor(F.col("n_chars") / LDIV_BUCKET).cast("bigint")
                .alias("size_bucket"),
               "lang")
           .agg(F.count(F.lit(1)).alias("n")))
    w = W.partitionBy("source", "size_bucket")
    e = (cnt.withColumn("gs", F.sum("n").over(w))
         .withColumn("n_langs", F.count(F.lit(1)).over(w)))
    p = F.col("n") * 1.0 / F.col("gs")
    return (e.groupBy("source", "size_bucket",
                      F.col("gs").cast("bigint").alias("group_size"),
                      F.col("n_langs").cast("bigint").alias("n_langs"))
            .agg((F.round(-F.sum(p * F.log2(p)), 6) + F.lit(0.0))
                 .alias("entropy_l"))
            .select("source", "size_bucket", "group_size", "n_langs",
                    "entropy_l",
                    (F.col("n_langs") < L_DIV).alias("violates_l")))


# t-closeness threshold as an exact rational (T_NUM/T_DEN = 0.4): the
# violation test multiplies through to integers, so no float distance
# ever feeds the flag. Same QI bucketing as l-diversity (the paper's
# own layering: k bounds class SIZE, l bounds sensitive VARIETY, t
# bounds sensitive SKEW vs the global distribution).
TCLOSE_NUM, TCLOSE_DEN = 2, 5


@query("dq_t_closeness", eager=True, oracle=f"""
WITH cnt AS (
  SELECT source, n_chars // {LDIV_BUCKET} AS size_bucket, lang,
         count(*) AS n
  FROM documents GROUP BY 1, 2, 3),
tot AS (SELECT sum(n) AS nn FROM cnt),
gl AS (SELECT lang, CAST(round(sum(n) * 1000000.0 / tot.nn) AS BIGINT)
              AS pg_micro
       FROM cnt CROSS JOIN tot GROUP BY lang, tot.nn),
gs AS (SELECT source, size_bucket, sum(n) AS gs
       FROM cnt GROUP BY source, size_bucket),
dev AS (
  SELECT g.source, g.size_bucket, g.gs,
         sum(abs(CAST(round(COALESCE(c.n, 0) * 1000000.0 / g.gs) AS BIGINT)
                 - gl.pg_micro)) AS tvd2_micro
  FROM gs g
  JOIN gl ON 1 = 1
  LEFT JOIN cnt c ON c.source = g.source
                 AND c.size_bucket = g.size_bucket
                 AND c.lang = gl.lang
  GROUP BY g.source, g.size_bucket, g.gs)
SELECT source, CAST(size_bucket AS BIGINT) AS size_bucket,
       CAST(gs AS BIGINT) AS group_size,
       CAST(tvd2_micro AS BIGINT) AS tvd2_micro,
       CAST(round(tvd2_micro / 2.0) AS BIGINT) / 1000000.0 AS tvd,
       tvd2_micro * {TCLOSE_DEN} > {TCLOSE_NUM} * 2 * 1000000 AS violates_t
FROM dev
""")
def dq_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-CLOSENESS audit (Li, Li & Venkatasubramanian 2007) — the third
    rung of the privacy-audit ladder after dq_k_anonymity (class size)
    and dq_l_diversity (sensitive variety): a class can be large AND
    diverse yet still leak if its sensitive-value DISTRIBUTION deviates
    from the global one (the skewness attack — a class that is 90% one
    lang in a 20%-prevalence corpus reveals plenty). Per QI class
    (source, coarse length bucket) this computes the variational
    distance between the class's `lang` distribution and the corpus
    distribution — for categorical attributes with unit ground
    distance, the Earth Mover's Distance the paper specifies IS the
    total variation distance — and flags classes with TVD > t = 0.4.

    Integer discipline, overflow-proof: both distributions snap to
    integer MICRO-probabilities (round(n*1e6/denominator) — identical
    double division over <2^53 integers in both engines), so the TVD
    numerator sum_v |p_c - p_g| is bounded by 2e6 regardless of corpus
    size — a common-denominator form (|n_cv*N - n_v*gs|) would
    overflow int64 near N ~ 3e9 rows, well inside the 100 TB posture.
    The violation flag cross-multiplies the rational threshold on
    those micro-ints, never a float; quantization moves the effective
    threshold by at most |langs|*5e-7, documented here. The float tvd
    column is metric-only, and it divides an INTEGER half-micro count
    by 1e6 rather than rounding tvd2_micro/2e6 to 6 digits: any ODD
    tvd2_micro makes that quotient an exact 7-digit half-boundary
    (odd*5e-7), where Spark's decimal HALF_UP and DuckDB's
    binary-double rounding disagree by 1e-6 (three sf0.1 classes hit
    it in the round-9 off-nominal sweep). tvd2_micro/2.0 is an exact
    dyadic half-integer in both engines, its .5 cases round away from
    zero identically, and the final division of equal int64s is one
    identical IEEE op.

    Scale shape: one combiner'd count over (QI, sensitive) — class x
    sensitive-cardinality model-sized state — then a broadcast of the
    |langs|-row global table against it and a class-keyed re-aggregate.
    At 100 TB the corpus is touched once; the audit algebra runs on
    model-sized state (the l-diversity plan plus one tiny broadcast)."""
    docs = load(spark, sf_dir, "documents")
    cnt = (docs.groupBy(
               "source",
               F.floor(F.col("n_chars") / LDIV_BUCKET).cast("bigint")
                .alias("size_bucket"),
               "lang")
           .agg(F.count(F.lit(1)).alias("n")))
    cnt = cnt.localCheckpoint()
    tot = cnt.agg(F.sum("n").alias("nn"))
    gl = (cnt.groupBy("lang").agg(F.sum("n").alias("gn"))
          .crossJoin(F.broadcast(tot))
          .select("lang",
                  F.round(F.col("gn") * 1000000.0 / F.col("nn"), 0)
                  .cast("bigint").alias("pg_micro")))
    gs = (cnt.groupBy("source", "size_bucket")
          .agg(F.sum("n").alias("gs")))
    # every (class x global-lang) cell, absent cells at n=0
    cells = (gs.crossJoin(F.broadcast(gl))
             .join(cnt, ["source", "size_bucket", "lang"], "left")
             .withColumn("n", F.coalesce("n", F.lit(0))))
    pc_micro = F.round(F.col("n") * 1000000.0 / F.col("gs"), 0) \
        .cast("bigint")
    dev = (cells.groupBy("source", "size_bucket", "gs")
           .agg(F.sum(F.abs(pc_micro - F.col("pg_micro")))
                .alias("tvd2_micro")))
    return dev.select(
        "source", F.col("size_bucket").cast("bigint").alias("size_bucket"),
        F.col("gs").cast("bigint").alias("group_size"),
        F.col("tvd2_micro").cast("bigint").alias("tvd2_micro"),
        (F.round(F.col("tvd2_micro") / 2.0, 0).cast("bigint")
         / 1000000.0).alias("tvd"),
        (F.col("tvd2_micro") * TCLOSE_DEN
         > TCLOSE_NUM * 2 * 1000000).alias("violates_t"))


# Functional-dependency probe list: (table, determinant, dependent).
# Chosen so both outcomes appear on real data (key FDs hold, attribute
# FDs fail with measurable violation counts).
_FD_PROBES = [
    ("nation", "n_nationkey", "n_name"),
    ("nation", "n_name", "n_nationkey"),
    ("customer", "c_custkey", "c_nationkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
]


@query("dq_fd_discovery", oracle=" UNION ALL ".join(f"""
SELECT '{t}' AS tbl, '{a}' AS determinant, '{b}' AS dependent,
       CAST(count(DISTINCT {a}) AS BIGINT) AS n_lhs,
       CAST(count(*) AS BIGINT) AS n_pairs,
       count(*) = count(DISTINCT {a}) AS holds,
       CAST(count(*) - count(DISTINCT {a}) AS BIGINT) AS n_violating_combos
FROM (SELECT DISTINCT {a}, {b} FROM {t})""" for t, a, b in _FD_PROBES))
def dq_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUNCTIONAL-DEPENDENCY discovery/validation (the Metanome /
    HoloClean profiling primitive; Papenbrock et al. 2015 survey the
    FD-discovery family this is the verification core of): A -> B
    holds iff the distinct (A, B) combination count equals the
    distinct A count — each determinant value maps to exactly one
    dependent value. Probes a fixed schema-driven candidate list (key
    FDs that must hold; attribute FDs that demonstrably fail) and
    reports the violation magnitude (extra combinations per
    determinant) — the number a repair system (HoloClean-style) uses
    to rank which FDs are real rules with noise vs not rules at all.
    The audit any warehouse runs before trusting a "natural key".

    Determinism: pure integer distinct counts and equality — no float
    anywhere. Column pairs are compile-time literals in both engines
    (generated from the same _FD_PROBES list — the unrolled-oracle
    convention).

    Scale shape: one DISTINCT (A, B) shuffle per probe — each keyed,
    combiner'd, and independent (they run as parallel stages); the
    per-probe state after the distinct is pair-cardinality-sized.
    Production FD discovery over p columns prunes the O(2^p) lattice
    but its leaf test is EXACTLY this query; at 100 TB each probe is
    one distinct at most as wide as the table's own key shuffle."""
    outs = []
    for t, a, b in _FD_PROBES:
        d = load(spark, sf_dir, t).select(a, b).distinct()
        outs.append(d.agg(
            F.countDistinct(a).alias("n_lhs"),
            F.count(F.lit(1)).alias("n_pairs"))
            .select(F.lit(t).alias("tbl"),
                    F.lit(a).alias("determinant"),
                    F.lit(b).alias("dependent"),
                    F.col("n_lhs").cast("bigint").alias("n_lhs"),
                    F.col("n_pairs").cast("bigint").alias("n_pairs"),
                    (F.col("n_pairs") == F.col("n_lhs")).alias("holds"),
                    (F.col("n_pairs") - F.col("n_lhs")).cast("bigint")
                    .alias("n_violating_combos")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@query("dq_mutual_information", oracle="""
WITH cells AS (
  SELECT c_mktsegment AS seg, c_nationkey AS nat,
         CAST(count(*) AS BIGINT) AS c
  FROM customer GROUP BY 1, 2),
tots AS (
  SELECT seg, nat, c,
         sum(c) OVER () AS n,
         sum(c) OVER (PARTITION BY seg) AS rc,
         sum(c) OVER (PARTITION BY nat) AS cc
  FROM cells),
mi AS (
  SELECT sum((c * 1.0 / n) * ln((c * 1.0 * n) / (rc * 1.0 * cc))) AS mi,
         -sum((c * 1.0 / n) * ln(c * 1.0 / n)) AS h_joint,
         CAST(count(*) AS BIGINT) AS n_cells,
         CAST(max(n) AS BIGINT) AS n_rows
  FROM tots)
SELECT round(mi, 6) AS mutual_info,
       round(h_joint, 6) AS h_joint,
       round(CASE WHEN h_joint > 0 THEN mi / h_joint ELSE 0.0 END, 6)
         AS redundancy,
       n_cells, n_rows
FROM mi
""")
def dq_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUTUAL INFORMATION between two categorical columns (market
    segment x nation over customers) — the dependency profiler behind
    feature-redundancy pruning and the soft generalization of
    dq_fd_discovery: MI == H(joint) means one column determines the
    other (a functional dependency); MI == 0 means independent, safe to
    model separately. The normalized `redundancy` column (MI / joint
    entropy) is the scale-free gauge data-quality suites threshold.

    Determinism: cell/marginal counts are exact bigints; the ln-sum
    follows the text_word_entropy float posture (sums over ~125 cells,
    rounded once at 6 digits — far above cross-engine libm ULP noise).

    Scale shape: ONE combiner'd groupBy to (cardinality_a x
    cardinality_b) cells; the marginals are windows over the
    cell-sized frame, never the data. MI over a petabyte is exactly one
    scan + algebra on a cells-sized table — the reason MI-based feature
    selection scales where wrapper methods do not."""
    from pyspark.sql import Window as W2

    cust = load(spark, sf_dir, "customer")
    cells = (cust.groupBy(F.col("c_mktsegment").alias("seg"),
                          F.col("c_nationkey").alias("nat"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    tots = cells.select(
        "c",
        F.sum("c").over(W2.partitionBy()).alias("n"),
        F.sum("c").over(W2.partitionBy("seg")).alias("rc"),
        F.sum("c").over(W2.partitionBy("nat")).alias("cc"))
    p = F.col("c") * 1.0 / F.col("n")
    mi = F.sum(p * F.log((F.col("c") * 1.0 * F.col("n"))
                         / (F.col("rc") * 1.0 * F.col("cc"))))
    hj = -F.sum(p * F.log(p))
    agg = tots.agg(mi.alias("mi"), hj.alias("h_joint"),
                   F.count(F.lit(1)).cast("bigint").alias("n_cells"),
                   F.max("n").cast("bigint").alias("n_rows"))
    return agg.select(
        F.round("mi", 6).alias("mutual_info"),
        F.round("h_joint", 6).alias("h_joint"),
        F.round(F.when(F.col("h_joint") > 0,
                       F.col("mi") / F.col("h_joint"))
                .otherwise(0.0), 6).alias("redundancy"),
        "n_cells", "n_rows")


# Laplace mechanism: epsilon and the per-count L1 sensitivity (adding or
# removing one customer changes one segment count by 1).
_DP_EPS = 0.5


@query("dq_dp_noisy_counts", oracle=f"""
WITH g AS (
  SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS true_count
  FROM customer GROUP BY 1),
u AS (
  SELECT seg, true_count,
         (('0x' || substr(md5('dp:' || seg), 1, 8))::BIGINT
          / 4294967296.0) - 0.5 AS uu
  FROM g)
SELECT seg, true_count,
       round(CASE WHEN uu >= 0 THEN -1.0 ELSE 1.0 END
             * (1.0 / {_DP_EPS}) * ln(1.0 - 2.0 * abs(uu)), 6) AS noise,
       round(true_count + (CASE WHEN uu >= 0 THEN -1.0 ELSE 1.0 END
             * (1.0 / {_DP_EPS}) * ln(1.0 - 2.0 * abs(uu))), 6)
         AS noisy_count,
       round(1.0 / {_DP_EPS}, 6) AS laplace_scale
FROM u
""")
def dq_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENTIAL-PRIVACY noisy counts (Dwork et al. 2006, the
    Laplace mechanism): per-segment customer counts released with
    Laplace(sensitivity/epsilon) noise, sensitivity 1 (one customer
    moves one count by 1), epsilon {_DP_EPS}. The private-release
    sibling of dq_k_anonymity / dq_l_diversity / dq_t_closeness —
    those audit a quasi-identifier table, this perturbs the published
    aggregate itself.

    Determinism: the Laplace draw is the INVERSE CDF
    -(1/eps)*sign(u)*ln(1-2|u|) of a uniform derived from a 32-bit
    content hash of the group key (the engine's no-RNG rule:
    ab_bootstrap / rbm Bernoulli precedent), so both engines compute
    the identical noise; in production the hash input would be a
    per-release secret salt — swapping the literal 'dp:' prefix for a
    config value changes nothing structural. true_count is emitted here
    for oracle verification only; a real release ships noisy_count
    alone.

    Scale shape: one combiner'd groupBy to segment-sized counts, then
    row-local math — DP release of a petabyte aggregate costs exactly
    the aggregate."""
    from ..functions.vector import det_hash64

    g = (load(spark, sf_dir, "customer")
         .groupBy(F.col("c_mktsegment").alias("seg"))
         .agg(F.count(F.lit(1)).cast("bigint").alias("true_count")))
    uu = (det_hash64(F.concat(F.lit("dp:"), F.col("seg")))
          / F.lit(4294967296.0)) - 0.5
    noise = (F.when(uu >= 0, -1.0).otherwise(1.0)
             * (1.0 / _DP_EPS) * F.log(1.0 - 2.0 * F.abs(uu)))
    return g.select(
        "seg", "true_count",
        F.round(noise, 6).alias("noise"),
        F.round(F.col("true_count") + noise, 6).alias("noisy_count"),
        F.round(F.lit(1.0 / _DP_EPS), 6).alias("laplace_scale"))


# Conditional-FD probes: (table, condition column, determinant expr,
# dependent expr). The key-determined name dependency holds under
# every condition (tableau = all segments); the custkey->status /
# custkey->priority probes fail for multi-order customers in most
# partitions — the discovery output is WHICH condition values make a
# rule.
_CFD_PROBES = [
    ("orders", "o_orderpriority", "o_custkey", "o_orderstatus"),
    ("orders", "o_orderstatus", "o_custkey", "o_orderpriority"),
    ("customer", "c_mktsegment", "c_custkey", "c_name"),
]


@query("dq_cfd_discovery", oracle=" UNION ALL ".join(f"""
SELECT '{t}' AS tbl, '{c}' AS cond_col,
       CAST({c} AS VARCHAR) AS cond_val,
       '{a}' AS determinant, '{b}' AS dependent,
       CAST(count(DISTINCT lhs) AS BIGINT) AS n_lhs,
       CAST(count(*) AS BIGINT) AS n_pairs,
       count(*) = count(DISTINCT lhs) AS holds,
       CAST(count(*) - count(DISTINCT lhs) AS BIGINT)
         AS n_violating_combos
FROM (SELECT DISTINCT {c}, {a} AS lhs, {b} AS rhs FROM {t})
GROUP BY {c}""" for t, c, a, b in _CFD_PROBES))
def dq_cfd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONDITIONAL FUNCTIONAL DEPENDENCY discovery (Bohannon et al.
    2007 — the data-cleaning rule language that generalizes FDs with a
    pattern tableau): for each probe (condition column, A -> B),
    report PER CONDITION VALUE whether A determines B within that
    slice — the tableau rows a repair system keeps are exactly the
    `holds` partitions, and n_violating_combos ranks the near-rules.
    dq_fd_discovery answers "is A -> B a rule?"; this answers "WHERE
    is it a rule?" — the difference between discarding a dependency
    and discovering it holds everywhere except one legacy segment.

    Determinism: distinct counts and equality only (the FD posture);
    determinant/dependent expressions are compile-time literals shared
    by both engines, condition values cast to VARCHAR so mixed-type
    probes union cleanly.

    Scale shape: one DISTINCT (cond, A, B) shuffle per probe, then a
    condition-keyed rollup of the distinct-triple table — the same
    envelope as the unconditional FD leaf test, once per probe, all
    probes as independent parallel stages."""
    outs = []
    for t, c, a, b in _CFD_PROBES:
        d = (load(spark, sf_dir, t)
             .selectExpr(f"{c} AS cond", f"{a} AS lhs", f"{b} AS rhs")
             .distinct())
        g = (d.groupBy("cond")
             .agg(F.countDistinct("lhs").alias("n_lhs"),
                  F.count(F.lit(1)).alias("n_pairs")))
        outs.append(g.select(
            F.lit(t).alias("tbl"), F.lit(c).alias("cond_col"),
            F.col("cond").cast("string").alias("cond_val"),
            F.lit(a).alias("determinant"), F.lit(b).alias("dependent"),
            F.col("n_lhs").cast("bigint").alias("n_lhs"),
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            (F.col("n_pairs") == F.col("n_lhs")).alias("holds"),
            (F.col("n_pairs") - F.col("n_lhs")).cast("bigint")
            .alias("n_violating_combos")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# Upper 5% critical values of the chi-square distribution, dof 1..20
# (standard published table, e.g. Abramowitz & Stegun 26.8) — embedded
# identically in the Spark expression and the oracle SQL so the verdict
# column compares the same doubles on both engines.
_CHI2_CRIT_5PCT = {
    1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.070,
    6: 12.592, 7: 14.067, 8: 15.507, 9: 16.919, 10: 18.307,
    11: 19.675, 12: 21.026, 13: 22.362, 14: 23.685, 15: 24.996,
    16: 26.296, 17: 27.587, 18: 28.869, 19: 30.144, 20: 31.410,
}


def _chi2_crit_case(dof_expr: str) -> str:
    whens = " ".join(f"WHEN {d} THEN {v}"
                     for d, v in _CHI2_CRIT_5PCT.items())
    return f"CASE {dof_expr} {whens} ELSE NULL END"


@query("dq_chi_square_cramers_v", oracle=f"""
WITH cells AS (
  SELECT o_orderpriority AS a, o_orderstatus AS b,
         CAST(count(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2),
tots AS (
  SELECT a, b, c,
         sum(c) OVER () AS n,
         sum(c) OVER (PARTITION BY a) AS ra,
         sum(c) OVER (PARTITION BY b) AS cb
  FROM cells),
dims AS (
  SELECT CAST(count(DISTINCT a) AS BIGINT) AS r,
         CAST(count(DISTINCT b) AS BIGINT) AS k
  FROM cells),
stat AS (
  SELECT sum((c - ra * 1.0 * cb / n) * (c - ra * 1.0 * cb / n)
             / (ra * 1.0 * cb / n)) AS chi2,
         CAST(max(n) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_cells
  FROM tots)
SELECT s.n_rows, s.n_cells,
       (d.r - 1) * (d.k - 1) AS dof,
       round(s.chi2, 6) AS chi2,
       round(sqrt(s.chi2 / (s.n_rows * least(d.r - 1, d.k - 1))), 6)
         AS cramers_v,
       s.chi2 > {_chi2_crit_case("(d.r - 1) * (d.k - 1)")} AS dependent_5pct
FROM stat s CROSS JOIN dims d
WHERE d.r > 1 AND d.k > 1
""")
def dq_chi_square_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEARSON CHI-SQUARE independence test + CRAMÉR'S V effect size
    (Pearson 1900; Cramér 1946) between two categorical columns
    (order priority x order status) — completes the dependency-profiler
    family: dq_mutual_information (information-theoretic strength),
    dq_fd_discovery (exact determination), dq_ks_two_sample
    (continuous distributions), and now the classic frequentist test
    categorical-vs-categorical: chi2 = sum (O - E)^2 / E with
    E = row_total * col_total / n, dof = (r-1)(k-1), and the
    scale-free V = sqrt(chi2 / (n * min(r-1, k-1))). The 5% verdict
    compares chi2 against the published critical-value table (dof
    1..20), embedded identically in both engines.

    Determinism: cell and marginal counts are exact bigints; the
    (O-E)^2/E sum follows the dq_mutual_information float posture —
    ~15 cells, rounded once at 6 digits, far above cross-engine ULP
    noise; the verdict compares the same double to the same literal.

    Scale shape: ONE combiner'd groupBy to (r x k) cells; marginals
    are windows over the cell-sized frame. Chi-square over a petabyte
    is one scan + algebra on a 15-row table. Reference scope: no DQ
    surface in the reference (SURVEY §2.5); declared extension."""
    from pyspark.sql import Window as W2

    orders = load(spark, sf_dir, "orders")
    cells = (orders.groupBy(F.col("o_orderpriority").alias("a"),
                            F.col("o_orderstatus").alias("b"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    tots = cells.select(
        "a", "b", "c",
        F.sum("c").over(W2.partitionBy()).alias("n"),
        F.sum("c").over(W2.partitionBy("a")).alias("ra"),
        F.sum("c").over(W2.partitionBy("b")).alias("cb"))
    e = F.col("ra") * 1.0 * F.col("cb") / F.col("n")
    stat = tots.agg(
        F.sum((F.col("c") - e) * (F.col("c") - e) / e).alias("chi2"),
        F.max("n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"))
    dims = cells.agg(
        F.countDistinct("a").cast("bigint").alias("r"),
        F.countDistinct("b").cast("bigint").alias("k"))
    dof = (F.col("r") - 1) * (F.col("k") - 1)
    crit = F.expr(_chi2_crit_case("(r - 1) * (k - 1)"))
    # degenerate guard, mirrored by the oracle's WHERE: a single-valued
    # column has dof 0 and V would divide by zero — no test to run
    return (stat.crossJoin(F.broadcast(dims))
            .filter((F.col("r") > 1) & (F.col("k") > 1))
            .select("n_rows", "n_cells", dof.alias("dof"),
                    F.round("chi2", 6).alias("chi2"),
                    F.round(F.sqrt(F.col("chi2")
                                   / (F.col("n_rows")
                                      * F.least(F.col("r") - 1,
                                                F.col("k") - 1))), 6)
                    .alias("cramers_v"),
                    (F.col("chi2") > crit).alias("dependent_5pct")))


# ---------------------------------------------------------------------------
# Row-level expectation routing (pass / quarantine with first failure).

_Q_LANGS = ("en", "zh", "fr", "es", "de")
_Q_LANGS_SQL = ", ".join(f"'{x}'" for x in _Q_LANGS)
_Q_MIN, _Q_MAX = 50, 550     # chars-in-range expectation


@query("dq_quarantine_routing", oracle=f"""
WITH v AS (
  SELECT doc_id,
         CASE
           WHEN text IS NULL OR text = '' THEN 'fail_empty_text'
           WHEN lang NOT IN ({_Q_LANGS_SQL}) THEN 'fail_unknown_lang'
           WHEN n_chars != length(text) THEN 'fail_len_mismatch'
           WHEN n_chars < {_Q_MIN} OR n_chars > {_Q_MAX}
             THEN 'fail_len_range'
           ELSE 'pass'
         END AS verdict
  FROM documents)
SELECT verdict,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(doc_id) AS BIGINT) AS sample_doc
FROM v GROUP BY verdict
""")
def dq_quarantine_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW-LEVEL EXPECTATION ROUTING — the quarantine / dead-letter
    pattern of modern DQ frameworks (Great Expectations' checkpoint
    actions, Delta Live Tables' expect_or_drop): every row gets a
    verdict — 'pass' or the FIRST failing rule in declared priority
    order (empty text, unknown language, metadata/content length
    mismatch, out-of-range length) — and the report counts each
    routing class with a sample row id for triage. Where
    dq_validation_summary AGGREGATES rule hit-rates, this op decides
    per-ROW routing, the thing a pipeline actually acts on (quarantine
    table vs main table).

    First-failure semantics are a single CASE priority chain — one
    narrow codegen pass, deterministic because rule order is the
    config, not the data. Scale shape: one combiner'd verdict count;
    the row-level verdict column itself is the (corpus-sized) routing
    output a writer would split on, and the report is its model-sized
    histogram. At 100 TB this is the cheapest possible gate: zero
    shuffles before the final 5-row count."""
    docs = load(spark, sf_dir, "documents")
    verdict = (
        F.when(F.col("text").isNull() | (F.col("text") == ""),
               "fail_empty_text")
        .when(~F.col("lang").isin(*_Q_LANGS), "fail_unknown_lang")
        .when(F.col("n_chars") != F.length("text"), "fail_len_mismatch")
        .when((F.col("n_chars") < _Q_MIN) | (F.col("n_chars") > _Q_MAX),
              "fail_len_range")
        .otherwise("pass"))
    return (docs.select("doc_id", verdict.alias("verdict"))
            .groupBy("verdict")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                 F.min("doc_id").cast("bigint").alias("sample_doc")))


# ---------------------------------------------------------------------------
# Kruskal-Wallis k-group rank test.

_KW_CRIT_05_DF4 = 9.488  # chi-square 0.95 quantile, df = 5 groups - 1


@query("dq_kruskal_wallis", eager=True, oracle=f"""
WITH r AS (
  SELECT o_orderpriority AS grp,
         row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rk
  FROM orders),
g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(rk) AS BIGINT) AS rank_sum
      FROM r GROUP BY grp),
t AS (SELECT grp, n_g, rank_sum,
             (CAST(rank_sum AS HUGEINT) * rank_sum) // n_g AS termw
      FROM g),
tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
               sum(termw) AS s
        FROM t)
SELECT t.grp, t.n_g, t.rank_sum,
       CAST(t.termw AS VARCHAR) AS term,
       round(12.0 * CAST(tot.s AS DOUBLE)
             / (CAST(tot.n AS DOUBLE) * (tot.n + 1))
             - 3.0 * (tot.n + 1), 6) AS h_stat,
       (12.0 * CAST(tot.s AS DOUBLE)
        / (CAST(tot.n AS DOUBLE) * (tot.n + 1))
        - 3.0 * (tot.n + 1)) > {_KW_CRIT_05_DF4} AS reject_05
FROM t, tot
""")
def dq_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KRUSKAL-WALLIS one-way rank test (Kruskal & Wallis 1952) — the
    k-group nonparametric ANOVA, completing the engine's hypothesis-test
    shelf (Welch t: 2 groups parametric; Mann-Kendall: trend; KS: 2
    distributions; chi-square: 2 categoricals): do the five order
    priorities draw total price from the same distribution? H =
    12/(n(n+1)) * sum_g R_g^2/n_g - 3(n+1), compared to the chi-square
    0.95 critical value at df = k-1 = 4.

    Determinism: a single global rank with (price, orderkey) tiebreak
    (the ml_auc_rank_sum variant — no tie correction, documented);
    per-group rank sums are exact int64; each R_g^2/n_g term is EXACT
    WIDE-INTEGER floor division (round 11, VERDICT r10 ask #5 — the
    WordPiece DECIMAL discipline, replacing the double-mantissa form
    whose term overflowed int64 at n ~ 3e7): Spark squares rank_sum in
    DECIMAL(38,0) and floors the decimal quotient with a one-step
    product correction (Spark's decimal `DIV` silently wraps to int64,
    and FLOOR over the scale-6 decimal quotient can land one above the
    true floor when the remainder is within 5e-7·n_g of n_g — the
    CASE re-multiplication makes it exact); DuckDB runs the same
    division in HUGEINT `//`. Both are exact integer arithmetic up to
    rank_sum ~ 1e19, i.e. n ~ 6e9 ranked rows — two orders past the
    old ceiling and beyond any single-table test this engine will
    rank; past that, rank a stratified sample (the statistic is
    already asymptotic). The term column ships as DECIMAL(38,0) on
    both engines (exact int64 range is no longer assumed); the
    overflow fixture in tests/test_oracle_types.py pins term ==
    pure-Python integer math on a 600k-row single-group table where
    the old double path drifts.

    Scale shape: one global sort-rank (range-partitioned sort + offsets
    at 100 TB, the corpus_shard_assign prefix-sum plan), one 5-row
    grouped sum, scalar algebra. Output keeps the per-group evidence
    table a data-quality report ships with the verdict."""
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders")
    # TWO-PHASE EXACT GLOBAL RANK (round 11, VERDICT r10 ask #6): the
    # one-shot global row_number funnels the whole table through ONE
    # window task — measured BINDING at the 100x rehearsal (15M orders:
    # 48.9s wall, single task; scripts/measure_rank_heavy_sf10.py).
    # The corpus_shard_assign prefix-sum plan replaces it exactly:
    # range-partition on the total order (Spark samples boundaries),
    # localCheckpoint so the boundary draw is evaluated ONCE (two lazy
    # evaluations could sample different boundaries), local row_number
    # per range partition in parallel, then add each partition's
    # exclusive prefix count (an npart-row cumsum, broadcast back).
    # Ranks are bit-identical to the single-window form for any total
    # order — (price, orderkey) has no duplicate keys — regardless of
    # where the sampled boundaries land. Re-measured: 48.9s -> 8.2s at
    # 15M rows (SCALE.md round 11).
    npart = spark.sparkContext.defaultParallelism
    rp = (o.select(F.col("o_orderpriority").alias("grp"),
                   "o_totalprice", "o_orderkey")
          .repartitionByRange(npart, "o_totalprice", "o_orderkey")
          .withColumn("_pid", F.spark_partition_id())
          .localCheckpoint())
    counts = rp.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    offs = counts.withColumn(
        "_off",
        F.coalesce(F.sum("_c").over(
            W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0)))
    r = (rp.withColumn(
            "_lrn", F.row_number().over(
                W.partitionBy("_pid").orderBy("o_totalprice",
                                              "o_orderkey")))
         .join(F.broadcast(offs.select("_pid", "_off")), "_pid")
         .select("grp", (F.col("_lrn") + F.col("_off")).alias("rk")))
    g = (r.groupBy("grp")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n_g"),
              F.sum("rk").cast("bigint").alias("rank_sum")))
    t = g.withColumn(
        "term",
        F.expr("""CAST(CASE WHEN FLOOR(CAST(rank_sum AS DECIMAL(38,0))
                                 * rank_sum / n_g) * n_g
                            > CAST(rank_sum AS DECIMAL(38,0)) * rank_sum
                       THEN FLOOR(CAST(rank_sum AS DECIMAL(38,0))
                                  * rank_sum / n_g) - 1
                       ELSE FLOOR(CAST(rank_sum AS DECIMAL(38,0))
                                  * rank_sum / n_g)
                  END AS DECIMAL(38,0))"""))
    tot = t.agg(F.sum("n_g").cast("bigint").alias("n"),
                F.sum("term").alias("s"))
    h = (F.lit(12.0) * F.col("s").cast("double")
         / (F.col("n").cast("double") * (F.col("n") + 1))
         - F.lit(3.0) * (F.col("n") + 1))
    return (t.crossJoin(F.broadcast(tot))
            .select("grp", "n_g", "rank_sum",
                    F.col("term").cast("string").alias("term"),
                    F.round(h, 6).alias("h_stat"),
                    (h > _KW_CRIT_05_DF4).alias("reject_05")))


# ---------------------------------------------------------------------------
# Fleiss' kappa inter-annotator agreement.

_FK_ANNOTATORS = 5     # simulated annotators per item
_FK_NOISE_MOD = 5      # 1-in-5 annotations flip to a hash-drawn category


@query("dq_fleiss_kappa", oracle=f"""
WITH cats AS (
  SELECT lang, row_number() OVER (ORDER BY lang) - 1 AS idx
  FROM (SELECT DISTINCT lang FROM documents)),
k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM cats),
ann AS (
  SELECT d.doc_id, d.lang, r.a,
         ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '|fk|'
                             || CAST(r.a AS VARCHAR)), 1, 8))::BIGINT AS h1,
         ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '|fkc|'
                             || CAST(r.a AS VARCHAR)), 1, 8))::BIGINT AS h2
  FROM documents d CROSS JOIN (SELECT unnest(range({_FK_ANNOTATORS})) AS a) r),
lab AS (
  SELECT ann.doc_id,
         CASE WHEN ann.h1 % {_FK_NOISE_MOD} = 0
              THEN (SELECT c.lang FROM cats c, k
                    WHERE c.idx = ann.h2 % k.k)
              ELSE ann.lang END AS cat
  FROM ann),
nij AS (SELECT doc_id, cat, CAST(count(*) AS BIGINT) AS n
        FROM lab GROUP BY doc_id, cat),
tt AS (SELECT CAST(sum(n * n) AS BIGINT) AS t,
              CAST(count(DISTINCT doc_id) AS BIGINT) AS n_items
        FROM nij),
cj AS (SELECT CAST(sum(n * n) AS BIGINT) AS c2 FROM (
        SELECT cat, CAST(sum(n) AS BIGINT) AS n FROM nij GROUP BY cat)),
s AS (
  SELECT tt.n_items, tt.t, cj.c2,
         (CAST(tt.t AS DOUBLE) - tt.n_items * {_FK_ANNOTATORS})
           / (CAST(tt.n_items AS DOUBLE) * {_FK_ANNOTATORS}
              * ({_FK_ANNOTATORS} - 1)) AS p_bar,
         CAST(cj.c2 AS DOUBLE)
           / (CAST(tt.n_items AS DOUBLE) * {_FK_ANNOTATORS}
              * tt.n_items * {_FK_ANNOTATORS}) AS p_e
  FROM tt, cj)
SELECT n_items, CAST({_FK_ANNOTATORS} AS BIGINT) AS n_annotators,
       t AS t_sum, c2 AS c2_sum,
       round(p_bar, 6) AS p_bar, round(p_e, 6) AS p_e,
       CASE WHEN c2 = n_items * n_items
                 * {_FK_ANNOTATORS} * {_FK_ANNOTATORS} THEN NULL
            ELSE round((p_bar - p_e) / (1 - p_e), 6) END AS kappa
FROM s
""")
def dq_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLEISS' KAPPA inter-annotator agreement (Fleiss 1971) — the
    labeling-quality gate every supervised training-data pipeline runs
    before trusting its annotations (chance-corrected agreement across
    >2 raters; Krippendorff/Landis-Koch read their verdicts off this
    number). Items are documents, categories the corpus languages;
    {_FK_ANNOTATORS} simulated annotators each emit the true lang
    except a deterministic 1-in-{_FK_NOISE_MOD} hash-flip to a
    hash-drawn category (the corpus ships no real multi-rater labels;
    swapping in an annotations table changes one CTE).

    kappa = (P_bar - P_e) / (1 - P_e) with P_bar the mean per-item
    agreement and P_e the chance agreement from category marginals —
    and EVERY moment here (T = sum n_ij^2, category marginals, item
    count) is an exact int64 sum of small integers (n_ij <=
    {_FK_ANNOTATORS}), so both engines derive kappa from identical
    integer scalars through one identical double expression: no float
    ever crosses a shuffle.

    Scale shape: one corpus-sized explode (x{_FK_ANNOTATORS}) into a
    combiner'd (doc, cat) count, one (cat) rollup, scalar algebra —
    the same two-keyed-pass budget as the DQ profile family. At 100 TB
    annotations arrive as a table and the explode disappears."""
    from ..functions.vector import det_hash64
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    cats = (docs.select("lang").distinct()
            .select("lang",
                    (F.row_number().over(W.orderBy("lang")) - 1)
                    .alias("idx")))
    kcnt = cats.count()
    ann = (docs.select("doc_id", "lang")
           .withColumn("a", F.explode(F.sequence(
               F.lit(0), F.lit(_FK_ANNOTATORS - 1)))))
    h1 = det_hash64(F.concat(F.col("doc_id").cast("string"), F.lit("|fk|"),
                             F.col("a").cast("string")))
    h2 = det_hash64(F.concat(F.col("doc_id").cast("string"), F.lit("|fkc|"),
                             F.col("a").cast("string")))
    lab = (ann.withColumn("noisy", h1 % _FK_NOISE_MOD == 0)
           .withColumn("alt_idx", h2 % kcnt)
           .join(F.broadcast(cats.withColumnRenamed("lang", "alt_lang")
                             .withColumnRenamed("idx", "alt_idx")),
                 "alt_idx")
           .select("doc_id",
                   F.when(F.col("noisy"), F.col("alt_lang"))
                   .otherwise(F.col("lang")).alias("cat")))
    nij = (lab.groupBy("doc_id", "cat")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    tt = nij.agg(
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("t"),
        F.countDistinct("doc_id").cast("bigint").alias("n_items"))
    cj = (nij.groupBy("cat").agg(F.sum("n").cast("bigint").alias("n"))
          .agg(F.sum(F.col("n") * F.col("n")).cast("bigint").alias("c2")))
    s = tt.crossJoin(F.broadcast(cj))
    A = _FK_ANNOTATORS
    p_bar = ((F.col("t").cast("double") - F.col("n_items") * A)
             / (F.col("n_items").cast("double") * A * (A - 1)))
    p_e = (F.col("c2").cast("double")
           / (F.col("n_items").cast("double") * A * F.col("n_items") * A))
    # a single-category corpus (every annotation agrees by construction)
    # has chance agreement exactly 1 — kappa undefined; the guard is an
    # exact INTEGER test (c2 == (N*A)^2), NULL on both engines, so the
    # ANSI divide never sees the zero (degenerate single-lang sweep)
    chance_one = (F.col("c2")
                  == F.col("n_items") * F.col("n_items") * A * A)
    return s.select(
        "n_items", F.lit(A).cast("bigint").alias("n_annotators"),
        F.col("t").alias("t_sum"), F.col("c2").alias("c2_sum"),
        F.round(p_bar, 6).alias("p_bar"), F.round(p_e, 6).alias("p_e"),
        F.when(chance_one, F.lit(None).cast("double"))
        .otherwise(F.round((p_bar - p_e) / (1 - p_e), 6)).alias("kappa"))
