"""Extra analytics operators: market-basket association rules (and room
for further cross-sell / affinity analytics). Registered via
all_queries._OPTIONAL_MODULES."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query("basket_association_rules", oracle="""
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n
      FROM lineitem),
item AS (SELECT l_partkey, CAST(count(*) AS DOUBLE) AS c
         FROM baskets GROUP BY l_partkey),
pair AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS c
         FROM baskets a
         JOIN baskets b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
         GROUP BY a.l_partkey, b.l_partkey
         HAVING count(*) >= 2),
scored AS (
  SELECT pa, pb, pair.c AS n_both,
         round(pair.c / n.n, 9) AS support,
         round(pair.c / ia.c, 6) AS confidence,
         round((pair.c * n.n) / (ia.c * ib.c), 4) AS lift
  FROM pair
  JOIN item ia ON ia.l_partkey = pa
  JOIN item ib ON ib.l_partkey = pb
  CROSS JOIN n
)
SELECT pa, pb, n_both, support, confidence, lift
FROM (SELECT *, row_number() OVER (ORDER BY lift DESC, pa, pb) AS rn
      FROM scored)
WHERE rn <= 50
""")
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (orders = baskets, parts = items):
    co-occurrence counts from a basket SELF-equi-join on the order key
    (pair space is per-basket, Σ|basket|² — never the item cross
    product), min-support pruning in the HAVING, then support /
    confidence / lift from the pair and single-item counts. Top-50 by
    lift on the ROUNDED score with id tiebreaks so both engines cut the
    same set. At 100 TB: the self-join shuffles once on orderkey;
    item counts broadcast; the cross-joined total is a 1-row literal
    (scalar subquery), not a join."""
    li = load(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    n = float(li.select("l_orderkey").distinct().count())
    item = (baskets.groupBy("l_partkey")
            .agg(F.count(F.lit(1)).cast("double").alias("ic")))
    a = baskets.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = baskets.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pair = (a.join(b, "l_orderkey").filter(F.col("pa") < F.col("pb"))
            .groupBy("pa", "pb").agg(F.count(F.lit(1)).alias("n_both"))
            .filter(F.col("n_both") >= 2))
    scored = (pair
              .join(F.broadcast(item.withColumnRenamed("l_partkey", "pa")
                                .withColumnRenamed("ic", "ca")), "pa")
              .join(F.broadcast(item.withColumnRenamed("l_partkey", "pb")
                                .withColumnRenamed("ic", "cb")), "pb")
              .select("pa", "pb", "n_both",
                      F.round(F.col("n_both") / F.lit(n), 9).alias("support"),
                      F.round(F.col("n_both") / F.col("ca"), 6)
                      .alias("confidence"),
                      F.round(F.col("n_both") * F.lit(n)
                              / (F.col("ca") * F.col("cb")), 4)
                      .alias("lift")))
    # TakeOrderedAndProject (per-partition heaps), not a global window —
    # the candidate set is pair-count-sized here, but the heap form costs
    # nothing and survives any pair-count growth
    return scored.orderBy(F.desc("lift"), "pa", "pb").limit(50)


@query("events_anomaly_mad", oracle="""
WITH med AS (SELECT event_type, median(value) AS m
             FROM events GROUP BY event_type),
j AS (SELECT e.event_type, e.value, med.m
      FROM events e JOIN med USING (event_type)),
stats AS (SELECT event_type, any_value(m) AS m,
                 median(abs(value - m)) AS mad,
                 count(*) AS n
          FROM j GROUP BY event_type)
SELECT j.event_type,
       CAST(any_value(stats.n) AS BIGINT) AS n,
       round(any_value(stats.m), 6) AS med,
       round(any_value(stats.mad), 6) AS mad,
       CAST(sum(CASE WHEN abs(j.value - stats.m) > 3 * 1.4826 * stats.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM j JOIN stats USING (event_type)
GROUP BY j.event_type
""")
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly counting per event type via median absolute
    deviation: a value is anomalous when |v - median| exceeds 3 robust
    standard deviations (MAD x 1.4826 — the consistency constant that
    makes MAD estimate sigma under normality). Median/MAD resist the
    heavy tails that wreck mean/stddev z-scores on operational metrics.

    Two passes by construction (a threshold derived from an aggregate
    cannot be applied inside the same aggregate): pass 1 computes
    median then MAD per type; pass 2 re-scans with the (5-row) stats
    table broadcast and counts exceedances.

    Scale shape: two type-keyed grouped EXACT medians plus one broadcast
    join back onto the stream. At 100 TB swap median for
    percentile_approx at the same plan — sketch_quantiles demonstrates
    that form and its error bound."""
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("m"))
    j = ev.join(F.broadcast(med), "event_type")
    dev = F.abs(F.col("value") - F.col("m"))
    stats = (j.groupBy("event_type")
             .agg(F.first("m").alias("m"),
                  F.median(dev).alias("mad"),
                  F.count(F.lit(1)).cast("bigint").alias("n")))
    j2 = ev.join(F.broadcast(stats), "event_type")
    dev2 = F.abs(F.col("value") - F.col("m"))
    return (j2.groupBy("event_type")
            .agg(F.first("n").alias("n"),
                 F.round(F.first("m"), 6).alias("med"),
                 F.round(F.first("mad"), 6).alias("mad"),
                 F.sum(F.when(dev2 > 3 * 1.4826 * F.col("mad"), 1)
                       .otherwise(0)).cast("bigint").alias("n_anomalies")))
