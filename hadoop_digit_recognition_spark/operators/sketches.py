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


@query("sketch_hll_distinct")
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


@query("sketch_quantiles")
def sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95/p99 of event value per type via Spark's
    quantile summaries (percentile_approx, accuracy 10000 -> error
    <= 0.01%), with the exact percentiles alongside."""
    ev = load(spark, sf_dir, "events")
    pcts = F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99))
    return (ev.groupBy("event_type")
            .agg(F.percentile_approx("value", pcts, 10000).alias("approx_p"),
                 F.expr("percentile(value, array(0.5, 0.95, 0.99))")
                 .alias("exact_p"))
            .orderBy("event_type"))


@query("sketch_cms_heavy_hitters")
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
