"""Physical-strategy operators (bucketed/salted) against their oracles +
plan shape; sketch aggregates against exact answers with error bounds."""

from __future__ import annotations

import re

import pytest

from hadoop_digit_recognition_spark.all_queries import ORACLE_SQL, SPARK_QUERIES
from hadoop_digit_recognition_spark.plans import explain_formatted

from .conftest import SF_ORACLE
from .oracle_harness import compare

PHYSICAL = ["join_bucketed_colocated", "agg_skew_salted_twophase",
            "join_skew_salted", "layout_zorder_files",
            "spatial_grid_neighbor_join"]


@pytest.mark.parametrize("name", PHYSICAL)
def test_physical_vs_duckdb(spark, duck, name):
    df = SPARK_QUERIES[name](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL[name], name)


def test_bucketed_join_has_no_exchange_or_sort(spark):
    """The whole point of the bucketed layout: the orderkey join must
    need neither a shuffle nor a sort at read time."""
    df = SPARK_QUERIES["join_bucketed_colocated"](spark, SF_ORACLE)
    txt = explain_formatted(df)
    assert "SortMergeJoin" in txt, txt
    # exactly ONE exchange in the whole plan: the final groupBy's. The
    # join itself consumes the buckets' hashpartitioning directly.
    assert len(re.findall(r"\(\d+\) Exchange", txt)) == 1, txt


def test_salted_join_spreads_hot_key(spark):
    """Salted probe side must carry N_SALTS distinct salts for the hot
    key (the fan-out that kills the straggler)."""
    from hadoop_digit_recognition_spark.operators.physical import N_SALTS
    from hadoop_digit_recognition_spark.tables import load
    from pyspark.sql import functions as F
    ev = load(spark, SF_ORACLE, "events")
    n = (ev.filter(F.col("event_type") == "click")
         .select(F.pmod(F.xxhash64("event_id"), F.lit(N_SALTS)).alias("s"))
         .distinct().count())
    assert n == N_SALTS


def test_hll_within_rsd(spark):
    rows = SPARK_QUERIES["sketch_hll_distinct"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        err = abs(r["approx_users"] - r["exact_users"]) / r["exact_users"]
        assert err <= 0.06, r  # 3x the 2% rsd — ~3 sigma


def test_quantile_sketch_within_accuracy(spark, duck):
    rows = SPARK_QUERIES["sketch_quantiles"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        # disc vs cont differ by at most one inter-value gap; loose bound
        spread = max(abs(r["exact_v"]), 1.0)
        assert abs(r["approx_v"] - r["exact_v"]) <= 0.05 * spread, r
    compare(SPARK_QUERIES["sketch_quantiles"](spark, SF_ORACLE),
            duck, ORACLE_SQL["sketch_quantiles"], "sketch_quantiles")


def test_cms_query_shape(spark):
    rows = SPARK_QUERIES["sketch_cms_heavy_hitters"](spark, SF_ORACLE).collect()
    assert len(rows) == 10
    assert all(r["sketch_bytes"] > 0 for r in rows)
    ns = [r["exact_n"] for r in rows]
    assert ns == sorted(ns, reverse=True)


@pytest.mark.parametrize("name", ["join_range_bucketed",
                                  "partition_pruned_scan"])
def test_range_and_pruning_vs_duckdb(spark, duck, name):
    df = SPARK_QUERIES[name](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL[name], name)


def test_partition_pruning_reaches_scan(spark):
    """The date filter must prune partitions at file listing
    (PartitionFilters on the scan), not as a post-scan row filter."""
    df = SPARK_QUERIES["partition_pruned_scan"](spark, SF_ORACLE)
    txt = explain_formatted(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", txt)
    assert m and "d#" in m.group(1), txt


def test_range_join_is_equi_not_bnl(spark):
    """Range bucketing must produce an equi-join (hash/merge), never a
    nested-loop over user histories."""
    df = SPARK_QUERIES["join_range_bucketed"](spark, SF_ORACLE)
    txt = explain_formatted(df)
    assert "BroadcastNestedLoopJoin" not in txt
    assert "CartesianProduct" not in txt


def test_hll_registers_estimate_within_bound(spark):
    """The relational HLL's estimate (folded from the oracle-exact
    register state) must sit within the published HLL error for m=256
    (1.04/sqrt(256) ~ 6.5% standard error; 4 sigma asserted) of the
    exact per-type distinct user count."""
    from pyspark.sql import functions as F

    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from hadoop_digit_recognition_spark.operators.sketches import (
        hll_estimate_from_registers,
    )
    from hadoop_digit_recognition_spark.tables import load

    from .conftest import SF_ORACLE

    reg = SPARK_QUERIES["sketch_hll_registers"](spark, SF_ORACLE)
    est = {r["event_type"]: r["hll_estimate"]
           for r in hll_estimate_from_registers(reg).collect()}
    exact = {r["event_type"]: r["n"]
             for r in load(spark, SF_ORACLE, "events")
             .groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert set(est) == set(exact)
    for k, n in exact.items():
        rel = abs(est[k] - n) / n
        assert rel <= 4 * 1.04 / (256 ** 0.5), (k, est[k], n, rel)


def test_rollup_reaggregation_vs_duckdb(spark, duck):
    """Daily stats derived from the hourly mergeable state must equal
    the oracle's same two-level derivation exactly (decimal sums make
    the merge order-independent)."""
    df = SPARK_QUERIES["rollup_reaggregation"](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL["rollup_reaggregation"],
            "rollup_reaggregation")


def test_dpp_partitioned_oracle_and_plan(spark, duck):
    """join_dpp_partitioned matches its oracle AND the fact scan's
    partition filter is a runtime dynamicpruningexpression (the date
    predicate arrives via the dim join, not a literal)."""
    df = SPARK_QUERIES["join_dpp_partitioned"](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL["join_dpp_partitioned"],
            "join_dpp_partitioned")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:3000]


def test_bloom_filter_join_demo(spark):
    """The bloom demo's optimized plan carries bloom_filter_agg (creation
    side) and might_contain (application side), and the result equals the
    same aggregate computed without the runtime-filter machinery."""
    from hadoop_digit_recognition_spark.operators.physical import (
        bloom_filter_join_demo)

    df = bloom_filter_join_demo(spark, SF_ORACLE)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in opt, opt[:3000]
    assert "might_contain" in opt, opt[:3000]
    got = {tuple(r) for r in df.collect()}
    from pyspark.sql import functions as F

    from hadoop_digit_recognition_spark.tables import load
    o = load(spark, SF_ORACLE, "orders").filter(
        (F.year("o_orderdate") == 1997)
        & (F.col("o_orderpriority") == "1-URGENT"))
    li = load(spark, SF_ORACLE, "lineitem")
    want = {tuple(r) for r in
            (li.join(o, li.l_orderkey == o.o_orderkey)
             .groupBy("o_orderpriority")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum(F.col("l_extendedprice")
                                * (1 - F.col("l_discount"))), 4)
                  .alias("revenue"))).collect()}
    assert got == want


def test_join_hint_shuffle_hash(spark, duck):
    """Hint must force ShuffledHashJoin (not BHJ/SMJ) and results must
    match the strategy-agnostic oracle."""
    df = SPARK_QUERIES["join_hint_shuffle_hash"](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL["join_hint_shuffle_hash"],
            "join_hint_shuffle_hash")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan[:2000]


def test_cms_registers_oracle_and_bound(spark, duck):
    """Relational CMS matches its oracle AND honors the one-sided
    guarantee: estimates never undercount."""
    df = SPARK_QUERIES["sketch_cms_registers"](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL["sketch_cms_registers"],
            "sketch_cms_registers")
    rows = df.collect()
    assert rows and all(r.est_n >= r.exact_n for r in rows)


def test_hll_datasketches_error_bound(spark):
    """DataSketches HLL estimates must sit within 5% of exact distinct
    counts at this cardinality (150 users), and the merged 'ALL' sketch
    must equal a direct global estimate."""
    from pyspark.sql import functions as F

    from hadoop_digit_recognition_spark.tables import load

    rows = {r.event_type: r.approx_users for r in
            SPARK_QUERIES["sketch_hll_datasketches"](spark, SF_ORACLE)
            .collect()}
    ev = load(spark, SF_ORACLE, "events")
    exact_all = ev.select("user_id").distinct().count()
    assert abs(rows["ALL"] - exact_all) / exact_all < 0.05
    for r in (ev.groupBy("event_type")
              .agg(F.countDistinct("user_id").alias("n")).collect()):
        assert abs(rows[r.event_type] - r.n) / r.n < 0.05, r.event_type


def test_cms_builtin_point_estimates_bounded(spark):
    """Deserialize the built-in count_min_sketch through the JVM and
    probe it for the top-10 heavy hitters: the estimate must honor the
    CMS guarantee (never undercounts; overcount <= eps * N at the
    sketch's eps=0.001) — binding the opaque built-in to the same
    bounds the oracle-exact twin (sketch_cms_registers) proves
    relationally."""
    from hadoop_digit_recognition_spark.tables import load

    rows = SPARK_QUERIES["sketch_cms_heavy_hitters"](spark, SF_ORACLE).collect()
    ev = load(spark, SF_ORACLE, "events")
    n_total = ev.count()
    sk_hex = ev.selectExpr(
        "hex(count_min_sketch(user_id, 0.001d, 0.99d, 42)) AS sk"
    ).first()["sk"]
    jcms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes.fromhex(sk_hex))
    for r in rows:
        est = jcms.estimateCount(r["user_id"])
        assert est >= r["exact_n"], (r, est)
        assert est <= r["exact_n"] + 0.001 * n_total + 1, (r, est, n_total)


def test_hll_builtin_agrees_with_register_twin(spark):
    """The opaque built-in (approx_count_distinct, rsd=2%) and the
    oracle-exact register twin (sketch_hll_registers -> fold) must agree
    per event_type within their combined error budgets (4 sigma of 2%
    and of 1.04/sqrt(256) respectively) around the same truth — the
    agreement test that ties the rows-only query to the twin the driver
    value-hashes."""
    from hadoop_digit_recognition_spark.operators.sketches import (
        hll_estimate_from_registers,
    )

    builtin = {r["event_type"]: (r["approx_users"], r["exact_users"])
               for r in SPARK_QUERIES["sketch_hll_distinct"](spark, SF_ORACLE)
               .collect()}
    twin = {r["event_type"]: r["hll_estimate"]
            for r in hll_estimate_from_registers(
                SPARK_QUERIES["sketch_hll_registers"](spark, SF_ORACLE))
            .collect()}
    assert set(builtin) == set(twin)
    combined = 4 * (0.02 + 1.04 / (256 ** 0.5))
    for k, (approx, exact) in builtin.items():
        assert abs(approx - twin[k]) / exact <= combined, (
            k, approx, twin[k], exact)


def test_zorder_files_bounding_boxes_tight(spark):
    """Morton order must localize BOTH dimensions: every 16th of the
    zkey space is exactly one 4x4 cell of (user bucket, value bucket) —
    the property that makes multi-dimension file skipping work. Also:
    the 16 files partition the full event set."""
    from hadoop_digit_recognition_spark.tables import load

    rows = SPARK_QUERIES["layout_zorder_files"](spark, SF_ORACLE).collect()
    assert len(rows) == 16
    for r in rows:
        assert r.ub_max - r.ub_min <= 3, r
        assert r.vb_max - r.vb_min <= 3, r
    total = load(spark, SF_ORACLE, "events").count()
    assert sum(r.n for r in rows) == total


def test_spatial_grid_pairs_unique_and_verified(spark):
    """The 3x3 probe must emit each qualifying pair EXACTLY once (the
    right side keys on its single home cell), and every emitted pair
    verifies the radius predicate."""
    rows = SPARK_QUERIES["spatial_grid_neighbor_join"](
        spark, SF_ORACLE).collect()
    assert rows
    pairs = [(r.id_a, r.id_b) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert all(r.id_a < r.id_b for r in rows)
    assert all(0.0 <= r.dist <= 1.0 for r in rows)


def test_hll_intersection_vs_duckdb(spark, duck):
    compare(SPARK_QUERIES["sketch_hll_intersection"](spark, SF_ORACLE),
            duck, ORACLE_SQL["sketch_hll_intersection"],
            "sketch_hll_intersection")


def test_hll_intersection_estimates_near_truth(spark):
    """Inclusion-exclusion on 256-bucket HLLs has relative error ~3x the
    single-sketch 1.04/sqrt(m) = 6.5% on the intersection term; assert
    every pair estimate lands within a generous 35% of the exact
    overlap (the exact column ships in the same row)."""
    rows = SPARK_QUERIES["sketch_hll_intersection"](
        spark, SF_ORACLE).collect()
    assert len(rows) == 10  # C(5 event types, 2)
    for r in rows:
        assert r.exact_intersection > 0
        rel = abs(r.est_intersection - r.exact_intersection) \
            / r.exact_intersection
        assert rel < 0.35, (r, rel)


def test_kmv_estimate_within_bound(spark, duck):
    """KMV decode check: (K-1) * 2^32 / kth_min_hash must sit within
    the KMV relative error ~1/sqrt(K-2) (4 sigma asserted, K=64) of the
    exact per-type distinct user count — and the sketch must agree with
    its own n_distinct_hashes reference column (hash collisions on
    32 bits are ~0 at this cardinality). Also oracle-compared."""
    from pyspark.sql import functions as F

    from hadoop_digit_recognition_spark.all_queries import (
        ORACLE_SQL, SPARK_QUERIES)
    from hadoop_digit_recognition_spark.operators.sketches import _KMV_K
    from hadoop_digit_recognition_spark.tables import load

    from .conftest import SF_ORACLE

    name = "sketch_kmv_distinct"
    df = SPARK_QUERIES[name](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL[name], name)
    rows = {r["event_type"]: r for r in df.collect()}
    exact = {r["event_type"]: r["n"]
             for r in load(spark, SF_ORACLE, "events")
             .groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    sigma = 1.0 / (_KMV_K - 2) ** 0.5
    for k, n in exact.items():
        r = rows[k]
        assert abs(r["n_distinct_hashes"] - n) <= max(2, 0.01 * n)
        if r["k_kept"] < _KMV_K:
            # fewer distinct values than K: the sketch IS the exact set
            assert r["n_distinct_hashes"] == r["k_kept"]
            continue
        est = (_KMV_K - 1) * (2.0 ** 32) / r["kth_min_hash"]
        assert abs(est - n) / n <= 4 * sigma, (k, est, n)


def test_bitmap_distinct_is_exact(spark, duck):
    """The bitmap popcount sum must equal a direct countDistinct — the
    lossless-sketch property that separates it from HLL."""
    from pyspark.sql import functions as F

    from hadoop_digit_recognition_spark.tables import load

    compare(SPARK_QUERIES["sketch_bitmap_distinct"](spark, SF_ORACLE),
            duck, ORACLE_SQL["sketch_bitmap_distinct"],
            "sketch_bitmap_distinct")
    got = {r.event_type: r.n_distinct
           for r in SPARK_QUERIES["sketch_bitmap_distinct"](
               spark, SF_ORACLE).collect()}
    want = {r["event_type"]: r["n"]
            for r in load(spark, SF_ORACLE, "events")
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert got == want
