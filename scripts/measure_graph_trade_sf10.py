"""sf10-class rehearsal for the trade-graph derivation family
(SCALE.md round-9; VERDICT r08 ask #5).

`graph_walk_corpus` (1.82x at the sf0.1 -> sf1 step) and
`graph_louvain_move_phase` (1.61x) were the round-8 wave's growth
leaders. Both split into (a) a CORPUS-SIZED edge derivation — the
4-table lineitem x orders x customer x supplier join aggregated to the
nation-level (src, dst, w) trade graph, <= 625 rows at any scale — and
(b) graph algebra over that 25-node state (walk steps / move gains),
which is scale-FREE. The shuffle-row model for (a):

    sw ~= 2|L| + |O| + |C|      (orderkey exchange: L + O;
                                 custkey exchange: (L join O) + C;
                                 supplier side broadcasts at 100k rows;
                                 the final aggregate is combiner'd to
                                 ~cpus x 625 rows, negligible)

so wall and shuffle rows should grow LINEARLY in lineitem count, and
the observed sub-linear sf1 growth factors were fixed-cost amortization,
not a hidden quadratic. This script generates a 10x-sf1 fixture for the
four fact/dim tables (lineitem 60M, orders 15M, customer 1.5M, supplier
100k; nation/region copied — dimensions don't scale), measures both
queries at sf1 and sf10 under the event-log shuffle-row method, and
prints measured-vs-model rows for SCALE.md.

Run: python scripts/gen_sf1_relational.py       # once (sf1 fixture)
     python scripts/measure_graph_trade_sf10.py
"""
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.path.join(REPO, ".scratch")
SF1 = os.path.join(SCRATCH, "sf1")
SF10 = os.path.join(SCRATCH, "sf10rel")
EVLOG = os.path.join(SCRATCH, "eventlog_trade10")

N_CUST, N_SUPP = 1_500_000, 100_000
N_ORDERS, N_LINES = 15_000_000, 60_000_000

QUERIES = ["graph_walk_corpus", "graph_louvain_move_phase"]


def generate(spark) -> None:
    """10x the gen_sf1_relational.py shapes, Spark-native, restricted to
    the columns the trade-graph family reads (key/nation columns only —
    Catalyst would prune the rest off the scan anyway; generating them
    would only slow the fixture build)."""
    from pyspark.sql import functions as F

    # nation/region are copied LAST, so their presence proves the whole
    # fixture completed (a crash between the lineitem write and the dim
    # copies must not be mistaken for a finished build on rerun)
    if all(os.path.exists(os.path.join(SF10, f"{t}.parquet"))
           for t in ("lineitem", "orders", "customer", "supplier",
                     "nation", "region")):
        print("sf10rel fixture present")
        return

    def h(col, salt):
        return F.abs(F.xxhash64(col, F.lit(salt)))

    def write(df, name):
        out = os.path.join(SF10, f"{name}.parquet")
        df.write.mode("overwrite").parquet(out)
        print(f"wrote {name}")

    write(spark.range(N_CUST).select(
        F.col("id").alias("c_custkey"),
        (h("id", 1) % 25).cast("int").alias("c_nationkey")), "customer")
    write(spark.range(N_SUPP).select(
        F.col("id").alias("s_suppkey"),
        (h("id", 11) % 25).cast("int").alias("s_nationkey")), "supplier")
    write(spark.range(N_ORDERS).select(
        F.col("id").alias("o_orderkey"),
        (h("id", 21) % N_CUST).alias("o_custkey")), "orders")
    write(spark.range(N_LINES).select(
        (F.col("id") % N_ORDERS).alias("l_orderkey"),
        (h("id", 31) % N_SUPP).alias("l_suppkey")), "lineitem")
    for t in ("nation", "region"):
        src = os.path.join(SF1, f"{t}.parquet")
        dst = os.path.join(SF10, f"{t}.parquet")
        if os.path.isfile(src):
            shutil.copy(src, dst)
        else:
            shutil.copytree(src, dst)
    print("sf10rel fixture built")


def main() -> None:
    shutil.rmtree(EVLOG, ignore_errors=True)
    os.makedirs(EVLOG, exist_ok=True)

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("trade-graph-sf10")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEM", "24g"))
             .config("spark.ui.enabled", "false")
             .config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.compress", "false")
             .config("spark.eventLog.dir", f"file://{EVLOG}")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    generate(spark)

    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES

    lines = {"sf1": 6_000_000, "sf10": N_LINES}
    orders = {"sf1": 1_500_000, "sf10": N_ORDERS}
    custs = {"sf1": 150_000, "sf10": N_CUST}
    report = {}
    for tag, sf in (("sf1", SF1), ("sf10", SF10)):
        for name in QUERIES:
            grp = f"{name}@{tag}"
            spark.sparkContext.setJobGroup(grp, grp)
            t0 = time.time()
            n = len(SPARK_QUERIES[name](spark, sf).collect())
            wall = round(time.time() - t0, 1)
            spark.catalog.clearCache()
            report[grp] = {"wall_s": wall, "rows": n}
            print(f"{grp:40s} wall={wall:7.1f}s rows={n}", flush=True)
    spark.stop()

    # event-log shuffle-row accounting per job group
    stage_group, sw = {}, {}
    for path in glob.glob(os.path.join(EVLOG, "**", "*"), recursive=True):
        if (not os.path.isfile(path) or path.endswith(".crc")
                or "appstatus" in os.path.basename(path)):
            continue
        with open(path, errors="ignore") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                if not isinstance(ev, dict):
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    grp = (ev.get("Properties") or {}).get(
                        "spark.jobGroup.id")
                    for sid in ev.get("Stage IDs", []):
                        stage_group[sid] = grp
                elif ev.get("Event") == "SparkListenerTaskEnd":
                    grp = stage_group.get(ev.get("Stage ID"))
                    if grp:
                        m = (ev.get("Task Metrics") or {}).get(
                            "Shuffle Write Metrics") or {}
                        sw[grp] = (sw.get(grp, 0)
                                   + m.get("Shuffle Records Written", 0))

    print(f"\n{'query@scale':40s} {'wall s':>8s} {'sw rows':>14s} "
          f"{'model rows':>14s} {'ratio':>6s}")
    for tag in ("sf1", "sf10"):
        model = 2 * lines[tag] + orders[tag] + custs[tag]
        for name in QUERIES:
            grp = f"{name}@{tag}"
            got = sw.get(grp, 0)
            report[grp]["sw_rows"] = got
            report[grp]["model_rows"] = model
            print(f"{grp:40s} {report[grp]['wall_s']:8.1f} {got:14,} "
                  f"{model:14,} {got / model:6.2f}")

    out = os.path.join(SCRATCH, "graph_trade_sf10.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
