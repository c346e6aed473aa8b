"""Extend the sf1 rehearsal fixture (.scratch/sf1) with the relational
star schema + events, 10x the driver's sf0.1 shapes: customer 150k,
supplier 10k, part 200k, orders 1.5M, lineitem 6M, events 1M;
region/nation copied verbatim (dimension tables don't scale).

Generation is SPARK-NATIVE (spark.range + xxhash64-derived columns, all
whole-stage codegen, written straight to parquet) — the generator itself
is a demonstration of the narrow-pass scale shape, not a driver-side
loop. Distributions mirror the driver fixture's observed domains
(mktsegments, priorities, date ranges, value ranges) closely enough
that every relational/event query does non-degenerate work; exact
driver-fixture statistics are NOT claimed.

Run: python scripts/gen_sf1_relational.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hadoop_digit_recognition_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".scratch", "sf1")
SRC = "/root/testdata/sf0.1"

N_CUST, N_SUPP, N_PART = 150_000, 10_000, 200_000
N_ORDERS, N_LINES, N_EVENTS = 1_500_000, 6_000_000, 1_000_000
N_USERS = 15_000

spark = get_spark("gen-sf1")
spark.sparkContext.setLogLevel("ERROR")


def h(col, salt):
    return F.abs(F.xxhash64(col, F.lit(salt)))


def write(df, name):
    df.write.mode("overwrite").parquet(os.path.join(SF1, f"_{name}"))
    # single-file layout to match the driver fixture's one-parquet-per-
    # table contract (tables.py reads {dir}/{name}.parquet)
    import glob
    import shutil

    part = glob.glob(os.path.join(SF1, f"_{name}", "part-*.parquet"))
    if len(part) == 1:
        shutil.move(part[0], os.path.join(SF1, f"{name}.parquet"))
    else:
        # multi-file: coalesce through a second single-partition write
        (spark.read.parquet(os.path.join(SF1, f"_{name}"))
         .coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(SF1, f"__{name}")))
        part = glob.glob(os.path.join(SF1, f"__{name}", "part-*.parquet"))
        shutil.move(part[0], os.path.join(SF1, f"{name}.parquet"))
        shutil.rmtree(os.path.join(SF1, f"__{name}"))
    shutil.rmtree(os.path.join(SF1, f"_{name}"))
    print(f"wrote {name}")


SEGS = "array('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')"
PRIOS = ("array('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')")
TYPES = "array('LARGE','ECONOMY','SMALL','STANDARD','PROMO','MEDIUM')"
NOUNS = "array('ring','bolt','screw','washer','plate','gear','cap','rod')"
ADJS = "array('large','hot','blue','red','dim','soft','long','thin')"
ETYPES = "array('click','view','purchase','signup','error')"

c = spark.range(N_CUST).select(
    F.col("id").alias("c_custkey"),
    F.format_string("Customer#%09d", "id").alias("c_name"),
    (h("id", 1) % 25).cast("int").alias("c_nationkey"),
    F.round((h("id", 2) % 1_100_000) / 100.0 - 1000.0, 2).alias("c_acctbal"),
    F.expr(f"element_at({SEGS}, cast(abs(xxhash64(id, 3)) % 5 as int) + 1)")
    .alias("c_mktsegment"))
write(c, "customer")

s = spark.range(N_SUPP).select(
    F.col("id").alias("s_suppkey"),
    F.format_string("Supplier#%09d", "id").alias("s_name"),
    (h("id", 4) % 25).cast("int").alias("s_nationkey"),
    F.round((h("id", 5) % 1_100_000) / 100.0 - 1000.0, 2).alias("s_acctbal"))
write(s, "supplier")

p = spark.range(N_PART).select(
    F.col("id").alias("p_partkey"),
    F.expr(f"concat(element_at({ADJS}, cast(abs(xxhash64(id, 6)) % 8 as int) + 1),"
           f" ' ', element_at({NOUNS}, cast(abs(xxhash64(id, 7)) % 8 as int) + 1))")
    .alias("p_name"),
    F.concat(F.lit("Brand#"), (h("id", 8) % 25 + 1).cast("string"))
    .alias("p_brand"),
    F.expr(f"element_at({TYPES}, cast(abs(xxhash64(id, 9)) % 6 as int) + 1)")
    .alias("p_type"),
    (h("id", 10) % 50 + 1).cast("int").alias("p_size"),
    F.round(F.lit(900.0) + F.col("id") / 10.0, 1).alias("p_retailprice"))
write(p, "part")

o = spark.range(N_ORDERS).select(
    F.col("id").alias("o_orderkey"),
    (h("id", 11) % N_CUST).alias("o_custkey"),
    F.expr("element_at(array('O','F','P'), "
           "cast(case when abs(xxhash64(id, 12)) % 20 < 9 then 0 "
           "when abs(xxhash64(id, 12)) % 20 < 18 then 1 else 2 end as int) + 1)")
    .alias("o_orderstatus"),
    F.round((h("id", 13) % 49_899_127) / 100.0 + 1001.91, 2)
    .alias("o_totalprice"),
    F.expr("timestampadd(DAY, cast(abs(xxhash64(id, 14)) % 2404 as int), "
           "timestamp'1995-01-01 00:00:00')").alias("o_orderdate"),
    F.expr(f"element_at({PRIOS}, cast(abs(xxhash64(id, 15)) % 5 as int) + 1)")
    .alias("o_orderpriority"))
write(o, "orders")

li = spark.range(N_LINES).select(
    (F.col("id") / 4).cast("bigint").alias("l_orderkey"),
    (h("id", 16) % N_PART).alias("l_partkey"),
    (h("id", 17) % N_SUPP).alias("l_suppkey"),
    (F.col("id") % 4 + 1).cast("int").alias("l_linenumber"),
    (h("id", 18) % 50 + 1).cast("double").alias("l_quantity"),
    F.round((h("id", 19) % 9_000_000) / 100.0 + 901.0, 2)
    .alias("l_extendedprice"),
    ((h("id", 20) % 11) / 100.0).alias("l_discount"),
    ((h("id", 21) % 9) / 100.0).alias("l_tax"),
    F.expr("element_at(array('A','N','R'), "
           "cast(abs(xxhash64(id, 22)) % 3 as int) + 1)").alias("l_returnflag"),
    F.expr("element_at(array('F','O'), "
           "cast(abs(xxhash64(id, 23)) % 2 as int) + 1)").alias("l_linestatus"),
    F.expr("timestampadd(DAY, cast(abs(xxhash64(id, 24)) % 2498 as int) + 1, "
           "timestamp'1995-01-01 00:00:00')").alias("l_shipdate"))
write(li, "lineitem")

ev = spark.range(N_EVENTS).select(
    F.col("id").alias("event_id"),
    F.expr("timestampadd(MICROSECOND, "
           "cast(abs(xxhash64(id, 25)) % 2591990000000 as bigint), "
           "timestamp'2024-01-01 00:00:10')").alias("ts"),
    # mild zipf: 10% of events land on 15 hot users
    F.when(h("id", 26) % 10 == 0, h("id", 27) % 15)
    .otherwise(h("id", 27) % N_USERS).alias("user_id"),
    F.expr(f"element_at({ETYPES}, cast(abs(xxhash64(id, 28)) % 5 as int) + 1)")
    .alias("event_type"),
    F.round((h("id", 29) % 56022) / 100.0, 2).alias("value"),
    F.format_string('{"k": %d}', (h("id", 30) % 100)).alias("props"))
write(ev, "events")

for t in ("region", "nation"):
    write(spark.read.parquet(os.path.join(SRC, f"{t}.parquet")), t)

print("sf1 relational fixture complete")
