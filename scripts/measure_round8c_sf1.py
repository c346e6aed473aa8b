"""sf1 rehearsal for the round-8 continuation operators (relational /
events families — the documents/embeddings ops were covered by the
round-5 text fixture rehearsal and are plan-identical here).

Uses the Spark-native sf1 fixture from gen_sf1_relational.py
(.scratch/sf1: orders 1.5M, lineitem 6M, events 1M — 10x the driver's
sf0.1). For each query: wall time and result row count at sf0.1 and
sf1, so SCALE.md records a measured growth factor against the expected
shape (all of these are one-combiner'd-pass or model-state-algebra
plans, so wall growth should track the scan, ~linearly).

Run: python scripts/gen_sf1_relational.py   # once, builds the fixture
     python scripts/measure_round8c_sf1.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".scratch", "sf1")
SF01 = "/root/testdata/sf0.1"

from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
from hadoop_digit_recognition_spark.session import get_spark

QUERIES = [
    "events_prefixspan_topk",
    "events_attribution_shapley",
    "ml_random_forest_stumps",
    "sketch_bitmap_distinct",
    "timeseries_dtw_pairs",
    "timeseries_holt_winters",
    "graph_hits_hubs_authorities",
    "graph_personalized_pagerank",
    "graph_walk_corpus",
    "graph_scc_forward_backward",
    "graph_louvain_move_phase",
]

if not os.path.isdir(SF1):
    sys.exit("run scripts/gen_sf1_relational.py first")

spark = get_spark("round8c-sf1")
spark.sparkContext.setLogLevel("ERROR")

print(f"{'query':35s} {'sf0.1 s':>8s} {'sf1 s':>8s} {'x':>6s} rows(sf1)")
for name in QUERIES:
    times = {}
    rows1 = None
    for label, sf in (("sf0.1", SF01), ("sf1", SF1)):
        t0 = time.time()
        out = SPARK_QUERIES[name](spark, sf).collect()
        times[label] = time.time() - t0
        if label == "sf1":
            rows1 = len(out)
        spark.catalog.clearCache()
    print(f"{name:35s} {times['sf0.1']:8.2f} {times['sf1']:8.2f} "
          f"{times['sf1'] / max(times['sf0.1'], 1e-9):6.2f} {rows1}")
