"""sf10 rehearsal for the rank-heavy round-10 wave (VERDICT r10 ask #6).

The four operators whose scale story is a GLOBAL ntile/rank were only
ever measured at sf1 (10x): ml_uplift_qini, ab_propensity_strata (global
ntile over the user summary), dq_kruskal_wallis (global row_number over
orders), ml_pr_auc (global rank over embeddings scores). This script
measures each at sf0.1 and at a 100x fixture and reports the scaling
exponent log(ratio)/log(100) — the number SCALE.md records. If the
one-shot global window binds, the documented fallback is the
range-partitioned two-phase prefix-sum (corpus_shard_assign's plan).

Fixtures (generated once, deterministic seed):
- .scratch/sf10rank/orders.parquet — 15M rows (100x sf0.1), the three
  columns dq_kruskal_wallis touches.
- .scratch/sf10rank/events.parquet — 10M rows (100x sf0.1), 150k users,
  the columns the events-family queries touch (full schema so
  _load_events' ts handling applies).
- ml_pr_auc rides the existing .scratch/sf10 embeddings (200k vectors,
  100x sf0.1).

Run: python scripts/measure_rank_heavy_sf10.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SFR = os.path.join(REPO, ".scratch", "sf10rank")
SF10 = os.path.join(REPO, ".scratch", "sf10")


def generate() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(SFR, exist_ok=True)
    rng = np.random.default_rng(1106)

    n_orders = 15_000_000
    if not os.path.exists(f"{SFR}/orders.parquet"):
        pri = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                        "4-NOT SPECIFIED", "5-LOW"])
        keys = np.arange(n_orders, dtype=np.int64)
        tbl = pa.table({
            "o_orderkey": pa.array(keys),
            "o_orderpriority": pa.array(
                pri[rng.integers(0, 5, n_orders)].tolist()),
            "o_totalprice": pa.array(
                np.round(rng.uniform(900.0, 500000.0, n_orders), 2)),
        })
        pq.write_table(tbl, f"{SFR}/orders.parquet")
        print(f"generated orders x{n_orders}")

    n_events = 10_000_000
    if not os.path.exists(f"{SFR}/events.parquet"):
        types = np.array(["view", "click", "purchase", "signup", "error"])
        base = np.datetime64("2024-01-01T00:00:00", "us")
        span = np.timedelta64(30 * 24 * 3600 * 1_000_000, "us")
        ts = base + (rng.random(n_events) * span.astype(np.int64)
                     ).astype("timedelta64[us]")
        tbl = pa.table({
            "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
            "ts": pa.array(ts),
            "user_id": pa.array(
                rng.integers(0, 150_000, n_events, dtype=np.int64)),
            "event_type": pa.array(
                types[rng.integers(0, 5, n_events)].tolist()),
            "value": pa.array(np.round(rng.exponential(50.0, n_events), 2)),
            "props": pa.array([""] * n_events),
        })
        pq.write_table(tbl, f"{SFR}/events.parquet")
        print(f"generated events x{n_events}")


def main() -> None:
    generate()

    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from hadoop_digit_recognition_spark.session import get_spark

    spark = get_spark("rank-heavy-sf10")
    spark.sparkContext.setLogLevel("ERROR")

    CASES = [
        ("dq_kruskal_wallis", SFR, "orders 150k -> 15M (100x)"),
        ("ml_uplift_qini", SFR, "events 100k -> 10M (100x)"),
        ("ab_propensity_strata", SFR, "events 100k -> 10M (100x)"),
        ("ab_simpsons_paradox_check", SFR, "events 100k -> 10M (100x)"),
        ("ml_pr_auc", SF10, "embeddings 2k -> 200k (100x)"),
        # round-11 additions at the same 100x embeddings fixture: the
        # multi-probe quantizer chain (VERDICT r10 ask #1 "sf10-class
        # chain re-measured") and the re-shaped sampled-panel eval
        # (ask #3 — the O(n^2) truth side this replaces measured 112.7s
        # at sf0.1 alone and would be ~10^4x that here)
        ("dedup_semdedup_multiprobe_capped", SF10,
         "embeddings 2k -> 200k (100x), capped multi-probe"),
        # NOT measured at 200k: the UNCAPPED quantizers and their evals
        # — their within-cell pair term is Sum(|cell|^2) ~ 1.2e9 cosine
        # pairs at 16 fixed cells, the exact quadratic the capped rung
        # exists to replace (measured 29.5s already at 20k, round 6).
        # At scale the eval grades the CAPPED quantizer.
        ("sim_nndescent_recall_curve", SF10,
         "embeddings 2k -> 200k (100x), 6 full rounds + truth sweep"),
    ]

    import math

    def wall(name: str, sf_dir: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        (SPARK_QUERIES[name](spark, sf_dir)
         .write.format("noop").mode("overwrite").save())
        return time.perf_counter() - t0

    # warm the session once
    wall("dq_kruskal_wallis", SF01)
    for name, big, note in CASES:
        t_small = min(wall(name, SF01) for _ in range(2))
        t_big = min(wall(name, big) for _ in range(2))
        exp = math.log(max(t_big / t_small, 1e-9)) / math.log(100)
        print(f"{name}: sf0.1 {t_small:.2f}s -> 100x {t_big:.2f}s "
              f"(ratio {t_big / t_small:.1f}x, exponent {exp:.2f}) [{note}]",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
