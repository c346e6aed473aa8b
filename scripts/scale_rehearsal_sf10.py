"""sf10 spot-rehearsal of the three heaviest dedup families
(VERDICT r06 ask #5).

The sf1 rehearsal (scripts/scale_rehearsal_sf1.py) proved the sizing
worksheet within 2x at 10x the driver fixture and caught two
fixed-constant quadratics by measurement. This script pushes the three
heaviest families another 10x — 500,000 documents / 200,000 embeddings,
i.e. 100x the driver's sf0.1 — under the same event-log shuffle-row
measurement, so the 100 TB claim rests on a two-decade measured trend
(sf0.1 -> sf1 -> sf10) rather than one extrapolation:

  * dedup_minhash_lsh        — banded MinHash + CC resolve
  * dedup_repeated_substrings — stride-1 window min<max combiner form
  * dedup_semdedup_capped    — capped SemDeDup with the round-7
                               two-phase sharded top-M (mega-cell fix)

Generation is numpy-vectorized (the md5-per-word sf1 generator would
take minutes at 27M words) but mirrors the same corpus statistics:
31-word vocab, uniform 10..100 words/doc, ~0.16% exact-dup rate,
N(0, 0.123) 64-dim embeddings. Deterministic via fixed seeds.

Run: python scripts/scale_rehearsal_sf10.py [--skip-gen]
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.path.join(REPO, ".scratch", "sf10")
EVLOG = os.path.join(REPO, ".scratch", "eventlog_sf10")

N_DOCS = 500_000
N_EMB = 200_000
VOCAB = ['a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'dup',
         'fast', 'filter', 'group', 'hash', 'join', 'key', 'line', 'merge',
         'order', 'part', 'query', 'row', 'scan', 'slow', 'small', 'sort',
         'spark', 'stream', 'table', 'the', 'value', 'vector', 'window']
DUP_EVERY = 625

QUERIES = [
    "dedup_minhash_lsh",
    "dedup_repeated_substrings",
    "dedup_semdedup_capped",
]


def generate() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(SF10, exist_ok=True)
    rng = np.random.default_rng(20260815)
    lens = rng.integers(10, 101, N_DOCS)
    vocab = np.array(VOCAB)
    texts = []
    for d in range(N_DOCS):
        if d % DUP_EVERY == DUP_EVERY - 1 and d >= DUP_EVERY:
            texts.append(texts[d - DUP_EVERY])
        else:
            texts.append(" ".join(vocab[rng.integers(0, len(VOCAB),
                                                     lens[d])]))
    langs = np.array(["en", "en", "zh", "fr", "es", "de"])[
        rng.integers(0, 6, N_DOCS)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(N_DOCS), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array([f"src{d % 20}" for d in range(N_DOCS)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(SF10, "documents.parquet"))

    emb = rng.normal(0.0, 0.123, size=(N_EMB, 64)).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(N_EMB), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array((rng.integers(0, 10, N_EMB)).astype("int32")),
    }), os.path.join(SF10, "embeddings.parquet"))
    print(f"generated {N_DOCS} docs / {N_EMB} embeddings -> {SF10}")


def run_and_measure() -> dict:
    import shutil

    shutil.rmtree(EVLOG, ignore_errors=True)
    os.makedirs(EVLOG, exist_ok=True)

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("sf10-rehearsal")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEM", "24g"))
             .config("spark.ui.enabled", "false")
             .config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.compress", "false")
             .config("spark.eventLog.rolling.enabled", "false")
             .config("spark.eventLog.dir", f"file://{EVLOG}")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from hadoop_digit_recognition_spark.operators.dedup import (
        clear_signature_cache)

    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    walls = {}
    for name in QUERIES:
        clear_signature_cache(spark)
        spark.sparkContext.setJobGroup(name, name)
        t0 = time.time()
        _force(SPARK_QUERIES[name](spark, SF10))
        walls[name] = round(time.time() - t0, 1)
        print(f"  ran {name}: {walls[name]}s")
    spark.sparkContext.setJobGroup("tear", "tear")
    spark.stop()

    stage_group: dict[int, str] = {}
    agg: dict[str, dict[str, int]] = {
        n: {"sw_rows": 0, "sw_bytes": 0, "sr_rows": 0, "in_bytes": 0}
        for n in QUERIES}
    paths = [p for p in glob.glob(os.path.join(EVLOG, "**", "*"),
                                  recursive=True)
             if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
             and not p.endswith(".crc")]
    for path in paths:
        with open(path) as f:
            for line in f:
                ev = json.loads(line)
                et = ev.get("Event")
                if et == "SparkListenerJobStart":
                    grp = (ev.get("Properties") or {}).get(
                        "spark.jobGroup.id")
                    for sid in ev.get("Stage IDs", []):
                        stage_group[sid] = grp
                elif et == "SparkListenerTaskEnd":
                    grp = stage_group.get(ev.get("Stage ID"))
                    if grp not in agg:
                        continue
                    tm = ev.get("Task Metrics") or {}
                    sw = tm.get("Shuffle Write Metrics") or {}
                    sr = tm.get("Shuffle Read Metrics") or {}
                    im = tm.get("Input Metrics") or {}
                    agg[grp]["sw_rows"] += sw.get("Shuffle Records Written", 0)
                    agg[grp]["sw_bytes"] += sw.get("Shuffle Bytes Written", 0)
                    agg[grp]["sr_rows"] += sr.get("Total Records Read", 0)
                    agg[grp]["in_bytes"] += im.get("Bytes Read", 0)
    for n in QUERIES:
        agg[n]["wall_sec"] = walls[n]
    return agg


# Worksheet predictions at sf10 parameters (N=500k docs, w̄~54.5 words;
# E=200k embeddings). Same formulas the sf1 pass validated, instantiated
# 10x up — a >2x divergence means a hidden superlinear term.
W_MEAN = 54.5
PRED = {
    "dedup_minhash_lsh": ("~8N band keys", 8 * N_DOCS),
    "dedup_repeated_substrings": ("~2·N·(w̄−7) window keys",
                                  int(2 * N_DOCS * (W_MEAN - 7))),
    # capped semdedup: E assignment rows through the phase-1 rank
    # exchange + E through the final vec_id join alignment + small
    # kept/drops sides — ~2E with embedding payload dominating bytes.
    "dedup_semdedup_capped": ("~2E rank+join rows", 2 * N_EMB),
}


def main() -> None:
    if "--skip-gen" not in sys.argv or not os.path.exists(
            os.path.join(SF10, "documents.parquet")):
        generate()
    agg = run_and_measure()
    print(f"\n{'query':32} {'wall':>6} {'sw_rows':>12} {'predicted':>12} "
          f"{'ratio':>6}  model")
    out = {}
    for n in QUERIES:
        a = agg[n]
        label, pred = PRED[n]
        ratio = a["sw_rows"] / pred if pred else float("nan")
        out[n] = {**a, "predicted": pred, "ratio": round(ratio, 2)}
        print(f"{n:32} {a['wall_sec']:>5}s {a['sw_rows']:>12,} "
              f"{pred:>12,} {ratio:>6.2f}  {label}")
    with open(os.path.join(REPO, ".scratch", "sf10_rehearsal.json"),
              "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
