"""sf30-class winnowing demonstration (SCALE.md round-8 watch #2).

The sf10 extension measured dedup_winnowing_pairs' candidate term
growing quadratically on the saturating 31-word fixture (4-gram
universe fixed at ~654k fingerprints, mean df rising with N) and
predicted the stop-fingerprint cap (`_WIN_DF_CAP`=50) HALTS that
growth once the df distribution pushes past the cap: over-cap
fingerprints are dropped BEFORE the pair join, so the candidate term
is Sigma_{df<=cap} df^2 <= U*cap^2 by construction — and on a
saturating fixture it eventually FALLS, because fingerprints exit the
join as they cross the cap.

This script measures that halt: it generates 2x and 3x the sf10
fixture with the same recipe/seed discipline, computes the exact df
distribution and candidate term at each scale, runs the full query at
the sf30-class size under the event-log shuffle-row method, and
prints the measured-vs-model table for SCALE.md.

Run: python scripts/measure_winnowing_sf30.py
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
EVLOG = os.path.join(SCRATCH, "eventlog_win30")

VOCAB = ['a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'dup',
         'fast', 'filter', 'group', 'hash', 'join', 'key', 'line', 'merge',
         'order', 'part', 'query', 'row', 'scan', 'slow', 'small', 'sort',
         'spark', 'stream', 'table', 'the', 'value', 'vector', 'window']
DUP_EVERY = 625
SCALES = {"sf10": 500_000, "sf20": 1_000_000, "sf30": 1_500_000}
RUN_FULL_AT = "sf30"


def generate(tag: str, n_docs: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(SCRATCH, f"win_{tag}")
    path = os.path.join(out, "documents.parquet")
    if os.path.exists(path):
        return out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(20260815)
    lens = rng.integers(10, 101, n_docs)
    vocab = np.array(VOCAB)
    texts = []
    for d in range(n_docs):
        if d % DUP_EVERY == DUP_EVERY - 1 and d >= DUP_EVERY:
            texts.append(texts[d - DUP_EVERY])
        else:
            texts.append(" ".join(vocab[rng.integers(0, len(VOCAB),
                                                     lens[d])]))
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n_docs),
        "source": pa.array([f"src{d % 20}" for d in range(n_docs)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), path)
    print(f"generated {tag}: {n_docs} docs -> {out}", flush=True)
    return out


def main() -> None:
    shutil.rmtree(EVLOG, ignore_errors=True)
    os.makedirs(EVLOG, exist_ok=True)

    from pyspark.sql import SparkSession, functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("winnowing-sf30")
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

    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from hadoop_digit_recognition_spark.operators.text import (
        _WIN_DF_CAP, _winnow_selected)

    report = {}
    for tag, n_docs in SCALES.items():
        d = generate(tag, n_docs)
        fp = (_winnow_selected(spark, d)
              .select("doc_id", "fp_hash").distinct())
        dfh = fp.groupBy("fp_hash").agg(F.count(F.lit(1)).alias("df"))
        row = dfh.agg(
            F.count(F.lit(1)).alias("u"),
            F.round(F.avg("df"), 1).alias("mean_df"),
            F.max("df").alias("max_df"),
            F.sum(F.when(F.col("df") > _WIN_DF_CAP, 1).otherwise(0))
            .alias("n_over_cap"),
            F.sum(F.col("df") * F.col("df")).alias("sum_df2_uncapped"),
            F.sum(F.when(F.col("df") <= _WIN_DF_CAP,
                         F.col("df") * F.col("df")).otherwise(0))
            .alias("cand_term")).first()
        report[tag] = {k: (float(row[k]) if k == "mean_df" else int(row[k]))
                       for k in ("u", "mean_df", "max_df", "n_over_cap",
                                 "sum_df2_uncapped", "cand_term")}
        report[tag]["n_docs"] = n_docs
        print(tag, report[tag], flush=True)

    # full-query run at the sf30-class size with shuffle-row accounting
    name = "dedup_winnowing_pairs"
    spark.sparkContext.setJobGroup(name, name)
    t0 = time.time()
    SPARK_QUERIES[name](spark, os.path.join(SCRATCH, f"win_{RUN_FULL_AT}"))\
        .write.format("noop").mode("overwrite").save()
    wall = round(time.time() - t0, 1)
    spark.stop()

    stage_group, sw = {}, 0
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
                    if stage_group.get(ev.get("Stage ID")) == name:
                        m = (ev.get("Task Metrics") or {}).get(
                            "Shuffle Write Metrics") or {}
                        sw += m.get("Shuffle Records Written", 0)

    n = SCALES[RUN_FULL_AT]
    model = int(2 * n * (54.5 - 3)) + report[RUN_FULL_AT]["cand_term"]
    print(f"\n{RUN_FULL_AT} full run: wall={wall}s sw={sw:,} "
          f"model(2N(wbar-3)+cand)={model:,} ratio={sw / model:.2f}")
    report["full_run"] = {"scale": RUN_FULL_AT, "wall_s": wall,
                          "sw_rows": sw, "model_rows": model}
    out = os.path.join(SCRATCH, "winnowing_sf30.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
