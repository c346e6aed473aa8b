"""Measure dedup_minhash_lsh_capped on the sf10 fixture (500k docs) with
event-log shuffle rows, against the uncapped run recorded in SCALE.md's
round-7 sf10 rehearsal (180.8s wall / 21.5M shuffle rows / 5.03M
candidates, dominated by one 800-doc mega-clique bucket)."""
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.path.join(REPO, ".scratch", "sf10")
EVLOG = os.path.join(REPO, ".scratch", "eventlog_capped")


def main() -> None:
    shutil.rmtree(EVLOG, ignore_errors=True)
    os.makedirs(EVLOG, exist_ok=True)
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("capped-lsh-sf10")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.driver.memory", "24g")
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

    clear_signature_cache(spark)
    spark.sparkContext.setJobGroup("capped", "capped")
    t0 = time.time()
    df = SPARK_QUERIES["dedup_minhash_lsh_capped"](spark, SF10)
    n_pairs = df.count()
    wall = time.time() - t0
    spark.stop()

    sw = 0
    stage_group = {}
    for path in glob.glob(os.path.join(EVLOG, "**", "*"), recursive=True):
        if not os.path.isfile(path) or path.endswith(".crc") \
                or "appstatus" in os.path.basename(path):
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
                    grp = (ev.get("Properties") or {}).get("spark.jobGroup.id")
                    for sid in ev.get("Stage IDs", []):
                        stage_group[sid] = grp
                elif ev.get("Event") == "SparkListenerTaskEnd":
                    if stage_group.get(ev.get("Stage ID")) != "capped":
                        continue
                    tm = ev.get("Task Metrics") or {}
                    swm = tm.get("Shuffle Write Metrics") or {}
                    sw += swm.get("Shuffle Records Written", 0)
    print(f"capped: wall={wall:.1f}s verified_pairs={n_pairs:,} "
          f"sw_rows={sw:,} (uncapped r07: 180.8s / 319,600 verified "
          f"incl. the C(800,2) clique / 21,548,517 sw rows)")


if __name__ == "__main__":
    main()
