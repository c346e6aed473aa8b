#!/usr/bin/env python
"""Profile registered queries with the Spark event log: counts of jobs,
stages and tasks plus summed task metrics (executor run/CPU time, GC,
shuffle bytes) — structural evidence that is robust to the sandbox's
minute-scale wall-clock weather (OPTIMIZATION_r11.md's measurement
appendix).

Usage: python scripts/profile_query.py q1,q2,... [--cold]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    evdir = "/tmp/hdr_evlog"
    os.makedirs(evdir, exist_ok=True)
    import shutil
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hadoop_digit_recognition_spark.session import get_spark as _gs
    import hadoop_digit_recognition_spark.session as _sess
    builder_extra = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
    }
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("hdr-profile")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             .config(
                 "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                 "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEM", "8g"))
             .config("spark.ui.enabled", "false")
             .config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.dir", evdir)
             .config("spark.eventLog.compress", "false")
             .config("spark.eventLog.rolling.enabled", "false")
             .getOrCreate())
    _ = (_gs, _sess, builder_extra)
    spark.sparkContext.setLogLevel("ERROR")
    from hadoop_digit_recognition_spark.operators.dedup import (
        clear_signature_cache,
    )

    # warmup (mirrors bench.py)
    SPARK_QUERIES["scan_filter_project"](spark, sf_dir).write.format(
        "noop").mode("overwrite").save()

    marks = {}
    for name in names:
        clear_signature_cache(spark)
        spark.sparkContext.setJobDescription(f"PROFILE:{name}")
        t0 = time.perf_counter()
        df = SPARK_QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        marks[name] = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
    spark.stop()

    # parse the event log
    log = sorted(glob.glob(evdir + "/*"))[-1]
    if os.path.isdir(log):
        inner = [f for f in glob.glob(log + "/events_*")] or \
                [f for f in glob.glob(log + "/*") if os.path.isfile(f)
                 and "appstatus" not in f]
        log = sorted(inner)[-1]
    per = {n: dict(jobs=0, stages=0, tasks=0, run_ms=0, cpu_ms=0,
                   gc_ms=0, shuf_read=0, shuf_write=0, wall=marks[n])
           for n in names}
    stage_owner = {}
    cur = None
    with open(log) as f:
        for line in f:
            e = json.loads(line)
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                d = e.get("Properties", {}).get("spark.job.description", "")
                cur = d[8:] if d.startswith("PROFILE:") else None
                if cur in per:
                    per[cur]["jobs"] += 1
                    for s in e.get("Stage Infos", []):
                        stage_owner[s["Stage ID"]] = cur
            elif ev == "SparkListenerStageCompleted":
                sid = e["Stage Info"]["Stage ID"]
                o = stage_owner.get(sid)
                if o in per:
                    per[o]["stages"] += 1
                    per[o]["tasks"] += e["Stage Info"].get(
                        "Number of Tasks", 0)
            elif ev == "SparkListenerTaskEnd":
                o = stage_owner.get(e.get("Stage ID"))
                if o in per and e.get("Task Metrics"):
                    m = e["Task Metrics"]
                    per[o]["run_ms"] += m.get("Executor Run Time", 0)
                    per[o]["cpu_ms"] += m.get(
                        "Executor CPU Time", 0) // 1_000_000
                    per[o]["gc_ms"] += m.get("JVM GC Time", 0)
                    sr = m.get("Shuffle Read Metrics", {})
                    per[o]["shuf_read"] += (sr.get("Remote Bytes Read", 0)
                                            + sr.get("Local Bytes Read", 0))
                    sw = m.get("Shuffle Write Metrics", {})
                    per[o]["shuf_write"] += sw.get("Shuffle Bytes Written", 0)
    for n in names:
        p = per[n]
        print(f"{n}: wall={p['wall']:.2f}s jobs={p['jobs']} "
              f"stages={p['stages']} tasks={p['tasks']} "
              f"run={p['run_ms']/1000:.1f}s cpu={p['cpu_ms']/1000:.1f}s "
              f"gc={p['gc_ms']/1000:.1f}s "
              f"shufR={p['shuf_read']//1024}K shufW={p['shuf_write']//1024}K",
              flush=True)


if __name__ == "__main__":
    main()
