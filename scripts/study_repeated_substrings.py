"""Variant study for dedup_repeated_substrings (VERDICT r05 ask #2).

Four plans for the hot-window `dup` stage, timed min-of-N in one tuned
engine session at $SPARK_GRAFT_SF_DIR (default sf0.1):

  A committed   groupBy(wkey).count_distinct(doc_id) >= 2, join back
  B minmax      groupBy(wkey).agg(min(doc_id) < max(doc_id)), join back
                — semantics-identical (distinct docs >= 2 iff min < max),
                but min/max combine map-side where count_distinct expands
                to a (wkey, doc_id)-grain shuffle
  C window      min/max over Window.partitionBy(wkey) — one shuffle, no
                join-back, but NO partial aggregation on hot keys
  D dfcap       B plus a stop-window document-frequency cap (windows in
                > K docs dropped before the join-back) — SEMANTICS-
                CHANGING scale knob, the _WIN_DF_CAP precedent

A/B/C results are asserted identical; D is reported with its row delta.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hadoop_digit_recognition_spark.session import get_spark
from hadoop_digit_recognition_spark.tables import load_parallel
from hadoop_digit_recognition_spark.operators.dedup import SUB_W

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEAT = int(sys.argv[sys.argv.index("--repeat") + 1]) if "--repeat" in sys.argv else 3
DF_CAP = 50

spark = get_spark("substr-study")
spark.sparkContext.setLogLevel("ERROR")


def seg_frame():
    docs = load_parallel(spark, SF, "documents")
    base = docs.select("doc_id", F.split("text", " ").alias("ws"))
    n = F.size("ws")
    wc = base.select("doc_id", n.cast("bigint").alias("n_words"))
    starts = F.when(n >= SUB_W, F.sequence(F.lit(0), (n - SUB_W).cast("int"))
                    ).otherwise(F.expr("cast(array() as array<int>)"))
    seg = base.select(
        "doc_id",
        F.posexplode(F.transform(
            starts,
            lambda s: F.sha2(F.concat_ws(
                " ", F.slice(F.col("ws"), s + 1, SUB_W)), 256)))
        .alias("s", "wkey"))
    return wc, seg


def finish(wc, hits):
    wlag = W.partitionBy("doc_id").orderBy("s")
    h = (hits
         .withColumn("prev", F.lag("s").over(wlag))
         .withColumn("brk", F.when(
             F.col("prev").isNull()
             | (F.col("s") - F.col("prev") > SUB_W), 1).otherwise(0))
         .withColumn("g", F.sum("brk").over(
             wlag.rowsBetween(W.unboundedPreceding, 0))))
    spans = (h.groupBy("doc_id", "g")
             .agg((F.max("s") - F.min("s") + SUB_W).alias("len")))
    agg = (spans.groupBy("doc_id")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_dup_spans"),
                F.sum("len").cast("bigint").alias("n_dup_words")))
    return (wc.join(agg, "doc_id", "left")
            .select("doc_id", "n_words",
                    F.coalesce("n_dup_spans", F.lit(0)).cast("bigint")
                     .alias("n_dup_spans"),
                    F.coalesce("n_dup_words", F.lit(0)).cast("bigint")
                     .alias("n_dup_words"),
                    F.round(F.coalesce("n_dup_words", F.lit(0)) * 1.0
                            / F.col("n_words"), 6).alias("dup_frac")))


def variant_a():
    wc, seg = seg_frame()
    dup = (seg.groupBy("wkey")
           .agg(F.count_distinct("doc_id").alias("nd"))
           .filter(F.col("nd") >= 2).select("wkey"))
    return finish(wc, seg.join(dup, "wkey").select("doc_id", "s"))


def variant_b():
    wc, seg = seg_frame()
    dup = (seg.groupBy("wkey")
           .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
           .filter(F.col("mn") < F.col("mx")).select("wkey"))
    return finish(wc, seg.join(dup, "wkey").select("doc_id", "s"))


def variant_c():
    wc, seg = seg_frame()
    wk = W.partitionBy("wkey")
    hits = (seg
            .withColumn("mn", F.min("doc_id").over(wk))
            .withColumn("mx", F.max("doc_id").over(wk))
            .filter(F.col("mn") < F.col("mx"))
            .select("doc_id", "s"))
    return finish(wc, hits)


def variant_d():
    wc, seg = seg_frame()
    dup = (seg.groupBy("wkey")
           .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"),
                F.count_distinct("doc_id").alias("nd"))
           .filter((F.col("mn") < F.col("mx")) & (F.col("nd") <= DF_CAP))
           .select("wkey"))
    return finish(wc, seg.join(dup, "wkey").select("doc_id", "s"))


def canon(df):
    return sorted(tuple(r) for r in df.collect())


VARIANTS = {"A_committed_countdistinct": variant_a,
            "B_minmax_join": variant_b,
            "C_window_minmax": variant_c,
            "D_minmax_dfcap": variant_d}

results, times = {}, {}
for name, fn in VARIANTS.items():
    fn().count()  # warm (file listing, codegen)
    best = float("inf")
    for _ in range(REPEAT):
        t0 = time.time()
        rows = canon(fn())
        best = min(best, time.time() - t0)
    results[name], times[name] = rows, best
    print(f"{name}: {best:.3f}s  ({len(rows)} rows)")

assert results["A_committed_countdistinct"] == results["B_minmax_join"], "A != B"
assert results["A_committed_countdistinct"] == results["C_window_minmax"], "A != C"
nd = sum(1 for a, d in zip(results["A_committed_countdistinct"],
                           results["D_minmax_dfcap"]) if a != d)
print(f"A==B==C verified identical; D diverges on {nd} rows "
      f"(expected: df-cap drops boilerplate windows)")
