"""sf1 scale rehearsal for the dedup/corpus family (VERDICT r05 ask #4).

SCALE.md's 100 TB sizing worksheet has been paper-only: its per-family
shuffle models (rows/bytes as functions of docs x tokens) were derived
from plan shapes, never measured. This script:

1. synthesizes a deterministic sf1 fixture (10x the driver's sf0.1:
   50,000 documents / 20,000 embeddings) that mirrors the driver
   testdata's measured statistics — 31-word vocab, uniform 10..100
   words/doc (mean 54), 5 langs at the observed mix, 20 sources,
   ~0.16% exact-dup rate — into .scratch/sf1/;
2. runs the 6 heaviest dedup/corpus queries under an EVENT-LOG-enabled
   session, one job group per query;
3. parses the event log's TaskEnd metrics into per-query shuffle
   write rows/bytes and compares them against the worksheet's
   predictions instantiated at sf1 parameters.

Run: python scripts/scale_rehearsal_sf1.py [--skip-gen]
"""
import glob
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".scratch", "sf1")
EVLOG = os.path.join(REPO, ".scratch", "eventlog")

N_DOCS = 50_000
N_EMB = 20_000
VOCAB = ['a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'dup',
         'fast', 'filter', 'group', 'hash', 'join', 'key', 'line', 'merge',
         'order', 'part', 'query', 'row', 'scan', 'slow', 'small', 'sort',
         'spark', 'stream', 'table', 'the', 'value', 'vector', 'window']
LANGS = ["en", "en", "zh", "fr", "es", "de"]  # ~2x en weight, as observed
DUP_EVERY = 625  # one exact dup per 625 docs ~ the observed 8/5000 rate

QUERIES = [
    "dedup_minhash_lsh",
    "dedup_repeated_substrings",
    "dedup_boilerplate_ngrams",
    "dedup_winnowing_pairs",
    "dedup_semantic_semdedup",
    "corpus_decontamination",
]


def _h(i: int, salt: str) -> int:
    return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:12], 16)


def generate() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(SF1, exist_ok=True)
    texts, langs, sources, n_chars = [], [], [], []
    for d in range(N_DOCS):
        if d % DUP_EVERY == DUP_EVERY - 1 and d >= DUP_EVERY:
            texts.append(texts[d - DUP_EVERY])  # exact duplicate
        else:
            n = 10 + _h(d, "len") % 91  # uniform 10..100
            words = [VOCAB[_h(d * 1000 + j, "w") % len(VOCAB)]
                     for j in range(n)]
            texts.append(" ".join(words))
        langs.append(LANGS[_h(d, "lang") % len(LANGS)])
        sources.append(f"src{d % 20}")
        n_chars.append(len(texts[-1]))
    pq.write_table(pa.table({
        "doc_id": pa.array(range(N_DOCS), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array(sources),
        "n_chars": pa.array(n_chars, pa.int64()),
    }), os.path.join(SF1, "documents.parquet"))

    rng = np.random.default_rng(20260814)
    emb = rng.normal(0.0, 0.123, size=(N_EMB, 64)).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(N_EMB), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array((rng.integers(0, 10, N_EMB)).astype("int32")),
    }), os.path.join(SF1, "embeddings.parquet"))
    print(f"generated {N_DOCS} docs / {N_EMB} embeddings -> {SF1}")


def run_and_measure() -> dict:
    import shutil

    shutil.rmtree(EVLOG, ignore_errors=True)
    os.makedirs(EVLOG, exist_ok=True)

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("sf1-rehearsal")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEM", "8g"))
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
        _force(SPARK_QUERIES[name](spark, SF1))
        walls[name] = round(time.time() - t0, 1)
        print(f"  ran {name}: {walls[name]}s")
    spark.sparkContext.setJobGroup("tear", "tear")
    spark.stop()

    # Parse the event log: JobStart maps stage ids -> job group; TaskEnd
    # carries per-task shuffle read/write metrics.
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


# Worksheet predictions instantiated at sf1 (N=50k docs, ~54 words/doc,
# 2.7M corpus words; E=20k 64-dim embeddings). Each entry: predicted
# total shuffle-WRITE rows across the query's exchanges + the formula.
W_MEAN = 54.14
PRED = {
    # sigs are narrow/memoized; shuffled rows = 8 band keys/doc into the
    # band equi-join + candidate pairs (~2% dup-ish) + CC rounds — band
    # rows dominate: ~8N. (Worksheet: "8 bands -> 8 rows/doc".)
    "dedup_minhash_lsh": ("~8N band keys", 8 * N_DOCS),
    # stride-1 windows: (w-7) rows/doc into the min/max agg (combiner
    # collapses per-map repeats; vocab^8 >> corpus so little collapse),
    # ~same volume again through the join-back probe, plus per-doc hit
    # rows into the doc-keyed window. Dominant: 2 x N(w-7).
    "dedup_repeated_substrings": ("~2·N·(w̄−7) window keys",
                                  int(2 * N_DOCS * (W_MEAN - 7))),
    # doc-bigrams: (w-1) rows/doc through the df agg + the same again
    # through the join-back = ~2·N·(w̄−1); SCALE.md boilerplate study.
    "dedup_boilerplate_ngrams": ("~2·N·(w̄−1) doc-bigrams",
                                 int(2 * N_DOCS * (W_MEAN - 1))),
    # winnowing (K=4, W=5): gram hashing + min-window stay per-doc;
    # shuffled rows = the per-doc window repartition (w̄−K+1 grams/doc)
    # + the selected-fingerprint set (density bound 2/(W+1) = 1/3 of
    # grams) through distinct + df + the two pair-join sides:
    # ~ N·(w̄−3) + 3·N·(w̄−3)/3 ≈ 2·N·(w̄−3).
    "dedup_winnowing_pairs": ("~2·N·(w̄−3) gram+fp rows",
                              int(2 * N_DOCS * (W_MEAN - 3))),
    # semdedup (16 deterministic cells): E embedding rows through the
    # cell-keyed shuffle, twice for the within-cell self-join sides,
    # plus survivors — ~3E rows (embedding payload dominates bytes).
    "dedup_semantic_semdedup": ("~3E cell rows", 3 * N_EMB),
    # decontamination (trigrams vs doc_id%97 eval set): eval-side gram
    # distinct = (N/97)·(w̄−2) rows; corpus side is broadcast-joined
    # (NARROW) and the per-doc hit count combines map-side to ~N rows.
    "corpus_decontamination": ("~N + (N/97)·(w̄−2) rows",
                               int(N_DOCS + N_DOCS / 97 * (W_MEAN - 2))),
}


def main() -> None:
    if "--skip-gen" not in sys.argv or not os.path.exists(
            os.path.join(SF1, "documents.parquet")):
        generate()
    agg = run_and_measure()
    print(f"\n{'query':32} {'wall':>6} {'sw_rows':>12} {'predicted':>12} "
          f"{'ratio':>6}  model")
    for n in QUERIES:
        a = agg[n]
        label, pred = PRED[n]
        ratio = a["sw_rows"] / pred if pred else float("nan")
        print(f"{n:32} {a['wall_sec']:>5}s {a['sw_rows']:>12,} "
              f"{pred:>12,} {ratio:>6.2f}  {label}")
        print(f"{'':32} {'':>6} sw={a['sw_bytes']/1e6:.1f}MB "
              f"sr_rows={a['sr_rows']:,} in={a['in_bytes']/1e6:.1f}MB")


if __name__ == "__main__":
    main()
