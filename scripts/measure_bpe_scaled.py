"""Measure the production-depth BPE trainer off the oracle fixture
(SCALE.md round-9; VERDICT r08 ask #7).

`text_bpe_merge_train_scaled` (256 checkpointed merge rounds) was
bounded by prefix/replay tests at sf0.01 (~17.6s). This runs the SAME
`_bpe_train_scaled` loop at sf0.1 (50k docs, the bench fixture) and at
the Spark-native sf1 fixture (.scratch/sf1 documents), recording

  - total wall and rounds completed (the loop early-stops when no pair
    repeats — vocabulary exhaustion is data-dependent);
  - per-round wall stats (mean / p50 / max, and the first-round cost
    that carries the corpus-sized initial word count);
  - checkpoint-round vs plain-round cost (every {_BPE_CKPT_EVERY}th
    round pays the localCheckpoint materialization);
  - word-state size (the model-state table every round shuffles).

The scale claim under test: after round 1, per-round cost is
VOCABULARY-sized (word-state pair counts + 1-row collect + narrow
replace), not corpus-sized — so per-round wall should grow far slower
than the 10x document step, and total wall ~ rounds x per-round +
one corpus scan.

Run: python scripts/measure_bpe_scaled.py
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.path.join(REPO, ".scratch")
FIXTURES = {"sf0.1": "/root/testdata/sf0.1",
            "sf1": os.path.join(SCRATCH, "sf1")}

from hadoop_digit_recognition_spark.session import get_spark

spark = get_spark("bpe-scaled-measure")
spark.sparkContext.setLogLevel("ERROR")

from hadoop_digit_recognition_spark.operators.text import (
    _BPE_CKPT_EVERY, _BPE_SCALED_ROUNDS, _bpe_train_scaled, _bpe_word_state)
from hadoop_digit_recognition_spark.tables import load_parallel

report = {}
for tag, sf in FIXTURES.items():
    if not os.path.isdir(sf):
        print(f"{tag}: fixture missing at {sf}, skipping")
        continue
    docs = load_parallel(spark, sf, "documents")
    n_docs = docs.count()
    n_words = _bpe_word_state(docs).count()

    marks = []
    t0 = time.time()
    merges, state = _bpe_train_scaled(
        docs, _BPE_SCALED_ROUNDS, on_round=lambda r: marks.append(time.time()))
    wall = time.time() - t0
    state.count()

    if not marks:  # round-1 early stop: no pair ever repeated
        report[tag] = {"n_docs": n_docs, "n_word_types": n_words,
                       "rounds_completed": 0, "wall_s": round(wall, 1)}
        print(tag, json.dumps(report[tag]), flush=True)
        continue
    durs = [marks[0] - t0] + [b - a for a, b in zip(marks, marks[1:])]
    ckpt = [d for i, d in enumerate(durs, 1) if i % _BPE_CKPT_EVERY == 0]
    plain = [d for i, d in enumerate(durs, 1)
             if i % _BPE_CKPT_EVERY != 0 and i > 1]
    report[tag] = {
        "n_docs": n_docs, "n_word_types": n_words,
        "rounds_completed": len(merges), "wall_s": round(wall, 1),
        "round1_s": round(durs[0], 2),
        "round_mean_s": round(statistics.mean(durs[1:]), 3) if len(durs) > 1
                        else None,
        "round_p50_s": round(statistics.median(durs[1:]), 3)
                       if len(durs) > 1 else None,
        "round_max_s": round(max(durs[1:]), 3) if len(durs) > 1 else None,
        "ckpt_round_mean_s": round(statistics.mean(ckpt), 3) if ckpt else None,
        "plain_round_mean_s": round(statistics.mean(plain), 3)
                              if plain else None,
        "last_merge_count": merges[-1][3] if merges else None,
    }
    print(tag, json.dumps(report[tag]), flush=True)
    spark.catalog.clearCache()

out = os.path.join(SCRATCH, "bpe_scaled_measure.json")
with open(out, "w") as f:
    json.dump(report, f, indent=1)
print("wrote", out)
spark.stop()
