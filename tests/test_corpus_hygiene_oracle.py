"""Corpus-hygiene family (decontamination, repetition, boilerplate,
temperature mix) + the new graph/robust-stats queries vs their DuckDB
oracles, plus semantic spot-checks the value hash can't express."""

from __future__ import annotations

import pytest

from hadoop_digit_recognition_spark.all_queries import ORACLE_SQL, SPARK_QUERIES

from .conftest import SF_ORACLE
from .oracle_harness import compare

NEW = [
    "corpus_decontamination",
    "text_repetition_rates",
    "dedup_boilerplate_ngrams",
    "corpus_temperature_mix",
    "graph_bfs_hops",
    "events_anomaly_mad",
    "timeseries_ohlc_resample",
    "agg_mode_exact",
    "not_in_null_semantics",
    "pipeline_corpus_hygiene",
    "histogram_equi_depth",
    "feature_target_encode_loo",
    "feature_hashing_trick",
    "pipeline_corpus_release",
    "pipeline_release_manifest",
    "corpus_decontamination_semantic_lsh",
]


@pytest.mark.parametrize("name", NEW)
def test_vs_duckdb(spark, duck, name):
    compare(SPARK_QUERIES[name](spark, SF_ORACLE), duck,
            ORACLE_SQL[name], name)


def test_release_pipeline_accounting_invariants(spark):
    """Structural audit of the composed release chain: rung arithmetic
    closes (n_out = n_in - n_removed), the chain is CONTIGUOUS (each
    rung's n_in equals the previous rung's n_out except the pack rung's
    unit change), every rung is monotone non-increasing in docs, and the
    pack rung's token mass is exactly n_out full sequences."""
    rows = {r.rung: r for r in SPARK_QUERIES["pipeline_corpus_release"](
        spark, SF_ORACLE).collect()}
    assert sorted(rows) == list(range(1, 11))
    for k in range(1, 10):  # pack (rung 10) changes the n_out unit
        r = rows[k]
        assert r.n_out == r.n_in - r.n_removed, r
        assert r.n_removed >= 0, r
        if k > 1:
            assert r.n_in == rows[k - 1].n_out, (r, rows[k - 1])
    pack = rows[10]
    assert pack.n_in == rows[9].n_out
    assert pack.tokens_out == pack.n_out * 512
    assert pack.tokens_out <= rows[9].tokens_out
    # the mix quota must BIND on the driver fixture (the cap-binds
    # convention): some docs removed, and the release is budget-bounded
    assert rows[8].n_removed > 0
    assert rows[8].n_out <= 100
    # the r10 rungs sit in production order (gopher -> blocklist ->
    # quality -> exact) and actually fire on the fixture: the blocklist
    # terms hit the synthetic corpus, and the distilled filter smooths
    # the gopher boundary (both gates live, neither annihilates)
    stages = {r.rung: r.stage for r in rows.values()}
    assert stages[2] == "blocklist" and stages[3] == "quality"
    assert rows[2].n_removed > 0, "blocklist gate never fired"
    assert rows[3].n_out > 0, "quality gate annihilated the corpus"
    # the rank cut must BITE (bottom decile pruned) without being able
    # to annihilate: ceil(9/10 * n_in) kept by construction
    assert rows[3].n_removed > 0, "quality gate never fired"
    assert rows[3].n_out >= (rows[3].n_in * 9) // 10


def test_release_manifest_consistent_with_accounting(spark):
    """The manifest IS the released set: row count equals the mix rung's
    n_out, curriculum ranks are the contiguous 1..n total order, seq_id
    is non-decreasing in rank, and the manifest's token mass equals the
    accounting's released tokens."""
    acc = {r.stage: r for r in SPARK_QUERIES["pipeline_corpus_release"](
        spark, SF_ORACLE).collect()}
    man = sorted(SPARK_QUERIES["pipeline_release_manifest"](
        spark, SF_ORACLE).collect(), key=lambda r: r.crank)
    assert len(man) == acc["mix"].n_out
    assert [r.crank for r in man] == list(range(1, len(man) + 1))
    assert sum(r.n_tokens for r in man) == acc["mix"].tokens_out
    diffs = [r.difficulty_micro for r in man]
    assert diffs == sorted(diffs), "curriculum order violated"
    seqs = [r.seq_id for r in man]
    assert seqs == sorted(seqs), "pack attribution not monotone in rank"
    # seq_id is exactly the concat-then-chunk attribution: recompute the
    # running prefix sum over curriculum order and check every row (a
    # doc starts in sequence floor(prev_tokens / 512))
    prev = 0
    for r in man:
        assert r.seq_id == prev // 512, r
        prev += r.n_tokens


def test_release_monotone_in_budget(spark):
    """RELEASE MONOTONICITY: shrinking the release budget must produce a
    SUBSET of the larger release (per source, quota_s = floor(w_s * B)
    is monotone in B and the hash-ranked selection takes a prefix, so
    budget-50 docs are nested inside budget-100 docs). The operational
    property a release pipeline needs for reproducible down-scoping —
    a smaller re-release never introduces documents the bigger one
    vetted out."""
    from hadoop_digit_recognition_spark.operators.corpus_hygiene import (
        _release_chain)

    small = {r.doc_id for r in _release_chain(
        spark, SF_ORACLE, budget=50)["s6"].collect()}
    large = {r.doc_id for r in _release_chain(
        spark, SF_ORACLE, budget=100)["s6"].collect()}
    assert 0 < len(small) < len(large)
    assert small <= large, sorted(small - large)[:5]


def test_decontamination_excludes_benchmark_docs(spark):
    """No benchmark doc may appear in the output, and hits are bounded
    by the doc's own gram count."""
    rows = SPARK_QUERIES["corpus_decontamination"](spark, SF_ORACLE).collect()
    assert rows
    assert all(r["doc_id"] % 97 != 0 for r in rows)
    assert all((r["n_hits"] > 0) == r["contaminated"] for r in rows)


def test_repetition_rates_bounds(spark):
    rows = SPARK_QUERIES["text_repetition_rates"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0 < r["top_bigram_frac"] <= 1
        assert 0 <= r["dup_trigram_frac"] <= 1


def test_boilerplate_fraction_consistent(spark):
    rows = SPARK_QUERIES["dedup_boilerplate_ngrams"](spark, SF_ORACLE).collect()
    assert rows
    assert any(r["n_boiler"] > 0 for r in rows)  # corpus has shared trigrams
    assert all(0 <= r["n_boiler"] <= r["n_grams"] for r in rows)


def test_temperature_mix_sums_to_one(spark):
    rows = SPARK_QUERIES["corpus_temperature_mix"](spark, SF_ORACLE).collect()
    assert abs(sum(r["mix_weight"] for r in rows) - 1.0) < 1e-4
    assert sum(r["expected_docs"] for r in rows) <= 10_000  # floor never overshoots


def test_bfs_source_is_zero_hops(spark):
    rows = {r["node"]: r["hops"]
            for r in SPARK_QUERIES["graph_bfs_hops"](spark, SF_ORACLE).collect()}
    assert rows[0] == 0
    assert all(h >= 0 for h in rows.values())


def test_anomaly_mad_counts_bounded(spark):
    rows = SPARK_QUERIES["events_anomaly_mad"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_anomalies"] <= r["n"]
        assert r["mad"] >= 0


def test_ohlc_invariants(spark):
    rows = SPARK_QUERIES["timeseries_ohlc_resample"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["n_ticks"] >= 1


def test_not_in_null_semantics_diverge(spark):
    """The whole point: NOT IN over a null-bearing subquery returns 0
    rows; the null-filtered and NOT EXISTS forms return more."""
    r = SPARK_QUERIES["not_in_null_semantics"](spark, SF_ORACLE).first()
    assert r["not_in_with_null"] == 0
    assert r["not_exists_count"] > 0
    assert r["not_in_null_filtered"] > 0
    assert r["not_exists_count"] >= r["not_in_null_filtered"]


def test_hygiene_pipeline_accounting(spark):
    rows = SPARK_QUERIES["pipeline_corpus_hygiene"](spark, SF_ORACLE).collect()
    assert rows
    w = 0.0
    for r in rows:
        assert r["n_kept"] <= r["n_total"]
        assert r["n_contaminated"] <= r["n_total"]
        w += r["kept_mix_weight"]
    assert abs(w - 1.0) < 1e-3  # some tokens survive at every SF probed


def test_equi_depth_buckets_balanced(spark):
    """ntile guarantee: bucket sizes differ by at most 1, buckets tile
    the value range in order, rows total the input."""
    from hadoop_digit_recognition_spark.tables import load

    rows = sorted(SPARK_QUERIES["histogram_equi_depth"](spark, SF_ORACLE)
                  .collect(), key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == list(range(1, 11))
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1
    total = load(spark, SF_ORACLE, "events").count()
    assert sum(sizes) == total
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo + 1e-9


def test_target_encode_loo_excludes_self(spark):
    """Recompute one category driver-side: every row's encoding must be
    (category sum - own value) / (n - 1), never the plain category mean
    (the leakage the LOO form exists to prevent)."""
    from pyspark.sql import functions as F

    from hadoop_digit_recognition_spark.tables import load

    ev = (load(spark, SF_ORACLE, "events")
          .filter(F.col("event_type") == "click")
          .select("event_id", "value").collect())
    s = sum(r.value for r in ev)
    n = len(ev)
    got = {r.event_id: r.te for r in
           SPARK_QUERIES["feature_target_encode_loo"](spark, SF_ORACLE)
           .filter(F.col("event_type") == "click").collect()}
    assert len(got) == n
    for r in ev[:50]:
        assert abs(got[r.event_id] - (s - r.value) / (n - 1)) < 1e-4


def test_hashing_trick_conserves_tokens(spark):
    """Buckets lie in [0, 32) and per-doc bucket counts sum to the
    doc's token count (nothing dropped by the hash)."""
    from pyspark.sql import functions as F

    from hadoop_digit_recognition_spark.tables import load

    out = SPARK_QUERIES["feature_hashing_trick"](spark, SF_ORACLE)
    mm = out.agg(F.min("bucket"), F.max("bucket")).collect()[0]
    assert 0 <= mm[0] and mm[1] < 32
    per_doc = {r.doc_id: r.s for r in
               out.groupBy("doc_id").agg(F.sum("n").alias("s")).collect()}
    ntok = F.size(F.filter(F.split(F.lower(F.col("text")), " "),
                           lambda x: x != ""))
    truth = {r.doc_id: r.t for r in
             (load(spark, SF_ORACLE, "documents")
              .select("doc_id", ntok.alias("t")).collect())}
    for d, t in truth.items():
        if t > 0:
            assert per_doc[d] == t, d


def test_semantic_lsh_sound_and_recalls(spark):
    """The banded-LSH decontam pass is SOUND (every flagged vector is
    flagged by the exact brute-force pass — candidates are
    exact-verified at the same threshold, so no false positives are
    possible) and recalls a usable fraction of the exact pass's
    contaminated set (the L=4 x r=4 S-curve predicts ~50% at the
    cos 0.4 threshold; assert a conservative floor). Candidate max_cos
    never exceeds the exact max_cos."""
    exact = {r.vec_id: (r.max_cos, r.contaminated) for r in
             SPARK_QUERIES["corpus_decontamination_semantic"](
                 spark, SF_ORACLE).collect()}
    lsh = {r.vec_id: (r.max_cos, r.contaminated) for r in
           SPARK_QUERIES["corpus_decontamination_semantic_lsh"](
               spark, SF_ORACLE).collect()}
    exact_flagged = {v for v, (_, c) in exact.items() if c}
    lsh_flagged = {v for v, (_, c) in lsh.items() if c}
    assert lsh_flagged <= exact_flagged, sorted(lsh_flagged
                                                - exact_flagged)[:5]
    assert exact_flagged, "fixture lost its contaminated vectors"
    recall = len(lsh_flagged) / len(exact_flagged)
    assert recall >= 0.3, f"banded recall collapsed: {recall:.2f}"
    for v, (mc, _) in lsh.items():
        assert mc <= exact[v][0] + 1e-9, (v, mc, exact[v][0])
