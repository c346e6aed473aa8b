"""Classification-pipeline tests: the centroid classifier against the
DuckDB oracle; MLlib estimators (rows-only contract) for schema, row
count, and sane accuracy on the synthetic labels."""

from __future__ import annotations

import pytest

from hadoop_digit_recognition_spark.all_queries import ORACLE_SQL, SPARK_QUERIES

from .conftest import SF_ORACLE
from .oracle_harness import compare

EXPECTED_SCHEMA = ["label", "n_test", "n_correct", "accuracy"]


def test_ml_centroid_vs_duckdb(spark, duck):
    df = SPARK_QUERIES["ml_centroid_classifier"](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL["ml_centroid_classifier"],
            "ml_centroid_classifier")


@pytest.mark.parametrize("name", ["ml_logreg_eval", "ml_mlp_eval",
                                  "ml_dbn_logreg_eval"])
def test_mllib_eval_shape(spark, name):
    rows = SPARK_QUERIES[name](spark, SF_ORACLE).collect()
    assert [f for f in rows[0].asDict()] == EXPECTED_SCHEMA
    assert 1 <= len(rows) <= 10
    total = sum(r["n_test"] for r in rows)
    correct = sum(r["n_correct"] for r in rows)
    assert total == 100  # sf0.01: 500 vectors, vec_id % 5 == 0 holds for 100
    # the synthetic labels are uncorrelated with the embeddings (random-guess
    # floor ~10%), so assert structure, not skill: counts consistent and
    # every per-label accuracy well-formed
    assert 0 <= correct <= total
    assert all(0.0 <= r["accuracy"] <= 1.0 for r in rows)


def test_deterministic_split_disjoint_total(spark):
    from hadoop_digit_recognition_spark.ml.pipeline import deterministic_split
    from hadoop_digit_recognition_spark.tables import load
    emb = load(spark, SF_ORACLE, "embeddings")
    train, test = deterministic_split(emb)
    n, ntr, nte = emb.count(), train.count(), test.count()
    assert ntr + nte == n
    assert train.join(test, "vec_id").count() == 0


def test_mllib_minhash_agrees_with_handrolled(spark):
    """The MLlib MinHashLSH twin must recover (nearly) every verified
    duplicate pair the hand-rolled banded LSH finds: its OR-amplified
    candidate set is a superset of the banded one, and both verify with
    exact Jaccard at the same threshold — only 2^-18-rate HashingTF
    collisions can perturb the verified set."""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES

    hand = {(r["doc_a"], r["doc_b"])
            for r in SPARK_QUERIES["dedup_minhash_lsh"](spark, SF_ORACLE).collect()}
    mllib = {(r["doc_a"], r["doc_b"])
             for r in SPARK_QUERIES["dedup_minhash_mllib"](spark, SF_ORACLE).collect()}
    assert hand, "hand-rolled LSH found no pairs — fixture broken"
    recall = len(hand & mllib) / len(hand)
    assert recall >= 0.9, (recall, hand - mllib)


def test_mllib_brp_recall_vs_exact(spark):
    """BucketedRandomProjectionLSH top-k on unit-normalized vectors must
    recover a solid fraction of the exact cosine top-k (same grading as
    the hand-rolled IVF: >= 0.5 asserted with margin)."""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES

    exact = SPARK_QUERIES["sim_topk_cosine"](spark, SF_ORACLE).collect()
    brp = SPARK_QUERIES["sim_ann_mllib_brp"](spark, SF_ORACLE).collect()
    ex: dict[int, set] = {}
    for r in exact:
        ex.setdefault(r["qid"], set()).add(r["cid"])
    got: dict[int, set] = {}
    for r in brp:
        got.setdefault(r["qid"], set()).add(r["cid"])
    recalls = [len(ex[q] & got.get(q, set())) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.5, sum(recalls) / len(recalls)


def test_ml_kmeans_lloyd_vs_duckdb(spark, duck):
    df = SPARK_QUERIES["ml_kmeans_lloyd_2iter"](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL["ml_kmeans_lloyd_2iter"],
            "ml_kmeans_lloyd_2iter")


def test_ml_kmeans_partitions_all_vectors(spark):
    """Cluster sizes sum to the corpus and every cluster is non-empty
    (seeding from real vectors guarantees each seed owns itself)."""
    rows = SPARK_QUERIES["ml_kmeans_lloyd_2iter"](spark, SF_ORACLE).collect()
    from hadoop_digit_recognition_spark.tables import load
    total = load(spark, SF_ORACLE, "embeddings").count()
    assert sum(r.n for r in rows) == total
    assert all(r.n > 0 for r in rows)


def test_ml_logreg_gd_vs_duckdb(spark, duck):
    df = SPARK_QUERIES["ml_logreg_gd_2iter"](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL["ml_logreg_gd_2iter"],
            "ml_logreg_gd_2iter")


def test_ml_logreg_gd_loss_decreases(spark):
    """Two GD steps must reduce the training log-loss vs w=0 (whose loss
    is exactly log 2) — the sanity check that the update direction and
    scale are right, not just oracle-replayable."""
    import math

    import numpy as np

    from hadoop_digit_recognition_spark.tables import load

    w = {r.i: r.w for r in
         SPARK_QUERIES["ml_logreg_gd_2iter"](spark, SF_ORACLE).collect()}
    rows = (load(spark, SF_ORACLE, "embeddings")
            .select("embedding", "label").collect())
    wv = np.array([w[i] for i in range(len(w))])
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    y = np.array([1.0 if r.label == 0 else 0.0 for r in rows])
    p = 1.0 / (1.0 + np.exp(-(X @ wv)))
    loss = -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
    assert loss < math.log(2), loss


def test_ml_naive_bayes_vs_duckdb(spark, duck):
    df = SPARK_QUERIES["ml_naive_bayes_langid"](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL["ml_naive_bayes_langid"],
            "ml_naive_bayes_langid")


def test_ml_naive_bayes_covers_every_test_doc(spark):
    """The confusion matrix must account for exactly the test docs that
    have >= 1 token — every doc gets one argmax prediction, none gets
    two (rn=1 is unique per doc)."""
    from pyspark.sql import functions as F

    from hadoop_digit_recognition_spark.tables import load

    rows = SPARK_QUERIES["ml_naive_bayes_langid"](spark, SF_ORACLE).collect()
    docs = load(spark, SF_ORACLE, "documents")
    n_test = (docs.filter((F.col("doc_id") % 5 == 0)
                          & (F.length(F.trim("text")) > 0)).count())
    assert sum(r.n for r in rows) == n_test
    # every true lang present in the test split appears as a row group
    langs = {r["lang"] for r in
             docs.filter(F.col("doc_id") % 5 == 0).select("lang").collect()}
    assert {r.true_lang for r in rows} == langs


def test_ml_decision_stump_vs_duckdb(spark, duck):
    df = SPARK_QUERIES["ml_decision_stump_gain"](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL["ml_decision_stump_gain"],
            "ml_decision_stump_gain")


def test_ml_decision_stump_gain_sane(spark):
    """Information gain is non-negative for every candidate split, every
    split partitions the full event set, and all 9 grid thresholds
    report."""
    from hadoop_digit_recognition_spark.tables import load

    rows = SPARK_QUERIES["ml_decision_stump_gain"](spark, SF_ORACLE).collect()
    assert len(rows) == 9
    total = load(spark, SF_ORACLE, "events").count()
    for r in rows:
        assert r.n_left + r.n_right == total
        assert r.info_gain >= -1e-9, r


def test_ml_kfold_cv_vs_duckdb(spark, duck):
    df = SPARK_QUERIES["ml_kfold_centroid_cv"](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL["ml_kfold_centroid_cv"],
            "ml_kfold_centroid_cv")


def test_ml_kfold_partitions_corpus(spark):
    """The five folds tile the corpus (n_test sums to the vector count,
    every fold non-empty) and per-fold accuracy is well-formed."""
    from hadoop_digit_recognition_spark.tables import load

    rows = SPARK_QUERIES["ml_kfold_centroid_cv"](spark, SF_ORACLE).collect()
    assert sorted(r.fold for r in rows) == [0, 1, 2, 3, 4]
    total = load(spark, SF_ORACLE, "embeddings").count()
    assert sum(r.n_test for r in rows) == total
    for r in rows:
        assert 0 < r.n_test
        assert 0.0 <= r.accuracy <= 1.0
        assert r.n_correct <= r.n_test


def test_isotonic_fit_is_monotone_and_pools(spark):
    """The PAV minimax fit must be (a) non-decreasing across bins by
    construction and (b) a genuine pooling: at least one adjacent-bin
    violation in the raw rates gets flattened to a shared fitted value
    on the events fixture (bins 1-3 and 4-9 pool there)."""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES

    from .conftest import SF_ORACLE

    rows = sorted(SPARK_QUERIES["ml_isotonic_pav"](spark, SF_ORACLE)
                  .collect(), key=lambda r: r["bin"])
    iso = [r["iso_rate"] for r in rows]
    raw = [r["raw_rate"] for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(iso, iso[1:])), iso
    assert any(a > b for a, b in zip(raw, raw[1:])), "fixture not noisy"
    assert len(set(iso)) < len(iso), "no pooling happened"


def test_gbm_rounds_improve_training_rmse(spark):
    """L2Boost sanity: each boosting round must strictly reduce the
    train RMSE, and round 2 must pick a DIFFERENT split than round 1
    (a re-picked split would mean the residual algebra is broken —
    round 1's split has zero residual signal left at its own
    threshold)."""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES

    from .conftest import SF_ORACLE

    rows = {r["round"]: r
            for r in SPARK_QUERIES["ml_gbm_ls_stumps"](
                spark, SF_ORACLE).collect()}
    assert rows[2]["rmse_after"] < rows[1]["rmse_after"]
    assert rows[1]["threshold"] != rows[2]["threshold"]


def test_quality_distill_vs_duckdb(spark, duck):
    compare(SPARK_QUERIES["ml_quality_classifier_distill"](spark, SF_ORACLE),
            duck, ORACLE_SQL["ml_quality_classifier_distill"],
            "ml_quality_classifier_distill")


def test_quality_distill_separates_classes(spark):
    """Two GD rounds must already learn the rule DIRECTION: scoring the
    corpus with the trained bucket weights, rule-kept documents average
    a strictly higher score than rule-dropped ones (an AUC-direction
    assertion — robust to the shallow trainer's small margins)."""
    from pyspark.sql import functions as F

    from hadoop_digit_recognition_spark.ml.queries import _QC_B
    from hadoop_digit_recognition_spark.operators.corpus_hygiene import (
        corpus_gopher_quality_rules)
    from hadoop_digit_recognition_spark.tables import load

    w = SPARK_QUERIES["ml_quality_classifier_distill"](spark, SF_ORACLE)
    docs = load(spark, SF_ORACLE, "documents")
    feat = (docs.select(
                "doc_id",
                F.explode(F.split(F.lower("text"), " ")).alias("word"))
            .filter(F.col("word") != "")
            .select("doc_id",
                    (F.conv(F.substring(F.md5("word"), 1, 8), 16, 10)
                     .cast("bigint") % _QC_B).alias("i"))
            .groupBy("doc_id", "i").agg(F.count(F.lit(1)).alias("c")))
    score = (feat.join(F.broadcast(w), "i").groupBy("doc_id")
             .agg(F.sum(F.col("c") * F.col("w")).alias("z")))
    labels = (corpus_gopher_quality_rules(spark, SF_ORACLE)
              .select("doc_id", "keep"))
    means = {int(r["keep"]): r["mz"] for r in
             (score.join(labels, "doc_id").groupBy("keep")
              .agg(F.avg("z").alias("mz")).collect())}
    assert means[1] > means[0], means


def test_learning_curve_nesting_invariants(spark):
    """Structural contract of the learning curve: training subsets are
    NESTED (n_train strictly increasing with the fraction), every row
    grades the SAME held-out set, the 100% row reconciles with
    ml_centroid_classifier's aggregate accuracy, and accuracies live on
    the exact integer grid. (The fixture's embeddings carry no label
    signal, so the VALUES sit at chance — like ml_auc_rank_sum's ~0.5;
    the operator is the measurement, not the signal.)"""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES

    from .conftest import SF_ORACLE

    rows = sorted(SPARK_QUERIES["ml_learning_curve"](
        spark, SF_ORACLE).collect(), key=lambda r: r["train_pct"])
    assert [r["train_pct"] for r in rows] == [25, 50, 100]
    ns = [r["n_train"] for r in rows]
    assert ns[0] < ns[1] < ns[2], ns
    assert len({r["n_eval"] for r in rows}) == 1
    for r in rows:
        assert 0 <= r["acc_e6"] <= 1000000
        assert r["acc_e6"] == (1000000 * r["n_correct"]) // r["n_eval"]
    cc = SPARK_QUERIES["ml_centroid_classifier"](
        spark, SF_ORACLE).collect()
    assert sum(r["n_correct"] for r in cc) == rows[-1]["n_correct"]
    assert sum(r["n_test"] for r in cc) == rows[-1]["n_eval"]
