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
