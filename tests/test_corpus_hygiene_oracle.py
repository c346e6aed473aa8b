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
]


@pytest.mark.parametrize("name", NEW)
def test_vs_duckdb(spark, duck, name):
    compare(SPARK_QUERIES[name](spark, SF_ORACLE), duck,
            ORACLE_SQL[name], name)


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
