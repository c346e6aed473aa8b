"""Structured Streaming tests: oracle comparison for the registered
streaming queries plus batch-parity properties (the honest check that the
streaming operators compute the same answer as their batch twins)."""

from __future__ import annotations

import pytest

from hadoop_digit_recognition_spark.all_queries import ORACLE_SQL, SPARK_QUERIES

from .conftest import SF_ORACLE
from .oracle_harness import compare

STREAMING_QUERIES = [
    "streaming_tumbling_complete",
    "streaming_tumbling_append_watermark",
    "streaming_session_complete",
    "streaming_stateful_user_counts",
]


@pytest.mark.parametrize("name", STREAMING_QUERIES)
def test_streaming_vs_duckdb(spark, duck, name):
    df = SPARK_QUERIES[name](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL[name], name)


def test_streaming_complete_equals_batch(spark):
    """Unified-API parity: streaming complete-mode tumbling == batch
    window_tumbling, row for row."""
    batch = SPARK_QUERIES["window_tumbling"](spark, SF_ORACLE)
    stream = SPARK_QUERIES["streaming_tumbling_complete"](spark, SF_ORACLE)
    assert stream.exceptAll(batch).count() == 0
    assert batch.exceptAll(stream).count() == 0


def test_append_is_closed_subset_of_complete(spark):
    """Append-mode output must be a strict, watermark-defined subset of
    the complete result (late/open windows withheld)."""
    comp = SPARK_QUERIES["streaming_tumbling_complete"](spark, SF_ORACLE)
    app = SPARK_QUERIES["streaming_tumbling_append_watermark"](spark, SF_ORACLE)
    n_comp, n_app = comp.count(), app.count()
    assert 0 < n_app < n_comp
    assert app.exceptAll(comp).count() == 0
