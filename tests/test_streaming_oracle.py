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
    "streaming_foreachbatch_upsert",
    "streaming_sliding_complete",
    "streaming_dedup_dropduplicates",
    "streaming_dedup_watermark",
    "streaming_dedup_then_tumbling",
    "streaming_psi_drift",
    "streaming_static_join",
    "streaming_stream_stream_left_outer",
    "streaming_restart_recovery",
    "streaming_stream_stream_full_outer",
    "streaming_stateful_rocksdb",
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


def test_streaming_parquet_sink_parity(spark):
    """File sink: stream the events through a parquet writeStream
    (availableNow, append) and re-read — row set must equal the staged
    source exactly (exactly-once file sink via the commit log)."""
    import os
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from hadoop_digit_recognition_spark.streaming.pipeline import events_stream
    from hadoop_digit_recognition_spark.tables import load

    base = os.path.join(tempfile.gettempdir(), "hdr_pq_sink", uuid.uuid4().hex)
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    sdf = events_stream(spark, "/root/testdata/sf0.01").select(
        "event_id", "ts_us", "user_id", "event_type", "value")
    q = (sdf.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination(300)
    finally:
        q.stop()
    got = spark.read.parquet(out)
    src = load(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "ts_us", "user_id", "event_type", "value")
    assert got.count() == src.count()
    assert got.exceptAll(src).count() == 0
    assert src.exceptAll(got).count() == 0


def test_stream_stream_join_vs_duckdb(spark, duck):
    from hadoop_digit_recognition_spark.all_queries import ORACLE_SQL as OS
    df = SPARK_QUERIES["streaming_stream_stream_join"](spark, SF_ORACLE)
    compare(df, duck, OS["streaming_stream_stream_join"],
            "streaming_stream_stream_join")


def test_foreachbatch_upsert_parity(spark):
    """foreachBatch — the arbitrary-sink API: update-mode per-user counts
    upserted into driver state per micro-batch; the final keyed state
    must equal the batch aggregation (the merge-into-a-store pattern
    every production streaming sink uses)."""
    import os
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from hadoop_digit_recognition_spark.streaming.pipeline import events_stream
    from hadoop_digit_recognition_spark.tables import load

    from hadoop_digit_recognition_spark.streaming.pipeline import (
        run_foreachbatch_upsert,
    )

    sdf = events_stream(spark, "/root/testdata/sf0.01")
    agg = sdf.groupBy("user_id").count()
    state = run_foreachbatch_upsert(agg, "user_id", "count")

    expected = {r["user_id"]: r["n"] for r in
                load(spark, "/root/testdata/sf0.01", "events")
                .groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
                .collect()}
    assert state == expected


def _protobuf_healthy() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _protobuf_healthy(),
                    reason="transformWithState's state-server protocol "
                           "needs google.protobuf, broken in this container")
def test_transform_with_state_matches_batch(spark):
    """Spark 4 transformWithStateInPandas per-user (count, sum) state:
    the last update per user must equal the batch aggregate (same
    contract the applyInPandasWithState twin verifies via its oracle)."""
    from pyspark.sql import functions as F

    from hadoop_digit_recognition_spark.streaming.pipeline import (
        events_stream, run_to_memory, running_user_stats_tws)
    from hadoop_digit_recognition_spark.tables import load

    from .conftest import SF_ORACLE

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state."
                        "RocksDBStateStoreProvider")
    try:
        ev = events_stream(spark, SF_ORACLE)
        updates = run_to_memory(running_user_stats_tws(ev), "update")
        got = {r["user_id"]: (r["n_events"], round(r["sum_value"], 4))
               for r in (updates.groupBy("user_id")
                         .agg(F.max("n_events").alias("n_events"),
                              F.max_by("sum_value", "n_events")
                              .alias("sum_value")).collect())}
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    want = {r["user_id"]: (r["n"], round(r["s"], 4))
            for r in (load(spark, SF_ORACLE, "events")
                      .groupBy("user_id")
                      .agg(F.count(F.lit(1)).alias("n"),
                           F.sum("value").alias("s")).collect())}
    assert got == want
