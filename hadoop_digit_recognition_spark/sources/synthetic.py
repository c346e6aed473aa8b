"""Custom Python DataSources (Spark 4 connector API), batch + streaming.

The reference's only source is a text-line scan (S1); a modern engine
also needs a CONNECTOR surface for systems Spark has no built-in reader
for. Spark 4's Python DataSource API is that surface: a DataSource
declares name/schema/reader, the batch reader declares its
InputPartitions (the unit of parallelism — one read() call per
partition, scheduled across executors), and the streaming reader tracks
offsets exactly like a Kafka consumer. Both sources here generate a
deterministic synthetic "sensor feed" whose every value derives from a
content hash, so a DuckDB oracle reproduces the emitted rows
bit-for-bit — the same determinism discipline as the engine's sampling
and minhash operators (functions/vector.det_hash64).

PICKLING CONTRACT: the DataSource classes are defined INSIDE the
factory functions, so cloudpickle serializes them BY VALUE. Spark runs
Python-data-source planning in separate Python processes that do not
inherit addPyFile paths (the streaming planner in particular); a
module-level class pickled by reference would hit
ModuleNotFoundError there whenever the engine package isn't on the
worker's import path. Everything the classes need is imported inside
their methods.

At 100 TB the partition list is the whole scale story: partitions()
returning N splits is what lets a thousand executors read
concurrently; a connector returning one partition serializes the
cluster behind one task (the same single-split trap TESTDATA's small
parquet files demonstrate — see SCALE.md "local-vs-cluster deltas").
"""

from __future__ import annotations

ROWS_PER_PARTITION = 250
N_PARTITIONS = 4

STREAM_CHUNKS = 5
STREAM_ROWS = 200


def _make_batch_source():
    from pyspark.sql.datasource import (
        DataSource, DataSourceReader, InputPartition)

    rows_default, parts_default = ROWS_PER_PARTITION, N_PARTITIONS

    class SyntheticFeedReader(DataSourceReader):
        def __init__(self, options) -> None:
            self.rows = int(options.get("rowsperpartition", rows_default))
            self.parts = int(options.get("partitions", parts_default))

        def partitions(self):
            # one InputPartition per split -> one task per split; this
            # list IS the source's parallelism contract
            return [InputPartition(p) for p in range(self.parts)]

        def read(self, partition):
            import hashlib

            p = int(partition.value)
            for j in range(self.rows):
                i = p * self.rows + j
                h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                yield (p, i, h, (h % 1_000_000) / 1_000_000.0)

    class SyntheticFeedDataSource(DataSource):
        """spark.read.format("hdr_synthetic")."""

        @classmethod
        def name(cls) -> str:
            return "hdr_synthetic"

        def schema(self) -> str:
            return "part int, i bigint, h bigint, val double"

        def reader(self, schema):
            return SyntheticFeedReader(self.options)

    return SyntheticFeedDataSource


def _make_stream_source():
    from pyspark.sql.datasource import (
        DataSource, SimpleDataSourceStreamReader)

    chunks, rows = STREAM_CHUNKS, STREAM_ROWS

    class SyntheticFeedStreamReader(SimpleDataSourceStreamReader):
        """Bounded streaming feed: `chunks` micro-batches of `rows`
        md5-derived rows, offset = {"chunk": k}. read() hands the engine
        one chunk and the next offset; readBetweenOffsets() regenerates
        any offset range on checkpoint replay — determinism IS the
        exactly-once story (same contract as a Kafka offset range:
        re-reading [a, b) yields identical rows)."""

        def initialOffset(self):
            return {"chunk": 0}

        def _chunk(self, k: int):
            import hashlib

            out = []
            for j in range(rows):
                i = k * rows + j
                h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                out.append((k, i, h, (h % 1_000_000) / 1_000_000.0))
            return out

        # read() returns an ITERATOR over a materialized list (iter(list)),
        # never a bare list or a generator: Spark's prefetch cache calls
        # next() on it when the offset does not advance (bare list raises
        # TypeError in latestOffset) and copy.copy()s cached entries
        # (generators cannot be copied/pickled; list_iterators can).
        def read(self, start):
            k = start["chunk"]
            if k >= chunks:
                return iter([]), {"chunk": k}
            return iter(self._chunk(k)), {"chunk": k + 1}

        def readBetweenOffsets(self, start, end):
            out = []
            for k in range(start["chunk"], end["chunk"]):
                out.extend(self._chunk(k))
            return out

    class SyntheticFeedStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "hdr_synthetic_stream"

        def schema(self) -> str:
            return "chunk int, i bigint, h bigint, val double"

        def simpleStreamReader(self, schema):
            return SyntheticFeedStreamReader()

    return SyntheticFeedStreamSource


def register_synthetic_source(spark) -> None:
    """Idempotent per-session registration (re-registering the same name
    raises in Spark 4; keep a session-local marker)."""
    key = "hdr.synthetic.registered"
    if spark.conf.get(f"spark.{key}", None) != "true":
        spark.dataSource.register(_make_batch_source())
        spark.conf.set(f"spark.{key}", "true")


def register_synthetic_stream_source(spark) -> None:
    key = "hdr.synthetic.stream.registered"
    if spark.conf.get(f"spark.{key}", None) != "true":
        spark.dataSource.register(_make_stream_source())
        spark.conf.set(f"spark.{key}", "true")
