"""Custom Python DataSource (Spark 4 connector API).

The reference's only source is a text-line scan (S1); a modern engine
also needs a CONNECTOR surface for systems Spark has no built-in reader
for. Spark 4's Python DataSource API is that surface: a DataSource
declares name/schema/reader, the reader declares its InputPartitions
(the unit of parallelism — one read() call per partition, scheduled
across executors), and read() yields rows. This module implements a
deterministic synthetic "sensor feed" whose every value derives from a
content hash, so a DuckDB oracle reproduces the emitted rows
bit-for-bit — the same determinism discipline as the engine's sampling
and minhash operators (functions/vector.det_hash64).

At 100 TB the partition list is the whole scale story: partitions()
returning N splits is what lets a thousand executors read
concurrently; a connector returning one partition serializes the
cluster behind one task (the same single-split trap TESTDATA's small
parquet files demonstrate — see SCALE.md "local-vs-cluster deltas").
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

ROWS_PER_PARTITION = 250
N_PARTITIONS = 4


class SyntheticFeedDataSource(DataSource):
    """spark.read.format("hdr_synthetic") — registered per session via
    register_synthetic_source()."""

    @classmethod
    def name(cls) -> str:
        return "hdr_synthetic"

    def schema(self) -> str:
        return "part int, i bigint, h bigint, val double"

    def reader(self, schema) -> "SyntheticFeedReader":
        return SyntheticFeedReader(self.options)


class SyntheticFeedReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows = int(options.get("rowsperpartition", ROWS_PER_PARTITION))
        self.parts = int(options.get("partitions", N_PARTITIONS))

    def partitions(self):
        # one InputPartition per split -> one task per split; this list
        # IS the source's parallelism contract
        return [InputPartition(p) for p in range(self.parts)]

    def read(self, partition: InputPartition):
        import hashlib

        p = int(partition.value)
        for j in range(self.rows):
            i = p * self.rows + j
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            yield (p, i, h, (h % 1_000_000) / 1_000_000.0)


def register_synthetic_source(spark) -> None:
    """Idempotent per-session registration (re-registering the same name
    raises in Spark 4; keep a session-local marker)."""
    key = "hdr.synthetic.registered"
    if spark.conf.get(f"spark.{key}", None) != "true":
        spark.dataSource.register(SyntheticFeedDataSource)
        spark.conf.set(f"spark.{key}", "true")
