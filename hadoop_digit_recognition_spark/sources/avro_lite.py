"""Avro container-file connector, pure Python (Avro-lite).

The environment ships the avro core jars but NOT the `spark-avro`
DataSource module, and no Python avro package — so `format("avro")` is
unavailable and cannot be installed. Avro is still a big-data staple the
reference-era Hadoop stack speaks natively (the reference's jobs run on
the same Hadoop whose MapReduce siblings used avro-mapred), so the
engine provides its own codec for the PUBLIC Avro 1.x object container
file specification (https://avro.apache.org/docs/current/specification/):

- header: magic ``Obj\\x01``, file-metadata map (``avro.schema`` JSON,
  ``avro.codec``), 16-byte sync marker;
- data blocks: row count (zigzag varint long), byte size, serialized
  records, sync marker — the sync marker is what makes Avro SPLITTABLE
  at scale (a reader can seek to any offset and resync);
- primitives: zigzag-varint int/long, IEEE-754 LE float/double,
  length-prefixed UTF-8 string / bytes, 1-byte boolean, zero-byte null;
  nullable fields as the 2-branch union ``["null", T]`` (branch index
  varint, then the value);
- codecs: ``null`` and ``deflate`` (raw DEFLATE, no zlib header —
  wbits=-15), per the spec.

Scope: flat record schemas over the primitive types above — the shape
warehouse interchange actually uses. Nested records/arrays/maps/enums
are out of scope and rejected loudly at write time.

Spark integration (both directions partition-parallel):
- ``write_avro_dir``: one container file per DataFrame partition via
  mapInPandas (the writer runs ON the executors; the driver never sees
  row data);
- ``hdr_avro`` Python DataSource (Spark 4 connector API): one
  InputPartition per ``*.avro`` file; schema derived driver-side from
  the first file's embedded Avro schema JSON. Reader classes follow the
  by-value pickling contract described in sources/synthetic.py — all
  decode logic lives in closures captured by the factory, no package
  imports on the read path.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# binary encoding (writer side; runs on executors via the shipped package)
# ---------------------------------------------------------------------------


def _enc_long(buf: io.BytesIO, n: int) -> None:
    """Zigzag + varint, the Avro int/long wire format."""
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _enc_bytes(buf: io.BytesIO, b: bytes) -> None:
    _enc_long(buf, len(b))
    buf.write(b)


def _enc_value(buf: io.BytesIO, typ: str, v) -> None:
    if typ == "long" or typ == "int":
        _enc_long(buf, int(v))
    elif typ == "double":
        buf.write(struct.pack("<d", float(v)))
    elif typ == "float":
        buf.write(struct.pack("<f", float(v)))
    elif typ == "string":
        _enc_bytes(buf, str(v).encode("utf-8"))
    elif typ == "bytes":
        _enc_bytes(buf, bytes(v))
    elif typ == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif typ == "null":
        pass
    else:
        raise ValueError(f"avro_lite: unsupported type {typ!r}")


_SPARK_TO_AVRO = {"long": "long", "bigint": "long", "int": "int",
                  "integer": "int", "double": "double", "float": "float",
                  "string": "string", "binary": "bytes", "boolean": "boolean"}


def avro_schema_for(spark_schema, name: str = "row") -> dict:
    """Spark StructType -> Avro record schema dict (flat primitives only;
    every field emitted as the nullable union ["null", T] — Spark columns
    are nullable by default and the union exercises the full wire format)."""
    fields = []
    for f in spark_schema.fields:
        tn = f.dataType.simpleString()
        if tn not in _SPARK_TO_AVRO:
            raise ValueError(
                f"avro_lite: column {f.name!r} has non-primitive type {tn!r}; "
                "flat primitive schemas only")
        fields.append({"name": f.name,
                       "type": ["null", _SPARK_TO_AVRO[tn]]})
    return {"type": "record", "name": name, "fields": fields}


def write_container(path: str, schema: dict, rows, codec: str = "null",
                    block_rows: int = 4096) -> int:
    """Write one Avro object container file; rows = iterable of tuples in
    schema field order. Returns rows written. Sync marker is derived from
    the schema content (md5) — deterministic output for deterministic input."""
    import hashlib

    if codec not in ("null", "deflate"):
        raise ValueError(f"avro_lite: unsupported codec {codec!r}")
    schema_json = json.dumps(schema, sort_keys=True)
    sync = hashlib.md5(schema_json.encode()).digest()
    ftypes = [f["type"] for f in schema["fields"]]

    def _flush(out, block: io.BytesIO, n: int) -> None:
        data = block.getvalue()
        if codec == "deflate":
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            data = c.compress(data) + c.flush()
        head = io.BytesIO()
        _enc_long(head, n)
        _enc_long(head, len(data))
        out.write(head.getvalue())
        out.write(data)
        out.write(sync)

    total = 0
    with open(path, "wb") as out:
        out.write(MAGIC)
        meta = io.BytesIO()
        _enc_long(meta, 2)
        _enc_bytes(meta, b"avro.schema")
        _enc_bytes(meta, schema_json.encode())
        _enc_bytes(meta, b"avro.codec")
        _enc_bytes(meta, codec.encode())
        _enc_long(meta, 0)
        out.write(meta.getvalue())
        out.write(sync)

        block, n = io.BytesIO(), 0
        for row in rows:
            for typ, v in zip(ftypes, row):
                if isinstance(typ, list):  # union ["null", T]
                    if v is None:
                        _enc_long(block, 0)
                    else:
                        _enc_long(block, 1)
                        _enc_value(block, typ[1], v)
                else:
                    _enc_value(block, typ, v)
            n += 1
            if n >= block_rows:
                _flush(out, block, n)
                total += n
                block, n = io.BytesIO(), 0
        if n:
            _flush(out, block, n)
            total += n
    return total


def write_avro_dir(df, path: str, codec: str = "deflate"):
    """Partition-parallel Avro sink: one container file per partition via
    mapInPandas (executor-side writes, driver sees only (file, n) rows —
    the same topology as a FileFormat sink). Returns the manifest
    DataFrame; forcing it performs the write."""
    from pyspark.sql import functions as F  # noqa: F401

    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    os.makedirs(path, exist_ok=True)
    schema = avro_schema_for(df.schema)
    cols = [f.name for f in df.schema.fields]

    def _write(batches):
        import pandas as pd
        import uuid as _uuid

        rows_iter = []
        for pdf in batches:
            for t in pdf[cols].itertuples(index=False, name=None):
                rows_iter.append(tuple(None if pd.isna(v) else v for v in t))
        if not rows_iter:
            return
        fname = os.path.join(path, f"part-{_uuid.uuid4().hex}.avro")
        n = write_container(fname, schema, rows_iter, codec=codec)
        yield pd.DataFrame({"file": [os.path.basename(fname)], "n": [n]})

    return df.mapInPandas(_write, schema="file string, n long")


# ---------------------------------------------------------------------------
# reader: Python DataSource, fully self-contained (by-value pickling)
# ---------------------------------------------------------------------------


def _make_avro_source():
    from pyspark.sql.datasource import (
        DataSource, DataSourceReader, InputPartition)

    def _dec_long(f) -> int:
        shift, acc = 0, 0
        while True:
            b = f.read(1)
            if not b:
                raise EOFError
            acc |= (b[0] & 0x7F) << shift
            if not b[0] & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # un-zigzag

    def _dec_bytes(f) -> bytes:
        return f.read(_dec_long(f))

    def _read_header(f):
        import json as _json

        if f.read(4) != b"Obj\x01":
            raise ValueError("not an Avro object container file")
        meta = {}
        while True:
            n = _dec_long(f)
            if n == 0:
                break
            if n < 0:  # negative count block: abs count + byte size
                n = -n
                _dec_long(f)
            for _ in range(n):
                k = _dec_bytes(f).decode()
                meta[k] = _dec_bytes(f)
        sync = f.read(16)
        schema = _json.loads(meta["avro.schema"])
        codec = meta.get("avro.codec", b"null").decode()
        return schema, codec, sync

    def _dec_value(f, typ):
        import struct as _struct

        if isinstance(typ, list):  # union ["null", T]
            return None if _dec_long(f) == 0 else _dec_value(f, typ[1])
        if typ in ("long", "int"):
            return _dec_long(f)
        if typ == "double":
            return _struct.unpack("<d", f.read(8))[0]
        if typ == "float":
            return _struct.unpack("<f", f.read(4))[0]
        if typ == "string":
            return _dec_bytes(f).decode("utf-8")
        if typ == "bytes":
            return _dec_bytes(f)
        if typ == "boolean":
            return f.read(1) == b"\x01"
        raise ValueError(f"unsupported avro type {typ!r}")

    def _decode_file(fpath):
        import io as _io
        import zlib as _zlib

        with open(fpath, "rb") as f:
            schema, codec, sync = _read_header(f)
            ftypes = [fl["type"] for fl in schema["fields"]]
            while True:
                try:
                    n = _dec_long(f)
                except EOFError:
                    return
                size = _dec_long(f)
                data = f.read(size)
                if codec == "deflate":
                    data = _zlib.decompressobj(-15).decompress(data)
                block = _io.BytesIO(data)
                for _ in range(n):
                    yield tuple(_dec_value(block, t) for t in ftypes)
                if f.read(16) != sync:
                    raise ValueError("sync marker mismatch (corrupt block)")

    _AVRO_TO_SPARK = {"long": "bigint", "int": "int", "double": "double",
                      "float": "float", "string": "string",
                      "bytes": "binary", "boolean": "boolean"}

    class AvroLiteReader(DataSourceReader):
        def __init__(self, options) -> None:
            self.path = options.get("path")

        def _files(self):
            import glob as _glob

            return sorted(_glob.glob(os.path.join(self.path, "*.avro")))

        def partitions(self):
            # one InputPartition per container file: files are the split
            # unit (each file's sync-marker blocks could subdivide further,
            # but per-file tasks already scale with the writer's partition
            # count, which is the cluster's write parallelism)
            return [InputPartition(p) for p in self._files()]

        def read(self, partition):
            yield from _decode_file(partition.value)

    class AvroLiteDataSource(DataSource):
        """spark.read.format("hdr_avro").load(dir)."""

        @classmethod
        def name(cls) -> str:
            return "hdr_avro"

        def schema(self) -> str:
            import glob as _glob

            files = sorted(_glob.glob(os.path.join(self.options.get("path"),
                                                   "*.avro")))
            if not files:
                raise ValueError(f"no .avro files under {self.options.get('path')}")
            with open(files[0], "rb") as f:
                schema, _, _ = _read_header(f)
            cols = []
            for fl in schema["fields"]:
                t = fl["type"]
                if isinstance(t, list):
                    t = next(x for x in t if x != "null")
                cols.append(f"{fl['name']} {_AVRO_TO_SPARK[t]}")
            return ", ".join(cols)

        def reader(self, schema):
            return AvroLiteReader(self.options)

    return AvroLiteDataSource


def register_avro_source(spark) -> None:
    """Idempotent per-session registration (same pattern as synthetic.py)."""
    key = "hdr.avro.registered"
    if spark.conf.get(f"spark.{key}", None) != "true":
        spark.dataSource.register(_make_avro_source())
        spark.conf.set(f"spark.{key}", "true")
