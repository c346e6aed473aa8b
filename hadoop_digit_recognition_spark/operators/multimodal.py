"""Multimodal column plumbing (north-star requirement).

Media rides as opaque `binary` columns with typed metadata, processed by
Arrow-batched pandas UDFs over mapInPandas. Two feature paths, both real:
byte-level stats (default) and a genuine decode (`decode=True`) that
interprets the payload as a headerless uint8 raster and mean-pools it in
NumPy — no codec libraries needed, and the oracle recomputes every pooled
pixel relationally. Swapping the raster reshape for PIL/ffmpeg changes
only the inside of the pandas UDF, none of the Spark plumbing.

At 100 TB: binary payloads dominate partition size — set
spark.sql.files.maxPartitionBytes so a task's Arrow batches fit executor
memory, and never groupBy on the payload itself (metadata columns carry
the keys).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """documents -> multimodal layout: opaque binary payload + typed
    metadata (the corpus has no real media; text bytes stand in as the
    payload, which keeps every byte-level code path honest)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.col("n_chars").alias("meta_len"))


# Raw-raster geometry for decode=True: payload bytes are interpreted as a
# HxW uint8 grayscale image (truncate/zero-pad), mean-pooled in PxP blocks.
# The reference analog is exactly this: each record IS a line of 0-255
# pixel values parsed positionally (/root/reference/rbmmapper.java:91-119).
RASTER_H, RASTER_W, POOL = 16, 16, 4


def extract_features(df: DataFrame, payload_col: str = "payload",
                     decode: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    decode=False (default): deterministic byte-level features
    (len/md5/byte stats) — schema `doc_id, byte_len, sig, feat`.

    decode=True: REAL decode, no codec libraries needed — the payload is
    interpreted as a raw HxW uint8 grayscale raster (headerless bitmap:
    truncate to H*W bytes, zero-pad short payloads), downsampled by PxP
    mean-pooling in NumPy. Output is one row per pooled pixel
    `doc_id, pr, pc, pooled` where pooled = block_sum / (P*P*255) —
    the block sum stays integer so the value is bit-reproducible in any
    engine. This is the shape a PIL/ffmpeg extractor would have
    (vectorized batch decode inside mapInPandas, metadata keys outside
    the payload); swapping the raster reshape for Image.open changes no
    Spark-side plumbing."""
    from ..shipping import ensure_shipped
    ensure_shipped(df.sparkSession)

    if decode:
        import numpy as np

        n_px = RASTER_H * RASTER_W
        pool_schema = "doc_id bigint, pr bigint, pc bigint, pooled double"
        hp, wp = RASTER_H // POOL, RASTER_W // POOL
        prs = np.repeat(np.arange(hp, dtype=np.int64), wp)
        pcs = np.tile(np.arange(wp, dtype=np.int64), hp)

        def decode_pool(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids, out = [], []
                for did, b in zip(pdf["doc_id"], pdf[payload_col]):
                    raw = np.frombuffer(bytes(b)[:n_px], dtype=np.uint8)
                    if raw.size < n_px:
                        raw = np.pad(raw, (0, n_px - raw.size))
                    img = raw.reshape(RASTER_H, RASTER_W).astype(np.int64)
                    bsum = img.reshape(hp, POOL, wp, POOL).sum(axis=(1, 3))
                    out.append(bsum.ravel() / (POOL * POOL * 255.0))
                    ids.append(did)
                n = len(ids)
                yield pd.DataFrame({
                    "doc_id": np.repeat(np.asarray(ids, dtype=np.int64), hp * wp),
                    "pr": np.tile(prs, n),
                    "pc": np.tile(pcs, n),
                    "pooled": (np.concatenate(out) if out
                               else np.empty(0, dtype=np.float64)),
                })

        return df.mapInPandas(decode_pool, pool_schema)

    schema = ("doc_id bigint, byte_len bigint, sig string, "
              "feat array<double>")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            payloads = pdf[payload_col]
            out = {
                "doc_id": pdf["doc_id"],
                "byte_len": payloads.map(len),
                "sig": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                # 4-dim deterministic byte-statistics "embedding"
                "feat": payloads.map(lambda b: [
                    len(b) / 1000.0,
                    (sum(bytes(b)[:64]) % 256) / 255.0,
                    (bytes(b)[0] if len(b) else 0) / 255.0,
                    (bytes(b)[-1] if len(b) else 0) / 255.0,
                ]),
            }
            yield pd.DataFrame(out)

    return df.mapInPandas(extract, schema)


@query("multimodal_meta", oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       md5(text) AS sig
FROM documents
""")
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata through the full pandas-UDF path: encode ->
    mapInPandas -> (byte_len, md5 sig). Oracle recomputes both from the
    text (utf-8 md5 == payload md5)."""
    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)
    return extract_features(mm).select("doc_id", "byte_len", "sig")


@query("multimodal_features", oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       round(octet_length(encode(text)) / 1000.0, 6) AS f0,
       round((coalesce(list_aggregate(
                list_transform(range(1, least(length(text), 64) + 1),
                               i -> ascii(text[i])), 'sum'), 0) % 256)
             / 255.0, 6) AS f1
FROM documents
""")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic byte-level features through the full mapInPandas
    path. The oracle recomputes them relationally from the text — valid
    because this corpus is pure ASCII (byte == code point, checked in
    tests); on real binary media the raster decode path takes over."""
    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)
    out = extract_features(mm)
    return out.select("doc_id", "byte_len",
                      F.round(F.element_at("feat", 1), 6).alias("f0"),
                      F.round(F.element_at("feat", 2), 6).alias("f1"))


@query("multimodal_decode_pool", oracle=f"""
WITH px AS (
  SELECT d.doc_id, r.i,
         CASE WHEN r.i < octet_length(encode(d.text))
              THEN ascii(substr(d.text, CAST(r.i + 1 AS INTEGER), 1))
              ELSE 0 END AS v
  FROM documents d CROSS JOIN range({RASTER_H * RASTER_W}) r(i)
)
SELECT doc_id,
       (i // {RASTER_W}) // {POOL} AS pr,
       (i % {RASTER_W}) // {POOL} AS pc,
       round(sum(v) / {POOL * POOL * 255}.0, 9) AS pooled
FROM px GROUP BY doc_id, pr, pc
""")
def multimodal_decode_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode path end-to-end: binary payload -> headerless
    16x16 uint8 raster -> 4x4 mean-pool, in mapInPandas
    (extract_features(decode=True)). The oracle recomputes every pooled
    pixel relationally — ascii(char) == payload byte on this pure-ASCII
    corpus, zero-padding as CASE — and matches bit-for-bit because the
    block sum is integer-exact in both engines (one float division at
    the end). Reference analog: positional 0-255 pixel-line parsing,
    rbmmapper.java:91-119."""
    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)
    out = extract_features(mm, decode=True)
    return out.select("doc_id", "pr", "pc", F.round("pooled", 9).alias("pooled"))
