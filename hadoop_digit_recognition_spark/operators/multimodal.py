"""Multimodal column plumbing (north-star requirement).

Media rides as opaque `binary` columns with typed metadata, processed by
Arrow-batched pandas UDFs over mapInPandas — the Spark-side contract
(schema, batch shape, partitioning) is real and tested; the actual codec
step is stubbed because image/audio libraries are not in this
environment (NotImplementedError behind `decode=`, with a deterministic
byte-level feature path used by default).

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


def extract_features(df: DataFrame, payload_col: str = "payload",
                     decode: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    decode=True is the real-codec path (image resize / audio frame-sample)
    — NotImplementedError here, by design: the container has no codec
    libraries. The default path computes deterministic byte-level features
    with the exact batch shape a real extractor would use."""
    from ..shipping import ensure_shipped
    ensure_shipped(df.sparkSession)

    if decode:
        raise NotImplementedError(
            "real media decode requires codec libraries (PIL/ffmpeg) not "
            "present in this environment; Spark-side plumbing is identical")

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
    tests); on real binary media the decode stub takes over and the
    check is rows-only by nature."""
    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)
    out = extract_features(mm)
    return out.select("doc_id", "byte_len",
                      F.round(F.element_at("feat", 1), 6).alias("f0"),
                      F.round(F.element_at("feat", 2), 6).alias("f1"))
