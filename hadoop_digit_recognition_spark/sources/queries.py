"""Registered source/sink queries.

`source_text_roundtrip` drives the full reference text lifecycle through
real files: quantize embeddings -> write TextOutputFormat-shaped lines
(S2/P5/P8) -> scan + parse + validate them back (S1/P1/P2) -> checksum.
The DuckDB oracle computes the same checksums straight from parquet, so
any loss or corruption in the text path breaks the match.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..tables import load
from .text_format import read_examples_text, write_examples_text


@query("source_text_roundtrip", oracle="""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS n_vals,
       CAST(list_aggregate(
            list_transform(embedding, x -> trunc(x::DOUBLE * 255)), 'sum')
         AS BIGINT) AS checksum
FROM embeddings
""")
def source_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write embeddings as reference text lines (id\\tspace-joined ints,
    truncating quantization), read them back through the validating text
    scan, and checksum per row. Lossless by construction for integer
    payloads; the oracle recomputes the checksums from the parquet
    source, so the text sink+scan pair is what is actually under test."""
    stage = os.path.join(tempfile.gettempdir(), "hdr_text_stage",
                         uuid.uuid4().hex)
    emb = load(spark, sf_dir, "embeddings")
    numdims = len(emb.select("embedding").first()["embedding"])
    write_examples_text(emb, "embedding", stage, id_col="vec_id",
                        quantize=True)
    back = read_examples_text(spark, stage, numdims, normalize=False,
                              keyed=True)
    return back.select(
        F.col("example_id").alias("vec_id"),
        F.size("v").cast("bigint").alias("n_vals"),
        F.aggregate("v", F.lit(0.0), lambda a, x: a + x)
        .cast("bigint").alias("checksum"))
