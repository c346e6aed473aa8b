"""Reference text-format codecs, Spark-first.

The reference's entire persistent surface is text (SURVEY.md §1.2):

- example lines: space-separated ints 0-255, one example per line
  (/root/reference/rbmmapper.java:91, 116-119); after the first layer,
  lines carry an `offset\\tpayload` prefix because TextOutputFormat wrote
  `key\\tvalue` (/root/reference/rbmmapper.java:86-97, propmapper.java:
  82-93) — the reader handles both branches;
- arity validation: token count must equal the declared numdims or the
  record throws (/root/reference/rbmmapper.java:108-114) — reproduced
  with a raise_error-under-when predicate, enforced distributedly;
- weight file: the full matrix as ONE line of space-joined 3-decimal
  decimals (/root/reference/driver.java:33, 126-138) — driver-side
  (weight-matrix-sized state, the allowed driver payload).

Everything is built-in expressions (split/transform/concat_ws); the scan
parallelizes by line ranges like any Spark text source.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F


def read_examples_text(spark: SparkSession, path: str, numdims: int,
                       normalize: bool = True,
                       keyed: bool = False) -> DataFrame:
    """Text example lines -> (example_id, v: array<double>).

    Handles both reference line shapes (raw payload / offset\\tpayload),
    validates arity per record like the reference's mapper guard, and
    normalizes ints to [0,1] doubles (P1-P3). With keyed=True the line's
    tab-prefixed key becomes example_id (the reference's byte-offset
    pass-through, P9); otherwise ids are synthesized."""
    raw = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    eid = (F.element_at(parts, 1).cast("long") if keyed
           else F.monotonically_increasing_id())
    cast = ((lambda t: t.cast("double") / F.lit(255.0)) if normalize
            else (lambda t: t.cast("double")))
    v = F.when(F.size("toks") == numdims, F.transform("toks", cast)) \
        .otherwise(F.raise_error(F.concat(
            F.lit(f"arity mismatch: expected {numdims} values, got "),
            F.size("toks").cast("string"))))
    return (raw
            .select(eid.alias("example_id"),
                    F.split(F.trim(F.element_at(parts, -1)), r"\s+")
                    .alias("toks"))
            .select("example_id", v.alias("v")))


def write_examples_text(df: DataFrame, vec_col: str, path: str,
                        id_col: str | None = None,
                        quantize: bool = False) -> None:
    """(id?, array) -> reference text lines. With id_col, emits the
    TextOutputFormat `id\\tpayload` shape; quantize applies the
    int(p*255) re-quantization of propmapper.java:156 (P5)."""
    v = F.col(vec_col)
    if quantize:
        # (int) cast truncates toward zero — propmapper.java:156 fidelity
        v = F.transform(v, lambda x: (x.cast("double") * 255.0).cast("int"))
    payload = F.concat_ws(" ", F.transform(v, lambda x: x.cast("string")))
    if id_col is not None:
        payload = F.concat_ws("\t", F.col(id_col).cast("string"), payload)
    df.select(payload.alias("value")).write.mode("overwrite").text(path)


def write_weights_text(W: np.ndarray, path: str, decimals: int = 3) -> None:
    """Weight matrix -> one line of space-joined decimals, rounded
    HALF_EVEN to `decimals` digits — Java DecimalFormat("#.###")'s default
    rounding mode (/root/reference/driver.java:33,133); np.round is
    banker's rounding at the .5 boundary, so 0.1236 -> 0.124 and
    0.1235 -> 0.124 exactly as DecimalFormat serializes them. Driver-side
    file, no Spark job: the matrix is the one payload small enough to
    live on the driver."""
    scale = 10.0 ** decimals
    vals = np.round(np.asarray(W, dtype=np.float64).ravel() * scale) / scale
    line = " ".join(f"{v:.{decimals}f}".rstrip("0").rstrip(".") if v % 1 else
                    str(int(v)) for v in vals)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(line + "\n")


def read_weights_text(path: str, numdims: int, numhid: int) -> np.ndarray:
    """One-line weight file -> (numdims, numhid) float64 matrix,
    row-major (the INTENDED layout; the reference's column-packed
    deserialization against row-major updates is defect D3 — not
    replicated)."""
    with open(path) as f:
        vals = np.array(f.read().split(), dtype=np.float64)
    if vals.size != numdims * numhid:
        raise ValueError(
            f"weight file holds {vals.size} values, expected "
            f"{numdims}*{numhid}={numdims * numhid}")
    return vals.reshape(numdims, numhid)
