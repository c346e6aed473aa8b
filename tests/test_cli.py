"""Reference-CLI parity: the driver.java positional surface runs the
layer loop end-to-end and leaves the reference-format artifacts."""

from __future__ import annotations

import os
import tempfile
import uuid

import numpy as np

from hadoop_digit_recognition_spark.cli import main
from hadoop_digit_recognition_spark.sources.text_format import read_weights_text

from .conftest import SF_SMOKE


def test_cli_end_to_end(spark):
    out = os.path.join(tempfile.gettempdir(), "hdr_cli_test", uuid.uuid4().hex)
    rc = main([f"{SF_SMOKE}/embeddings.parquet", out, "1", "3", "64", "16", "8"])
    assert rc == 0
    W0 = read_weights_text(os.path.join(out, "weights_0.txt"), 64, 16)
    W1 = read_weights_text(os.path.join(out, "weights_1.txt"), 16, 8)
    assert np.isfinite(W0).all() and np.isfinite(W1).all()
    acts = spark.read.parquet(os.path.join(out, "activations.parquet"))
    row = acts.select("act2").first()
    assert len(row["act2"]) == 8
    assert all(0.0 <= x <= 1.0 for x in row["act2"])  # sigmoid outputs


def test_cli_bad_args():
    assert main([]) == 2
    assert main(["in", "out", "1", "3", "64"]) == 2  # missing layer sizes
