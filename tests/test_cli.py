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


def test_cli_module_text_input_full_loop(spark):
    """The migration-guide claim end-to-end: `python -m
    hadoop_digit_recognition_spark.cli <in> <out> 2 3 64 16 8` as a real
    subprocess on reference-format TEXT input (driver.java:39-60 parity —
    the reference's own invocation shape), asserting the weight files'
    shape AND 3-decimal text format plus the activation parquet row
    count. Complements test_cli_end_to_end (in-process, parquet input)."""
    import re
    import subprocess
    import sys as _sys

    from pyspark.sql import functions as F

    from hadoop_digit_recognition_spark.sources.text_format import (
        write_examples_text)

    work = os.path.join(tempfile.gettempdir(), "hdr_cli_text",
                        uuid.uuid4().hex)
    inp, out = os.path.join(work, "in_text"), os.path.join(work, "out")
    # reference example lines: space-separated ints 0-255. Embeddings sit
    # in ~[-0.5, 0.5]; shift to [0,1] and let the quantized writer apply
    # the int(p*255) truncation (propmapper.java:156 fidelity, P5).
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    unit = emb.select(F.transform(
        "embedding",
        lambda x: F.least(F.greatest(x.cast("double") + 0.5, F.lit(0.0)),
                          F.lit(1.0))).alias("v"))
    n_in = emb.count()
    write_examples_text(unit, "v", inp, quantize=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [_sys.executable, "-m", "hadoop_digit_recognition_spark.cli",
         inp, out, "2", "3", "64", "16", "8"],
        cwd=tempfile.gettempdir(),  # foreign cwd, like the driver harness
        env={**os.environ, "PYTHONPATH": repo},
        capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "layer 0: 64->16, 2 epochs" in proc.stdout
    assert "layer 1: 16->8, 2 epochs" in proc.stdout

    # weight files: correct arity AND the reference's 3-decimal one-line
    # text format (driver.java:33,126-138) — every token a plain decimal
    # with at most 3 fractional digits, no exponent notation
    tok_re = re.compile(r"^-?\d+(\.\d{1,3})?$")
    for fname, (nd, nh) in (("weights_0.txt", (64, 16)),
                            ("weights_1.txt", (16, 8))):
        with open(os.path.join(out, fname)) as f:
            lines = f.read().splitlines()
        assert len(lines) == 1, f"{fname}: reference format is ONE line"
        toks = lines[0].split(" ")
        assert len(toks) == nd * nh
        bad = [t for t in toks if not tok_re.match(t)]
        assert not bad, f"{fname}: non-reference-format tokens {bad[:5]}"
        W = read_weights_text(os.path.join(out, fname), nd, nh)
        assert np.isfinite(W).all()

    acts = spark.read.parquet(os.path.join(out, "activations.parquet"))
    assert acts.count() == n_in
    row = acts.select("act2").first()
    assert len(row["act2"]) == 8
    assert all(0.0 <= x <= 1.0 for x in row["act2"])


def test_cli_bad_args():
    assert main([]) == 2
    assert main(["in", "out", "1", "3", "64"]) == 2  # missing layer sizes


def test_cli_run_list_and_query(tmp_path, capsys):
    """`run --list` enumerates the registry; `run <name> <sf> <out>`
    writes the query result as parquet."""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from hadoop_digit_recognition_spark.cli import main

    assert main(["run", "--list"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert set(out) == set(SPARK_QUERIES)

    dest = str(tmp_path / "q1_out.parquet")
    assert main(["run", "q1_pricing_summary",
                 "/root/testdata/sf0.001", dest]) == 0
    import duckdb
    n = duckdb.sql(f"SELECT count(*) FROM '{dest}/*.parquet'").fetchone()[0]
    assert n > 0

    assert main(["run", "nope_not_a_query"]) == 2


def test_cli_run_explain(capsys):
    """`run <name> <sf> --explain` prints the formatted plan instead of
    executing the query."""
    from hadoop_digit_recognition_spark.cli import main

    assert main(["run", "q6_forecast_revenue",
                 "/root/testdata/sf0.001", "--explain"]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "Scan parquet" in out


def test_cli_input_dir_named_run_routes_to_driver(spark):
    """An input directory literally named 'run' must hit the reference
    driver's positional surface, not the query-runner subcommand."""
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    # argv parses as the positional driver form -> must NOT reach the
    # query runner (which would print "unknown query" and return 2).
    # Routing to the driver path surfaces as Spark failing to read the
    # (nonexistent) input named 'run' — proof the dispatch chose parity.
    with pytest.raises(AnalysisException):
        main(["run", os.path.join(tempfile.gettempdir(), "hdr_out"),
              "1", "2", "64", "8"])
    # non-driver-form argv still reaches the query runner
    assert main(["run", "definitely_not_a_query"]) == 2
