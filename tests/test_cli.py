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
