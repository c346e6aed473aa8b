from __future__ import annotations

import importlib


def test_entry_smoke(spark):
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 64 * 16
    assert set(df.columns) == {"idx", "dw"}
    assert any(r["dw"] != 0.0 for r in rows)


def test_every_query_has_runnable_shape(spark):
    mod = importlib.import_module("__spark_entry__")
    qs, osql = mod.queries(), mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert "rbm_cd1_epoch" in osql


def test_bench_headline_names_registered():
    """Every bench.py HEADLINE name must exist in the registry — a typo
    here would crash the driver's per-round bench run."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "hdr_bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    missing = [n for n in bench.HEADLINE if n not in SPARK_QUERIES]
    assert not missing, missing
