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
