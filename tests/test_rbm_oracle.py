"""t2-style oracle comparison for the RBM queries at sf0.01, plus golden
NumPy model checks for the CD-1 math (SURVEY.md §5.3)."""

from __future__ import annotations

import numpy as np
import pytest

from hadoop_digit_recognition_spark.all_queries import ORACLE_SQL, SPARK_QUERIES
from hadoop_digit_recognition_spark.rbm.cd1 import (
    _sigmoid,
    init_weights_sin,
    numpy_cd1_meanfield,
)

from .conftest import SF_ORACLE
from .oracle_harness import compare

RBM_QUERIES = ["rbm_cd1_epoch", "rbm_forward_prop", "rbm_forward_prop_quantized",
               "rbm_cd1_epoch_sampled", "rbm_cd1_two_epochs",
               "rbm_cd1_two_epochs_sampled", "rbm_dbn_two_layer",
               "rbm_cd1_epoch_biases", "rbm_cd1_two_epochs_momentum"]


def test_det_uniforms_col_matches_python_twin(spark):
    """The JVM-side draw column (production path) must be bit-identical to
    the interpreted-Python golden twin for several epochs and id shapes."""
    from hadoop_digit_recognition_spark.rbm.cd1 import det_uniforms, det_uniforms_col

    ids = np.array([0, 1, 7, 99, 12345, 2**40])
    df = spark.createDataFrame([(int(i),) for i in ids], "vec_id bigint")
    for epoch in (0, 1, 5):
        rows = (df.select("vec_id", det_uniforms_col("vec_id", 9, epoch).alias("u"))
                .orderBy("vec_id").collect())
        got = np.array([r["u"] for r in sorted(rows, key=lambda r: r["vec_id"])])
        want = det_uniforms(np.sort(ids), 9, epoch)
        assert np.array_equal(got, want)


@pytest.mark.parametrize("name", RBM_QUERIES)
def test_rbm_query_vs_duckdb(spark, duck, name):
    df = SPARK_QUERIES[name](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL[name], name)


def test_golden_cd1_meanfield_tiny():
    """Hand-checkable CD-1: 2 examples x 3 dims, 2 hidden."""
    V = np.array([[1.0, 0.0, 0.5], [0.2, 0.8, 0.1]])
    W = init_weights_sin(3, 2)
    g = numpy_cd1_meanfield(V, W)
    # independent recomputation, scalar-by-scalar
    h0 = 1 / (1 + np.exp(-(V @ W)))
    v1 = 1 / (1 + np.exp(-(h0 @ W.T)))
    h1 = 1 / (1 + np.exp(-(v1 @ W)))
    expect = V.T @ h0 - v1.T @ h1
    np.testing.assert_allclose(g, expect, rtol=1e-12)
    assert g.shape == (3, 2)


def test_sigmoid_stable_extremes():
    x = np.array([-800.0, -30.0, 0.0, 30.0, 800.0])
    s = _sigmoid(x)
    assert np.all(np.isfinite(s))
    np.testing.assert_allclose(s[2], 0.5)
    assert s[0] == 0.0 and s[4] == 1.0


def test_cd1_full_gradient_matches_numpy(spark):
    """The full-parameter epoch (weights + biases) equals the direct
    NumPy computation at every index — golden-model parity for the
    D5-repair path."""
    import numpy as np

    from hadoop_digit_recognition_spark.rbm.cd1 import (
        _sigmoid, init_weights_sin)
    from hadoop_digit_recognition_spark.tables import load
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from .conftest import SF_ORACLE

    got = {r.idx: r.dw for r in
           SPARK_QUERIES["rbm_cd1_epoch_biases"](spark, SF_ORACLE).collect()}
    rows = load(spark, SF_ORACLE, "embeddings").select("embedding").collect()
    V = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    nd, nh = 64, 16
    W = init_weights_sin(nd, nh)
    h0 = _sigmoid(V @ W)
    v1 = _sigmoid(h0 @ W.T)
    h1 = _sigmoid(v1 @ W)
    n = len(V)
    gw = 0.1 * (V.T @ h0 - v1.T @ h1) / n
    ghb = 0.1 * (h0.sum(0) - h1.sum(0)) / n
    gvb = 0.1 * (V.sum(0) - v1.sum(0)) / n
    want = np.concatenate([gw.ravel(), ghb, gvb])
    for idx in range(nd * nh + nh + nd):
        assert abs(got[idx] - round(want[idx], 9)) < 1e-9, idx
