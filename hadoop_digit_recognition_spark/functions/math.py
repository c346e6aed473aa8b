"""Scalar/array math column functions (SURVEY.md P3-P5).

All pure Spark built-ins — JVM-side, whole-stage-codegen'd, no Python in
the data path. Each mirrors a per-record transform the reference performs
inside its mappers:

- normalize : int pixel -> double in [0,1]   (/root/reference/rbmmapper.java:116-119)
- sigmoid   : 1/(1+exp(-x)) elementwise      (/root/reference/rbmmapper.java:158-162)
- quantize  : prob -> int(p*255), truncating (/root/reference/propmapper.java:156)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sigmoid_scalar(x: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-x))


def sigmoid_col(arr: Column) -> Column:
    """Elementwise sigmoid over an array<double> column."""
    return F.transform(arr, lambda x: sigmoid_scalar(x.cast("double")))


def normalize_col(arr: Column, denom: float = 255.0) -> Column:
    """x -> x/denom elementwise (reference normalizes 0-255 ints)."""
    return F.transform(arr, lambda x: x.cast("double") / F.lit(denom))


def quantize_col(arr: Column, scale: float = 255.0) -> Column:
    """p -> int(p*scale); Java's (int) cast truncates toward zero and all
    inputs are probabilities >= 0, so floor() is exact parity."""
    return F.transform(arr, lambda x: F.floor(x.cast("double") * F.lit(scale)).cast("long"))


def round_half_away(x: float, ndigits: int) -> float:
    """Driver-side round matching DuckDB's round() semantics
    (half-away-from-zero), for scalars that are snapped in Python and
    compared against an oracle that snaps with SQL round(). Python's
    built-in round() is banker's (half-to-even): a value landing on a
    representable half-boundary would put the two engines on adjacent
    grid points and fan the 1-ulp difference into every downstream row
    (advisor r09, ab_cuped_adjustment theta/mx snap)."""
    import math

    s = 10.0 ** ndigits
    return math.copysign(math.floor(abs(x) * s + 0.5), x) / s


def round_half_away_arr(x, ndigits: int):
    """Vectorized round_half_away for numpy arrays / pandas Series used
    inside pandas UDFs whose oracle snaps with DuckDB round() —
    numpy/pandas .round() is half-to-even and sits in the same latent
    banker's-vs-half-away class (see round_half_away)."""
    import numpy as np

    a = np.asarray(x, dtype=np.float64)
    s = 10.0 ** ndigits
    return np.copysign(np.floor(np.abs(a) * s + 0.5), a) / s
