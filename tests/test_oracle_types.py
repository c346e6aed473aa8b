"""Oracle result-type sweep.

The driver's value hash is TYPE-SENSITIVE: a DuckDB HUGEINT column
materializes through pandas as object/float and hashes differently from
Spark's int64 even when every value is equal (this made
q12_shipping_mode_priority the one red row of round 3). DuckDB promotes
`sum(<integer>)` to HUGEINT, so any oracle that sums ints without a
::BIGINT cast is a scheduled future failure.

Separately, the driver's canonicalizer (pandas sort_values over the
result frame) CANNOT HASH NON-SCALAR CELLS: a LIST/STRUCT/MAP output
column raises `TypeError: unhashable type` before any compare runs
(this made agg_collect_sorted the one red row of round 4, and
arr_normalize the red of round 1). Array-valued results must be joined
to strings (array_join / array_to_string) before registration; keep
array forms as pytest-only twins.

This sweep binds (not executes) every registered oracle against the
sf0.001 views and asserts no output column is HUGEINT/UHUGEINT and no
output column is LIST/ARRAY/STRUCT/MAP typed.
"""

import os

import duckdb
import pytest

from hadoop_digit_recognition_spark.all_queries import ORACLE_SQL

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

BANNED = {"HUGEINT", "UHUGEINT"}
# Non-scalar output types break the driver's pandas-based canonicalizer
# (unhashable cells). Matched structurally because DuckDB renders them
# parameterized: VARCHAR[], BIGINT[], STRUCT(a INT, ...), MAP(K, V).
def _is_nonscalar(type_str: str) -> bool:
    t = type_str.upper()
    return t.endswith("[]") or any(
        t.startswith(m) for m in ("STRUCT(", "MAP(", "UNION(", "LIST("))


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_oracle_returns_hugeint(con):
    offenders = {}
    for name, sql in sorted(ORACLE_SQL.items()):
        rel = con.sql(sql)
        bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
               if str(t).upper() in BANNED]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"{len(offenders)} oracle(s) return HUGEINT columns (driver hash "
        f"will mismatch Spark's int64): {offenders}"
    )


def test_no_oracle_returns_nonscalar(con):
    """LIST/STRUCT/MAP output columns crash the driver's canonicalizer
    (pandas sort_values → `unhashable type`). r01 arr_normalize and r04
    agg_collect_sorted both died this way; this bans the class."""
    offenders = {}
    for name, sql in sorted(ORACLE_SQL.items()):
        rel = con.sql(sql)
        bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
               if _is_nonscalar(str(t))]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"{len(offenders)} oracle(s) return non-scalar columns (driver "
        f"canonicalizer cannot hash list/struct/map cells): {offenders}"
    )


def test_no_oracle_emits_negative_zero():
    """−0.0 and +0.0 compare equal but have different bit patterns, so
    the driver's bit-sensitive value hash diverges when one engine emits
    the negative zero and the other the positive (r08 dq_l_diversity:
    DuckDB's `-sum(...)` over an all-zero sum yields −0.0 for 49
    single-language classes while Spark yields +0.0). This EXECUTES
    every registered oracle at the driver's compare scale (sf0.01) and
    asserts no float output cell is a negative zero — any negated
    aggregate added later must canonicalize with `+ 0.0` on both sides
    before registration."""
    import numpy as np

    sf_driver = os.environ.get("SPARK_GRAFT_SF_DIR_ORACLE",
                               "/root/testdata/sf0.01")
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_driver}/{t}.parquet'")
    offenders = {}
    for name, sql in sorted(ORACLE_SQL.items()):
        df = c.sql(sql).df()
        bad = []
        for col in df.columns:
            if df[col].dtype.kind == "f":
                vals = df[col].to_numpy()
                n_negzero = int(np.count_nonzero(
                    (vals == 0.0) & np.signbit(vals)))
                if n_negzero:
                    bad.append((col, n_negzero))
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"{len(offenders)} oracle(s) emit -0.0 cells (bit-sensitive "
        f"driver hash will mismatch Spark's +0.0; canonicalize the "
        f"expression with `+ 0.0` on both sides): {offenders}"
    )


def test_dq_l_diversity_entropy_zero_sign(spark):
    """The fixed query's Spark side AND oracle side must both emit
    +0.0 entropy for single-language classes (the r08 red row)."""
    import numpy as np
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES

    sf_driver = os.environ.get("SPARK_GRAFT_SF_DIR_ORACLE",
                               "/root/testdata/sf0.01")
    sdf = SPARK_QUERIES["dq_l_diversity"](spark, sf_driver).toPandas()
    singles = sdf[sdf["n_langs"] == 1]
    assert len(singles) > 0, "fixture lost its single-language classes"
    vals = singles["entropy_l"].to_numpy()
    assert np.all(vals == 0.0)
    assert not np.any(np.signbit(vals)), "Spark side emits -0.0"

    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_driver}/{t}.parquet'")
    odf = c.sql(ORACLE_SQL["dq_l_diversity"]).df()
    ovals = odf[odf["n_langs"] == 1]["entropy_l"].to_numpy()
    assert np.all(ovals == 0.0)
    assert not np.any(np.signbit(ovals)), "oracle side emits -0.0"


def test_no_spark_query_returns_nonscalar(spark):
    """The Spark side of every oracle-checked query must also emit only
    scalar columns — check the declared schemas without executing."""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = {}
    for name in sorted(ORACLE_SQL):
        df = SPARK_QUERIES[name](spark, SF_DIR)
        bad = [(f.name, f.dataType.simpleString()) for f in df.schema.fields
               if isinstance(f.dataType, (ArrayType, MapType, StructType))]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"{len(offenders)} registered Spark quer(ies) return non-scalar "
        f"columns (driver canonicalizer cannot hash them): {offenders}"
    )


def test_no_bankers_round_in_engine_code():
    """RATCHET for the banker's-rounding class (r09 ab_cuped_adjustment;
    r10 sweep): Python's builtin round() and numpy/pandas .round() are
    HALF-TO-EVEN, DuckDB's round() is HALF-AWAY-FROM-ZERO — a
    driver-side or UDF-side scalar snapped with the builtin and compared
    against an oracle that snaps with SQL round() diverges whenever a
    value lands on a representable half-boundary, and the difference
    fans into every downstream row. Engine code must snap with
    functions.math.round_half_away / round_half_away_arr instead.

    This AST-scans the package for builtin round() calls and pins the
    reviewed allowlist: sites where the rounded value is computed ONCE
    in Python and interpolated into BOTH engines as a literal (single
    source — no cross-engine rounding ever happens). Any new builtin
    round() site fails here until reviewed and either converted to
    round_half_away or added below with a single-source justification.
    (SQL-string `round(...)` is DuckDB/Spark-side and out of scope.)
    """
    import ast

    pkg = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "hadoop_digit_recognition_spark")
    sites = []
    for dirpath, _, filenames in os.walk(pkg):
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            with open(path) as f:
                tree = ast.parse(f.read())
            rel = os.path.relpath(path, pkg)
            for node in ast.walk(tree):
                if (isinstance(node, ast.Call)
                        and isinstance(node.func, ast.Name)
                        and node.func.id == "round"):
                    sites.append(rel)
    # Reviewed single-source sites: the rounded integers are embedded
    # as identical literals in the Spark expression AND the oracle SQL,
    # so no cross-engine rounding occurs (the _FS_W / _mlog idiom).
    allowed = {
        # Fellegi-Sunter field weights (dedup.py _FS_W): module
        # constants interpolated into both engines.
        "operators/dedup.py": 2,
        # HMM micro-log constants (_mlog + the Spark twin's lpi/la/lb):
        # same Python computation on fixed literals, both sides.
        "operators/pandas_udfs.py": 5,
    }
    from collections import Counter

    counts = Counter(sites)
    offenders = {f: n for f, n in counts.items()
                 if n > allowed.get(f, 0)}
    assert not offenders, (
        f"new builtin round() site(s) in engine code {offenders} — "
        f"banker's rounding diverges from DuckDB round() at half "
        f"boundaries; use functions.math.round_half_away(_arr) or "
        f"review as single-source and extend the allowlist")


def test_kruskal_wallis_wide_integer_exactness(spark, tmp_path):
    """The round-11 overflow fixture (VERDICT r10 ask #5): 4M orders
    with 95% of rows in one priority group. The dominant group's
    rank_sum is ~7.6e12, so rank_sum^2 ~ 5.8e25 and its R^2/n_g term is
    ~1.5e19 — past int64 (9.2e18) — while the double-quotient rounding
    error is rank_sum^2 * 2^-53 / n_g ~ 1.7e3 term units, so the
    retired floor(double*double/n) form drifts by hundreds of units
    from exact integer math. The wide-integer path must (a) hold
    Spark == DuckDB on the whole evidence table, (b) reproduce
    pure-Python exact integer arithmetic term-for-term, and (c) ship
    term as a lossless decimal string (int64 output would overflow
    right here)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_digit_recognition_spark.all_queries import (
        ORACLE_SQL, SPARK_QUERIES)
    from .oracle_harness import compare

    n = 4_000_000
    keys = np.arange(n, dtype=np.int64)
    # deterministic priorities: 38/40 of rows in the dominant group,
    # the 40k+38 (even) and 40k+39 (odd) residues in two minority groups
    pri = np.where(keys % 40 < 38, "1-DOMINANT",
                   np.where(keys % 2 == 0, "2-EVEN", "3-ODD"))
    tbl = pa.table({
        "o_orderkey": pa.array(keys),
        "o_orderpriority": pa.array(pri.tolist()),
        # price == key -> the global (price, orderkey) rank is key + 1
        "o_totalprice": pa.array(keys.astype(np.float64)),
    })
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/orders.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{d}/orders.parquet'")

    df = SPARK_QUERIES["dq_kruskal_wallis"](spark, d)
    compare(df, con, ORACLE_SQL["dq_kruskal_wallis"], "kw-overflow")

    # pure-Python exact ground truth (ranks are keys + 1 by construction)
    exact: dict[str, tuple[int, int]] = {}
    for g in ("1-DOMINANT", "2-EVEN", "3-ODD"):
        mask = pri == g
        rs = int((keys[mask] + 1).sum())
        exact[g] = (int(mask.sum()), rs)
    rows = {r["grp"]: r for r in df.collect()}
    assert set(rows) == set(exact)
    int64_max = (1 << 63) - 1
    overflowed = 0
    for g, (n_g, rs) in exact.items():
        r = rows[g]
        assert r["n_g"] == n_g and r["rank_sum"] == rs, (g, r)
        term = (rs * rs) // n_g
        assert isinstance(r["term"], str), type(r["term"])
        assert int(r["term"]) == term, (g, r["term"], term)
        if term > int64_max:
            overflowed += 1
        # the retired double path must actually be wrong here for the
        # dominant group, or this fixture isn't testing anything
        if g == "1-DOMINANT":
            import math
            assert rs * rs > 2 ** 53
            drifted = math.floor(float(rs) * float(rs) / n_g)
            assert drifted != term, "fixture no longer exercises drift"
    assert overflowed >= 1, "no term exceeded int64 — grow the fixture"
