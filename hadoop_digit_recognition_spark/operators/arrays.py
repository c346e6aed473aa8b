"""Array / vector operator layer (SURVEY.md §2.2 P3-P8, §2.4 M5-M10).

The reference's per-record transforms (normalize, sigmoid, quantize,
flatten, string-assembly) and its dense-matrix kernel, re-expressed as
JVM-side array expressions — F.transform / F.zip_with / F.aggregate /
F.posexplode — so they run inside whole-stage codegen with zero Python.
The GEMM (matrix.java:289-310) additionally gets a pure-relational form:
explode -> join on the inner index -> sum group by (i,j), the shape that
scales on a cluster when neither matrix is broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.math import sigmoid_scalar
from ..registry import query
from ..tables import load

# embeddings exploded to (vec_id, i, x) — shared SQL fragment
_V64 = ("SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i, "
        "CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings")


@query("arr_normalize", oracle=f"""
SELECT vec_id, i, round(x / 255.0, 9) AS norm
FROM ({_V64}) v
""")
def arr_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: x -> x/255 elementwise (rbmmapper.java:116-119), exploded to
    scalar (vec_id, i, norm) rows so the driver's value hasher — which
    cannot hash array cells — compares it exactly (mirrors arr_sigmoid).
    The array-valued form lives in arr_normalize_array (pytest-only)."""
    emb = load(spark, sf_dir, "embeddings")
    norm = F.transform("embedding",
                       lambda x: F.round(x.cast("double") / 255.0, 9))
    return (emb.select("vec_id", F.posexplode(norm).alias("i", "norm"))
            .select("vec_id", F.col("i").cast("bigint").alias("i"), "norm"))


def arr_normalize_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-valued twin of arr_normalize (pytest-only — the driver's
    hash comparator cannot hash array<double> cells, CORRECTNESS_r01)."""
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.transform("embedding",
                    lambda x: F.round(x.cast("double") / 255.0, 9)).alias("norm"))


@query("arr_sigmoid", oracle=f"""
SELECT vec_id, i, round(1.0/(1.0 + exp(-x)), 6) AS s
FROM ({_V64}) v
""")
def arr_sigmoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 as a pure SQL expression pipeline (the NumPy twin is
    rbm_forward_prop): transform -> posexplode."""
    emb = load(spark, sf_dir, "embeddings")
    sig = F.transform("embedding", lambda x: F.round(sigmoid_scalar(x), 6))
    return (emb.select("vec_id", F.posexplode(sig).alias("i", "s"))
            .select("vec_id", F.col("i").cast("bigint").alias("i"), "s"))


@query("arr_quantize", oracle=f"""
SELECT vec_id, i,
       CAST(floor(255.0/(1.0 + exp(-x))) AS BIGINT) AS q
FROM ({_V64}) v
""")
def arr_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: int(sigmoid(x)*255) — Java (int) truncation == floor on
    non-negative probabilities (propmapper.java:156)."""
    emb = load(spark, sf_dir, "embeddings")
    q = F.transform("embedding",
                    lambda x: F.floor(sigmoid_scalar(x) * 255.0).cast("long"))
    return (emb.select("vec_id", F.posexplode(q).alias("i", "q"))
            .select("vec_id", F.col("i").cast("bigint").alias("i"), "q"))


@query("arr_posexplode", oracle=f"""
SELECT vec_id, i, round(x, 6) AS x FROM ({_V64}) v
""")
def arr_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: flatten/enumerate — matrix -> (index, value) records, the shape
    the reference's mapper emits per weight (rbmmapper.java:259-268)."""
    emb = load(spark, sf_dir, "embeddings")
    return (emb.select("vec_id", F.posexplode("embedding").alias("i", "x"))
            .select("vec_id", F.col("i").cast("bigint").alias("i"),
                    F.round(F.col("x").cast("double"), 6).alias("x")))


@query("arr_concat_ws", oracle="""
SELECT vec_id,
       array_to_string(
         list_transform(embedding,
                        x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS VARCHAR)),
         ' ') AS line
FROM embeddings
""")
def arr_concat_ws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: string assembly — the reference writes each example back as a
    space-joined int line (propmapper.java:268-276)."""
    emb = load(spark, sf_dir, "embeddings")
    ints = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 1000).cast("long").cast("string"))
    return emb.select("vec_id", F.concat_ws(" ", ints).alias("line"))


@query("vec_self_dot", oracle=f"""
SELECT vec_id, round(sum(x * x), 6) AS dot,
       round(sqrt(sum(x * x)), 6) AS l2norm
FROM ({_V64}) v GROUP BY vec_id
""")
def vec_self_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 Hadamard + reduction via zip_with/aggregate (JVM-side fold)."""
    from ..functions.vector import dot_col
    emb = load(spark, sf_dir, "embeddings")
    d = dot_col(F.col("embedding"), F.col("embedding"))
    return emb.select("vec_id", F.round(d, 6).alias("dot"),
                      F.round(F.sqrt(d), 6).alias("l2norm"))


@query("vec_zip_ops", oracle=f"""
WITH v AS ({_V64}),
n AS (SELECT vec_id, count(*) AS sz FROM v GROUP BY vec_id)
SELECT a.vec_id,
       round(sum((a.x + b.x) * 2.0 - a.x / 2.0), 6) AS combined
FROM v a
JOIN n ON a.vec_id = n.vec_id
JOIN v b ON a.vec_id = b.vec_id AND b.i = n.sz - 1 - a.i
GROUP BY a.vec_id
""")
def vec_zip_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5/M6/M8/M9 composite: elementwise (x + reverse(x))*2 - x/2 then
    reduce — zip_with against the reversed vector, folded with aggregate."""
    emb = load(spark, sf_dir, "embeddings")
    combined = F.aggregate(
        F.zip_with("embedding", F.reverse(F.col("embedding")),
                   lambda x, y: (x.cast("double") + y.cast("double")) * 2.0
                   - x.cast("double") / 2.0),
        F.lit(0.0), lambda acc, x: acc + x)
    return emb.select("vec_id", F.round(combined, 6).alias("combined"))


@query("arr_stats", oracle="""
SELECT vec_id,
       round(CAST(list_max(embedding) AS DOUBLE), 6) AS mx,
       round(CAST(list_min(embedding) AS DOUBLE), 6) AS mn,
       CAST(len(embedding) AS BIGINT) AS sz,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
FROM embeddings
""")
def arr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector array statistics (size/min/max/sum) without exploding."""
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.round(F.array_max("embedding").cast("double"), 6).alias("mx"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("mn"),
        F.size("embedding").cast("bigint").alias("sz"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("bigint").alias("n_pos"))


@query("gemm_sql", oracle=f"""
WITH v AS ({_V64}),
w AS (SELECT i.i, j.j, 0.1*sin(CAST(i.i*16 + j.j AS DOUBLE)) AS w
      FROM range(64) i(i), range(16) j(j))
SELECT v.vec_id, w.j, round(sum(v.x * w.w), 6) AS h
FROM v JOIN w ON v.i = w.i
WHERE v.vec_id < 20
GROUP BY v.vec_id, w.j
""")
def gemm_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10 GEMM as pure relational algebra: explode both matrices, equi-join
    on the contraction index, sum grouped by (row, col). No UDF, no
    broadcast variable — the distributed-matmul form for when neither side
    fits in executor memory (vs the NumPy/broadcast form in rbm/cd1.py)."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    v = (emb.select("vec_id", F.posexplode("embedding").alias("i", "x"))
         .select("vec_id", F.col("i").cast("bigint").alias("i"),
                 F.col("x").cast("double").alias("x")))
    w = (spark.range(64).select(F.col("id").alias("i"))
         .crossJoin(spark.range(16).select(F.col("id").alias("j")))
         .select("i", "j",
                 (F.lit(0.1) * F.sin((F.col("i") * 16 + F.col("j"))
                                     .cast("double"))).alias("w")))
    return (v.join(F.broadcast(w), "i")
            .groupBy("vec_id", "j")
            .agg(F.round(F.sum(F.col("x") * F.col("w")), 6).alias("h")))


@query("matrix_transpose_sql", oracle="""
WITH v AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
                  CAST(unnest(embedding) AS DOUBLE) AS x
           FROM embeddings WHERE vec_id < 8)
SELECT i AS r, vec_id AS c, round(x, 6) AS x FROM v
""")
def matrix_transpose_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 transpose in relational form (matrix.java:161-170): a matrix
    stored as (row, col, value) transposes by swapping the key roles —
    a pure projection, no data movement at all (the reference allocates
    and copies an n x m array). Here: the first 8 embeddings as an
    8 x 64 matrix -> its 64 x 8 transpose."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 8)
    return (emb.select("vec_id", F.posexplode("embedding").alias("i", "x"))
            .select(F.col("i").cast("bigint").alias("r"),
                    F.col("vec_id").alias("c"),
                    F.round(F.col("x").cast("double"), 6).alias("x")))


@query("matrix_reshape_colpacked", oracle="""
WITH v AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS k,
                  CAST(unnest(embedding) AS DOUBLE) AS x
           FROM embeddings WHERE vec_id = 0)
SELECT k % 8 AS i, k // 8 AS j, round(x, 6) AS x FROM v
""")
def matrix_reshape_colpacked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1's COLUMN-PACKED reshape (matrix.java:40-53: A[i][j] = v[i+j*m])
    — the layout whose clash with the row-major update indexing is
    reference defect D3. Implemented faithfully here as the explicit
    index map k -> (k mod m, k div m) on a 64-vector viewed as 8 x 8, so
    the semantics are on record even though the engine's own weight
    handling is consistently row-major."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0)
    return (emb.select(F.posexplode("embedding").alias("k", "x"))
            .select((F.col("k") % 8).cast("bigint").alias("i"),
                    F.expr("k div 8").alias("j"),
                    F.round(F.col("x").cast("double"), 6).alias("x")))


@query("arr_explode_outer", oracle="""
WITH t AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN []
              ELSE string_split(text, ' ')[1:2] END AS w
  FROM documents
)
SELECT t.doc_id, u.word
FROM t LEFT JOIN (SELECT doc_id, unnest(w) AS word FROM t) u
  ON u.doc_id = t.doc_id
""")
def arr_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer semantics: rows with empty arrays SURVIVE as a
    single NULL row (plain explode silently drops them — the classic
    row-loss bug in flattening pipelines). Every 3rd doc's array is
    emptied to make the difference observable; the oracle states the
    outer behavior as a LEFT JOIN against the unnested form."""
    docs = load(spark, sf_dir, "documents")
    w = F.when(F.col("doc_id") % 3 == 0, F.array().cast("array<string>")) \
         .otherwise(F.slice(F.split("text", " "), 1, 2))
    return (docs.select("doc_id", w.alias("w"))
            .select("doc_id", F.explode_outer("w").alias("word")))


@query("arr_higher_order_funcs", oracle=f"""
WITH v AS ({_V64})
SELECT vec_id,
       CAST(count(CASE WHEN x > 0 THEN 1 END) AS BIGINT) AS n_pos,
       CAST(max(CASE WHEN x > 2.5 THEN 1 ELSE 0 END) AS BOOLEAN)
         AS any_big,
       CAST(min(CASE WHEN x > -10 THEN 1 ELSE 0 END) AS BOOLEAN)
         AS all_gt_neg10,
       round(sum(CASE WHEN x > 0 THEN x * x ELSE 0 END), 6)
         AS pos_sq_sum
FROM v GROUP BY vec_id
""")
def arr_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function surface in one pass: `filter` (keep
    positives), `exists` (any element > 2.5), `forall` (all > -10), and
    `aggregate` over the filtered array (sum of squares) — all JVM
    lambda expressions inside whole-stage codegen, zero UDFs. The oracle
    states each as a conditional aggregate over the exploded vector —
    the relational semantics the lambda forms must reproduce."""
    emb = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    pos = F.filter(v, lambda x: x > 0)
    return emb.select(
        "vec_id",
        F.size(pos).cast("bigint").alias("n_pos"),
        F.exists(v, lambda x: x > 2.5).alias("any_big"),
        F.forall(v, lambda x: x > -10).alias("all_gt_neg10"),
        F.round(F.aggregate(pos, F.lit(0.0), lambda a, x: a + x * x), 6)
        .alias("pos_sq_sum"))
