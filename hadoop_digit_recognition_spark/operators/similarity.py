"""Similarity search over embedding columns (north-star requirement).

Three physical strategies:

- `sim_topk_cosine`: exact brute-force top-k — broadcast the (small) query
  set against all candidates, JVM-side dot products via zip_with/aggregate,
  per-query top-k window. The exact baseline; cost O(|Q| * N * d).
- `sim_ann_lsh`: random-hyperplane LSH — deterministic sin-derived planes,
  sign-bit bucket key, candidates restricted to same-bucket, exact rerank
  inside buckets. Bucketing turns the all-pairs cross join into an
  equi-join on the bucket key.
- `sim_ivf_topk`: IVF — KMeans coarse quantizer assigns every vector to a
  cell; each query probes its `NPROBE` nearest cells and reranks exactly
  inside them. The standard 100 TB ANN layout (FAISS-style): the index is
  a partitioning, the search an equi-join on cell id, and recall/cost is
  one knob (NPROBE/K_CELLS).

Rankings sort on the ROUNDED similarity plus id tiebreaker so results are
reproducible across engines (raw last-ulp float differences cannot flip
ranks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.vector import dot_col, l2norm_col
from ..registry import query
from ..tables import load_parallel

N_QUERIES = 30   # vec_id < 30 are the query vectors
TOP_K = 5
N_PLANES = 8     # LSH hyperplanes -> 256 buckets
K_CELLS = 16     # IVF coarse-quantizer cells
NPROBE = 4       # IVF cells probed per query

_E = "SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings"


@query("sim_topk_cosine", oracle=f"""
WITH e0 AS ({_E}),
e AS (SELECT * FROM e0
      WHERE list_aggregate(list_transform(emb, x -> x * x), 'sum') > 0),
q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         round(list_cosine_similarity(q.emb, c.emb), 6) AS cos
  FROM q JOIN e c ON c.vec_id != q.vec_id
),
ranked AS (
  SELECT qid, cid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
  FROM scored
)
SELECT qid, cid, cos, rnk FROM ranked WHERE rnk <= {TOP_K}
""")
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast query side, windowed top-k.

    Norms are precomputed once per vector at a projection boundary, so the
    per-pair work is ONE zip_with/aggregate pass (dot product) instead of
    three — with arithmetic identical to cos = dot/(sqrt(aa)*sqrt(bb)),
    keeping the rounded values bit-equal to the oracle. Zero-norm
    vectors (failed/padded embeddings — absent from the fixtures but
    real in production) are dropped IDENTICALLY on both sides before
    any pairwise compare: cosine is undefined for them, and Spark's
    ANSI division would otherwise raise where DuckDB returns a value
    (caught by the degenerate-embeddings parity test)."""
    emb = (load_parallel(spark, sf_dir, "embeddings")
           .select("vec_id", "embedding",
                   l2norm_col(F.col("embedding")).alias("nrm"))
           .filter(F.col("nrm") > 0))
    q = (emb.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"),
                 F.col("nrm").alias("qn")))
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"),
                   F.col("nrm").alias("cn"))
    scored = (F.broadcast(q).crossJoin(c)
              .filter(F.col("cid") != F.col("qid"))
              .select("qid", "cid",
                      F.round(dot_col(F.col("qe"), F.col("ce"))
                              / (F.col("qn") * F.col("cn")), 6).alias("cos")))
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rnk") <= TOP_K))


# LSH planes: P[p][i] = sin((p+1) * (i + 0.5)) — closed form both engines
# can evaluate; the +0.5 phase keeps arguments off integer multiples of
# pi, so plane dot products are bounded away from exact zero sign-flips
# (measured min |dot| ~2e-5 at sf0.1, ten orders above cross-engine sin
# ulp noise).
#
# WHY FREQUENCY-INDEXED, NOT PHASE-SHIFTED: the previous family
# sin(p*64 + i + 0.5) looked random but was RANK-2 DEGENERATE —
# sin(i + phi_p) = sin(i)cos(phi_p) + cos(i)sin(phi_p), so every
# "hyperplane" lay in the 2-D span of {sin(i), cos(i)} and P planes
# could cut space into at most 2P sectors (measured: exactly 14
# occupied buckets at 7 planes on 2000 isotropic vectors, max bucket
# 265 — the bucket self-join cost was ~10x the balanced model and more
# planes could never fix it). Distinct FREQUENCIES are Fourier-
# independent: sin(k*t) for k = 1..{PLANES_MAX} sampled at t = i+0.5
# spans a {PLANES_MAX}-dim space, giving genuinely independent sign
# bits — measured sum|bucket|^2 within 7% of the perfectly-balanced
# ideal at 5 and 7 planes on the same vectors.
_PLANES = (f"SELECT p.p, i.i, "
           f"sin(CAST(p.p + 1 AS DOUBLE) * (CAST(i.i AS DOUBLE) + 0.5)) AS w "
           f"FROM range({N_PLANES}) p(p), range(64) i(i)")

# Zero-norm vectors (failed/padded embeddings) are excluded from the
# LSH index at the source: they cannot be cosine-compared (ANSI
# division raises on the zero norm product) and their sign-bit bucket
# would be meaningless all-zero-dots noise. Spark twin: _bucket_df's
# norm filter. Fleet-wide parity for every bucket-family consumer.
_BUCKETS = f"""
nz AS (SELECT vec_id, embedding FROM embeddings
       WHERE list_aggregate(list_transform(embedding::DOUBLE[],
                                           x -> x * x), 'sum') > 0),
v AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x FROM nz),
pl AS ({_PLANES}),
dots AS (
  SELECT v.vec_id, pl.p, sum(v.x * pl.w) AS d
  FROM v JOIN pl ON v.i = pl.i GROUP BY v.vec_id, pl.p
),
bucket AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN d > 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END) AS BIGINT)
           AS bkt
  FROM dots GROUP BY vec_id
)
"""


@query("sim_ann_lsh_buckets", oracle=f"""
WITH {_BUCKETS}
SELECT bkt, count(*) AS n_vectors FROM bucket GROUP BY bkt
""")
def sim_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket histogram — the partition layout of the ANN index."""
    b = _bucket_df(spark, sf_dir)
    return b.groupBy("bkt").agg(F.count(F.lit(1)).alias("n_vectors"))


def _bucket_df(spark: SparkSession, sf_dir: str,
               n_planes: int = N_PLANES, freq_offset: int = 0,
               emb: DataFrame | None = None) -> DataFrame:
    """(vec_id, embedding, bkt): sign-bit bucket of each vector.

    Plane dots ride zip_with/aggregate over a broadcast plane array —
    no explode, no shuffle; the groupBy in the SQL oracle is replaced by
    a per-row array fold. Zero-norm vectors are excluded from the index
    (cosine-undefined; the oracle's nz CTE is the identical guard).
    freq_offset selects an INDEPENDENT plane table (frequencies
    offset+1 .. offset+n_planes) — the multi-table LSH building block.
    `emb` lets a caller that already loaded+filtered (or persisted) the
    corpus pass it in, so multi-table builds don't rescan per table."""
    if emb is None:
        emb = (load_parallel(spark, sf_dir, "embeddings")
               .filter(l2norm_col(F.col("embedding")) > 0))
    planes = [
        F.array(*[F.sin(F.lit(float(p + 1 + freq_offset) * (float(i) + 0.5)))
                  for i in range(64)])
        for p in range(n_planes)
    ]
    bkt = None
    for p in range(n_planes):
        d = dot_col(F.col("embedding"), planes[p])
        bit = F.when(d > 0, F.lit(2 ** p).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        bkt = bit if bkt is None else (bkt + bit)
    return emb.select("vec_id", "embedding", bkt.alias("bkt"))


# Banded multi-table sign-LSH for NEAR-DUP PAIR RECALL. The kNN-graph
# family above wants every vector to land in exactly one (reasonably
# small) bucket per table — top-k inside the bucket does the rest. The
# near-dup PAIR queries (dedup_embedding_lsh, pipeline_embedding_dedup)
# have a harder target: catch pairs at cos >= 0.4, i.e. theta up to
# ~66 deg, where the per-plane sign-collision probability is only
# 1 - theta/pi ~ 0.63 — a single 8-bit table retains 0.63^8 ~ 2.5% of
# them. The standard answer is the SAME banding S-curve the MinHash
# family tunes with dedup_lsh_band_tuning: L tables of r bits each
# catch a pair with probability 1 - (1 - p^r)^L. At r=4, L=4 and
# p=0.63 that is ~0.50 (measured 26/59 at sf0.01, 483/920 at sf0.1),
# with candidate volume sum over (band, bucket) of |bucket|^2 — 4.4x
# below all-pairs at the fixtures, and tuned at scale by growing r
# with log n (the adaptive-planes posture) while raising L to hold the
# recall point. The 16 frequencies 1..16 give 4 independent tables for
# free (Fourier-independence of distinct integer frequencies — see the
# rank-2 degeneracy note above for why frequency-indexed matters).
BAND_BITS = 4       # r: sign bits per band table
N_BAND_TABLES = 4   # L: independent band tables (frequencies 1..16)

EMB_BAND_BUCKETS_SQL = f"""
nz AS (SELECT vec_id, embedding FROM embeddings
       WHERE list_aggregate(list_transform(embedding::DOUBLE[],
                                           x -> x * x), 'sum') > 0),
v AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x FROM nz),
plb AS (SELECT p.p, i.i,
               sin(CAST(p.p + 1 AS DOUBLE) * (CAST(i.i AS DOUBLE) + 0.5)) AS w
        FROM range({BAND_BITS * N_BAND_TABLES}) p(p), range(64) i(i)),
dotsb AS (
  SELECT v.vec_id, plb.p, sum(v.x * plb.w) AS d
  FROM v JOIN plb ON v.i = plb.i GROUP BY v.vec_id, plb.p
),
bb AS (
  SELECT vec_id, CAST(p // {BAND_BITS} AS BIGINT) AS band,
         CAST(sum(CASE WHEN d > 0 THEN CAST(pow(2, p % {BAND_BITS}) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS bkt
  FROM dotsb GROUP BY vec_id, p // {BAND_BITS}
)
"""


def _band_bucket_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding, band, bkt): one row per vector per band
    table — the banded sign-LSH index, Spark twin of
    EMB_BAND_BUCKETS_SQL. All {BAND_BITS * N_BAND_TABLES} plane dots
    are per-row array folds over broadcast literals (narrow, no
    shuffle); posexplode emits the L band keys."""
    emb = (load_parallel(spark, sf_dir, "embeddings")
           .filter(l2norm_col(F.col("embedding")) > 0))

    def plane(p: int):
        return F.array(*[F.sin(F.lit(float(p + 1) * (float(i) + 0.5)))
                         for i in range(64)])

    band_keys = []
    for g in range(N_BAND_TABLES):
        key = None
        for j in range(BAND_BITS):
            d = dot_col(F.col("embedding"), plane(g * BAND_BITS + j))
            bit = (F.when(d > 0, F.lit(2 ** j).cast("bigint"))
                   .otherwise(F.lit(0).cast("bigint")))
            key = bit if key is None else key + bit
        band_keys.append(key)
    return (emb.select("vec_id", "embedding",
                       F.posexplode(F.array(*band_keys)).alias("band", "bkt"))
            .select("vec_id", "embedding",
                    F.col("band").cast("bigint").alias("band"), "bkt"))


# Adaptive plane count: the production answer to SCALE.md watch #2 (the
# fixed-plane Σ|bucket|² quadratic measured at sf1). Expected bucket
# occupancy under a balanced sign-bit hash is n / 2^planes, so the
# SMALLEST p with n <= BUCKET_TARGET * 2^p pins the expected width into
# (BUCKET_TARGET/2, BUCKET_TARGET] at EVERY corpus size — the self-join
# cost stays Σ|bucket|² ≈ n * BUCKET_TARGET, linear in n, instead of
# quadratic at fixed planes. Integer-only comparison (no log2 float)
# so Spark and DuckDB derive bit-identical plane counts.
PLANES_MIN, PLANES_MAX, BUCKET_TARGET = 4, 20, 16


def _adaptive_n_planes(n: int) -> int:
    for p in range(PLANES_MIN, PLANES_MAX):
        if n <= BUCKET_TARGET << p:
            return p
    return PLANES_MAX


@query("sim_ann_lsh", oracle=f"""
WITH {_BUCKETS},
e AS ({_E}),
be AS (SELECT b.vec_id, b.bkt, e.emb FROM bucket b JOIN e ON e.vec_id = b.vec_id),
q AS (SELECT * FROM be WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         round(list_cosine_similarity(q.emb, c.emb), 6) AS cos
  FROM q JOIN be c ON c.bkt = q.bkt AND c.vec_id != q.vec_id
),
ranked AS (
  SELECT qid, cid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
  FROM scored
)
SELECT qid, cid, cos, rnk FROM ranked WHERE rnk <= {TOP_K}
""")
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: equi-join on the LSH bucket key replaces the
    cross join; exact cosine rerank inside each bucket. Recall trades off
    with N_PLANES; the bucket equi-join is the piece that scales."""
    be = _bucket_df(spark, sf_dir).withColumn(
        "nrm", l2norm_col(F.col("embedding")))
    q = (be.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("qid"), F.col("bkt").alias("qbkt"),
                 F.col("embedding").alias("qe"), F.col("nrm").alias("qn")))
    c = be.select(F.col("vec_id").alias("cid"), F.col("bkt").alias("cbkt"),
                  F.col("embedding").alias("ce"), F.col("nrm").alias("cn"))
    scored = (c.join(F.broadcast(q), (F.col("cbkt") == F.col("qbkt"))
                     & (F.col("cid") != F.col("qid")))
              .select("qid", "cid",
                      F.round(dot_col(F.col("qe"), F.col("ce"))
                              / (F.col("qn") * F.col("cn")), 6).alias("cos")))
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rnk") <= TOP_K))


@query("sim_ivf_topk", rows_only=(
    "MLlib KMeans index training is iterative and JVM-seeded — its "
    "centroids are not SQL-replayable (sim_ivf_det_topk is the "
    "oracle-exact twin)",
    "test_ivf_recall_vs_exact"))
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k (FAISS layout, Spark-first).

    Index build: MLlib KMeans (seeded) fits K_CELLS centroids; every
    vector gets its nearest cell id in one narrow pass (the centroids fold
    in as array literals — driver state is K_CELLS x d doubles, within the
    weight-matrix budget). Search: each query expands to its NPROBE
    nearest cells (posexplode), candidates arrive via equi-join on cell
    id, exact cosine rerank inside. Graded by tests/test_llm_ops recall
    against the exact top-k."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = (load_parallel(spark, sf_dir, "embeddings")
           .select("vec_id", "embedding",
                   l2norm_col(F.col("embedding")).alias("nrm"))
           .filter(F.col("nrm") > 0))
    train = emb.withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>")))
    model = KMeans(k=K_CELLS, seed=42, maxIter=20).fit(train)
    centers = [c.tolist() for c in model.clusterCenters()]

    v = F.col("embedding").cast("array<double>")
    d2 = [F.aggregate(F.zip_with(v, F.lit(c), lambda x, cc: (x - cc) * (x - cc)),
                      F.lit(0.0), lambda a, y: a + y) for c in centers]
    cells_ranked = F.transform(
        F.array_sort(F.array(*[F.struct(d.alias("d"), F.lit(i).alias("c"))
                               for i, d in enumerate(d2)])),
        lambda s: s["c"])
    indexed = emb.withColumn("cell", F.element_at(cells_ranked, 1))

    q = (indexed.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"),
                 F.col("nrm").alias("qn"),
                 F.explode(F.slice(cells_ranked, 1, NPROBE)).alias("cell")))
    c = indexed.select(F.col("vec_id").alias("cid"),
                       F.col("embedding").alias("ce"),
                       F.col("nrm").alias("cn"), "cell")
    scored = (c.join(F.broadcast(q), ["cell"])
              .filter(F.col("cid") != F.col("qid"))
              .select("qid", "cid",
                      F.round(dot_col(F.col("qe"), F.col("ce"))
                              / (F.col("qn") * F.col("cn")), 6).alias("cos")))
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rnk") <= TOP_K).select("qid", "cid", "cos", "rnk"))


KNN_K = 3

# TWO-table ADAPTIVE bucket family (round-8 convergence, VERDICT r07
# ask #2): the default kNN-graph build now combines BOTH production
# fixes in one path — adaptive plane count (planes ~ log2 n so the
# bucket self-join stays Σ|bucket|² ≈ n·BUCKET_TARGET, linear) AND two
# independent plane tables (table B at frequencies planes+1 .. 2·planes,
# the connectivity trick that rescued NSW recall from 0.013). Emits the
# same `bucket` / `bucket_b` CTE names the fixed family used, so every
# two-table consumer oracle swaps preamble without touching its body.
_BUCKETS_2T = f"""
nz AS (SELECT vec_id, embedding FROM embeddings
       WHERE list_aggregate(list_transform(embedding::DOUBLE[],
                                           x -> x * x), 'sum') > 0),
np AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM nz),
pc AS (SELECT coalesce(min(p), {PLANES_MAX}) AS planes
       FROM generate_series({PLANES_MIN}, {PLANES_MAX}) g(p), np
       WHERE np.cnt <= ({BUCKET_TARGET}::BIGINT << p)),
v AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x FROM nz),
pl2 AS (SELECT t.tbl, g.p, i.i,
               sin(CAST(g.p + 1 + t.tbl * pc.planes AS DOUBLE)
                   * (CAST(i.i AS DOUBLE) + 0.5)) AS w
        FROM generate_series(0, {PLANES_MAX} - 1) g(p),
             generate_series(0, 63) i(i),
             (SELECT unnest([0, 1]) AS tbl) t, pc
        WHERE g.p < pc.planes),
dots2 AS (SELECT v.vec_id, pl2.tbl, pl2.p, sum(v.x * pl2.w) AS d
          FROM v JOIN pl2 ON v.i = pl2.i GROUP BY v.vec_id, pl2.tbl, pl2.p),
bucket2 AS (
  SELECT vec_id, tbl,
         CAST(sum(CASE WHEN d > 0 THEN CAST(pow(2, p) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS bkt
  FROM dots2 GROUP BY vec_id, tbl),
bucket AS (SELECT vec_id, bkt FROM bucket2 WHERE tbl = 0),
bucket_b AS (SELECT vec_id, bkt FROM bucket2 WHERE tbl = 1)
"""


@query("sim_knn_graph", eager=True, oracle=f"""
WITH {_BUCKETS_2T},
e AS ({_E}),
be_a AS (SELECT b.vec_id, b.bkt, e.emb
         FROM bucket b JOIN e ON e.vec_id = b.vec_id),
be_b AS (SELECT b.vec_id, b.bkt, e.emb
         FROM bucket_b b JOIN e ON e.vec_id = b.vec_id),
scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         round(list_cosine_similarity(q.emb, c.emb), 6) AS cos
  FROM be_a q JOIN be_a c ON c.bkt = q.bkt AND c.vec_id != q.vec_id
  UNION
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         round(list_cosine_similarity(q.emb, c.emb), 6) AS cos
  FROM be_b q JOIN be_b c ON c.bkt = q.bkt AND c.vec_id != q.vec_id
),
ranked AS (
  SELECT qid, cid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
  FROM scored
)
SELECT qid, cid, cos, rnk FROM ranked WHERE rnk <= {KNN_K}
""")
def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN GRAPH: every vector is a query (the all-pairs
    version of sim_ann_lsh) — the neighbor-graph primitive that feeds
    embedding near-dup clustering and graph-based ANN indexes at corpus
    scale.

    TWO independent LSH tables at an ADAPTIVE plane count p ~ log2(n)
    (frequency sets 1..p and p+1..2p), candidate pairs unioned before
    the top-k cut — since round 8 the DEFAULT build carries both
    production fixes at once (VERDICT r07 ask #2; previously the
    adaptive count lived only in sim_knn_graph_adaptive and the default
    stayed at the fixed 8 planes measured quadratic-ish at sf1):

    * ADAPTIVE planes: one combiner'd count of the nonzero-norm corpus
      picks the smallest p with n <= {BUCKET_TARGET} * 2^p (integer
      comparison, clamped to [{PLANES_MIN}, {PLANES_MAX}]), pinning the
      expected bucket width into ({BUCKET_TARGET // 2}, {BUCKET_TARGET}]
      at every corpus size — the self-join cost Σ|bucket|² stays
      LINEAR in n (measured 0.84x of the n*{BUCKET_TARGET} model at
      200k vectors, SCALE.md round 7).
    * TWO tables: one table alone makes the kNN graph a DISJOINT UNION
      of per-bucket components (edges never cross a bucket boundary),
      which strands any graph walk at its entry component — measured
      NSW recall collapsed 0.09 -> 0.013 on the single-table graph. A
      pair split by table A collides in table B independently, so the
      unioned graph is connected with high probability — the same
      reason HNSW keeps long-range links.

    The DuckDB oracle derives the SAME plane count from the SAME count
    with the same integer comparison (_BUCKETS_2T's pc CTE), so the
    adaptivity itself is hash-graded. Scale shape: two SELF equi-joins
    on the bucket keys (no broadcast — both sides are the full corpus,
    so SMJ/shuffle-hash on `bkt`), exact cosine rerank inside buckets,
    pair-dedup via UNION distinct, per-vector top-k via window. The
    exact-all-pairs ground truth twin is dedup_embedding_cosine
    (operators/dedup.py)."""
    # ONE corpus load+filter frame shared by the adaptive count and
    # both plane tables. Deliberately NOT persisted: caching the scan
    # was MEASURED 3x slower for downstream consumers (19.6s -> 7.1s
    # for ml_knn_classifier_eval on a plain session) — the
    # InMemoryRelation boundary costs more than re-running a pruned
    # columnar parquet scan, the classic cache-vs-rescan trade at
    # small-to-mid scan sizes.
    emb0 = (load_parallel(spark, sf_dir, "embeddings")
            .filter(l2norm_col(F.col("embedding")) > 0))
    n_planes = _adaptive_n_planes(emb0.count())

    def in_bucket_pairs(freq_offset: int) -> DataFrame:
        be = _bucket_df(spark, sf_dir, n_planes=n_planes,
                        freq_offset=freq_offset, emb=emb0).withColumn(
            "nrm", l2norm_col(F.col("embedding")))
        q = be.select(F.col("vec_id").alias("qid"),
                      F.col("bkt").alias("qbkt"),
                      F.col("embedding").alias("qe"),
                      F.col("nrm").alias("qn"))
        c = be.select(F.col("vec_id").alias("cid"),
                      F.col("bkt").alias("cbkt"),
                      F.col("embedding").alias("ce"),
                      F.col("nrm").alias("cn"))
        return (q.join(c, (F.col("qbkt") == F.col("cbkt"))
                       & (F.col("qid") != F.col("cid")))
                .select("qid", "cid",
                        F.round(dot_col(F.col("qe"), F.col("ce"))
                                / (F.col("qn") * F.col("cn")), 6)
                        .alias("cos")))

    scored = (in_bucket_pairs(0)
              .unionByName(in_bucket_pairs(n_planes))
              .distinct())
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rnk") <= KNN_K))


def knn_graph_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sim_knn_graph's result memoized + persisted per (session, sf_dir)
    — the similarity family's signature store (the minhash_sig_arrays
    precedent, registered in dedup's _SIG_CACHE so clear_signature_cache
    evicts it between cold bench reps). Eight registered consumers (LOF,
    both NN-Descent rounds, the recall curve, mutual-kNN, greedy search,
    graph recall eval, the kNN label evals) each reference the graph
    SEVERALLY inside one plan; composed lazily, the bucketed build
    subtree was duplicated per reference — sim_lof_outliers' physical
    plan carried 160 parquet scans / 352 exchanges (plans/r11/
    sim_lof_outliers_before.txt) for a 32k-row edge table. One
    InMemoryRelation boundary collapses that to a single build per
    query (guide §5: cache exactly the reused, expensive-to-recompute
    frame)."""
    from .dedup import memo_persist

    return memo_persist(spark, f"knn_graph::{sf_dir}",
                        lambda: sim_knn_graph(spark, sf_dir))


@query("sim_knn_graph_adaptive", eager=True, oracle=f"""
WITH nz AS (SELECT vec_id, embedding FROM embeddings
            WHERE list_aggregate(list_transform(embedding::DOUBLE[],
                                                x -> x * x), 'sum') > 0),
np AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM nz),
pc AS (SELECT coalesce(min(p), {PLANES_MAX}) AS planes
       FROM generate_series({PLANES_MIN}, {PLANES_MAX}) g(p), np
       WHERE np.cnt <= ({BUCKET_TARGET}::BIGINT << p)),
v AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x FROM nz),
pl AS (SELECT g.p, i.i,
              sin(CAST(g.p + 1 AS DOUBLE) * (CAST(i.i AS DOUBLE) + 0.5)) AS w
       FROM generate_series(0, {PLANES_MAX} - 1) g(p),
            generate_series(0, 63) i(i), pc
       WHERE g.p < pc.planes),
dots AS (
  SELECT v.vec_id, pl.p, sum(v.x * pl.w) AS d
  FROM v JOIN pl ON v.i = pl.i GROUP BY v.vec_id, pl.p
),
bucket AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN d > 0 THEN CAST(pow(2, p) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS bkt
  FROM dots GROUP BY vec_id
),
e AS ({_E}),
be AS (SELECT b.vec_id, b.bkt, e.emb
       FROM bucket b JOIN e ON e.vec_id = b.vec_id),
scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         round(list_cosine_similarity(q.emb, c.emb), 6) AS cos
  FROM be q JOIN be c ON c.bkt = q.bkt AND c.vec_id != q.vec_id
),
ranked AS (
  SELECT qid, cid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
  FROM scored
)
SELECT qid, cid, cos, rnk FROM ranked WHERE rnk <= {KNN_K}
""")
def sim_knn_graph_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN graph with ADAPTIVE plane count — the production form of
    sim_knn_graph and the answer to the measured fixed-plane quadratic
    (SCALE.md watch #2: at N_PLANES=8 the bucket self-join is
    Σ|bucket|² ≈ n²/256, which the sf1 rehearsal measured dominating
    the NSW build). Step 1 MEASURES the corpus (one count of the
    nonzero-norm vectors — the classic "analyze then index" pass every
    ANN index build starts with); step 2 picks the smallest plane count
    whose expected bucket width is <= {BUCKET_TARGET} vectors
    (integer-only comparison, clamped to [{PLANES_MIN}, {PLANES_MAX}]);
    step 3 is sim_knn_graph's bucket self-join + windowed top-{KNN_K}
    on those planes. The DuckDB oracle derives the SAME plane count
    from the SAME count with the same integer comparison, so the
    result is hash-exact — the adaptivity itself is oracle-graded, at
    sf0.01 (500 vectors -> 5 planes) and sf0.1 (2000 -> 7) alike.

    Scale shape: the self-join cost becomes Σ|bucket|² ≈
    n x {BUCKET_TARGET} — LINEAR in corpus size — and the plane count
    grows ~log2(n) (a 1e9-vector corpus gets {PLANES_MAX} planes /
    1M buckets), which is exactly the "planes ~ log N" posture the
    fixed-plane query's docstring documents as its tuning knob. The
    extra count() is one combiner'd scan returning a single scalar.
    Since round 8 the DEFAULT sim_knn_graph carries this adaptive count
    too (plus the two-table connectivity union); this single-table
    query remains as the minimal oracle-graded demonstration of the
    adaptive mechanism itself."""
    emb = (load_parallel(spark, sf_dir, "embeddings")
           .filter(l2norm_col(F.col("embedding")) > 0))
    n_planes = _adaptive_n_planes(emb.count())
    be = _bucket_df(spark, sf_dir, n_planes=n_planes, emb=emb).withColumn(
        "nrm", l2norm_col(F.col("embedding")))
    q = be.select(F.col("vec_id").alias("qid"), F.col("bkt").alias("qbkt"),
                  F.col("embedding").alias("qe"), F.col("nrm").alias("qn"))
    c = be.select(F.col("vec_id").alias("cid"), F.col("bkt").alias("cbkt"),
                  F.col("embedding").alias("ce"), F.col("nrm").alias("cn"))
    scored = (q.join(c, (F.col("qbkt") == F.col("cbkt"))
                     & (F.col("qid") != F.col("cid")))
              .select("qid", "cid",
                      F.round(dot_col(F.col("qe"), F.col("ce"))
                              / (F.col("qn") * F.col("cn")), 6).alias("cos")))
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rnk") <= KNN_K))


_IVF_DET_ORACLE = f"""
WITH nz AS (SELECT vec_id, embedding FROM embeddings
            WHERE list_aggregate(list_transform(embedding::DOUBLE[],
                                                x -> x * x), 'sum') > 0),
e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             unnest(embedding)::DOUBLE AS x FROM nz),
seed AS (SELECT vec_id AS cid, i, x FROM e WHERE vec_id < {K_CELLS}),
d1 AS (SELECT e.vec_id, s.cid, round(sum((e.x - s.x) * (e.x - s.x)), 9) AS d2
       FROM e JOIN seed s ON s.i = e.i GROUP BY e.vec_id, s.cid),
a1 AS (SELECT vec_id, cid FROM (
         SELECT vec_id, cid,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         FROM d1) WHERE rn = 1),
c1 AS (SELECT a1.cid, e.i, avg(e.x) AS x
       FROM a1 JOIN e USING (vec_id) GROUP BY a1.cid, e.i),
d2_ AS (SELECT e.vec_id, c.cid, round(sum((e.x - c.x) * (e.x - c.x)), 9) AS d2
        FROM e JOIN c1 c ON c.i = e.i GROUP BY e.vec_id, c.cid),
rankcells AS (SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY d2, cid) AS rn
              FROM d2_),
cell AS (SELECT vec_id, cid AS cell FROM rankcells WHERE rn = 1),
probe AS (SELECT vec_id AS qid, cid AS cell FROM rankcells
          WHERE rn <= {NPROBE} AND vec_id < {N_QUERIES}),
nrm AS (SELECT vec_id, sqrt(sum(x * x)) AS n FROM e GROUP BY vec_id),
dots AS (SELECT p.qid, c2.vec_id AS cid, sum(eq.x * ec.x) AS dp
         FROM probe p
         JOIN cell c2 ON c2.cell = p.cell
         JOIN e eq ON eq.vec_id = p.qid
         JOIN e ec ON ec.vec_id = c2.vec_id AND ec.i = eq.i
         WHERE c2.vec_id <> p.qid
         GROUP BY p.qid, c2.vec_id),
scored AS (SELECT d.qid, d.cid, round(d.dp / (nq.n * nc.n), 6) AS cos
           FROM dots d
           JOIN nrm nq ON nq.vec_id = d.qid
           JOIN nrm nc ON nc.vec_id = d.cid),
ranked AS (SELECT qid, cid, cos,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY cos DESC, cid) AS rnk
           FROM scored)
SELECT qid, cid, cos, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {TOP_K}
"""


@query("sim_ivf_det_topk", oracle=_IVF_DET_ORACLE)
def sim_ivf_det_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with a fully DETERMINISTIC quantizer — the oracle-exact
    twin of sim_ivf_topk (whose MLlib-KMeans index is seeded but not
    SQL-replayable). Index: first-K_CELLS seeds + ONE Lloyd iteration
    (the ml_kmeans_lloyd_2iter recipe); every vector gets its nearest
    cell in a literal-folded narrow pass. Search: each query probes its
    NPROBE nearest cells (equi-join on cell id — never a cross join),
    exact cosine rerank inside, rank on the ROUNDED score with cid
    tiebreak so both engines cut identical top-k sets. The DuckDB
    oracle replays the entire index build AND search relationally —
    ANN graded by value hash, not just recall. Zero-norm vectors are
    excluded from index and queries (cosine-undefined; oracle nz CTE
    is the identical guard)."""
    emb = (load_parallel(spark, sf_dir, "embeddings")
           .select("vec_id", "embedding",
                   l2norm_col(F.col("embedding")).alias("nrm"))
           .filter(F.col("nrm") > 0))
    v = F.col("embedding").cast("array<double>")

    seeds = {r["vec_id"]: list(r["e"]) for r in
             emb.filter(F.col("vec_id") < K_CELLS)
             .select("vec_id", v.alias("e")).collect()}

    def ranked_cells(cents):
        # d is snapped to the oracle's 9-digit grid before the sort so a
        # near-tie between two cells can't flip on summation-order ulps
        # (Spark folds sequentially, DuckDB hash-aggregates).
        return F.transform(
            F.array_sort(F.array(*[
                F.struct(
                    F.round(F.aggregate(F.zip_with(v, F.lit(cvec),
                                                   lambda x, c: (x - c) * (x - c)),
                                        F.lit(0.0), lambda a, y: a + y), 9).alias("d"),
                    F.lit(cid).cast("bigint").alias("c"))
                for cid, cvec in sorted(cents.items())])),
            lambda s: s["c"])

    a1 = emb.withColumn("cid", F.element_at(ranked_cells(seeds), 1))
    cent_rows = (a1.select("cid", F.posexplode(v).alias("i", "x"))
                 .groupBy("cid", "i").agg(F.avg("x").alias("x")).collect())
    dim = len(next(iter(seeds.values())))
    c1: dict = {}
    for r in cent_rows:
        c1.setdefault(r["cid"], [0.0] * dim)[r["i"]] = r["x"]

    cells = ranked_cells(c1)
    indexed = emb.withColumn("cell", F.element_at(cells, 1))
    q = (indexed.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"),
                 F.col("nrm").alias("qn"),
                 F.explode(F.slice(cells, 1, NPROBE)).alias("cell")))
    c = indexed.select(F.col("vec_id").alias("cid"),
                       F.col("embedding").alias("ce"),
                       F.col("nrm").alias("cn"), "cell")
    scored = (c.join(F.broadcast(q), ["cell"])
              .filter(F.col("cid") != F.col("qid"))
              .select("qid", "cid",
                      F.round(dot_col(F.col("qe"), F.col("ce"))
                              / (F.col("qn") * F.col("cn")), 6).alias("cos")))
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rnk") <= TOP_K).select("qid", "cid", "cos", "rnk"))


@query("embedding_int8_quantize", oracle="""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
s AS (
  SELECT vec_id, v,
         list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
  FROM e
),
q AS (
  SELECT vec_id, scale,
         list_transform(v, x -> floor(x * 127.0 / scale + 0.5)) AS qv,
         v
  FROM s WHERE scale > 0
)
SELECT vec_id,
       round(scale, 6) AS scale,
       CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_checksum,
       round(sqrt(list_aggregate(
         list_transform(range(1, len(v) + 1),
           i -> pow(v[CAST(i AS INTEGER)]
                    - qv[CAST(i AS INTEGER)] * scale / 127.0, 2)),
         'sum') / len(v)), 9) AS rmse
FROM q
""")
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding column — the 4x memory
    compression an ANN index applies before it can hold billions of
    vectors: per-vector absmax scale, symmetric rounding to [-127, 127],
    plus the reconstruction-error audit (RMSE of dequantized vs
    original) a pipeline publishes to validate the compression choice.

    Rounding is floor(x + 0.5) on BOTH engines — banker's/half-away
    library differences can flip a quantized cell, floor cannot. All
    narrow array arithmetic (zip via index transform, no explode, no
    shuffle at all): at 100 TB this is a pure map stage limited by scan
    bandwidth. Zero-vectors are dropped (scale 0 has no quantization),
    matching the oracle's WHERE."""
    e = (load_parallel(spark, sf_dir, "embeddings")
         .select("vec_id", F.col("embedding").cast("array<double>")
                 .alias("v")))
    scale = F.array_max(F.transform("v", lambda x: F.abs(x)))
    s = e.select("vec_id", "v", scale.alias("scale"))
    qv = F.transform(
        "v", lambda x: F.floor(x * 127.0 / F.col("scale") + 0.5))
    q = (s.filter(F.col("scale") > 0)
         .select("vec_id", "scale", "v", qv.alias("qv")))
    err = F.zip_with(
        "v", "qv", lambda x, qx: F.pow(x - qx * F.col("scale") / 127.0,
                                       F.lit(2.0)))
    # rmse must dequantize with the RAW scale; rounding scale for display
    # happens in a later projection so the same-named output column can't
    # capture the reference inside the zip_with lambda.
    out = q.select(
        "vec_id", "scale",
        F.aggregate("qv", F.lit(0.0), lambda a, x: a + x).cast("bigint")
        .alias("q_checksum"),
        F.round(F.sqrt(F.aggregate(err, F.lit(0.0), lambda a, x: a + x)
                       / F.size("v")), 9).alias("rmse"))
    return out.select("vec_id", F.round("scale", 6).alias("scale"),
                      "q_checksum", "rmse")


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive-training data prep).

HARD_K = 5


@query("sim_hard_negatives", oracle=f"""
WITH {_BUCKETS},
e AS ({_E}),
be AS (SELECT b.vec_id, b.bkt, e.emb, e2.label
       FROM bucket b
       JOIN e ON e.vec_id = b.vec_id
       JOIN embeddings e2 ON e2.vec_id = b.vec_id),
q AS (SELECT * FROM be WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid, c.label AS neg_label,
         round(list_cosine_similarity(q.emb, c.emb), 6) AS cos
  FROM q JOIN be c
    ON c.bkt = q.bkt AND c.vec_id != q.vec_id AND c.label != q.label
),
ranked AS (
  SELECT qid, cid, neg_label, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
  FROM scored
)
SELECT qid, cid, neg_label, cos, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {HARD_K}
""")
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive / embedding training: for each
    query vector, the top-k most-similar candidates whose LABEL DIFFERS —
    the near-misses a trainer wants as negatives because random negatives
    are too easy to teach a margin.

    Physical shape is sim_ann_lsh's bucket equi-join with one extra
    predicate (label inequality) pushed into the join condition, so the
    pair space is still bounded by sum(|bucket|^2) — never N^2 — and the
    label filter prunes BEFORE the cosine rerank, not after. At 100 TB
    the label column rides the same shuffle as the embedding; no extra
    pass, no extra join."""
    emb = load_parallel(spark, sf_dir, "embeddings")
    be = (_bucket_df(spark, sf_dir)
          .join(emb.select("vec_id", "label"), "vec_id")
          .withColumn("nrm", l2norm_col(F.col("embedding"))))
    q = (be.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("qid"), F.col("bkt").alias("qbkt"),
                 F.col("label").alias("qlabel"),
                 F.col("embedding").alias("qe"), F.col("nrm").alias("qn")))
    c = be.select(F.col("vec_id").alias("cid"), F.col("bkt").alias("cbkt"),
                  F.col("label").alias("neg_label"),
                  F.col("embedding").alias("ce"), F.col("nrm").alias("cn"))
    scored = (c.join(F.broadcast(q),
                     (F.col("cbkt") == F.col("qbkt"))
                     & (F.col("cid") != F.col("qid"))
                     & (F.col("neg_label") != F.col("qlabel")))
              .select("qid", "cid", "neg_label",
                      F.round(dot_col(F.col("qe"), F.col("ce"))
                              / (F.col("qn") * F.col("cn")), 6).alias("cos")))
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rnk") <= HARD_K))


# ---------------------------------------------------------------------------
# Hybrid lexical+dense retrieval (BM25 -> cosine rerank fusion).

_BM25_TERMS = ("spark", "hash", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPN = 50     # lexical candidate set size
_HYBRID_K = 20      # final fused top-k
_HYBRID_WL = 0.6    # lexical weight; dense weight = 1 - this
_BM25_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + ")"


def _bm25_cosine_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared candidate stage for the two fusion queries: BM25 top-N
    (k1/b as configured) with the dense cosine score to the query
    embedding attached — `(doc_id, bm25, cos)`. The scalar corpus stats
    (count, avgdl, query vector) are collected once (kilobytes) and
    folded in as literals; the oracle twin is _HYBRID_CAND_SQL."""
    docs = load_parallel(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.split("text", " ").alias("w"))
    n_total, avgdl = w.select(
        F.count(F.lit(1)).cast("double"),
        F.avg(F.size("w").cast("double"))).first()

    tok = w.select("doc_id", F.size("w").cast("double").alias("dl"),
                   F.explode("w").alias("term"))
    tf = (tok.filter(F.col("term").isin(*_BM25_TERMS))
          .groupBy("doc_id", "term")
          .agg(F.max("dl").alias("dl"),
               F.count(F.lit(1)).cast("double").alias("tf")))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(1 + (F.lit(n_total) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    term_score = (idf * F.col("tf") * (_BM25_K1 + 1)
                  / (F.col("tf") + _BM25_K1
                     * (1 - _BM25_B + _BM25_B * F.col("dl") / avgdl)))
    sc = (tf.join(F.broadcast(df), "term")
          .groupBy("doc_id").agg(F.round(F.sum(term_score), 6).alias("bm25")))
    top = sc.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(_BM25_TOPN)

    emb = load_parallel(spark, sf_dir, "embeddings")
    qe = F.lit([float(x) for x in
                emb.filter(F.col("vec_id") == 0)
                .select(F.col("embedding").cast("array<double>")).first()[0]])
    # zero-norm candidates are cosine-undefined — excluded identically
    # in the oracle's hy CTE (the ANSI divide-by-zero class)
    return (top.filter(F.col("doc_id") != 0)
            .join(emb.select(F.col("vec_id").alias("doc_id"), "embedding")
                  .filter(l2norm_col(F.col("embedding")) > 0),
                  "doc_id")
            .select("doc_id", "bm25",
                    F.round(dot_col(qe, F.col("embedding"))
                            / (l2norm_col(qe)
                               * l2norm_col(F.col("embedding"))),
                            6).alias("cos")))


# CTE text reused by both fusion oracles (DuckDB twin of
# _bm25_cosine_candidates).
_HYBRID_CAND_SQL = f"""w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                 avg(CAST(len(w) AS DOUBLE)) AS avgdl FROM w),
tok AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, unnest(w) AS term FROM w),
tf AS (SELECT doc_id, term, max(dl) AS dl,
              CAST(count(*) AS DOUBLE) AS tf
       FROM tok WHERE term IN {_BM25_TERMS_SQL} GROUP BY doc_id, term),
df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
sc AS (SELECT tf.doc_id,
              round(sum(
                ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                * tf.tf * ({_BM25_K1} + 1)
                / (tf.tf + {_BM25_K1}
                   * (1 - {_BM25_B} + {_BM25_B} * tf.dl / stats.avgdl))
              ), 6) AS bm25
       FROM tf JOIN df USING (term), stats GROUP BY tf.doc_id),
top AS (SELECT doc_id, bm25 FROM sc ORDER BY bm25 DESC, doc_id
        LIMIT {_BM25_TOPN}),
qv AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
hy AS (SELECT t.doc_id, t.bm25,
              round(list_cosine_similarity(qv.qe, e.embedding::DOUBLE[]), 6)
                AS cos
       FROM top t JOIN embeddings e ON e.vec_id = t.doc_id, qv
       WHERE t.doc_id <> 0
         AND list_aggregate(list_transform(e.embedding::DOUBLE[],
                                           x -> x * x), 'sum') > 0)"""


@query("sim_hybrid_bm25_rerank", oracle=f"""
WITH {_HYBRID_CAND_SQL},
mx AS (SELECT max(bm25) AS m FROM hy),
f AS (SELECT doc_id, bm25, cos,
             round({_HYBRID_WL} * bm25 / mx.m
                   + (1 - {_HYBRID_WL}) * cos, 6) AS hybrid
      FROM hy, mx),
ranked AS (SELECT doc_id, bm25, cos, hybrid,
                  row_number() OVER (ORDER BY hybrid DESC, doc_id) AS rnk
           FROM f)
SELECT doc_id, bm25, cos, hybrid, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {_HYBRID_K}
""")
def sim_hybrid_bm25_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical scoring selects a candidate set,
    dense cosine similarity reranks it, and a weighted fusion produces
    the final ranking — the standard RAG retrieval stack (sparse recall,
    dense precision) expressed relationally.

    BM25 (k1=1.2, b=0.75) over a fixed query-term set; the
    document-frequency table is |terms| rows (broadcast), corpus size and
    average doc length are two exact scalars (integer sums divided by
    counts — bit-identical across engines) folded in as literals, so the
    only data-sized operations are one token explode restricted to query
    terms and one per-doc partial aggregate. The lexical top-50
    cut is orderBy().limit() — TakeOrderedAndProject, never a global
    window — and every downstream stage (embedding join, max
    normalization, fused rank) touches only those 50 rows.
    Ranks sort on ROUNDED scores with doc_id tiebreaks, so both engines
    cut identical sets. At 100 TB: scan + one keyed agg + a 50-
    row rerank; the query embedding is a literal array."""
    hy = _bm25_cosine_candidates(spark, sf_dir)
    mx = F.max("bm25").over(W.partitionBy())
    f = hy.select(
        "doc_id", "bm25", "cos",
        F.round(_HYBRID_WL * F.col("bm25") / mx
                + (1 - _HYBRID_WL) * F.col("cos"), 6).alias("hybrid"))
    rnk = F.row_number().over(W.orderBy(F.desc("hybrid"), F.asc("doc_id")))
    return (f.withColumn("rnk", rnk.cast("bigint"))
            .filter(F.col("rnk") <= _HYBRID_K))


_RRF_C = 60  # the standard reciprocal-rank-fusion smoothing constant


@query("sim_rrf_fusion", oracle=f"""
WITH {_HYBRID_CAND_SQL},
r1 AS (SELECT doc_id, bm25, cos,
              row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rl,
              row_number() OVER (ORDER BY cos DESC, doc_id) AS rd
       FROM hy),
f AS (SELECT doc_id, CAST(rl AS BIGINT) AS rank_lex,
             CAST(rd AS BIGINT) AS rank_dense,
             round(1.0 / ({_RRF_C} + rl) + 1.0 / ({_RRF_C} + rd), 9)
               AS rrf
      FROM r1)
SELECT doc_id, rank_lex, rank_dense, rrf,
       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT)
         AS rnk
FROM f QUALIFY rnk <= {_HYBRID_K}
""")
def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECIPROCAL-RANK FUSION over the same lexical+dense candidate set
    as sim_hybrid_bm25_rerank: each candidate is ranked independently by
    BM25 and by cosine, and fused by sum(1 / (60 + rank)) — the
    industry-default hybrid-search combiner (Elasticsearch/OpenSearch/
    Vespa ship exactly this) because it needs NO score normalization:
    ranks are scale-free, so a BM25 of ~8 and a cosine of ~0.3 fuse
    without the max-normalization the weighted variant requires. The two
    queries are deliberate twins — weighted-score fusion vs rank fusion
    on identical candidates.

    Determinism: ranks are integers with doc_id tiebreaks over ROUNDED
    scores; each RRF score is two exact integer-reciprocal IEEE
    divisions and one add, rounded to 9 for display.

    Scale shape: identical to the hybrid twin — everything after the
    BM25 top-50 cut (TakeOrderedAndProject) touches 50 rows; both
    ranking windows and the fusion window are candidate-set-sized by
    construction."""
    hy = _bm25_cosine_candidates(spark, sf_dir)
    rl = F.row_number().over(W.orderBy(F.desc("bm25"), F.asc("doc_id")))
    rd = F.row_number().over(W.orderBy(F.desc("cos"), F.asc("doc_id")))
    f = (hy.select("doc_id", rl.cast("bigint").alias("rank_lex"),
                   rd.cast("bigint").alias("rank_dense"))
         .withColumn("rrf", F.round(
             1.0 / (_RRF_C + F.col("rank_lex"))
             + 1.0 / (_RRF_C + F.col("rank_dense")), 9)))
    rnk = F.row_number().over(W.orderBy(F.desc("rrf"), F.asc("doc_id")))
    return (f.withColumn("rnk", rnk.cast("bigint"))
            .filter(F.col("rnk") <= _HYBRID_K))


# ---------------------------------------------------------------------------
# Dominant principal component via relational power iteration.

_PCA_ITER = 2
_PCA_DIM = 64


_PCA_ORACLE = f"""
WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
                  CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
g AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, round(sum(a.x * b.x), 9) AS g
  FROM e a JOIN e b ON a.vec_id = b.vec_id
  GROUP BY a.i, b.i
),
v0 AS (SELECT i AS j, 0.125 AS v FROM range({_PCA_DIM}) r(i)),
u1 AS (SELECT g.i, round(sum(g.g * v0.v), 9) AS u
       FROM g JOIN v0 ON v0.j = g.j GROUP BY g.i),
n1 AS (SELECT round(sqrt(sum(u * u)), 9) AS nrm FROM u1),
v1 AS (SELECT u1.i AS j, round(u1.u / n1.nrm, 9) AS v FROM u1, n1),
u2 AS (SELECT g.i, round(sum(g.g * v1.v), 9) AS u
       FROM g JOIN v1 ON v1.j = g.j GROUP BY g.i),
n2 AS (SELECT round(sqrt(sum(u * u)), 9) AS nrm FROM u2),
v2 AS (SELECT u2.i AS j, round(u2.u / n2.nrm, 9) AS v FROM u2, n2)
SELECT CAST(v2.j AS BIGINT) AS i, round(v2.v, 6) AS loading,
       round(n2.nrm, 6) AS eigval
FROM v2, n2
"""


@query("embedding_pca_power_iteration", oracle=_PCA_ORACLE)
def embedding_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal component of the embedding matrix by POWER
    ITERATION, fully relational: Gram matrix G = X'X as one keyed
    aggregate, then 2 unrolled multiply-normalize rounds from a fixed
    unit start vector — the dimensionality-reduction primitive
    (whitening, ANN pre-rotation, spectral diagnostics) at corpus scale,
    where X never fits anywhere but G (d x d) always does.

    Determinism: every G entry, matrix-vector product, and norm snaps
    to a 9-digit grid before reuse (the sim_ivf_det_topk recipe), so
    engine-specific float summation order cannot drift the iterates;
    loadings and the Rayleigh eigenvalue estimate round to 6 out. The
    start vector 1/8 = 2^-3 is exactly representable.

    Scale shape: the d^2-sized Gram aggregate is the ONLY data-sized
    stage — the (vec_id-colocated self-join -> (i, j) keyed sum) form
    here; at 100 TB with d=1024 you'd fold per-vector outer products
    into array accumulators per partition (treeAggregate shape) to keep
    the shuffle at d^2 x partitions instead of N x d^2 rows, and every
    subsequent iteration touches only the d^2 table. Iterations never
    rescan X — that is the whole point of materializing G."""
    e = (load_parallel(spark, sf_dir, "embeddings")
         .select("vec_id", F.posexplode(F.col("embedding")
                                        .cast("array<double>"))
                 .alias("i", "x")))
    a = e.select(F.col("vec_id"), F.col("i"), F.col("x"))
    b = e.select(F.col("vec_id"), F.col("i").alias("j"),
                 F.col("x").alias("y"))
    g = (a.join(b, "vec_id")
         .groupBy("i", "j").agg(F.round(F.sum(F.col("x") * F.col("y")), 9)
                                .alias("g")))
    g.persist()
    g.count()  # materialize before the unrolled iterations
    v = spark.range(_PCA_DIM).select(F.col("id").alias("j"),
                                     F.lit(0.125).alias("v"))
    nrm = None
    for _ in range(_PCA_ITER):
        u = (g.join(v, "j").groupBy("i")
             .agg(F.round(F.sum(F.col("g") * F.col("v")), 9).alias("u")))
        nrm = F.round(F.sqrt(F.sum(F.col("u") * F.col("u"))
                             .over(W.partitionBy())), 9)
        v = u.select(F.col("i").alias("j"),
                     F.round(F.col("u") / nrm, 9).alias("v"),
                     nrm.alias("nrm"))
    return v.select(F.col("j").cast("bigint").alias("i"),
                    F.round("v", 6).alias("loading"),
                    F.round("nrm", 6).alias("eigval"))


# ---------------------------------------------------------------------------
# kNN classification accuracy over the approximate neighbor graph.


@query("ml_knn_classifier_eval", oracle=f"""
WITH {_BUCKETS_2T},
e AS ({_E}),
be_a AS (SELECT b.vec_id, b.bkt, e.emb, e2.label
         FROM bucket b
         JOIN e ON e.vec_id = b.vec_id
         JOIN embeddings e2 ON e2.vec_id = b.vec_id),
be_b AS (SELECT b.vec_id, b.bkt, e.emb, e2.label
         FROM bucket_b b
         JOIN e ON e.vec_id = b.vec_id
         JOIN embeddings e2 ON e2.vec_id = b.vec_id),
scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid, c.label AS nl,
         round(list_cosine_similarity(q.emb, c.emb), 6) AS cos
  FROM be_a q JOIN be_a c ON c.bkt = q.bkt AND c.vec_id != q.vec_id
  UNION
  SELECT q.vec_id AS qid, c.vec_id AS cid, c.label AS nl,
         round(list_cosine_similarity(q.emb, c.emb), 6) AS cos
  FROM be_b q JOIN be_b c ON c.bkt = q.bkt AND c.vec_id != q.vec_id
),
knn AS (
  SELECT qid, cid, nl FROM (
    SELECT qid, cid, nl,
           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
    FROM scored) WHERE rnk <= {KNN_K}
),
votes AS (SELECT qid, nl, count(*) AS c FROM knn GROUP BY qid, nl),
pred AS (
  SELECT qid, nl AS pred_label FROM (
    SELECT qid, nl,
           row_number() OVER (PARTITION BY qid ORDER BY c DESC, nl) AS rn
    FROM votes) WHERE rn = 1
)
SELECT CAST(t.label AS BIGINT) AS true_label,
       CAST(p.pred_label AS BIGINT) AS pred_label,
       CAST(count(*) AS BIGINT) AS n
FROM pred p JOIN embeddings t ON t.vec_id = p.qid
GROUP BY t.label, p.pred_label
""")
def ml_knn_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification over the approximate neighbor graph: every
    vector is classified by majority label of its top-k same-bucket
    neighbors (ties -> smaller label), and the output is the full
    confusion matrix against the true labels — the standard
    label-quality / embedding-quality diagnostic (if kNN accuracy is
    low, either the embeddings or the labels are bad) and the
    evaluation harness for the label-spreading family.

    Reuses sim_knn_graph's bucket equi-join verbatim (cost stays
    Σ|bucket|², never N²); the vote and argmax run on k rows per
    vector, the confusion aggregate on |labels|² cells. Vectors with
    no same-bucket neighbor are absent from the graph and thus from
    the eval on both engines identically. At 100 TB the added cost
    over building the graph is one |graph|-sized keyed count."""
    knn = knn_graph_cached(spark, sf_dir)
    lab = load_parallel(spark, sf_dir, "embeddings").select("vec_id", "label")
    v = knn.join(lab.select(F.col("vec_id").alias("cid"),
                            F.col("label").alias("nl")), "cid")
    votes = v.groupBy("qid", "nl").agg(F.count(F.lit(1)).alias("c"))
    rn = F.row_number().over(
        W.partitionBy("qid").orderBy(F.desc("c"), F.asc("nl")))
    pred = (votes.withColumn("rn", rn).filter(F.col("rn") == 1)
            .select("qid", F.col("nl").alias("pred_label")))
    return (pred.join(lab.select(F.col("vec_id").alias("qid"),
                                 F.col("label").alias("true_label")), "qid")
            .groupBy(F.col("true_label").cast("bigint").alias("true_label"),
                     F.col("pred_label").cast("bigint").alias("pred_label"))
            .agg(F.count(F.lit(1)).alias("n")))


@query("ml_label_noise_knn", oracle=f"""
WITH {_BUCKETS_2T},
e AS ({_E}),
be_a AS (SELECT b.vec_id, b.bkt, e.emb, e2.label
         FROM bucket b
         JOIN e ON e.vec_id = b.vec_id
         JOIN embeddings e2 ON e2.vec_id = b.vec_id),
be_b AS (SELECT b.vec_id, b.bkt, e.emb, e2.label
         FROM bucket_b b
         JOIN e ON e.vec_id = b.vec_id
         JOIN embeddings e2 ON e2.vec_id = b.vec_id),
scored AS (
  SELECT q.vec_id AS qid, q.label AS ql, c.vec_id AS cid, c.label AS nl,
         round(list_cosine_similarity(q.emb, c.emb), 6) AS cos
  FROM be_a q JOIN be_a c ON c.bkt = q.bkt AND c.vec_id != q.vec_id
  UNION
  SELECT q.vec_id AS qid, q.label AS ql, c.vec_id AS cid, c.label AS nl,
         round(list_cosine_similarity(q.emb, c.emb), 6) AS cos
  FROM be_b q JOIN be_b c ON c.bkt = q.bkt AND c.vec_id != q.vec_id
),
knn AS (
  SELECT qid, ql, nl FROM (
    SELECT qid, ql, nl,
           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
    FROM scored) WHERE rnk <= {KNN_K}
)
SELECT qid AS vec_id, CAST(max(ql) AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_nbrs,
       CAST(sum(CASE WHEN nl != ql THEN 1 ELSE 0 END) AS BIGINT)
         AS n_disagree,
       round(sum(CASE WHEN nl != ql THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS noise_score,
       count(*) >= 2 AND
         sum(CASE WHEN nl != ql THEN 1 ELSE 0 END) * 3 >= count(*) * 2
         AS suspect
FROM knn GROUP BY qid
""")
def ml_label_noise_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LABEL-NOISE detection by neighbor disagreement (the cleanlab /
    confident-learning heuristic in its kNN form, Northcutt et al.
    2021): a vector whose approximate nearest neighbors mostly carry a
    DIFFERENT label is a suspected annotation error — the
    training-data-quality filter run before any supervised head
    (ml_dbn_logreg_eval and friends) sees the labels. Output per
    vector: its label, neighbor count, disagreement count, the
    disagreement fraction, and the suspect flag (>= 2/3 disagreement
    over >= 2 neighbors). Exact-integer votes; only the final fraction
    rounds.

    Reuses sim_knn_graph's bucketed candidate generation verbatim
    (Σ|bucket|², never N²) with the label joined onto BOTH sides of
    the bucket join; the disagreement aggregate is k rows per vector,
    combiner'd on vec_id. At 100 TB this is the same plan as the kNN
    confusion matrix with a per-vector instead of per-class rollup —
    the graph build dominates, shared across the whole eval family."""
    knn = knn_graph_cached(spark, sf_dir)
    lab = load_parallel(spark, sf_dir, "embeddings").select("vec_id", "label")
    v = (knn
         .join(lab.select(F.col("vec_id").alias("cid"),
                          F.col("label").alias("nl")), "cid")
         .join(lab.select(F.col("vec_id").alias("qid"),
                          F.col("label").alias("ql")), "qid"))
    dis = F.sum(F.when(F.col("nl") != F.col("ql"), 1).otherwise(0))
    n = F.count(F.lit(1))
    return (v.groupBy("qid")
            .agg(F.max("ql").cast("bigint").alias("label"),
                 n.cast("bigint").alias("n_nbrs"),
                 dis.cast("bigint").alias("n_disagree"),
                 F.round(dis * 1.0 / n, 6).alias("noise_score"),
                 ((n >= 2) & (dis * 3 >= n * 2)).alias("suspect"))
            .withColumnRenamed("qid", "vec_id"))


# Matryoshka truncation dims audited against the full 64-dim ranking.
MRL_DIMS = (16, 32)


@query("sim_matryoshka_truncation_eval", oracle=f"""
WITH e0 AS ({_E}),
e AS (SELECT * FROM e0
      WHERE list_aggregate(list_transform(emb[1:16], x -> x * x),
                           'sum') > 0),
q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         round(list_cosine_similarity(q.emb, c.emb), 6) AS cos64,
         round(list_cosine_similarity(q.emb[1:16], c.emb[1:16]), 6)
           AS cos16,
         round(list_cosine_similarity(q.emb[1:32], c.emb[1:32]), 6)
           AS cos32
  FROM q JOIN e c ON c.vec_id != q.vec_id
),
ranked AS (
  SELECT qid, cid,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos64 DESC, cid) AS r64,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos16 DESC, cid) AS r16,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos32 DESC, cid) AS r32
  FROM scored
)
SELECT qid,
       CAST(sum(CASE WHEN r64 <= {TOP_K} AND r16 <= {TOP_K}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap_16,
       CAST(sum(CASE WHEN r64 <= {TOP_K} AND r32 <= {TOP_K}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap_32,
       round(sum(CASE WHEN r64 <= {TOP_K} AND r16 <= {TOP_K}
                      THEN 1 ELSE 0 END) * 1.0
             / (2 * {TOP_K} - sum(CASE WHEN r64 <= {TOP_K} AND r16 <= {TOP_K}
                                       THEN 1 ELSE 0 END)), 6)
         AS jaccard_16
FROM ranked GROUP BY qid
""")
def sim_matryoshka_truncation_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATRYOSHKA (MRL-style) truncation audit: how much of the exact
    64-dim cosine top-k survives when embeddings are truncated to their
    first 16 / 32 dimensions — the measurement that decides whether a
    corpus can serve ANN from truncated prefixes (cheap index, fraction
    of the I/O) and rerank with full vectors. Per query: top-5 overlap
    counts at both truncations and the top-5 Jaccard at dim 16.

    One broadcast-query pass scores all three similarities per pair
    (slice + one dot each — no second scan of the corpus side), three
    rank windows partitioned by qid, one rollup. Ranks order by the
    ROUNDED cosine with cid tiebreak, so both engines cut identical
    top-k sets. Scale: the pair stream is the exact-baseline BNLJ shape
    (fixed query side, declared twin of the bucketed ANN paths); the
    truncation audit itself adds only two extra dots per pair.
    The zero-norm guard applies to the SHORTEST prefix (first 16
    dims): a vector whose 16-dim prefix is all zero is
    cosine-undefined at that truncation even when the full vector
    isn't — guarding the full norm alone would still raise on cos16."""
    emb = (load_parallel(spark, sf_dir, "embeddings")
           .select("vec_id", "embedding")
           .filter(l2norm_col(F.slice("embedding", 1, 16)) > 0))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    c = emb.select(F.col("vec_id").alias("cid"),
                   F.col("embedding").alias("ce"))
    def _cos(a, b):
        return F.round(dot_col(a, b) / (l2norm_col(a) * l2norm_col(b)), 6)
    scored = (F.broadcast(q).crossJoin(c)
              .filter(F.col("cid") != F.col("qid"))
              .select("qid", "cid",
                      _cos(F.col("qe"), F.col("ce")).alias("cos64"),
                      _cos(F.slice("qe", 1, 16), F.slice("ce", 1, 16))
                      .alias("cos16"),
                      _cos(F.slice("qe", 1, 32), F.slice("ce", 1, 32))
                      .alias("cos32")))
    ranked = scored.select(
        "qid", "cid",
        F.row_number().over(W.partitionBy("qid")
                            .orderBy(F.desc("cos64"), F.asc("cid")))
         .alias("r64"),
        F.row_number().over(W.partitionBy("qid")
                            .orderBy(F.desc("cos16"), F.asc("cid")))
         .alias("r16"),
        F.row_number().over(W.partitionBy("qid")
                            .orderBy(F.desc("cos32"), F.asc("cid")))
         .alias("r32"))
    hit16 = F.when((F.col("r64") <= TOP_K) & (F.col("r16") <= TOP_K), 1
                   ).otherwise(0)
    hit32 = F.when((F.col("r64") <= TOP_K) & (F.col("r32") <= TOP_K), 1
                   ).otherwise(0)
    return (ranked.groupBy("qid")
            .agg(F.sum(hit16).cast("bigint").alias("n_overlap_16"),
                 F.sum(hit32).cast("bigint").alias("n_overlap_32"),
                 F.round(F.sum(hit16) * 1.0
                         / (2 * TOP_K - F.sum(hit16)), 6)
                  .alias("jaccard_16")))


# Product-quantization geometry: 8 subspaces x 8 dims, 16-entry codebooks.
PQ_SUB, PQ_DIM, PQ_K = 8, 8, 16

# Codebook = deterministically SAMPLED data subvectors (vec_ids
# 0, stride, 2*stride, ... with stride = n_vecs // 16): the k-means++
# -style seeding of a real PQ trainer, computed in-engine on both
# sides so no floats cross the engine boundary, and actually ON-SCALE
# for the corpus (a synthetic grid codebook quantizes unit-norm
# embeddings to near-random codes).
_PQ_CB_DUCK = f"""
SELECT g.s, g.c, g.j,
       CAST(e.embedding[g.s * {PQ_DIM} + g.j + 1] AS DOUBLE) AS w
FROM (SELECT s.s, c.c, j.j,
             c.c * (SELECT count(*) // {PQ_K} FROM embeddings) AS vid
      FROM range({PQ_SUB}) s(s), range({PQ_K}) c(c),
           range({PQ_DIM}) j(j)) g
JOIN embeddings e ON e.vec_id = g.vid"""


def _pq_codebook(spark: SparkSession, emb: DataFrame) -> DataFrame:
    """(s, c, j, w): subspace s's centroid c is the matching subvector
    of the c*stride-th embedding."""
    n = emb.agg((F.count(F.lit(1)) / PQ_K).cast("long").alias("stride"))
    sel = (spark.range(PQ_K).withColumnRenamed("id", "c")
           .crossJoin(F.broadcast(n))
           .select("c", (F.col("c") * F.col("stride")).alias("vid")))
    picked = sel.join(emb, sel.vid == emb.vec_id).select("c", "embedding")
    return (picked.select(
                "c",
                F.posexplode(F.col("embedding").cast("array<double>"))
                .alias("k", "w"))
            .select((F.col("k") / PQ_DIM).cast("int").alias("s"),
                    "c", (F.col("k") % PQ_DIM).cast("int").alias("j"),
                    "w"))


@query("embedding_pq_quantize", oracle=f"""
WITH cb AS ({_PQ_CB_DUCK}),
v AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
d AS (
  SELECT v.vec_id, cb.s, cb.c,
         round(sum((v.x - cb.w) * (v.x - cb.w)), 9) AS d2
  FROM v JOIN cb ON v.i = cb.s * {PQ_DIM} + cb.j
  GROUP BY v.vec_id, cb.s, cb.c
),
best AS (
  SELECT vec_id, s, c AS code, d2,
         row_number() OVER (PARTITION BY vec_id, s
                            ORDER BY d2, c) AS rn
  FROM d
)
SELECT vec_id,
       string_agg(CAST(code AS VARCHAR), '-' ORDER BY s) AS codes,
       round(sum(d2), 9) AS quant_err
FROM best WHERE rn = 1
GROUP BY vec_id
""")
def embedding_pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT QUANTIZATION (the ANN index compression layer): each
    64-dim embedding splits into 8 subvectors, each snapped to its
    nearest entry of a 16-entry per-subspace codebook — 64 floats
    become 8 codes (here a dash-joined string for engine-stable
    hashing) plus the reconstruction error the recall/compression
    trade is audited on. The codebook is DATA-DERIVED: a deterministic
    stride sample of actual subvectors (_pq_codebook here,
    _PQ_CB_DUCK in the oracle — both engines materialize the identical
    table), standing in for the k-means-trained centroids a production
    build would use (ml_kmeans_lloyd_2iter is that trainer) without
    changing this assignment plan. Distances round to 9 digits BEFORE the argmin
    (the k-means tie precedent) so a last-bit difference cannot flip a
    code between engines; ties break to the lower code. The error sum
    also rounds at 9 — NOT coarser: sums of 1e-9-grid values land
    exactly on 1e-6 midpoints, where a coarser round becomes an
    engine-dependent coin flip (bitten at sf0.1, vec 324).

    Relational shape: dims explode (narrow), equi-join the 1024-row
    broadcast codebook, one (vec, subspace, centroid)-keyed partial
    aggregate, one windowed argmin on (vec, subspace) — uniform keys —
    and one per-vec rollup. At 100 TB this is the batch-encode job of
    an IVF-PQ build: embarrassingly parallel, no corpus-wide state but
    the codebook broadcast."""
    emb = load_parallel(spark, sf_dir, "embeddings")
    cb = _pq_codebook(spark, emb)
    v = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>"))
        .alias("i", "x"))
    d = (v.join(F.broadcast(cb),
                v.i == cb.s * PQ_DIM + cb.j)
         .groupBy("vec_id", "s", "c")
         .agg(F.round(F.sum((F.col("x") - F.col("w"))
                            * (F.col("x") - F.col("w"))), 9).alias("d2")))
    wbest = W.partitionBy("vec_id", "s").orderBy("d2", "c")
    best = (d.withColumn("rn", F.row_number().over(wbest))
            .filter(F.col("rn") == 1))
    return (best.groupBy("vec_id")
            .agg(F.concat_ws("-", F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "c"))),
                    lambda r: r["c"].cast("string"))).alias("codes"),
                 F.round(F.sum("d2"), 9).alias("quant_err")))


@query("sim_pq_adc_topk", oracle=f"""
WITH cb AS ({_PQ_CB_DUCK}),
v AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
d AS (
  SELECT v.vec_id, cb.s, cb.c,
         round(sum((v.x - cb.w) * (v.x - cb.w)), 9) AS d2
  FROM v JOIN cb ON v.i = cb.s * {PQ_DIM} + cb.j
  GROUP BY v.vec_id, cb.s, cb.c
),
best AS (
  SELECT vec_id, s, c AS code,
         row_number() OVER (PARTITION BY vec_id, s
                            ORDER BY d2, c) AS rn
  FROM d
),
codes AS (SELECT vec_id AS cid, s, code FROM best WHERE rn = 1),
qd AS (SELECT vec_id AS qid, s, c, d2 FROM d WHERE vec_id < {N_QUERIES}),
approx AS (
  SELECT qd.qid, codes.cid, round(sum(qd.d2), 9) AS adist
  FROM codes JOIN qd ON qd.s = codes.s AND qd.c = codes.code
  WHERE codes.cid != qd.qid
  GROUP BY qd.qid, codes.cid
),
ranked AS (
  SELECT qid, cid, adist,
         row_number() OVER (PARTITION BY qid
                            ORDER BY adist, cid) AS rnk
  FROM approx
)
SELECT qid, cid, adist, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {TOP_K}
""")
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC DISTANCE COMPUTATION (ADC) — the query side of an
    IVF-PQ index: corpus vectors are represented only by their PQ
    codes (embedding_pq_quantize); each query precomputes a 8x16
    lookup table of exact subvector-to-centroid distances, and the
    approximate distance to any corpus vector is 8 TABLE LOOKUPS
    summed — never a 64-dim dot against raw corpus floats. Relationally
    the lookup is an equi-join on (subspace, code): 128 distinct keys,
    query table x corpus codes, then a (qid, cid)-keyed sum and
    windowed top-k. Distances snap to 9 digits before every
    rank/argmin (k-means precedent); 6 on output.

    At 100 TB: the corpus side ships 8 bytes per vector (the codes),
    the per-query lookup table is 128 doubles broadcast, and the join
    is the bucketed-ANN shape — this is exactly why PQ makes
    billion-vector search RAM-resident. The exact-rank twin is
    sim_topk_cosine (equal to exact-L2 ranking here — the embeddings
    are unit-norm); test_pq_adc_recall binds the two. On this
    clusterless synthetic corpus the sampled 16-entry codebooks buy
    ~0.16 recall@5 — honest for near-uniform random unit vectors,
    where inter-vector distance gaps are below quantization noise;
    trained codebooks on clustered real corpora are the production
    path."""
    emb = load_parallel(spark, sf_dir, "embeddings")
    cb = _pq_codebook(spark, emb)
    v = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>"))
        .alias("i", "x"))
    d = (v.join(F.broadcast(cb), v.i == cb.s * PQ_DIM + cb.j)
         .groupBy("vec_id", "s", "c")
         .agg(F.round(F.sum((F.col("x") - F.col("w"))
                            * (F.col("x") - F.col("w"))), 9).alias("d2")))
    wbest = W.partitionBy("vec_id", "s").orderBy("d2", "c")
    codes = (d.withColumn("rn", F.row_number().over(wbest))
             .filter(F.col("rn") == 1)
             .select(F.col("vec_id").alias("cid"), "s",
                     F.col("c").alias("code")))
    qd = (d.filter(F.col("vec_id") < N_QUERIES)
          .select(F.col("vec_id").alias("qid"), "s", "c", "d2"))
    approx = (codes.join(qd, (codes.s == qd.s) & (codes.code == qd.c))
              .filter(F.col("cid") != F.col("qid"))
              .groupBy("qid", "cid")
              .agg(F.round(F.sum("d2"), 9).alias("adist")))
    wr = W.partitionBy("qid").orderBy("adist", "cid")
    return (approx.withColumn("rnk", F.row_number().over(wr).cast("bigint"))
            .filter(F.col("rnk") <= TOP_K)
            .select("qid", "cid", "adist", "rnk"))


@query("sim_ivfpq_topk", oracle=f"""
WITH cb AS ({_PQ_CB_DUCK}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
seeds AS (SELECT vec_id AS scid, emb AS cemb FROM e WHERE vec_id < {K_CELLS}),
cd AS (
  SELECT e.vec_id, s.scid,
         round(list_aggregate(
           list_transform(range(1, len(e.emb) + 1),
             i -> pow(e.emb[CAST(i AS INTEGER)]
                      - s.cemb[CAST(i AS INTEGER)], 2)),
           'sum'), 9) AS d2
  FROM e CROSS JOIN seeds s
),
rankcells AS (
  SELECT vec_id, scid,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, scid) AS rn
  FROM cd),
cellof AS (SELECT vec_id, scid AS cell FROM rankcells WHERE rn = 1),
probe AS (SELECT vec_id AS qid, scid AS cell FROM rankcells
          WHERE rn <= {NPROBE} AND vec_id < {N_QUERIES}),
v AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
d AS (
  SELECT v.vec_id, cb.s, cb.c,
         round(sum((v.x - cb.w) * (v.x - cb.w)), 9) AS d2
  FROM v JOIN cb ON v.i = cb.s * {PQ_DIM} + cb.j
  GROUP BY v.vec_id, cb.s, cb.c
),
best AS (
  SELECT vec_id, s, c AS code,
         row_number() OVER (PARTITION BY vec_id, s
                            ORDER BY d2, c) AS rn
  FROM d
),
codes AS (SELECT vec_id AS cid, s, code FROM best WHERE rn = 1),
qd AS (SELECT vec_id AS qid, s, c, d2 FROM d WHERE vec_id < {N_QUERIES}),
approx AS (
  SELECT p.qid, codes.cid, round(sum(qd.d2), 9) AS adist
  FROM probe p
  JOIN cellof co ON co.cell = p.cell
  JOIN codes ON codes.cid = co.vec_id
  JOIN qd ON qd.qid = p.qid AND qd.s = codes.s AND qd.c = codes.code
  WHERE codes.cid != p.qid
  GROUP BY p.qid, codes.cid
),
ranked AS (
  SELECT qid, cid, adist,
         row_number() OVER (PARTITION BY qid
                            ORDER BY adist, cid) AS rnk
  FROM approx
)
SELECT qid, cid, adist, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {TOP_K}
""")
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the COMPOSED production ANN index (the FAISS IVFPQ
    shape, Jégou et al. 2011): a coarse quantizer routes each query to
    its NPROBE nearest cells, and within the probed cells distances are
    PQ ASYMMETRIC lookups against 8-byte codes — never raw floats. This
    joins the two halves already verified separately
    (sim_ivf_det_topk's cell routing, sim_pq_adc_topk's ADC): the scan
    volume drops from all-N codes per query to |probed cells| x
    codes-per-cell, which is the difference between \"RAM-resident
    billion-vector search\" and \"corpus-wide sweep per query\" at
    100 TB. Cell routing here is the deterministic first-K-seeds
    argmin (the SemDeDup quantizer, 9-digit snap, cell-id tiebreak) so
    the DuckDB oracle replays index build AND search exactly.

    Relational shape: assignment + code derivation are narrow against
    broadcast seeds/codebooks; the probe is an equi-join on cell
    (bounded by cell occupancy, never N x N), the ADC lookup an
    equi-join on the 128-key (subspace, code) grid, then one
    (qid, cid)-keyed sum and a qid-windowed top-k. Lower recall than
    either half alone on this clusterless corpus (quantization noise
    x cell miss both apply) — the accuracy/cost knob is (NPROBE, M)
    exactly as in production."""
    emb = (load_parallel(spark, sf_dir, "embeddings")
           .select("vec_id", "embedding"))
    v64 = F.col("embedding").cast("array<double>")
    seeds = {r["vec_id"]: list(r["e"]) for r in
             emb.filter(F.col("vec_id") < K_CELLS)
             .select("vec_id", v64.alias("e")).collect()}
    ranked_cells = F.transform(
        F.array_sort(F.array(*[
            F.struct(
                F.round(F.aggregate(
                    F.zip_with(v64, F.lit(cvec),
                               lambda x, c: (x - c) * (x - c)),
                    F.lit(0.0), lambda a, y: a + y), 9).alias("d"),
                F.lit(cid).cast("bigint").alias("c"))
            for cid, cvec in sorted(seeds.items())])),
        lambda s: s["c"])
    cellof = emb.select("vec_id",
                        F.element_at(ranked_cells, 1).alias("cell"))
    probe = (emb.filter(F.col("vec_id") < N_QUERIES)
             .select(F.col("vec_id").alias("qid"),
                     F.explode(F.slice(ranked_cells, 1, NPROBE))
                     .alias("cell")))

    cb = _pq_codebook(spark, emb)
    v = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>"))
        .alias("i", "x"))
    d = (v.join(F.broadcast(cb), v.i == cb.s * PQ_DIM + cb.j)
         .groupBy("vec_id", "s", "c")
         .agg(F.round(F.sum((F.col("x") - F.col("w"))
                            * (F.col("x") - F.col("w"))), 9).alias("d2")))
    wbest = W.partitionBy("vec_id", "s").orderBy("d2", "c")
    codes = (d.withColumn("rn", F.row_number().over(wbest))
             .filter(F.col("rn") == 1)
             .select(F.col("vec_id").alias("cid"), "s",
                     F.col("c").alias("code")))
    qd = (d.filter(F.col("vec_id") < N_QUERIES)
          .select(F.col("vec_id").alias("qid"), F.col("s").alias("qs"),
                  F.col("c").alias("qc"), "d2"))
    approx = (F.broadcast(probe.withColumnRenamed("qid", "pqid"))
              .join(cellof, "cell")
              .join(codes, F.col("vec_id") == F.col("cid"))
              .filter(F.col("cid") != F.col("pqid"))
              .join(qd, (F.col("s") == F.col("qs"))
                    & (F.col("code") == F.col("qc"))
                    & (F.col("qid") == F.col("pqid")))
              .groupBy("qid", "cid")
              .agg(F.round(F.sum("d2"), 9).alias("adist")))
    wr = W.partitionBy("qid").orderBy("adist", "cid")
    return (approx.withColumn("rnk", F.row_number().over(wr).cast("bigint"))
            .filter(F.col("rnk") <= TOP_K)
            .select("qid", "cid", "adist", "rnk"))


# NSW greedy search: beam width, unrolled hop count.
NSW_BEAM, NSW_HOPS = 4, 3

# Shared hop template for the oracle: expand the frontier over the
# symmetrized kNN edges, keep the union with the frontier itself, score
# against the query, cut to the beam.
def _nsw_hop_sql(h: int) -> str:
    return f"""
v{h} AS (SELECT DISTINCT qid, node FROM (
  SELECT f.qid, ed.dst AS node
  FROM f{h - 1} f JOIN edges ed ON ed.src = f.node
  UNION
  SELECT qid, node FROM f{h - 1})),
s{h} AS (SELECT v.qid, v.node,
                round(list_cosine_similarity(q.emb, n.emb), 6) AS cos
         FROM v{h} v JOIN qv q ON q.qid = v.qid
         JOIN e n ON n.vec_id = v.node),
f{h} AS (SELECT qid, node FROM (
  SELECT qid, node,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos DESC, node) AS rn
  FROM s{h}) WHERE rn <= {NSW_BEAM})"""


@query("sim_graph_greedy_search", oracle=f"""
WITH {_BUCKETS_2T},
e0 AS ({_E}),
e AS (SELECT * FROM e0
      WHERE list_aggregate(list_transform(emb, x -> x * x), 'sum') > 0),
be_a AS (SELECT b.vec_id, b.bkt, e.emb
         FROM bucket b JOIN e ON e.vec_id = b.vec_id),
be_b AS (SELECT b.vec_id, b.bkt, e.emb
         FROM bucket_b b JOIN e ON e.vec_id = b.vec_id),
kscored AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         round(list_cosine_similarity(q.emb, c.emb), 6) AS cos
  FROM be_a q JOIN be_a c ON c.bkt = q.bkt AND c.vec_id != q.vec_id
  UNION
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         round(list_cosine_similarity(q.emb, c.emb), 6) AS cos
  FROM be_b q JOIN be_b c ON c.bkt = q.bkt AND c.vec_id != q.vec_id
),
knn AS (SELECT qid, cid FROM (
  SELECT qid, cid,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
  FROM kscored) WHERE rnk <= {KNN_K}),
edges AS (SELECT qid AS src, cid AS dst FROM knn
          UNION SELECT cid AS src, qid AS dst FROM knn),
qv AS (SELECT vec_id AS qid, emb FROM e WHERE vec_id < {N_QUERIES}),
entry AS (SELECT min(vec_id) AS node FROM e
          WHERE vec_id >= {N_QUERIES}),
f0 AS (SELECT q.qid, en.node FROM qv q CROSS JOIN entry en),
{",".join(_nsw_hop_sql(h) for h in range(1, NSW_HOPS + 1))},
visited AS ({" UNION ".join(f"SELECT qid, node, cos FROM s{h}"
                            for h in range(1, NSW_HOPS + 1))}),
ranked AS (SELECT qid, node AS cid, cos,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY cos DESC, node) AS rnk
           FROM visited WHERE node != qid)
SELECT qid, cid, cos, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {TOP_K}
""")
def sim_graph_greedy_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRAPH-BASED ANN (the NSW/HNSW paradigm, Malkov & Yashunin 2016):
    greedy beam search over a navigable neighbor graph — the third
    index family next to partition-routing (IVF/sim_ivf_det_topk) and
    hash-bucketing (LSH/sim_ann_lsh). The graph is sim_knn_graph's
    bucketed top-{KNN_K} SYMMETRIZED (union of both edge directions —
    the NSW navigability trick); search starts every query at one
    deterministic entry point (the lowest non-query vec_id) and for
    {NSW_HOPS} unrolled hops expands the beam's neighbors, scores them
    against the query, and keeps the top-{NSW_BEAM} beam; the answer is
    the top-{TOP_K} of ALL nodes scored along the walk. Scores snap to
    6 digits with node-id tiebreaks before every cut, so the DuckDB
    oracle replays graph build AND walk exactly — graph-ANN graded by
    value hash, not just recall.

    Scale shape: the edge list is corpus x {KNN_K} rows keyed by src
    (built once, memoized like the k-core edges); each hop is a
    BROADCAST of the tiny frontier (queries x beam rows) onto that
    keyed edge list plus one vec_id equi-join to fetch candidate
    embeddings — per-hop cost is frontier x degree, independent of
    corpus size, which is exactly why graph indexes answer queries in
    milliseconds at billion scale. Hop count is the recall/latency
    knob (HNSW's ef parameter); unrolled here for an oracle-exact
    fixed plan, driver-looped in production exactly like the
    connected-components fixpoint."""
    from .dedup import memo_persist

    # zero-norm vectors are out of the walk everywhere: queries, entry
    # point, and scoring candidates (the edges come from the already-
    # filtered LSH bucket graph) — oracle's e CTE is the same guard
    emb = (load_parallel(spark, sf_dir, "embeddings")
           .select("vec_id", "embedding",
                   l2norm_col(F.col("embedding")).alias("nrm"))
           .filter(F.col("nrm") > 0))

    def _build_edges() -> DataFrame:
        knn = knn_graph_cached(spark, sf_dir).select("qid", "cid")
        return (knn.select(F.col("qid").alias("src"),
                           F.col("cid").alias("dst"))
                .unionByName(knn.select(F.col("cid").alias("src"),
                                        F.col("qid").alias("dst")))
                .distinct())

    edges = memo_persist(spark, f"nsw_edges::{sf_dir}", _build_edges,
                         eager=True)

    qv = (emb.filter(F.col("vec_id") < N_QUERIES)
          .select(F.col("vec_id").alias("qid"),
                  F.col("embedding").alias("qe"), F.col("nrm").alias("qn")))
    cand = emb.select(F.col("vec_id").alias("node"),
                      F.col("embedding").alias("ne"),
                      F.col("nrm").alias("nn"))
    entry = (emb.filter(F.col("vec_id") >= N_QUERIES)
             .agg(F.min("vec_id").alias("node")))
    frontier = qv.select("qid").crossJoin(F.broadcast(entry))

    cos = F.round(dot_col(F.col("qe"), F.col("ne"))
                  / (F.col("qn") * F.col("nn")), 6)
    wbeam = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("node"))
    visited = None
    for _ in range(NSW_HOPS):
        expanded = (F.broadcast(frontier)
                    .join(edges, frontier.node == edges.src)
                    .select("qid", F.col("dst").alias("node"))
                    .unionByName(frontier.select("qid", "node"))
                    .distinct())
        # The per-hop scored set is queries x (beam x degree) rows —
        # tiny. localCheckpoint (the BFS-loop precedent, graph.py:200)
        # cuts the growing union lineage: without it hop H re-evaluates
        # every earlier hop's join tree (O(H^2) recomputation; measured
        # 10.8s -> 5.9s cold at sf0.1).
        # eager=False: the checkpoint still truncates the growing union
        # lineage (the O(H^2) recompute guard), but materialization is
        # deferred into the next downstream action instead of paying one
        # driver-blocking job per hop — NSW_HOPS fewer jobs per query.
        scored = (expanded.join(cand, "node")
                  .join(F.broadcast(qv), "qid")
                  .select("qid", "node", cos.alias("cos"))
                  .coalesce(8).localCheckpoint(eager=False))
        visited = scored if visited is None else (
            visited.unionByName(scored).distinct())
        frontier = (scored.withColumn("rn", F.row_number().over(wbeam))
                    .filter(F.col("rn") <= NSW_BEAM).select("qid", "node"))
    wr = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (visited.filter(F.col("node") != F.col("qid"))
            .select("qid", F.col("node").alias("cid"), "cos")
            .distinct()
            .withColumn("rnk", F.row_number().over(wr).cast("bigint"))
            .filter(F.col("rnk") <= TOP_K))


# MMR rerank: pool of top-MMR_POOL exact-cosine candidates per query,
# MMR_K greedy diversity selections at trade-off lambda = 7/10. The
# weights are INTEGERS over a denominator of 10 so the MMR score lives
# on an exact bigint grid (tenth-micro units): 7*rel_micro - 3*ms_micro
# where rel/ms are the 6-digit-rounded similarities scaled by 1e6.
# A float 0.7*rel lands exactly on 6-digit rounding half-boundaries
# (0.7 * 0.371485 = 0.2600395 — observed Spark HALF_UP 0.260040 vs
# DuckDB 0.260039), so the argmax itself could flip between engines;
# bigint scores cannot (quality_tier_report's micro-unit precedent).
MMR_POOL = 10
MMR_K = 3
MMR_LAM_NUM = 7     # lambda numerator     (lambda = 7/10)
MMR_OML_NUM = 3     # (1 - lambda) numerator
_MMR_GRID = 10_000_000.0  # tenth-micro -> float, exact bigint/1e7


def _mmr_oracle() -> str:
    """Unrolled MMR rounds, generated from range(2, MMR_K + 1) so the
    oracle can never desynchronize from the Spark loop when MMR_K moves
    (the NSW visited-union lesson, ADVICE r06)."""
    rounds = []
    for r in range(2, MMR_K + 1):
        prev = f"sel{r - 1}"
        rounds.append(f"""
m{r} AS (
  SELECT c.qid, c.cid, c.rel,
         {MMR_LAM_NUM} * c.rel_m - {MMR_OML_NUM} * max(p.s_m) AS mmr_m
  FROM cands c
  JOIN psim p ON p.qid = c.qid AND p.c1 = c.cid
  JOIN {prev} s ON s.qid = p.qid AND s.cid = p.c2
  WHERE NOT EXISTS (SELECT 1 FROM {prev} x
                    WHERE x.qid = c.qid AND x.cid = c.cid)
  GROUP BY c.qid, c.cid, c.rel, c.rel_m),
s{r} AS (
  SELECT qid, cid, rel, mmr_m, {r} AS rnk
  FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                     ORDER BY mmr_m DESC, cid) AS rn
        FROM m{r}) WHERE rn = 1),
sel{r} AS (SELECT qid, cid FROM sel{r - 1}
           UNION ALL SELECT qid, cid FROM s{r})""")
    final = " UNION ALL ".join(
        f"SELECT * FROM s{r}" for r in range(1, MMR_K + 1))
    return f"""
WITH e0 AS ({_E}),
e AS (SELECT * FROM e0
      WHERE list_aggregate(list_transform(emb, x -> x * x), 'sum') > 0),
q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         round(list_cosine_similarity(q.emb, c.emb), 6) AS rel
  FROM q JOIN e c ON c.vec_id != q.vec_id),
cands AS (
  SELECT qid, cid, rel,
         CAST(round(rel * 1000000) AS BIGINT) AS rel_m
  FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                     ORDER BY rel DESC, cid) AS rn
        FROM scored) WHERE rn <= {MMR_POOL}),
psim AS (
  SELECT a.qid, a.cid AS c1, b.cid AS c2,
         CAST(round(round(list_cosine_similarity(ea.emb, eb.emb), 6)
                    * 1000000) AS BIGINT) AS s_m
  FROM cands a
  JOIN cands b ON b.qid = a.qid AND b.cid != a.cid
  JOIN e ea ON ea.vec_id = a.cid
  JOIN e eb ON eb.vec_id = b.cid),
s1 AS (
  SELECT qid, cid, rel, {MMR_LAM_NUM} * rel_m AS mmr_m, 1 AS rnk
  FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                     ORDER BY rel DESC, cid) AS rn
        FROM cands) WHERE rn = 1),
sel1 AS (SELECT qid, cid FROM s1),{",".join(rounds)}
SELECT qid, CAST(rnk AS BIGINT) AS rnk, cid, rel,
       mmr_m / {_MMR_GRID} AS mmr
FROM ({final})
"""


@query("sim_mmr_rerank", oracle=_mmr_oracle())
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998):
    from each query's top-{MMR_POOL} exact-cosine pool, greedily select
    {MMR_K} results maximizing lam*rel - (1-lam)*max_sim_to_already_
    selected, lam = {MMR_LAM_NUM}/10 — the standard diversity rerank
    for RAG retrieval and for picking REPRESENTATIVE exemplars out of a
    near-dup cluster (relevance alone returns {MMR_K} copies of the
    same passage; MMR's penalty forces coverage).

    The greedy argmax is inherently sequential, so the plan unrolls
    MMR_K - 1 = {MMR_K - 1} selection rounds (the BPE-merge-train
    precedent): each round anti-joins the selected set off the pool,
    computes each survivor's max-similarity-to-selected from the
    PRECOMPUTED pool-internal pairwise table ({MMR_POOL}^2 rows per
    query, built once), and takes a per-query argmax window. Scores are
    EXACT BIGINTS — {MMR_LAM_NUM}*rel_micro - {MMR_OML_NUM}*ms_micro
    over the 6-digit similarity grid — so no selection can sit on a
    float rounding boundary (the observed 0.7*0.371485 half-boundary
    killed the float form); ties break on cid. At 100 TB nothing here
    scales with corpus size: the pool is TOP_K-window output (queries x
    {MMR_POOL} rows), psim is queries x {MMR_POOL}^2, and every join
    keys on (qid, cid) — the rerank is a constant-sized epilogue to
    whatever ANN query produced the pool."""
    emb = (load_parallel(spark, sf_dir, "embeddings")
           .select("vec_id", "embedding",
                   l2norm_col(F.col("embedding")).alias("nrm"))
           .filter(F.col("nrm") > 0))
    q = (emb.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qe"), F.col("nrm").alias("qn")))
    c = emb.select(F.col("vec_id").alias("cid"),
                   F.col("embedding").alias("ce"), F.col("nrm").alias("cn"))
    scored = (F.broadcast(q).crossJoin(c)
              .filter(F.col("cid") != F.col("qid"))
              .select("qid", "cid",
                      F.round(dot_col(F.col("qe"), F.col("ce"))
                              / (F.col("qn") * F.col("cn")), 6)
                      .alias("rel")))
    wrel = W.partitionBy("qid").orderBy(F.desc("rel"), F.asc("cid"))
    cands = (scored.withColumn("rn", F.row_number().over(wrel))
             .filter(F.col("rn") <= MMR_POOL).drop("rn")
             .withColumn("rel_m", F.round(F.col("rel") * 1000000)
                         .cast("bigint"))
             .localCheckpoint())
    ea = emb.select(F.col("vec_id").alias("c1"),
                    F.col("embedding").alias("e1"), F.col("nrm").alias("n1"))
    eb = emb.select(F.col("vec_id").alias("c2"),
                    F.col("embedding").alias("e2"), F.col("nrm").alias("n2"))
    a = cands.select("qid", F.col("cid").alias("c1"))
    b = cands.select("qid", F.col("cid").alias("c2"))
    psim = (a.join(b, "qid").filter(F.col("c1") != F.col("c2"))
            .join(ea, "c1").join(eb, "c2")
            .select("qid", "c1", "c2",
                    F.round(F.round(dot_col(F.col("e1"), F.col("e2"))
                                    / (F.col("n1") * F.col("n2")), 6)
                            * 1000000).cast("bigint").alias("s_m"))
            .localCheckpoint())
    s1 = (cands.withColumn("rn", F.row_number().over(wrel))
          .filter(F.col("rn") == 1)
          .select("qid", "cid", "rel",
                  (F.lit(MMR_LAM_NUM) * F.col("rel_m")).alias("mmr_m"),
                  F.lit(1).alias("rnk")))
    picks = [s1]
    sel = s1.select("qid", "cid")
    wmmr = W.partitionBy("qid").orderBy(F.desc("mmr_m"), F.asc("cid"))
    for r in range(2, MMR_K + 1):
        maxsim = (psim.join(sel.select("qid", F.col("cid").alias("c2")),
                            ["qid", "c2"])
                  .groupBy("qid", F.col("c1").alias("cid"))
                  .agg(F.max("s_m").alias("ms_m")))
        m = (cands.join(sel, ["qid", "cid"], "left_anti")
             .join(maxsim, ["qid", "cid"])
             .select("qid", "cid", "rel",
                     (F.lit(MMR_LAM_NUM) * F.col("rel_m")
                      - F.lit(MMR_OML_NUM) * F.col("ms_m")).alias("mmr_m")))
        sr = (m.withColumn("rn", F.row_number().over(wmmr))
              .filter(F.col("rn") == 1).drop("rn")
              .withColumn("rnk", F.lit(r))
              .localCheckpoint())
        picks.append(sr)
        sel = sel.unionByName(sr.select("qid", "cid"))
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.select("qid", F.col("rnk").cast("bigint").alias("rnk"),
                      "cid", "rel",
                      (F.col("mmr_m") / F.lit(_MMR_GRID)).alias("mmr"))


# Binary quantization: sign-bit codes packed into two 32-bit words
# (bigint-safe — a single 64-bit word would put dim 64 on the sign
# bit), Hamming shortlist of _BQ_M candidates, exact-cosine rerank.
_BQ_M = 40


@query("sim_binary_quantization_hamming", oracle=f"""
WITH e0 AS ({{E}}),
e AS (SELECT * FROM e0
      WHERE list_aggregate(list_transform(emb, x -> x * x), 'sum') > 0),
codes AS (
  SELECT vec_id, emb,
         list_aggregate(list_transform(range(1, 33),
           i -> CASE WHEN emb[CAST(i AS INTEGER)] > 0
                THEN CAST(2 ** (i - 1) AS BIGINT) ELSE 0 END),
           'sum') AS w0,
         list_aggregate(list_transform(range(33, 65),
           i -> CASE WHEN emb[CAST(i AS INTEGER)] > 0
                THEN CAST(2 ** (i - 33) AS BIGINT) ELSE 0 END),
           'sum') AS w1
  FROM e),
q AS (SELECT * FROM codes WHERE vec_id < {N_QUERIES}),
ham AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         CAST(bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1))
              AS BIGINT) AS hamming,
         q.emb AS qe, c.emb AS ce,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY bit_count(xor(q.w0, c.w0))
                                   + bit_count(xor(q.w1, c.w1)),
                                     c.vec_id) AS hrnk
  FROM q JOIN codes c ON c.vec_id != q.vec_id),
short AS (SELECT * FROM ham WHERE hrnk <= {_BQ_M}),
rerank AS (
  SELECT qid, cid, hamming,
         round(list_cosine_similarity(qe, ce), 6) AS cos
  FROM short),
ranked AS (
  SELECT qid, cid, hamming, cos,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos DESC, cid) AS rnk
  FROM rerank)
SELECT qid, cid, hamming, cos, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {TOP_K}
""".format(E=_E))
def sim_binary_quantization_hamming(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """BINARY QUANTIZATION + HAMMING SHORTLIST + EXACT RERANK (the
    1-bit compression path modern vector databases ship as "BQ":
    Jegou et al.'s sign-bit baseline, revived because a 64-dim float
    vector becomes 8 BYTES, so the first-stage scan is 32x smaller
    and pure integer): each embedding quantizes to its sign bits
    (packed into two 32-bit words — bigint-safe), every query scans
    the code table by XOR+popcount Hamming distance, keeps the
    {_BQ_M}-candidate shortlist, and reranks ONLY those with exact
    cosine. Completes the compression ladder next to int8
    (embedding_int8_quantize), PQ/ADC (sim_pq_adc_topk), and b-bit
    minhash.

    Determinism: codes, XOR, popcount, and the Hamming ranking are
    pure integers with a cid tiebreak; cosine rounds at 6 before the
    final deterministic rank (the sim_topk_cosine posture). Zero-norm
    vectors drop identically on both sides.

    Scale shape: the Hamming stage is a linear CODE scan — 8 bytes per
    vector, the reason BQ exists (a billion vectors = 8 GB, memory-
    resident per executor; the scan is SIMD popcount in columnar
    form). The declared broadcast-query-side scan mirrors
    sim_topk_cosine's exact baseline but touches 1/32 the bytes; the
    rerank reads full vectors for only queries x {_BQ_M} rows."""
    emb = (load_parallel(spark, sf_dir, "embeddings")
           .select("vec_id", "embedding",
                   l2norm_col(F.col("embedding")).alias("nrm"))
           .filter(F.col("nrm") > 0))

    def pack(lo: int) -> F.Column:
        # sum of 2^(i-lo) over dims i in [lo, lo+32) with emb[i] > 0;
        # aggregate preserves the i-ascending order (exact int sums —
        # order-free anyway)
        return F.aggregate(
            F.sequence(F.lit(lo), F.lit(lo + 31)),
            F.lit(0).cast("bigint"),
            lambda acc, i: acc + F.when(
                F.element_at("embedding", i.cast("int")) > 0,
                # 2^(i-lo) via pow (exact for powers of two <= 2^31;
                # the shiftleft() wrapper takes only literal shifts)
                F.pow(F.lit(2.0), (i - lo).cast("double"))
                .cast("bigint")).otherwise(0))

    codes = emb.select("vec_id", "embedding", "nrm",
                       pack(1).alias("w0"), pack(33).alias("w1"))
    q = (codes.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qe"), F.col("nrm").alias("qn"),
                 F.col("w0").alias("q0"), F.col("w1").alias("q1")))
    c = codes.select(F.col("vec_id").alias("cid"),
                     F.col("embedding").alias("ce"),
                     F.col("nrm").alias("cn"), "w0", "w1")
    hamming = (F.bit_count(F.expr("q0 ^ w0"))
               + F.bit_count(F.expr("q1 ^ w1"))).cast("bigint")
    ham = (F.broadcast(q).crossJoin(c)
           .filter(F.col("cid") != F.col("qid"))
           .withColumn("hamming", hamming))
    hrnk = F.row_number().over(
        W.partitionBy("qid").orderBy("hamming", "cid"))
    short = ham.withColumn("hrnk", hrnk).filter(F.col("hrnk") <= _BQ_M)
    rerank = short.select(
        "qid", "cid", "hamming",
        F.round(dot_col(F.col("qe"), F.col("ce"))
                / (F.col("qn") * F.col("cn")), 6).alias("cos"))
    rnk = F.row_number().over(
        W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid")))
    return (rerank.withColumn("rnk", rnk.cast("bigint"))
            .filter(F.col("rnk") <= TOP_K))


def _mutual_knn_oracle() -> str:
    from ..registry import ORACLE_SQL
    return f"""
WITH g AS ({ORACLE_SQL["sim_knn_graph"]})
SELECT a.qid AS va, a.cid AS vb, a.cos,
       CAST(a.rnk AS BIGINT) AS rnk_ab, CAST(b.rnk AS BIGINT) AS rnk_ba
FROM g a JOIN g b ON b.qid = a.cid AND b.cid = a.qid
WHERE a.qid < a.cid
"""


@query("sim_mutual_knn_pairs", eager=True, oracle=_mutual_knn_oracle())
def sim_mutual_knn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUTUAL (reciprocal) k-NEAREST-NEIGHBOR PAIRS over the corpus
    kNN graph — the k-reciprocal encoding behind re-ranking (Zhong et
    al. 2017) and the seed rule of RNN-based agglomerative clustering:
    an edge survives only if BOTH endpoints rank each other in their
    top-k, which strips the hub/antihub asymmetry that makes raw kNN
    graphs noisy in high dimensions. Emitted with both directional
    ranks so downstream re-rankers can weight by reciprocal depth.

    Built BY COMPOSITION: the Spark side reuses sim_knn_graph's
    registered builder (the converged adaptive-plane bucketed build —
    linear, never all-pairs) and adds one self-join on the directed
    edge table; the oracle wraps the graph's own registered oracle SQL
    as a CTE, so the two operators cannot drift.

    Determinism: the graph's cos is a symmetric rounded expression, so
    the pair orientation (va < vb) carries one value; ranks are the
    graph's deterministic (cos DESC, cid) ranks.

    Scale shape: the mutuality check is one self-EQUI-join of the
    (n x k)-row edge table on the reversed key — edge-list-sized, not
    data-sized; everything heavy already happened inside the bucketed
    graph build."""
    g = knn_graph_cached(spark, sf_dir)
    b = g.select(F.col("qid").alias("bq"), F.col("cid").alias("bc"),
                 F.col("rnk").alias("rnk_ba"))
    return (g.join(b, (F.col("bq") == F.col("cid"))
                   & (F.col("bc") == F.col("qid")))
            .filter(F.col("qid") < F.col("cid"))
            .select(F.col("qid").alias("va"), F.col("cid").alias("vb"),
                    "cos", F.col("rnk").cast("bigint").alias("rnk_ab"),
                    F.col("rnk_ba").cast("bigint").alias("rnk_ba")))


_LOF_TOP = 50


def _lof_oracle() -> str:
    from ..registry import ORACLE_SQL
    return f"""
WITH g0 AS ({ORACLE_SQL["sim_knn_graph"]}),
g AS MATERIALIZED (
  SELECT qid, cid,
         CAST(greatest(1, round((1 - cos) * 1000000)) AS BIGINT) AS d,
         rnk
  FROM g0),
s1 AS MATERIALIZED (
  SELECT qid FROM g GROUP BY qid HAVING count(*) = {KNN_K}),
kd AS MATERIALIZED (
  SELECT g.qid, g.d AS kdist
  FROM g JOIN s1 ON s1.qid = g.qid WHERE g.rnk = {KNN_K}),
s2 AS MATERIALIZED (
  SELECT g.qid FROM g
  JOIN s1 a ON a.qid = g.qid
  JOIN s1 c ON c.qid = g.cid
  GROUP BY g.qid HAVING count(*) = {KNN_K}),
reach AS (
  SELECT g.qid, g.cid, greatest(kd.kdist, g.d) AS r
  FROM g
  JOIN s2 ON s2.qid = g.qid
  JOIN kd ON kd.qid = g.cid),
lrd AS MATERIALIZED (
  SELECT qid, CAST(sum(r) AS BIGINT) AS lrd_inv FROM reach GROUP BY qid),
s3 AS MATERIALIZED (
  SELECT g.qid FROM g
  JOIN s2 a ON a.qid = g.qid
  JOIN s2 c ON c.qid = g.cid
  GROUP BY g.qid HAVING count(*) = {KNN_K}),
terms AS (
  SELECT g.qid, (la.lrd_inv * 1000000) // lb.lrd_inv AS term
  FROM g
  JOIN s3 ON s3.qid = g.qid
  JOIN lrd la ON la.qid = g.qid
  JOIN lrd lb ON lb.qid = g.cid),
lof AS (
  SELECT qid, CAST(sum(term) // {KNN_K} AS BIGINT) AS lof_micro
  FROM terms GROUP BY qid),
ranked AS (
  SELECT qid, lof_micro,
         row_number() OVER (ORDER BY lof_micro DESC, qid) AS rnk
  FROM lof)
SELECT CAST(qid AS BIGINT) AS vec_id, lof_micro,
       CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {_LOF_TOP}
"""


@query("sim_lof_outliers", eager=True, oracle=_lof_oracle())
def sim_lof_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL OUTLIER FACTOR (Breunig et al. 2000) over the corpus kNN
    graph — DENSITY-based multivariate outlier detection, completing
    the outlier family next to the univariate robust detectors
    (events_anomaly_mad, window_outlier_hampel, events_rolling_zscore):
    a vector is anomalous not by absolute distance but by how much
    SPARSER its neighborhood is than its neighbors' neighborhoods —
    the embedding-space form of "this document sits alone", the signal
    ANN-curation pipelines use to surface mislabeled/degenerate
    embeddings.

    Built BY COMPOSITION (the sim_mutual_knn_pairs convention): the
    Spark side reuses sim_knn_graph's registered builder; the oracle
    wraps the graph's registered SQL as a CTE, so graph and LOF cannot
    drift. k-distance = the rank-{KNN_K} edge; reach-dist(a,b) =
    max(k-dist(b), d(a,b)); lrd and LOF stay INTEGER: distances snap to
    the micro grid (clamped >= 1, so duplicate-vector zero-distance
    neighborhoods cannot divide by zero), lrd is carried as its
    inverse-sum integer, and each LOF term is lrd_inv(a)*1e6 //
    lrd_inv(b) — floor division on exact ints, engine-identical with
    no float ratio anywhere. Vectors are scored only where LOF is
    DEFINED on the approximate graph: S1 (full out-degree k) ⊇ S2
    (k-dist of all neighbors known) ⊇ S3 (lrd of all neighbors known),
    with the same closure joins on both engines.

    Scale shape: everything heavy is the graph build (bucketed,
    linear); LOF adds three equi-joins and two grouped sums over the
    (n x k)-row edge table — edge-list-sized, no new shuffle class.
    Reference scope: no similarity surface in the reference (SURVEY
    §2.5); declared extension."""
    from pyspark.sql import Window as W2

    # One InMemoryRelation boundary at the GRAPH only: the closure
    # levels s1 ⊇ s2 ⊇ s3 derive lazily from the cached edge table —
    # Spark's runtime exchange reuse already dedups their repeated
    # subtrees inside the single plan (measured 19 jobs / 175 tasks
    # lazy vs 33 jobs when each level was persisted: every extra cache
    # boundary costs an AQE materialization job and blocks reuse).
    g0 = knn_graph_cached(spark, sf_dir)
    g = g0.select(
        "qid", "cid", "rnk",
        F.greatest(F.lit(1), F.round((1 - F.col("cos")) * 1000000))
        .cast("bigint").alias("d"))
    s1 = (g.groupBy("qid").count()
          .filter(F.col("count") == KNN_K).select("qid"))
    kd = (g.join(s1, "qid").filter(F.col("rnk") == KNN_K)
          .select("qid", F.col("d").alias("kdist")))
    s2 = (g.join(s1, "qid")
          .join(s1.select(F.col("qid").alias("cid")), "cid")
          .groupBy("qid").count()
          .filter(F.col("count") == KNN_K).select("qid"))
    reach = (g.join(s2, "qid")
             .join(kd.select(F.col("qid").alias("cid"),
                             F.col("kdist")), "cid")
             .select("qid", "cid",
                     F.greatest(F.col("kdist"), F.col("d")).alias("r")))
    lrd = reach.groupBy("qid").agg(
        F.sum("r").cast("bigint").alias("lrd_inv"))
    s3 = (g.join(s2, "qid")
          .join(s2.select(F.col("qid").alias("cid")), "cid")
          .groupBy("qid").count()
          .filter(F.col("count") == KNN_K).select("qid"))
    terms = (g.join(s3, "qid")
             .join(lrd.select(F.col("qid").alias("cid"),
                              F.col("lrd_inv").alias("lb")), "cid")
             .join(lrd, "qid")
             .select("qid", F.expr("lrd_inv * 1000000 DIV lb").alias("term")))
    lof = terms.groupBy("qid").agg(
        F.expr(f"CAST(sum(term) DIV {KNN_K} AS BIGINT)").alias("lof_micro"))
    w = W2.orderBy(F.desc("lof_micro"), F.asc("qid"))
    return (lof.withColumn("rnk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rnk") <= _LOF_TOP)
            .select(F.col("qid").cast("bigint").alias("vec_id"),
                    "lof_micro", "rnk"))


# ---------------------------------------------------------------------------
# One NN-Descent refinement round over the kNN graph.


def _nndescent_oracle() -> str:
    from ..registry import ORACLE_SQL
    return f"""
WITH g AS MATERIALIZED ({ORACLE_SQL["sim_knn_graph"]}),
e AS ({_E}),
cand AS (
  SELECT DISTINCT a.qid, b.cid
  FROM g a JOIN g b ON b.qid = a.cid
  WHERE b.cid != a.qid),
fresh AS (
  SELECT c.qid, c.cid
  FROM cand c LEFT JOIN g ON g.qid = c.qid AND g.cid = c.cid
  WHERE g.qid IS NULL),
scored AS (
  SELECT f.qid, f.cid,
         round(list_cosine_similarity(eq.emb, ec.emb), 6) AS cos,
         TRUE AS is_new
  FROM fresh f
  JOIN e eq ON eq.vec_id = f.qid
  JOIN e ec ON ec.vec_id = f.cid
  UNION ALL
  SELECT qid, cid, cos, FALSE AS is_new FROM g),
ranked AS (
  SELECT qid, cid, cos, is_new,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
  FROM scored)
SELECT qid, cid, cos, rnk, is_new FROM ranked WHERE rnk <= {KNN_K}
"""


@query("sim_nndescent_round", eager=True, oracle=_nndescent_oracle())
def sim_nndescent_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One NN-DESCENT refinement round (Dong, Moses & Li WWW 2011) over
    the corpus kNN graph — THE production algorithm for building
    high-recall kNN graphs at scale (pynndescent, Faiss NNDescent,
    Spark-based graph builders all run this loop): "a neighbor of a
    neighbor is likely a neighbor", so each round proposes every
    two-hop pair (q -> b -> c), scores the proposals, and keeps the
    per-node top-k of old edges plus proposals. Recall rises steeply
    per round while cost stays bounded by n*k^2 proposals, never
    all-pairs — exactly the LSH-seeded + NN-Descent-refined recipe
    production indexes use (the LSH build seeds, this round refines).

    Built BY COMPOSITION (sim_mutual_knn_pairs convention): the Spark
    side reuses sim_knn_graph's registered builder and adds the
    proposal join; the oracle wraps the graph's registered oracle SQL
    as a CTE so the two operators cannot drift. Proposals that
    duplicate an existing edge are anti-joined out, so each kept edge
    carries an unambiguous `is_new` provenance flag (the measured
    per-round improvement an index build logs).

    Determinism: proposal scores reuse the exact rounded cosine
    expression of the graph build, so a proposal that TIES an old edge
    at 6 decimals ranks purely by (cos DESC, cid) on both engines.

    Scale shape: the proposal set is one self-EQUI-join of the n*k
    edge table on the shared endpoint (shuffle on cid — k^2 fan-out is
    the algorithm's own budget), one distinct, one anti-join, two
    embedding lookups (equi-joins on vec_id), and the per-node top-k
    window. Nothing scales past n*k^2 rows; at 100 TB the edge table
    is bucketed by qid and each round is a handful of co-partitioned
    shuffles — the iterated form checkpoints between rounds like the
    other loop operators."""
    # the edge table is referenced 4x inside _nnd_refine (both proposal
    # sides, the anti-join, the union); persisting the n*k-row frame
    # keeps the bucketed build from running once per reference (the
    # k-core edge precedent at similarity.py:1053) — model-sized,
    # released by the session's clearCache
    g = knn_graph_cached(spark, sf_dir)
    emb = (load_parallel(spark, sf_dir, "embeddings")
           .select("vec_id", "embedding",
                   l2norm_col(F.col("embedding")).alias("nrm")))
    return _nnd_refine(g.select("qid", "cid", "cos"), emb)


# ---------------------------------------------------------------------------
# Measured recall of the LSH kNN graph vs exact ground truth.


def _graph_recall_oracle() -> str:
    from ..registry import ORACLE_SQL
    return f"""
WITH g AS MATERIALIZED ({ORACLE_SQL["sim_knn_graph"]}),
e0 AS ({_E}),
nz AS (SELECT vec_id, emb FROM e0
       WHERE list_aggregate(list_transform(emb, x -> x * x), 'sum') > 0),
q AS (SELECT * FROM nz WHERE vec_id < {N_QUERIES}),
exact AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY round(list_cosine_similarity(q.emb, c.emb), 6) DESC,
                      c.vec_id) AS rnk
  FROM q JOIN nz c ON c.vec_id != q.vec_id),
truth AS (SELECT qid, cid FROM exact WHERE rnk <= {KNN_K})
SELECT t.qid,
       CAST(count(g.cid) AS BIGINT) AS n_hit,
       CAST((1000000 * count(g.cid)) // {KNN_K} AS BIGINT) AS recall_e6
FROM truth t LEFT JOIN g ON g.qid = t.qid AND g.cid = t.cid
GROUP BY t.qid
"""


@query("sim_graph_recall_eval", eager=True,
       oracle=_graph_recall_oracle())
def sim_graph_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED RECALL@k of the production kNN graph against exact
    brute-force ground truth — the eval every ANN deployment runs
    before trusting an index (the recall/QPS curve's y-axis): for a
    fixed query sample, compute the exact top-k by full scan, then
    count how many of those k the LSH-bucketed graph actually found.
    Completes the similarity family's measurement story: the TEXT
    dedup ladder has dedup_lsh_eval_pr; this is the embedding-graph
    analog, turning the graph's recall from a claim into a number
    (and pairing with sim_nndescent_round, whose refinement this eval
    measures the headroom for).

    Ground truth is brute-force on the {N_QUERIES}-query SAMPLE only —
    the broadcast-query-side declared-baseline class of
    sim_topk_cosine, and exactly how production evals work at 100 TB:
    exact search over a fixed sample, never all-pairs; the graph side
    is the bucketed build. Determinism: the exact ranking reuses the
    graph's rounded-cosine expression with (cos DESC, cid) ties, so
    truth sets are identical on both engines.

    Scale shape: sample x corpus scored pairs (a bounded broadcast
    sweep), one window top-k, one edge-table LEFT equi-join, one
    grouped count — nothing beyond the declared sample budget."""
    g = knn_graph_cached(spark, sf_dir)
    emb = (load_parallel(spark, sf_dir, "embeddings")
           .select("vec_id", "embedding",
                   l2norm_col(F.col("embedding")).alias("nrm"))
           .filter(F.col("nrm") > 0))
    q = (emb.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qe"), F.col("nrm").alias("qn")))
    c = emb.select(F.col("vec_id").alias("cid"),
                   F.col("embedding").alias("ce"), F.col("nrm").alias("cn"))
    from pyspark.sql import Window as W2
    scored = (F.broadcast(q).crossJoin(c)
              .filter(F.col("cid") != F.col("qid"))
              .select("qid", "cid",
                      F.round(dot_col(F.col("qe"), F.col("ce"))
                              / (F.col("qn") * F.col("cn")), 6)
                      .alias("cos")))
    w = W2.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    truth = (scored.withColumn("rnk", F.row_number().over(w))
             .filter(F.col("rnk") <= KNN_K).select("qid", "cid"))
    hit = truth.join(g.select("qid", "cid", F.lit(1).alias("hit")),
                     ["qid", "cid"], "left")
    return (hit.groupBy("qid")
            .agg(F.count("hit").cast("bigint").alias("n_hit"),
                 F.expr(f"CAST((1000000 * count(hit)) DIV {KNN_K} "
                        "AS BIGINT)").alias("recall_e6")))


# ---------------------------------------------------------------------------
# NN-Descent iterated to convergence, with the per-round recall curve.
#
# Round 10 shipped the forward-proposal-only loop at working width k=3
# and MEASURED it saturating at recall@3 = 0.233 — the refinement starves
# because proposals only come from forward two-hop walks over a 3-wide
# graph. Round 11 upgrades the iterated operator to production NN-Descent
# (Dong, Moses & Li WWW 2011 §2.2/§4): (a) REVERSE-NEIGHBOR proposals —
# candidates are all pairs sharing ANY endpoint in the UNDIRECTED
# neighborhood B[v] ∪ R[v], with R capped at _NND_KP per node so the
# per-round budget stays n·(2k')² — and (b) a WORKING WIDTH k' = _NND_KP
# > k during refinement, truncated back to k only for measurement. The
# single-round operator sim_nndescent_round keeps the textbook forward
# form (its own oracle, unchanged); the curve runs the full algorithm.

_NND_ROUNDS = 6   # measured: recall@3 plateaus 0.989 (sf0.01) by round 5
_NND_KP = 16      # working neighbor-list width k' during refinement


def _nnd_round_sql(prev: str, cur: str) -> str:
    """One FULL NN-Descent refinement round as oracle CTE text over
    working graph `prev`(qid, cid, cos): reverse edges capped at
    _NND_KP per node by (cos DESC, qid), undirected neighborhood u,
    proposals = all ordered pairs sharing a pivot node, anti-join
    against existing edges, exact rounded-cosine scoring, per-node
    top-_NND_KP keep. The kept set `cur` carries is_new so the round's
    accepted-edge count is auditable."""
    return f"""
rev_{cur} AS (
  SELECT cid AS m, qid AS x FROM (
    SELECT qid, cid, cos,
           row_number() OVER (PARTITION BY cid
                              ORDER BY cos DESC, qid) AS rr
    FROM {prev}) WHERE rr <= {_NND_KP}),
u_{cur} AS (SELECT qid AS m, cid AS x FROM {prev}
            UNION SELECT m, x FROM rev_{cur}),
cand_{cur} AS (
  SELECT DISTINCT a.x AS qid, b.x AS cid
  FROM u_{cur} a JOIN u_{cur} b ON a.m = b.m
  WHERE a.x != b.x),
fresh_{cur} AS (
  SELECT c.qid, c.cid FROM cand_{cur} c
  LEFT JOIN {prev} e ON e.qid = c.qid AND e.cid = c.cid
  WHERE e.cid IS NULL),
sc_{cur} AS (
  SELECT f.qid, f.cid,
         round(list_cosine_similarity(qe.emb, ce.emb), 6) AS cos
  FROM fresh_{cur} f
  JOIN nz qe ON qe.vec_id = f.qid
  JOIN nz ce ON ce.vec_id = f.cid),
{cur} AS MATERIALIZED (
  SELECT qid, cid, cos, is_new FROM (
    SELECT qid, cid, cos, is_new,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cos DESC, cid) AS rn
    FROM (SELECT qid, cid, cos, TRUE AS is_new FROM sc_{cur}
          UNION ALL
          SELECT qid, cid, cos, FALSE AS is_new FROM {prev})) t
  WHERE rn <= {_NND_KP})"""


def _nnd_curve_oracle() -> str:
    from ..registry import ORACLE_SQL
    rounds = "".join(
        "," + _nnd_round_sql(f"g{r - 1}", f"g{r}")
        for r in range(1, _NND_ROUNDS + 1))
    stats = ",\n".join(
        f"""st{r} AS (
  SELECT CAST({r} AS BIGINT) AS round,
         CAST((SELECT count(*) FROM g{r} WHERE is_new) AS BIGINT)
           AS n_new_edges,
         CAST(count(g.cid) AS BIGINT) AS n_hit
  FROM truth t LEFT JOIN (
    SELECT qid, cid FROM (
      SELECT qid, cid,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, cid) AS rn
      FROM g{r}) WHERE rn <= {KNN_K}) g
    ON g.qid = t.qid AND g.cid = t.cid)"""
        for r in range(1, _NND_ROUNDS + 1))
    unions = " UNION ALL ".join(
        f"SELECT * FROM st{r}" for r in range(_NND_ROUNDS + 1))
    return f"""
WITH g0 AS MATERIALIZED (
  SELECT qid, cid, cos FROM ({ORACLE_SQL["sim_knn_graph"]})),
e0 AS ({_E}),
nz AS (SELECT vec_id, emb FROM e0
       WHERE list_aggregate(list_transform(emb, x -> x * x), 'sum') > 0),
q AS (SELECT * FROM nz WHERE vec_id < {N_QUERIES}),
exact AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY round(list_cosine_similarity(q.emb, c.emb), 6) DESC,
                      c.vec_id) AS rnk
  FROM q JOIN nz c ON c.vec_id != q.vec_id),
truth AS (SELECT qid, cid FROM exact WHERE rnk <= {KNN_K}),
tn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM truth)
{rounds},
st0 AS (
  SELECT CAST(0 AS BIGINT) AS round, CAST(0 AS BIGINT) AS n_new_edges,
         CAST(count(g.cid) AS BIGINT) AS n_hit
  FROM truth t LEFT JOIN g0 g ON g.qid = t.qid AND g.cid = t.cid),
{stats}
SELECT s.round, s.n_new_edges, s.n_hit,
       CAST(CASE WHEN tn.n = 0 THEN 0
            ELSE (1000000 * s.n_hit) // tn.n END AS BIGINT) AS recall_e6
FROM ({unions}) s, tn
"""


def _nnd_refine(g: DataFrame, emb: DataFrame) -> DataFrame:
    """One NN-Descent round over graph g(qid, cid, cos) against
    embedding table emb(vec_id, embedding, nrm): returns the refined
    per-node top-KNN_K as (qid, cid, cos, rnk, is_new). The shared loop
    body of sim_nndescent_round (single round, full provenance output)
    and sim_nndescent_recall_curve (iterated with per-round recall)."""
    cand = (g.select(F.col("qid"), F.col("cid").alias("mid"))
            .join(g.select(F.col("qid").alias("mid"),
                           F.col("cid").alias("ccid")), "mid")
            .filter(F.col("ccid") != F.col("qid"))
            .select("qid", F.col("ccid").alias("cid"))
            .distinct())
    fresh = cand.join(g.select("qid", "cid"), ["qid", "cid"], "left_anti")
    eq = emb.select(F.col("vec_id").alias("qid"),
                    F.col("embedding").alias("qe"), F.col("nrm").alias("qn"))
    ec = emb.select(F.col("vec_id").alias("cid"),
                    F.col("embedding").alias("ce"), F.col("nrm").alias("cn"))
    scored_new = (fresh.join(eq, "qid").join(ec, "cid")
                  .select("qid", "cid",
                          F.round(dot_col(F.col("qe"), F.col("ce"))
                                  / (F.col("qn") * F.col("cn")), 6)
                          .alias("cos"),
                          F.lit(True).alias("is_new")))
    unioned = scored_new.unionByName(
        g.select("qid", "cid", "cos", F.lit(False).alias("is_new")))
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (unioned.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= KNN_K)
            .select("qid", "cid", "cos", "rnk", "is_new"))


def _nnd_refine_full(g: DataFrame, emb: DataFrame) -> DataFrame:
    """One FULL NN-Descent round (reverse neighbors + working width)
    over working graph g(qid, cid, cos): reverse edges capped at
    _NND_KP per node by (cos DESC, qid), undirected neighborhood u,
    proposals = all ordered pairs of nodes sharing a pivot, anti-join
    against existing edges, exact scoring, per-node top-_NND_KP keep.
    Spark twin of the _nnd_round_sql CTE generator (kept textually
    parallel so the two cannot drift)."""
    rr = F.row_number().over(
        W.partitionBy("cid").orderBy(F.desc("cos"), F.asc("qid")))
    rev = (g.withColumn("rr", rr).filter(F.col("rr") <= _NND_KP)
           .select(F.col("cid").alias("m"), F.col("qid").alias("x")))
    u = (g.select(F.col("qid").alias("m"), F.col("cid").alias("x"))
         .unionByName(rev).distinct())
    cand = (u.select("m", F.col("x").alias("qid"))
            .join(u.select("m", F.col("x").alias("cid")), "m")
            .filter(F.col("qid") != F.col("cid"))
            .select("qid", "cid").distinct())
    fresh = cand.join(g.select("qid", "cid"), ["qid", "cid"], "left_anti")
    eq = emb.select(F.col("vec_id").alias("qid"),
                    F.col("embedding").alias("qe"), F.col("nrm").alias("qn"))
    ec = emb.select(F.col("vec_id").alias("cid"),
                    F.col("embedding").alias("ce"), F.col("nrm").alias("cn"))
    scored_new = (fresh.join(eq, "qid").join(ec, "cid")
                  .select("qid", "cid",
                          F.round(dot_col(F.col("qe"), F.col("ce"))
                                  / (F.col("qn") * F.col("cn")), 6)
                          .alias("cos"),
                          F.lit(True).alias("is_new")))
    unioned = scored_new.unionByName(
        g.select("qid", "cid", "cos", F.lit(False).alias("is_new")))
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (unioned.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= _NND_KP)
            .select("qid", "cid", "cos", "is_new"))


@query("sim_nndescent_recall_curve", eager=True,
       oracle=_nnd_curve_oracle())
def sim_nndescent_recall_curve(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """FULL NN-DESCENT ITERATED TO CONVERGENCE with the measured
    per-round RECALL CURVE (Dong, Moses & Li WWW 2011 §2.2/§4) — the
    r10 verdict's ceiling ask: the forward-only k-wide loop saturated
    at a MEASURED recall@{KNN_K} of 0.233 because proposals only came
    from forward two-hop walks over a 3-wide graph. This operator runs
    the production algorithm — REVERSE-NEIGHBOR proposals (undirected
    neighborhood B[v] ∪ R[v], R capped at {_NND_KP}/node) at WORKING
    WIDTH k' = {_NND_KP} (truncated back to k = {KNN_K} only for
    measurement) — for {_NND_ROUNDS} rounds, counting exact
    recall@{KNN_K} against brute-force truth on the {N_QUERIES}-query
    sample after every round. Measured: 0.178 → 0.989 at sf0.01
    (plateau by round 5) and 0.044 → 0.756 at sf0.1 — where the
    forward-only form plateaued at 0.233/0.156. Recall stays provably
    NON-DECREASING per round: the measured top-{KNN_K} is ranked over
    a pool that contains the previous working graph, and a truth edge
    can only be displaced by an edge ranking strictly higher in the
    same (cos DESC, cid) order — of which, for a truth edge, at most
    {KNN_K}-1 exist (pinned in tests/test_llm_ops_oracle.py).

    Composition: the seed graph is the registered sim_knn_graph
    builder/oracle; the Spark round body (_nnd_refine_full) and the
    oracle CTE generator (_nnd_round_sql) are kept textually parallel.
    sim_nndescent_round keeps the textbook single-round forward form
    against its own oracle — the curve is the production loop.

    Scale shape: each round is bounded by n·(2k')² proposals (the
    reverse cap makes the undirected degree ≤ 2k', so the pivot join
    fans out quadratically in k', never in n) — the paper's sampled
    local-join budget; the truth side is the declared
    {N_QUERIES}-query broadcast sample, exactly how production evals
    measure recall at 100 TB. Rounds localCheckpoint between
    iterations (the min_label_cc lineage discipline: the round body
    references the previous graph several times, so un-truncated plans
    would grow exponentially in rounds)."""
    g = (knn_graph_cached(spark, sf_dir)
         .select("qid", "cid", "cos"))
    emb = (load_parallel(spark, sf_dir, "embeddings")
           .select("vec_id", "embedding",
                   l2norm_col(F.col("embedding")).alias("nrm"))
           .filter(F.col("nrm") > 0))
    q = (emb.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qe"), F.col("nrm").alias("qn")))
    c = emb.select(F.col("vec_id").alias("cid"),
                   F.col("embedding").alias("ce"), F.col("nrm").alias("cn"))
    scored = (F.broadcast(q).crossJoin(c)
              .filter(F.col("cid") != F.col("qid"))
              .select("qid", "cid",
                      F.round(dot_col(F.col("qe"), F.col("ce"))
                              / (F.col("qn") * F.col("cn")), 6)
                      .alias("cos")))
    wt = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    truth = (scored.withColumn("rnk", F.row_number().over(wt))
             .filter(F.col("rnk") <= KNN_K).select("qid", "cid")
             .persist())
    n_truth = truth.count()

    def hit_frame(graph: DataFrame) -> DataFrame:
        # top-KNN_K truncation of the working graph, semi-joined to truth
        wk = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
        top = (graph.withColumn("rn", F.row_number().over(wk))
               .filter(F.col("rn") <= KNN_K).select("qid", "cid"))
        return (truth.join(top, ["qid", "cid"], "left_semi")
                .agg(F.count(F.lit(1)).alias("n_hit")))

    rows = [(0, 0, int(hit_frame(g).first()["n_hit"]))]
    for r in range(1, _NND_ROUNDS + 1):
        # ONE action per round (was three: eager localCheckpoint +
        # n_new count + n_hit count): the round body checkpoints
        # NON-eagerly — the fused (n_new x n_hit) scalar join below
        # materializes it and reads both counts off the checkpointed
        # RDD in the same job (guide §1.2/§2.6: driver-loop actions
        # are pure per-round overhead at every scale).
        refined = _nnd_refine_full(g, emb).localCheckpoint(eager=False)
        g = refined.select("qid", "cid", "cos")
        stats = (refined.agg(
                     F.sum(F.when(F.col("is_new"), 1).otherwise(0))
                     .cast("bigint").alias("n_new"))
                 .crossJoin(hit_frame(g)).first())
        rows.append((r, int(stats["n_new"]), int(stats["n_hit"])))
    truth.unpersist()
    out = [(r, nn, nh,
            (1000000 * nh) // n_truth if n_truth else 0)
           for r, nn, nh in rows]
    return spark.createDataFrame(
        out, "round bigint, n_new_edges bigint, n_hit bigint, "
             "recall_e6 bigint")


# ---------------------------------------------------------------------------
# rho-sampled NN-Descent round: the Dong §4.2 cost knob made real.

_NND_SAMPLE = 8   # sampled undirected neighbors per pivot node


def _nnd_sampled_oracle() -> str:
    from ..registry import ORACLE_SQL
    return f"""
WITH g AS MATERIALIZED (
  SELECT qid, cid, cos FROM ({ORACLE_SQL["sim_knn_graph"]})),
e AS ({_E}),
nz AS (SELECT vec_id, emb FROM e
       WHERE list_aggregate(list_transform(emb, x -> x * x), 'sum') > 0),
u AS (SELECT qid AS m, cid AS x FROM g
      UNION SELECT cid AS m, qid AS x FROM g),
us AS (
  SELECT m, x FROM (
    SELECT m, x,
           row_number() OVER (PARTITION BY m ORDER BY
             ('0x' || substr(md5(CAST(m AS VARCHAR) || '|nns|'
                             || CAST(x AS VARCHAR)), 1, 8))::BIGINT,
             x) AS sr
    FROM u) WHERE sr <= {_NND_SAMPLE}),
cand AS (
  SELECT DISTINCT a.x AS qid, b.x AS cid
  FROM us a JOIN us b ON a.m = b.m
  WHERE a.x != b.x),
fresh AS (
  SELECT c.qid, c.cid FROM cand c
  LEFT JOIN g ON g.qid = c.qid AND g.cid = c.cid
  WHERE g.cid IS NULL),
scored AS (
  SELECT f.qid, f.cid,
         round(list_cosine_similarity(eq.emb, ec.emb), 6) AS cos,
         TRUE AS is_new
  FROM fresh f
  JOIN nz eq ON eq.vec_id = f.qid
  JOIN nz ec ON ec.vec_id = f.cid
  UNION ALL
  SELECT qid, cid, cos, FALSE AS is_new FROM g),
ranked AS (
  SELECT qid, cid, cos, is_new,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
  FROM scored)
SELECT qid, cid, cos, rnk, is_new FROM ranked WHERE rnk <= {KNN_K}
"""


@query("sim_nndescent_sampled_round", eager=True,
       oracle=_nnd_sampled_oracle())
def sim_nndescent_sampled_round(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """rho-SAMPLED NN-Descent round (Dong, Moses & Li WWW 2011 §4.2 —
    the sampling that makes the local join affordable at scale): the
    full algorithm's per-round budget is n·(2k')² proposals, and the
    round-11 rehearsal MEASURED that budget dominating the wall at
    200k vectors (599 s for the 6-round curve, ~200M scored proposals
    per round spilling through every shuffle; SCALE.md round 11). The
    production knob is to SAMPLE each pivot's undirected neighborhood
    down to a fixed S before proposing pairs — cost drops to n·S²
    REGARDLESS of k' or reverse in-degree (sampling subsumes the
    reverse cap), at the price of fewer proposals per round (more
    rounds to converge, same total work, bounded memory).

    Determinism (the part the paper leaves to an RNG): the sample
    keeps the S neighbors with the smallest det_hash64(m|nns|x) —
    content-addressed, partition-invariant, replayed bit-for-bit by
    the DuckDB oracle — so the sampled candidate set is identical on
    both engines and across cluster layouts. Output is
    sim_nndescent_round's exact schema (per-node top-{KNN_K} of
    old-union-proposals with is_new provenance), so the two rounds are
    directly comparable: same seed graph, same keep rule, only the
    proposal budget differs.

    Scale shape: one hash-ranked window over the 2nk-row undirected
    edge list (keyed by pivot), one self-equi-join bounded by n·S²,
    one anti-join, two vec_id equi-joins, one per-node top-k window —
    every shuffle keyed, nothing global, budget independent of hub
    degree."""
    g = knn_graph_cached(spark, sf_dir)
    from ..functions.vector import det_hash64
    emb = (load_parallel(spark, sf_dir, "embeddings")
           .select("vec_id", "embedding",
                   l2norm_col(F.col("embedding")).alias("nrm")))
    u = (g.select(F.col("qid").alias("m"), F.col("cid").alias("x"))
         .unionByName(g.select(F.col("cid").alias("m"),
                               F.col("qid").alias("x")))
         .distinct())
    sr = F.row_number().over(
        W.partitionBy("m").orderBy(
            det_hash64(F.concat(F.col("m").cast("string"), F.lit("|nns|"),
                                F.col("x").cast("string"))), "x"))
    us = u.withColumn("sr", sr).filter(F.col("sr") <= _NND_SAMPLE)
    cand = (us.select("m", F.col("x").alias("qid"))
            .join(us.select("m", F.col("x").alias("cid")), "m")
            .filter(F.col("qid") != F.col("cid"))
            .select("qid", "cid").distinct())
    fresh = cand.join(g.select("qid", "cid"), ["qid", "cid"], "left_anti")
    eq = emb.select(F.col("vec_id").alias("qid"),
                    F.col("embedding").alias("qe"), F.col("nrm").alias("qn"))
    ec = emb.select(F.col("vec_id").alias("cid"),
                    F.col("embedding").alias("ce"), F.col("nrm").alias("cn"))
    scored_new = (fresh.join(eq, "qid").join(ec, "cid")
                  .select("qid", "cid",
                          F.round(dot_col(F.col("qe"), F.col("ce"))
                                  / (F.col("qn") * F.col("cn")), 6)
                          .alias("cos"),
                          F.lit(True).alias("is_new")))
    unioned = scored_new.unionByName(
        g.select("qid", "cid", "cos", F.lit(False).alias("is_new")))
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (unioned.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= KNN_K)
            .select("qid", "cid", "cos", "rnk", "is_new"))
