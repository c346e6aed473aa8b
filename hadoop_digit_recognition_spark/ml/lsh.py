"""MLlib LSH parity queries (SURVEY.md §2.5 names MinHashLSH /
BucketedRandomProjectionLSH as the sanctioned built-ins next to the
hand-rolled variants in operators/dedup.py and operators/similarity.py).

Both register rows-only per the driver contract: MLlib's hash families
are JVM-seeded (not content hashes), so no external engine can replay
them — the correctness check is the pytest agreement suite
(tests/test_ml_oracle.py) grading candidate recall against the
oracle-exact hand-rolled twins.

Scale posture is identical to the hand-rolled twins: approxSimilarityJoin
is an equi-join on (hash-table, hash-value) — candidates only, never
all-pairs — followed by an exact distance verify on the joined rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_parallel
from ..operators.dedup import JACCARD_THRESHOLD, shingle_arrays
from ..operators.similarity import N_QUERIES, TOP_K

HASHING_TF_FEATURES = 1 << 18  # shingle-set feature space (collision-sparse)
MINHASH_TABLES = 8             # match hand-rolled NUM_HASHES
BRP_TABLES = 4
BRP_BUCKET_LEN = 0.5           # on unit-normalized vectors (d in [0, 2])


def _shingle_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, features): distinct word 3-shingles as a binary sparse
    vector via HashingTF — same shingling as the hand-rolled minhash
    (dedup.shingle_arrays), so Jaccard over feature sets approximates
    Jaccard over shingle sets up to 2^-18-rate hash collisions."""
    from pyspark.ml.feature import HashingTF

    sh = shingle_arrays(spark, sf_dir).select("doc_id", "sh")
    tf = HashingTF(inputCol="sh", outputCol="features",
                   numFeatures=HASHING_TF_FEATURES, binary=True)
    return tf.transform(sh).select("doc_id", "features")


@query("dedup_minhash_mllib", rows_only=(
    "MLlib MinHashLSH's hash family is JVM-seeded "
    "(dedup_minhash_lsh is the oracle-exact twin)",
    "test_mllib_minhash_agrees_with_handrolled"))
def dedup_minhash_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash dedup via pyspark.ml.feature.MinHashLSH — the built-in
    twin of dedup_minhash_lsh. approxSimilarityJoin generates candidates
    by equi-joining per-table hash values (OR-amplified over
    MINHASH_TABLES single-hash tables, a superset of the banded
    candidates) and verifies with the EXACT Jaccard distance of the
    sparse shingle vectors, so the surviving pairs are threshold-exact
    modulo HashingTF collisions. Agreement vs the hand-rolled twin is
    graded in tests/test_ml_oracle.py."""
    from pyspark.ml.feature import MinHashLSH

    vecs = _shingle_vectors(spark, sf_dir)
    mh = MinHashLSH(inputCol="features", outputCol="hashes",
                    numHashTables=MINHASH_TABLES, seed=7)
    model = mh.fit(vecs)
    joined = model.approxSimilarityJoin(
        vecs, vecs, 1.0 - JACCARD_THRESHOLD, distCol="jdist")
    return (joined
            .filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
            .select(F.col("datasetA.doc_id").alias("doc_a"),
                    F.col("datasetB.doc_id").alias("doc_b"),
                    F.round(1.0 - F.col("jdist"), 6).alias("jaccard")))


@query("sim_ann_mllib_brp", rows_only=(
    "BucketedRandomProjectionLSH draws JVM-seeded hyperplanes "
    "(sim_ann_lsh / sim_ivf_det_topk are the deterministic twins)",
    "test_mllib_brp_recall_vs_exact"))
def sim_ann_mllib_brp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via BucketedRandomProjectionLSH — the built-in twin of
    sim_ann_lsh / sim_ivf_topk. Vectors are unit-normalized first so
    euclidean distance is monotone in cosine (d^2 = 2 - 2cos), making
    the result comparable with the cosine-ranked exact baseline
    (recall graded in tests/test_ml_oracle.py). Join shape: equi-join on
    (table, bucket) — candidates only — then exact distance verify and a
    per-query top-k window over the small candidate set."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    emb = (load_parallel(spark, sf_dir, "embeddings")
           .select("vec_id",
                   array_to_vector(F.col("embedding").cast("array<double>"))
                   .alias("raw")))
    unit = Normalizer(inputCol="raw", outputCol="features", p=2.0)
    vecs = unit.transform(emb).select("vec_id", "features")

    brp = BucketedRandomProjectionLSH(inputCol="features", outputCol="hashes",
                                      numHashTables=BRP_TABLES,
                                      bucketLength=BRP_BUCKET_LEN, seed=7)
    model = brp.fit(vecs)
    q = vecs.filter(F.col("vec_id") < N_QUERIES)
    # euclidean threshold sqrt(2 - 2*0.0) = sqrt(2) admits every non-negative
    # cosine candidate; the LSH bucketing (not this threshold) prunes.
    joined = model.approxSimilarityJoin(q, vecs, 1.415, distCol="edist")
    scored = (joined
              .filter(F.col("datasetA.vec_id") != F.col("datasetB.vec_id"))
              .select(F.col("datasetA.vec_id").alias("qid"),
                      F.col("datasetB.vec_id").alias("cid"),
                      # cos = 1 - d^2/2 on unit vectors
                      F.round(1.0 - F.col("edist") * F.col("edist") / 2.0, 6)
                      .alias("cos")))
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rnk") <= TOP_K))
