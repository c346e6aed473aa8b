"""End-to-end LLM training-corpus pipeline (north-star composition).

One registered query chains the stages every corpus build runs — score ->
quantile filter -> exact dedup -> near-dup dedup -> corpus stats — each
stage reusing an operator that is individually oracle-verified elsewhere
(text.py quality score, sketch-threshold filter; dedup.py exact +
MinHash-LSH). The full chain has a single DuckDB oracle, so composition
bugs (stage ordering, survivor-set plumbing) are caught, not just the
pieces.

Physical shape at 100 TB, stage by stage:
1. score      — narrow (split once at a projection boundary, two sizes)
2. threshold  — percentile_approx sketch -> one driver scalar, folded
                back as a literal (narrow filter, no join)
3. exact dup  — row_number over (md5(text)) partitions: one shuffle on a
                16-byte key, no global ordering
4. near dup   — banded MinHash equi-join (candidates only, verified
                exactly) from dedup.py, restricted to survivors; drop
                the greater id of each verified pair (deterministic)
5. stats      — per-lang partial agg

The only shuffles are keyed (hash, band-key, lang); nothing global, no
window without a partition key, no cartesian anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_parallel
from .dedup import _LSH_PAIRS_SQL, dedup_minhash_lsh

_PIPELINE_ORACLE = f"""
WITH {_LSH_PAIRS_SQL.lstrip()},
m AS (
  SELECT d.doc_id, d.lang, d.text,
         CAST(len(t0.w) AS BIGINT) AS ntok,
         round(0.4 * least(len(t0.w) / 100.0, 1.0)
               + 0.6 * (len(list_distinct(t0.w)) * 1.0 / len(t0.w)), 6)
           AS quality
  FROM documents d JOIN t0 ON t0.doc_id = d.doc_id
),
thr AS (SELECT quantile_disc(quality, 0.1) AS t FROM m),
s1 AS (SELECT m.* FROM m, thr WHERE m.quality >= thr.t),
s2 AS (
  SELECT * FROM (
    SELECT s1.*, row_number() OVER (PARTITION BY md5(text)
                                    ORDER BY doc_id) AS rn
    FROM s1) WHERE rn = 1
),
dropped AS (
  SELECT DISTINCT p.doc_b FROM pairs p
  JOIN s2 a ON a.doc_id = p.doc_a
  JOIN s2 b ON b.doc_id = p.doc_b
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(ntok) AS BIGINT) AS total_tokens,
       round(avg(quality), 6) AS avg_quality
FROM s2 WHERE doc_id NOT IN (SELECT doc_b FROM dropped)
GROUP BY lang
"""


@query("pipeline_llm_corpus", oracle=_PIPELINE_ORACLE)
def pipeline_llm_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus build as one plan — see module docstring for the
    per-stage physical argument. Near-dup rule: among quality+exact
    survivors, the GREATER doc_id of every verified LSH pair is dropped
    (deterministic, order-free; full cluster resolution is
    dedup_connected_components' job)."""
    docs = load_parallel(spark, sf_dir, "documents")
    w = F.split("text", " ")
    scored = (docs
              .select("doc_id", "lang", "text", w.alias("w"))
              .select("doc_id", "lang", "text",
                      F.size("w").cast("bigint").alias("ntok"),
                      F.size("w").cast("double").alias("n"),
                      F.size(F.array_distinct("w")).cast("double").alias("nd"))
              .select("doc_id", "lang", "text", "ntok",
                      F.round(0.4 * F.least(F.col("n") / 100.0, F.lit(1.0))
                              + 0.6 * (F.col("nd") / F.col("n")), 6)
                      .alias("quality")))
    thr = scored.agg(
        F.percentile_approx("quality", F.lit(0.1), F.lit(1000000))).first()[0]
    s1 = scored.filter(F.col("quality") >= F.lit(float(thr)))
    s2 = (s1.withColumn("rn", F.row_number().over(
              W.partitionBy(F.md5("text")).orderBy("doc_id")))
          .filter(F.col("rn") == 1).drop("rn"))
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    ids = s2.select("doc_id")
    dropped = (pairs
               .join(ids.withColumnRenamed("doc_id", "doc_a"), "doc_a")
               .join(ids.withColumnRenamed("doc_id", "doc_b"), "doc_b")
               .select("doc_b").distinct())
    final = s2.join(dropped, s2.doc_id == dropped.doc_b, "left_anti")
    return (final.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("ntok").alias("total_tokens"),
                 F.round(F.avg("quality"), 6).alias("avg_quality")))
