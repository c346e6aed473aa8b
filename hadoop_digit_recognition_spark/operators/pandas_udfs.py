"""The sanctioned Python UDF surface, exercised end-to-end (SURVEY.md
§2.5 'UDF/UDAF/UDTF' row — in the reference the mapper/reducer classes
ARE the UDF surface).

Coverage across the engine:
- scalar pandas_udf      -> rbm.cd1.forward_prop_df
- mapInPandas            -> rbm.cd1.cd1_gradient_df, multimodal
- applyInPandasWithState -> streaming.running_user_counts
- applyInPandas (grouped map), grouped-agg pandas_udf, Python UDTF -> HERE

Both queries have exact DuckDB oracles: the point is proving the
Arrow-batched Python path computes the same answer as the relational
form — the property that lets you drop to Python for the genuinely
non-SQL math (CD-1) without losing auditability.

Scale: applyInPandas shuffles each group to one task — group count must
exceed task slots and no group may exceed executor memory (here: 5
event_types x ~12k rows; for skewed groups, pre-salt). Grouped-agg
pandas_udf partial-aggregates per partition like any AggregateFunction.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..tables import load


@query("grouped_zscore_pandas", oracle="""
SELECT event_id,
       event_type,
       round((value - avg(value) OVER (PARTITION BY event_type))
             / stddev_samp(value) OVER (PARTITION BY event_type), 6) AS z
FROM events
""")
def grouped_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score via applyInPandas (grouped map): each group
    arrives as one pandas DataFrame, normalization is vectorized NumPy,
    output schema is declared. The oracle computes the identical values
    with window functions — same mean, same sample stddev."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        return pd.DataFrame({
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "z": ((v - v.mean()) / v.std(ddof=1)).round(6),
        })

    return ev.groupBy("event_type").applyInPandas(
        zscore, "event_id bigint, event_type string, z double")


@query("grouped_wavg_pandas", oracle="""
SELECT event_type,
       round(sum(value * (event_id % 7 + 1)) / sum(event_id % 7 + 1), 6)
         AS wavg
FROM events GROUP BY event_type
""")
def grouped_wavg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mean per event_type via a grouped-agg pandas_udf (the
    UDAF surface): Arrow-batched, partial-aggregated like any built-in
    aggregate. Weight = event_id % 7 + 1 (deterministic, engine-neutral)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    ev = (load(spark, sf_dir, "events")
          .select("event_type", "value",
                  (F.col("event_id") % 7 + 1).cast("double").alias("w")))
    return (ev.groupBy("event_type")
            .agg(F.round(wavg("value", "w"), 6).alias("wavg")))


@query("udtf_tokenize", oracle="""
WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       CAST(generate_subscripts(w, 1) - 1 AS INTEGER) AS pos,
       unnest(w) AS word
FROM t0 WHERE doc_id < 50
""")
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row -> many output rows,
    consumed via LATERAL join. API-coverage demo with an exact oracle —
    in production this exact expansion is `posexplode(split(...))`
    (JVM-side, ~100x cheaper); the UDTF surface exists for expansions
    with genuinely imperative logic (parsers, tokenizers with state)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, word: string")
    class Tokenize:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield i, w

    spark.udtf.register("hdr_tokenize", Tokenize)
    load(spark, sf_dir, "documents").createOrReplaceTempView("hdr_udtf_docs")
    return spark.sql("""
        SELECT d.doc_id, u.pos, u.word
        FROM hdr_udtf_docs d, LATERAL hdr_tokenize(d.text) u
        WHERE d.doc_id < 50
    """)
