"""Text-analysis operators for LLM training-data pipelines (north-star
requirement; the reference's only string handling is split/concat —
/root/reference/rbmmapper.java:91, propmapper.java:268-276).

All pure JVM-side expressions: split / array ops / regexp / md5. No
Python in the data path, so at 100 TB each of these is a single narrow
scan stage (plus one shuffle where a groupBy exists).

Plan hygiene shared by every query here: tokenization (`split`) is
materialized once at a projection boundary and referenced as an
attribute. Inlining the split expression into each consumer re-executes
it per reference (codegen does not CSE across a projection's output
list), which measured ~5-10x slower on this compute-bound path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load, load_parallel

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]
_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
_RE_TOKEN = "[a-z]+|[0-9]+"


@query("text_token_stats", oracle=f"""
WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS w,
                  regexp_extract_all(text, '{_RE_TOKEN}') AS rt
           FROM documents)
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
       round(list_aggregate(list_transform(w, x -> CAST(length(x) AS DOUBLE)), 'sum')
             / len(w), 6) AS avg_token_len,
       CAST(len(rt) AS BIGINT) AS n_re_tokens,
       CAST(ceil(n_chars / 4.0) AS BIGINT) AS approx_bpe_tokens
FROM t
""")
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, mean token
    length, regex-token count, and the chars/4 BPE-token estimate."""
    t = (load_parallel(spark, sf_dir, "documents")
         .select("doc_id", "n_chars", "text", F.split("text", " ").alias("w")))
    tok_lens = F.transform("w", lambda x: F.length(x).cast("double"))
    return t.select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("w")).cast("bigint").alias("n_distinct"),
        F.round(F.aggregate(tok_lens, F.lit(0.0), lambda a, x: a + x)
                / F.size("w"), 6).alias("avg_token_len"),
        F.size(F.regexp_extract_all("text", F.lit(_RE_TOKEN), 0))
        .cast("bigint").alias("n_re_tokens"),
        F.ceil(F.col("n_chars") / 4.0).cast("bigint").alias("approx_bpe_tokens"))


@query("text_quality_score", oracle=f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
m AS (SELECT doc_id,
             len(w) AS n,
             len(list_distinct(w)) AS nd,
             len(list_filter(w, x -> x IN {_STOP_SQL})) AS ns
      FROM t)
SELECT doc_id,
       round(ns * 1.0 / n, 6) AS stop_ratio,
       round(nd * 1.0 / n, 6) AS uniq_ratio,
       round(0.4 * least(n / 100.0, 1.0) + 0.6 * (nd * 1.0 / n), 6) AS quality
FROM m
""")
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: stopword ratio (fluency proxy),
    type-token ratio (repetitiveness proxy), length-saturated composite."""
    m = (load_parallel(spark, sf_dir, "documents")
         .select("doc_id", F.split("text", " ").alias("w"))
         .select("doc_id",
                 F.size("w").cast("double").alias("n"),
                 F.size(F.array_distinct("w")).cast("double").alias("nd"),
                 F.size(F.filter("w", lambda x: x.isin(STOPWORDS)))
                 .cast("double").alias("ns")))
    n, nd, ns = F.col("n"), F.col("nd"), F.col("ns")
    return m.select(
        "doc_id",
        F.round(ns / n, 6).alias("stop_ratio"),
        F.round(nd / n, 6).alias("uniq_ratio"),
        F.round(0.4 * F.least(n / 100.0, F.lit(1.0)) + 0.6 * (nd / n), 6)
        .alias("quality"))


@query("text_langid", oracle=f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
SELECT doc_id, lang,
       CASE WHEN len(list_filter(w, x -> x IN {_STOP_SQL})) * 1.0 / len(w) >= 0.05
            THEN 'en' ELSE 'unk' END AS pred_lang
FROM t
""")
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID heuristic: English-stopword density threshold (the
    n-gram-profile approach reduced to its cheapest useful form; the
    corpus is synthetic word-soup, so the declared `lang` column is
    random — the point is the operator, scored against it downstream)."""
    t = (load_parallel(spark, sf_dir, "documents")
         .select("doc_id", "lang", F.split("text", " ").alias("w")))
    ratio = F.size(F.filter("w", lambda x: x.isin(STOPWORDS))) / F.size("w")
    return t.select(
        "doc_id", "lang",
        F.when(ratio >= 0.05, "en").otherwise("unk").alias("pred_lang"))


@query("text_fingerprint", oracle="""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' '))
         AS fingerprint
FROM documents
""")
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint (OpenRefine-style): lowercase ->
    tokenize -> distinct -> sort -> md5. Robust to word order and
    repetition; catches shuffled/duplicated-paragraph near-dups that
    exact hashing misses."""
    docs = load_parallel(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(
        " ", F.array_sort(F.array_distinct(F.split(F.lower(F.col("text")), " ")))))
    return docs.select("doc_id", fp.alias("fingerprint"))


@query("text_ngram_freq", oracle="""
WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tok AS (SELECT doc_id, generate_subscripts(w, 1) AS i, unnest(w) AS word FROM t0),
bg AS (SELECT a.word || ' ' || b.word AS bigram
       FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1)
SELECT bigram, count(*) AS n
FROM bg GROUP BY bigram HAVING count(*) >= 20
""")
def text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level bigram frequency (the TF side of TF-IDF; n-gram LM
    fuel). One explode + one groupBy — partial aggregation makes the
    shuffle carry distinct bigrams, not tokens."""
    docs = load_parallel(spark, sf_dir, "documents")
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size("w") - 2),
        lambda i: F.concat_ws(" ", F.col("w")[i], F.col("w")[i + 1]))
    return (docs.select(F.split("text", " ").alias("w"))
            .filter(F.size("w") >= 2)
            .select(F.explode(bigrams).alias("bigram"))
            .groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= 20))


@query("text_tfidf_top_terms", oracle="""
WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS word FROM t0),
tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word),
df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok GROUP BY word),
nd AS (SELECT count(DISTINCT doc_id) AS n FROM tok),
scored AS (
  SELECT tf.doc_id, tf.word,
         round(tf.tf * ln(nd.n * 1.0 / df.df), 6) AS tfidf
  FROM tf JOIN df ON tf.word = df.word CROSS JOIN nd
),
ranked AS (
  SELECT doc_id, word, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, word) AS rn
  FROM scored
)
SELECT doc_id, word, tfidf, rn
FROM ranked WHERE rn <= 3
""")
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF from first principles (relational form of Tokenizer ->
    HashingTF -> IDF, but exact-term instead of feature-hashed): term
    frequency x ln(N/df), top-3 terms per doc with deterministic ties."""
    docs = load_parallel(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tf = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    # tf rows are already distinct (doc_id, word) pairs, so document
    # frequency derives from tf (one explode + one exchange, reused) —
    # the countDistinct-over-tokens alternative re-explodes and
    # re-shuffles the whole corpus. And since split() yields >= 1 token
    # for every string (even ''), "documents with tokens" == all
    # documents: the N in idf is a metadata-only parquet count, no job.
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = load(spark, sf_dir, "documents").count()
    from pyspark.sql import Window as W
    # rank on the ROUNDED score: rounding first makes the sort key
    # identical across engines (raw doubles can differ in the last ulp
    # when two terms are mathematically tied, flipping ranks)
    # df is VOCABULARY-sized (one row per distinct term): the hint PINS
    # the broadcast join Catalyst already picks from size stats at test
    # SF, so the tf side is never re-shuffled onto word even when the
    # df-side estimate degrades (post-agg stats are estimates, not
    # guarantees). Above the broadcast ceiling (~100M-term web
    # vocabularies x 16 B > autoBroadcastJoinThreshold) remove the hint
    # and the plan reverts to the word-keyed shuffle join — the same
    # vocab-size switch documented for the NB model in SCALE.md.
    scored = (tf.join(F.broadcast(df), "word")
              .select("doc_id", "word",
                      F.round(F.col("tf")
                              * F.log(F.lit(float(n_docs)) / F.col("df")), 6)
                      .alias("tfidf")))
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rn") <= 3)
            .select("doc_id", "word", "tfidf", "rn"))


# Rabin-Karp polynomial window hash: wh(s) = sum_j tv[s+j] * B^j mod P.
# tv = det_hash64(token) mod 2^16 keeps every product under 2^63 when the
# power is pre-reduced mod P — exact int64 arithmetic in both engines.
_RK_B, _RK_P, _RK_K = 131, 1_000_000_007, 8
_RK_POWERS = [pow(_RK_B, j, _RK_P) for j in range(_RK_K)]


@query("text_rolling_hash_fingerprint", oracle=f"""
WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tv AS (SELECT doc_id, generate_subscripts(w, 1) - 1 AS i,
              ('0x' || substr(md5(unnest(w)), 1, 8))::BIGINT % 65536 AS tv
       FROM t0),
sz AS (SELECT doc_id, count(*) AS n FROM tv GROUP BY doc_id),
p(j, pw) AS (VALUES {", ".join(f"({j}, {pw})" for j, pw in enumerate(_RK_POWERS))}),
win AS (
  SELECT a.doc_id, a.i AS s,
         sum(b.tv * p.pw) % {_RK_P} AS wh
  FROM tv a
  JOIN tv b ON b.doc_id = a.doc_id AND b.i >= a.i AND b.i < a.i + {_RK_K}
  JOIN p ON p.j = b.i - a.i
  JOIN sz ON sz.doc_id = a.doc_id
  WHERE a.i + {_RK_K} <= sz.n
  GROUP BY a.doc_id, a.i
)
SELECT doc_id,
       count(*) AS n_windows,
       min(wh)::BIGINT AS fingerprint
FROM win GROUP BY doc_id
""")
def text_rolling_hash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (Rabin-Karp windows + winnowing
    min-selection): hash every {_RK_K}-token window polynomially, keep the
    minimum as the document fingerprint — near-identical documents share
    window hashes, so their min collides with high probability (the
    content-defined-chunking / MOSS winnowing primitive).

    Spark side is one narrow pass: token hash array (one md5 per token),
    then each window folds as an 8-term integer expression with
    pre-reduced powers — exact mod-P arithmetic, bit-identical to the
    oracle's positional-join formulation. Docs shorter than {_RK_K} tokens
    have no full window and drop out (both sides)."""
    from ..functions.vector import det_hash64

    docs = load_parallel(spark, sf_dir, "documents")
    base = (docs
            .select("doc_id", F.split("text", " ").alias("w"))
            .filter(F.size("w") >= _RK_K)
            .select("doc_id",
                    F.transform("w", lambda t: det_hash64(t) % 65536)
                    .alias("tv")))

    def window_hash(s):
        total = None
        for j, pw in enumerate(_RK_POWERS):
            term = F.element_at(F.col("tv"), s + j + 1) * F.lit(pw)
            total = term if total is None else total + term
        return total % F.lit(_RK_P)

    wins = F.transform(F.sequence(F.lit(0), F.size("tv") - _RK_K),
                       lambda s: window_hash(s))
    return (base
            .select("doc_id", wins.alias("whs"))
            .select("doc_id",
                    F.size("whs").cast("bigint").alias("n_windows"),
                    F.array_min("whs").alias("fingerprint")))


@query("text_clean_normalize", oracle="""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                           ' +', ' ', 'g')) AS clean,
       CAST(length(trim(regexp_replace(
            regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
            ' +', ' ', 'g'))) AS BIGINT) AS clean_len
FROM documents
""")
def text_clean_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text cleaning (the first stage of every LLM data pipeline):
    lowercase -> strip non-alphanumerics -> collapse whitespace -> trim.
    Pure JVM regexp expressions; the cleaned text is materialized once at
    a projection boundary and its length derived from the attribute."""
    docs = load_parallel(spark, sf_dir, "documents")
    clean = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
        " +", " "))
    return (docs.select("doc_id", clean.alias("clean"))
            .select("doc_id", "clean",
                    F.length("clean").cast("bigint").alias("clean_len")))


@query("text_quality_filter", oracle="""
WITH q AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
m AS (
  SELECT doc_id,
         round(0.4 * least(len(w) / 100.0, 1.0)
               + 0.6 * (len(list_distinct(w)) * 1.0 / len(w)), 6) AS quality
  FROM q
),
c AS (SELECT m.*, percent_rank() OVER (ORDER BY quality, doc_id) AS pr FROM m)
SELECT doc_id, quality FROM c WHERE pr >= 0.1
""")
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-based corpus filtering: score every document, drop the
    bottom decile by percent_rank (deterministic doc_id tiebreak). The
    composition every training-data pipeline runs — score -> rank ->
    threshold — as one global-window pass. At 100 TB the global rank
    would be replaced by an approx-quantile cut (sketch_quantiles), which
    needs no global sort; this exact form is the oracle-checkable
    variant."""
    from pyspark.sql import Window as W

    docs = load_parallel(spark, sf_dir, "documents")
    m = (docs.select("doc_id", F.split("text", " ").alias("w"))
         .select("doc_id",
                 F.size("w").cast("double").alias("n"),
                 F.size(F.array_distinct("w")).cast("double").alias("nd")))
    quality = F.round(
        0.4 * F.least(F.col("n") / 100.0, F.lit(1.0))
        + 0.6 * (F.col("nd") / F.col("n")), 6)
    scored = m.select("doc_id", quality.alias("quality"))
    w = W.orderBy("quality", "doc_id")
    return (scored.withColumn("pr", F.percent_rank().over(w))
            .filter(F.col("pr") >= 0.1)
            .select("doc_id", "quality"))


@query("text_quality_filter_approx", oracle="""
WITH q AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
m AS (
  SELECT doc_id,
         round(0.4 * least(len(w) / 100.0, 1.0)
               + 0.6 * (len(list_distinct(w)) * 1.0 / len(w)), 6) AS quality
  FROM q
),
t AS (SELECT quantile_disc(quality, 0.1) AS thr FROM m)
SELECT m.doc_id, m.quality FROM m CROSS JOIN t WHERE m.quality >= t.thr
""")
def text_quality_filter_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe quantile corpus filter: the 100 TB replacement for
    text_quality_filter's global-window percent_rank (a single-partition
    sort). Two-phase instead: (1) `percentile_approx(quality, 0.1)` — a
    bounded-memory Greenwald-Khanna sketch aggregated map-side, one
    scalar out; (2) broadcast that scalar back and keep docs with
    quality >= threshold as a NARROW filter. No global sort, no window,
    no skew: the only shuffle is the one-row sketch merge.

    Exactness contract: percentile_approx returns an actual data value
    (the discrete percentile) and is exact whenever distinct values fit
    the sketch accuracy (1e6 here), which is what makes the DuckDB
    `quantile_disc` oracle an exact match rather than approximate-ish.
    Semantics differ from the exact twin only in tie handling at the
    cut: threshold-inclusive (>= thr) vs rank-exclusive (pr >= 0.1)."""
    docs = load_parallel(spark, sf_dir, "documents")
    m = (docs.select("doc_id", F.split("text", " ").alias("w"))
         .select("doc_id",
                 F.size("w").cast("double").alias("n"),
                 F.size(F.array_distinct("w")).cast("double").alias("nd")))
    quality = F.round(
        0.4 * F.least(F.col("n") / 100.0, F.lit(1.0))
        + 0.6 * (F.col("nd") / F.col("n")), 6)
    scored = m.select("doc_id", quality.alias("quality"))
    # threshold as a SCALAR SUBQUERY: the sketch aggregate executes inside
    # the same action as the filter (no .first() driver round-trip, no
    # scheduling barrier between two client-issued jobs); the plan stays
    # Window/Join-free (plan-asserted) — the subquery shows up as a
    # Subquery node, not an exchange on data keys
    import uuid as _uuid

    v = f"hdr_quality_scored_{_uuid.uuid4().hex[:8]}"
    scored.createOrReplaceTempView(v)
    out = spark.sql(f"""
        SELECT doc_id, quality FROM {v}
        WHERE quality >= (SELECT percentile_approx(quality, 0.1, 1000000)
                          FROM {v})""")
    spark.catalog.dropTempView(v)  # plan already analyzed; view no longer needed
    return out


@query("agg_collect_sorted", oracle="""
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY user_id
""")
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set aggregation (grouped array building) — sorted, then
    JOINED TO ONE STRING for engine-neutral comparison: the driver's
    value hasher canonicalizes via pandas sort_values, which cannot hash
    array cells (r04 red row; same class as r01's arr_normalize — see
    arrays.py). The array-valued form stays available as
    `agg_collect_sorted_array` (pytest-only twin). The collect-type aggs
    are exactly the ones whose state skews with hot keys (see
    agg_skew_salted_twophase)."""
    ev = load(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .agg(F.array_join(F.array_sort(F.collect_set("event_type")),
                              ",").alias("types"),
                 F.count(F.lit(1)).alias("n")))


def agg_collect_sorted_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-valued twin of agg_collect_sorted — NOT registered (list cells
    are unhashable by the driver's canonicalizer); exercised by pytest
    which compares element-wise."""
    ev = load(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .agg(F.array_sort(F.collect_set("event_type")).alias("types"),
                 F.count(F.lit(1)).alias("n")))


# RAG-style chunking geometry: WIDTH-word windows advancing by STRIDE
# (WIDTH - STRIDE words of overlap between consecutive chunks).
CHUNK_WIDTH, CHUNK_STRIDE = 32, 24


@query("text_chunk_sliding", oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words
  FROM documents
)
SELECT doc_id, r.i AS chunk_id,
       CAST(least({CHUNK_WIDTH},
                  len(words) - r.i * {CHUNK_STRIDE}) AS BIGINT) AS n_words,
       array_to_string(
         words[r.i * {CHUNK_STRIDE} + 1 :
               r.i * {CHUNK_STRIDE} + {CHUNK_WIDTH}], ' ') AS chunk
FROM w CROSS JOIN range(64) r(i)
WHERE r.i * {CHUNK_STRIDE} < len(words)
""")
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the standard RAG/embedding
    pre-processing step: WIDTH-word chunks advancing by STRIDE words
    (overlap keeps sentences that straddle a boundary retrievable).

    Pure JVM expressions: split once, then transform over a sequence of
    chunk starts with slice + array_join — a NARROW per-document map, no
    shuffle, no UDF. Chunk ids are per-document ordinals so downstream
    embedding jobs can key (doc_id, chunk_id) without a window function.
    At 100 TB: chunking multiplies rows by ~len/STRIDE but each output
    row carries only its own text; the explode is pipelined inside the
    same stage as the scan."""
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    starts = F.sequence(
        F.lit(0),
        F.floor((n - F.lit(1)) / F.lit(CHUNK_STRIDE)).cast("int"))
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            i.cast("bigint").alias("chunk_id"),
            F.least(F.lit(CHUNK_WIDTH),
                    n - i * F.lit(CHUNK_STRIDE)).cast("bigint")
            .alias("n_words"),
            F.array_join(
                F.slice(words, i * F.lit(CHUNK_STRIDE) + F.lit(1),
                        F.lit(CHUNK_WIDTH)), " ").alias("chunk")))
    return (docs.select("doc_id", F.explode(chunks).alias("c"))
            .select("doc_id", "c.chunk_id", "c.n_words", "c.chunk"))


@query("text_bigram_surprisal", oracle="""
WITH raw AS (
  SELECT doc_id,
         unnest(string_split(lower(text), ' ')) AS word,
         generate_subscripts(string_split(lower(text), ' '), 1) AS ord
  FROM documents
),
w AS (
  SELECT doc_id, word, ord,
         lead(word) OVER (PARTITION BY doc_id ORDER BY ord) AS nxt
  FROM raw WHERE word <> ''
),
uni AS (SELECT word, count(*) AS cu FROM w GROUP BY word),
bi AS (SELECT word, nxt, count(*) AS cb FROM w
       WHERE nxt IS NOT NULL AND nxt <> '' GROUP BY word, nxt),
scored AS (
  SELECT w.doc_id, -ln(bi.cb / uni.cu) AS s
  FROM w
  JOIN uni ON uni.word = w.word
  JOIN bi ON bi.word = w.word AND bi.nxt = w.nxt
  WHERE w.nxt IS NOT NULL AND w.nxt <> ''
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(s), 6) AS surprisal
FROM scored GROUP BY doc_id
""")
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-LM quality scoring WITHOUT a model: per-document mean
    bigram surprisal -log P(w2|w1) under the corpus's own bigram/unigram
    counts — the classic perplexity proxy that flags boilerplate (low
    surprisal) and garbled text (high) before any neural scorer runs.

    Two corpus-level keyed aggregates (unigram and bigram counts — term-
    vocabulary-sized, not token-sized, thanks to partial aggregation),
    then the per-doc pass joins each bigram occurrence to both tables on
    term keys and averages. Bigrams are built NARROWLY per document
    (arrays_zip of the word array against its own tail) — no window over
    the token stream, no cross-document shuffle until the count
    aggregates. Consecutive empty tokens are dropped like the oracle's
    WHERE."""
    docs = load_parallel(spark, sf_dir, "documents")
    words = F.filter(F.split(F.lower(F.col("text")), " "),
                     lambda x: x != "")
    pairs = (docs.select("doc_id", words.alias("ws"))
             .select("doc_id",
                     F.explode(F.arrays_zip(
                         F.col("ws"),
                         F.concat(F.slice(F.col("ws"), 2,
                                          F.greatest(F.size("ws") - 1,
                                                     F.lit(0))),
                                  F.array(F.lit(None).cast("string")))))
                     .alias("p"))
             .select("doc_id", F.col("p.ws").alias("w1"),
                     F.col("p.1").alias("w2")))
    occ = pairs.persist()
    uni = occ.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    bi = (occ.filter(F.col("w2").isNotNull())
          .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb")))
    # Pre-aggregate occurrences to (doc_id, w1, w2, k) BEFORE the scoring
    # joins: repeated bigrams within a document collapse to one row, so
    # the join input shrinks by the repeat factor and the per-doc average
    # becomes a k-weighted mean (identical value, smaller shuffle).
    docbi = (occ.filter(F.col("w2").isNotNull())
             .groupBy("doc_id", "w1", "w2")
             .agg(F.count(F.lit(1)).alias("k")))
    scored = (docbi.join(uni, "w1").join(bi, ["w1", "w2"])
              .select("doc_id", "k",
                      (-F.log(F.col("cb") / F.col("cu"))).alias("s")))
    out = (scored.groupBy("doc_id")
           .agg(F.sum("k").alias("n_bigrams"),
                F.round(F.sum(F.col("k") * F.col("s")) / F.sum("k"), 6)
                .alias("surprisal")))
    return out


# PII redaction patterns. All three are RE2-safe (no backrefs/lookaround)
# so Spark's Java regex and DuckDB's RE2 agree match-for-match. The
# EMAIL/PHONE shapes are structurally real; the NAME denylist stands in
# for the dictionary/NER pass of a production scrubber (the synthetic
# corpus has no digits, so the denylist is the pattern that actually
# fires here and pins replacement semantics end-to-end).
_PII_EMAIL = r"(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PII_PHONE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
_PII_NAME = r"\bcustomer\b"


@query("text_pii_redact", oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT)
         AS n_email,
       CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT)
         AS n_phone,
       CAST(len(regexp_extract_all(text, '{_PII_NAME}')) AS BIGINT)
         AS n_name,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{_PII_EMAIL}', '[EMAIL]', 'g'),
           '{_PII_PHONE}', '[PHONE]', 'g'),
           '{_PII_NAME}', '[NAME]', 'g') AS redacted
FROM documents
""")
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: count and mask emails,
    phone-shaped digit runs, and denylisted name tokens.

    Per-match counts run against the ORIGINAL text — deliberately
    found-in-original audit semantics: on overlapping spans (a
    phone-shaped digit run inside text the email replacement already
    consumed) a count can exceed the masks actually applied, which is
    the right bias for an audit log (report everything detected, never
    under-report). The three replacements then apply in a fixed order
    (email -> phone -> name) so later patterns cannot match inside an
    earlier mask. The email pattern is (?i) case-insensitive — the
    inline flag means Java regex and DuckDB's RE2 agree (round-4
    advisor fix: Bob@Example.ORG was previously neither counted nor
    redacted). Entirely JVM regexp — a single narrow scan stage with
    zero shuffles; at 100 TB this is embarrassingly parallel and the
    only cost is the regex engine itself (RE2-compatible patterns keep
    it linear-time, no catastrophic backtracking)."""
    docs = load_parallel(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(_PII_EMAIL)).cast("bigint")
        .alias("n_email"),
        F.regexp_count("text", F.lit(_PII_PHONE)).cast("bigint")
        .alias("n_phone"),
        F.regexp_count("text", F.lit(_PII_NAME)).cast("bigint")
        .alias("n_name"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("text", F.lit(_PII_EMAIL), F.lit("[EMAIL]")),
                F.lit(_PII_PHONE), F.lit("[PHONE]")),
            F.lit(_PII_NAME), F.lit("[NAME]")).alias("redacted"))


@query("text_word_entropy", oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
  FROM documents
),
cnt AS (
  SELECT doc_id, word, count(*) AS c FROM tok
  WHERE word <> '' GROUP BY doc_id, word
),
tot AS (
  SELECT doc_id, word, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM cnt
)
SELECT doc_id,
       CAST(max(n) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round(-sum((c / n) * log2(c / n)), 6) AS entropy,
       round(CASE WHEN count(*) > 1
                  THEN -sum((c / n) * log2(c / n)) / log2(count(*))
                  ELSE 0.0 END, 6) AS norm_entropy
FROM tot GROUP BY doc_id
""")
def text_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram Shannon entropy per document — the information-density
    quality signal: near-zero entropy flags keyword-stuffed or
    single-phrase-repeated spam; entropy near the log2(vocab) ceiling is
    natural prose. norm_entropy divides by that ceiling so the filter
    threshold is length-independent.

    Explode -> two keyed aggregations: (doc_id, word) counts partial-
    aggregate map-side (token stream never crosses the wire raw), the
    per-doc total rides a doc_id-partitioned window on the already
    vocabulary-sized counts, and the final doc_id rollup reuses the same
    hash partitioning. No global ordering anywhere, so the plan scales
    with documents x per-doc vocab, not corpus tokens."""
    from pyspark.sql import Window as W

    docs = load_parallel(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"))
    cnt = (tok.filter(F.col("word") != "")
           .groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c")))
    n = F.sum("c").over(W.partitionBy("doc_id"))
    tot = cnt.select("doc_id", "c", n.alias("n"))
    p = F.col("c") / F.col("n")
    ent = -F.sum(p * F.log2(p))
    return (tot.groupBy("doc_id")
            .agg(F.max("n").cast("bigint").alias("n_tokens"),
                 F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
                 F.round(ent, 6).alias("entropy"),
                 F.round(F.when(F.count(F.lit(1)) > 1,
                                ent / F.log2(F.count(F.lit(1))))
                         .otherwise(F.lit(0.0)), 6).alias("norm_entropy")))


@query("text_bpe_pair_counts", oracle="""
WITH words AS (
  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
),
pairs AS (
  SELECT unnest(list_transform(range(1, length(word)),
                               i -> substr(word, CAST(i AS INTEGER), 2)))
    AS pair
  FROM words WHERE length(word) >= 2
),
counted AS (
  SELECT pair, count(*) AS n FROM pairs GROUP BY pair
),
ranked AS (
  SELECT pair, CAST(n AS BIGINT) AS n,
         row_number() OVER (ORDER BY n DESC, pair) AS rnk
  FROM counted
)
SELECT pair, n, CAST(rnk AS BIGINT) AS rnk FROM ranked WHERE rnk <= 20
""")
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first iteration of BPE tokenizer training: corpus-wide
    adjacent character-pair frequencies within words, top-20 merge
    candidates ranked (count desc, pair asc — fully deterministic).
    Iterating this count -> merge -> recount loop IS byte-pair encoding;
    one round declared relationally shows the engine can host the
    distributed half of tokenizer training (the merge-table update is
    driver-side model state, like the k-means centroids).

    Pair generation is narrow per word (substring over an index
    sequence — no self-join of the character stream); the single
    corpus-wide shuffle carries (pair, partial count) — alphabet²-sized
    after map-side combine, independent of corpus size. The top-20 is a
    TakeOrdered-style rank over that tiny aggregate, fine as a
    single-partition window at pair-vocabulary cardinality."""
    docs = load_parallel(spark, sf_dir, "documents")
    words = (docs.select(F.explode(F.split(F.lower(F.col("text")), " "))
                         .alias("word"))
             .filter(F.length("word") >= 2))
    pairs = words.select(
        F.explode(F.expr(
            "transform(sequence(1, length(word) - 1),"
            " i -> substring(word, i, 2))")).alias("pair"))
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window as W
    rnk = F.row_number().over(W.orderBy(F.col("n").desc(), F.col("pair")))
    return (counted.withColumn("rnk", rnk.cast("bigint"))
            .filter(F.col("rnk") <= 20))


# ---------------------------------------------------------------------------
# PMI collocation mining (corpus phrase discovery).

_PMI_MIN_COUNT = 5   # bigram support floor
_PMI_TOP = 30        # collocations reported


@query("text_pmi_collocations", oracle=f"""
WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
             AS w FROM documents),
tok AS (SELECT doc_id, generate_subscripts(w, 1) AS i, unnest(w) AS word
        FROM t),
uni AS (SELECT word, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY word),
ntot AS (SELECT sum(c) AS n FROM uni),
bi AS (SELECT a.word AS w1, b.word AS w2, CAST(count(*) AS DOUBLE) AS cb
       FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
       GROUP BY a.word, b.word),
mtot AS (SELECT sum(cb) AS m FROM bi),
sc AS (
  SELECT bi.w1, bi.w2, bi.cb,
         round(ln((bi.cb / mtot.m) / ((u1.c / ntot.n) * (u2.c / ntot.n))), 6)
           AS pmi
  FROM bi
  JOIN uni u1 ON u1.word = bi.w1
  JOIN uni u2 ON u2.word = bi.w2
  CROSS JOIN ntot CROSS JOIN mtot
  WHERE bi.cb >= {_PMI_MIN_COUNT}
),
ranked AS (SELECT w1, w2, CAST(cb AS BIGINT) AS n_pair, pmi,
                  row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rnk
           FROM sc)
SELECT w1, w2, n_pair, pmi, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {_PMI_TOP}
""")
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining via pointwise mutual information: the top
    adjacent word pairs whose co-occurrence beats the independence
    assumption — PMI = ln(P(w1,w2) / (P(w1)P(w2))) — the classic
    phrase-discovery pass (new-terminology detection, tokenizer merge
    candidates) a corpus team runs before committing a vocabulary.

    Bigrams are built NARROWLY per document (arrays_zip of the word
    array against its own tail — the text_bigram_surprisal recipe), so
    the only shuffles are the two vocabulary-sized count aggregates
    (map-side combined). The two corpus totals are exact integer sums
    folded in as literals on the Spark side (the oracle carries them as
    1-row CTEs); every input to the PMI log is an integer ratio, so the
    6-digit rounding is engine-stable. Ranking cuts on the rounded PMI
    with (w1, w2) tiebreaks. At 100 TB: two token-stream aggregates +
    vocabulary-sized joins — the same shape as TF-IDF.

    The two totals need NO extra aggregate pass structure: every token
    contributes exactly one (w1, w2) row (the last token of a doc pairs
    with NULL), so N = |occ| and M = |occ where w2 IS NOT NULL| — one
    count aggregate over the narrow pair stream, folded as literals."""
    from pyspark.sql import Window as W

    docs = load_parallel(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda x: x != "")
    occ = (docs.select("doc_id", words.alias("ws"))
           .select("doc_id",
                   F.explode(F.arrays_zip(
                       F.col("ws"),
                       F.concat(F.slice(F.col("ws"), 2,
                                        F.greatest(F.size("ws") - 1,
                                                   F.lit(0))),
                                F.array(F.lit(None).cast("string")))))
                   .alias("pr"))
           .select(F.col("pr.ws").alias("w1"), F.col("pr.1").alias("w2")))
    n_total, m_total = occ.agg(
        F.count(F.lit(1)).cast("double"),
        F.count("w2").cast("double")).first()
    uni = occ.groupBy("w1").agg(F.count(F.lit(1)).cast("double").alias("c"))
    bi = (occ.filter(F.col("w2").isNotNull())
          .groupBy("w1", "w2")
          .agg(F.count(F.lit(1)).cast("double").alias("cb")))
    sc = (bi.filter(F.col("cb") >= _PMI_MIN_COUNT)
          .join(F.broadcast(uni.select(F.col("w1"),
                                       F.col("c").alias("c1"))), "w1")
          .join(F.broadcast(uni.select(F.col("w1").alias("w2"),
                                       F.col("c").alias("c2"))), "w2")
          .select("w1", "w2", F.col("cb").cast("bigint").alias("n_pair"),
                  F.round(F.log((F.col("cb") / m_total)
                                / ((F.col("c1") / n_total)
                                   * (F.col("c2") / n_total))), 6)
                  .alias("pmi")))
    rnk = F.row_number().over(W.orderBy(F.desc("pmi"), "w1", "w2"))
    return (sc.withColumn("rnk", rnk.cast("bigint"))
            .filter(F.col("rnk") <= _PMI_TOP)
            .select("w1", "w2", "n_pair", "pmi", "rnk"))


# ---------------------------------------------------------------------------
# Vocabulary coverage curve (tokenizer capacity planning).

_VOCAB_GRID = (1, 2, 4, 8, 16, 32, 64, 128, 256)


@query("text_vocab_coverage_curve", oracle=f"""
WITH tok AS (SELECT unnest(list_filter(string_split(text, ' '),
                                       x -> x <> '')) AS w
             FROM documents),
uni AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rk FROM uni
),
agg AS (
  SELECT sum(c) AS n,
         {", ".join(f"sum(CASE WHEN rk <= {k} THEN c ELSE 0 END) AS c{k}"
                    for k in _VOCAB_GRID)}
  FROM ranked
)
SELECT CAST(k AS BIGINT) AS vocab_k,
       CAST(covered AS BIGINT) AS covered_tokens,
       round(covered * 1.0 / n, 6) AS coverage
FROM agg, (VALUES {", ".join(f"({k})" for k in _VOCAB_GRID)}) g(k),
LATERAL (SELECT CASE k {" ".join(f"WHEN {k} THEN c{k}" for k in _VOCAB_GRID)}
                END AS covered) x
""")
def text_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of all corpus tokens the
    top-k most frequent words cover, for a log-spaced k grid — the
    capacity-planning table behind tokenizer vocabulary sizing and
    stopword-list cutoffs (the elbow of this curve IS the vocab-size
    decision).

    One vocabulary-sized count aggregate (map-side combined), one
    window over the VOCAB table (term-dimension-sized, not
    token-sized) to rank terms, then the whole grid folds into a
    single conditional-aggregation row — no join against the grid, no
    per-k passes — and unpivots via stack(). All integer counts until
    the final division. At 100 TB: the token aggregate is the only
    data-sized stage (TF-IDF's shape); the ranking window runs over
    |vocab| rows and would range-partition if the vocabulary itself
    were huge."""
    from pyspark.sql import Window as W

    docs = load_parallel(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.filter(F.split("text", " "),
                                         lambda x: x != "")).alias("w"))
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    ranked = uni.select(
        "c", F.row_number().over(W.orderBy(F.desc("c"), "w")).alias("rk"))
    aggs = [F.sum("c").alias("n")] + [
        F.sum(F.when(F.col("rk") <= k, F.col("c")).otherwise(0)).alias(f"c{k}")
        for k in _VOCAB_GRID]
    one = ranked.agg(*aggs)
    stack = ", ".join(f"{k}L, c{k}" for k in _VOCAB_GRID)
    return (one.select(
        F.expr(f"stack({len(_VOCAB_GRID)}, {stack}) AS (vocab_k, covered)"),
        "n")
        .select(F.col("vocab_k").cast("bigint"),
                F.col("covered").cast("bigint").alias("covered_tokens"),
                F.round(F.col("covered") * 1.0 / F.col("n"), 6)
                .alias("coverage")))


@query("text_ngram_novelty", oracle="""
WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tok AS (SELECT doc_id, generate_subscripts(w, 1) AS i, unnest(w) AS word
        FROM t0),
sh AS (SELECT DISTINCT a.doc_id,
              a.word || ' ' || b.word || ' ' || c.word AS s
       FROM tok a
       JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
       JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
first_seen AS (SELECT s, min(doc_id) AS fs FROM sh GROUP BY s)
SELECT sh.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN f.fs = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       round(sum(CASE WHEN f.fs = sh.doc_id THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS novelty
FROM sh JOIN first_seen f ON f.s = sh.s
GROUP BY sh.doc_id
""")
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a document's
    distinct 3-shingles that no lower-id document contains — the
    marginal-information score behind data-ordering/curriculum
    decisions and diminishing-returns curves (when new shards stop
    bringing novel n-grams, stop crawling). A doc full of
    already-seen shingles is boilerplate even if no single pair
    crosses a dedup threshold.

    First-occurrence attribution is a grouped MIN on the shingle key
    (the dedup_segments_corpus survivorship rule — never a window over
    hot shingles), then one join back and a per-doc aggregate: two
    shingle-keyed shuffles with map-side combine, the dedup_exact cost
    family. Reuses the shingles helper shared with the MinHash stack."""
    from ..operators.dedup import shingles

    sh = shingles(spark, sf_dir)
    first = sh.groupBy("s").agg(F.min("doc_id").alias("fs"))
    j = sh.join(first, "s")
    novel = F.sum(F.when(F.col("fs") == F.col("doc_id"), 1).otherwise(0))
    return (j.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 novel.cast("bigint").alias("n_novel"),
                 F.round(novel * 1.0 / F.count(F.lit(1)), 6)
                 .alias("novelty")))


_CRAWL_GRID = (50, 100, 150, 200, 300, 400, 500)


@query("corpus_crawl_novelty_curve", oracle=f"""
WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tok AS (SELECT doc_id, generate_subscripts(w, 1) AS i, unnest(w) AS word
        FROM t0),
sh AS (SELECT DISTINCT a.doc_id,
              a.word || ' ' || b.word || ' ' || c.word AS s
       FROM tok a
       JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
       JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
first_seen AS (SELECT s, min(doc_id) AS fs FROM sh GROUP BY s),
agg AS (
  SELECT count(*) AS total,
         {", ".join(f"sum(CASE WHEN fs < {k} THEN 1 ELSE 0 END) AS a{k}"
                    for k in _CRAWL_GRID)}
  FROM first_seen
)
SELECT CAST(k AS BIGINT) AS n_docs,
       CAST(seen AS BIGINT) AS distinct_shingles,
       round(seen * 1.0 / total, 6) AS frac_of_total
FROM agg, (VALUES {", ".join(f"({k})" for k in _CRAWL_GRID)}) g(k),
LATERAL (SELECT CASE k {" ".join(f"WHEN {k} THEN a{k}" for k in _CRAWL_GRID)}
                END AS seen) x
""")
def corpus_crawl_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-saturation curve: how many DISTINCT 3-shingles the corpus
    has accumulated after its first k documents (doc_id order standing
    in for ingest order), for a doc-count grid — the
    diminishing-returns table that answers "is more crawling still
    buying new content?" (the aggregate view of text_ngram_novelty's
    per-doc score; both share the first-occurrence grouped min).

    One shingle-keyed grouped min (map-side combined), then the whole
    grid folds into a single conditional-aggregation row over the
    FIRST-SEEN table (shingle-dimension-sized) and unpivots via
    stack — no per-k passes, no grid join."""
    from ..operators.dedup import shingles

    sh = shingles(spark, sf_dir)
    first = sh.groupBy("s").agg(F.min("doc_id").alias("fs"))
    aggs = [F.count(F.lit(1)).alias("total")] + [
        F.sum(F.when(F.col("fs") < k, 1).otherwise(0)).alias(f"a{k}")
        for k in _CRAWL_GRID]
    one = first.agg(*aggs)
    stack = ", ".join(f"{k}L, a{k}" for k in _CRAWL_GRID)
    return (one.select(
        F.expr(f"stack({len(_CRAWL_GRID)}, {stack}) AS (n_docs, seen)"),
        "total")
        .select(F.col("n_docs").cast("bigint"),
                F.col("seen").cast("bigint").alias("distinct_shingles"),
                F.round(F.col("seen") * 1.0 / F.col("total"), 6)
                .alias("frac_of_total")))


# BPE-ish chunking for the fertility report: letter runs capped at 4,
# digit runs capped at 3, any other non-space byte alone.
_FERT_PAT = r"[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9 ]"


@query("corpus_tokenizer_fertility", oracle=f"""
WITH t AS (
  SELECT lang,
         len(string_split(text, ' ')) AS n_words,
         len(regexp_extract_all(text, '{_FERT_PAT}')) AS n_subtokens
  FROM documents)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS n_words,
       CAST(sum(n_subtokens) AS BIGINT) AS n_subtokens,
       round(sum(n_subtokens) * 1.0 / sum(n_words), 6) AS fertility
FROM t GROUP BY lang
""")
def corpus_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER FERTILITY report (subtokens emitted per whitespace word,
    by language) — the metric multilingual-tokenizer evaluations use to
    show which languages pay a token tax under a given vocabulary. The
    stand-in tokenizer is a deterministic BPE-shaped regex chunker
    (letter runs cap at 4 chars, digit runs at 3, other bytes alone);
    greedy leftmost-longest scanning gives both engines identical
    chunkings. Purely narrow per-doc counting folded into the scan +
    one tiny keyed rollup — the per-language fertility table at 100 TB
    is langs x 4 numbers from one combiner'd aggregate."""
    docs = load_parallel(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        F.size(F.split("text", " ")).alias("n_words"),
        F.size(F.regexp_extract_all("text", F.lit(_FERT_PAT), 0))
         .alias("n_subtokens"))
    return (t.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("n_words").cast("bigint").alias("n_words"),
                 F.sum("n_subtokens").cast("bigint").alias("n_subtokens"),
                 F.round(F.sum("n_subtokens") * 1.0 / F.sum("n_words"), 6)
                  .alias("fertility")))


# Winnowing parameters: K-token grams, windows of W consecutive gram
# hashes; 2^20 packs (hash, position) into one orderable int64 key
# (hash < 2^32, position < 2^20 -> key < 2^52, exact in both engines).
_WIN_K, _WIN_W, _WIN_POS_MOD = 4, 5, 1048576


def _winnow_selected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing selection stage shared by the density audit and the
    pair detector: per doc, the window-minimum (hash, position) picks as
    `(doc_id, ng, fp_pos, fp_hash)` — one row per WINDOW (a fingerprint
    selected by several windows repeats; consumers dedupe as needed).
    DuckDB twin: _WINNOW_SEL_SQL."""
    from pyspark.sql import Window as W

    from ..functions.vector import det_hash64

    docs = load_parallel(spark, sf_dir, "documents")
    t = (docs.select("doc_id", F.split("text", " ").alias("toks"))
         .filter(F.size("toks") >= _WIN_K))
    grams = t.select(
        "doc_id",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.size("toks") - _WIN_K),
            lambda i: F.concat_ws(" ", F.slice("toks", i + 1, _WIN_K))))
        .alias("p", "gram"))
    g = grams.select(
        "doc_id", "p",
        (det_hash64(F.col("gram")) * _WIN_POS_MOD + F.col("p"))
        .alias("key"))
    wspec = (W.partitionBy("doc_id").orderBy("p")
             .rowsBetween(0, _WIN_W - 1))
    wmin = (g.withColumn("mk", F.min("key").over(wspec))
            .withColumn("ng", F.count(F.lit(1))
                        .over(W.partitionBy("doc_id"))))
    return (wmin.filter(F.col("p") + _WIN_W <= F.col("ng"))
            .select("doc_id", "ng",
                    (F.col("mk") % _WIN_POS_MOD).alias("fp_pos"),
                    ((F.col("mk") - F.col("mk") % _WIN_POS_MOD)
                     / _WIN_POS_MOD).cast("bigint").alias("fp_hash")))


# Winnowing selection CTE, shared by the density audit and the pair
# detector (DuckDB twin of the selection stage inside both Spark
# queries).
_WINNOW_SEL_SQL = f"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id, r.i AS p,
         ('0x' || substr(md5(array_to_string(
             toks[r.i + 1 : r.i + {_WIN_K}], ' ')), 1, 8))::BIGINT
           * {_WIN_POS_MOD} + r.i AS key
  FROM t, unnest(generate_series(0, len(toks) - {_WIN_K})) AS r(i)
),
wmin AS (
  SELECT doc_id, p,
         min(key) OVER (PARTITION BY doc_id ORDER BY p
                        ROWS BETWEEN CURRENT ROW
                        AND {_WIN_W - 1} FOLLOWING) AS mk,
         count(*) OVER (PARTITION BY doc_id) AS ng
  FROM g
),
sel AS (
  SELECT doc_id, ng, mk % {_WIN_POS_MOD} AS fp_pos,
         CAST((mk - mk % {_WIN_POS_MOD}) / {_WIN_POS_MOD} AS BIGINT)
           AS fp_hash
  FROM wmin WHERE p + {_WIN_W} <= ng
)"""


@query("text_winnowing_fingerprints", oracle=f"""
WITH {_WINNOW_SEL_SQL}
SELECT doc_id,
       CAST(max(ng) AS BIGINT) AS n_grams,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(count(DISTINCT fp_pos) AS BIGINT) AS n_fingerprints,
       CAST(count(DISTINCT fp_hash) AS BIGINT) AS n_distinct_hashes
FROM sel GROUP BY doc_id
""")
def text_winnowing_fingerprints(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """WINNOWING fingerprint selection (the MOSS algorithm): hash every
    K-token gram, slide a window of W consecutive gram hashes, keep the
    minimum per window — the guarantee-carrying document fingerprinter
    (any shared substring of >= W+K-1 tokens shares a fingerprint)
    behind plagiarism and near-dup detection at sublinear sketch size;
    the density-audit counts per doc are what a fingerprint store sizes
    itself with. text_rolling_hash_fingerprint samples by hash value
    (mod-p, no positional guarantee); winnowing's min-per-window is the
    stronger contract.

    The classic tie problem (which position wins when a window's min
    hash repeats) is solved ENGINE-NEUTRALLY by packing (hash, position)
    into one int64 key = hash * 2^20 + pos before the window min —
    leftmost-minimum selection falls out of integer ordering, no
    argmin/arg_min semantics to diverge. All arithmetic is exact int64.

    Scale shape: gram hashing is a narrow per-doc pass; the min-window
    and the count both partition by doc (parallel, state = one doc's
    grams); output is 5 small ints per doc. The fingerprint JOIN step
    (matching docs sharing fp_hash) is the same band-key equi-join as
    dedup_minhash_lsh — implemented as dedup_winnowing_pairs."""
    sel = _winnow_selected(spark, sf_dir)
    return (sel.groupBy("doc_id")
            .agg(F.max("ng").cast("bigint").alias("n_grams"),
                 F.count(F.lit(1)).cast("bigint").alias("n_windows"),
                 F.countDistinct("fp_pos").cast("bigint")
                 .alias("n_fingerprints"),
                 F.countDistinct("fp_hash").cast("bigint")
                 .alias("n_distinct_hashes")))


# Pair detection thresholds: stop-fingerprint document-frequency cap
# (hashes present in more docs carry no identity signal and would blow
# the join bucket) and the minimum shared-fingerprint count per pair.
_WIN_DF_CAP, _WIN_MIN_SHARED = 50, 2


@query("dedup_winnowing_pairs", oracle=f"""
WITH {_WINNOW_SEL_SQL},
fp AS (SELECT DISTINCT doc_id, fp_hash FROM sel),
df AS (SELECT fp_hash FROM fp GROUP BY fp_hash
       HAVING count(*) <= {_WIN_DF_CAP}),
fp2 AS (SELECT fp.doc_id, fp.fp_hash FROM fp JOIN df USING (fp_hash))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM fp2 a JOIN fp2 b
  ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= {_WIN_MIN_SHARED}
""")
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PAIR DETECTION over winnowing fingerprints — the MOSS
    match step: docs sharing >= 2 selected fingerprint hashes are
    near-dup/plagiarism candidates (the winnowing guarantee makes any
    shared run of >= W+K-1 tokens produce such a share). The third
    member of the candidate-generation family next to MinHash-LSH
    (Jaccard-tuned) and SimHash bands (Hamming-tuned): winnowing is the
    one with a positional substring guarantee.

    Scale discipline is the same as every band join in this engine: the
    pair generator is a fingerprint-keyed EQUI-join over DISTINCT
    (doc, hash) rows, never all-pairs — and hot fingerprints (hashes in
    more than {_WIN_DF_CAP} docs: boilerplate grams, the exact analog of
    dedup_boilerplate_ngrams' stop-grams) are dropped BEFORE the join,
    bounding every bucket at {_WIN_DF_CAP}^2 candidate pairs. One
    distinct, one doc-frequency aggregate, one bucket-bounded self-join,
    one pair-keyed count — all combiner'd."""
    sel = _winnow_selected(spark, sf_dir)
    fp = sel.select("doc_id", "fp_hash").distinct()
    df = (fp.groupBy("fp_hash").agg(F.count(F.lit(1)).alias("dfc"))
          .filter(F.col("dfc") <= _WIN_DF_CAP).select("fp_hash"))
    fp2 = fp.join(df, "fp_hash")
    a = fp2.select(F.col("fp_hash"), F.col("doc_id").alias("doc_a"))
    b = fp2.select(F.col("fp_hash"), F.col("doc_id").alias("doc_b"))
    return (a.join(b, "fp_hash")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
            .filter(F.col("n_shared") >= _WIN_MIN_SHARED))


# BPE merge training: unrolled merge rounds over the word-frequency table.
_BPE_ROUNDS = 6


def _bpe_round_sql(r: int) -> str:
    """One DuckDB merge round: adjacent-pair counts over the previous
    state, deterministic best pair, greedy left-to-right merge via
    string replace on the comma-token representation."""
    return f"""
pr{r} AS (
  SELECT rtrim(syms[CAST(i AS INTEGER)], ',') AS l,
         rtrim(syms[CAST(i AS INTEGER) + 1], ',') AS r,
         sum(freq) AS cnt
  FROM (SELECT freq, syms, unnest(range(1, len(syms))) AS i
        FROM (SELECT freq,
                     list_filter(string_split(repr, ' '), x -> x != '')
                       AS syms
              FROM s{r - 1}))
  GROUP BY 1, 2),
b{r} AS (SELECT l, r, cnt FROM pr{r} ORDER BY cnt DESC, l, r LIMIT 1),
s{r} AS (SELECT word, freq,
                replace(repr, ' ' || b.l || ', ' || b.r || ',',
                        ' ' || b.l || b.r || ',') AS repr
         FROM s{r - 1} CROSS JOIN b{r} b)"""


@query("text_bpe_merge_train", oracle=f"""
WITH wf AS (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w != '' GROUP BY w),
s0 AS (
  SELECT word, freq,
         ' ' || array_to_string(
           list_transform(range(1, len(word) + 1),
                          i -> word[CAST(i AS INTEGER)] || ','), ' ')
           AS repr
  FROM wf),
{",".join(_bpe_round_sql(r) for r in range(1, _BPE_ROUNDS + 1))}
{" UNION ALL ".join(
    f"SELECT CAST({r} AS BIGINT) AS round, l AS lhs, r AS rhs, "
    f"CAST(cnt AS BIGINT) AS pair_count FROM b{r}"
    for r in range(1, _BPE_ROUNDS + 1))}
""")
def text_bpe_merge_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE TOKENIZER TRAINING (Sennrich et al. 2016) as a relational
    plan — {_BPE_ROUNDS} unrolled merge rounds producing the merge
    table (round, lhs, rhs, pair_count), the artifact a tokenizer
    training job ships. Start state is character symbols per word;
    each round counts adjacent symbol pairs weighted by word frequency,
    takes the most frequent pair (count desc, then lexicographic — a
    total order, so the learned merges are engine-identical), and
    greedily merges every non-overlapping occurrence left-to-right.
    text_bpe_pair_counts is round 1's counting stage standalone; this
    is the full training loop.

    The greedy merge is STRING replace on a comma-token encoding
    (\" l, r,\" -> \" lr,\"): each symbol token carries its own
    trailing comma, so the inter-symbol SPACE survives a replacement
    and consecutive pair occurrences all merge in one pass — verified
    identical scan-continue semantics in Spark and DuckDB, which makes
    the per-round merge a single codegen'd expression instead of a
    fold with carry state.

    Scale shape (why BPE training fits a 100 TB corpus): the ONLY
    corpus-wide work is the initial word count (one combiner'd
    shuffle); every merge round runs on the WORD-FREQUENCY table —
    vocabulary-sized model state, the same budget class as the NB
    model — with a 1-row broadcast best-pair scalar folded into the
    next round's replace. Rounds are sequential by nature (each merge
    changes the next round's pair counts); production trains thousands
    of rounds with this exact per-round plan."""
    docs = load_parallel(spark, sf_dir, "documents")
    _, outs = _bpe_train_states(docs)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _bpe_word_state(docs: DataFrame) -> DataFrame:
    """(word, freq, repr) character-split start state shared by every BPE
    path: one corpus-wide word count, then the comma-token encoding."""
    wf = (docs.select(F.explode(F.split("text", " ")).alias("word"))
          .filter(F.col("word") != "")
          .groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("freq")))
    return wf.select(
        "word", "freq",
        F.concat(F.lit(" "), F.array_join(
            F.transform(F.split("word", ""),
                        lambda c: F.concat(c, F.lit(","))), " "))
        .alias("repr"))


def _bpe_pair_counts(state: DataFrame) -> DataFrame:
    """(l, r, cnt) adjacent-pair counts over a word state — the counting
    stage shared by the unrolled oracle trainer and the scaled loop, so
    the two can never disagree on what a round counts."""
    syms = F.filter(F.split("repr", " "), lambda x: x != "")
    n = F.size("syms")
    prs = (state.select("freq", syms.alias("syms"))
           .select("freq", "syms",
                   F.explode(F.when(n >= 2, F.sequence(F.lit(1), n - 1))
                             .otherwise(F.expr(
                                 "cast(array() as array<int>)")))
                   .alias("i"))
           .select("freq",
                   F.expr("rtrim(',', element_at(syms, i))").alias("l"),
                   F.expr("rtrim(',', element_at(syms, i + 1))")
                   .alias("r")))
    return prs.groupBy("l", "r").agg(F.sum("freq").alias("cnt"))


def _bpe_train_states(docs: DataFrame) -> tuple[DataFrame, list[DataFrame]]:
    """Shared BPE training loop (text_bpe_merge_train's plan, factored so
    text_bpe_encode applies the IDENTICAL learned merges): returns the
    final word state after _BPE_ROUNDS merges plus the per-round
    best-pair frames."""
    state = _bpe_word_state(docs)
    outs = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        best = (_bpe_pair_counts(state)
                .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r")).limit(1))
        outs.append(best.select(
            F.lit(rnd).cast("bigint").alias("round"),
            F.col("l").alias("lhs"), F.col("r").alias("rhs"),
            F.col("cnt").cast("bigint").alias("pair_count")))
        state = (state.crossJoin(F.broadcast(best))
                 .select("word", "freq",
                         F.replace(
                             F.col("repr"),
                             F.concat(F.lit(" "), F.col("l"), F.lit(", "),
                                      F.col("r"), F.lit(",")),
                             F.concat(F.lit(" "), F.col("l"), F.col("r"),
                                      F.lit(","))).alias("repr")))
    return state, outs


# Report size for text_bpe_encode: the most frequent words, where the
# learned merges actually bind.
_BPE_ENC_TOP = 40


@query("text_bpe_encode", oracle=f"""
WITH wf AS (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w != '' GROUP BY w),
s0 AS (
  SELECT word, freq,
         ' ' || array_to_string(
           list_transform(range(1, len(word) + 1),
                          i -> word[CAST(i AS INTEGER)] || ','), ' ')
           AS repr
  FROM wf),
{",".join(_bpe_round_sql(r) for r in range(1, _BPE_ROUNDS + 1))},
enc AS (
  SELECT word, freq,
         list_transform(
           list_filter(string_split(repr, ' '), x -> x != ''),
           x -> rtrim(x, ',')) AS toks
  FROM s{_BPE_ROUNDS}),
ranked AS (
  SELECT word, freq,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         array_to_string(toks, ' ') AS tokens,
         row_number() OVER (ORDER BY freq DESC, word) AS rnk
  FROM enc)
SELECT word, freq, n_tokens, tokens, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {_BPE_ENC_TOP}
""")
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING — apply the learned merge table (Sennrich et al.
    2016, the inference half of text_bpe_merge_train): after the
    {_BPE_ROUNDS} trained merges, each word's symbol state IS its
    tokenization, so encoding falls out of replaying the training
    replace chain on the word-frequency table. Reports the
    top-{_BPE_ENC_TOP} words by frequency (deterministic ties by word)
    with their token sequence and token count — the
    compression-per-word artifact a tokenizer evaluation ships
    (frequent words should fuse to few tokens; rare words stay
    character-split).

    Training is the SAME factored loop as text_bpe_merge_train
    (_bpe_train_states), so the merges here are bit-identical to the
    published merge table — the pair a real tokenizer must guarantee
    (train/encode skew is a production bug class).

    Scale shape: identical to the trainer — one corpus-wide word count,
    then vocabulary-sized state per round with 1-row broadcast best-pair
    scalars; the encode step adds only a projection over the final
    state plus a report-sized top-k sort. Encoding a NEW corpus with a
    SHIPPED merge table is the same replace chain seeded from the
    published merges instead of the per-round best computation."""
    from pyspark.sql import Window as W

    docs = load_parallel(spark, sf_dir, "documents")
    state, _ = _bpe_train_states(docs)
    toks = F.transform(
        F.filter(F.split("repr", " "), lambda x: x != ""),
        lambda x: F.rtrim(x, F.lit(",")))
    enc = state.select(
        "word", "freq",
        F.size(F.filter(F.split("repr", " "), lambda x: x != ""))
        .cast("bigint").alias("n_tokens"),
        F.array_join(toks, " ").alias("tokens"))
    wr = W.orderBy(F.desc("freq"), F.asc("word"))
    return (enc.withColumn("rnk", F.row_number().over(wr).cast("bigint"))
            .filter(F.col("rnk") <= _BPE_ENC_TOP))


# Production-depth BPE (VERDICT r07 ask #5): real tokenizers train
# ~30k merges, not 6. The registered scaled query runs this many
# checkpointed rounds; the 6-round unrolled query remains the
# oracle-graded prefix.
_BPE_SCALED_ROUNDS = 256
_BPE_CKPT_EVERY = 8   # merge-replace chain depth between localCheckpoints


def _bpe_apply_merges(state: DataFrame,
                      merges: list[tuple[str, str]]) -> DataFrame:
    """Replay a LEARNED merge list over a word state — encoding a corpus
    with a shipped merge table (the production inference path, seeded
    from published merges instead of per-round best computation). One
    literal replace per merge in training order; callers checkpoint
    every _BPE_CKPT_EVERY merges for long lists."""
    for i, (lhs, rhs) in enumerate(merges, 1):
        state = state.select(
            "word", "freq",
            F.replace(F.col("repr"),
                      F.lit(f" {lhs}, {rhs},"),
                      F.lit(f" {lhs}{rhs},")).alias("repr"))
        if i % _BPE_CKPT_EVERY == 0:
            state = state.localCheckpoint(eager=False)
    return state


def _bpe_train_scaled(docs: DataFrame, rounds: int,
                      on_round=None) -> tuple[list[tuple], DataFrame]:
    """BPE training at PRODUCTION depth: a checkpointed driver loop
    instead of unrolled lineage. Each round counts pairs with the SAME
    factored _bpe_pair_counts the 6-round oracle trainer uses, collects
    the 1-row best pair (model-state-sized driver traffic — the
    weight-matrix precedent), applies the merge as a literal replace,
    and localCheckpoints every {_BPE_CKPT_EVERY} rounds so the plan
    stays round-sized instead of history-sized. Stops early when no
    pair repeats (cnt < 2 — every remaining merge would be noise).
    Returns ((round, lhs, rhs, cnt) list, final word state).
    `on_round(rnd)`, when given, is called after each completed round —
    a measurement hook (scripts/measure_bpe_scaled.py); it never alters
    the training path."""
    state = _bpe_word_state(docs).localCheckpoint(eager=False)
    merges: list[tuple] = []
    for rnd in range(1, rounds + 1):
        rows = (_bpe_pair_counts(state)
                .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
                .limit(1).collect())
        if not rows or rows[0]["cnt"] < 2:
            break
        lhs, rhs, cnt = rows[0]["l"], rows[0]["r"], int(rows[0]["cnt"])
        merges.append((rnd, lhs, rhs, cnt))
        state = state.select(
            "word", "freq",
            F.replace(F.col("repr"),
                      F.lit(f" {lhs}, {rhs},"),
                      F.lit(f" {lhs}{rhs},")).alias("repr"))
        if rnd % _BPE_CKPT_EVERY == 0:
            state = state.localCheckpoint(eager=False)
        if on_round is not None:
            on_round(rnd)
    return merges, state


@query("text_bpe_merge_train_scaled", rows_only=(
    f"data-dependent sequential merge selection at production depth "
    f"({_BPE_SCALED_ROUNDS} rounds): each round's pair counts depend on "
    f"the previous round's collected best pair, so a single SQL oracle "
    f"would need {_BPE_SCALED_ROUNDS} chained data-dependent CTE rounds; "
    f"the 6-round text_bpe_merge_train IS this loop's oracle-graded "
    f"prefix and the bounding test asserts exact prefix agreement plus "
    f"merge-replay agreement on the final state",
    "test_bpe_scaled_prefix_and_replay"),
    eager=True)
def text_bpe_merge_train_scaled(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """BPE tokenizer training at PRODUCTION depth ({_BPE_SCALED_ROUNDS}
    checkpointed merge rounds; Sennrich et al. 2016) — the runnable-job
    form of text_bpe_merge_train, whose 6 unrolled rounds are
    oracle-scale (VERDICT r07 #5 named this the one LLM-pipeline
    operator whose registered form wasn't production-shape). The loop
    is the EXACT oracle-trainer round factored into a driver loop:
    count pairs (_bpe_pair_counts, shared code), pick the (cnt desc,
    lhs, rhs) best, greedy-merge via the comma-token literal replace —
    so round k here is bit-identical to round k of the unrolled query
    for every k <= 6 (asserted by the bounding test), and replaying the
    returned merge table through _bpe_apply_merges reproduces the final
    word state exactly (train/encode skew, the production tokenizer bug
    class, is structurally impossible AND tested).

    Scale shape: the only corpus-sized work is the initial word count;
    each round is a vocabulary-sized pair count (one small shuffle) + a
    1-ROW collect + a narrow replace, with localCheckpoint every
    {_BPE_CKPT_EVERY} rounds keeping the plan depth bounded — the same
    loop discipline as connected components. At 100 TB the word table
    is ~1e8 rows (Heaps' law), so a 30k-merge production run is 30k
    small-shuffle rounds over model-sized state: hours, not days, and
    embarrassingly restartable from any checkpointed (state, merges)
    pair. Early-stops when no pair repeats."""
    docs = load_parallel(spark, sf_dir, "documents")
    merges, _ = _bpe_train_scaled(docs, _BPE_SCALED_ROUNDS)
    return spark.createDataFrame(
        merges, "round bigint, lhs string, rhs string, pair_count bigint")


# Kneser-Ney: absolute discount and report size.
_KN_D, _KN_TOP = 0.75, 50


@query("text_kneser_ney_bigram", oracle=f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bg AS (
  SELECT w[CAST(i AS INTEGER)] AS w1, w[CAST(i AS INTEGER) + 1] AS w2
  FROM (SELECT w, unnest(range(1, len(w))) AS i FROM t)),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c12) AS c1, count(*) AS n1p_right
       FROM c12 GROUP BY w1),
cl AS (SELECT w2, count(*) AS n1p_left FROM c12 GROUP BY w2),
tt AS (SELECT count(*) AS t_types FROM c12),
scored AS (
  SELECT c12.w1, c12.w2, c12.c12, c1.c1,
         c1.n1p_right, cl.n1p_left,
         round(cl.n1p_left * 1.0 / tt.t_types, 6) AS p_cont,
         round((c12.c12 - {_KN_D}) / c1.c1
               + {_KN_D} * c1.n1p_right / c1.c1
                 * (cl.n1p_left * 1.0 / tt.t_types), 6) AS p_kn
  FROM c12 JOIN c1 USING (w1) JOIN cl USING (w2) CROSS JOIN tt),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY c12 DESC, w1, w2) AS rnk
  FROM scored)
SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, CAST(c1 AS BIGINT) AS c1,
       CAST(n1p_right AS BIGINT) AS n1p_right,
       CAST(n1p_left AS BIGINT) AS n1p_left,
       p_cont, p_kn, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {_KN_TOP}
""")
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNESER-NEY smoothed bigram LM training counts (Kneser & Ney
    1995; Chen & Goodman 1998) — the count tables an n-gram language
    model ships: raw bigram counts, context totals, the CONTINUATION
    counts KN is famous for (how many distinct left-contexts a word
    appears in — "Francisco" is frequent but only ever follows "San",
    so its continuation probability is tiny), and the absolutely-
    discounted interpolated probability
    p_kn(w2|w1) = (c12 - D)/c1 + D * N1+(w1,.)/c1 * N1+(.,w2)/T.
    Top-{_KN_TOP} bigrams by count (deterministic ties). The n-gram-LM
    relative of text_bigram_surprisal (raw MLE) — KN is what perplexity
    filters actually train at corpus scale (CCNet's LM quality scoring).

    Scale shape: all four count tables derive from ONE bigram aggregate
    (c12), itself one combiner'd corpus-wide shuffle on the bigram key;
    context/continuation tables are vocabulary-sized reaggregations of
    c12, the type total is a 1-row broadcast scalar, and the final
    top-k is a single global sort of ONLY the report rows. D folds in
    as a literal. All-integer until the two final divisions."""
    docs = load_parallel(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    # guard single-word docs: sequence(1, 0) DESCENDS in Spark, which
    # would index w[-1] (ANSI invalid-array-index; caught by the
    # degenerate-documents parity test)
    bg = (docs.select(ws.alias("w"))
          .select(F.explode(F.expr(
              "transform("
              "  CASE WHEN size(w) >= 2 THEN sequence(1, size(w) - 1)"
              "       ELSE cast(array() as array<int>) END, "
              "i -> struct(w[i - 1] AS w1, w[i] AS w2))")).alias("b"))
          .select("b.w1", "b.w2"))
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = (c12.groupBy("w1")
          .agg(F.sum("c12").alias("c1"),
               F.count(F.lit(1)).alias("n1p_right")))
    cl = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_left"))
    tt = c12.agg(F.count(F.lit(1)).alias("t_types"))
    from pyspark.sql import Window as W
    scored = (c12.join(c1, "w1").join(cl, "w2")
              .crossJoin(F.broadcast(tt))
              .select(
                  "w1", "w2",
                  F.col("c12").cast("bigint").alias("c12"),
                  F.col("c1").cast("bigint").alias("c1"),
                  F.col("n1p_right").cast("bigint").alias("n1p_right"),
                  F.col("n1p_left").cast("bigint").alias("n1p_left"),
                  F.round(F.col("n1p_left") * 1.0 / F.col("t_types"), 6)
                  .alias("p_cont"),
                  F.round((F.col("c12") - _KN_D) / F.col("c1")
                          + _KN_D * F.col("n1p_right") / F.col("c1")
                          * (F.col("n1p_left") * 1.0 / F.col("t_types")), 6)
                  .alias("p_kn")))
    # distributed top-k FIRST (TakeOrderedAndProject: per-partition
    # partial top-k, never a corpus-wide single-task sort of all bigram
    # types), THEN rank the <= _KN_TOP surviving rows — the global
    # row_number window only ever sees the bounded report.
    top = scored.orderBy(F.desc("c12"), F.asc("w1"), F.asc("w2")) \
        .limit(_KN_TOP)
    rnk = F.row_number().over(
        W.orderBy(F.desc("c12"), F.asc("w1"), F.asc("w2")))
    return top.withColumn("rnk", rnk.cast("bigint"))


# Perplexity-filter quartile split (CCNet uses tertiles; quartiles keep
# the threshold literals exactly representable in binary).
_PPL_Q1, _PPL_Q3 = 0.25, 0.75


@query("text_kn_perplexity_filter", oracle=f"""
WITH tr AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
            WHERE doc_id % 2 = 0),
trbg AS (
  SELECT w[CAST(i AS INTEGER)] AS w1, w[CAST(i AS INTEGER) + 1] AS w2
  FROM (SELECT w, unnest(range(1, len(w))) AS i FROM tr)),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM trbg GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c12) AS c1, count(*) AS n1p_right
       FROM c12 GROUP BY w1),
cl AS (SELECT w2, count(*) AS n1p_left FROM c12 GROUP BY w2),
tt AS (SELECT count(*) AS t_types FROM c12),
vv AS (SELECT count(DISTINCT word) AS v
       FROM (SELECT unnest(w) AS word FROM tr)),
al AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
albg AS (
  SELECT doc_id, w[CAST(i AS INTEGER)] AS w1,
         w[CAST(i AS INTEGER) + 1] AS w2
  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM al)),
dbg AS (SELECT doc_id, w1, w2, count(*) AS m
        FROM albg GROUP BY doc_id, w1, w2),
scored AS (
  SELECT d.doc_id, d.m,
         round(CASE
           WHEN c12.c12 IS NOT NULL THEN
             (c12.c12 - {_KN_D}) / c1.c1
             + {_KN_D} * c1.n1p_right / c1.c1
               * (cl.n1p_left * 1.0 / tt.t_types)
           WHEN c1.c1 IS NOT NULL THEN
             {_KN_D} * c1.n1p_right / c1.c1
             * coalesce(cl.n1p_left * 1.0 / tt.t_types, 1.0 / (vv.v + 1))
           ELSE
             coalesce(cl.n1p_left * 1.0 / tt.t_types, 1.0 / (vv.v + 1))
         END, 12) AS p
  FROM dbg d
  LEFT JOIN c12 ON d.w1 = c12.w1 AND d.w2 = c12.w2
  LEFT JOIN c1 ON d.w1 = c1.w1
  LEFT JOIN cl ON d.w2 = cl.w2
  CROSS JOIN tt CROSS JOIN vv),
perdoc AS (
  SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
         round(sum(m * -ln(p)) / sum(m), 6) AS avg_nll
  FROM scored GROUP BY doc_id),
thr AS (SELECT round(quantile_cont(avg_nll, {_PPL_Q1}), 9) AS q1,
               round(quantile_cont(avg_nll, {_PPL_Q3}), 9) AS q3
        FROM perdoc)
SELECT a.doc_id,
       coalesce(p.n_bigrams, 0) AS n_bigrams,
       p.avg_nll,
       round(exp(p.avg_nll), 3) AS ppl,
       CASE WHEN p.avg_nll IS NULL THEN 'unscored'
            WHEN p.avg_nll <= t.q1 THEN 'head'
            WHEN p.avg_nll > t.q3 THEN 'tail'
            ELSE 'middle' END AS tier
FROM (SELECT doc_id FROM documents) a
LEFT JOIN perdoc p USING (doc_id)
CROSS JOIN thr t
""")
def text_kn_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERPLEXITY FILTERING — the CCNet / LLaMA-data quality gate
    (Wenzek et al. 2020): train a Kneser-Ney bigram LM on a reference
    slice (even doc_ids stand in for the wiki-quality corpus), score
    EVERY document's per-token cross-entropy under it, and split the
    corpus into head/middle/tail quality bands at the scored-corpus
    quartiles. Downstream pipelines keep head+middle and drop or
    downweight tail — this is the single most load-bearing filter in
    the CCNet recipe. Backoff chain for unseen events: seen bigram →
    full interpolated KN; seen context only → discount mass times
    continuation probability; unseen context → continuation
    probability; unseen word → uniform 1/(V+1).

    Scale shape: model tables are the same ONE combiner'd bigram
    aggregate text_kneser_ney_bigram builds (vocabulary-sized);
    scoring re-aggregates each doc's bigrams (one combiner'd shuffle
    on (doc, w1, w2)) then LEFT-joins the model tables — all
    vocabulary-sized, broadcast at any corpus size. The quartile
    thresholds are a 2-value scalar broadcast (exact percentile over
    the doc-level frame; the approx_percentile twin applies beyond
    ~10^9 docs). Probabilities snap to a 12-digit grid BEFORE ln so
    the two engines' ulp drift cannot survive into the sum."""
    docs = load_parallel(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    bg_expr = F.expr(
        "transform("
        "  CASE WHEN size(w) >= 2 THEN sequence(1, size(w) - 1)"
        "       ELSE cast(array() as array<int>) END, "
        "i -> struct(w[i - 1] AS w1, w[i] AS w2))")
    tr = docs.filter(F.col("doc_id") % 2 == 0).select(ws.alias("w"))
    trbg = (tr.select(F.explode(bg_expr).alias("b"))
            .select("b.w1", "b.w2"))
    c12 = trbg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = (c12.groupBy("w1")
          .agg(F.sum("c12").alias("c1"),
               F.count(F.lit(1)).alias("n1p_right")))
    cl = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_left"))
    tt = c12.agg(F.count(F.lit(1)).alias("t_types"))
    vv = (tr.select(F.explode("w").alias("word"))
          .agg(F.countDistinct("word").alias("v")))
    dbg = (docs.select("doc_id", ws.alias("w"))
           .select("doc_id", F.explode(bg_expr).alias("b"))
           .groupBy("doc_id", F.col("b.w1").alias("w1"),
                    F.col("b.w2").alias("w2"))
           .agg(F.count(F.lit(1)).alias("m")))
    p_cont = F.col("n1p_left") * 1.0 / F.col("t_types")
    fallback = F.coalesce(p_cont, 1.0 / (F.col("v") + 1))
    p = F.round(
        F.when(F.col("c12").isNotNull(),
               (F.col("c12") - _KN_D) / F.col("c1")
               + _KN_D * F.col("n1p_right") / F.col("c1") * p_cont)
        .when(F.col("c1").isNotNull(),
              _KN_D * F.col("n1p_right") / F.col("c1") * fallback)
        .otherwise(fallback), 12)
    scored = (dbg
              .join(F.broadcast(c12), ["w1", "w2"], "left")
              .join(F.broadcast(c1), ["w1"], "left")
              .join(F.broadcast(cl), ["w2"], "left")
              .crossJoin(F.broadcast(tt)).crossJoin(F.broadcast(vv))
              .select("doc_id", "m", p.alias("p")))
    perdoc = (scored.groupBy("doc_id")
              .agg(F.sum("m").cast("bigint").alias("n_bigrams"),
                   F.round(F.sum(F.col("m") * -F.log("p")) / F.sum("m"), 6)
                   .alias("avg_nll")))
    thr = perdoc.agg(
        F.round(F.percentile("avg_nll", F.lit(_PPL_Q1)), 9).alias("q1"),
        F.round(F.percentile("avg_nll", F.lit(_PPL_Q3)), 9).alias("q3"))
    tier = (F.when(F.col("avg_nll").isNull(), "unscored")
            .when(F.col("avg_nll") <= F.col("q1"), "head")
            .when(F.col("avg_nll") > F.col("q3"), "tail")
            .otherwise("middle"))
    return (docs.select("doc_id")
            .join(perdoc, "doc_id", "left")
            .crossJoin(F.broadcast(thr))
            .select("doc_id",
                    F.coalesce("n_bigrams", F.lit(0)).cast("bigint")
                    .alias("n_bigrams"),
                    "avg_nll",
                    F.round(F.exp("avg_nll"), 3).alias("ppl"),
                    tier.alias("tier")))


@query("text_zipf_fit", oracle="""
WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
tok AS (SELECT unnest(w) AS word FROM t),
cnt AS (SELECT word, count(*) AS f FROM tok GROUP BY word),
r AS (SELECT word, f,
             row_number() OVER (ORDER BY f DESC, word) AS rk
      FROM cnt),
pts AS (SELECT ln(rk) AS x, ln(f) AS y FROM r),
s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy,
             sum(y * y) AS syy
      FROM pts)
SELECT CAST(n AS BIGINT) AS n_terms,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         AS intercept,
       round(pow(n * sxy - sx * sy, 2)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s
""")
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus rank-frequency curve: OLS of
    ln(freq) on ln(rank) — slope ~ -s estimates the Zipf exponent, and
    r2 measures how Zipfian the corpus is. The standard corpus-health
    diagnostic for a training mix: synthetic/templated data shows up as
    a FLAT head (|slope| << 1, low r2 — this fixture's 31-word uniform
    vocabulary reads exactly so), scraped boilerplate as an over-steep
    head; production pipelines chart this per source/snapshot.

    One (word)-keyed count with map-side partial aggregation, a
    vocabulary-sized rank window, then a single 6-sum OLS aggregate
    (ml_ols_two_feature's closed-form precedent — slope, intercept and
    r2 all from one moment row, no second pass). Summation order drift
    on the ln() moments is ~1e-15 relative against a 6-digit output
    grid. At 100 TB the only corpus-wide stage is the word count; the
    window runs over |vocab| rows — if a single-task vocab rank ever
    binds, the two-phase sharded top-M rank (dedup_semdedup_capped)
    drops in unchanged."""
    docs = load_parallel(spark, sf_dir, "documents")
    cnt = (docs.select(F.explode(F.split("text", " ")).alias("word"))
           .groupBy("word").agg(F.count(F.lit(1)).alias("f")))
    from pyspark.sql import Window as W
    r = cnt.withColumn(
        "rk", F.row_number().over(W.orderBy(F.desc("f"), F.asc("word"))))
    pts = r.select(F.log("rk").alias("x"), F.log("f").alias("y"))
    x, y = F.col("x"), F.col("y")
    s = pts.agg(F.count(F.lit(1)).cast("double").alias("n"),
                F.sum(x).alias("sx"), F.sum(y).alias("sy"),
                F.sum(x * x).alias("sxx"), F.sum(x * y).alias("sxy"),
                F.sum(y * y).alias("syy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        n.cast("bigint").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(F.pow(n * sxy - sx * sy, F.lit(2))
                / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
        .alias("r2"))


# RAKE candidate-phrase cap (standard practice: drop runs longer than
# _RAKE_MAXLEN words — degree scores saturate on long runs) and the
# report size.
_RAKE_MAXLEN = 4
_RAKE_TOPK = 25


@query("text_rake_keywords", oracle=f"""
WITH t0 AS (SELECT doc_id, string_split(lower(text), ' ') AS w
            FROM documents),
tok AS (SELECT doc_id, generate_subscripts(w, 1) AS i, unnest(w) AS word
        FROM t0),
ns AS (
  SELECT doc_id, i, word,
         i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS isl
  FROM tok WHERE word <> '' AND word NOT IN {_STOP_SQL}),
occ AS (
  SELECT doc_id, isl, i, word,
         count(*) OVER (PARTITION BY doc_id, isl) AS plen
  FROM ns),
capped AS (SELECT * FROM occ WHERE plen <= {_RAKE_MAXLEN}),
wst AS (
  SELECT word,
         CAST(round(1000000.0 * sum(plen) / count(*)) AS BIGINT)
           AS score_micro
  FROM capped GROUP BY word),
pocc AS (
  SELECT doc_id, isl,
         string_agg(word, ' ' ORDER BY i) AS phrase
  FROM capped GROUP BY doc_id, isl),
msc AS (
  SELECT c.doc_id, c.isl, sum(w.score_micro) AS psc
  FROM capped c JOIN wst w ON w.word = c.word
  GROUP BY c.doc_id, c.isl),
phr AS (
  SELECT p.phrase, CAST(count(*) AS BIGINT) AS n_occ,
         CAST(max(m.psc) AS BIGINT) AS score_micro
  FROM pocc p JOIN msc m ON m.doc_id = p.doc_id AND m.isl = p.isl
  GROUP BY p.phrase),
ranked AS (
  SELECT phrase, n_occ, score_micro,
         row_number() OVER (ORDER BY score_micro DESC, phrase) AS rnk
  FROM phr)
SELECT CAST(rnk AS BIGINT) AS rnk, phrase,
       CAST(len(string_split(phrase, ' ')) AS BIGINT) AS n_words,
       n_occ, score_micro,
       round(score_micro / 1000000.0, 6) AS score
FROM ranked WHERE rnk <= {_RAKE_TOPK}
""")
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010 — Rapid Automatic
    Keyword Extraction, the unsupervised keyphrase baseline every
    corpus-exploration pipeline starts with): candidate phrases are
    maximal stopword-free token runs (gaps-and-islands over the token
    stream, capped at {_RAKE_MAXLEN} words), each word scores
    degree/frequency over the candidate set (degree = total length of
    phrases containing it — co-occurrence reach; frequency = raw
    count), and a phrase scores the sum of its member word scores.
    Top-{_RAKE_TOPK} distinct phrases corpus-wide, deterministic
    (score, phrase) order.

    Determinism: word scores snap to integer micro-units BEFORE the
    phrase sum (CAST(round(1e6*deg/freq)) — both engines divide the
    same exact int64 pair, and a representable-half quotient rounds
    half-away identically), so phrase scores are order-free int64 sums
    — the MMR/AdaBoost grid discipline (SCALE.md watch #4).

    Scale shape: tokenize -> one windowed island pass partitioned by
    doc (never global), then two vocabulary-sized keyed aggregates and
    a phrase-sized rollup; the top-K is a single limit over the
    distinct-phrase table. No all-pairs anywhere; at 100 TB the cost is
    the token explode, which partial aggregation collapses map-side."""
    from pyspark.sql import Window as W

    docs = load_parallel(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("i", "word"))
    ns = (tok.filter((F.col("word") != "")
                     & ~F.col("word").isin(STOPWORDS))
          .withColumn("isl", F.col("i") - F.row_number().over(
              W.partitionBy("doc_id").orderBy("i"))))
    occ = ns.withColumn(
        "plen", F.count(F.lit(1)).over(W.partitionBy("doc_id", "isl")))
    capped = occ.filter(F.col("plen") <= _RAKE_MAXLEN)
    wst = (capped.groupBy("word")
           .agg(F.round(1000000.0 * F.sum("plen") / F.count(F.lit(1)))
                .cast("bigint").alias("score_micro")))
    pocc = (capped.groupBy("doc_id", "isl")
            .agg(F.concat_ws(" ", F.transform(
                F.array_sort(F.collect_list(F.struct("i", "word"))),
                lambda s: s["word"])).alias("phrase")))
    msc = (capped.join(wst, "word")
           .groupBy("doc_id", "isl")
           .agg(F.sum("score_micro").alias("psc")))
    phr = (pocc.join(msc, ["doc_id", "isl"])
           .groupBy("phrase")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_occ"),
                F.max("psc").cast("bigint").alias("score_micro")))
    # top-K as orderBy().limit() (TakeOrderedAndProject — a per-partition
    # heap + K-row merge), THEN rank the K survivors: an unpartitioned
    # row_number window over the full phrase table would sort it on one
    # executor (the graph_jaccard_link_prediction round-4 lesson)
    ranked = (phr.orderBy(F.desc("score_micro"), F.asc("phrase"))
              .limit(_RAKE_TOPK)
              .withColumn("rnk", F.row_number().over(
                  W.orderBy(F.desc("score_micro"), F.asc("phrase")))))
    return (ranked
            .select(F.col("rnk").cast("bigint").alias("rnk"), "phrase",
                    F.size(F.split("phrase", " ")).cast("bigint")
                    .alias("n_words"),
                    "n_occ", "score_micro",
                    F.round(F.col("score_micro") / 1000000.0, 6)
                    .alias("score")))


# Unigram-LM (SentencePiece) tokenizer family — the OTHER production
# tokenizer algorithm next to BPE (Kudo 2018): a vocabulary of pieces
# with probabilities, each word segmented by the max-likelihood piece
# sequence (Viterbi), vocabulary re-estimated by EM. Constants:
_UNI_MAXLEN = 12   # word-length bound of the unrolled Viterbi oracle
_UNI_MAXP = 4      # max piece length
_UNI_V = 40        # kept multi-char pieces (plus ALL single chars)
_UNI_NEG = -(10 ** 15)  # -inf stand-in on the micro-log grid


def _unigram_oracle() -> str:
    """Unrolled Viterbi DP + backtrace. Piece log-probs snap to an
    INTEGER micro-log grid (round(ln(cnt/tot)*1e6) — the DSIR idiom),
    so the DP is pure int64 max/plus and the argmax path (largest-
    last-piece tie rule) is engine-exact. Levels and backtrace steps
    are generated CTEs (the _dtw_oracle precedent); every multiply-
    referenced CTE is AS MATERIALIZED (the LPA lesson)."""
    levels = []
    for j in range(1, _UNI_MAXLEN + 1):
        terms = []
        joins = []
        for l in range(1, min(_UNI_MAXP, j) + 1):
            joins.append(
                f"JOIN v{j - l} p{l} ON p{l}.word = w.word\n"
                f"  LEFT JOIN lp l{l} ON l{l}.piece = "
                f"substr(w.word, {j - l + 1}, {l})")
            terms.append(f"coalesce(p{l}.s + l{l}.lmic, {_UNI_NEG})")
        levels.append(f"""
v{j} AS MATERIALIZED (
  SELECT w.word, greatest({", ".join(terms)}) AS s
  FROM wt w
  {chr(10).join(joins)}
  WHERE len(w.word) >= {j})"""[1:])
    lv_union = "\nUNION ALL\n".join(
        f"SELECT word, {j} AS j, s FROM v{j}"
        for j in range(0, _UNI_MAXLEN + 1))
    steps = []
    for k in range(1, _UNI_MAXLEN + 1):
        steps.append(f"""
b{k} AS MATERIALIZED (
  SELECT b.word,
         CASE WHEN b.j = 0 THEN 0
              ELSE b.j - ch.l END AS j,
         CASE WHEN b.j = 0 THEN b.seg
              ELSE substr(b.word, b.j - ch.l + 1, ch.l)
                   || (CASE WHEN b.seg = '' THEN '' ELSE '+' END)
                   || b.seg END AS seg
  FROM b{k - 1} b
  LEFT JOIN choice ch ON b.j > 0 AND ch.word = b.word AND ch.j = b.j)"""[1:])
    return f"""
WITH wt AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' AND len(word) <= {_UNI_MAXLEN}
  GROUP BY word),
subs AS (
  SELECT substr(w.word, ii.i, ll.l) AS piece, w.freq
  FROM wt w
  CROSS JOIN range(1, {_UNI_MAXLEN + 1}) ii(i)
  CROSS JOIN range(1, {_UNI_MAXP + 1}) ll(l)
  WHERE ii.i + ll.l - 1 <= len(w.word)),
pc AS MATERIALIZED (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
                    FROM subs GROUP BY piece),
topv AS (SELECT piece FROM pc ORDER BY cnt DESC, piece LIMIT {_UNI_V}),
kept AS MATERIALIZED (
  SELECT DISTINCT piece FROM (
    SELECT piece FROM topv
    UNION ALL
    SELECT piece FROM pc WHERE len(piece) = 1)),
tot AS (SELECT CAST(sum(pc.cnt) AS DOUBLE) AS t
        FROM pc JOIN kept USING (piece)),
lp AS MATERIALIZED (
  SELECT pc.piece,
         CAST(round(ln(pc.cnt / tot.t) * 1000000) AS BIGINT) AS lmic
  FROM pc JOIN kept USING (piece) CROSS JOIN tot),
v0 AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS s FROM wt),
{",".join(levels)},
lv AS MATERIALIZED (
{lv_union}),
cand AS (
  SELECT lvj.word, lvj.j, ll.l
  FROM lv lvj
  CROSS JOIN range(1, {_UNI_MAXP + 1}) ll(l)
  JOIN lv lvp ON lvp.word = lvj.word AND lvp.j = lvj.j - ll.l
  JOIN lp ON lp.piece = substr(lvj.word, lvj.j - ll.l + 1, ll.l)
  WHERE lvj.j > 0 AND ll.l <= lvj.j
    AND lvj.s = lvp.s + lp.lmic),
choice AS MATERIALIZED (
  SELECT word, j, max(l) AS l FROM cand GROUP BY word, j),
b0 AS (SELECT word, len(word) AS j, '' AS seg FROM wt),
{",".join(steps)}
SELECT w.word, w.freq,
       CAST(len(string_split(b.seg, '+')) AS BIGINT) AS n_pieces,
       b.seg AS seg,
       CAST(v.s AS BIGINT) AS score_micro
FROM wt w
JOIN b{_UNI_MAXLEN} b ON b.word = w.word
JOIN lv v ON v.word = w.word AND v.j = len(w.word)
"""


def _unigram_piece_logprobs(spark: SparkSession,
                            sf_dir: str) -> tuple[DataFrame, dict]:
    """(word-frequency frame, {piece: micro-log-prob}) — the shared
    vocabulary-init stage: all substrings of length 1..{_UNI_MAXP} of
    the word types weighted by word frequency, top {_UNI_V} by
    (count desc, piece) plus every single character (so any word stays
    segmentable), probabilities on the integer micro-log grid."""
    docs = load_parallel(spark, sf_dir, "documents")
    wt = (docs.select(F.explode(F.split("text", " ")).alias("word"))
          .filter((F.col("word") != "")
                  & (F.length("word") <= _UNI_MAXLEN))
          .groupBy("word").agg(F.count(F.lit(1)).cast("bigint")
                               .alias("freq")))
    wt = wt.localCheckpoint()
    subs = None
    for l in range(1, _UNI_MAXP + 1):
        s_ = (wt.select(
                F.explode(F.expr(
                    f"transform(sequence(1, greatest(length(word) - {l - 1},"
                    f" 0)), i -> substring(word, i, {l}))")).alias("piece"),
                "freq")
              .filter(F.length("piece") == l))
        subs = s_ if subs is None else subs.unionByName(s_)
    pc = subs.groupBy("piece").agg(F.sum("freq").cast("bigint").alias("cnt"))
    pc = pc.localCheckpoint()
    topv = (pc.orderBy(F.desc("cnt"), F.asc("piece")).limit(_UNI_V)
            .select("piece"))
    chars = pc.filter(F.length("piece") == 1).select("piece")
    kept = topv.unionByName(chars).distinct()
    kp = pc.join(kept, "piece")
    tot = float(kp.agg(F.sum("cnt")).collect()[0][0])
    lp_rows = (kp.select(
        "piece",
        F.round(F.log(F.col("cnt") / F.lit(tot)) * 1000000.0)
        .cast("bigint").alias("lmic")).collect())
    return wt, {r["piece"]: int(r["lmic"]) for r in lp_rows}


@query("text_unigram_viterbi_segment", eager=True,
       oracle=_unigram_oracle())
def text_unigram_viterbi_segment(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """UNIGRAM-LM tokenizer E-step (Kudo 2018 — the SentencePiece
    algorithm, the other production tokenizer family next to this
    repo's BPE trainers): initialize a piece vocabulary from substring
    statistics ({_UNI_V} top pieces + all single chars, probabilities
    proportional to frequency-weighted substring counts), then segment
    every word type by its MAX-LIKELIHOOD piece sequence via Viterbi
    over piece log-probs. Output per word type: the chosen segmentation
    (pieces joined by '+'), piece count, and the path score.

    Engine-exactness: piece log-probs snap to an integer MICRO-LOG grid
    (round(ln(cnt/tot)*1e6), the DSIR idiom), so the DP is pure int64
    max/plus; path ties break by LARGEST last piece at every position —
    both engines replay the identical argmax. The oracle unrolls the
    {_UNI_MAXLEN}-level DP and its backtrace as generated CTEs (the DTW
    precedent); the Spark side runs the same integer DP in an
    Arrow-batched pandas UDF over the word-type table with the
    vocabulary broadcast (model-state-sized, the weight-matrix
    convention). Words longer than {_UNI_MAXLEN} chars are excluded on
    BOTH sides — the oracle's unroll bound; the Spark DP itself has no
    such limit, and production raises the constant.

    Scale shape: ONE corpus pass for the word count (combiner'd);
    everything after runs on word-TYPE-sized state (Heaps-law bounded)
    — substring init is a narrow explode over types, the vocabulary is
    V+alphabet rows, and the E-step is embarrassingly parallel over
    types. The M-step twin (text_unigram_em_reestimate) re-counts
    pieces over these segmentations — one EM round, the loop discipline
    of text_bpe_merge_train_scaled applies for more."""
    import pandas as pd

    wt, lmic = _unigram_piece_logprobs(spark, sf_dir)
    blm = spark.sparkContext.broadcast(lmic)

    def seg_batch(it):
        for pdf in it:
            lm = blm.value
            out = []
            for word, freq in zip(pdf["word"], pdf["freq"]):
                n = len(word)
                NEG = _UNI_NEG
                s = [0] + [NEG] * n
                for j in range(1, n + 1):
                    best = NEG
                    for l in range(1, min(_UNI_MAXP, j) + 1):
                        lp = lm.get(word[j - l:j])
                        if lp is not None and s[j - l] + lp > best:
                            best = s[j - l] + lp
                    s[j] = best
                pieces = []
                j = n
                while j > 0:
                    pick = None
                    for l in range(1, min(_UNI_MAXP, j) + 1):
                        lp = lm.get(word[j - l:j])
                        if lp is not None and s[j] == s[j - l] + lp:
                            pick = l  # largest l wins (loop ascends)
                    pieces.append(word[j - pick:j])
                    j -= pick
                pieces.reverse()
                out.append((word, int(freq), len(pieces),
                            "+".join(pieces), int(s[n])))
            yield pd.DataFrame(out, columns=[
                "word", "freq", "n_pieces", "seg", "score_micro"])

    return wt.mapInPandas(
        seg_batch,
        "word string, freq bigint, n_pieces bigint, seg string, "
        "score_micro bigint")


@query("text_unigram_em_reestimate", eager=True, oracle=f"""
WITH segs AS MATERIALIZED ({{segment}}),
occ AS (SELECT unnest(string_split(seg, '+')) AS piece, freq FROM segs)
SELECT piece,
       CAST(sum(freq) AS BIGINT) AS em_count,
       CAST(count(*) AS BIGINT) AS n_word_types
FROM occ GROUP BY piece
ORDER BY em_count DESC, piece LIMIT 20
""".format(segment=_unigram_oracle()))
def text_unigram_em_reestimate(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """UNIGRAM-LM M-step: re-count piece usage over the Viterbi
    segmentations (frequency-weighted) — the sufficient statistics the
    EM round renormalizes into the next vocabulary, reported as the
    top-20 pieces (count desc, piece). COMPOSITION: the Spark side
    reuses the registered E-step callable; the oracle embeds the
    E-step's generated SQL verbatim as a CTE (the sim_mutual_knn_pairs
    convention), so the two EM halves cannot drift. One explode +
    grouped sum over word-TYPE-sized state."""
    seg = text_unigram_viterbi_segment(spark, sf_dir)
    occ = seg.select(F.explode(F.split("seg", r"\+")).alias("piece"),
                     "freq")
    return (occ.groupBy("piece")
            .agg(F.sum("freq").cast("bigint").alias("em_count"),
                 F.count(F.lit(1)).cast("bigint").alias("n_word_types"))
            .orderBy(F.desc("em_count"), F.asc("piece")).limit(20))


# WordPiece trainer — the THIRD production tokenizer-training rule next
# to BPE (frequency-greedy merges) and unigram-LM (likelihood pruning):
# WordPiece (Schuster & Nakajima 2012; Wu et al. 2016, GNMT §4) merges
# the adjacent pair maximizing the LIKELIHOOD RATIO
# count(l,r) / (count(l) * count(r)) — the pair whose merge most
# increases a unigram LM's corpus likelihood — instead of raw pair
# frequency. Same start state, counting stage, and greedy left-to-right
# comma-token merge as the BPE trainer (shared helpers, so the three
# trainers can never disagree on WHAT a round counts); only the
# selection rule differs.
_WP_ROUNDS = 6
_WP_SCORE_E12 = 1_000_000_000_000


def _wp_round_sql(r: int) -> str:
    """One DuckDB WordPiece round: adjacent-pair counts AND symbol
    unigram counts over the previous state, likelihood-ratio score on
    an exact integer e12 grid (HUGEINT floor division — engine-exact,
    no float comparison), deterministic best pair, then the same
    greedy comma-token merge as the BPE oracle round. Every
    multiply-referenced CTE is AS MATERIALIZED (the LPA lesson —
    wsy{r} feeds both counts, t{r} feeds the next round twice;
    inlined, the chain re-evaluates 3^rounds times: measured 206s at
    sf0.01 vs 0.4s materialized)."""
    return f"""
wsy{r} AS MATERIALIZED (
  SELECT freq, list_filter(string_split(repr, ' '), x -> x != '') AS syms
  FROM t{r - 1}),
wpr{r} AS (
  SELECT rtrim(syms[CAST(i AS INTEGER)], ',') AS l,
         rtrim(syms[CAST(i AS INTEGER) + 1], ',') AS r,
         sum(freq) AS cnt
  FROM (SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM wsy{r})
  GROUP BY 1, 2),
wug{r} AS (
  SELECT rtrim(syms[CAST(i AS INTEGER)], ',') AS sym, sum(freq) AS ucnt
  FROM (SELECT freq, syms, unnest(range(1, len(syms) + 1)) AS i
        FROM wsy{r})
  GROUP BY 1),
wsc{r} AS (
  SELECT p.l, p.r, p.cnt,
         CAST(CAST(p.cnt AS HUGEINT) * {_WP_SCORE_E12}
              // (CAST(ul.ucnt AS HUGEINT) * ur.ucnt) AS BIGINT)
           AS score_e12
  FROM wpr{r} p
  JOIN wug{r} ul ON p.l = ul.sym
  JOIN wug{r} ur ON p.r = ur.sym),
wb{r} AS (SELECT l, r, cnt, score_e12 FROM wsc{r}
          ORDER BY score_e12 DESC, cnt DESC, l, r LIMIT 1),
t{r} AS MATERIALIZED (
  SELECT word, freq,
         replace(repr, ' ' || b.l || ', ' || b.r || ',',
                 ' ' || b.l || b.r || ',') AS repr
  FROM t{r - 1} CROSS JOIN wb{r} b)"""


def _wp_sym_counts(state: DataFrame) -> DataFrame:
    """(sym, ucnt) frequency-weighted symbol unigram counts over a word
    state — the denominator stage of the WordPiece score."""
    syms = F.filter(F.split("repr", " "), lambda x: x != "")
    return (state.select("freq", F.explode(syms).alias("s"))
            .select("freq", F.expr("rtrim(',', s)").alias("sym"))
            .groupBy("sym").agg(F.sum("freq").alias("ucnt")))


@query("text_wordpiece_train", oracle=f"""
WITH wf AS (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w != '' GROUP BY w),
t0 AS (
  SELECT word, freq,
         ' ' || array_to_string(
           list_transform(range(1, len(word) + 1),
                          i -> word[CAST(i AS INTEGER)] || ','), ' ')
           AS repr
  FROM wf),
{",".join(_wp_round_sql(r) for r in range(1, _WP_ROUNDS + 1))}
{" UNION ALL ".join(
    f"SELECT CAST({r} AS BIGINT) AS round, l AS lhs, r AS rhs, "
    f"CAST(cnt AS BIGINT) AS pair_count, score_e12 FROM wb{r}"
    for r in range(1, _WP_ROUNDS + 1))}
""", eager=True)
def text_wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WORDPIECE TOKENIZER TRAINING (Schuster & Nakajima 2012; Wu et
    al. 2016) — {_WP_ROUNDS} rounds of likelihood-ratio-greedy merges
    producing (round, lhs, rhs, pair_count, score_e12). Completes the
    tokenizer-trainer triple next to text_bpe_merge_train (frequency
    rule) and text_unigram_viterbi_segment (EM pruning): same
    `_bpe_word_state` start state, same `_bpe_pair_counts` counting
    stage, same comma-token greedy merge — only the SELECTION differs:
    argmax of count(l,r)/(count(l)·count(r)), the pair whose merge most
    increases the unigram-LM corpus likelihood.

    Cross-engine exactness: the score is floor(cnt·1e12/(ul·ur)) on an
    integer grid — Spark computes it in DECIMAL(38,0) `DIV`, DuckDB in
    HUGEINT `//`; both are exact integer floor division of the same
    integers, so the argmax (score desc, cnt desc, then lexicographic)
    is engine-identical with no float comparison anywhere.

    EAGER (registry metadata): the selection rule makes each round's
    best pair depend on pair counts AND two unigram lookups over the
    previous state, so an unrolled lazy lineage triples its references
    to the prior state per round (3^rounds plan nodes — measured: the
    6-round lazy form OOMs the PLANNER). The loop therefore runs as the
    scaled-BPE-trainer driver loop: per round one vocabulary-sized
    aggregation job and a 1-ROW collect (model-state-sized driver
    traffic, the S5 budget), merge applied as a literal replace.

    Scale shape (same class as the BPE trainer): the only corpus-wide
    work is the initial word count (one combiner'd shuffle); every
    round's pair and unigram counts run over the WORD-FREQUENCY table
    (vocabulary-sized model state) and the chosen pair folds back as a
    collected literal. At 100 TB the rounds never touch the corpus
    again. Reference scope: the reference has no text pipeline
    (SURVEY §2.5); this is a declared extension."""
    docs = load_parallel(spark, sf_dir, "documents")
    merges, _ = _wp_train(docs)
    return spark.createDataFrame(
        merges, "round bigint, lhs string, rhs string, "
                "pair_count bigint, score_e12 bigint")


def _wp_train(docs: DataFrame) -> tuple[list[tuple], DataFrame]:
    """The WordPiece driver loop, factored (the _bpe_train_scaled
    convention) so the bake-off can reuse the IDENTICAL trainer and
    read the final word state: returns (merge list, final state)."""
    state = _bpe_word_state(docs).localCheckpoint(eager=False)
    merges: list[tuple] = []
    for rnd in range(1, _WP_ROUNDS + 1):
        ug = _wp_sym_counts(state)
        scored = (_bpe_pair_counts(state)
                  .join(F.broadcast(ug.select(F.col("sym").alias("l"),
                                              F.col("ucnt").alias("ul"))),
                        "l")
                  .join(F.broadcast(ug.select(F.col("sym").alias("r"),
                                              F.col("ucnt").alias("ur"))),
                        "r")
                  .withColumn("score_e12", F.expr(
                      f"CAST((CAST(cnt AS DECIMAL(38,0)) * {_WP_SCORE_E12})"
                      " DIV (CAST(ul AS DECIMAL(38,0)) * ur) AS BIGINT)")))
        rows = (scored.orderBy(F.desc("score_e12"), F.desc("cnt"),
                               F.asc("l"), F.asc("r")).limit(1).collect())
        if not rows:
            break  # no adjacent pair left; oracle's wb{r} is empty too
        lhs, rhs = rows[0]["l"], rows[0]["r"]
        merges.append((rnd, lhs, rhs, int(rows[0]["cnt"]),
                       int(rows[0]["score_e12"])))
        state = state.select(
            "word", "freq",
            F.replace(F.col("repr"),
                      F.lit(f" {lhs}, {rhs},"),
                      F.lit(f" {lhs}{rhs},")).alias("repr")
        ).localCheckpoint(eager=False)
    return merges, state


def _bleu_oracle() -> str:
    # Worker-side import order (the multimodal _ssim_oracle lesson): a
    # worker unpickling any text.py pandas UDF imports this module
    # standalone, so the producer must register before this decoration-
    # time lookup runs.
    from . import dedup  # noqa: F401

    from ..registry import ORACLE_SQL
    return f"""
WITH pairs AS ({ORACLE_SQL["dedup_minhash_lsh"]}),
bdocs AS MATERIALIZED (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ws
  FROM documents),
uni AS MATERIALIZED (
  SELECT doc_id, ws[CAST(i AS INTEGER)] AS g, count(*) AS c
  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM bdocs)
  GROUP BY 1, 2),
bi AS MATERIALIZED (
  SELECT doc_id,
         ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i AS INTEGER) + 1] AS g,
         count(*) AS c
  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM bdocs)
  GROUP BY 1, 2),
lens AS MATERIALIZED (SELECT doc_id, len(ws) AS n FROM bdocs),
m1 AS (
  SELECT p.doc_a, p.doc_b, sum(least(ca.c, cb.c)) AS m
  FROM pairs p
  JOIN uni cb ON cb.doc_id = p.doc_b
  JOIN uni ca ON ca.doc_id = p.doc_a AND ca.g = cb.g
  GROUP BY 1, 2),
m2 AS (
  SELECT p.doc_a, p.doc_b, sum(least(ca.c, cb.c)) AS m
  FROM pairs p
  JOIN bi cb ON cb.doc_id = p.doc_b
  JOIN bi ca ON ca.doc_id = p.doc_a AND ca.g = cb.g
  GROUP BY 1, 2)
SELECT p.doc_a, p.doc_b,
       CAST(la.n AS BIGINT) AS ref_len,
       CAST(lb.n AS BIGINT) AS cand_len,
       CAST(coalesce(m1.m, 0) AS BIGINT) AS match1,
       CAST(lb.n AS BIGINT) AS total1,
       CAST(coalesce(m2.m, 0) AS BIGINT) AS match2,
       CAST(lb.n - 1 AS BIGINT) AS total2,
       round(CASE WHEN coalesce(m1.m, 0) = 0 OR coalesce(m2.m, 0) = 0
                  THEN 0.0
                  ELSE (CASE WHEN lb.n < la.n
                             THEN exp(1 - la.n * 1.0 / lb.n)
                             ELSE 1.0 END)
                       * sqrt((m1.m * 1.0 / lb.n)
                              * (m2.m * 1.0 / (lb.n - 1)))
             END, 6) AS bleu2
FROM pairs p
JOIN lens la ON la.doc_id = p.doc_a
JOIN lens lb ON lb.doc_id = p.doc_b
LEFT JOIN m1 ON m1.doc_a = p.doc_a AND m1.doc_b = p.doc_b
LEFT JOIN m2 ON m2.doc_a = p.doc_a AND m2.doc_b = p.doc_b
"""


@query("text_bleu_pairs", oracle=_bleu_oracle())
def text_bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-2 (Papineni et al. 2002) between near-duplicate CANDIDATE
    pairs — the MT-style overlap metric applied where production
    pipelines actually use it at corpus scale: VERIFYING minhash-LSH
    candidates with an order-sensitive score (Jaccard sees bags of
    shingles; BLEU's clipped n-gram precision + brevity penalty
    punishes reordering and truncation, separating true near-dups from
    bag-of-words coincidences). Built BY COMPOSITION on
    dedup_minhash_lsh's registered candidate pairs (callable on the
    Spark side, registered oracle SQL embedded as the pairs CTE).

    Per pair (a = reference, b = candidate): clipped modified
    precisions p_n = sum_g min(cnt_b(g), cnt_a(g)) / |ngrams(b)| for
    n = 1, 2 — EXACT INTEGERS, all emitted (match/total columns) so
    the metric core is integer-verified; bleu2 = BP *
    sqrt(p1 * p2) with BP = exp(1 - ref_len/cand_len) when the
    candidate is shorter, as the display column (identical doubles
    from identical ints; zero if either precision is zero, which also
    guards the single-token total2 = 0 edge).

    Scale shape: candidate-pair-sized work — the n-gram count frames
    are one corpus scan each (combiner'd), the clipped-match joins
    touch only pair x shared-gram rows (LSH-bounded, never all-pairs).
    Reference scope: no text surface in the reference (SURVEY §2.5);
    declared extension."""
    from .dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    docs = load_parallel(spark, sf_dir, "documents")
    bdocs = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != "").alias("ws"))
    uni = (bdocs.select("doc_id", F.explode("ws").alias("g"))
           .groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c")))
    # size < 2 guard: Spark's sequence(1, -1) DESCENDS (vs DuckDB's
    # empty range) and element_at then faults on the empty array — the
    # _bpe_pair_counts lesson
    bigrams = (F.when(F.size("ws") >= 2, F.expr(
                   "transform(sequence(1, size(ws) - 1), "
                   "i -> concat(element_at(ws, i), ' ', "
                   "element_at(ws, i + 1)))"))
               .otherwise(F.expr("cast(array() as array<string>)")))
    bi = (bdocs.select("doc_id", F.explode(bigrams).alias("g"))
          .groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c")))
    lens = bdocs.select("doc_id", F.size("ws").alias("n"))

    def clipped(grams: DataFrame) -> DataFrame:
        ca = grams.select(F.col("doc_id").alias("doc_a"), "g",
                          F.col("c").alias("c_a"))
        cb = grams.select(F.col("doc_id").alias("doc_b"), "g",
                          F.col("c").alias("c_b"))
        return (pairs.join(cb, "doc_b").join(ca, ["doc_a", "g"])
                .groupBy("doc_a", "doc_b")
                .agg(F.sum(F.least("c_a", "c_b")).alias("m")))
    m1 = clipped(uni).withColumnRenamed("m", "m1")
    m2 = clipped(bi).withColumnRenamed("m", "m2")
    la = lens.select(F.col("doc_id").alias("doc_a"),
                     F.col("n").alias("ref_len"))
    lb = lens.select(F.col("doc_id").alias("doc_b"),
                     F.col("n").alias("cand_len"))
    out = (pairs.join(la, "doc_a").join(lb, "doc_b")
           .join(m1, ["doc_a", "doc_b"], "left")
           .join(m2, ["doc_a", "doc_b"], "left")
           .select("doc_a", "doc_b",
                   F.col("ref_len").cast("bigint").alias("ref_len"),
                   F.col("cand_len").cast("bigint").alias("cand_len"),
                   F.coalesce("m1", F.lit(0)).cast("bigint")
                   .alias("match1"),
                   F.col("cand_len").cast("bigint").alias("total1"),
                   F.coalesce("m2", F.lit(0)).cast("bigint")
                   .alias("match2"),
                   (F.col("cand_len") - 1).cast("bigint").alias("total2")))
    bp = (F.when(F.col("cand_len") < F.col("ref_len"),
                 F.exp(1 - F.col("ref_len") * 1.0 / F.col("cand_len")))
          .otherwise(F.lit(1.0)))
    bleu = (F.when((F.col("match1") == 0) | (F.col("match2") == 0),
                   F.lit(0.0))
            .otherwise(bp * F.sqrt(
                (F.col("match1") * 1.0 / F.col("total1"))
                * (F.col("match2") * 1.0 / F.col("total2")))))
    return out.withColumn("bleu2", F.round(bleu, 6))


def _bakeoff_oracle() -> str:
    from ..registry import ORACLE_SQL
    wf_s0 = """
wf AS (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w != '' GROUP BY w),
{start} AS (
  SELECT word, freq,
         ' ' || array_to_string(
           list_transform(range(1, len(word) + 1),
                          i -> word[CAST(i AS INTEGER)] || ','), ' ')
           AS repr
  FROM wf)"""
    n_toks = ("CAST(len(list_filter(string_split(repr, ' '), "
              "x -> x != '')) AS BIGINT)")
    bpe_chain = (wf_s0.format(start="s0") + ","
                 + ",".join(_bpe_round_sql(r)
                            for r in range(1, _BPE_ROUNDS + 1)))
    wp_chain = (wf_s0.format(start="t0") + ","
                + ",".join(_wp_round_sql(r)
                           for r in range(1, _WP_ROUNDS + 1)))
    branch = """
SELECT '{name}' AS tokenizer,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(freq) AS BIGINT) AS total_freq,
       CAST(sum(freq * n_tokens) AS BIGINT) AS total_tokens,
       CAST((sum(freq * n_tokens) * 1000000) // sum(freq) AS BIGINT)
         AS fertility_micro
FROM {src} HAVING count(*) > 0"""
    return f"""
WITH bpe6 AS MATERIALIZED (
  SELECT word, freq, {n_toks} AS n_tokens
  FROM (WITH {bpe_chain} SELECT word, freq, repr FROM s{_BPE_ROUNDS})
  WHERE len(word) <= {_UNI_MAXLEN}),
wp6 AS MATERIALIZED (
  SELECT word, freq, {n_toks} AS n_tokens
  FROM (WITH {wp_chain} SELECT word, freq, repr FROM t{_WP_ROUNDS})
  WHERE len(word) <= {_UNI_MAXLEN}),
uni6 AS MATERIALIZED (
  SELECT word, freq, n_pieces AS n_tokens
  FROM ({ORACLE_SQL["text_unigram_viterbi_segment"]}))
{branch.format(name="bpe", src="bpe6")}
UNION ALL
{branch.format(name="unigram", src="uni6")}
UNION ALL
{branch.format(name="wordpiece", src="wp6")}
"""


@query("corpus_tokenizer_bakeoff", eager=True, oracle=_bakeoff_oracle())
def corpus_tokenizer_bakeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER BAKE-OFF — the model-selection report a tokenizer
    training job actually ships: all three trainers (BPE frequency
    rule, WordPiece likelihood-ratio rule, unigram-LM Viterbi) run on
    the same corpus at matched budget ({_BPE_ROUNDS} merges / the
    {_UNI_V}-piece unigram vocab), scored by FERTILITY — the
    frequency-weighted tokens-per-word that drives context-window cost
    (Rust et al. 2021's tokenizer-comparison metric). The domain is
    the shared word set (types <= {_UNI_MAXLEN} chars, the unigram
    oracle's bound) so the three rows are directly comparable.

    Built BY COMPOSITION: each branch reuses its trainer's OWN
    machinery — the Spark side calls _bpe_train_states / _wp_train /
    the registered unigram E-step; the oracle embeds the same
    generated round chains and the unigram oracle verbatim (CTE-name
    collisions avoided by scoping each chain in its own WITH
    subquery), so the bake-off can never disagree with the trainers
    the driver verifies individually. Fertility is an exact integer
    micro ratio (floor division of int64 sums).

    Scale shape: three trainer runs over word-type-sized state (each
    flat at 10x, SCALE.md) + one union of three 1-row aggregates.
    Reference scope: no text pipeline in the reference (SURVEY §2.5);
    declared extension."""
    docs = load_parallel(spark, sf_dir, "documents")
    n_toks = F.size(F.filter(F.split("repr", " "),
                             lambda x: x != "")).cast("bigint")

    # The three trainers are INDEPENDENT driver loops (each a sequence
    # of argmax collects over its own word-type state): overlap them in
    # driver threads so one trainer's straggler rounds back-fill cores
    # the others leave idle (guide §2.6) — results are unchanged, each
    # loop is deterministic and touches only its own state.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_bpe = pool.submit(_bpe_train_states, docs)
        f_wp = pool.submit(_wp_train, docs)
        f_uni = pool.submit(text_unigram_viterbi_segment, spark, sf_dir)
        bpe_final, _ = f_bpe.result()
        _, wp_final = f_wp.result()
        uni = f_uni.result()

    def measure(state: DataFrame, name: str) -> DataFrame:
        m = (state.filter(F.length("word") <= _UNI_MAXLEN)
             .select("freq", n_toks.alias("n_tokens")))
        return (m.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_words"),
                    F.sum("freq").cast("bigint").alias("total_freq"),
                    F.sum(F.col("freq") * F.col("n_tokens"))
                    .cast("bigint").alias("total_tokens"))
                .filter(F.col("n_words") > 0)
                .select(F.lit(name).alias("tokenizer"),
                        "n_words", "total_freq", "total_tokens",
                        F.expr("CAST((total_tokens * 1000000) DIV "
                               "total_freq AS BIGINT)")
                        .alias("fertility_micro")))

    uni_m = (uni.agg(
                 F.count(F.lit(1)).cast("bigint").alias("n_words"),
                 F.sum("freq").cast("bigint").alias("total_freq"),
                 F.sum(F.col("freq") * F.col("n_pieces"))
                 .cast("bigint").alias("total_tokens"))
             .filter(F.col("n_words") > 0)
             .select(F.lit("unigram").alias("tokenizer"),
                     "n_words", "total_freq", "total_tokens",
                     F.expr("CAST((total_tokens * 1000000) DIV "
                            "total_freq AS BIGINT)")
                     .alias("fertility_micro")))
    return (measure(bpe_final, "bpe")
            .unionByName(uni_m)
            .unionByName(measure(wp_final, "wordpiece")))
