"""Extra analytics operators: market-basket association rules (and room
for further cross-sell / affinity analytics). Registered via
all_queries._OPTIONAL_MODULES."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query("basket_association_rules", oracle="""
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n
      FROM lineitem),
item AS (SELECT l_partkey, CAST(count(*) AS DOUBLE) AS c
         FROM baskets GROUP BY l_partkey),
pair AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS c
         FROM baskets a
         JOIN baskets b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
         GROUP BY a.l_partkey, b.l_partkey
         HAVING count(*) >= 2),
scored AS (
  SELECT pa, pb, pair.c AS n_both,
         round(pair.c / n.n, 9) AS support,
         round(pair.c / ia.c, 6) AS confidence,
         round((pair.c * n.n) / (ia.c * ib.c), 4) AS lift
  FROM pair
  JOIN item ia ON ia.l_partkey = pa
  JOIN item ib ON ib.l_partkey = pb
  CROSS JOIN n
)
SELECT pa, pb, n_both, support, confidence, lift
FROM (SELECT *, row_number() OVER (ORDER BY lift DESC, pa, pb) AS rn
      FROM scored)
WHERE rn <= 50
""")
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (orders = baskets, parts = items):
    co-occurrence counts from a basket SELF-equi-join on the order key
    (pair space is per-basket, Σ|basket|² — never the item cross
    product), min-support pruning in the HAVING, then support /
    confidence / lift from the pair and single-item counts. Top-50 by
    lift on the ROUNDED score with id tiebreaks so both engines cut the
    same set. At 100 TB: the self-join shuffles once on orderkey;
    item counts broadcast; the cross-joined total is a 1-row literal
    (scalar subquery), not a join."""
    li = load(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    n = float(li.select("l_orderkey").distinct().count())
    item = (baskets.groupBy("l_partkey")
            .agg(F.count(F.lit(1)).cast("double").alias("ic")))
    a = baskets.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = baskets.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pair = (a.join(b, "l_orderkey").filter(F.col("pa") < F.col("pb"))
            .groupBy("pa", "pb").agg(F.count(F.lit(1)).alias("n_both"))
            .filter(F.col("n_both") >= 2))
    scored = (pair
              .join(F.broadcast(item.withColumnRenamed("l_partkey", "pa")
                                .withColumnRenamed("ic", "ca")), "pa")
              .join(F.broadcast(item.withColumnRenamed("l_partkey", "pb")
                                .withColumnRenamed("ic", "cb")), "pb")
              .select("pa", "pb", "n_both",
                      F.round(F.col("n_both") / F.lit(n), 9).alias("support"),
                      F.round(F.col("n_both") / F.col("ca"), 6)
                      .alias("confidence"),
                      F.round(F.col("n_both") * F.lit(n)
                              / (F.col("ca") * F.col("cb")), 4)
                      .alias("lift")))
    # TakeOrderedAndProject (per-partition heaps), not a global window —
    # the candidate set is pair-count-sized here, but the heap form costs
    # nothing and survives any pair-count growth
    return scored.orderBy(F.desc("lift"), "pa", "pb").limit(50)


@query("events_anomaly_mad", oracle="""
WITH med AS (SELECT event_type, median(value) AS m
             FROM events GROUP BY event_type),
j AS (SELECT e.event_type, e.value, med.m
      FROM events e JOIN med USING (event_type)),
stats AS (SELECT event_type, any_value(m) AS m,
                 median(abs(value - m)) AS mad,
                 count(*) AS n
          FROM j GROUP BY event_type)
SELECT j.event_type,
       CAST(any_value(stats.n) AS BIGINT) AS n,
       round(any_value(stats.m), 6) AS med,
       round(any_value(stats.mad), 6) AS mad,
       CAST(sum(CASE WHEN abs(j.value - stats.m) > 3 * 1.4826 * stats.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM j JOIN stats USING (event_type)
GROUP BY j.event_type
""")
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly counting per event type via median absolute
    deviation: a value is anomalous when |v - median| exceeds 3 robust
    standard deviations (MAD x 1.4826 — the consistency constant that
    makes MAD estimate sigma under normality). Median/MAD resist the
    heavy tails that wreck mean/stddev z-scores on operational metrics.

    Two passes by construction (a threshold derived from an aggregate
    cannot be applied inside the same aggregate): pass 1 computes
    median then MAD per type; pass 2 re-scans with the (5-row) stats
    table broadcast and counts exceedances.

    Scale shape: two type-keyed grouped EXACT medians plus one broadcast
    join back onto the stream. At 100 TB swap median for
    percentile_approx at the same plan — sketch_quantiles demonstrates
    that form and its error bound."""
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("m"))
    j = ev.join(F.broadcast(med), "event_type")
    dev = F.abs(F.col("value") - F.col("m"))
    stats = (j.groupBy("event_type")
             .agg(F.first("m").alias("m"),
                  F.median(dev).alias("mad"),
                  F.count(F.lit(1)).cast("bigint").alias("n")))
    j2 = ev.join(F.broadcast(stats), "event_type")
    dev2 = F.abs(F.col("value") - F.col("m"))
    return (j2.groupBy("event_type")
            .agg(F.first("n").alias("n"),
                 F.round(F.first("m"), 6).alias("med"),
                 F.round(F.first("mad"), 6).alias("mad"),
                 F.sum(F.when(dev2 > 3 * 1.4826 * F.col("mad"), 1)
                       .otherwise(0)).cast("bigint").alias("n_anomalies")))


@query("timeseries_ohlc_resample", oracle="""
WITH b AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
         value, ts, event_id
  FROM events
),
r AS (
  SELECT event_type, bucket, value,
         row_number() OVER (PARTITION BY event_type, bucket
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, bucket
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM b
)
SELECT event_type, bucket,
       round(max(CASE WHEN rn_a = 1 THEN value END), 6) AS open,
       round(max(value), 6) AS high,
       round(min(value), 6) AS low,
       round(max(CASE WHEN rn_d = 1 THEN value END), 6) AS close,
       CAST(count(*) AS BIGINT) AS n_ticks
FROM r GROUP BY event_type, bucket
""")
def timeseries_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample the event stream to hourly OHLC bars per event type —
    the canonical time-series resampling shape (metrics rollups, market
    bars, sensor decimation). Open/close need an ORDER inside each
    bucket; events can share a timestamp, so the order closes over
    (ts, event_id) — the lesson the regenerated-data round taught
    window_running_sum (duplicate keys make bare ts ordering
    nondeterministic). Bucket is emitted as an ISO string: timestamps
    hash engine-stably as text, not as native temporal types.

    Scale shape: one window pass partitioned by (type, hour) — keys are
    time-bounded so state per partition is an hour of one type, the
    partitioning every streaming OHLC job uses — then a grouped
    aggregate on the same key (no extra exchange: the window already
    hash-partitioned on it)."""
    ev = load(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
        .alias("bucket"),
        "value", "ts", "event_id")
    wa = W.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    wd = W.partitionBy("event_type", "bucket").orderBy(
        F.desc("ts"), F.desc("event_id"))
    r = (b.withColumn("rn_a", F.row_number().over(wa))
         .withColumn("rn_d", F.row_number().over(wd)))
    return (r.groupBy("event_type", "bucket")
            .agg(F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 6)
                 .alias("open"),
                 F.round(F.max("value"), 6).alias("high"),
                 F.round(F.min("value"), 6).alias("low"),
                 F.round(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 6)
                 .alias("close"),
                 F.count(F.lit(1)).cast("bigint").alias("n_ticks")))


@query("agg_mode_exact", oracle="""
WITH c AS (SELECT event_type, user_id, count(*) AS n
           FROM events GROUP BY event_type, user_id),
r AS (SELECT event_type, user_id, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n DESC, user_id) AS rn
      FROM c)
SELECT event_type,
       user_id AS mode_user,
       CAST(n AS BIGINT) AS n_events
FROM r WHERE rn = 1
""")
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode (most frequent user per event type) with a
    deterministic smallest-id tiebreak — built from count + row_number
    rather than the MODE() aggregate, whose tie behavior is
    engine-defined (Spark picks arbitrarily; a hash-checked result needs
    the explicit ORDER BY n DESC, user_id).

    Scale shape: the classic two-level heavy-hitter plan — one
    (group, value)-keyed partial-aggregated count, then a per-group
    top-1 window over the (much smaller) count table. The approximate
    twin at extreme cardinality is sketch_cms_heavy_hitters."""
    from pyspark.sql import Window as W2

    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    w = W2.partitionBy("event_type").orderBy(F.desc("n"), F.asc("user_id"))
    return (c.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("event_type", F.col("user_id").alias("mode_user"),
                    F.col("n").cast("bigint").alias("n_events")))


@query("not_in_null_semantics", oracle="""
WITH probe AS (
  SELECT c_custkey, nullif(c_nationkey, 13) AS nk, c_acctbal
  FROM customer
),
sub AS (SELECT DISTINCT nullif(n_nationkey, 19) AS nk FROM nation
        WHERE n_nationkey >= 15)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM probe
   WHERE nk NOT IN (SELECT nk FROM sub)) AS not_in_with_null,
  (SELECT CAST(count(*) AS BIGINT) FROM probe p
   WHERE NOT EXISTS (SELECT 1 FROM sub s WHERE s.nk = p.nk))
    AS not_exists_count,
  (SELECT CAST(count(*) AS BIGINT) FROM probe
   WHERE nk NOT IN (SELECT nk FROM sub WHERE nk IS NOT NULL))
    AS not_in_null_filtered
""")
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN vs NOT EXISTS null-semantics trap, pinned as a query:
    with a NULL in the subquery, `x NOT IN (...)` is never TRUE (three-
    valued logic turns every comparison UNKNOWN), while NOT EXISTS with
    an equality predicate treats NULL as simply non-matching — so the
    three counts differ, and an engine that 'optimizes' NOT IN into an
    anti join without the null guard silently corrupts results. Spark
    plans the correct form as NullAwareAntiJoin; the null-filtered
    variant relaxes back to a plain anti join. Same SQL text runs on
    both engines (SQL API surface, like agg_grouping_sets).

    Scale shape: null-aware anti join needs the null check on both
    sides — Spark's single-column NAAJ builds the subquery side as a
    broadcast set; the null-filtered rewrite is the scalable form when
    the subquery side is large."""
    from ..tables import load as _load
    for t in ("customer", "nation"):
        _load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("""
WITH probe AS (
  SELECT c_custkey, nullif(c_nationkey, 13) AS nk, c_acctbal
  FROM customer
),
sub AS (SELECT DISTINCT nullif(n_nationkey, 19) AS nk FROM nation
        WHERE n_nationkey >= 15)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM probe
   WHERE nk NOT IN (SELECT nk FROM sub)) AS not_in_with_null,
  (SELECT CAST(count(*) AS BIGINT) FROM probe p
   WHERE NOT EXISTS (SELECT 1 FROM sub s WHERE s.nk = p.nk))
    AS not_exists_count,
  (SELECT CAST(count(*) AS BIGINT) FROM probe
   WHERE nk NOT IN (SELECT nk FROM sub WHERE nk IS NOT NULL))
    AS not_in_null_filtered
""")


@query("histogram_equi_depth", oracle="""
WITH r AS (
  SELECT value,
         ntile(10) OVER (ORDER BY value, event_id) AS bucket
  FROM events
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(min(value), 4) AS lo,
       round(max(value), 4) AS hi
FROM r GROUP BY bucket
""")
def histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (quantile) binning — the feature-engineering twin
    of histogram_equi_width: 10 buckets holding equal row counts, bucket
    edges falling wherever the data is dense. ntile's remainder rule
    (first buckets get the extra row) is identical on both engines, and
    the (value, event_id) tiebreak makes the global order — and thus
    every bucket boundary — deterministic.

    Declared test-SF form: ntile needs a TOTAL order (one range-
    partitioned sort). The 100 TB path swaps in approx_percentile edges
    + a narrow CASE bucketing scan (the sketch_quantiles /
    text_quality_filter_approx pattern); the exact form stays as the
    ground-truth twin, same policy as the exact dedup baselines."""
    events = load(spark, sf_dir, "events")
    b = F.ntile(10).over(W.orderBy("value", "event_id"))
    return (events.select("value", b.cast("bigint").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.min("value"), 4).alias("lo"),
                 F.round(F.max("value"), 4).alias("hi")))


@query("feature_target_encode_loo", oracle="""
WITH s AS (
  SELECT event_id, event_type, value,
         sum(value) OVER (PARTITION BY event_type) AS sv,
         count(*) OVER (PARTITION BY event_type) AS cv
  FROM events
)
SELECT event_id, event_type,
       round(CASE WHEN cv > 1 THEN (sv - value) / (cv - 1) END, 6)
         AS te
FROM s
""")
def feature_target_encode_loo(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding: each row's categorical feature is
    replaced by the mean target of its OWN category computed WITHOUT the
    row itself — (sum - x) / (n - 1) — the standard leakage guard that
    makes target encoding usable for training. Singleton categories
    yield NULL (no leave-one-out mean exists).

    One keyed window (partition by category, no ordering — a full-frame
    aggregate, so no sort is even needed) carries category-sized sums;
    at 100 TB this is the two-pass form: a categories x 2 aggregate
    broadcast back over a narrow scan — Catalyst's window-over-
    unordered-partition already executes it that way."""
    events = load(spark, sf_dir, "events")
    w = W.partitionBy("event_type")
    sv, cv = F.sum("value").over(w), F.count(F.lit(1)).over(w)
    te = F.when(cv > 1, (sv - F.col("value")) / (cv - 1))
    return events.select("event_id", "event_type",
                         F.round(te, 6).alias("te"))


_FH_BUCKETS = 32


@query("feature_hashing_trick", oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
  FROM documents
)
SELECT doc_id,
       CAST(('0x' || substr(md5(word), 1, 8))::BIGINT % {_FH_BUCKETS}
            AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM tok WHERE word <> ''
GROUP BY doc_id, ('0x' || substr(md5(word), 1, 8))::BIGINT % {_FH_BUCKETS}
""")
def feature_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (HashingTF's semantics, relationally): words
    map to a fixed 32-bucket feature space via the engine-portable
    md5-prefix hash (the same det_hash64 the minhash family uses —
    Spark's native xxhash64 would diverge from any other engine), and
    per-doc bucket counts form the sparse feature vector. No vocabulary
    pass, no vocabulary state — the property that lets featurization run
    in one streaming-compatible map over 100 TB, with the single shuffle
    carrying (doc, bucket) partial counts (bounded by docs x buckets,
    not docs x vocab)."""
    from ..functions.vector import det_hash64
    from ..tables import load_parallel

    docs = load_parallel(spark, sf_dir, "documents")
    tok = (docs.select("doc_id",
                       F.explode(F.split(F.lower(F.col("text")), " "))
                       .alias("word"))
           .filter(F.col("word") != ""))
    return (tok.select("doc_id",
                       (det_hash64(F.col("word")) % _FH_BUCKETS)
                       .cast("bigint").alias("bucket"))
            .groupBy("doc_id", "bucket")
            .agg(F.count(F.lit(1)).alias("n")))


@query("events_markov_transitions", oracle="""
WITH s AS (
  SELECT user_id, event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
),
c AS (SELECT cur, nxt, count(*) AS n FROM s
      WHERE nxt IS NOT NULL GROUP BY cur, nxt)
SELECT cur, nxt, CAST(n AS BIGINT) AS n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY cur), 6) AS p
FROM c
""")
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the per-user event
    stream: P(next event type | current event type) — the behavioral
    fingerprint table behind session-intent models and anomaly scoring
    (a transition that almost never happens is the outlier signal).

    Each user's stream is ordered by (ts, event_id) — the deterministic
    total order every window query in this engine uses — and the
    successor is one lead() in a USER-KEYED window: one shuffle on
    user_id, each partition streamed in order. The transition counts
    then collapse to a |types|^2 table, and the per-row normalization
    window runs over that tiny table, never the event stream. At 100 TB
    the only data-sized stage is the keyed window; the rest is
    vocabulary-sized."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(F.col("event_type").alias("cur"),
                  F.lead("event_type").over(w).alias("nxt"))
    c = (s.filter(F.col("nxt").isNotNull())
         .groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n")))
    tot = F.sum("n").over(W.partitionBy("cur"))
    return c.select("cur", "nxt", "n",
                    F.round(F.col("n") * 1.0 / tot, 6).alias("p"))


_RFM_TILES = 4


@query("events_rfm_segmentation", oracle=f"""
WITH mx AS (SELECT max(ts) AS now FROM events),
u AS (
  SELECT user_id,
         date_diff('day', max(ts), mx.now) AS rec_days,
         count(*) AS freq,
         sum(CAST(value AS DECIMAL(18,2))) AS mon
  FROM events, mx GROUP BY user_id, mx.now
),
scored AS (
  SELECT user_id,
         ntile({_RFM_TILES}) OVER (ORDER BY rec_days ASC, user_id) AS r,
         ntile({_RFM_TILES}) OVER (ORDER BY freq DESC, user_id) AS f,
         ntile({_RFM_TILES}) OVER (ORDER BY mon DESC, user_id) AS m,
         mon
  FROM u
)
SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
       CAST(m AS BIGINT) AS m,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(mon) AS DOUBLE) AS sum_monetary
FROM scored GROUP BY r, f, m
""")
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quartile scores for Recency (days since last
    event, lower is better), Frequency (event count), and Monetary
    (exact decimal value sum), then user counts and mean spend per
    (r, f, m) cell — the classic CRM segmentation grid.

    Monetary sums ride DECIMAL(18,2) (the engine's money convention) so
    the quartile ORDER BY keys are exact on both engines; every ntile
    runs over a total order (metric + user_id tiebreak), so tile
    boundaries cannot drift. The three ntile windows are GLOBAL by
    definition (a quartile is a statement about all users) — they run
    on the per-user summary (user-dimension-sized, not event-sized);
    at 100 TB that summary still fits a range-partitioned sort, and the
    equi-depth-histogram decomposition (histogram_equi_depth's
    approx-percentile scale twin) applies if even that is too wide."""
    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts")).first()[0]
    u = (ev.groupBy("user_id")
         .agg(F.datediff(F.lit(mx), F.max("ts")).alias("rec_days"),
              F.count(F.lit(1)).alias("freq"),
              F.sum(F.col("value").cast("decimal(18,2)")).alias("mon")))
    scored = u.select(
        "user_id", "mon",
        F.ntile(_RFM_TILES).over(W.orderBy(F.asc("rec_days"), "user_id"))
        .cast("bigint").alias("r"),
        F.ntile(_RFM_TILES).over(W.orderBy(F.desc("freq"), "user_id"))
        .cast("bigint").alias("f"),
        F.ntile(_RFM_TILES).over(W.orderBy(F.desc("mon"), "user_id"))
        .cast("bigint").alias("m"))
    return (scored.groupBy("r", "f", "m")
            .agg(F.count(F.lit(1)).alias("n_users"),
                 F.sum("mon").cast("double").alias("sum_monetary")))


@query("timeseries_twap", oracle="""
WITH s AS (
  SELECT user_id, ts, value,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nts
  FROM events
),
w AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(date_diff('microsecond', ts, nts) AS BIGINT) AS dur_us
  FROM s WHERE nts IS NOT NULL
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(dur_us) AS BIGINT) AS span_us,
       round(sum(cents * dur_us) / (100.0 * sum(dur_us)), 6) AS twap
FROM w GROUP BY user_id
""")
def timeseries_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price/value (TWAP) per user: each reading
    is weighted by how long it remained current (the duration to the
    next reading), so irregular sampling cannot bias the mean toward
    burst periods — the standard financial/telemetry aggregate that a
    plain avg() gets wrong on event streams.

    One lead() in the user-keyed (ts, event_id) window gives each
    reading its holding duration as an exact integer microsecond count,
    values snap to integer cents, and the weighted sum is pure bigint
    arithmetic (max ~1e17, far under the 2^63 line) with ONE float
    division at the end — bit-stable across engines regardless of
    summation order. At 100 TB: one user-keyed shuffle, one keyed
    aggregate — the window_session cost shape."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.withColumn("nts", F.lead("ts").over(w)).select(
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.expr("timestampdiff(MICROSECOND, ts, nts)").alias("dur_us"))
    wd = s.filter(F.col("dur_us").isNotNull())
    return (wd.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_intervals"),
                 F.sum("dur_us").cast("bigint").alias("span_us"),
                 F.round(F.sum(F.col("cents") * F.col("dur_us"))
                         / (100.0 * F.sum("dur_us")), 6).alias("twap")))


_Z_WIN = 10    # trailing window size (rows, current inclusive)
_Z_K = 3.0     # flag threshold in standard deviations


@query("events_rolling_zscore", oracle=f"""
WITH s AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
w AS (
  SELECT user_id, cents,
         sum(cents) OVER wnd AS sx,
         sum(cents * cents) OVER wnd AS sxx,
         count(*) OVER wnd AS n
  FROM s
  WINDOW wnd AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN {_Z_WIN - 1} PRECEDING AND CURRENT ROW)
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_scored,
       CAST(sum(CASE WHEN abs(n * cents - sx)
                          > {_Z_K} * sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM w WHERE n = {_Z_WIN}
GROUP BY user_id
""")
def events_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly counts: each event is scored against the
    mean/std of its own trailing 10-reading window (current
    inclusive) and flagged beyond 3 sigma — the self-calibrating
    streaming-anomaly rule (a fixed threshold can't follow per-user
    level shifts; the MAD variant is events_anomaly_mad).

    The comparison is rearranged to integer form: |n*x - sx| >
    k*sqrt(n*sxx - sx^2), where x, sx, sxx are exact bigint cents
    sums — the ONLY float op is one correctly-rounded sqrt and one
    multiply, so the flag verdict cannot differ between engines no
    matter how the window sums associate. One user-keyed window with a
    bounded ROWS frame (constant state per user), one keyed aggregate:
    window_session's scale shape."""
    ev = load(spark, sf_dir, "events")
    s = ev.select("user_id", "ts", "event_id",
                  F.round(F.col("value") * 100).cast("bigint").alias("cents"))
    wnd = (W.partitionBy("user_id").orderBy("ts", "event_id")
           .rowsBetween(-(_Z_WIN - 1), W.currentRow))
    w = s.select(
        "user_id", "cents",
        F.sum("cents").over(wnd).alias("sx"),
        F.sum(F.col("cents") * F.col("cents")).over(wnd).alias("sxx"),
        F.count(F.lit(1)).over(wnd).alias("n"))
    flagged = F.when(
        F.abs(F.col("n") * F.col("cents") - F.col("sx"))
        > _Z_K * F.sqrt((F.col("n") * F.col("sxx")
                         - F.col("sx") * F.col("sx")).cast("double")),
        1).otherwise(0)
    return (w.filter(F.col("n") == _Z_WIN)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_scored"),
                 F.sum(flagged).cast("bigint").alias("n_flagged")))


_SURV_GRID = (0, 1, 2, 4, 7, 14, 21, 28)


@query("events_survival_curve", oracle=f"""
WITH u AS (
  SELECT user_id,
         CAST(date_diff('day', min(ts), max(ts)) AS BIGINT) AS lifetime
  FROM events GROUP BY user_id
),
agg AS (
  SELECT count(*) AS n,
         {", ".join(f"sum(CASE WHEN lifetime >= {d} THEN 1 ELSE 0 END) AS s{d}"
                    for d in _SURV_GRID)}
  FROM u
)
SELECT CAST(d AS BIGINT) AS day,
       CAST(surviving AS BIGINT) AS n_surviving,
       round(surviving * 1.0 / n, 6) AS survival
FROM agg, (VALUES {", ".join(f"({d})" for d in _SURV_GRID)}) g(d),
LATERAL (SELECT CASE d {" ".join(f"WHEN {d} THEN s{d}" for d in _SURV_GRID)}
                END AS surviving) x
""")
def events_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User survival curve: fraction of users whose observed lifetime
    (days between first and last event) reaches each day of a grid —
    the retention/churn table (discrete Kaplan-Meier with no censoring
    model) every growth dashboard carries.

    Same shape as text_vocab_coverage_curve: one user-keyed aggregate,
    then the whole grid folds into a single conditional-aggregation row
    (grid points are columns, not passes) and unpivots via stack. All
    integer day counts until the final division."""
    ev = load(spark, sf_dir, "events")
    u = (ev.groupBy("user_id")
         .agg(F.datediff(F.max("ts"), F.min("ts")).cast("bigint")
              .alias("lifetime")))
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.when(F.col("lifetime") >= d, 1).otherwise(0)).alias(f"s{d}")
        for d in _SURV_GRID]
    one = u.agg(*aggs)
    stack = ", ".join(f"{d}L, s{d}" for d in _SURV_GRID)
    return (one.select(
        F.expr(f"stack({len(_SURV_GRID)}, {stack}) AS (day, surviving)"), "n")
        .select(F.col("day").cast("bigint"),
                F.col("surviving").cast("bigint").alias("n_surviving"),
                F.round(F.col("surviving") * 1.0 / F.col("n"), 6)
                .alias("survival")))


@query("events_power_user_gini", oracle="""
WITH u AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY user_id
),
r AS (
  SELECT c, row_number() OVER (ORDER BY c, user_id) AS i FROM u
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(c) AS BIGINT) AS total_events,
       round(2.0 * sum(i * c) / (count(*) * sum(c))
             - (count(*) + 1.0) / count(*), 6) AS gini
FROM r
""")
def events_power_user_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event counts — the concentration
    diagnostic (how much of the traffic the power users generate) that
    doubles as the SKEW EARLY-WARNING for every user-keyed shuffle in
    this engine: a Gini near 1 says the keyed windows and aggregates
    need the salting/AQE-skew playbook.

    Computed by the exact rank formula G = 2*Σ(i*x_i)/(n*Σx) - (n+1)/n
    over counts ranked ascending with user_id tiebreak — every term an
    integer until the final division, so both engines agree bit-for-bit.
    The ranking window runs over the USER summary (dimension-sized);
    the event scan is one keyed count."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    r = u.select("c", F.row_number().over(
        W.orderBy("c", "user_id")).alias("i"))
    n = F.count(F.lit(1))
    return r.agg(
        n.cast("bigint").alias("n_users"),
        F.sum("c").cast("bigint").alias("total_events"),
        F.round(2.0 * F.sum(F.col("i") * F.col("c")) / (n * F.sum("c"))
                - (n + 1.0) / n, 6).alias("gini"))


@query("agg_winsorized_stats", oracle="""
WITH p AS (SELECT event_type,
                  round(quantile_cont(value, 0.05), 9) AS p05,
                  round(quantile_cont(value, 0.95), 9) AS p95
           FROM events GROUP BY event_type)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(e.value), 6) AS raw_mean,
       round(avg(least(greatest(e.value, p.p05), p.p95)), 6)
         AS winsor_mean,
       round(avg(CASE WHEN e.value >= p.p05 AND e.value <= p.p95
                      THEN e.value END), 6) AS trimmed_mean,
       round(min(p.p05), 6) AS p05, round(min(p.p95), 6) AS p95
FROM events e JOIN p USING (event_type)
GROUP BY e.event_type
""")
def agg_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST aggregation: winsorized mean (values clipped to the
    [p05, p95] percentile band) and trimmed mean (values outside the
    band dropped) per event type, next to the raw mean they stabilize.
    Both engines interpolate percentiles the same way (type-7 linear,
    Spark `percentile` == DuckDB `quantile_cont`); the thresholds are
    rounded to 9 digits BEFORE the clip/trim comparisons so a last-bit
    interpolation difference cannot flip a boundary row between engines.
    Two passes: an exact percentile aggregate per group (5 groups -> one
    combiner'd shuffle; exact percentile buffers per-group values, which
    is fine for bounded group counts — the streaming-scale twin is
    sketch_quantiles' approx_percentile), then a broadcast join of the
    5-row threshold table back onto the stream and a second combiner'd
    keyed aggregate. No window, no skew exposure."""
    ev = load(spark, sf_dir, "events")
    p = (ev.groupBy("event_type")
         .agg(F.round(F.percentile("value", F.lit(0.05)), 9).alias("p05"),
              F.round(F.percentile("value", F.lit(0.95)), 9).alias("p95")))
    j = ev.join(F.broadcast(p), "event_type")
    clipped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    inband = (F.col("value") >= F.col("p05")) & (F.col("value") <= F.col("p95"))
    return (j.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.round(F.avg("value"), 6).alias("raw_mean"),
                 F.round(F.avg(clipped), 6).alias("winsor_mean"),
                 F.round(F.avg(F.when(inband, F.col("value"))), 6)
                  .alias("trimmed_mean"),
                 F.round(F.min("p05"), 6).alias("p05"),
                 F.round(F.min("p95"), 6).alias("p95")))


# Attribution horizon: a purchase credits the user's most recent
# non-purchase touch only if it happened within this many days.
ATTR_HORIZON_DAYS = 7


@query("events_attribution_last_touch", oracle=f"""
WITH seq AS (
  SELECT event_id, user_id, ts, event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS) OVER w AS src_type,
         last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                    IGNORE NULLS) OVER w AS src_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
SELECT coalesce(CASE WHEN src_ts IS NOT NULL
                      AND ts <= src_ts + INTERVAL {ATTR_HORIZON_DAYS} DAY
                     THEN src_type END, 'unattributed') AS src,
       CAST(count(*) AS BIGINT) AS n_purchases,
       round(sum(value), 4) AS attributed_value
FROM seq WHERE event_type = 'purchase'
GROUP BY 1
""")
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH ATTRIBUTION: each purchase credits the same user's most
    recent preceding non-purchase event (click/view/signup/error) within
    a 7-day horizon; purchases with no in-horizon touch fall into an
    explicit 'unattributed' bucket. The carried last-touch is a
    last_value(... IGNORE NULLS) over ROWS UNBOUNDED PRECEDING..1
    PRECEDING — a running carry-forward, NOT an as-of self-join: one
    user-keyed shuffle + per-partition sort, no pair generation (the
    as-of-join spelling of the same semantics is asof_join /
    asof_join_forward). (ts, event_id) ordering is total so the carry is
    deterministic. At 100 TB: user_id is the partition key (uniform
    cardinality, no hot key); the final rollup is a 5-row aggregate."""
    ev = load(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, -1))
    not_p = F.col("event_type") != "purchase"
    seq = ev.select(
        "event_type", "ts", "value",
        F.last(F.when(not_p, F.col("event_type")), ignorenulls=True)
         .over(w).alias("src_type"),
        F.last(F.when(not_p, F.col("ts")), ignorenulls=True)
         .over(w).alias("src_ts"))
    in_horizon = (F.col("src_ts").isNotNull()
                  & (F.col("ts") <= F.col("src_ts")
                     + F.expr(f"INTERVAL {ATTR_HORIZON_DAYS} DAY")))
    return (seq.filter(F.col("event_type") == "purchase")
            .groupBy(F.coalesce(F.when(in_horizon, F.col("src_type")),
                                F.lit("unattributed")).alias("src"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
                 F.round(F.sum("value"), 4).alias("attributed_value")))


@query("events_pattern_match_sequence", oracle="""
WITH seq AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS s
  FROM events GROUP BY user_id)
SELECT user_id,
       CAST(len(s) AS BIGINT) AS n_events,
       CAST(len(regexp_extract_all(s, 'c[ve]*p')) AS BIGINT)
         AS n_click_to_purchase,
       CAST(len(regexp_extract_all(s, 'ee+')) AS BIGINT)
         AS n_error_bursts,
       CAST(len(regexp_extract_all(s, 's[cve]*p')) AS BIGINT)
         AS n_signup_to_purchase
FROM seq
""")
def events_pattern_match_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE PATTERN MATCHING (the MATCH_RECOGNIZE workaround every
    engine without the clause uses): encode each user's event history as
    a string of type initials in (ts, event_id) order, then count regex
    occurrences — click-to-purchase journeys with only views/errors
    between ('c[ve]*p'), error bursts ('ee+'), signup-to-purchase
    ('s[cve]*p'). Regex scanning is greedy and non-overlapping in both
    engines, so counts agree exactly; initials are distinct across the
    5-type domain. The ordered encode is array_sort over (ts, event_id,
    initial) structs — NOT a bare collect_list, whose order is partition
    -dependent. One user-keyed shuffle; the regex pass is a narrow JVM
    stage. At 100 TB: per-user state is the encoded string (~1 byte per
    event); cap or window it per-quarter for unbounded histories — the
    funnel twins (funnel_conversion/funnel_within_time) are the
    join-based spelling that never materializes the sequence."""
    ev = load(spark, sf_dir, "events")
    enc = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    "ts", "event_id",
                    F.substring("event_type", 1, 1).alias("ini")))),
                lambda r: r["ini"]), "").alias("s"))
    return enc.select(
        "user_id",
        F.length("s").cast("bigint").alias("n_events"),
        F.regexp_count("s", F.lit(r"c[ve]*p")).cast("bigint")
         .alias("n_click_to_purchase"),
        F.regexp_count("s", F.lit(r"ee+")).cast("bigint")
         .alias("n_error_bursts"),
        F.regexp_count("s", F.lit(r"s[cve]*p")).cast("bigint")
         .alias("n_signup_to_purchase"))


@query("timeseries_seasonal_decompose", oracle="""
WITH h AS (SELECT date_trunc('hour', ts) AS hts, count(*) AS n,
                  avg(value) AS hm
           FROM events GROUP BY 1),
g AS (SELECT avg(hm) AS om FROM h),
s AS (SELECT extract(hour FROM hts) AS hod, avg(hm) AS sm
      FROM h GROUP BY 1),
t AS (SELECT date_trunc('day', hts) AS d, avg(hm) AS tm
      FROM h GROUP BY 1)
SELECT h.hts AS hour_ts, CAST(h.n AS BIGINT) AS n,
       round(h.hm, 6) AS hourly_mean,
       round(s.sm - g.om, 6) AS seasonal,
       round(t.tm, 6) AS trend,
       round(h.hm - t.tm - (s.sm - g.om), 6) AS resid
FROM h
JOIN s ON extract(hour FROM h.hts) = s.hod
JOIN t ON date_trunc('day', h.hts) = t.d
CROSS JOIN g
""")
def timeseries_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADDITIVE SEASONAL DECOMPOSITION (STL-lite): hourly series split
    into trend (daily mean), seasonality (hour-of-day mean, centered on
    the overall mean), and residual — the classical decomposition
    monitoring pipelines run before alerting on the residual (the MAD /
    rolling-zscore operators' upstream). Means stay UNROUNDED through
    the arithmetic; only outputs round, so both engines subtract
    identical doubles.

    One keyed hourly aggregate, then three TINY grouped means (24-row
    seasonal, days-count trend, 1-row overall) broadcast back onto the
    hourly frame — no windows, no second pass over raw events. At
    100 TB the raw-event aggregate is the only corpus-wide shuffle;
    everything after operates on hours-count rows."""
    ev = load(spark, sf_dir, "events")
    h = (ev.groupBy(F.date_trunc("hour", "ts").alias("hts"))
         .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("hm")))
    g = h.agg(F.avg("hm").alias("om"))
    s = (h.groupBy(F.hour("hts").alias("hod"))
         .agg(F.avg("hm").alias("sm")))
    t = (h.groupBy(F.date_trunc("day", "hts").alias("d"))
         .agg(F.avg("hm").alias("tm")))
    return (h.join(F.broadcast(s), F.hour(h.hts) == s.hod)
            .join(F.broadcast(t), F.date_trunc("day", h.hts) == t.d)
            .crossJoin(F.broadcast(g))
            .select(F.col("hts").alias("hour_ts"),
                    F.col("n").cast("bigint").alias("n"),
                    F.round("hm", 6).alias("hourly_mean"),
                    F.round(F.col("sm") - F.col("om"), 6).alias("seasonal"),
                    F.round("tm", 6).alias("trend"),
                    F.round(F.col("hm") - F.col("tm")
                            - (F.col("sm") - F.col("om")), 6)
                    .alias("resid")))


# LTV decay time constant (days): weight = exp(-age_days / 30).
LTV_TAU_DAYS = 30.0


@query("events_ltv_decayed", oracle=f"""
WITH ref AS (SELECT max(epoch_us(ts)) AS rus FROM events),
p AS (SELECT user_id, value,
             (ref.rus - epoch_us(ts)) / 86400000000.0 AS age_days
      FROM events CROSS JOIN ref
      WHERE event_type = 'purchase')
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_purchases,
       round(sum(value), 4) AS ltv_raw,
       round(sum(value * exp(-age_days / {LTV_TAU_DAYS})), 4)
         AS ltv_decayed
FROM p GROUP BY user_id
""")
def events_ltv_decayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPONENTIALLY-DECAYED lifetime value: each purchase weighted by
    exp(-age/30d) relative to the dataset's newest event — the recency
    weighting CRM scoring uses so a year-old spike stops dominating
    (the step beyond events_rfm_segmentation's hard quartile cut).
    Age is computed in exact epoch micros before the one float divide;
    the reference instant is a 1-row scalar cross-joined in-plan (no
    driver round trip). One combiner'd user-keyed aggregate; the only
    cross-engine float exposure is exp(), whose ulp-level drift
    disappears at round-4 over sums of O(100) terms."""
    ev = load(spark, sf_dir, "events")
    ref = ev.agg(F.max("ts_us").alias("rus"))
    p = (ev.filter(F.col("event_type") == "purchase")
         .crossJoin(F.broadcast(ref))
         .select("user_id", "value",
                 ((F.col("rus") - F.col("ts_us")) / 86400000000.0)
                 .alias("age_days")))
    return (p.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
                 F.round(F.sum("value"), 4).alias("ltv_raw"),
                 F.round(F.sum(F.col("value")
                               * F.exp(-F.col("age_days") / LTV_TAU_DAYS)),
                         4).alias("ltv_decayed")))


@query("events_bot_detection", oracle="""
WITH g AS (
  SELECT user_id, epoch_us(ts)
           - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS gap_us
  FROM events),
m AS (
  SELECT user_id,
         CAST(count(*) + 1 AS BIGINT) AS n_events,
         avg(gap_us) AS mg,
         sqrt(greatest(avg((gap_us * 1.0) * (gap_us * 1.0))
                       - avg(gap_us) * avg(gap_us), 0)) AS sg
  FROM g WHERE gap_us IS NOT NULL
  GROUP BY user_id HAVING count(*) >= 3 AND avg(gap_us) > 0),
c AS (SELECT user_id, n_events,
             round(sg / mg, 6) AS gap_cv FROM m),
thr AS (SELECT round(quantile_cont(gap_cv, 0.1), 9) AS t FROM c)
SELECT c.user_id, c.n_events, c.gap_cv,
       c.gap_cv <= thr.t AS suspected_bot
FROM c CROSS JOIN thr
""")
def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOT / AUTOMATION detection by inter-arrival REGULARITY: humans
    produce bursty (high-variance) event gaps, schedulers produce
    metronomic ones — the coefficient of variation (std/mean of the
    per-user gap sequence) is the classic web-log heuristic, and the
    flag marks the most-regular decile. The corpus-hygiene twin of the
    rate filters: crawl pipelines drop machine traffic before any
    quality scoring sees it.

    Gaps are exact epoch-micro integers from one user-keyed lag window;
    variance uses the one-pass E[X^2]-E[X]^2 form (gap counts are
    bounded per user, catastrophic cancellation is not in play at these
    magnitudes, and the CV rounds to 6 before the threshold compare).
    Users whose gaps all share one timestamp (mean gap = 0) are dropped
    IDENTICALLY in both engines before the division — 0/0 is NaN in
    Spark but NULL in DuckDB, an engine-dependent cell the guard
    removes (and a zero-mean gap sequence is a dedup problem, not a
    bot-regularity signal).
    The decile threshold is a SCALAR SUBQUERY over the per-user frame
    (users-count rows, not events) rounded to 9 digits so an
    interpolation last-bit cannot flip a boundary user between engines.
    At 100 TB: one events-wide shuffle on user_id; everything after is
    user-cardinality."""
    import uuid as _uuid

    ev = load(spark, sf_dir, "events")
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = (ev.select("user_id",
                   (F.col("ts_us") - F.lag("ts_us").over(wl)).alias("gap_us"))
         .filter(F.col("gap_us").isNotNull()))
    m = (g.groupBy("user_id")
         .agg((F.count(F.lit(1)) + 1).cast("bigint").alias("n_events"),
              F.avg("gap_us").alias("mg"),
              F.sqrt(F.greatest(
                  F.avg(F.col("gap_us").cast("double")
                        * F.col("gap_us").cast("double"))
                  - F.avg("gap_us") * F.avg("gap_us"), F.lit(0.0)))
              .alias("sg"))
         .filter((F.col("n_events") >= 4) & (F.col("mg") > 0)))
    c = m.select("user_id", "n_events",
                 F.round(F.col("sg") / F.col("mg"), 6).alias("gap_cv"))
    v = f"hdr_botdetect_{_uuid.uuid4().hex[:8]}"
    c.createOrReplaceTempView(v)
    out = spark.sql(f"""
        SELECT user_id, n_events, gap_cv,
               gap_cv <= (SELECT round(percentile(gap_cv, 0.1), 9)
                          FROM {v}) AS suspected_bot
        FROM {v}""")
    spark.catalog.dropTempView(v)
    return out


@query("agg_hhi_concentration", oracle="""
WITH r AS (
  SELECT s.s_nationkey, l.l_suppkey,
         sum(l.l_extendedprice * (1 - l.l_discount)) AS rev
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY s.s_nationkey, l.l_suppkey),
t AS (SELECT s_nationkey, sum(rev) AS tot,
             CAST(count(*) AS BIGINT) AS n_suppliers
      FROM r GROUP BY s_nationkey)
SELECT n.n_name, t.n_suppliers,
       round(sum((r.rev / t.tot) * (r.rev / t.tot)), 6) AS hhi
FROM r
JOIN t ON t.s_nationkey = r.s_nationkey
JOIN nation n ON n.n_nationkey = r.s_nationkey
GROUP BY n.n_name, t.n_suppliers
""")
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HERFINDAHL-HIRSCHMAN concentration index: per nation, the sum of
    squared supplier revenue shares — the antitrust-style concentration
    metric, and operationally the SHUFFLE-SKEW predictor cousin of
    events_power_user_gini (an HHI near 1 means one supplier key holds
    the partition). Two combiner'd keyed aggregates (supplier revenue,
    then nation totals) + a broadcast of the nations-sized total table;
    shares divide UNROUNDED totals and only the final HHI rounds."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = (li.join(s, li.l_suppkey == s.s_suppkey)
         .groupBy("s_nationkey", "l_suppkey")
         .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
              .alias("rev")))
    t = (r.groupBy("s_nationkey")
         .agg(F.sum("rev").alias("tot"),
              F.count(F.lit(1)).cast("bigint").alias("n_suppliers")))
    share = F.col("rev") / F.col("tot")
    return (r.join(F.broadcast(t), "s_nationkey")
            .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
            .groupBy("n_name", "n_suppliers")
            .agg(F.round(F.sum(share * share), 6).alias("hhi")))


@query("events_dau_wau_mau", oracle="""
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY d),
wau AS (SELECT a.d, CAST(count(DISTINCT b.user_id) AS BIGINT) AS wau
        FROM dau a JOIN du b ON b.d BETWEEN a.d - 6 AND a.d
        GROUP BY a.d),
mau AS (SELECT a.d, CAST(count(DISTINCT b.user_id) AS BIGINT) AS mau
        FROM dau a JOIN du b ON b.d BETWEEN a.d - 29 AND a.d
        GROUP BY a.d)
SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau.dau, wau.wau, mau.mau,
       round(dau.dau * 1.0 / wau.wau, 6) AS stickiness
FROM dau JOIN wau ON wau.d = dau.d JOIN mau ON mau.d = dau.d
""")
def events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU active-user counts with the DAU/WAU stickiness
    ratio — the product-analytics staple. Spark cannot COUNT(DISTINCT)
    over a window frame, and the obvious day-grid range join is
    non-equi; instead each (day, user) activity row EXPLODES into the
    7/30 future report days it supports, turning both trailing
    distinct counts into plain combiner'd equi-aggregations — the
    scale-correct shape (30x row multiply of the tiny user-day frame,
    zero non-equi joins; the oracle spells the same semantics as a
    range join over the day dimension). Report days are restricted to
    observed activity days by joining back onto the DAU frame.
    At 100 TB the user-day distinct frame is the only events-wide
    shuffle; everything after is (days x users) sized."""
    ev = load(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    dau = (du.groupBy("d")
           .agg(F.count(F.lit(1)).cast("bigint").alias("dau")))
    def _trailing(n_days: int, alias: str) -> DataFrame:
        exp = du.select(
            F.explode(F.expr(
                f"sequence(d, date_add(d, {n_days - 1}), interval 1 day)"))
            .alias("td"), "user_id")
        return (exp.groupBy("td")
                .agg(F.count_distinct("user_id").cast("bigint")
                     .alias(alias)))
    wau = _trailing(7, "wau")
    mau = _trailing(30, "mau")
    return (dau.join(wau, dau.d == wau.td)
            .join(mau, dau.d == mau.td)
            .select(F.date_format(dau.d, "yyyy-MM-dd").alias("day"),
                    "dau", "wau", "mau",
                    F.round(F.col("dau") * 1.0 / F.col("wau"), 6)
                    .alias("stickiness")))


# Hampel filter geometry: +-HAMPEL_HALF-row frame, k * 1.4826 * MAD fence.
HAMPEL_HALF, HAMPEL_K = 10, 3.0


@query("window_outlier_hampel", oracle=f"""
WITH med AS (
  SELECT event_id, event_type, value,
         quantile_cont(value, 0.5) OVER w AS med
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN {HAMPEL_HALF} PRECEDING
                        AND {HAMPEL_HALF} FOLLOWING)),
mad AS (
  SELECT event_id, event_type, value, med,
         quantile_cont(abs(value - med), 0.5) OVER w AS mad
  FROM med
  WINDOW w AS (PARTITION BY event_type ORDER BY med, event_id
               ROWS BETWEEN {HAMPEL_HALF} PRECEDING
                        AND {HAMPEL_HALF} FOLLOWING))
SELECT event_id, event_type, value,
       round(med, 6) AS med, round(mad, 6) AS mad,
       round(abs(value - med), 9)
         > round({HAMPEL_K} * 1.4826 * mad, 9) AS is_outlier
FROM mad
""")
def window_outlier_hampel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAMPEL FILTER (rolling-median outlier detection): each point is
    fenced at k * 1.4826 * rolling-MAD around its +-10-row rolling
    median — the robust despiking filter sensor/metrics pipelines
    prefer over z-scores (one spike cannot drag its own threshold).
    This is the standard two-pass SQL variant: pass 1 computes each
    point's rolling median; pass 2 takes a rolling median of the
    |value - own-median| deviations (the exact Hampel recomputes
    deviations against the CENTER's median per frame, which no frame-
    aggregate can express; the two-pass variant is the documented,
    deterministic stand-in and both engines compute it identically).
    Both fence sides round to 9 digits before comparison so holistic-
    aggregate interpolation bit-drift cannot flip a boundary point.

    Two event_type-keyed window passes (the second re-sorts by the
    pass-1 median — any deterministic total order works, it only fixes
    the frame contents); holistic median aggregates buffer one frame
    (21 rows) per position. At 100 TB: same single-key shuffle as every
    windows-family operator; frames never cross partition keys."""
    ev = load(spark, sf_dir, "events")
    w1 = (W.partitionBy("event_type").orderBy("ts", "event_id")
          .rowsBetween(-HAMPEL_HALF, HAMPEL_HALF))
    med = ev.select(
        "event_id", "event_type", "value",
        F.percentile("value", F.lit(0.5)).over(w1).alias("med"))
    w2 = (W.partitionBy("event_type").orderBy("med", "event_id")
          .rowsBetween(-HAMPEL_HALF, HAMPEL_HALF))
    mad = med.withColumn(
        "mad",
        F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5))
         .over(w2))
    return mad.select(
        "event_id", "event_type", "value",
        F.round("med", 6).alias("med"), F.round("mad", 6).alias("mad"),
        (F.round(F.abs(F.col("value") - F.col("med")), 9)
         > F.round(HAMPEL_K * 1.4826 * F.col("mad"), 9))
        .alias("is_outlier"))


# SRM chi-square critical value at alpha=0.05, df=1.
SRM_CHI2_CRIT = 3.841459


@query("events_ab_srm_check", oracle=f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
arms AS (SELECT user_id,
                ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                  % 2 AS arm
         FROM u),
c AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b
      FROM arms)
SELECT n_users, n_a, n_b,
       round((n_a - n_b) * (n_a - n_b) * 1.0 / n_users, 6) AS chi2,
       (n_a - n_b) * (n_a - n_b) * 1.0 / n_users > {SRM_CHI2_CRIT}
         AS srm_detected
FROM c
""")
def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-RATIO-MISMATCH guardrail for A/B experiments: users are
    assigned to arms by the engine's deterministic content hash (the
    sample_deterministic convention — same split on any cluster, any
    partitioning, any engine), and the observed split is chi-square
    tested against the intended 50/50 (for a two-arm equal split the
    statistic reduces to (n_a - n_b)^2 / n). SRM is THE validity gate
    run before ab_test_welch ever reads a metric: a mismatched ratio
    means broken assignment/logging, not a treatment effect.

    One distinct + one 1-row conditional aggregate — combiner'd keyed
    shuffle for the distinct, nothing else scales with volume."""
    ev = load(spark, sf_dir, "events")
    from ..functions.vector import det_hash64

    u = ev.select("user_id").distinct()
    arm = det_hash64(F.col("user_id").cast("string")) % 2
    c = u.select(arm.alias("arm")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint")
         .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint")
         .alias("n_b"))
    chi2 = ((F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))
            * 1.0 / F.col("n_users"))
    return c.select("n_users", "n_a", "n_b",
                    F.round(chi2, 6).alias("chi2"),
                    (chi2 > SRM_CHI2_CRIT).alias("srm_detected"))


# ABC (Pareto) class boundaries on cumulative revenue share.
ABC_A, ABC_B = 0.80, 0.95


@query("agg_abc_pareto", oracle=f"""
WITH r AS (SELECT l_partkey,
                  round(sum(l_extendedprice * (1 - l_discount)), 4) AS rev
           FROM lineitem GROUP BY l_partkey),
t AS (SELECT sum(rev) AS tot FROM r),
c AS (SELECT l_partkey, rev,
             sum(rev) OVER (ORDER BY rev DESC, l_partkey) AS crev
      FROM r)
SELECT c.l_partkey, c.rev,
       round(c.crev / t.tot, 6) AS cum_share,
       CASE WHEN (c.crev - c.rev) / t.tot < {ABC_A} THEN 'A'
            WHEN (c.crev - c.rev) / t.tot < {ABC_B} THEN 'B'
            ELSE 'C' END AS abc_class
FROM c CROSS JOIN t
""")
def agg_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / PARETO CLASSIFICATION: parts ranked by revenue, classed A
    (first 80% of cumulative share), B (next 15%), C (tail) — the
    inventory-analysis classic, and operationally the skew triage
    report (class-A keys are the ones that need salting). Class
    membership tests the share accumulated BEFORE the item, so the
    top item is always A regardless of its own mass.

    Engine-stability: per-part revenues round to 4 BEFORE ranking and
    accumulation, so both engines run the running sum over identical
    doubles in the identical (rev desc, partkey) order — sequential
    IEEE addition in the same order is bit-deterministic; only the
    grand-total division can differ in the last bit, far from the
    class boundaries. The global cumulative window is single-partition
    at test SF; at 100 TB use range-partitioned two-phase prefix sums
    (corpus_shard_assign's pattern) — class semantics are unchanged."""
    li = load(spark, sf_dir, "lineitem")
    r = (li.groupBy("l_partkey")
         .agg(F.round(F.sum(F.col("l_extendedprice")
                            * (1 - F.col("l_discount"))), 4).alias("rev")))
    t = r.agg(F.sum("rev").alias("tot"))
    wc = (W.orderBy(F.desc("rev"), F.asc("l_partkey"))
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    c = r.withColumn("crev", F.sum("rev").over(wc))
    prev_share = (F.col("crev") - F.col("rev")) / F.col("tot")
    return (c.crossJoin(F.broadcast(t))
            .select("l_partkey", "rev",
                    F.round(F.col("crev") / F.col("tot"), 6)
                    .alias("cum_share"),
                    F.when(prev_share < ABC_A, "A")
                     .when(prev_share < ABC_B, "B")
                     .otherwise("C").alias("abc_class")))


# SLO error budget: share of events allowed to be errors.
SLO_ERR_BUDGET = 0.25


@query("events_slo_burn_rate", oracle=f"""
WITH d AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                  count(*) AS n,
                  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS e
           FROM events GROUP BY 1)
SELECT day, CAST(n AS BIGINT) AS n_events, CAST(e AS BIGINT) AS n_errors,
       round(e * 1.0 / n, 6) AS error_rate,
       round((e * 1.0 / n) / {SLO_ERR_BUDGET}, 6) AS burn_rate,
       CAST(sum(e) OVER (ORDER BY day) AS BIGINT) AS cum_errors,
       round(sum(e) OVER (ORDER BY day) * 1.0
             / sum(n) OVER (ORDER BY day), 6) AS cum_error_rate
FROM d
""")
def events_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO ERROR-BUDGET BURN reporting (the SRE reliability view): per
    day, the error rate against a 25% budget (burn rate > 1 means the
    day overspent), plus month-to-date cumulative errors and rate —
    the table an alerting policy thresholds ('burn > 2 for 3 days').
    All counts are integers until the final divisions, so both engines
    divide identical values; day keys emit as strings (the
    events_dau_wau_mau convention). One events-wide daily aggregate,
    then a days-count window — the cumulative pass never touches raw
    events."""
    ev = load(spark, sf_dir, "events")
    d = (ev.groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd")
                    .alias("day"))
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
              .alias("e")))
    wc = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return d.select(
        "day", F.col("n").cast("bigint").alias("n_events"),
        F.col("e").cast("bigint").alias("n_errors"),
        F.round(F.col("e") * 1.0 / F.col("n"), 6).alias("error_rate"),
        F.round((F.col("e") * 1.0 / F.col("n")) / SLO_ERR_BUDGET, 6)
         .alias("burn_rate"),
        F.sum("e").over(wc).cast("bigint").alias("cum_errors"),
        F.round(F.sum("e").over(wc) * 1.0 / F.sum("n").over(wc), 6)
         .alias("cum_error_rate"))


@query("window_rolling_corr", oracle="""
WITH d AS (SELECT event_type,
                  strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                  count(*) * 1.0 AS x, round(avg(value), 6) AS y
           FROM events GROUP BY 1, 2),
m AS (SELECT event_type, day, x,
             avg(x) OVER w AS ax, avg(y) OVER w AS ay,
             avg(x * x) OVER w AS axx, avg(y * y) OVER w AS ayy,
             avg(x * y) OVER w AS axy
      FROM d
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
SELECT event_type, day, CAST(x AS BIGINT) AS n_events,
       CASE WHEN (axx - ax * ax) > 0 AND (ayy - ay * ay) > 0
            THEN round((axy - ax * ay)
                       / sqrt((axx - ax * ax) * (ayy - ay * ay)), 6)
            END AS corr_7d
FROM m
""")
def window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING CORRELATION: per event type, the trailing-7-day Pearson
    correlation between daily volume and daily mean value — the
    multivariate rolling statistic (does load co-move with value?)
    next to the univariate EWMA/z-score family. Correlation is spelled
    as EXPLICIT window moments (avg of x, y, x^2, y^2, xy -> co-moment
    ratio) identically on both sides: the engines' built-in corr
    differ at degenerate frames (Spark ANSI raises DIVIDE_BY_ZERO on a
    1-row frame; DuckDB returns NULL) and use different stable-
    accumulation algorithms. The guard (either variance term <= 0 ->
    NULL) covers 1-row frames and constant series; inputs are integers
    and 6-rounded means so both engines see identical numbers. One
    events-wide daily aggregate, then a days-per-type window sharing
    one sort across the 5 moment aggregates."""
    ev = load(spark, sf_dir, "events")
    d = (ev.groupBy("event_type",
                    F.date_format(F.to_date("ts"), "yyyy-MM-dd")
                    .alias("day"))
         .agg((F.count(F.lit(1)) * 1.0).alias("x"),
              F.round(F.avg("value"), 6).alias("y")))
    w = (W.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0))
    m = d.select(
        "event_type", "day", "x",
        F.avg("x").over(w).alias("ax"), F.avg("y").over(w).alias("ay"),
        F.avg(F.col("x") * F.col("x")).over(w).alias("axx"),
        F.avg(F.col("y") * F.col("y")).over(w).alias("ayy"),
        F.avg(F.col("x") * F.col("y")).over(w).alias("axy"))
    varx = F.col("axx") - F.col("ax") * F.col("ax")
    vary = F.col("ayy") - F.col("ay") * F.col("ay")
    return m.select(
        "event_type", "day", F.col("x").cast("bigint").alias("n_events"),
        F.when((varx > 0) & (vary > 0),
               F.round((F.col("axy") - F.col("ax") * F.col("ay"))
                       / F.sqrt(varx * vary), 6)).alias("corr_7d"))


@query("ab_diff_in_diff", oracle="""
WITH u AS (SELECT DISTINCT user_id FROM events),
arms AS (SELECT user_id,
                ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                  % 2 AS arm
         FROM u),
mid AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS m
       FROM events),
e AS (SELECT a.arm,
             CASE WHEN epoch_us(ev.ts) >= mid.m THEN 1 ELSE 0 END AS post,
             ev.value
      FROM events ev JOIN arms a USING (user_id) CROSS JOIN mid
      WHERE ev.event_type = 'purchase'),
g AS (SELECT CAST(count(*) AS BIGINT) AS n_purchases,
             avg(CASE WHEN arm = 0 AND post = 0 THEN value END) AS a0,
             avg(CASE WHEN arm = 0 AND post = 1 THEN value END) AS a1,
             avg(CASE WHEN arm = 1 AND post = 0 THEN value END) AS b0,
             avg(CASE WHEN arm = 1 AND post = 1 THEN value END) AS b1
      FROM e)
SELECT n_purchases,
       round(a0, 6) AS ctrl_pre, round(a1, 6) AS ctrl_post,
       round(b0, 6) AS treat_pre, round(b1, 6) AS treat_post,
       round((b1 - b0) - (a1 - a0), 6) AS did_estimate
FROM g
""")
def ab_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES estimate: purchase value change across
    the time midpoint, treatment vs control — the causal-inference
    workhorse when only the treated arm receives an intervention at a
    known time, controlling for the common temporal trend. Arms are
    the deterministic content-hash split (the SRM-checked assignment);
    the period boundary is the exact integer epoch-micro midpoint
    computed IN-PLAN ((min+max)//2 — NOT interval division, whose
    component semantics differ between engines: DuckDB halves days and
    micros separately where Spark halves one micro count). One conditional aggregate produces all four cells and
    the DiD contrast; the null result on hash-split synthetic data is
    itself the validation (no intervention happened, estimate ~ 0).
    One distinct + one broadcast + one 1-row rollup at any scale."""
    ev = load(spark, sf_dir, "events")
    from ..functions.vector import det_hash64

    arms = (ev.select("user_id").distinct()
            .select("user_id",
                    (det_hash64(F.col("user_id").cast("string")) % 2)
                    .alias("arm")))
    mid = ev.agg(F.floor((F.min("ts_us") + F.max("ts_us")) / 2)
                 .cast("long").alias("m"))
    e = (ev.filter(F.col("event_type") == "purchase")
         .join(arms, "user_id")
         .crossJoin(F.broadcast(mid))
         .select("arm", F.when(F.col("ts_us") >= F.col("m"), 1).otherwise(0)
                 .alias("post"), "value"))
    def cell(a, p):
        return F.avg(F.when((F.col("arm") == a) & (F.col("post") == p),
                            F.col("value")))
    g = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
              cell(0, 0).alias("a0"), cell(0, 1).alias("a1"),
              cell(1, 0).alias("b0"), cell(1, 1).alias("b1"))
    return g.select(
        "n_purchases",
        F.round("a0", 6).alias("ctrl_pre"),
        F.round("a1", 6).alias("ctrl_post"),
        F.round("b0", 6).alias("treat_pre"),
        F.round("b1", 6).alias("treat_post"),
        F.round((F.col("b1") - F.col("b0")) - (F.col("a1") - F.col("a0")),
                6).alias("did_estimate"))


# Session path geometry: 30-minute inactivity gap, first PATH_LEN steps.
PATH_GAP_MIN, PATH_LEN, PATH_TOP = 30, 5, 20


@query("events_session_paths", oracle=f"""
WITH m AS (
  SELECT user_id, ts, event_id, substr(event_type, 1, 1) AS ini,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL {PATH_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM m),
r AS (SELECT user_id, sid, ini,
             row_number() OVER (PARTITION BY user_id, sid
                                ORDER BY ts, event_id) AS pos
      FROM s),
p AS (SELECT user_id, sid, string_agg(ini, '>' ORDER BY pos) AS path
      FROM r WHERE pos <= {PATH_LEN} GROUP BY user_id, sid),
c AS (SELECT path, count(*) AS n FROM p GROUP BY path),
k AS (SELECT path, n, row_number() OVER (ORDER BY n DESC, path) AS rnk
      FROM c)
SELECT path, CAST(n AS BIGINT) AS n_sessions, CAST(rnk AS BIGINT) AS rnk
FROM k WHERE rnk <= {PATH_TOP}
""")
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION PATH ANALYSIS (the product-analytics 'top user journeys'
    table): sessionize on 30-minute inactivity gaps (the
    sessionize_relational islands), encode each session's first 5
    steps as a '>'-joined initial path, and rank the most common
    paths. The funnel family asks 'did journey X happen'; this asks
    'which journeys happen' — discovery before hypothesis.

    One user-keyed shuffle covers the gap flags, session ids, and step
    ordinals (three windows, one sort); paths assemble from an
    array_sort over (pos, ini) structs — never bare collect_list; the
    final top-20 ranks a path-cardinality frame. At 100 TB the
    user-keyed pass is the only events-wide stage; path cardinality is
    bounded by 5^|event types| regardless of volume."""
    ev = load(spark, sf_dir, "events")
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    m = ev.select(
        "user_id", "ts", "event_id",
        F.substring("event_type", 1, 1).alias("ini"),
        F.when(F.lag("ts").over(wl).isNull()
               | (F.col("ts_us") - F.lag("ts_us").over(wl)
                  >= PATH_GAP_MIN * 60_000_000), 1).otherwise(0)
        .alias("brk"))
    s = m.withColumn("sid", F.sum("brk").over(
        wl.rowsBetween(W.unboundedPreceding, 0)))
    r = s.withColumn("pos", F.row_number().over(
        W.partitionBy("user_id", "sid").orderBy("ts", "event_id")))
    p = (r.filter(F.col("pos") <= PATH_LEN)
         .groupBy("user_id", "sid")
         .agg(F.concat_ws(">", F.transform(
             F.array_sort(F.collect_list(F.struct("pos", "ini"))),
             lambda x: x["ini"])).alias("path")))
    c = p.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    k = c.withColumn("rnk", F.row_number().over(
        W.orderBy(F.desc("n"), F.asc("path"))).cast("bigint"))
    return (k.filter(F.col("rnk") <= PATH_TOP)
            .select("path", F.col("n").cast("bigint").alias("n_sessions"),
                    "rnk"))


@query("window_drawdown", oracle="""
WITH d AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                  sum(CASE WHEN event_type = 'purchase' THEN value
                           WHEN event_type = 'error' THEN -value
                           ELSE 0 END) AS net
           FROM events GROUP BY 1),
c AS (SELECT day, net,
             sum(net) OVER (ORDER BY day) AS cum
      FROM d),
p AS (SELECT day, net, cum,
             max(cum) OVER (ORDER BY day) AS peak
      FROM c)
SELECT day, round(net, 6) AS net, round(cum, 6) AS cum,
       round(peak, 6) AS peak, round(peak - cum, 6) AS drawdown
FROM p
""")
def window_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DRAWDOWN analysis (the quant risk metric, applied to the daily
    net-value series: purchases credit, errors debit): cumulative sum,
    running peak, and peak-to-current drawdown per day — max(drawdown)
    is the worst-case retracement an alerting policy bounds. Two
    stacked cumulative windows over a days-count frame (the raw-event
    aggregate is the only volume-scaled stage); sums round only at
    output, and the 1e-6 rounding step sits orders above the engines'
    accumulation-order float noise."""
    ev = load(spark, sf_dir, "events")
    d = (ev.groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd")
                    .alias("day"))
         .agg(F.sum(F.when(F.col("event_type") == "purchase",
                           F.col("value"))
                    .when(F.col("event_type") == "error", -F.col("value"))
                    .otherwise(0.0)).alias("net")))
    wc = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    c = d.withColumn("cum", F.sum("net").over(wc))
    p = c.withColumn("peak", F.max("cum").over(wc))
    return p.select("day", F.round("net", 6).alias("net"),
                    F.round("cum", 6).alias("cum"),
                    F.round("peak", 6).alias("peak"),
                    F.round(F.col("peak") - F.col("cum"), 6)
                    .alias("drawdown"))


@query("timeseries_autocorrelation", oracle="""
WITH d AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                  count(*) * 1.0 AS x
           FROM events GROUP BY 1),
i AS (SELECT x, row_number() OVER (ORDER BY day) AS t FROM d),
l AS (SELECT g.lag, a.x AS x0, b.x AS x1
      FROM range(1, 8) g(lag)
      JOIN i a ON TRUE
      JOIN i b ON b.t = a.t - g.lag),
m AS (SELECT lag, count(*) AS n,
             avg(x0) AS a0, avg(x1) AS a1,
             avg(x0 * x0) AS s00, avg(x1 * x1) AS s11,
             avg(x0 * x1) AS s01
      FROM l GROUP BY lag)
SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
       CASE WHEN (s00 - a0 * a0) > 0 AND (s11 - a1 * a1) > 0
            THEN round((s01 - a0 * a1)
                       / sqrt((s00 - a0 * a0) * (s11 - a1 * a1)), 6)
            END AS autocorr
FROM m
""")
def timeseries_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTOCORRELATION function of the daily volume series at lags 1-7
    — the periodicity detector (a weekly cycle spikes lag 7) that
    decides whether timeseries_seasonal_decompose's hour/day split is
    the right model. Pairs come from an integer-ordinal self-join
    (day-ordinal t vs t-lag; day strings never do arithmetic), moments
    from the same explicit Pearson spelling as window_rolling_corr —
    all inputs are integer counts, so both engines' sums are exact.
    The raw-event daily aggregate is the only volume-scaled stage; the
    lag join runs on a days-count frame x 7."""
    ev = load(spark, sf_dir, "events")
    d = (ev.groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd")
                    .alias("day"))
         .agg((F.count(F.lit(1)) * 1.0).alias("x")))
    i = d.select("x", F.row_number().over(W.orderBy("day")).alias("t"))
    g = spark.range(1, 8).select(F.col("id").alias("lag"))
    a = i.select(F.col("x").alias("x0"), F.col("t").alias("t0"))
    b = i.select(F.col("x").alias("x1"), F.col("t").alias("t1"))
    pairs = (a.crossJoin(F.broadcast(g))
             .join(b, F.col("t1") == F.col("t0") - F.col("lag")))
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x0").alias("a0"), F.avg("x1").alias("a1"),
        F.avg(F.col("x0") * F.col("x0")).alias("s00"),
        F.avg(F.col("x1") * F.col("x1")).alias("s11"),
        F.avg(F.col("x0") * F.col("x1")).alias("s01"))
    v0 = F.col("s00") - F.col("a0") * F.col("a0")
    v1 = F.col("s11") - F.col("a1") * F.col("a1")
    return m.select(
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n").cast("bigint").alias("n_pairs"),
        F.when((v0 > 0) & (v1 > 0),
               F.round((F.col("s01") - F.col("a0") * F.col("a1"))
                       / F.sqrt(v0 * v1), 6)).alias("autocorr"))


@query("events_hour_dow_heatmap", oracle="""
WITH c AS (SELECT dayofweek(ts) AS dow, extract(hour FROM ts) AS hr,
                  count(*) * 1.0 AS n
           FROM events GROUP BY 1, 2),
m AS (SELECT avg(n) AS mu,
             sqrt(greatest(avg(n * n) - avg(n) * avg(n), 0)) AS sd
      FROM c)
SELECT CAST(c.dow AS BIGINT) AS dow, CAST(c.hr AS BIGINT) AS hr,
       CAST(c.n AS BIGINT) AS n,
       round(CASE WHEN m.sd > 0 THEN (c.n - m.mu) / m.sd END, 6) AS z
FROM c CROSS JOIN m
""")
def events_hour_dow_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALENDAR HEATMAP cells: activity counts per (day-of-week, hour)
    with cell z-scores against the grid mean — the first chart every
    traffic review opens, and the cheap anomaly surface (a +4-sigma
    Tuesday-3am cell is a cron job, not users). Day-of-week uses
    DuckDB's Sunday=0 convention (Spark's dayofweek is Sunday=1, so
    the engine side subtracts 1 — calendar-function conventions are
    NEVER portable unchecked). Counts are integers, the population
    std comes from one 168-cell moment row, and the z divides exact
    values — one events-wide aggregate, then constants."""
    ev = load(spark, sf_dir, "events")
    c = (ev.groupBy((F.dayofweek("ts") - 1).alias("dow"),
                    F.hour("ts").alias("hr"))
         .agg((F.count(F.lit(1)) * 1.0).alias("n")))
    m = c.agg(F.avg("n").alias("mu"),
              F.sqrt(F.greatest(
                  F.avg(F.col("n") * F.col("n"))
                  - F.avg("n") * F.avg("n"), F.lit(0.0))).alias("sd"))
    return (c.crossJoin(F.broadcast(m))
            .select(F.col("dow").cast("bigint").alias("dow"),
                    F.col("hr").cast("bigint").alias("hr"),
                    F.col("n").cast("bigint").alias("n"),
                    F.round(F.when(F.col("sd") > 0,
                                   (F.col("n") - F.col("mu"))
                                   / F.col("sd")), 6).alias("z")))


@query("events_new_vs_returning", oracle="""
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
fs AS (SELECT user_id, min(d) AS first_day FROM du GROUP BY user_id)
SELECT strftime(du.d, '%Y-%m-%d') AS day,
       CAST(sum(CASE WHEN du.d = fs.first_day THEN 1 ELSE 0 END)
            AS BIGINT) AS n_new,
       CAST(sum(CASE WHEN du.d > fs.first_day THEN 1 ELSE 0 END)
            AS BIGINT) AS n_returning,
       round(sum(CASE WHEN du.d = fs.first_day THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS new_frac
FROM du JOIN fs USING (user_id)
GROUP BY du.d
""")
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW vs RETURNING daily active users — the growth-accounting
    split every product dashboard leads with (cohort_retention is the
    matrix view; this is the time-series view). First-seen day is a
    user-keyed min over the user-day distinct frame, joined back and
    compared — a window-free spelling (the min-aggregate + join
    broadcasts user-cardinality state instead of sorting per user).
    One events-wide distinct, one user-keyed min, one day rollup."""
    ev = load(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    fs = du.groupBy("user_id").agg(F.min("d").alias("first_day"))
    j = du.join(fs, "user_id")
    is_new = F.when(F.col("d") == F.col("first_day"), 1).otherwise(0)
    is_ret = F.when(F.col("d") > F.col("first_day"), 1).otherwise(0)
    return (j.groupBy(F.date_format("d", "yyyy-MM-dd").alias("day"))
            .agg(F.sum(is_new).cast("bigint").alias("n_new"),
                 F.sum(is_ret).cast("bigint").alias("n_returning"),
                 F.round(F.sum(is_new) * 1.0 / F.count(F.lit(1)), 6)
                  .alias("new_frac")))


@query("agg_weighted_median", oracle="""
WITH pv AS (
  SELECT l_returnflag AS grp, l_extendedprice AS v,
         CAST(sum(l_quantity) AS BIGINT) AS wt
  FROM lineitem GROUP BY 1, 2
),
c AS (
  SELECT grp, v, wt,
         sum(wt) OVER (PARTITION BY grp ORDER BY v) AS cw,
         sum(wt) OVER (PARTITION BY grp) AS tw
  FROM pv
)
SELECT grp AS l_returnflag,
       min(v) AS weighted_median_price,
       CAST(min(tw) AS BIGINT) AS total_qty
FROM c WHERE 2 * cw >= tw GROUP BY grp
""")
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median (lower-median convention): the smallest price v
    such that items at-or-below v carry at least half the total quantity
    — the quantity-weighted "typical price", which an unweighted median
    gets wrong whenever cheap items ship in bulk. percentile_approx has
    no weight argument, so this is the exact spelling: per-(group, value)
    weight totals, a cumulative-weight window over distinct values, then
    the first value whose doubled cumulative weight reaches the total.

    Determinism: the ordering/grouping key is the RAW double price (no
    arithmetic → bit-identical in Spark and DuckDB since both read the
    same parquet), and weights are integral quantities summed as bigint.
    Pre-grouping by (grp, v) removes ties entirely, so the cumulative sum
    is frame-order independent.

    Scale shape: one (grp, value)-keyed partial-aggregated shuffle
    (combiner collapses duplicate prices map-side), then a grp-partitioned
    sort over the DISTINCT-value table — the window input is |distinct
    prices|, not |lineitem|. With few hot groups the per-group sort is
    the bound; at extreme group skew the rank-based twin is a fixed-point
    search over histogram_equi_depth buckets."""
    from pyspark.sql import Window as W2

    li = load(spark, sf_dir, "lineitem")
    pv = (li.groupBy(F.col("l_returnflag").alias("grp"),
                     F.col("l_extendedprice").alias("v"))
          .agg(F.sum("l_quantity").cast("bigint").alias("wt")))
    wcum = W2.partitionBy("grp").orderBy("v")
    c = (pv.withColumn("cw", F.sum("wt").over(wcum))
         .withColumn("tw", F.sum("wt").over(W2.partitionBy("grp"))))
    return (c.filter(2 * F.col("cw") >= F.col("tw"))
            .groupBy(F.col("grp").alias("l_returnflag"))
            .agg(F.min("v").alias("weighted_median_price"),
                 F.min("tw").cast("bigint").alias("total_qty")))


# Skyline price-bucket width: candidate pruning granularity. TPC-H retail
# prices live in ~[900, 2100], so width 10 yields ~120 buckets — the only
# globally-ordered structure is this constant-sized bucket table.
_SKY_BUCKET_W = 10.0


@query("skyline_pareto_frontier", oracle="""
SELECT CAST(p.p_partkey AS BIGINT) AS p_partkey,
       p.p_retailprice AS price,
       CAST(p.p_size AS BIGINT) AS size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
""")
def skyline_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE / Pareto frontier: parts not dominated on (minimize
    retail price, maximize size) — the multi-criteria shortlist query
    (cheapest-for-the-size tradeoff curve). A part survives iff no other
    part is at-least-as-good on both axes and strictly better on one;
    exact duplicates on both axes all survive (no strict edge).

    The oracle is the textbook quadratic NOT EXISTS; the Spark plan is
    the SORT-BASED staircase, distributed in three constant-depth levels
    so nothing global ever holds data-sized state:
      1. per-(price) max size, pre-bucketed by a fixed price width —
         one combiner'd shuffle;
      2. per-bucket staircase: running max over the bucket's DISTINCT
         prices (window partitioned by bucket — parallel), plus a
         cross-bucket carry-in computed on the ~120-row bucket table
         (the only unpartitioned window, constant-sized by construction);
      3. survivor price levels (size strictly above everything cheaper)
         broadcast-joined back to the fact.
    A point is dominated iff a strictly-cheaper price level reaches its
    size (carry-in handles cross-bucket, the windowed max handles
    in-bucket) or a same-price point is strictly larger (size < gmax).
    Comparisons only on raw parquet doubles — no float arithmetic to
    diverge between engines (floor(price/W) is a single exact IEEE op).

    At 100 TB this is the standard distributed-skyline recipe (grid
    pruning + per-cell local skyline + merge); d>2 dims swap the scalar
    running max for a per-cell local skyline with the same carry
    structure."""
    from pyspark.sql import Window as W2

    pt = load(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("bigint").alias("p_partkey"),
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("bigint").alias("size"))
    lv = (pt.groupBy(F.floor(F.col("price") / _SKY_BUCKET_W).alias("bkt"),
                     "price")
          .agg(F.max("size").alias("gmax")))
    # cross-bucket carry-in: best size in any strictly-cheaper bucket
    bmax = lv.groupBy("bkt").agg(F.max("gmax").alias("bmax"))
    wb = W2.orderBy("bkt").rowsBetween(W2.unboundedPreceding, -1)
    carry = bmax.withColumn("prior", F.max("bmax").over(wb)).drop("bmax")
    # in-bucket staircase over distinct prices (partitioned -> parallel)
    wp = (W2.partitionBy("bkt").orderBy("price")
          .rowsBetween(W2.unboundedPreceding, -1))
    lv2 = (lv.join(F.broadcast(carry), "bkt")
           .withColumn("inprev", F.max("gmax").over(wp))
           .withColumn("prev", F.greatest(
               F.coalesce("prior", F.lit(-1)),
               F.coalesce("inprev", F.lit(-1)))))
    sky_levels = (lv2.filter(F.col("gmax") > F.col("prev"))
                  .select(F.col("price").alias("sky_price"),
                          F.col("gmax").alias("sky_size")))
    return (pt.join(F.broadcast(sky_levels),
                    (F.col("price") == F.col("sky_price"))
                    & (F.col("size") == F.col("sky_size")))
            .select("p_partkey", "price", "size"))


# Poisson-bootstrap configuration: replicate count and the inverse-CDF
# thresholds of Poisson(1) over a 32-bit uniform hash —
# floor(P(X<=k) * 2^32) for k = 0..5 (tail mass beyond 6 is ~1e-7).
# Integer literals so the weight draw is bit-identical in any engine.
_BOOT_R = 40
_BOOT_T = (1580030168, 3160060337, 3950075421,
           4213413783, 4279248373, 4292415291)


def _boot_weight_sql(h: str) -> str:
    cases = " ".join(
        f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_BOOT_T))
    return f"CASE {cases} ELSE 6 END"


@query("ab_bootstrap_ci_poisson", oracle=f"""
WITH e AS (
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
rep AS (
  SELECT e.event_id, e.cents, r.i AS rep,
         ('0x' || substr(md5(CAST(e.event_id AS VARCHAR) || ':' ||
                             CAST(r.i AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM e CROSS JOIN range(1, {_BOOT_R} + 1) r(i)
),
w AS (SELECT rep, cents, {_boot_weight_sql('h')} AS wt FROM rep),
means AS (
  SELECT rep, CAST(sum(wt * cents) AS BIGINT)
              / CAST(sum(wt) AS BIGINT) AS m
  FROM w GROUP BY rep
),
ranked AS (
  SELECT m, row_number() OVER (ORDER BY m) AS rn FROM means
),
pt AS (SELECT CAST(sum(cents) AS BIGINT) AS s,
              CAST(count(*) AS BIGINT) AS n FROM e)
SELECT pt.s / pt.n AS point_mean_cents,
       (SELECT m FROM ranked WHERE rn = 2) AS ci_lo_cents,
       (SELECT m FROM ranked WHERE rn = {_BOOT_R} - 1) AS ci_hi_cents,
       CAST({_BOOT_R} AS BIGINT) AS n_replicates
FROM pt
""")
def ab_bootstrap_ci_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON BOOTSTRAP confidence interval for the mean purchase value
    — the bootstrap that actually scales: instead of resampling n rows
    with replacement (which needs a global sample per replicate), every
    row independently draws a Poisson(1) weight per replicate, so all R
    replicates compute in ONE pass over the data with a (replicate)-keyed
    aggregate. This is the standard large-scale bootstrap; Welch's
    parametric twin is ab_test_welch.

    Determinism end-to-end: the weight is an inverse-CDF lookup of a
    32-bit content hash (det_hash64 on event_id:replicate) against
    hard-coded INTEGER thresholds — no engine RNG, no float CDF;
    per-replicate sums stay bigint (values snap to cents — the
    timeseries_twap precedent), so each bootstrap mean is a single
    integer-ratio division, and the 95% CI is exact order statistics
    (2nd / 39th of 40 replicate means), not interpolated quantiles.

    Scale shape: the replicate fan-out is explode(sequence(1..R)) — a
    narrow generator, R× map-side rows collapsed immediately by the
    combiner into R partial sums per partition; shuffle width is
    R rows total. No data-sized structure is ever global; the final
    order-statistic window sees exactly R = 40 rows."""
    from pyspark.sql import Window as W2
    from ..functions.vector import det_hash64

    ev = (load(spark, sf_dir, "events")
          .filter(F.col("event_type") == "purchase")
          .select("event_id",
                  F.round(F.col("value") * 100).cast("bigint")
                  .alias("cents")))
    rep = ev.select(
        "event_id", "cents",
        F.explode(F.sequence(F.lit(1), F.lit(_BOOT_R))).alias("rep"))
    h = det_hash64(F.concat_ws(":", F.col("event_id"), F.col("rep")))
    wt = F.lit(6)
    for k in range(len(_BOOT_T) - 1, -1, -1):
        wt = F.when(h < _BOOT_T[k], k).otherwise(wt)
    means = (rep.withColumn("wt", wt)
             .groupBy("rep")
             .agg((F.sum(F.col("wt") * F.col("cents")).cast("bigint")
                   / F.sum("wt").cast("bigint")).alias("m")))
    ranked = means.withColumn(
        "rn", F.row_number().over(W2.orderBy("m")))
    lo = ranked.filter(F.col("rn") == 2).select(
        F.col("m").alias("ci_lo_cents"))
    hi = ranked.filter(F.col("rn") == _BOOT_R - 1).select(
        F.col("m").alias("ci_hi_cents"))
    pt = ev.agg((F.sum("cents").cast("bigint")
                 / F.count(F.lit(1)).cast("bigint"))
                .alias("point_mean_cents"))
    return (pt.crossJoin(F.broadcast(lo)).crossJoin(F.broadcast(hi))
            .withColumn("n_replicates", F.lit(_BOOT_R).cast("bigint")))


@query("timeseries_yoy_mom", oracle="""
WITH m AS (
  SELECT CAST(datepart('year', o_orderdate) AS BIGINT) AS yr,
         CAST(datepart('month', o_orderdate) AS BIGINT) AS mo,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1, 2
)
SELECT yr, mo, n_orders,
       lag(n_orders, 1) OVER w AS prev_month,
       lag(n_orders, 12) OVER w AS prev_year,
       n_orders - lag(n_orders, 1) OVER w AS mom_delta,
       (n_orders - lag(n_orders, 1) OVER w)
         / CAST(lag(n_orders, 1) OVER w AS DOUBLE) AS mom_pct,
       (n_orders - lag(n_orders, 12) OVER w)
         / CAST(lag(n_orders, 12) OVER w AS DOUBLE) AS yoy_pct
FROM m WINDOW w AS (ORDER BY yr, mo)
""")
def timeseries_yoy_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth with CALENDAR alignment: monthly order
    counts with month-over-month and year-over-year deltas/percentages
    via lag(1) and lag(12) over the month series — the first page of
    every business review, and the query where naive 30-day windows go
    wrong (YoY must compare the same calendar month, not t-365d).

    Counts are exact bigints; each pct is one integer-ratio IEEE
    division; first-year rows carry NULL yoy (no fabricated baseline).
    The only window runs over the MONTH table — bounded by the calendar
    (~80 rows here, 1200 rows for a century), so the unpartitioned sort
    is constant-sized by construction, never data-sized (the per-event
    work is one combiner'd groupBy)."""
    from pyspark.sql import Window as W2

    m = (load(spark, sf_dir, "orders")
         .groupBy(F.year("o_orderdate").cast("bigint").alias("yr"),
                  F.month("o_orderdate").cast("bigint").alias("mo"))
         .agg(F.count(F.lit(1)).alias("n_orders")))
    w = W2.orderBy("yr", "mo")
    pm = F.lag("n_orders", 1).over(w)
    py = F.lag("n_orders", 12).over(w)
    return m.select(
        "yr", "mo", "n_orders",
        pm.alias("prev_month"), py.alias("prev_year"),
        (F.col("n_orders") - pm).alias("mom_delta"),
        ((F.col("n_orders") - pm) / pm.cast("double")).alias("mom_pct"),
        ((F.col("n_orders") - py) / py.cast("double")).alias("yoy_pct"))


# WoE binning: fixed-width value bins (engine-neutral literal edges; the
# fixture's values live in [0, ~560]).
_WOE_BIN_W = 50.0


@query("feature_woe_binning", oracle=f"""
WITH s AS (
  SELECT CAST(least(floor(value / {_WOE_BIN_W}), 11) AS BIGINT) AS bin_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
b AS (
  SELECT bin_id,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(count(*) - sum(y) AS BIGINT) AS n_neg
  FROM s GROUP BY bin_id
),
t AS (
  SELECT bin_id, n_pos, n_neg,
         sum(n_pos) OVER () AS tp, sum(n_neg) OVER () AS tn,
         count(*) OVER () AS k
  FROM b
)
SELECT bin_id, n_pos, n_neg,
       round(ln(((n_pos + 0.5) / (tp + 0.5 * k))
                / ((n_neg + 0.5) / (tn + 0.5 * k))), 6) AS woe,
       round(((n_pos + 0.5) / (tp + 0.5 * k)
              - (n_neg + 0.5) / (tn + 0.5 * k))
             * ln(((n_pos + 0.5) / (tp + 0.5 * k))
                  / ((n_neg + 0.5) / (tn + 0.5 * k))), 6) AS iv_contrib
FROM t
""")
def feature_woe_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHT-OF-EVIDENCE encoding: fixed-width value bins scored by
    ln(pos_share / neg_share), plus each bin's Information Value
    contribution (IV = sum of (pos_share - neg_share) * WoE) — the
    credit-scoring-standard monotone encoder and feature screen, the
    supervised complement of feature_target_encode_loo (which encodes
    by raw target mean). Target: event_type = 'purchase'.

    Bins are literal-edge fixed-width (no ntile — a global ntile sorts
    the whole fact; fixed edges are a narrow map). Counts are exact
    bigints; shares use +0.5 Laplace smoothing (shares = (n + 0.5) /
    (total + 0.5 * n_bins)) so empty-class bins stay finite at any SF;
    the smoothed arithmetic is the same literal IEEE ops in both
    engines, and the single ln() rounds to 6 (the entropy/surprisal
    precedent).

    Scale shape: one combiner'd groupBy over ~12 bins, then window
    totals over the BIN table (12 rows) — encoding a petabyte of rows
    costs one scan; the unpartitioned window is bin-count-sized by
    construction."""
    from pyspark.sql import Window as W2

    s = (load(spark, sf_dir, "events")
         .select(F.least(F.floor(F.col("value") / _WOE_BIN_W), F.lit(11))
                 .cast("bigint").alias("bin_id"),
                 F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                 .alias("y")))
    b = (s.groupBy("bin_id")
         .agg(F.sum("y").cast("bigint").alias("n_pos"),
              (F.count(F.lit(1)) - F.sum("y")).cast("bigint")
              .alias("n_neg")))
    wall = W2.partitionBy()
    t = (b.withColumn("tp", F.sum("n_pos").over(wall))
         .withColumn("tn", F.sum("n_neg").over(wall))
         .withColumn("k", F.count(F.lit(1)).over(wall)))
    ps = (F.col("n_pos") + 0.5) / (F.col("tp") + 0.5 * F.col("k"))
    ns = (F.col("n_neg") + 0.5) / (F.col("tn") + 0.5 * F.col("k"))
    return t.select(
        "bin_id", "n_pos", "n_neg",
        F.round(F.log(ps / ns), 6).alias("woe"),
        F.round((ps - ns) * F.log(ps / ns), 6).alias("iv_contrib"))


# Temporal split boundaries (literal timestamps, engine-neutral; the
# fixture's event stream spans January 2024 -> ~67/16/17 split).
_TSPLIT_TRAIN_END = "2024-01-21"
_TSPLIT_VALID_END = "2024-01-26"


@query("split_temporal_leakage_safe", oracle=f"""
WITH s AS (
  SELECT CASE WHEN ts <  TIMESTAMP '{_TSPLIT_TRAIN_END}' THEN 'train'
              WHEN ts <  TIMESTAMP '{_TSPLIT_VALID_END}' THEN 'valid'
              ELSE 'test' END AS split,
         user_id, event_type, ts
  FROM events
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchases,
       min(ts) AS ts_min, max(ts) AS ts_max
FROM s GROUP BY split
""")
def split_temporal_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL train/valid/test split — the LEAKAGE-SAFE evaluation
    protocol for anything time-dependent: train strictly before the
    cutoff, validate on the next period, test on the future, so no
    example is ever scored by a model that saw later data. The summary
    emits per-split volumes, distinct users, positive counts, and the
    actual time ranges (the audit that proves the boundaries hold —
    ts_max(train) < ts_min(valid) by construction). The random-by-content
    twin is corpus_split_train_valid_test (hash split — correct for
    exchangeable documents, WRONG for forecasting, where it leaks the
    future into training).

    Boundaries are literal timestamps; everything else is exact counts
    and min/max — no float path at all. Scale shape: a narrow CASE
    projection + one 3-group combiner'd aggregate (the distinct-user
    count is the only second shuffle, keyed on (split, user))."""
    lo = F.lit(_TSPLIT_TRAIN_END).cast("timestamp")
    hi = F.lit(_TSPLIT_VALID_END).cast("timestamp")
    ev = load(spark, sf_dir, "events")
    s = ev.select(
        F.when(F.col("ts") < lo, "train")
         .when(F.col("ts") < hi, "valid")
         .otherwise("test").alias("split"),
        "user_id", "event_type", "ts")
    return (s.groupBy("split")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 F.countDistinct("user_id").cast("bigint").alias("n_users"),
                 F.sum(F.when(F.col("event_type") == "purchase", 1)
                       .otherwise(0)).cast("bigint").alias("n_purchases"),
                 F.min("ts").alias("ts_min"),
                 F.max("ts").alias("ts_max")))


@query("agg_theil_decomposition", oracle="""
WITH x AS (
  SELECT o.o_custkey AS ck, c.c_nationkey AS nk,
         CAST(count(*) AS BIGINT) AS v
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
tot AS (SELECT CAST(sum(v) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n FROM x),
g AS (SELECT nk, CAST(sum(v) AS BIGINT) AS sg,
             CAST(count(*) AS BIGINT) AS ng FROM x GROUP BY nk),
w AS (
  SELECT x.nk,
         (x.v / (g.sg / CAST(g.ng AS DOUBLE)))
           * ln(x.v / (g.sg / CAST(g.ng AS DOUBLE))) AS wt,
         (x.v / (tot.s / CAST(tot.n AS DOUBLE)))
           * ln(x.v / (tot.s / CAST(tot.n AS DOUBLE))) AS tt
  FROM x JOIN g ON g.nk = x.nk CROSS JOIN tot
),
gw AS (SELECT nk, sum(wt) / count(*) AS tg, sum(tt) AS tt_sum,
              count(*) AS ng2
       FROM w GROUP BY nk)
SELECT tot.n AS n_customers,
       round(sum(gw.tt_sum) / tot.n, 6) AS theil_total,
       round(sum((g.sg / CAST(tot.s AS DOUBLE)) * gw.tg), 6)
         AS theil_within,
       round(sum((g.sg / CAST(tot.s AS DOUBLE))
                 * ln((g.sg / CAST(g.ng AS DOUBLE))
                      / (tot.s / CAST(tot.n AS DOUBLE)))), 6)
         AS theil_between
FROM gw JOIN g ON g.nk = gw.nk CROSS JOIN tot
GROUP BY tot.n
""")
def agg_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL-T inequality index of per-customer order counts with its
    exact BETWEEN-/WITHIN-nation decomposition — the property the Gini
    famously lacks (events_power_user_gini is the non-decomposable
    twin): T_total = sum_g (s_g/s)*T_g + sum_g (s_g/s)*ln(mu_g/mu), so
    the answer says not just HOW unequal order activity is but WHERE
    the inequality lives (inside nations vs across them).

    Activity values are exact bigint counts (customers with >= 1 order);
    means are integer-ratio divisions; the per-row x*ln(x) terms are
    float sums rounded to 6 at the end (entropy/gini precedent).

    Scale shape: one fact-sized (cust, nation) count — the only heavy
    shuffle — then everything is customer- or nation-keyed; the grand
    totals are a 1-ROW scalar broadcast crossed into the stream (never a
    data-sized global window). The decomposition is why this operator
    distributes so well: each group's T_g is independent, so the
    within-term is embarrassingly parallel by design."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    x = (o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
                o.o_custkey == F.col("c_custkey"))
         .groupBy(F.col("o_custkey").alias("ck"),
                  F.col("c_nationkey").alias("nk"))
         .agg(F.count(F.lit(1)).cast("bigint").alias("v")))
    tot = x.agg(F.sum("v").cast("bigint").alias("s"),
                F.count(F.lit(1)).cast("bigint").alias("n"))
    g = x.groupBy("nk").agg(F.sum("v").cast("bigint").alias("sg"),
                            F.count(F.lit(1)).cast("bigint").alias("ng"))
    t = x.join(F.broadcast(g), "nk").crossJoin(F.broadcast(tot))
    mu = F.col("s") / F.col("n").cast("double")
    mug = F.col("sg") / F.col("ng").cast("double")
    t = t.withColumn("wt", (F.col("v") / mug) * F.log(F.col("v") / mug)) \
         .withColumn("tt", (F.col("v") / mu) * F.log(F.col("v") / mu))
    gw = (t.groupBy("nk")
          .agg((F.sum("wt") / F.count(F.lit(1))).alias("tg"),
               F.sum("tt").alias("tt_sum")))
    fin = (gw.join(F.broadcast(g), "nk").crossJoin(F.broadcast(tot)))
    mu2 = F.col("s") / F.col("n").cast("double")
    mug2 = F.col("sg") / F.col("ng").cast("double")
    share = F.col("sg") / F.col("s").cast("double")
    return (fin.groupBy(F.col("n").alias("n_customers"))
            .agg(F.round(F.sum("tt_sum") / F.first("n"), 6)
                 .alias("theil_total"),
                 F.round(F.sum(share * F.col("tg")), 6)
                 .alias("theil_within"),
                 F.round(F.sum(share * F.log(mug2 / mu2)), 6)
                 .alias("theil_between")))


@query("agg_ratio_to_report", oracle="""
WITH rev AS (
  SELECT n.n_regionkey AS region_key, c.c_nationkey AS nation_key,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
reg AS (SELECT region_key, CAST(sum(n_orders) AS BIGINT) AS region_total
        FROM rev GROUP BY region_key),
tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS grand_total FROM rev)
SELECT rev.region_key, rev.nation_key, rev.n_orders,
       reg.region_total,
       rev.n_orders / CAST(reg.region_total AS DOUBLE) AS share_of_region,
       rev.n_orders / CAST(tot.grand_total AS DOUBLE) AS share_of_total
FROM rev JOIN reg USING (region_key) CROSS JOIN tot
""")
def agg_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level RATIO_TO_REPORT: each nation's order count as a share
    of its region and of the grand total — the percent-of-total pattern
    every report footer needs, at two grouping levels simultaneously
    (Oracle SQL ships RATIO_TO_REPORT() for exactly this; Spark spells
    it as re-aggregated totals joined back). Counts are exact bigints;
    each share is one integer-ratio IEEE division — no rounding needed.

    Scale shape: the fact-sized work is one combiner'd (region, nation)
    count; region totals re-aggregate the |nations|-row result and
    broadcast back; the grand total is a 1-row scalar broadcast (the
    events_ltv_decayed allowlist class). No window over data — the
    naive sum() OVER () spelling would sort the whole fact; the
    re-aggregate-and-join form never touches the fact twice."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    rev = (o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
                  o.o_custkey == F.col("c_custkey"))
           .join(F.broadcast(n.select("n_nationkey", "n_regionkey")),
                 F.col("c_nationkey") == F.col("n_nationkey"))
           .groupBy(F.col("n_regionkey").alias("region_key"),
                    F.col("c_nationkey").alias("nation_key"))
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders")))
    reg = (rev.groupBy("region_key")
           .agg(F.sum("n_orders").cast("bigint").alias("region_total")))
    tot = rev.agg(F.sum("n_orders").cast("bigint").alias("grand_total"))
    return (rev.join(F.broadcast(reg), "region_key")
            .crossJoin(F.broadcast(tot))
            .select("region_key", "nation_key", "n_orders", "region_total",
                    (F.col("n_orders") / F.col("region_total").cast("double"))
                    .alias("share_of_region"),
                    (F.col("n_orders") / F.col("grand_total").cast("double"))
                    .alias("share_of_total")))


@query("timeseries_theil_sen", oracle="""
WITH m AS (
  SELECT o_orderpriority AS grp,
         date_trunc('month', o_orderdate) AS month,
         count(*) AS y
  FROM orders GROUP BY 1, 2),
s AS (
  SELECT grp, CAST(y AS BIGINT) AS y,
         row_number() OVER (PARTITION BY grp ORDER BY month) AS t
  FROM m),
pr AS (
  SELECT a.grp, a.t AS t1, b.t AS t2,
         (b.y - a.y) * 1.0 / (b.t - a.t) AS slope
  FROM s a JOIN s b ON a.grp = b.grp AND a.t < b.t),
rk AS (
  SELECT grp, slope,
         row_number() OVER (PARTITION BY grp
                            ORDER BY slope, t1, t2) AS rn,
         count(*) OVER (PARTITION BY grp) AS n_pairs
  FROM pr),
sen AS (
  SELECT grp, slope AS sen_slope, n_pairs FROM rk
  WHERE rn = (n_pairs + 1) // 2),
ry AS (
  SELECT grp, y, t,
         row_number() OVER (PARTITION BY grp ORDER BY y, t) AS rn,
         count(*) OVER (PARTITION BY grp) AS n_points
  FROM s),
med AS (
  SELECT grp, CAST(y AS DOUBLE) AS med_y, t AS med_t, n_points FROM ry
  WHERE rn = (n_points + 1) // 2)
SELECT sen.grp AS o_orderpriority,
       CAST(med.n_points AS BIGINT) AS n_points,
       CAST(sen.n_pairs AS BIGINT) AS n_pairs,
       round(sen.sen_slope, 6) AS sen_slope,
       round(med.med_y - sen.sen_slope * med.med_t, 6) AS sen_intercept
FROM sen JOIN med ON sen.grp = med.grp
""")
def timeseries_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL-SEN robust trend estimator (Theil 1950; Sen 1968 — the
    median-of-pairwise-slopes line, 29% breakdown point vs OLS's
    zero): per order-priority monthly series, every pair (t1<t2)
    contributes slope (y2-y1)/(t2-t1); the estimate is the LOWER
    MEDIAN slope with a total order (slope, t1, t2), and the intercept
    is med(y) - slope*med(t) (Sen's form, lower medians throughout).
    The robust-regression sibling of timeseries_holt_linear
    (smoothing) and ml_ols_two_feature (L2 fit): one outlier month
    (promo spike, logging gap) moves OLS arbitrarily but not this.

    Determinism: slopes are int64-difference ratios — identical
    doubles cross-engine — and every median is a row_number pick at
    rank (n+1)//2 under an explicit total order, never an
    interpolating percentile (whose engine conventions differ).

    Scale shape: the pair join is per-SERIES quadratic, C(len,2) rows
    for a report-sized len (~80 months) — series-length state, not
    corpus state; the corpus-wide work is the same monthly
    pre-aggregate as Holt (one combiner'd shuffle). For very long
    series production uses the repeated-median or spatial-median
    refinements; the per-group window picks stay identical."""
    orders = load(spark, sf_dir, "orders")
    m = (orders.groupBy(
            F.col("o_orderpriority").alias("grp"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
         .agg(F.count(F.lit(1)).cast("bigint").alias("y")))
    s = m.select("grp", "y", F.row_number().over(
        W.partitionBy("grp").orderBy("month")).alias("t"))
    a, b = s.alias("a"), s.alias("b")
    pr = (a.join(b, (F.col("a.grp") == F.col("b.grp"))
                 & (F.col("a.t") < F.col("b.t")))
          .select(F.col("a.grp").alias("grp"),
                  F.col("a.t").alias("t1"), F.col("b.t").alias("t2"),
                  ((F.col("b.y") - F.col("a.y")) * 1.0
                   / (F.col("b.t") - F.col("a.t"))).alias("slope")))
    wr = W.partitionBy("grp").orderBy("slope", "t1", "t2")
    wall = W.partitionBy("grp")
    rk = (pr.withColumn("rn", F.row_number().over(wr))
          .withColumn("n_pairs", F.count(F.lit(1)).over(wall)))
    sen = (rk.filter(F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2))
           .select("grp", F.col("slope").alias("sen_slope"), "n_pairs"))
    wy = W.partitionBy("grp").orderBy("y", "t")
    ry = (s.withColumn("rn", F.row_number().over(wy))
          .withColumn("n_points", F.count(F.lit(1)).over(wall)))
    med = (ry.filter(F.col("rn") == F.floor((F.col("n_points") + 1) / 2))
           .select("grp", F.col("y").cast("double").alias("med_y"),
                   F.col("t").alias("med_t"), "n_points"))
    return (sen.join(med, "grp")
            .select(F.col("grp").alias("o_orderpriority"),
                    F.col("n_points").cast("bigint").alias("n_points"),
                    F.col("n_pairs").cast("bigint").alias("n_pairs"),
                    F.round("sen_slope", 6).alias("sen_slope"),
                    F.round(F.col("med_y")
                            - F.col("sen_slope") * F.col("med_t"), 6)
                    .alias("sen_intercept")))


_SEQ_TOPK = 10  # patterns reported per length


@query("events_prefixspan_topk", oracle=f"""
WITH tok AS (
  SELECT user_id AS u, event_type AS t,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS pos
  FROM events),
fa AS (SELECT u, t AS a, min(pos) AS pa FROM tok GROUP BY u, t),
ep AS (
  SELECT fa.u, fa.a, b.t AS b, min(b.pos) AS pb
  FROM fa JOIN tok b ON b.u = fa.u AND b.pos > fa.pa
  GROUP BY fa.u, fa.a, b.t),
sup2 AS (
  SELECT a || '->' || b AS pattern, CAST(count(*) AS BIGINT) AS support
  FROM ep GROUP BY a, b),
tri AS (
  SELECT DISTINCT ep.u, ep.a, ep.b, c.t AS c
  FROM ep JOIN tok c ON c.u = ep.u AND c.pos > ep.pb),
sup3 AS (
  SELECT a || '->' || b || '->' || c AS pattern,
         CAST(count(*) AS BIGINT) AS support
  FROM tri GROUP BY a, b, c),
ranked AS (
  SELECT CAST(2 AS BIGINT) AS length, pattern, support,
         row_number() OVER (ORDER BY support DESC, pattern) AS rnk
  FROM sup2
  UNION ALL
  SELECT CAST(3 AS BIGINT), pattern, support,
         row_number() OVER (ORDER BY support DESC, pattern) AS rnk
  FROM sup3)
SELECT length, CAST(rnk AS BIGINT) AS rnk, pattern, support
FROM ranked WHERE rnk <= {_SEQ_TOPK}
""")
def events_prefixspan_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENTIAL PATTERN MINING, PrefixSpan-style (Pei et al. 2001) —
    the DISCOVERY twin of events_pattern_match_sequence (which counts
    occurrences of patterns you already know): top-{_SEQ_TOPK}
    length-2 and length-3 event-type subsequences by user support
    (support = number of users whose ordered history contains the
    pattern as a subsequence, any gaps). Existence uses the
    EARLIEST-OCCURRENCE projection PrefixSpan is built on: a user
    matches a->b->c iff scanning greedily (first a, first b after it,
    any c after that) succeeds — so each extension is one keyed join
    against the position table followed by a min-aggregate, which is
    literally PrefixSpan's projected-database step spelled
    relationally.

    Determinism: positions tiebreak on (ts, event_id); supports are
    exact bigints; ranking orders (support DESC, pattern).

    Scale shape: one user-keyed shuffle to build positions; each
    extension joins the (user, prefix) frontier to the token table on
    the user key — frontier width is users x alphabet^k, bounded by
    the alphabet (5 types here), NOT history length; per-user work is
    linear in history per extension. Deep patterns prune by support
    (the a-priori property) exactly as PrefixSpan does."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    tok = ev.select(
        F.col("user_id").alias("u"), F.col("event_type").alias("t"),
        F.row_number().over(
            W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("pos"))
    tok.persist()
    fa = tok.groupBy("u", F.col("t").alias("a")).agg(F.min("pos").alias("pa"))
    b = tok.select(F.col("u").alias("ub"), F.col("t").alias("b"),
                   F.col("pos").alias("posb"))
    ep = (fa.join(b, (F.col("u") == F.col("ub"))
                  & (F.col("posb") > F.col("pa")))
          .groupBy("u", "a", "b").agg(F.min("posb").alias("pb")))
    sup2 = (ep.groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
            .select(F.concat_ws("->", "a", "b").alias("pattern"),
                    "support"))
    c = tok.select(F.col("u").alias("uc"), F.col("t").alias("c"),
                   F.col("pos").alias("posc"))
    tri = (ep.join(c, (F.col("u") == F.col("uc"))
                   & (F.col("posc") > F.col("pb")))
           .select("u", "a", "b", "c").distinct())
    sup3 = (tri.groupBy("a", "b", "c")
            .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
            .select(F.concat_ws("->", "a", "b", "c").alias("pattern"),
                    "support"))

    def rank(df, length):
        rnk = F.row_number().over(
            W.orderBy(F.desc("support"), F.asc("pattern")))
        return (df.withColumn("rnk", rnk.cast("bigint"))
                .filter(F.col("rnk") <= _SEQ_TOPK)
                .select(F.lit(length).cast("bigint").alias("length"),
                        "rnk", "pattern", "support"))

    return rank(sup2, 2).unionByName(rank(sup3, 3))


# Shapley attribution: the 4 touchpoint channels (purchase is the
# conversion) and the exact coalition weights |S|!(n-1-|S|)!/n! scaled
# by n! = 24 so every weight is a small integer.
_SHAP_CHANNELS = [("click", 1), ("view", 2), ("signup", 4), ("error", 8)]
_SHAP_W24 = {0: 6, 1: 2, 2: 2, 3: 6}  # 24 * |S|!(3-|S|)!/4!


def _shapley_oracle() -> str:
    bit_case = " ".join(f"WHEN '{c}' THEN {b}" for c, b in _SHAP_CHANNELS)
    chan_rows = " UNION ALL ".join(
        f"SELECT '{c}' AS channel, {b} AS bit" for c, b in _SHAP_CHANNELS)
    w_case = " ".join(f"WHEN {k} THEN {v}" for k, v in _SHAP_W24.items())
    return f"""
WITH expo AS (
  SELECT user_id,
         coalesce(bit_or(CASE event_type {bit_case} ELSE 0 END), 0)
           AS mask,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY user_id),
cells AS (
  SELECT mask, count(*) AS users, sum(converted) AS convs,
         CAST(round(1000000.0 * sum(converted) / count(*)) AS BIGINT)
           AS vmicro
  FROM expo GROUP BY mask),
chans AS ({chan_rows}),
subsets AS (
  SELECT c.channel, c.bit, r.s AS smask,
         CAST(CASE bit_count(r.s) {w_case} END AS BIGINT) AS w24
  FROM chans c JOIN range(16) r(s) ON (r.s & c.bit) = 0),
terms AS (
  SELECT s.channel,
         s.w24 * (coalesce(ci.vmicro, 0) - coalesce(cs.vmicro, 0))
           AS term
  FROM subsets s
  LEFT JOIN cells cs ON cs.mask = s.smask
  LEFT JOIN cells ci ON ci.mask = s.smask | s.bit)
SELECT channel,
       CAST(sum(term) AS BIGINT) AS shapley_scaled24_micro,
       round(sum(term) / 24000000.0, 6) AS shapley
FROM terms GROUP BY channel
"""


@query("events_attribution_shapley", oracle=_shapley_oracle())
def events_attribution_shapley(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """SHAPLEY-VALUE marketing attribution (Shapley 1953; the
    data-driven multi-touch model that replaced last-touch in ad
    platforms): each touchpoint channel's credit for conversion is its
    average marginal contribution over all coalition orderings, with
    the characteristic function v(S) = observed conversion rate of
    users exposed to EXACTLY channel set S (unobserved cells contribute
    v = 0; the empty set is the no-exposure baseline). The exact
    complement of events_attribution_last_touch, which this engine
    already ships.

    Exactness: coalition weights |S|!(n-1-|S|)!/n! scale by n! = 24 to
    small INTEGERS; conversion rates snap to integer micro-units; every
    Shapley value is then an exact int64 sum (watch #4 grid), and the
    efficiency axiom sum_i phi_i = v(all) - v(empty) holds as an exact
    integer identity the tests pin.

    Scale shape: one user-keyed aggregate to exposure cells (2^n rows,
    n = 4 channels), then pure algebra on the cell table — Shapley over
    a petabyte of touchpoints costs one combiner'd scan. Exact Shapley
    is exponential in CHANNELS, not data (n <= ~20 is the practical
    ceiling; beyond that, permutation sampling over the same cell
    table)."""
    ev = load(spark, sf_dir, "events")
    bit = F.lit(0)
    for c, b in _SHAP_CHANNELS:
        bit = F.when(F.col("event_type") == c, b).otherwise(bit)
    expo = (ev.groupBy("user_id")
            .agg(F.coalesce(F.bit_or(bit), F.lit(0)).alias("mask"),
                 F.max(F.when(F.col("event_type") == "purchase", 1)
                       .otherwise(0)).alias("converted")))
    cells = (expo.groupBy("mask")
             .agg(F.round(1000000.0 * F.sum("converted")
                          / F.count(F.lit(1)))
                  .cast("bigint").alias("vmicro")))
    chans = spark.createDataFrame(_SHAP_CHANNELS, "channel string, bit int")
    subsets = (chans.crossJoin(
                   spark.range(16).select(F.col("id").cast("int")
                                          .alias("smask")))
               .filter(F.expr("smask & bit") == 0)
               .withColumn("w24", F.coalesce(*[
                   F.when(F.bit_count(F.col("smask")) == k, F.lit(v))
                   for k, v in _SHAP_W24.items()]).cast("bigint")))
    cs = cells.select(F.col("mask").alias("m0"),
                      F.col("vmicro").alias("v0"))
    ci = cells.select(F.col("mask").alias("m1"),
                      F.col("vmicro").alias("v1"))
    terms = (subsets
             .join(F.broadcast(cs), F.col("smask") == F.col("m0"), "left")
             .join(F.broadcast(ci),
                   F.expr("smask | bit") == F.col("m1"), "left")
             .select("channel",
                     (F.col("w24") * (F.coalesce("v1", F.lit(0))
                                      - F.coalesce("v0", F.lit(0))))
                     .alias("term")))
    return (terms.groupBy("channel")
            .agg(F.sum("term").cast("bigint")
                 .alias("shapley_scaled24_micro"),
                 F.round(F.sum("term") / 24000000.0, 6).alias("shapley")))


_MKV_ITER = 3  # unrolled power-iteration steps (pagerank's convention)


def _markov_stationary_oracle() -> str:
    step = """
r{k} AS (
  SELECT t.nxt AS st, sum(r{p}.pi * t.n * 1.0 / t.tot) AS pi
  FROM trans t JOIN r{p} ON r{p}.st = t.cur
  GROUP BY t.nxt)"""
    steps = ",".join(step.format(k=k, p=k - 1)
                     for k in range(1, _MKV_ITER + 1))
    return f"""
WITH s AS (
  SELECT user_id, event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events),
c AS (SELECT cur, nxt, count(*) AS n FROM s
      WHERE nxt IS NOT NULL GROUP BY cur, nxt),
trans AS MATERIALIZED (
  SELECT cur, nxt, n, sum(n) OVER (PARTITION BY cur) AS tot FROM c),
states AS (SELECT DISTINCT cur AS st FROM trans),
ns AS (SELECT cast(count(*) AS DOUBLE) AS n FROM states),
r0 AS (SELECT st, 1.0 / ns.n AS pi FROM states CROSS JOIN ns),
{steps}
SELECT st AS event_type, round(pi, 6) AS pi
FROM r{_MKV_ITER}
"""


@query("events_markov_stationary", oracle=_markov_stationary_oracle())
def events_markov_stationary(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """STATIONARY DISTRIBUTION of the user-behavior Markov chain —
    where the events_markov_transitions matrix sends long-run session
    mass (the "steady-state intent mix" behind engagement forecasting;
    also exactly undamped PageRank on the behavior graph): pi_(k+1) =
    pi_k P, {_MKV_ITER} unrolled power-iteration steps from the
    uniform vector, on the same (ts, event_id)-ordered transition
    counts the transition query ships.

    Determinism: transition counts/totals are exact bigints; rank
    propagation is the one float path (identical expression trees,
    graph_pagerank_nations' posture) rounded once at the output. The
    chain here is irreducible (every type follows every type at this
    corpus size), so the iteration contracts toward the unique
    stationary point; the test pins mass conservation at exactly the
    simplex (sum pi ~ 1).

    Scale shape: one user-keyed window pass (shared with the
    transition query), then all iterations are algebra on the
    |types|^2 matrix — long-run behavior of a petabyte of events costs
    one shuffle plus model-state iterations."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(F.col("event_type").alias("cur"),
                  F.lead("event_type").over(w).alias("nxt"))
    c = (s.filter(F.col("nxt").isNotNull())
         .groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n")))
    trans = c.withColumn("tot", F.sum("n").over(W.partitionBy("cur")))
    trans.persist()
    states = trans.select(F.col("cur").alias("st")).distinct()
    n_states = states.count()
    pi = states.withColumn("pi", F.lit(1.0 / n_states))
    for _ in range(_MKV_ITER):
        pi = (trans.join(pi, trans.cur == pi.st)
              .groupBy(F.col("nxt").alias("st"))
              .agg(F.sum(F.col("pi") * F.col("n") * 1.0 / F.col("tot"))
                   .alias("pi")))
    return pi.select(F.col("st").alias("event_type"),
                     F.round("pi", 6).alias("pi"))


@query("timeseries_mann_kendall", oracle="""
WITH m AS (
  SELECT o_orderpriority AS grp,
         date_trunc('month', o_orderdate) AS month,
         count(*) AS y
  FROM orders GROUP BY 1, 2),
s AS (
  SELECT grp, CAST(y AS BIGINT) AS y,
         row_number() OVER (PARTITION BY grp ORDER BY month) AS t
  FROM m),
pairs AS (
  SELECT a.grp,
         CASE WHEN b.y > a.y THEN 1
              WHEN b.y < a.y THEN -1 ELSE 0 END AS sgn
  FROM s a JOIN s b ON a.grp = b.grp AND a.t < b.t),
ss AS (SELECT grp, CAST(sum(sgn) AS BIGINT) AS s_stat
       FROM pairs GROUP BY grp),
np AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY grp),
tie_term AS (
  SELECT grp,
         CAST(sum(tcnt * (tcnt - 1) * (2 * tcnt + 5)) AS BIGINT) AS tie18
  FROM (SELECT grp, y, count(*) AS tcnt FROM s GROUP BY grp, y)
  GROUP BY grp),
v AS (
  SELECT np.grp, np.n,
         np.n * (np.n - 1) * (2 * np.n + 5)
           - coalesce(tt.tie18, 0) AS var18
  FROM np LEFT JOIN tie_term tt ON np.grp = tt.grp)
SELECT v.grp AS o_orderpriority,
       v.n AS n_points,
       ss.s_stat,
       CAST(v.var18 AS BIGINT) AS var_s_x18,
       round(CASE WHEN ss.s_stat > 0
                    THEN (ss.s_stat - 1) / sqrt(v.var18 / 18.0)
                  WHEN ss.s_stat < 0
                    THEN (ss.s_stat + 1) / sqrt(v.var18 / 18.0)
                  ELSE 0.0 END, 6) AS z_mk,
       CASE WHEN ss.s_stat > 0
              AND (ss.s_stat - 1) / sqrt(v.var18 / 18.0) > 1.959964
              THEN 'increasing'
            WHEN ss.s_stat < 0
              AND (ss.s_stat + 1) / sqrt(v.var18 / 18.0) < -1.959964
              THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM v JOIN ss ON v.grp = ss.grp
""")
def timeseries_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-KENDALL nonparametric trend test (Mann 1945; Kendall 1975)
    — the significance-test sibling of timeseries_theil_sen (production
    trend monitoring runs them together: Sen gives the slope, MK says
    whether the trend is real): per order-priority monthly count
    series, S = sum over i<j of sign(y_j - y_i), tie-corrected variance
    var(S) = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18, and the
    continuity-corrected normal statistic z = (S -/+ 1)/sqrt(var).
    Emits the EXACT integers (s_stat, var_s_x18 = 18*var) alongside the
    rounded z and the 5% two-sided verdict, so the metric core is
    integer-verified and the float appears only in the display column.

    Determinism: S and 18*var(S) are pure int64 arithmetic; z divides
    an integer by sqrt(integer/18.0) — both engines evaluate the same
    double expression tree (IEEE-correctly-rounded sqrt/divide), and
    the all-tied degenerate (var18 = 0) never divides because S = 0
    takes the ELSE branch first.

    Scale shape (same class as Theil-Sen): corpus-wide work is one
    combiner'd monthly pre-aggregate; the sign-pair self-join is
    per-SERIES quadratic over report-sized series (~80 months), i.e.
    model-state work. Groups with a single month have no pairs and are
    dropped by the inner join on both sides. Reference scope: the
    reference has no timeseries surface (SURVEY §2.5); declared
    extension."""
    orders = load(spark, sf_dir, "orders")
    m = (orders.groupBy(
            F.col("o_orderpriority").alias("grp"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
         .agg(F.count(F.lit(1)).cast("bigint").alias("y")))
    s = m.select("grp", "y", F.row_number().over(
        W.partitionBy("grp").orderBy("month")).alias("t"))
    a, b = s.alias("a"), s.alias("b")
    sgn = (F.when(F.col("b.y") > F.col("a.y"), 1)
           .when(F.col("b.y") < F.col("a.y"), -1).otherwise(0))
    ss = (a.join(b, (F.col("a.grp") == F.col("b.grp"))
                 & (F.col("a.t") < F.col("b.t")))
          .select(F.col("a.grp").alias("grp"), sgn.alias("sgn"))
          .groupBy("grp")
          .agg(F.sum("sgn").cast("bigint").alias("s_stat")))
    np_ = s.groupBy("grp").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tie = (s.groupBy("grp", "y").agg(F.count(F.lit(1)).alias("tcnt"))
           .groupBy("grp")
           .agg(F.sum(F.col("tcnt") * (F.col("tcnt") - 1)
                      * (2 * F.col("tcnt") + 5)).cast("bigint")
                .alias("tie18")))
    v = (np_.join(tie, "grp", "left")
         .select("grp", "n",
                 (F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                  - F.coalesce(F.col("tie18"), F.lit(0)))
                 .cast("bigint").alias("var18")))
    z = (F.when(F.col("s_stat") > 0,
                (F.col("s_stat") - 1) / F.sqrt(F.col("var18") / 18.0))
         .when(F.col("s_stat") < 0,
               (F.col("s_stat") + 1) / F.sqrt(F.col("var18") / 18.0))
         .otherwise(F.lit(0.0)))
    return (v.join(ss, "grp")
            .select(F.col("grp").alias("o_orderpriority"),
                    F.col("n").alias("n_points"),
                    "s_stat",
                    F.col("var18").alias("var_s_x18"),
                    F.round(z, 6).alias("z_mk"),
                    F.when((F.col("s_stat") > 0) & (z > 1.959964),
                           "increasing")
                    .when((F.col("s_stat") < 0) & (z < -1.959964),
                          "decreasing")
                    .otherwise("no_trend").alias("trend")))


# SPRT design constants: H0 conversion p0 vs H1 p1 (the minimum
# detectable effect), alpha = beta = 0.05 -> Wald boundaries
# ln((1-beta)/alpha), ln(beta/(1-alpha)). The per-observation
# log-likelihood increments and both boundaries are snapped to the
# integer micro-log grid INSIDE each engine from the same literals, so
# the cumulative walk is pure int64.
_SPRT_P0, _SPRT_P1 = 0.10, 0.15


@query("ab_sequential_sprt", oracle=f"""
WITH kk AS (
  SELECT CAST(round(ln({_SPRT_P1} / {_SPRT_P0}) * 1000000) AS BIGINT)
           AS inc1,
         CAST(round(ln((1 - {_SPRT_P1}) / (1 - {_SPRT_P0})) * 1000000)
              AS BIGINT) AS inc0,
         CAST(round(ln(0.95 / 0.05) * 1000000) AS BIGINT) AS a_up,
         CAST(round(ln(0.05 / 0.95) * 1000000) AS BIGINT) AS b_lo),
ev AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
           % 2 AS arm,
         ts, event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x
  FROM events),
seq AS (
  SELECT arm, x, ts, event_id,
         row_number() OVER (PARTITION BY arm ORDER BY ts, event_id)
           AS rn,
         sum(CASE WHEN x = 1 THEN kk.inc1 ELSE kk.inc0 END)
           OVER (PARTITION BY arm ORDER BY ts, event_id) AS llr
  FROM ev CROSS JOIN kk),
stops AS (
  SELECT s.arm, min(s.rn) AS stop_n
  FROM seq s CROSS JOIN kk
  WHERE s.llr >= kk.a_up OR s.llr <= kk.b_lo
  GROUP BY s.arm),
agg AS (
  SELECT arm, CAST(max(rn) AS BIGINT) AS n_obs,
         CAST(sum(x) AS BIGINT) AS n_conv
  FROM seq GROUP BY arm)
SELECT a.arm, a.n_obs, a.n_conv,
       CAST(st.stop_n AS BIGINT) AS stop_n,
       CAST(sq.llr AS BIGINT) AS llr_stop_micro,
       CASE WHEN st.stop_n IS NULL THEN 'continue'
            WHEN sq.llr >= kk.a_up THEN 'accept_h1'
            ELSE 'accept_h0' END AS decision
FROM agg a
CROSS JOIN kk
LEFT JOIN stops st ON st.arm = a.arm
LEFT JOIN seq sq ON sq.arm = a.arm AND sq.rn = st.stop_n
""")
def ab_sequential_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD'S SEQUENTIAL PROBABILITY RATIO TEST (Wald 1945) — the
    always-valid sequential A/B decision that lets an experiment stop
    the moment the evidence crosses a boundary instead of waiting for
    a fixed horizon (the peeking problem ab_srm_check's fixed-N
    chi-square cannot survive): per deterministic hash arm, walk the
    purchase-conversion event stream in time order accumulating the
    log-likelihood ratio of H1 (p = {_SPRT_P1}) vs H0 (p = {_SPRT_P0});
    stop at the first crossing of ln((1-b)/a) (accept H1) or
    ln(b/(1-a)) (accept H0) at a = b = 0.05. Completes the experiment
    family: SRM guardrail, diff-in-diff, bootstrap CI, and now
    sequential testing.

    Determinism: the per-observation increments and both boundaries
    snap to the integer micro-log grid from the SAME literals inside
    each engine (same double -> same round -> same int64), so the
    cumulative walk, the first-crossing argmin, and the verdict are
    exact integer comparisons; (ts, event_id) is a total order.

    Scale shape — TWO-PHASE PREFIX SUM (the corpus_sequence_pack
    discipline): a window partitioned only BY ARM serializes each
    arm's entire history into one task (measured 7.3s at sf1, 4.6x the
    sf0.1 wall, while every other round-9 operator stayed flat — the
    2-partition sort was the whole regression). Instead the walk
    shards on the calendar DAY: shard-local running sums via a window
    partitioned by (arm, day), per-shard totals cumulated over the
    days-sized shard table, offsets broadcast back. Same int64
    cumulative values bit-for-bit; parallelism = arms x days and the
    shard count GROWS with the data span (a finer key — hour — is the
    same one-line change if per-day volume outgrows a task).
    Reference scope: no experimentation surface in the reference
    (SURVEY §2.5); declared extension."""
    from pyspark.sql import Window as W2

    from ..functions.vector import det_hash64

    ev = load(spark, sf_dir, "events")
    inc1 = F.round(F.log(F.lit(_SPRT_P1) / F.lit(_SPRT_P0)) * 1000000)\
        .cast("bigint")
    inc0 = F.round(F.log(F.lit(1 - _SPRT_P1) / F.lit(1 - _SPRT_P0))
                   * 1000000).cast("bigint")
    a_up = F.round(F.log(F.lit(0.95) / F.lit(0.05)) * 1000000).cast("bigint")
    b_lo = F.round(F.log(F.lit(0.05) / F.lit(0.95)) * 1000000).cast("bigint")
    base = ev.select(
        (det_hash64(F.col("user_id").cast("string")) % 2).alias("arm"),
        "ts", "event_id",
        F.date_trunc("day", "ts").alias("shard"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        .alias("x"))
    inc = F.when(F.col("x") == 1, inc1).otherwise(inc0)
    wloc = W2.partitionBy("arm", "shard").orderBy("ts", "event_id")
    local = base.select(
        "arm", "shard", "x",
        F.row_number().over(wloc).alias("loc_rn"),
        F.sum(inc).over(wloc).alias("loc_llr"))
    # per-(arm, shard) totals -> exclusive prefix offsets over the tiny
    # shard table (weeks-sized), then broadcast back
    wsh = (W2.partitionBy("arm").orderBy("shard")
           .rowsBetween(W2.unboundedPreceding, -1))
    offs = (base.groupBy("arm", "shard")
            .agg(F.count(F.lit(1)).alias("sh_n"),
                 F.sum(inc).alias("sh_llr"))
            .select("arm", "shard",
                    F.coalesce(F.sum("sh_n").over(wsh), F.lit(0))
                    .alias("off_n"),
                    F.coalesce(F.sum("sh_llr").over(wsh), F.lit(0))
                    .alias("off_llr")))
    seq = (local.join(F.broadcast(offs), ["arm", "shard"])
           .select("arm", "x",
                   (F.col("loc_rn") + F.col("off_n")).alias("rn"),
                   (F.col("loc_llr") + F.col("off_llr")).alias("llr")))
    # ONE grouped pass: the first crossing is min(struct(rn, llr)) over
    # crossing rows (rn unique per arm -> picks the row; min skips the
    # NULL non-crossing rows). The previous 3-subframe join recomputed
    # the whole sharded scan three times (measured 3.5x at sf1).
    crossed = (F.col("llr") >= a_up) | (F.col("llr") <= b_lo)
    agg = seq.groupBy("arm").agg(
        F.max("rn").cast("bigint").alias("n_obs"),
        F.sum("x").cast("bigint").alias("n_conv"),
        F.min(F.when(crossed, F.struct("rn", "llr"))).alias("stop"))
    return agg.select(
        "arm", "n_obs", "n_conv",
        F.col("stop.rn").cast("bigint").alias("stop_n"),
        F.col("stop.llr").cast("bigint").alias("llr_stop_micro"),
        F.when(F.col("stop").isNull(), "continue")
        .when(F.col("stop.llr") >= a_up, "accept_h1")
        .otherwise("accept_h0").alias("decision"))
