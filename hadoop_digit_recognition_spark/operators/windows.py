"""Event-time windowing + temporal joins over the events table
(SURVEY.md §2.5 'streaming' row — the reference is pure batch; these are
the batch-mode equivalents of the Structured Streaming operators, which
the t2 oracle can check; the streaming variants with watermarks live in
streaming/ and are covered by parity tests).

All outputs are session-timezone-proof: events.ts is TIMESTAMP_NTZ
(tables._load_events) and every boundary computation is pure wall-time
arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query("window_tumbling", oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
       count(*) AS n, round(sum(value), 6) AS total
FROM events GROUP BY 1, 2
""")
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows via F.window (epoch-aligned, same origin
    as DuckDB time_bucket)."""
    ev = load(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 6).alias("total"))
            .select(F.col("w.start").alias("ws"), "event_type", "n", "total"))


@query("window_sliding", oracle="""
SELECT ws, count(*) AS n, round(sum(value), 6) AS total
FROM (
  SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' AS ws, value
  FROM events
) GROUP BY ws
""")
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 10-minute windows every 5 minutes: each event lands in
    exactly two windows (duration/slide = 2), which is what the oracle's
    two-bucket UNION reproduces."""
    ev = load(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 6).alias("total"))
            .select(F.col("w.start").alias("ws"), "n", "total"))


_SESSION_ORACLE = """
WITH m AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM m
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM s GROUP BY user_id, sid
"""


@query("window_session", oracle=_SESSION_ORACLE)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap using Spark's
    native session_window (merging-window aggregation). The oracle derives
    identical sessions relationally (lag -> break flag -> running count)."""
    ev = load(spark, sf_dir, "events")
    return (ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id", F.col("w.start").alias("session_start"), "n_events"))


@query("sessionize_relational", oracle=f"""
WITH base AS ({_SESSION_ORACLE})
SELECT user_id, count(*) AS n_sessions,
       CAST(max(n_events) AS BIGINT) AS max_session_events
FROM base GROUP BY user_id
""")
def sessionize_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lag+cumsum sessionization built directly in DataFrame ops —
    proof the merging-window operator decomposes into two window
    functions + a groupBy (the form any engine without session_window
    would use)."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # break on gap >= 30min: session_window is half-open [start, last+gap),
    # so an event at exactly last+gap starts a NEW session
    brk = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") >= F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")),
        1).otherwise(0)
    run = W.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = (ev.withColumn("brk", brk)
            .withColumn("sid", F.sum("brk").over(run))
            .groupBy("user_id", "sid")
            .agg(F.count(F.lit(1)).alias("n_events")))
    return (sess.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.max("n_events").cast("bigint").alias("max_session_events")))


@query("asof_join", oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id,
       p.user_id AS user_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""")
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: each purchase matched to the latest click at
    or before it, per user. Spark has no native ASOF; this is the
    union+last_value decomposition — one shuffle on user_id, one ordered
    window pass, no range explosion (SURVEY.md §2.5 'range/as-of' row).

    Tie rule: clicks sort before purchases at equal ts (kind 0 < 1),
    matching DuckDB ASOF's >= semantics."""
    ev = load(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts", F.lit(0).alias("kind"),
                      F.col("event_id"), F.col("event_id").alias("click_id")))
    purch = (ev.filter(F.col("event_type") == "purchase")
             .select("user_id", "ts", F.lit(1).alias("kind"),
                     F.col("event_id"), F.lit(None).cast("long").alias("click_id")))
    w = (W.partitionBy("user_id").orderBy("ts", "kind", "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    merged = (clicks.unionByName(purch)
              .withColumn("last_click", F.last("click_id", ignorenulls=True).over(w)))
    return (merged.filter((F.col("kind") == 1) & F.col("last_click").isNotNull())
            .select(F.col("event_id").alias("purchase_id"),
                    F.col("last_click").alias("click_id"),
                    "user_id"))


@query("window_time_range_frame", oracle="""
WITH e AS (SELECT event_id, user_id, value, epoch_us(ts) AS us FROM events)
SELECT event_id, user_id,
       count(*) OVER w AS n_1h,
       round(sum(value) OVER w, 6) AS sum_1h
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""")
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frame: per user, the trailing 1-hour
    moving count/sum at every event. RANGE frames bound by the ORDER
    column's VALUES (all events within 1h), unlike ROWS frames which
    bound by position — the semantic every trailing-window feature
    pipeline needs. Ordered by exact epoch micros (ts_us) so the frame
    arithmetic is integer-exact on both engines."""
    ev = load(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts_us")
         .rangeBetween(-3_600_000_000, W.currentRow))
    return ev.select(
        "event_id", "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 6).alias("sum_1h"))


@query("timeseries_gapfill", oracle="""
WITH b AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS h, count(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT time_bucket(INTERVAL '1 hour', min(ts)) AS lo,
         time_bucket(INTERVAL '1 hour', max(ts)) AS hi
  FROM events
),
grid AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                            (SELECT hi FROM bounds),
                                            INTERVAL '1 hour')) AS h) g
)
SELECT g.event_type, g.h AS bucket, coalesce(b.n, 0) AS n
FROM grid g LEFT JOIN b ON b.event_type = g.event_type AND b.h = g.h
""")
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with gap filling: hourly counts per event
    type INCLUDING empty hours (n=0) — the densification every
    downstream time-series model needs. Bounds come to the driver as two
    timestamps (scalar budget) and fold back as literals; the bucket
    grid is sequence(lo, hi) exploded per type (grid size = types x
    hours — metadata-scale, broadcast side of the left join); observed
    counts come from the usual tumbling aggregate. No window functions, no
    global sort; the only data-sized shuffle is the tumbling groupBy."""
    ev = load(spark, sf_dir, "events")
    counts = (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
              .agg(F.count(F.lit(1)).alias("n"))
              .select(F.col("w.start").alias("bucket"), "event_type", "n"))
    lo, hi = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi")).first()
    grid = (ev.select("event_type").distinct()
            .select("event_type",
                    F.explode(F.sequence(
                        F.lit(lo).cast("timestamp_ntz"),
                        F.lit(hi).cast("timestamp_ntz"),
                        F.expr("INTERVAL 1 HOUR"))).alias("bucket")))
    return (grid.join(counts, ["event_type", "bucket"], "left")
            .select("event_type", "bucket",
                    F.coalesce("n", F.lit(0)).cast("bigint").alias("n")))


@query("funnel_conversion", oracle="""
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view'     THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
  FROM events GROUP BY user_id
)
SELECT count(*) AS n_users,
       CAST(count(t_view) AS BIGINT) AS n_view,
       CAST(sum(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)
         AS n_view_then_click,
       CAST(sum(CASE WHEN t_buy > t_click AND t_click > t_view
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
FROM firsts
""")
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (view -> click -> purchase, first
    occurrences in order) — the product-analytics sequence operator.
    One conditional-min aggregate per user (single shuffle on user_id,
    partial+final), then a scalar funnel count; no self-joins, no
    per-step passes — the n-way sequence collapses into one grouped
    pass, which is what keeps funnels tractable over 100 TB of events.
    NULL ordering does the step gating: a missing earlier step leaves
    the comparison NULL, which fails the predicate on both engines."""
    ev = load(spark, sf_dir, "events")
    firsts = (ev.groupBy("user_id")
              .agg(F.min(F.when(F.col("event_type") == "view", F.col("ts")))
                   .alias("t_view"),
                   F.min(F.when(F.col("event_type") == "click", F.col("ts")))
                   .alias("t_click"),
                   F.min(F.when(F.col("event_type") == "purchase",
                                F.col("ts"))).alias("t_buy")))
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").cast("bigint").alias("n_view"),
        F.sum(F.when(F.col("t_click") > F.col("t_view"), 1).otherwise(0))
        .cast("bigint").alias("n_view_then_click"),
        F.sum(F.when((F.col("t_buy") > F.col("t_click"))
                     & (F.col("t_click") > F.col("t_view")), 1).otherwise(0))
        .cast("bigint").alias("n_full_funnel"))


@query("cohort_retention", oracle="""
WITH activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
),
cohorts AS (
  SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY user_id
)
SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(a.day - c.cohort_day AS BIGINT) AS k,
       count(DISTINCT a.user_id) AS n_active
FROM activity a JOIN cohorts c ON c.user_id = a.user_id
WHERE a.day - c.cohort_day <= 7
GROUP BY 1, 2
""")
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active day,
    counted distinct on each of the next 7 days. Two keyed aggregates
    (per-user first day; per-(cohort, offset) distinct count) and one
    equi-join — at scale the distinct count is the state to watch, and
    its bounded-state replacement is exactly the HLL register rollup
    (sketch_hll_merge_rollup) keyed by (cohort_day, k)."""
    ev = load(spark, sf_dir, "events")
    activity = (ev.select("user_id",
                          F.date_trunc("day", "ts").cast("date").alias("day"))
                .distinct())
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (activity.join(cohorts, "user_id")
            .withColumn("k", F.datediff("day", "cohort_day").cast("bigint"))
            .filter(F.col("k") <= 7)
            .groupBy(F.date_format("cohort_day", "yyyy-MM-dd")
                     .alias("cohort_day"), "k")
            .agg(F.countDistinct("user_id").alias("n_active")))


@query("streaks_gaps_islands", oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
),
isl AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                    AS INTEGER) AS island
  FROM days
),
streaks AS (
  SELECT user_id, island,
         count(*) AS streak_len,
         strftime(min(day), '%Y-%m-%d') AS streak_start
  FROM isl GROUP BY user_id, island
)
SELECT user_id, streak_start, streak_len
FROM streaks WHERE streak_len >= 3
""")
def streaks_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-day activity streaks per user via
    the classic (day - row_number) island key — consecutive days share
    a constant difference, so one window + one groupBy finds every
    maximal run with no self-joins or recursion. Reports streaks of 3+
    days. Scale shape: the window partitions by user (keyed sort, no
    global ordering) and the island aggregate reuses the same hash
    partitioning."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    days = (ev.select("user_id",
                      F.date_trunc("day", "ts").cast("date").alias("day"))
            .distinct())
    w = W.partitionBy("user_id").orderBy("day")
    isl = days.withColumn(
        "island", F.date_sub("day", F.row_number().over(w)))
    return (isl.groupBy("user_id", "island")
            .agg(F.count(F.lit(1)).alias("streak_len"),
                 F.date_format(F.min("day"), "yyyy-MM-dd")
                 .alias("streak_start"))
            .filter(F.col("streak_len") >= 3)
            .select("user_id", "streak_start", "streak_len"))


@query("timeseries_ewma", oracle="""
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(list_reduce(list(CAST(value AS DOUBLE) ORDER BY ts, event_id),
                         (acc, x) -> 0.3 * x + 0.7 * acc), 6) AS ewma
FROM events GROUP BY user_id
""")
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user — ORDER-DEPENDENT
    RECURSION, the class of computation plain window frames can't state
    (ewma_t = a*x_t + (1-a)*ewma_{t-1} has no frame-sum form that is
    numerically safe: the (1-a)^-s rescaling trick overflows/loses
    precision on long series). The engine pattern: sort-collect each
    key's series, then ONE sequential fold — F.aggregate seeded with the
    first element, mirroring DuckDB's list_reduce, so both engines run
    the identical left fold and the result is bit-reproducible.

    At 100 TB: one keyed shuffle; each key's series must fit a task
    (bounded by per-user event counts — for unbounded keys, segment the
    fold: per-chunk (factor, partial) pairs compose associatively and
    reduce in a second keyed pass)."""
    ev = load(spark, sf_dir, "events")
    arr = F.array_sort(F.collect_list(
        F.struct(F.col("ts_us").alias("t"), F.col("event_id").alias("e"),
                 F.col("value").cast("double").alias("v"))))
    vals = F.transform(F.col("__a"), lambda s: s["v"])
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(0.3) * x + F.lit(0.7) * acc)
    return (ev.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"), arr.alias("__a"))
            .select("user_id", "n_events",
                    F.round(ewma, 6).alias("ewma")))


_CUSUM_K = 0.5  # slack (allowed drift per step, in value units)
_CUSUM_H = 5.0  # decision threshold on the accumulated statistic


@query("timeseries_cusum_drift", oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         avg(value) AS x
  FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
),
ser AS (
  SELECT event_type, list(x ORDER BY day) AS xs, count(*) AS n_days
  FROM daily GROUP BY event_type
),
m AS (
  SELECT event_type, xs, n_days,
         list_aggregate(xs, 'sum') / n_days AS mu
  FROM ser
),
c AS (
  SELECT event_type, n_days, mu,
         list_reduce(
           list_prepend(0.0, list_transform(xs, x -> x - mu - {_CUSUM_K})),
           (acc, d) -> greatest(0.0, acc + d)) AS ch,
         list_reduce(
           list_prepend(0.0, list_transform(xs, x -> mu - x - {_CUSUM_K})),
           (acc, d) -> greatest(0.0, acc + d)) AS cl
  FROM m
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       round(mu, 6) AS mu,
       round(ch, 6) AS cusum_high, round(cl, 6) AS cusum_low,
       CAST(CASE WHEN ch > {_CUSUM_H} OR cl > {_CUSUM_H}
            THEN 1 ELSE 0 END AS BIGINT) AS drift
FROM c
""")
def timeseries_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detection per event type — the sequential
    changepoint statistic (Page 1954): S_t = max(0, S_{t-1} + (x_t -
    mu - k)) accumulated over the daily-mean series, one-sided high and
    low, flagged when either crosses the decision threshold. Like EWMA
    this is ORDER-DEPENDENT RECURSION that no window frame states:
    sort-collect each type's daily series, then one explicit left fold
    (seeded 0.0 via list_prepend on the DuckDB side so both engines run
    the identical fold). The series mean also computes FROM the
    collected array, so both engines even share the summation order.

    At 100 TB the shuffled state is days x types (the daily partial
    aggregate) — the raw stream never collects; per-key series length
    is calendar-bounded, so the fold task is O(days)."""
    ev = load(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type",
                        F.date_trunc("day", "ts").cast("date").alias("day"))
             .agg(F.avg("value").alias("x")))
    arr = F.array_sort(F.collect_list(
        F.struct(F.col("day").alias("d"), F.col("x").alias("v"))))
    ser = (daily.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n_days"), arr.alias("__a")))
    xs = F.transform(F.col("__a"), lambda s: s["v"])
    mu = (F.aggregate(xs, F.lit(0.0), lambda a, x: a + x)
          / F.col("n_days"))
    withmu = ser.select("event_type", "n_days", xs.alias("xs"),
                        mu.alias("mu"))

    def cusum(sign: float):
        return F.aggregate(
            F.transform("xs", lambda x: sign * (x - F.col("mu"))
                        - _CUSUM_K),
            F.lit(0.0),
            lambda acc, d: F.greatest(F.lit(0.0), acc + d))

    ch, cl = cusum(1.0), cusum(-1.0)
    # fold with the RAW mu, round for display in a LATER projection —
    # rounding inline would let the same-named output alias capture the
    # reference inside the fold lambdas (the embedding_int8_quantize
    # lesson: Spark resolves lambda column refs against the projection
    # output list when names collide)
    out = withmu.select(
        "event_type", F.col("n_days").cast("bigint").alias("n_days"),
        "mu",
        F.round(ch, 6).alias("cusum_high"),
        F.round(cl, 6).alias("cusum_low"),
        F.when((ch > _CUSUM_H) | (cl > _CUSUM_H), 1).otherwise(0)
        .cast("bigint").alias("drift"))
    return out.select("event_type", "n_days",
                      F.round("mu", 6).alias("mu"),
                      "cusum_high", "cusum_low", "drift")


# ---------------------------------------------------------------------------
# Interval-overlap join via time-bucket decomposition.

_OVL_USERS = 10          # query side: sessions of users < this
_OVL_GAP_MIN = 30        # session gap (matches sessionize_relational)


@query("join_interval_overlap", oracle=f"""
WITH m AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '{_OVL_GAP_MIN} minutes'
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM m
),
sess AS (
  SELECT user_id, sid, min(ts) AS st, max(ts) AS en
  FROM s WHERE user_id < {_OVL_USERS} GROUP BY user_id, sid
),
cnt AS (
  SELECT s.user_id, s.sid, s.st,
         count(e.event_id) AS n_overlap
  FROM sess s LEFT JOIN events e
    ON e.ts >= s.st AND e.ts <= s.en AND e.user_id != s.user_id
  GROUP BY s.user_id, s.sid, s.st
)
SELECT user_id, sid, st AS session_start,
       CAST(n_overlap AS BIGINT) AS n_overlap
FROM cnt
""")
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: for every session of the query users, how
    many OTHER-user events land inside the session's [start, end] window
    — the concurrency/contention primitive (who else was active while
    this session ran) behind incident blast-radius and load-attribution
    queries.

    The oracle states it as the textbook non-equi range join. The Spark
    plan is the scale-correct TIME-BUCKET DECOMPOSITION instead: each
    session explodes to the 1-hour buckets it covers (sessions are
    gap-bounded, so the fan-out is small), events carry their single
    bucket, and the match becomes an EQUI-join on the bucket key with
    the exact range predicate applied after — a bucketed band join,
    never a BNLJ over the event stream. An event matches a session in
    exactly one bucket (its own), so no post-join dedup is needed. The
    left join back onto the session list restores empty sessions as
    zero counts. At 100 TB: one user-keyed window pass to build
    sessions, one bucket-keyed shuffle to match — bucket width tunes
    fan-out vs bucket population exactly like the LSH band knob."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") >= F.lag("ts").over(w)
           + F.expr(f"INTERVAL {_OVL_GAP_MIN} MINUTES")), 1).otherwise(0)
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = (ev.withColumn("brk", brk)
            .withColumn("sid", F.sum("brk").over(run).cast("bigint"))
            .filter(F.col("user_id") < _OVL_USERS)
            .groupBy("user_id", "sid")
            .agg(F.min("ts").alias("st"), F.max("ts").alias("en")))
    sb = sess.withColumn(
        "bucket", F.explode(F.sequence(
            F.date_trunc("hour", F.col("st")),
            F.date_trunc("hour", F.col("en")),
            F.expr("INTERVAL 1 HOUR"))))
    eb = ev.select(F.col("user_id").alias("e_user"), "ts",
                   F.date_trunc("hour", F.col("ts")).alias("bucket"))
    matched = (sb.join(eb, "bucket")
               .filter((F.col("ts") >= F.col("st"))
                       & (F.col("ts") <= F.col("en"))
                       & (F.col("e_user") != F.col("user_id")))
               .groupBy("user_id", "sid")
               .agg(F.count(F.lit(1)).alias("n_matched")))
    return (sess.join(matched, ["user_id", "sid"], "left")
            .select("user_id", "sid", F.col("st").alias("session_start"),
                    F.coalesce("n_matched", F.lit(0)).cast("bigint")
                    .alias("n_overlap")))


@query("funnel_within_time", oracle="""
WITH conv AS (
  SELECT DISTINCT p.user_id, p.event_id
  FROM events p
  WHERE p.event_type = 'purchase' AND EXISTS (
    SELECT 1 FROM events c
    WHERE c.user_id = p.user_id AND c.event_type = 'click'
      AND c.ts <= p.ts AND p.ts < c.ts + INTERVAL '1 hour'
      AND EXISTS (
        SELECT 1 FROM events v
        WHERE v.user_id = c.user_id AND v.event_type = 'view'
          AND v.ts <= c.ts AND c.ts < v.ts + INTERVAL '1 hour'))
)
SELECT CAST(count(*) AS BIGINT) AS n_conversions,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM conv
""")
def funnel_within_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained funnel (view -> click -> purchase, each step
    within 1 hour of the previous): how many purchases — and distinct
    purchasers — completed the full path under the deadline. The
    unconstrained reachability funnel is funnel_conversion; the
    max-delay variant is the one attribution models actually use
    (a click three weeks before the purchase gets no credit).

    Each EXISTS becomes a LEFT SEMI join whose equality component
    (user_id) drives the shuffle and whose time-range predicate filters
    inside the matched user partition — never a cross join; per-user
    fan-out bounds the work exactly like the as-of join. Two chained
    semi-joins + one aggregate row out. At 100 TB: two user-keyed
    shuffles over the (pre-filtered, event-type-pruned) streams."""
    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.col("ts").alias("p_ts"))
    qual_clicks = clicks.join(
        views,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("v_ts") <= F.col("c_ts"))
        & (F.col("c_ts") < F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_semi")
    conv = purch.join(
        qual_clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_semi")
    return conv.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"))


@query("asof_join_forward", oracle="""
SELECT c.event_id AS click_id, p.event_id AS purchase_id,
       c.user_id AS user_id
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts <= p.ts
""")
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each click matched to the EARLIEST purchase
    at or after it, per user — the attribution direction (which purchase
    did this click lead to), mirroring asof_join's backward form (which
    click preceded this purchase).

    Same union+ordered-window decomposition, scanned the other way: one
    shuffle on user_id, clicks sort BEFORE purchases at equal ts (kind
    0 < 1, matching ASOF's <= semantics), and first_value(purchase_id)
    over [current row, unbounded following] IGNORE NULLS picks the next
    purchase. No range explosion; per-user state is one pending value,
    exactly like the backward pass."""
    ev = load(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts", F.lit(0).alias("kind"),
                      F.col("event_id").alias("click_id"),
                      F.lit(None).cast("long").alias("pid")))
    purch = (ev.filter(F.col("event_type") == "purchase")
             .select("user_id", "ts", F.lit(1).alias("kind"),
                     F.lit(None).cast("long").alias("click_id"),
                     F.col("event_id").alias("pid")))
    w = (W.partitionBy("user_id").orderBy("ts", "kind")
         .rowsBetween(W.currentRow, W.unboundedFollowing))
    matched = (clicks.unionByName(purch)
               .withColumn("purchase_id",
                           F.first("pid", ignorenulls=True).over(w)))
    return (matched.filter(F.col("kind") == 0)
            .filter(F.col("purchase_id").isNotNull())
            .select("click_id", "purchase_id", "user_id"))


@query("window_peak_concurrency", oracle="""
WITH m AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM m
),
sess AS (
  SELECT user_id, sid, min(ts) AS st, max(ts) AS en
  FROM s GROUP BY user_id, sid
),
days AS (SELECT DISTINCT date_trunc('day', st) AS day FROM sess),
carry AS (
  SELECT d.day, CAST(count(x.user_id) AS BIGINT) AS c0
  FROM days d LEFT JOIN sess x
    ON x.st < d.day AND x.en >= d.day
  GROUP BY d.day
),
ev2 AS (
  SELECT date_trunc('day', st) AS day, st AS t, 1 AS delta,
         user_id, sid FROM sess
  UNION ALL
  SELECT date_trunc('day', en) AS day, en AS t, -1 AS delta,
         user_id, sid FROM sess
),
run AS (
  SELECT day,
         CAST(sum(delta) OVER (PARTITION BY day
                               ORDER BY t, delta DESC, user_id, sid
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS r
  FROM ev2
),
peaks AS (SELECT day, max(r) AS mx FROM run GROUP BY day)
SELECT p.day, CAST(c.c0 + p.mx AS BIGINT) AS peak_concurrency
FROM peaks p JOIN carry c ON c.day = p.day
""")
def window_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the interval-counting
    primitive behind capacity planning (max simultaneous users) — via
    the +1/-1 boundary-event sweep: each session contributes a start
    (+1) and end (-1) marker, the running sum IS the concurrency, and
    the per-day max is the peak.

    The running sum is DAY-PARTITIONED (a keyed window, never global);
    sessions alive across a day boundary are restored as a per-day
    carry — counted by joining the tiny day dimension (broadcast, ~30
    rows) against the session intervals — so the partitioned sweep is
    exact, the same two-phase trick corpus_shard_assign uses for global
    prefix sums. Tie rule at equal timestamps: starts before ends
    (delta DESC), then (user_id, sid) — both engines sort identically.
    At 100 TB: sessionization's user-keyed window, one day-keyed window
    over 2 rows per session, one broadcast day join."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") >= F.lag("ts").over(w)
           + F.expr("INTERVAL 30 MINUTES")), 1).otherwise(0)
    run_w = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = (ev.withColumn("brk", brk)
            .withColumn("sid", F.sum("brk").over(run_w).cast("bigint"))
            .groupBy("user_id", "sid")
            .agg(F.min("ts").alias("st"), F.max("ts").alias("en")))
    days = sess.select(F.date_trunc("day", "st").alias("day")).distinct()
    carry = (days.join(
        sess, (F.col("st") < F.col("day")) & (F.col("en") >= F.col("day")),
        "left")
        .groupBy("day").agg(F.count("user_id").alias("c0")))
    starts = sess.select(F.date_trunc("day", "st").alias("day"),
                         F.col("st").alias("t"), F.lit(1).alias("delta"),
                         "user_id", "sid")
    ends = sess.select(F.date_trunc("day", "en").alias("day"),
                       F.col("en").alias("t"), F.lit(-1).alias("delta"),
                       "user_id", "sid")
    sweep = (W.partitionBy("day")
             .orderBy("t", F.desc("delta"), "user_id", "sid")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    run = (starts.unionByName(ends)
           .withColumn("r", F.sum("delta").over(sweep).cast("bigint")))
    peaks = run.groupBy("day").agg(F.max("r").alias("mx"))
    return (peaks.join(F.broadcast(carry), "day")
            .select("day", (F.col("c0") + F.col("mx")).cast("bigint")
                    .alias("peak_concurrency")))


# Nearest-match tolerance for the bidirectional as-of join (micros).
ASOF_TOL_US = 3_600_000_000  # 1 hour


@query("asof_join_nearest", oracle=f"""
WITH p AS (SELECT event_id, user_id, ts, epoch_us(ts) AS us
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id, user_id, ts, epoch_us(ts) AS us
      FROM events WHERE event_type = 'click'),
b AS (SELECT p.event_id AS purchase_id, p.user_id, p.us,
             c.event_id AS bid, c.us AS bus
      FROM p ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND p.ts >= c.ts),
f AS (SELECT p.event_id AS purchase_id, c.event_id AS fid, c.us AS fus
      FROM p ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND p.ts < c.ts),
j AS (SELECT b.purchase_id, b.user_id,
             b.bid, b.us - b.bus AS bdiff, f.fid, f.fus - b.us AS fdiff
      FROM b LEFT JOIN f USING (purchase_id)),
picked AS (
  SELECT *,
         CASE WHEN bid IS NOT NULL AND bdiff <= {ASOF_TOL_US}
               AND (fid IS NULL OR fdiff > {ASOF_TOL_US}
                    OR bdiff <= fdiff) THEN 'backward'
              WHEN fid IS NOT NULL AND fdiff <= {ASOF_TOL_US}
                   THEN 'forward'
              ELSE 'none' END AS direction
  FROM j)
SELECT purchase_id, user_id, direction,
       CASE direction WHEN 'backward' THEN bid
                      WHEN 'forward' THEN fid END AS click_id,
       CASE direction WHEN 'backward' THEN bdiff
                      WHEN 'forward' THEN fdiff END AS diff_us
FROM picked
""")
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join, completing the family: backward (asof_join)
    takes the latest match at-or-before, forward (asof_join_forward)
    the earliest at-or-after — nearest takes whichever is CLOSER in
    time, within a 1-hour tolerance, ties to the backward (earlier)
    side, and keeps every probe row with an explicit direction column
    ('backward'/'forward'/'none'). Pandas merge_asof(direction=
    'nearest') semantics, relationally.

    One union + ONE user-keyed shuffle computes both directions: the
    backward carry is last_value IGNORE NULLS over [unbounded
    preceding, current] and the forward carry first_value over
    [current, unbounded following] on the SAME sort (ts, kind,
    event_id; clicks' kind 0 sorts before purchases' kind 1, giving
    >= backward and strictly-> forward, matching the oracle's ASOF
    inequalities). Diffs compare in exact epoch micros — no float
    time arithmetic. At 100 TB this is still one shuffle + one sorted
    pass; the tolerance check is a narrow projection."""
    ev = load(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts", "ts_us", F.lit(0).alias("kind"),
                      F.col("event_id"),
                      F.col("event_id").alias("cid_tag"),
                      F.col("ts_us").alias("cus_tag")))
    purch = (ev.filter(F.col("event_type") == "purchase")
             .select("user_id", "ts", "ts_us", F.lit(1).alias("kind"),
                     F.col("event_id"),
                     F.lit(None).cast("long").alias("cid_tag"),
                     F.lit(None).cast("long").alias("cus_tag")))
    wb = (W.partitionBy("user_id").orderBy("ts", "kind", "event_id")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    wf = (W.partitionBy("user_id").orderBy("ts", "kind", "event_id")
          .rowsBetween(W.currentRow, W.unboundedFollowing))
    m = (clicks.unionByName(purch)
         .withColumn("bid", F.last("cid_tag", ignorenulls=True).over(wb))
         .withColumn("bus", F.last("cus_tag", ignorenulls=True).over(wb))
         .withColumn("fid", F.first("cid_tag", ignorenulls=True).over(wf))
         .withColumn("fus", F.first("cus_tag", ignorenulls=True).over(wf))
         .filter(F.col("kind") == 1))
    bdiff = F.col("ts_us") - F.col("bus")
    fdiff = F.col("fus") - F.col("ts_us")
    direction = (
        F.when(F.col("bid").isNotNull() & (bdiff <= ASOF_TOL_US)
               & (F.col("fid").isNull() | (fdiff > ASOF_TOL_US)
                  | (bdiff <= fdiff)), "backward")
        .when(F.col("fid").isNotNull() & (fdiff <= ASOF_TOL_US), "forward")
        .otherwise("none"))
    m = m.withColumn("direction", direction)
    return m.select(
        F.col("event_id").alias("purchase_id"), "user_id", "direction",
        F.when(F.col("direction") == "backward", F.col("bid"))
         .when(F.col("direction") == "forward", F.col("fid"))
         .alias("click_id"),
        F.when(F.col("direction") == "backward", bdiff)
         .when(F.col("direction") == "forward", fdiff)
         .alias("diff_us"))


@query("window_cumulative_distinct", oracle="""
WITH f AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN row_number() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
)
SELECT event_id, user_id,
       CAST(sum(first_seen) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_distinct_types
FROM f
""")
def window_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNNING COUNT-DISTINCT per user: at each event, how many distinct
    event types has this user produced so far — the breadth-of-engagement
    curve feature every activation model wants, and the window SQL can't
    say directly (COUNT(DISTINCT) OVER a running frame is unsupported in
    every engine). The standard spelling: flag each (user, type)'s FIRST
    occurrence with one partitioned row_number, then a running SUM of the
    flags — two keyed windows replace the impossible distinct frame.

    Deterministic: ties in ts break by event_id in both windows; outputs
    are pure integer counts.

    Scale shape: both windows partition by user (the second reuses the
    first's (user_id, ts) sort order after a sub-key shuffle), so state
    per task is one user's history — never global. The same
    first-occurrence trick is how events_new_vs_returning and
    corpus_crawl_novelty_curve count novelty; this is its event-grain
    window form."""
    ev = load(spark, sf_dir, "events")
    w1 = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w2 = (W.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    first_seen = F.when(F.row_number().over(w1) == 1, 1).otherwise(0)
    return (ev.select("event_id", "user_id", "ts", "event_type",
                      first_seen.alias("first_seen"))
            .select("event_id", "user_id",
                    F.sum("first_seen").over(w2).cast("bigint")
                    .alias("cum_distinct_types")))


@query("asof_join_interpolate", oracle="""
WITH c0 AS (
  SELECT user_id, epoch_us(ts) AS us, value, event_id,
         row_number() OVER (PARTITION BY user_id, epoch_us(ts)
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'click'),
c AS (SELECT user_id, us, value FROM c0 WHERE rn = 1),
p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'purchase'),
prev AS (
  SELECT p.purchase_id, c.us AS prev_us, c.value AS v_prev
  FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.us >= c.us),
nxt AS (
  SELECT p.purchase_id, c.us AS next_us, c.value AS v_next
  FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.us <= c.us)
SELECT p.purchase_id, p.user_id, p.us,
       prev.prev_us, nxt.next_us,
       round(CASE
         WHEN prev.prev_us IS NULL THEN nxt.v_next
         WHEN nxt.next_us IS NULL THEN prev.v_prev
         WHEN nxt.next_us = prev.prev_us THEN prev.v_prev
         ELSE prev.v_prev + (nxt.v_next - prev.v_prev)
              * (p.us - prev.prev_us) * 1.0 / (nxt.next_us - prev.prev_us)
       END, 6) AS interp_value
FROM p
LEFT JOIN prev USING (purchase_id)
LEFT JOIN nxt USING (purchase_id)
WHERE prev.prev_us IS NOT NULL OR nxt.next_us IS NOT NULL
""")
def asof_join_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERPOLATING as-of join — the missing fourth as-of semantic
    next to backward / forward / nearest: each purchase gets a value
    LINEARLY INTERPOLATED between the bracketing clicks of the same
    user (v_prev + (v_next − v_prev)·(t − t_prev)/(t_next − t_prev)),
    falling back to hold-last / hold-next at the series edges — how a
    timeseries store (kdb, InfluxDB, pandas interpolate) samples a
    quote curve at trade times instead of snapping to one side.

    Determinism: the click stream is first deduped to ONE row per
    (user, instant) (max event_id wins — an integer rule), so neither
    engine ever chooses between equal-timestamp quotes; timestamps are
    exact epoch micros, the interpolation weight is a single double
    division of integer deltas (identical IEEE result), and the output
    rounds to the 6-digit grid. Exact-hit purchases (a click at the
    same instant) bracket themselves (prev_us == next_us) and take
    v_prev. Spark side is two union+ordered-window passes (the
    native-ASOF-less decomposition asof_join documents) on one
    user-keyed shuffle; DuckDB replays with its native ASOF JOIN in
    both directions — two engines, two idioms, one answer. At 100 TB:
    one shuffle on user_id, two window passes, no range explosion."""
    ev = load(spark, sf_dir, "events")
    dedup_w = W.partitionBy("user_id", "ts_us").orderBy(F.desc("event_id"))
    c = (ev.filter(F.col("event_type") == "click")
         .withColumn("rn", F.row_number().over(dedup_w))
         .filter(F.col("rn") == 1)
         .select("user_id", F.col("ts_us").alias("us"), "value"))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"), "user_id",
                 F.col("ts_us").alias("us")))

    clicks = c.select("user_id", "us", F.lit(0).alias("kind"),
                      F.lit(None).cast("long").alias("purchase_id"),
                      F.struct(F.col("us").alias("cus"),
                               F.col("value").alias("cv")).alias("cs"))
    purch = p.select("user_id", "us", F.lit(1).alias("kind"), "purchase_id",
                     F.lit(None).cast(
                         "struct<cus:long,cv:double>").alias("cs"))
    merged = clicks.unionByName(purch)
    # backward: clicks sort BEFORE purchases at equal us (kind 0 < 1)
    wb = (W.partitionBy("user_id").orderBy("us", "kind")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    # forward: purchases first at equal us, so same-instant clicks are
    # still eligible as "next"
    wf = (W.partitionBy("user_id").orderBy("us", F.desc("kind"))
          .rowsBetween(W.currentRow, W.unboundedFollowing))
    both = (merged
            .withColumn("prev", F.last("cs", ignorenulls=True).over(wb))
            .withColumn("nxt", F.first("cs", ignorenulls=True).over(wf))
            .filter(F.col("kind") == 1))
    pus, pv = F.col("prev.cus"), F.col("prev.cv")
    nus, nv = F.col("nxt.cus"), F.col("nxt.cv")
    interp = (F.when(pus.isNull(), nv)
              .when(nus.isNull(), pv)
              .when(nus == pus, pv)
              .otherwise(pv + (nv - pv) * (F.col("us") - pus) * 1.0
                         / (nus - pus)))
    return (both.filter(pus.isNotNull() | nus.isNotNull())
            .select("purchase_id", "user_id", "us",
                    pus.alias("prev_us"), nus.alias("next_us"),
                    F.round(interp, 6).alias("interp_value")))


# ---------------------------------------------------------------------------
# Binary-segmentation changepoint detection (single best split).


@query("timeseries_changepoint_binseg", oracle="""
WITH s AS (
  SELECT n_name AS grp, date_trunc('month', o_orderdate) AS month,
         CAST(count(*) AS BIGINT) AS y
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1, 2),
p AS (
  SELECT grp, y,
         row_number() OVER (PARTITION BY grp ORDER BY month) AS t,
         sum(y) OVER (PARTITION BY grp ORDER BY month) AS st,
         count(*) OVER (PARTITION BY grp) AS n,
         sum(y) OVER (PARTITION BY grp) AS sn
  FROM s),
f AS (
  SELECT grp, t, n, sn, st,
         (1000000 * (st * st * (n - t) + (sn - st) * (sn - st) * t))
           // (t * (n - t)) AS fsc
  FROM p WHERE t < n),
best AS (
  SELECT grp, t, st, fsc, n, sn,
         row_number() OVER (PARTITION BY grp
                            ORDER BY fsc DESC, t) AS rk
  FROM f)
SELECT grp, CAST(t AS BIGINT) AS tau, CAST(n AS BIGINT) AS n_points,
       CAST(st AS BIGINT) AS sum_left, CAST(sn AS BIGINT) AS sum_total,
       CAST(fsc - (1000000 * sn * sn) // n AS BIGINT) AS gain_e6
FROM best WHERE rk = 1
""")
def timeseries_changepoint_binseg(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """BINARY-SEGMENTATION changepoint detection (Scott & Knott 1974;
    the first split of the binseg ladder PELT generalizes, Killick et
    al. 2012) on each nation's monthly order-count series: the best
    single split tau minimizes two-segment squared error, equivalently
    MAXIMIZES f(t) = S_t^2/t + (S_n-S_t)^2/(n-t) by the prefix-sum
    identity — so the whole scan needs only running sums, no per-split
    re-aggregation. The drift monitor a data pipeline runs on its own
    arrival counts (the offline exact twin of timeseries_cusum_drift's
    sequential detector).

    Integer discipline: y is a COUNT, prefix sums are exact int64, and
    f is compared at micro resolution via the all-integer expression
    1e6 * (S_t^2 (n-t) + (S_n-S_t)^2 t) // (t (n-t)) — both engines
    floor identical integers, ties break on earlier t. gain_e6 >= 0 is
    the variance-reduction score (f(tau) minus the no-split baseline
    S_n^2/n at the same resolution). Bound: the statistic needs
    1e6 * S^2 * n within int64 — S per group up to ~1e5 at n=100; at
    larger volumes pre-scale y to coarser units (the statistic is
    scale-free), or drop the resolution factor.

    Scale shape: one corpus-sized grouped count, then every window
    runs on the model-sized (grp, month) table — 25 nations x ~80
    months here; the argmax is a per-group top-1 window. At 100 TB
    only the first groupBy touches data."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    s = (o.join(c, F.col("c_custkey") == F.col("o_custkey"))
         .join(F.broadcast(n),
               F.col("n_nationkey") == F.col("c_nationkey"))
         .groupBy(F.col("n_name").alias("grp"),
                  F.date_trunc("month", "o_orderdate").alias("month"))
         .agg(F.count(F.lit(1)).cast("bigint").alias("y")))
    wo = W.partitionBy("grp").orderBy("month")
    wg = W.partitionBy("grp")
    p = s.select(
        "grp", "y",
        F.row_number().over(wo).alias("t"),
        F.sum("y").over(wo).alias("st"),
        F.count(F.lit(1)).over(wg).alias("n"),
        F.sum("y").over(wg).alias("sn"))
    f = (p.filter(F.col("t") < F.col("n"))
         .withColumn(
             "fsc",
             F.expr("(1000000 * (st * st * (n - t) "
                    "+ (sn - st) * (sn - st) * t)) DIV (t * (n - t))")))
    wb = W.partitionBy("grp").orderBy(F.desc("fsc"), F.asc("t"))
    return (f.withColumn("rk", F.row_number().over(wb))
            .filter(F.col("rk") == 1)
            .select("grp",
                    F.col("t").cast("bigint").alias("tau"),
                    F.col("n").cast("bigint").alias("n_points"),
                    F.col("st").cast("bigint").alias("sum_left"),
                    F.col("sn").cast("bigint").alias("sum_total"),
                    F.expr("CAST(fsc - (1000000 * sn * sn) DIV n "
                           "AS BIGINT)").alias("gain_e6")))


# ---------------------------------------------------------------------------
# Inter-arrival burstiness per user.


@query("events_interarrival_burstiness", oracle="""
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id))
           AS gap
  FROM events),
m AS (
  SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps,
         CAST(sum(gap) AS BIGINT) AS sg,
         avg(gap) AS mu, stddev_samp(gap) AS sigma
  FROM g WHERE gap IS NOT NULL
  GROUP BY user_id HAVING count(gap) >= 2),
b AS (
  SELECT user_id, n_gaps,
         CAST(sg // n_gaps AS BIGINT) AS mean_gap_us,
         CASE WHEN sigma + mu = 0 THEN 0.0
              ELSE round((sigma - mu) / (sigma + mu), 6) END
           AS burstiness
  FROM m)
SELECT user_id, n_gaps, mean_gap_us, burstiness,
       burstiness > 0.5 AS bursty
FROM b
""")
def events_interarrival_burstiness(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """INTER-ARRIVAL BURSTINESS (Goh & Barabasi EPL 2008): per user,
    B = (sigma - mu) / (sigma + mu) over the gaps between consecutive
    events — the scale-free signature separating Poisson-like human
    browsing (B ~ 0), periodic automation (B -> -1: near-constant
    gaps), and bursty sessions (B -> 1). The behavioral-timing signal
    next to events_bot_detection's rate heuristics — a bot with a
    metronome gap pattern has ordinary rates but B near -1, which rate
    features cannot see.

    Determinism: gaps are exact integer MICROSECOND differences (the
    parquet timestamps carry micros; second-truncated gaps would zero
    out same-second bursts — the signal itself); the reported mean is
    the exact integer floor sum//n (a ~3e10-micro mean has no stable
    6th decimal in double — caught by the first verify run) — with
    the (ts, event_id) tiebreak for same-instant events; mu/sigma are
    the welch-precedent float moments rounded only at the reported
    surface; an all-identical-gap user (sigma = 0) gets B = -1 exactly
    unless mu is also 0 (all same-instant: pinned 0.0 on both
    engines). Users with fewer than 2 gaps drop identically.

    Scale shape: one user-keyed lag window + one grouped moment pass —
    the sessionize shuffle shape, nothing global. At 100 TB the window
    keys on user_id exactly like every session operator here."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # timestampdiff keeps the arithmetic on TIMESTAMP_NTZ directly —
    # no tz-dependent cast (the driver controls the session timezone)
    g = (ev.select("user_id", "ts", F.lag("ts").over(w).alias("prev"))
         .select("user_id",
                 F.expr("timestampdiff(MICROSECOND, prev, ts)")
                 .alias("gap")))
    m = (g.filter(F.col("gap").isNotNull())
         .groupBy("user_id")
         .agg(F.count("gap").cast("bigint").alias("n_gaps"),
              F.sum("gap").cast("bigint").alias("sg"),
              F.avg("gap").alias("mu"),
              F.stddev_samp("gap").alias("sigma"))
         .filter(F.col("n_gaps") >= 2))
    burst = F.when(F.col("sigma") + F.col("mu") == 0, F.lit(0.0)) \
        .otherwise(F.round((F.col("sigma") - F.col("mu"))
                           / (F.col("sigma") + F.col("mu")), 6))
    return m.select(
        "user_id", "n_gaps",
        F.expr("CAST(sg DIV n_gaps AS BIGINT)").alias("mean_gap_us"),
        burst.alias("burstiness"),
        (burst > 0.5).alias("bursty"))
