"""Registered streaming queries. Each runs a real Structured Streaming
query (multi-trigger file source, availableNow) to completion into a
memory sink, then returns the sink as an ordinary DataFrame — so the
DuckDB oracle can grade genuine streaming execution, not a batch stand-in.

Determinism notes:
- micro-batch sequence is fixed (8 time-ordered chunks, 1 per trigger);
- availableNow runs a final flush batch after the watermark's last
  advance, so append-mode output is exactly the windows closed by
  `max(ts) - delay`;
- complete-mode output is input-order-independent by definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from .pipeline import (
    events_stream,
    run_to_memory,
    running_user_counts,
    session_counts,
    tumbling_counts,
)


@query("streaming_tumbling_complete", oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
       count(*) AS n, round(sum(value), 6) AS total
FROM events GROUP BY 1, 2
""")
def streaming_tumbling_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling windows, complete output mode: the final sink
    table must equal the batch aggregation exactly (unified-API parity)."""
    ev = events_stream(spark, sf_dir)
    return run_to_memory(tumbling_counts(ev, watermark="2 hours"), "complete")


@query("streaming_tumbling_append_watermark", oracle="""
SELECT ws, event_type, n, total FROM (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
         count(*) AS n, round(sum(value), 6) AS total
  FROM events GROUP BY 1, 2)
WHERE ws + INTERVAL '1 hour' <= (SELECT max(ts) - INTERVAL '2 hours' FROM events)
""")
def streaming_tumbling_append_watermark(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """Append mode + 2-hour watermark: only windows the watermark has
    closed are emitted (and their state evicted — the property that bounds
    state at 100 TB). The oracle states the eviction rule relationally:
    window_end <= max(event_time) - delay."""
    ev = events_stream(spark, sf_dir)
    return run_to_memory(tumbling_counts(ev, watermark="2 hours"), "append")


@query("streaming_session_complete", oracle="""
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
""")
def streaming_session_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (merging-window state operator) run to
    completion — must equal the relational sessionization oracle used by
    the batch window_session query."""
    ev = events_stream(spark, sf_dir)
    return run_to_memory(session_counts(ev, watermark="2 hours"), "complete")


@query("streaming_stateful_user_counts", oracle="""
SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
""")
def streaming_stateful_user_counts(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Custom arbitrary-state operator (applyInPandasWithState): per-user
    counter carried across micro-batches in update mode; the last update
    per user equals the batch group count."""
    ev = events_stream(spark, sf_dir)
    updates = run_to_memory(running_user_counts(ev), "update")
    return (updates.groupBy("user_id")
            .agg(F.max("n_events").alias("n_events")))


@query("streaming_stream_stream_join", oracle="""
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id
 AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL '1 hour'
""")
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (clicks x purchases within 1h, per user):
    both sides watermarked, the event-time range condition bounds the
    join state each side must buffer — the thing that makes an infinite
    stream-stream join feasible at all. The delay (2h) exceeds the
    source's disorder, so no match is dropped and the final append-mode
    output equals the batch interval join (the oracle). 4 micro-batches:
    stream-stream state maintenance runs per trigger on BOTH sides, so
    this query's per-trigger cost is double the single-input ones."""
    ev = events_stream(spark, sf_dir, n_files=4)
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"),
                      F.col("user_id").alias("c_user"),
                      F.col("ts").alias("c_ts"))
              .withWatermark("c_ts", "2 hours"))
    purch = (ev.filter(F.col("event_type") == "purchase")
             .select(F.col("event_id").alias("purchase_id"),
                     F.col("user_id").alias("p_user"),
                     F.col("ts").alias("p_ts"))
             .withWatermark("p_ts", "2 hours"))
    j = clicks.join(
        purch,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 1 HOUR")))
    out = run_to_memory(j, "append")
    return out.select("click_id", "purchase_id",
                      F.col("c_user").alias("user_id"))


@query("streaming_foreachbatch_upsert", oracle="""
SELECT user_id, count(*) AS n FROM events GROUP BY user_id
""")
def streaming_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch upsert sink (exactly-once arbitrary-sink API): an
    update-mode per-user count streamed through 8 micro-batches into a
    keyed store via pipeline.run_foreachbatch_upsert; the final store
    must equal the batch aggregation — which is exactly what the oracle
    states. Exactly-once argument: availableNow + checkpoint dedups
    batch replays, and the upsert is idempotent per (key, batch)."""
    from .pipeline import run_foreachbatch_upsert

    ev = events_stream(spark, sf_dir)
    agg = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    state = run_foreachbatch_upsert(agg, "user_id", "n")
    return spark.createDataFrame(
        [(int(k), int(v)) for k, v in state.items()], "user_id bigint, n bigint")


@query("streaming_sliding_complete", oracle="""
SELECT ws, count(*) AS n, round(sum(value), 6) AS total
FROM (
  SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' AS ws, value
  FROM events
) GROUP BY ws
""")
def streaming_sliding_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min width / 5 min slide) on a real stream,
    complete mode — each event feeds exactly two overlapping windows
    (the state operator holds width/slide windows per key). Same oracle
    as the batch twin window_sliding: unified-API parity."""
    from .pipeline import _ntz

    ev = events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    agg = (ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 6).alias("total"))
           .select(_ntz("w.start").alias("ws"), "n", "total"))
    return run_to_memory(agg, "complete")


@query("streaming_dedup_dropduplicates", oracle="""
SELECT user_id, count(*) AS n
FROM (SELECT DISTINCT ON (event_id) event_id, user_id FROM events)
GROUP BY user_id
""")
def streaming_dedup_dropduplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EXACTLY-ONCE dedup: dropDuplicates on event_id over a
    watermarked stream — the at-least-once -> exactly-once repair stage
    every event pipeline runs (Kafka redelivery, producer retries). The
    staged source replays each event once and a planted duplicate of
    every 10th event is unioned in, so the operator provably drops
    something. State boundedness: plain dropDuplicates(["event_id"])
    would keep every id FOREVER despite the watermark (eviction only
    applies when the event-time column is part of the dedup key);
    dropDuplicatesWithinWatermark is the form that evicts ids once the
    watermark passes their first-seen time — the only shape whose state
    is bounded at 100 TB when the business key carries no timestamp.
    Oracle: per-user counts of DISTINCT event ids."""
    from .pipeline import run_to_memory

    ev = events_stream(spark, sf_dir)
    dup = ev.filter(F.col("event_id") % 10 == 0)  # planted redelivery
    dd = (ev.unionByName(dup)
          .withWatermark("ts", "2 hours")
          .dropDuplicatesWithinWatermark(["event_id"]))
    agg = dd.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    return run_to_memory(agg, "complete")


@query("streaming_static_join", oracle="""
SELECT n.n_name, e.event_type, count(*) AS n, round(sum(e.value), 6) AS total
FROM events e
JOIN customer c ON c.c_custkey = e.user_id + 1
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name, e.event_type
""")
def streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment — the most common production
    streaming join: each micro-batch of the event stream joins the
    STATIC customer->nation dimension (no watermark needed on the static
    side; Spark re-plans it per trigger, broadcasting the small dim),
    then feeds a complete-mode aggregate per (nation, event_type).

    At 100 TB of stream: the static side is dimension-sized and
    broadcast, so enrichment adds zero shuffle to the stream path; only
    the final keyed aggregate shuffles, and its state is group-count-
    bounded. Unified-API parity: the sink equals the batch join+agg
    (the oracle) exactly."""
    from ..tables import load

    ev = events_stream(spark, sf_dir)
    dim = (load(spark, sf_dir, "customer")
           .join(load(spark, sf_dir, "nation"),
                 F.col("c_nationkey") == F.col("n_nationkey"))
           .select(F.col("c_custkey"), F.col("n_name")))
    enriched = ev.join(F.broadcast(dim),
                       ev.user_id + 1 == F.col("c_custkey"))
    agg = (enriched.groupBy("n_name", "event_type")
           .agg(F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 6).alias("total")))
    return run_to_memory(agg, "complete")


@query("streaming_stream_stream_left_outer", oracle="""
WITH c AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'click'),
p AS (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'),
wm AS (SELECT least((SELECT max(ts) FROM c),
                    (SELECT max(ts) FROM p)) AS m)
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
FROM c JOIN p ON p.user_id = c.user_id
       AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL '1 hour'
UNION ALL
SELECT c.event_id, CAST(NULL AS BIGINT), c.user_id
FROM c, wm
WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = c.user_id
                    AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL '1 hour')
  AND c.ts + INTERVAL '1 hour' <= wm.m - INTERVAL '2 hours'
""")
def streaming_stream_stream_left_outer(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join — the semantics inner joins can't
    give: matched rows emit as matches arrive, while an UNMATCHED click
    emits (null purchase) only once the watermark proves no purchase can
    still arrive in its 1-hour window. The oracle states exactly that:
    the inner interval join UNION ALL the anti-joined clicks whose
    windows the final GLOBAL watermark has closed — and global means the
    MIN across both watermarked branches (least of the two branch
    maxima, minus the 2h delay), Spark's multi-input watermark rule;
    clicks near stream end stay buffered, correctly unemitted.

    At 100 TB: the outer side's state is bounded by the same watermark
    eviction as the inner join's; without the event-time range the state
    would grow without bound and the outer join would be inexpressible."""
    ev = events_stream(spark, sf_dir, n_files=4)
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"),
                      F.col("user_id").alias("c_user"),
                      F.col("ts").alias("c_ts"))
              .withWatermark("c_ts", "2 hours"))
    purch = (ev.filter(F.col("event_type") == "purchase")
             .select(F.col("event_id").alias("purchase_id"),
                     F.col("user_id").alias("p_user"),
                     F.col("ts").alias("p_ts"))
             .withWatermark("p_ts", "2 hours"))
    j = clicks.join(
        purch,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer")
    out = run_to_memory(j, "append")
    return out.select(F.col("click_id"), F.col("purchase_id"),
                      F.col("c_user").alias("user_id"))


@query("streaming_restart_recovery", oracle="""
SELECT user_id, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY user_id
""")
def streaming_restart_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint recovery across a query RESTART: half the input arrives
    and is drained by one foreachBatch-upsert query; the query stops; the
    rest arrives; a new query resumes from the same checkpoint — source
    offsets skip the already-processed files and the state store restores
    the running counts. The accumulated upsert store must equal the batch
    aggregate over all events (the oracle): Structured Streaming's
    end-to-end exactly-once contract, demonstrated rather than assumed.
    At 100 TB this is THE operational property: executors die and
    queries restart; totals must not drift."""
    from .pipeline import run_upsert_with_restart

    state = run_upsert_with_restart(spark, sf_dir)
    return spark.createDataFrame(
        sorted((int(k), int(v)) for k, v in state.items()),
        "user_id bigint, n bigint")


@query("streaming_stream_stream_full_outer", oracle="""
WITH c AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'click'),
p AS (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'),
wm AS (SELECT least((SELECT max(ts) FROM c),
                    (SELECT max(ts) FROM p)) AS m)
SELECT c.event_id AS click_id, p.event_id AS purchase_id
FROM c JOIN p ON p.user_id = c.user_id
       AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL '1 hour'
UNION ALL
SELECT c.event_id, CAST(NULL AS BIGINT)
FROM c, wm
WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = c.user_id
                    AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL '1 hour')
  AND c.ts + INTERVAL '1 hour' <= wm.m - INTERVAL '2 hours'
UNION ALL
SELECT CAST(NULL AS BIGINT), p.event_id
FROM p, wm
WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = p.user_id
                    AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL '1 hour')
  AND p.ts <= wm.m - INTERVAL '2 hours'
""")
def streaming_stream_stream_full_outer(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER join: both sides emit watermark-gated
    nulls. The two null boundaries are ASYMMETRIC, and the oracle states
    each exactly: an unmatched click waits for its whole 1-hour window
    to close (c_ts + 1h <= watermark) because a purchase could still
    arrive anywhere in it; an unmatched purchase only waits for its own
    event time to pass (p_ts <= watermark) because any click it could
    match is in the PAST (p_ts >= c_ts). Late-edge rows on either side
    stay buffered, correctly unemitted — same global-watermark (min of
    branch maxima) rule as the left-outer twin."""
    ev = events_stream(spark, sf_dir, n_files=4)
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"),
                      F.col("user_id").alias("c_user"),
                      F.col("ts").alias("c_ts"))
              .withWatermark("c_ts", "2 hours"))
    purch = (ev.filter(F.col("event_type") == "purchase")
             .select(F.col("event_id").alias("purchase_id"),
                     F.col("user_id").alias("p_user"),
                     F.col("ts").alias("p_ts"))
             .withWatermark("p_ts", "2 hours"))
    j = clicks.join(
        purch,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "full_outer")
    out = run_to_memory(j, "append")
    return out.select("click_id", "purchase_id")


@query("streaming_stateful_rocksdb", oracle="""
SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
""")
def streaming_stateful_rocksdb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateful counter on the ROCKSDB state store — the backend that
    matters at 100 TB: HDFSBackedStateStore keeps every key's state in
    executor HEAP (state size caps at memory); RocksDB spills to local
    disk with incremental checkpointing, so state scales with disk, not
    heap. Same operator, same oracle as streaming_stateful_user_counts —
    the provider swap must be result-invariant, which is exactly what
    the driver verifies. Conf is set/restored around the run; the
    provider is read at query start."""
    from .pipeline import run_to_memory

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        ev = events_stream(spark, sf_dir)
        updates = run_to_memory(running_user_counts(ev), "update")
        out = (updates.groupBy("user_id")
               .agg(F.max("n_events").alias("n_events")))
        # materialize BEFORE restoring the conf: the memory sink already
        # ran the stream, so this is just the batch agg over the sink
        out = out.cache()
        out.count()
        return out
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)



@query("streaming_dedup_watermark", oracle="""
SELECT DISTINCT user_id, event_type,
       time_bucket(INTERVAL '1 hour', ts) AS hr
FROM events
""")
def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming FIRST-OCCURRENCE emission per derived coarse key
    ((user, event_type, hour) — a key the raw stream doesn't carry) via
    dropDuplicatesWithinWatermark in APPEND mode: the "new combination
    detector" that feeds alerting/sampling stages downstream. The
    sibling streaming_dedup_dropduplicates is the other dedup shape —
    exactly-once repair on the natural event_id key under planted
    redelivery, graded through a complete-mode aggregate; this one
    grades the append-mode pass-through path (rows emit as they arrive,
    no aggregation after the dedup).

    Every occurrence of a key falls inside one wall-clock hour and the
    2h watermark delay exceeds the source's disorder, so no key's state
    is evicted while duplicates of it can still arrive — the final
    append-mode output is exactly the batch DISTINCT (the oracle). The
    hour label derives from integer epoch-micro arithmetic onto a
    TIMESTAMP_NTZ base, so output is session-timezone-proof while the
    watermark still rides the instant `ts`."""
    ev = events_stream(spark, sf_dir)
    hr = F.expr(
        "timestampadd(MICROSECOND, (ts_us div 3600000000) * 3600000000, "
        "TIMESTAMP_NTZ '1970-01-01 00:00:00')")
    keyed = (ev.withWatermark("ts", "2 hours")
             .select("user_id", "event_type", hr.alias("hr"), "ts"))
    deduped = keyed.dropDuplicatesWithinWatermark(
        ["user_id", "event_type", "hr"])
    return (run_to_memory(deduped, "append")
            .select("user_id", "event_type", "hr"))


@query("streaming_dedup_then_tumbling", oracle="""
SELECT ws, n FROM (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, count(*) AS n
  FROM (SELECT DISTINCT event_id, ts FROM events) GROUP BY 1)
WHERE ws + INTERVAL '1 hour'
      <= (SELECT max(ts) - INTERVAL '2 hours' FROM events)
""")
def streaming_dedup_then_tumbling(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """CHAINED stateful operators in one streaming query — exactly-once
    dedup (dropDuplicatesWithinWatermark on event_id, against planted
    redelivery of every 10th event) feeding a watermarked tumbling
    aggregate, both in append mode. Multiple stateful operators per
    query is the Spark-4 capability that collapses what used to be two
    jobs with an intermediate topic into ONE state pipeline; the
    watermark propagates through the dedup into the window operator,
    so eviction still bounds both states.

    The final counts must equal the batch hourly counts over DISTINCT
    event ids restricted to watermark-closed windows (the oracle) —
    proving the planted duplicates died in the first operator and the
    delay arithmetic survived the chaining."""
    from .pipeline import _ntz, run_to_memory

    ev = events_stream(spark, sf_dir)
    dup = ev.filter(F.col("event_id") % 10 == 0)  # planted redelivery
    dd = (ev.unionByName(dup)
          .withWatermark("ts", "2 hours")
          .dropDuplicatesWithinWatermark(["event_id"]))
    agg = (dd.groupBy(F.window("ts", "1 hour").alias("w"))
           .agg(F.count(F.lit(1)).alias("n"))
           .select(_ntz("w.start").alias("ws"), "n"))
    return run_to_memory(agg, "append")


# Streaming PSI monitor: fixed bucket domain (10 value bins of width
# 50, capped), baseline = the first calendar week, Laplace smoothing
# (n + 1) / (N + 10) — the streaming twin of dq_psi_distribution_drift.
_PSI_STREAM_CUT = "2024-01-08"


@query("streaming_psi_drift", oracle=f"""
WITH ev AS (SELECT CAST(ts AS DATE) AS day,
                   least(CAST(floor(value / 50) AS BIGINT), 9) AS bin
            FROM events),
cur AS (SELECT day, bin, count(*) AS n FROM ev GROUP BY 1, 2),
days AS (SELECT DISTINCT day FROM ev),
bins AS (SELECT unnest(range(0, 10)) AS bin),
grid AS (SELECT d.day, b.bin FROM days d CROSS JOIN bins b),
base AS (SELECT bin, count(*) AS n FROM ev
         WHERE day < DATE '{_PSI_STREAM_CUT}' GROUP BY 1),
tb AS (SELECT sum(n) AS t FROM base),
tc AS (SELECT day, sum(n) AS t FROM cur GROUP BY 1),
terms AS (
  SELECT g.day, g.bin,
         coalesce(b.n, 0) AS n_base, coalesce(c.n, 0) AS n_cur,
         (coalesce(b.n, 0) + 1.0) / (tb.t + 10) AS p_base,
         (coalesce(c.n, 0) + 1.0) / (tc.t + 10) AS p_cur
  FROM grid g
  LEFT JOIN base b USING (bin)
  LEFT JOIN cur c ON c.day = g.day AND c.bin = g.bin
  CROSS JOIN tb
  JOIN tc ON tc.day = g.day)
SELECT strftime(day, '%Y-%m-%d') AS day, CAST(bin AS BIGINT) AS bin,
       CAST(n_base AS BIGINT) AS n_base, CAST(n_cur AS BIGINT) AS n_cur,
       round(p_base, 6) AS p_base, round(p_cur, 6) AS p_cur,
       round((p_cur - p_base) * ln(p_cur / p_base), 6) AS psi_term
FROM terms
""")
def streaming_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING drift monitor: per-day value-distribution bucket counts
    accumulate in a real Structured Streaming aggregate (tumbling 1-day
    event-time windows, complete mode), and the sink joins against the
    STATIC first-week baseline to emit per-(day, bin) PSI terms — the
    production model-monitoring loop (dq_psi_distribution_drift is the
    batch audit; this is the always-on version that pages before the
    batch job would have run). Streaming state is days x 10 bins rows —
    bounded by the calendar, not the stream.

    The bucket domain is FIXED (10 width-50 bins, capped) so the
    day x bin grid completes with zero-count bins and Laplace smoothing
    (n + 1) / (N + 10) keeps empty bins finite — same formula, same
    6-digit grid as the batch PSI. floor(value / 50) not CAST (DuckDB
    CAST rounds, Spark truncates — the one cross-engine integer trap in
    this query). The epilogue (grid completion, baseline join, PSI
    arithmetic) is batch work over the day x bin sink — dimension-sized,
    broadcast everywhere."""
    from ..tables import load

    bin_col = F.least(F.floor(F.col("value") / 50), F.lit(9)) \
        .cast("bigint").alias("bin")
    ev = events_stream(spark, sf_dir).select("ts", bin_col)
    agg = (ev.groupBy(F.window("ts", "1 day").alias("w"), "bin")
           .agg(F.count(F.lit(1)).alias("n")))
    sink = run_to_memory(agg, "complete").select(
        F.col("w.start").cast("date").alias("day"), "bin", "n")

    batch = load(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), bin_col)
    base = (batch.filter(F.col("day") < F.lit(_PSI_STREAM_CUT).cast("date"))
            .groupBy("bin").agg(F.count(F.lit(1)).alias("n_b")))
    days = sink.select("day").distinct()
    bins = spark.range(0, 10).select(F.col("id").cast("bigint").alias("bin"))
    grid = days.crossJoin(F.broadcast(bins))
    tb = base.agg(F.sum("n_b").alias("t_b"))
    tc = sink.groupBy("day").agg(F.sum("n").alias("t_c"))
    terms = (grid
             .join(base, "bin", "left")
             .join(sink.withColumnRenamed("n", "n_c"), ["day", "bin"],
                   "left")
             .crossJoin(F.broadcast(tb))
             .join(tc, "day"))
    n_base = F.coalesce(F.col("n_b"), F.lit(0))
    n_cur = F.coalesce(F.col("n_c"), F.lit(0))
    p_base = (n_base + 1.0) / (F.col("t_b") + 10)
    p_cur = (n_cur + 1.0) / (F.col("t_c") + 10)
    return terms.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("bin").cast("bigint").alias("bin"),
        n_base.cast("bigint").alias("n_base"),
        n_cur.cast("bigint").alias("n_cur"),
        F.round(p_base, 6).alias("p_base"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((p_cur - p_base) * F.log(p_cur / p_base), 6)
        .alias("psi_term"))
