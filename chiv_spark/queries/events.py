"""Event-stream queries: tumbling-window aggregation (batch twin of
the Structured Streaming pipeline), gap-based sessionization, and the
real streaming run (no SQL oracle — rows-only check)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chiv_spark.queries.base import query, t
from chiv_spark.streaming.events import run_events_stream


@query(
    "events_tumbling_window",
    """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="tumbling 1h window aggregation (batch twin of the streaming pipeline)",
)
def events_tumbling_window(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").cast("timestamp").alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


@query(
    "events_sessionize",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events),
    sess AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM gaps)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP) AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
    doc="gap-based sessionization (30 min inactivity) via lag + running sum",
)
def events_sessionize(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gaps = e.select(
        "user_id",
        "ts",
        "event_id",
        # microsecond-exact gap check (matches the oracle's epoch_us)
        F.when(
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w) > 1_800_000_000)
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sess = gaps.withColumn("session_id", F.sum("new_session").over(wrun))
    return sess.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("ts").cast("timestamp").alias("session_start"),
        F.max("ts").cast("timestamp").alias("session_end"),
    )


@query(
    "events_sessionize_scalable",
    # IDENTICAL oracle to events_sessionize: this is a different
    # physical strategy for the same logical result
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events),
    sess AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM gaps)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP) AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
    doc="skew-resilient sessionization: per-(user, day) mini-sessions merged "
    "across bucket boundaries — hot users never concentrate on one task; "
    "same logical result as events_sessionize (shared oracle)",
)
def events_sessionize_scalable(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    gap_us = 1_800_000_000
    bucket_us = 86_400_000_000  # 1 day

    # stage 1: sessionize WITHIN (user, day-bucket) — the window
    # partition key includes the bucket, so a hot user's events spread
    # across as many tasks as they span days
    wb = Window.partitionBy("user_id", "bucket").orderBy("ts_us", "event_id")
    wbrun = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed = e.select(
        "user_id",
        "event_id",
        F.col("ts"),
        F.unix_micros("ts").alias("ts_us"),
        (F.unix_micros("ts") / bucket_us).cast("long").alias("bucket"),
    )
    mini = (
        bucketed.withColumn(
            "new_s",
            F.when(
                (F.col("ts_us") - F.lag("ts_us").over(wb) > gap_us)
                | F.lag("ts_us").over(wb).isNull(),
                1,
            ).otherwise(0),
        )
        .withColumn("mini_id", F.sum("new_s").over(wbrun))
        .groupBy("user_id", "bucket", "mini_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )
    # stage 2: merge mini-sessions across bucket boundaries — per-user
    # data is now bounded by sessions-per-user, not events-per-user
    wu = Window.partitionBy("user_id").orderBy("start_us")
    wurun = wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged = (
        mini.withColumn(
            "new_s",
            F.when(
                (F.col("start_us") - F.lag("end_us").over(wu) > gap_us)
                | F.lag("end_us").over(wu).isNull(),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_s").over(wurun))
    )
    return merged.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.min("session_start").cast("timestamp").alias("session_start"),
        F.max("session_end").cast("timestamp").alias("session_end"),
    )


@query(
    "events_session_window_native",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM gaps)
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    doc="sessionization via Spark's NATIVE session_window operator (dynamic-gap "
    "merge inside one aggregation; merge when gap < 30min — note the strict "
    "inequality, mirrored with >= in the oracle's new-session flag; window "
    "end = last event + gap per the operator's contract)",
)
def events_session_window_native(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "streaming_events_window",
    # the availableNow run processes the whole file before the watermark
    # ever advances, so nothing is dropped and the streaming result is
    # exactly the batch tumbling window — same oracle as the batch twin
    """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="real readStream→watermark→window→writeStream run (availableNow trigger, memory sink)",
)
def streaming_events_window(spark, sf_dir):
    ckpt = tempfile.mkdtemp(prefix="chiv-stream-ckpt-")
    return run_events_stream(spark, sf_dir, ckpt)


@query(
    "streaming_stream_stream_join",
    # single-microbatch availableNow run: the dual watermarks never
    # advance mid-stream, so no state is evicted and the streaming
    # result equals the batch interval join below
    """
    SELECT p.event_id AS purchase_id,
           p.user_id AS user_id,
           c.event_id AS click_id,
           CAST(p.ts AS TIMESTAMP) AS p_ts,
           CAST(c.ts AS TIMESTAMP) AS c_ts
    FROM events p
    JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND p.user_id = c.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL 1 HOUR
    """,
    doc="stream-stream interval join with dual watermarks (purchase ⋈ prior "
    "click within 1h); matches the batch interval join exactly",
)
def streaming_stream_stream_join(spark, sf_dir):
    from chiv_spark.streaming.joins import purchases_with_clicks

    ckpt = tempfile.mkdtemp(prefix="chiv-ssj-ckpt-")
    return purchases_with_clicks(spark, sf_dir, ckpt)


@query(
    "streaming_stateful_sessions",
    # the sessionizer emits CLOSED sessions; each user's final session
    # stays in the state store (NoTimeout + availableNow), so the
    # streaming result is the batch sessionization minus every user's
    # last session — expressed exactly below in epoch-microseconds
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events),
    sess AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM gaps),
    agg AS (
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             COUNT(*) AS n_events,
             MIN(epoch_us(ts)) AS start_us,
             MAX(epoch_us(ts)) AS end_us
      FROM sess GROUP BY user_id, session_id)
    SELECT user_id, session_id, n_events, start_us, end_us
    FROM agg
    WHERE session_id < (SELECT MAX(session_id) FROM agg a2 WHERE a2.user_id = agg.user_id)
    """,
    doc="custom stateful streaming sessionizer via applyInPandasWithState "
    "(emits closed sessions = batch sessionization minus each user's last session)",
)
def streaming_stateful_sessions(spark, sf_dir):
    from chiv_spark.streaming.sessions import run_stateful_sessions

    ckpt = tempfile.mkdtemp(prefix="chiv-state-ckpt-")
    return run_stateful_sessions(spark, sf_dir, ckpt)


@query(
    "events_funnel",
    """
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id),
    flags AS (
      SELECT user_id,
             CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END AS viewed,
             CASE WHEN first_view IS NOT NULL AND first_click > first_view THEN 1 ELSE 0 END AS clicked,
             CASE WHEN first_view IS NOT NULL AND first_click > first_view
                   AND first_purchase > first_click THEN 1 ELSE 0 END AS purchased
      FROM firsts)
    SELECT CAST(SUM(viewed) AS BIGINT) AS n_viewed,
           CAST(SUM(clicked) AS BIGINT) AS n_clicked_after_view,
           CAST(SUM(purchased) AS BIGINT) AS n_purchased_after_click
    FROM flags
    """,
    doc="view→click→purchase funnel: ordered-stage conversion counts from one "
    "conditional-min aggregation per user (no self-joins, single shuffle)",
)
def events_funnel(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    viewed = F.col("first_view").isNotNull()
    clicked = viewed & (F.col("first_click") > F.col("first_view"))
    purchased = clicked & (F.col("first_purchase") > F.col("first_click"))
    return firsts.agg(
        F.sum(viewed.cast("int")).cast("long").alias("n_viewed"),
        F.sum(clicked.cast("int")).cast("long").alias("n_clicked_after_view"),
        F.sum(purchased.cast("int")).cast("long").alias("n_purchased_after_click"),
    )


@query(
    "events_retention_cohorts",
    """
    WITH days AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events),
    cohorts AS (SELECT user_id, MIN(d) AS cohort_day FROM days GROUP BY user_id),
    activity AS (SELECT DISTINCT dd.user_id, c.cohort_day,
                        date_diff('day', c.cohort_day, dd.d) AS day_offset
                 FROM days dd JOIN cohorts c ON dd.user_id = c.user_id)
    SELECT CAST(cohort_day AS DATE) AS cohort_day,
           CAST(day_offset AS BIGINT) AS day_offset,
           COUNT(*) AS n_users
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    """,
    doc="retention cohorts: users grouped by first-seen day, distinct active "
    "users per (cohort, day-offset) for the first week — the classic "
    "retention triangle as one pipeline",
)
def events_retention_cohorts(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    days = e.select("user_id", F.date_trunc("day", "ts").cast("date").alias("d"))
    cohorts = days.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    activity = (
        days.join(cohorts, "user_id")
        .select("user_id", "cohort_day", F.datediff("d", "cohort_day").alias("day_offset"))
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", F.col("day_offset").cast("long").alias("day_offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


@query(
    "streaming_stream_static_join",
    # stateless per-microbatch join + one stateful aggregation; the
    # single availableNow batch sees every row, so the streaming result
    # equals the batch join-aggregate below
    """
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    WHERE event_type = 'purchase'
    GROUP BY c_mktsegment
    """,
    doc="stream-static enrichment join: streaming purchases ⋈ static "
    "customer dim → revenue per market segment (stateless join, "
    "re-planned per microbatch; complete-mode aggregate)",
)
def streaming_stream_static_join(spark, sf_dir):
    from chiv_spark.streaming.enrich import purchases_by_segment

    ckpt = tempfile.mkdtemp(prefix="chiv-ss-static-ckpt-")
    return purchases_by_segment(spark, sf_dir, ckpt)


@query(
    "streaming_dedup_watermark",
    # one availableNow batch → watermark never advances mid-run →
    # dropDuplicatesWithinWatermark emits exactly the batch DISTINCT
    """
    SELECT event_type, COUNT(*) AS n_users
    FROM (SELECT DISTINCT user_id, event_type FROM events)
    GROUP BY event_type
    """,
    doc="watermark-bounded streaming dedup (dropDuplicatesWithinWatermark "
    "on user_id+event_type): state holds only keys inside the watermark "
    "horizon, unlike unbounded dropDuplicates; counted per type after "
    "the append-mode sink",
)
def streaming_dedup_watermark(spark, sf_dir):
    from chiv_spark.streaming.enrich import deduped_user_types

    ckpt = tempfile.mkdtemp(prefix="chiv-dedup-ckpt-")
    deduped = deduped_user_types(spark, sf_dir, ckpt)
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


@query(
    "events_value_zscore",
    """
    WITH g AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sx2
      FROM events WHERE value IS NOT NULL GROUP BY event_type)
    SELECT event_id, e.event_type,
           (FLOOR(((value - sx / n) / SQRT((sx2 - sx*sx/n) / (n-1))) * 1000000.0 + 0.5) / 1000000.0) AS z
    FROM events e JOIN g ON e.event_type = g.event_type
    WHERE value IS NOT NULL
      AND ABS((value - sx / n) / SQRT((sx2 - sx*sx/n) / (n-1))) > 2.5
    """,
    doc="per-type outlier detection: z-score of each event's value against "
    "its type's mean/stddev (exact decimal power sums -> one deterministic "
    "IEEE expression; sqrt is correctly-rounded in both engines, unlike "
    "ln). Group stats are a 1-row-per-type broadcast back onto the fact "
    "side — no second fact shuffle",
)
def events_value_zscore(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v18 = F.col("value").cast("decimal(18,2)")
    v12 = F.col("value").cast("decimal(12,2)")
    g = e.groupBy(F.col("event_type").alias("g_type")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v18).cast("double").alias("sx"),
        F.sum(v12 * v12).cast("double").alias("sx2"),
    )
    n, sx, sx2 = F.col("n"), F.col("sx"), F.col("sx2")
    z = (F.col("value") - sx / n) / F.sqrt((sx2 - sx * sx / n) / (n - F.lit(1)))
    from chiv_spark.functions.detmath import det_round

    return (
        e.join(F.broadcast(g), e.event_type == F.col("g_type"))
        .filter(F.abs(z) > 2.5)
        .select("event_id", "event_type", det_round(z, 6).alias("z"))
    )


@query(
    "streaming_cdc_apply",
    # seq-carried merge priority makes the result independent of how
    # the change log is chopped into microbatches, so the streamed
    # apply equals this single-pass batch MERGE (tombstones dropped
    # from the live view)
    """
    WITH changes AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(value AS DOUBLE) AS value,
             CASE WHEN value < 2.0 THEN 'D' ELSE 'U' END AS op
      FROM events),
    latest AS (
      SELECT user_id, event_type, ts, event_id, value, op,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM changes)
    SELECT user_id, event_type, ts, event_id, value
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
    doc="streaming CDC apply, end to end in the registry: the events "
    "log becomes a change stream (smallest values as delete "
    "tombstones), chopped into two parquet files and applied via "
    "foreachBatch MERGE into a key-hash-bucketed parquet target with "
    "dynamic partition overwrite (streaming/cdc.py); the returned "
    "live view must equal the single-pass batch MERGE",
)
def streaming_cdc_apply(spark, sf_dir):
    from chiv_spark.streaming.cdc import apply_changes_stream

    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", F.col("value").cast("double").alias("value")
    )
    changes = ev.withColumn(
        "op", F.when(F.col("value") < 2.0, "D").otherwise("U")
    )
    work = tempfile.mkdtemp(prefix="chiv-cdc-")
    for i in range(2):
        changes.filter(F.col("event_id") % 2 == i).write.mode("overwrite").parquet(
            f"{work}/changes/part{i}"
        )
    try:
        live = apply_changes_stream(
            spark,
            f"{work}/changes/part*",
            changes.schema,
            f"{work}/target",
            f"{work}/ckpt",
            ["user_id", "event_type"],
            ["ts", "event_id"],
            op_col="op",
            n_buckets=8,
            max_files_per_trigger=1,
        )
        # pin the live view so the data-scale temp tree (change copy +
        # merged target + checkpoint) can be deleted before returning —
        # the sibling streaming queries leak only small checkpoint dirs,
        # this one would leak the whole table per invocation
        return live.select(
            "user_id", "event_type", "ts", "event_id", "value"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "events_sliding_window",
    """
    WITH starts AS (
      SELECT event_type, CAST(value AS DOUBLE) AS value,
             unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                     date_trunc('hour', ts)]) AS window_start
      FROM events)
    SELECT CAST(window_start AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM starts
    GROUP BY 1, 2
    """,
    doc="sliding (hopping) window: 2-hour windows every 1 hour via "
    "F.window(ts, '2 hours', '1 hour') — each event lands in exactly "
    "two windows, completing the window-type triad with the tumbling "
    "and native session entries. Catalyst expands the window "
    "assignment as a 2-row generator before the hash aggregate "
    "(map-side partials; exchange carries windows x types groups, "
    "2x the tumbling count, never 2x the events)",
)
def events_sliding_window(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").cast("timestamp").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# events_attribution_last_touch


# shared by the plain and the skew-resilient variants: both compute
# the SAME logical result, so they share one oracle verbatim
_LAST_TOUCH_ORACLE = """
    WITH marked AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS touch_ts,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS touch_type
      FROM events)
    SELECT event_id, user_id, ts AS purchase_ts, touch_ts, touch_type,
           CAST(FLOOR(epoch(ts)) AS BIGINT)
             - CAST(FLOOR(epoch(touch_ts)) AS BIGINT) AS secs_since_touch
    FROM marked WHERE event_type = 'purchase'
    """


@query(
    "events_attribution_last_touch",
    _LAST_TOUCH_ORACLE,
    doc="last-touch marketing attribution: every purchase joined to "
    "the user's most recent preceding click/view via an IGNORE-NULLS "
    "running last_value — the self-as-of-join expressed as ONE "
    "user-partitioned window pass instead of a range join "
    "(user-keyed shuffle, linear; (user_id, ts) is unique so the "
    "ordering is total and the result deterministic). Purchases with "
    "no prior touch surface as NULLs, not dropped rows",
)
def events_attribution_last_touch(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.col("event_type").isin("click", "view")
    marked = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(F.when(touch, F.col("ts")), ignorenulls=True).over(w).alias("touch_ts"),
        F.last(F.when(touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
    )
    return marked.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "touch_ts",
        "touch_type",
        (F.unix_timestamp("ts") - F.unix_timestamp("touch_ts")).alias(
            "secs_since_touch"
        ),
    )


# --------------------------------------------------------------------------
# events_attribution_last_touch_scalable


@query(
    "events_attribution_last_touch_scalable",
    # IDENTICAL oracle to events_attribution_last_touch: this is a
    # different physical strategy for the same logical result
    _LAST_TOUCH_ORACLE,
    doc="skew-resilient last-touch attribution (r5 verdict task 1): "
    "AQE splits skewed JOIN partitions but not skewed WINDOW "
    "partitions, so the plain variant's PARTITION BY user_id puts a "
    "100M-event bot user in one task. Here the running last-touch is "
    "computed WITHIN (user, day-bucket) windows — a hot user spreads "
    "over as many tasks as days — then each bucket's closing touch "
    "state is carried across buckets by a second window over the "
    "per-(user, bucket) aggregate (rows bounded by days-per-user, "
    "not events), joined back on the composite key and coalesced. "
    "The bucket width is a dial: drop to hours if one user-day still "
    "overwhelms a task. Same columns, same oracle, same NULLs for "
    "touchless purchases; tests/test_skew_and_state.py proves "
    "equality under a 1000x hot-user generator",
)
def events_attribution_last_touch_scalable(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    touch = F.col("event_type").isin("click", "view")
    # touch state rides one struct ordered by ts (unique per user), so
    # max() = latest touch and last(ignorenulls) = running last touch
    tstate = F.when(
        touch, F.struct(F.col("ts").alias("t_ts"), F.col("event_type").alias("t_type"))
    )
    base = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("bucket"),
    )
    # pass 1: running last-touch WITHIN (user, day) — skew-spread
    wb = (
        Window.partitionBy("user_id", "bucket")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("local_touch", F.last(tstate, ignorenulls=True).over(wb))
    # pass 2: closing touch state per (user, bucket) -> carry-in for
    # each later bucket; this window sees days-per-user rows only
    bucket_last = base.groupBy("user_id", "bucket").agg(F.max(tstate).alias("bl"))
    wu = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = bucket_last.select(
        "user_id", "bucket", F.last("bl", ignorenulls=True).over(wu).alias("carry_touch")
    )
    final = F.coalesce("local_touch", "carry_touch")
    return (
        local.filter(F.col("event_type") == "purchase")
        .join(carry, ["user_id", "bucket"])
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            final.getField("t_ts").alias("touch_ts"),
            final.getField("t_type").alias("touch_type"),
            (
                F.unix_timestamp("ts") - F.unix_timestamp(final.getField("t_ts"))
            ).alias("secs_since_touch"),
        )
    )


# --------------------------------------------------------------------------
# events_cohort_ltv


@query(
    "events_cohort_ltv",
    """
    WITH cohorts AS (
      SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS DATE) AS cohort_day
      FROM events GROUP BY user_id),
    rev AS (
      SELECT e.user_id, c.cohort_day,
             -- 7-day periods since the cohort day, NOT date_diff('week', ...)
             -- (that counts ISO week-boundary crossings — a different curve)
             (date_diff('day', c.cohort_day,
                        CAST(date_trunc('day', e.ts) AS DATE)) // 7) AS week_offset,
             CAST(ROUND(e.value * 100.0) AS BIGINT) AS cents
      FROM events e JOIN cohorts c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase')
    SELECT cohort_day, CAST(week_offset AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_buyers,
           (CAST(SUM(cents) AS DOUBLE) / 100.0) AS revenue
    FROM rev GROUP BY cohort_day, week_offset
    """,
    doc="cohort lifetime-value curve: purchase revenue per (first-seen "
    "cohort day, week offset) with distinct-buyer counts — the LTV "
    "triangle behind payback-period analysis. Cohort assignment is "
    "one user-keyed agg joined back (AQE-broadcastable at small "
    "cohort cardinality, shuffled hash at scale — unhinted on "
    "purpose); revenue rides integer cents (exact, order-free). "
    "week_offset is floor(days-since-cohort / 7) in BOTH engines — "
    "cohort-relative 7-day periods, not calendar ISO weeks",
)
def events_cohort_ltv(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    cohorts = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("cohort_day")
    )
    rev = (
        e.filter(F.col("event_type") == "purchase")
        .join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.floor(
                F.datediff(F.date_trunc("day", "ts").cast("date"), F.col("cohort_day"))
                / 7
            ).alias("week_offset"),
            F.round(F.col("value") * 100.0).cast("long").alias("cents"),
        )
    )
    return rev.groupBy("cohort_day", F.col("week_offset").cast("long").alias("week_offset")).agg(
        F.countDistinct("user_id").cast("long").alias("n_buyers"),
        (F.sum("cents").cast("double") / 100.0).alias("revenue"),
    )


# --------------------------------------------------------------------------
# streaming_attribution_last_touch


@query(
    "streaming_attribution_last_touch",
    # single availableNow batch: every user's full history arrives in
    # one stateful group, so the streamed result equals the batch
    # window formulation exactly — the oracle is the last-touch
    # attribution restated in epoch-microseconds (the streaming
    # operator's state/emit unit, sidestepping tz round-trips)
    """
    WITH marked AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS touch_ts,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS touch_type
      FROM events)
    SELECT event_id, user_id,
           epoch_us(ts) AS purchase_us,
           epoch_us(touch_ts) AS touch_us,
           touch_type
    FROM marked WHERE event_type = 'purchase'
    """,
    doc="STREAMING last-touch attribution — the attribution family's "
    "canonical streaming-state form (r5 verdict task 6): per-user "
    "state is just the most recent preceding touch (two fields, "
    "O(1) per user vs the batch variant's full-history shuffle); "
    "purchases emit their attribution row the moment they are "
    "processed. Real readStream -> applyInPandasWithState -> "
    "writeStream run under the availableNow batch-twin protocol, "
    "oracle-paired with the batch window formulation",
)
def streaming_attribution_last_touch(spark, sf_dir):
    from chiv_spark.streaming.attribution import run_streaming_attribution

    ckpt = tempfile.mkdtemp(prefix="chiv-attr-ckpt-")
    return run_streaming_attribution(spark, sf_dir, ckpt)


# --------------------------------------------------------------------------
# events_attribution_first_touch


_FIRST_TOUCH_ORACLE = """
    WITH marked AS (
      SELECT event_id, user_id, ts, event_type,
             first_value(CASE WHEN event_type IN ('click', 'view')
                              THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS touch_ts,
             first_value(CASE WHEN event_type IN ('click', 'view')
                              THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS touch_type
      FROM events)
    SELECT event_id, user_id, ts AS purchase_ts, touch_ts, touch_type,
           CAST(FLOOR(epoch(ts)) AS BIGINT)
             - CAST(FLOOR(epoch(touch_ts)) AS BIGINT) AS secs_since_touch
    FROM marked WHERE event_type = 'purchase'
    """


@query(
    "events_attribution_first_touch_scalable",
    # IDENTICAL oracle to events_attribution_first_touch: a different
    # physical strategy for the same logical result
    _FIRST_TOUCH_ORACLE,
    doc="skew-resilient FIRST-touch attribution — the mirror of the "
    "last-touch scalable variant: running first-touch WITHIN "
    "(user, day-bucket) windows, per-bucket EARLIEST touch state "
    "(min struct) carried forward by a first-ignore-nulls window "
    "over the bucket aggregate, and the coalesce order reversed "
    "(an earlier bucket's first touch wins over the local one). "
    "Same skew story: a hot user's events spread across "
    "days-per-user tasks; the carry window sees bucket rows only",
)
def events_attribution_first_touch_scalable(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    touch = F.col("event_type").isin("click", "view")
    tstate = F.when(
        touch, F.struct(F.col("ts").alias("t_ts"), F.col("event_type").alias("t_type"))
    )
    base = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("bucket"),
    )
    wb = (
        Window.partitionBy("user_id", "bucket")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("local_touch", F.first(tstate, ignorenulls=True).over(wb))
    bucket_first = base.groupBy("user_id", "bucket").agg(F.min(tstate).alias("bf"))
    wu = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = bucket_first.select(
        "user_id", "bucket", F.first("bf", ignorenulls=True).over(wu).alias("carry_touch")
    )
    # reversed vs last-touch: the EARLIEST bucket's touch wins
    final = F.coalesce("carry_touch", "local_touch")
    return (
        local.filter(F.col("event_type") == "purchase")
        .join(carry, ["user_id", "bucket"])
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            final.getField("t_ts").alias("touch_ts"),
            final.getField("t_type").alias("touch_type"),
            (
                F.unix_timestamp("ts") - F.unix_timestamp(final.getField("t_ts"))
            ).alias("secs_since_touch"),
        )
    )


@query(
    "events_attribution_first_touch",
    _FIRST_TOUCH_ORACLE,
    doc="FIRST-touch attribution — the other canonical credit model "
    "(each purchase credited to the user's EARLIEST preceding "
    "click/view): identical one-window-pass shape to the last-touch "
    "variant, with first_value IGNORE NULLS instead of a running "
    "last. Same scale story: one user-keyed shuffle, total ordering "
    "via the unique (user_id, ts) key, NULLs for touchless purchases",
)
def events_attribution_first_touch(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.col("event_type").isin("click", "view")
    marked = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.first(F.when(touch, F.col("ts")), ignorenulls=True).over(w).alias("touch_ts"),
        F.first(F.when(touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
    )
    return marked.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "touch_ts",
        "touch_type",
        (F.unix_timestamp("ts") - F.unix_timestamp("touch_ts")).alias(
            "secs_since_touch"
        ),
    )


# --------------------------------------------------------------------------
# events_active_users_rolling


@query(
    "events_active_users_rolling",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events),
    cal AS (SELECT DISTINCT day FROM ud),
    wau_pairs AS (
      SELECT DISTINCT c.day, u.user_id
      FROM cal c JOIN ud u
        ON u.day <= c.day AND u.day > c.day - 7)
    SELECT c.day,
           CAST((SELECT COUNT(*) FROM ud WHERE ud.day = c.day) AS BIGINT) AS dau,
           CAST((SELECT COUNT(*) FROM wau_pairs w WHERE w.day = c.day) AS BIGINT)
             AS wau
    FROM cal c
    """,
    doc="DAU / trailing-7-day WAU per calendar day — the rolling "
    "DISTINCT problem. A windowed COUNT(DISTINCT) over a range frame "
    "does not exist in either engine, so the engine EXPLODES each "
    "(user, active-day) into the 7 trailing report days it covers "
    "and hash-distinct-counts per day: linear with a fixed x7 "
    "factor, all shuffles keyed by day — the scale-correct "
    "formulation (the oracle states the same semantics as a range "
    "join + correlated counts). At a 30-day MAU the factor is x30; "
    "beyond that, switch to sketches — implemented as "
    "events_active_users_mau_approx (per-day HLL partials, x30 on "
    "sketch rows instead of user-day rows)",
)
def events_active_users_rolling(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    covered = ud.select(
        "user_id",
        F.explode(
            F.expr("sequence(day, date_add(day, 6))")
        ).alias("day"),
    )
    cal = ud.select("day").distinct()
    wau = (
        covered.join(cal, "day", "left_semi")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("wau"))
    )
    return dau.join(wau, "day")


# --------------------------------------------------------------------------
# events_active_users_mau_approx


@query(
    "events_active_users_mau_approx",
    # the oracle computes the EXACT trailing-30-day MAU and asserts
    # the engine's sketch estimate landed within the published bound —
    # the same gating pattern as agg_sample_scaleup (exact values
    # hash-compared, the approximation claim reduced to a boolean
    # both engines must agree on)
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events),
    cal AS (SELECT DISTINCT day FROM ud),
    mau_pairs AS (
      SELECT DISTINCT c.day, u.user_id
      FROM cal c JOIN ud u
        ON u.day <= c.day AND u.day > c.day - 30)
    SELECT c.day,
           CAST((SELECT COUNT(*) FROM mau_pairs m WHERE m.day = c.day)
                AS BIGINT) AS mau_exact,
           TRUE AS err_within_5pct
    FROM cal c
    """,
    doc="trailing-30-day MAU at SKETCH cost — the companion the "
    "rolling-DAU/WAU doc (events_active_users_rolling) promises at "
    "x30 explode factors. The scale path sketches each day's users "
    "into one HLL partial (lgK=14, ~0.8% RSE, one 16KB binary per "
    "day) and explodes SKETCHES — not user-day rows — across the 30 "
    "report days they cover, merging with hll_union_agg: the x30 "
    "factor applies to #days rows instead of #user-days, so a 1000x "
    "data scale-up grows the merge stage not at all. The exact MAU "
    "rides alongside (the x30 user-day explode) purely to gate the "
    "estimate: the emitted row carries the exact count plus a "
    "realized-error-within-5% flag the DuckDB oracle asserts as "
    "TRUE — at production scale drop the exact branch and keep the "
    "sketch pipeline",
)
def events_active_users_mau_approx(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    cal = ud.select("day").distinct()
    # sketch path: one HLL partial per day (duplicates within a day
    # are free — HLL is a set sketch), exploded over the 30 report
    # days it covers, merged per report day
    day_sk = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).groupBy("day").agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
    mau_approx = (
        day_sk.select(
            F.explode(F.expr("sequence(day, date_add(day, 29))")).alias("day"), "sk"
        )
        .join(cal, "day", "left_semi")
        .groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("mau_approx"))
    )
    # exact path (gating only): the x30 user-day explode
    mau_exact = (
        ud.select(
            "user_id",
            F.explode(F.expr("sequence(day, date_add(day, 29))")).alias("day"),
        )
        .join(cal, "day", "left_semi")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("mau_exact"))
    )
    rel_err = F.abs(
        F.col("mau_approx").cast("double") - F.col("mau_exact")
    ) / F.col("mau_exact").cast("double")
    return mau_exact.join(mau_approx, "day").select(
        "day", "mau_exact", (rel_err <= 0.05).alias("err_within_5pct")
    )


# --------------------------------------------------------------------------
# events_type_overlap_approx


@query(
    "events_type_overlap_approx",
    # exact audience sizes hash-compared; the sketch-intersection
    # claim reduces to a bounded-error boolean (agg_sample_scaleup
    # gating pattern)
    """
    WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    u AS (SELECT user_id FROM c UNION SELECT user_id FROM p)
    SELECT CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase,
           CAST((SELECT COUNT(*) FROM c JOIN p USING (user_id)) AS BIGINT)
             AS n_both_exact,
           TRUE AS err_within_bound
    """,
    doc="audience-overlap estimation from HLL sketches via "
    "inclusion-exclusion: |click ∩ purchase| ≈ est(A) + est(B) - "
    "est(A ∪ B), where the union estimate reuses the two per-type "
    "sketches through hll_union (sketches compose; the raw data is "
    "touched once). This is the segment-overlap question every "
    "audience system answers at 100 TB without materializing user "
    "sets: three fixed-size sketches replace two distincts and a "
    "join. Exact counts ride alongside to gate the estimate — "
    "absolute intersection error within 5% of the UNION size (the "
    "correct yardstick: inclusion-exclusion error scales with the "
    "operand sketches' set sizes, not the possibly-tiny "
    "intersection), asserted TRUE by the oracle",
)
def events_type_overlap_approx(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    sk = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
    )
    est = sk.agg(
        F.max(F.when(F.col("event_type") == "click", F.col("sk"))).alias("sk_c"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("sk"))).alias("sk_p"),
    ).select(
        F.hll_sketch_estimate("sk_c").alias("est_c"),
        F.hll_sketch_estimate("sk_p").alias("est_p"),
        F.hll_sketch_estimate(F.hll_union("sk_c", "sk_p")).alias("est_u"),
    )
    c = e.filter(F.col("event_type") == "click").select("user_id").distinct()
    p = e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    exact = (
        c.agg(F.count(F.lit(1)).cast("long").alias("n_click"))
        .crossJoin(p.agg(F.count(F.lit(1)).cast("long").alias("n_purchase")))
        .crossJoin(
            c.join(p, "user_id", "left_semi").agg(
                F.count(F.lit(1)).cast("long").alias("n_both_exact")
            )
        )
    )
    both_est = F.col("est_c") + F.col("est_p") - F.col("est_u")
    ok = (
        F.abs(both_est - F.col("n_both_exact"))
        <= 0.05 * (F.col("n_click") + F.col("n_purchase") - F.col("n_both_exact"))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "n_click", "n_purchase", "n_both_exact", ok.alias("err_within_bound")
    )


# --------------------------------------------------------------------------
# streaming_distinct_users_window


@query(
    "streaming_distinct_users_window",
    # exact per-hour distinct-user counts hash-compared; the streamed
    # sketch estimate reduces to the bounded-error boolean (same
    # gating pattern as events_active_users_mau_approx)
    """
    WITH ud AS (
      SELECT DISTINCT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
                      user_id
      FROM events)
    SELECT window_start,
           CAST(COUNT(*) AS BIGINT) AS exact_users,
           TRUE AS err_within_5pct
    FROM ud GROUP BY window_start
    """,
    doc="STREAMING distinct users per tumbling hour at sketch cost: a "
    "real readStream -> watermark -> hll_sketch_agg(user_id) per "
    "window -> writeStream run. Per-window streaming state is one "
    "fixed-size HLL register array; the exact streaming "
    "COUNT(DISTINCT) alternative holds every user id in the state "
    "store — the sketch keeps state O(windows), not O(users). The "
    "streamed estimates are joined against the batch exact counts "
    "and gated at 5% realized error (lgK=14 is ~0.8% RSE), asserted "
    "TRUE by the oracle",
)
def streaming_distinct_users_window(spark, sf_dir):
    from chiv_spark.streaming.events import run_windowed_distinct_users

    ckpt = tempfile.mkdtemp(prefix="chiv-wdu-ckpt-")
    approx = run_windowed_distinct_users(spark, sf_dir, ckpt)
    e = t(spark, sf_dir, "events")
    exact = (
        e.select(
            F.date_trunc("hour", "ts").cast("timestamp").alias("window_start"),
            "user_id",
        )
        .distinct()
        .groupBy("window_start")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_users"))
    )
    rel = F.abs(
        F.col("approx_users").cast("double") - F.col("exact_users")
    ) / F.col("exact_users").cast("double")
    return exact.join(approx, "window_start").select(
        "window_start", "exact_users", (rel <= 0.05).alias("err_within_5pct")
    )


# --------------------------------------------------------------------------
# events_session_window_dynamic


@query(
    "events_session_window_dynamic",
    # Spark's dynamic session window merges event windows
    # [ts, ts + gap(event)) per key; the oracle restates that as a
    # running-max-of-window-ends recurrence: a new session starts
    # exactly when the event's ts reaches every previous window's end
    # (half-open intervals -> >=). Session end = max merged end,
    # emitted in epoch-micros (tz-neutral)
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase'
                  THEN 3600000000 ELSE 1800000000 END AS gap_us
      FROM events),
    m AS (
      SELECT user_id, ts, event_id, gap_us,
             MAX(epoch_us(ts) + gap_us)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_end
      FROM g),
    s AS (
      SELECT *, CASE WHEN prev_end IS NULL OR epoch_us(ts) >= prev_end
                     THEN 1 ELSE 0 END AS new_s
      FROM m),
    sess AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS sid
      FROM s)
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           MAX(epoch_us(ts) + gap_us) AS session_end_us,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    doc="DYNAMIC-gap native session window: purchases hold a session "
    "open for 60 minutes, everything else 30 — the per-event gap "
    "column form of F.session_window, which the fixed-gap native "
    "entry cannot express. Spark merges overlapping half-open "
    "[ts, ts+gap) windows inside one aggregation; the oracle "
    "restates the merge as a running-max-of-ends recurrence "
    "(new session iff ts >= max prior end). Same single "
    "user-keyed shuffle as the fixed-gap operator; session ends "
    "ride epoch-micros so no tz round-trip touches the comparison",
)
def events_session_window_dynamic(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type") == "purchase", F.expr("make_interval(0,0,0,0,0,60,0)")
    ).otherwise(F.expr("make_interval(0,0,0,0,0,30,0)"))
    return (
        e.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp").alias("session_start"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# events_bot_entropy


@query(
    "events_bot_entropy",
    f"""
    WITH gaps AS (
      SELECT user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT)
               - CAST(FLOOR(epoch(LAG(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id))) AS BIGINT)
               AS gap_s
      FROM events),
    b AS (
      SELECT user_id, LEAST(gap_s // 60, 10) AS bucket
      FROM gaps WHERE gap_s IS NOT NULL),
    cnt AS (SELECT user_id, bucket, COUNT(*) AS n FROM b GROUP BY user_id, bucket),
    tot AS (SELECT user_id, SUM(n) AS total FROM cnt GROUP BY user_id)
    SELECT c.user_id,
           CAST(t.total AS BIGINT) AS n_gaps,
           (FLOOR(-SUM((CAST(n AS DOUBLE)/total) * ln(CAST(n AS DOUBLE)/total))
                   * 1000000.0 + 0.5) / 1000000.0) AS gap_entropy,
           (-SUM((CAST(n AS DOUBLE)/total) * ln(CAST(n AS DOUBLE)/total)) < 0.75)
             AS suspected_bot
    FROM cnt c JOIN tot t ON c.user_id = t.user_id
    GROUP BY c.user_id, t.total
    """,
    doc="bot detection via inter-arrival-time entropy: humans produce "
    "high-entropy gap distributions, schedulers and scrapers "
    "concentrate mass in one bucket. Gaps come from one user-keyed "
    "lag window (second-granular integer arithmetic — no float "
    "timestamps), land in capped minute buckets (integer division, "
    "no log-bucket float-boundary hazards), and per-user Shannon "
    "entropy is one more bounded hash agg — buckets-per-user <= 11. "
    "The ln() calls ride exact rational p = n/total and the entropy "
    "is det-rounded; the bot flag thresholds the UNROUNDED entropy "
    "identically in both engines. Linear, two user-keyed shuffles, "
    "no windows beyond the lag",
)
def events_bot_entropy(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    cnt = gaps.select(
        "user_id", F.least(F.floor(F.col("gap_s") / 60), F.lit(10)).alias("bucket")
    ).groupBy("user_id", "bucket").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("user_id").agg(F.sum("n").alias("total"))
    p = F.col("n").cast("double") / F.col("total")
    ent = -F.sum(p * F.log(p))
    from chiv_spark.functions.detmath import det_round

    return (
        cnt.join(tot, "user_id")
        .groupBy("user_id", "total")
        .agg(
            det_round(ent).alias("gap_entropy"),
            (ent < 0.75).alias("suspected_bot"),
        )
        .select(
            "user_id",
            F.col("total").cast("long").alias("n_gaps"),
            "gap_entropy",
            "suspected_bot",
        )
    )


# --------------------------------------------------------------------------
# events_ab_test_uplift


@query(
    "events_ab_test_uplift",
    """
    WITH assigned AS (
      SELECT user_id,
             CASE WHEN (('0x' || substring(md5('exp1:' || user_id::VARCHAR), 1, 15))::BIGINT)
                       % 2 = 0 THEN 'A' ELSE 'B' END AS arm
      FROM (SELECT DISTINCT user_id FROM events)),
    conv AS (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      GROUP BY user_id HAVING COUNT(*) >= 15),
    arms AS (
      SELECT a.arm,
             COUNT(*) AS n_users,
             COUNT(c.user_id) AS n_converted
      FROM assigned a LEFT JOIN conv c USING (user_id)
      GROUP BY a.arm),
    wide AS (
      SELECT
        MAX(CASE WHEN arm = 'A' THEN n_users END) AS na,
        MAX(CASE WHEN arm = 'A' THEN n_converted END) AS ca,
        MAX(CASE WHEN arm = 'B' THEN n_users END) AS nb,
        MAX(CASE WHEN arm = 'B' THEN n_converted END) AS cb
      FROM arms)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(ca AS BIGINT) AS conv_a,
           CAST(nb AS BIGINT) AS n_b, CAST(cb AS BIGINT) AS conv_b,
           (FLOOR((CAST(cb AS DOUBLE)/nb - CAST(ca AS DOUBLE)/na) * 1000000.0 + 0.5)
             / 1000000.0) AS uplift,
           (FLOOR(((CAST(cb AS DOUBLE)/nb - CAST(ca AS DOUBLE)/na)
             / SQRT((CAST(ca+cb AS DOUBLE)/(na+nb)) * (1 - CAST(ca+cb AS DOUBLE)/(na+nb))
                    * (1.0/na + 1.0/nb))) * 1000000.0 + 0.5) / 1000000.0) AS z_score
    FROM wide
    """,
    doc="A/B experiment readout, end to end: users assigned to arms "
    "by STABLE HASH fate (exp-salted, RNG-free — the assignment is "
    "reproducible across engines, re-runs and clusters, which is "
    "the property real experimentation platforms need), per-arm "
    "distinct-converter counts via one left-semi-shaped join, and "
    "the two-proportion pooled z-score computed from exact integer "
    "counts (sqrt is correctly-rounded; single IEEE expression). "
    "Two user-keyed hash aggs + a 2-row pivot — nothing here "
    "scales with event volume beyond the first distinct",
)
def events_ab_test_uplift(spark, sf_dir):
    from chiv_spark.functions.hashing import hash64

    e = t(spark, sf_dir, "events")
    users = e.select("user_id").distinct()
    arm = F.when(
        hash64(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))) % 2 == 0,
        "A",
    ).otherwise("B")
    # conversion = heavy purchaser (>= 15 purchases): a rate that
    # splits both arms at every SF — 'any purchase' saturates at 100%
    # in this dataset, collapsing the pooled variance to zero
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_p"))
        .filter(F.col("n_p") >= 15)
        .select("user_id", F.lit(1).alias("converted"))
    )
    arms = (
        users.withColumn("arm", arm)
        .join(conv, "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count("converted").alias("n_converted"),
        )
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n_users"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("n_converted"))).alias("ca"),
        F.max(F.when(F.col("arm") == "B", F.col("n_users"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("n_converted"))).alias("cb"),
    )
    na, ca, nb, cb = (F.col(c).cast("double") for c in ("na", "ca", "nb", "cb"))
    pool = (ca + cb) / (na + nb)
    uplift = cb / nb - ca / na
    z = uplift / F.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
    from chiv_spark.functions.detmath import det_round

    return wide.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("ca").cast("long").alias("conv_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("cb").cast("long").alias("conv_b"),
        det_round(uplift).alias("uplift"),
        det_round(z).alias("z_score"),
    )


# --------------------------------------------------------------------------
# events_revenue_period_over_period


@query(
    "events_revenue_period_over_period",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1)
    SELECT day,
           (CAST(cents AS DOUBLE) / 100.0) AS revenue,
           (CAST(cents - LAG(cents) OVER (ORDER BY day) AS DOUBLE) / 100.0)
             AS dod_delta,
           (CAST(cents - LAG(cents, 7) OVER (ORDER BY day) AS DOUBLE) / 100.0)
             AS wow_delta
    FROM daily
    """,
    doc="period-over-period revenue: daily purchase revenue with "
    "day-over-day and week-over-week deltas — the BI dashboard "
    "staple. The lag windows run on the DAY-AGGREGATED table "
    "(calendar-bounded, a few hundred rows at any corpus size), "
    "never on events; revenue rides integer cents so the deltas are "
    "exact. NULL deltas for the warm-up days, not dropped rows",
)
def events_revenue_period_over_period(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = e.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100.0).cast("long")).alias("cents")
    )
    w = Window.orderBy("day")
    return daily.select(
        "day",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        ((F.col("cents") - F.lag("cents").over(w)).cast("double") / 100.0).alias(
            "dod_delta"
        ),
        ((F.col("cents") - F.lag("cents", 7).over(w)).cast("double") / 100.0).alias(
            "wow_delta"
        ),
    )


# --------------------------------------------------------------------------
# events_funnel_windowed


@query(
    "events_funnel_windowed",
    """
    WITH fv AS (
      SELECT user_id, MIN(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    fc AS (
      SELECT e.user_id, MIN(e.ts) AS first_click
      FROM events e JOIN fv ON e.user_id = fv.user_id
      WHERE e.event_type = 'click'
        AND e.ts > fv.first_view
        AND e.ts <= fv.first_view + INTERVAL 7 DAY
      GROUP BY e.user_id),
    fp AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase
      FROM events e JOIN fc ON e.user_id = fc.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > fc.first_click
        AND e.ts <= fc.first_click + INTERVAL 7 DAY
      GROUP BY e.user_id)
    SELECT CAST((SELECT COUNT(*) FROM fv) AS BIGINT) AS n_viewed,
           CAST((SELECT COUNT(*) FROM fc) AS BIGINT) AS n_clicked_7d,
           CAST((SELECT COUNT(*) FROM fp) AS BIGINT) AS n_purchased_7d
    """,
    doc="conversion-window funnel — the realistic variant of "
    "events_funnel: each stage must follow the previous one WITHIN "
    "7 days (first view -> first qualifying click -> first "
    "qualifying purchase), so stale conversions do not count. Three "
    "chained user-keyed aggregates, each joining the previous "
    "stage's 1-row-per-user table back onto events (user-keyed "
    "shuffle, AQE-broadcastable); no windows over event history",
)
def events_funnel_windowed(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    week = F.expr("INTERVAL 7 DAYS")
    fv = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    fc = (
        e.filter(F.col("event_type") == "click")
        .join(fv, "user_id")
        .filter(
            (F.col("ts") > F.col("first_view"))
            & (F.col("ts") <= F.col("first_view") + week)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(fc, "user_id")
        .filter(
            (F.col("ts") > F.col("first_click"))
            & (F.col("ts") <= F.col("first_click") + week)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        fv.agg(F.count(F.lit(1)).cast("long").alias("n_viewed"))
        .crossJoin(fc.agg(F.count(F.lit(1)).cast("long").alias("n_clicked_7d")))
        .crossJoin(fp.agg(F.count(F.lit(1)).cast("long").alias("n_purchased_7d")))
    )


# --------------------------------------------------------------------------
# events_attribution_multi_touch


@query(
    "events_attribution_multi_touch",
    """
    WITH purch AS (
      SELECT user_id, event_id AS pid, epoch_us(ts) AS p_us
      FROM events WHERE event_type = 'purchase'),
    touch AS (
      SELECT user_id, event_type AS t_type, epoch_us(ts) AS t_us
      FROM events WHERE event_type IN ('click', 'view')),
    pairs AS (
      SELECT p.pid, t.t_type
      FROM purch p JOIN touch t
        ON p.user_id = t.user_id
       AND t.t_us < p.p_us
       AND t.t_us >= p.p_us - 604800000000),
    per_p AS (
      SELECT pid, t_type, COUNT(*) AS cnt,
             SUM(COUNT(*)) OVER (PARTITION BY pid) AS n_touch
      FROM pairs GROUP BY pid, t_type)
    SELECT t_type AS touch_type,
           CAST(n_touch AS BIGINT) AS n_touch,
           CAST(SUM(cnt) AS BIGINT) AS n_pairs,
           (FLOOR(CAST(SUM(cnt) AS DOUBLE) / n_touch * 1000000.0 + 0.5)
             / 1000000.0) AS credit
    FROM per_p GROUP BY t_type, n_touch
    """,
    doc="multi-touch (linear-credit) attribution: every purchase "
    "splits one unit of credit equally across ALL its touches in "
    "the trailing 7 days — the fractional model completing the "
    "first/last-touch pair. The oracle states the textbook range "
    "join; the engine EXPLODES each purchase into the 8 day-buckets "
    "its window covers and equi-joins touches on (user, day) with a "
    "residual time filter — the join_interval_bucketed trick, so "
    "the plan is a hash join keyed by (user, day), linear and "
    "skew-spread, never a nested loop. Credit is grouped by "
    "(touch_type, touches-per-purchase) with ONE division per "
    "output row — integer pair counts are the hash-compared "
    "payload, no float accumulation anywhere",
)
def events_attribution_multi_touch(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    day_us = 86_400_000_000
    week_us = 7 * day_us
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("pid"),
        F.unix_micros("ts").alias("p_us"),
    )
    cov = purch.select(
        "user_id",
        "pid",
        "p_us",
        F.explode(
            F.sequence(
                (F.col("p_us") / day_us).cast("long") - 7,
                (F.col("p_us") / day_us).cast("long"),
            )
        ).alias("day"),
    )
    touch = e.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("event_type").alias("t_type"),
        F.unix_micros("ts").alias("t_us"),
        (F.unix_micros("ts") / day_us).cast("long").alias("day"),
    )
    pairs = cov.join(touch, ["user_id", "day"]).filter(
        (F.col("t_us") < F.col("p_us"))
        & (F.col("t_us") >= F.col("p_us") - week_us)
    )
    per_p = (
        pairs.groupBy("pid", "t_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("n_touch", F.sum("cnt").over(Window.partitionBy("pid")))
    )
    from chiv_spark.functions.detmath import det_round

    return per_p.groupBy(
        F.col("t_type").alias("touch_type"),
        F.col("n_touch").cast("long").alias("n_touch"),
    ).agg(
        F.sum("cnt").cast("long").alias("n_pairs"),
        det_round(
            F.sum("cnt").cast("double") / F.first("n_touch")
        ).alias("credit"),
    )


# --------------------------------------------------------------------------
# events_entry_path_analysis


@query(
    "events_entry_path_analysis",
    """
    WITH ranked AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    paths AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS entry_path
      FROM ranked WHERE rn <= 3 GROUP BY user_id)
    SELECT entry_path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM paths GROUP BY entry_path
    """,
    doc="entry-path analysis: each user's first three event types as "
    "an ordered path string, counted across the user base — the "
    "onboarding-flow question every product team asks. One "
    "user-keyed window pass bounded to rank 3 (at scale, pre-filter "
    "with a min-ts semi join so only each user's head ever sorts), "
    "then a |types|^3-bounded hash agg. Ordering is total via the "
    "unique (ts, event_id) key, so the path strings are "
    "deterministic across engines",
)
def events_entry_path_analysis(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)
    paths = ranked.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
        ).alias("entry_path")
    )
    return paths.groupBy("entry_path").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


# --------------------------------------------------------------------------
# transform_partition_pruned_scan


@query(
    "transform_partition_pruned_scan",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    doc="hive-partitioned layout + partition-pruned scan, end to "
    "end: events are written out partitioned by event_type (the "
    "physical layout a 100 TB event lake uses) and read back with a "
    "partition-key predicate — Catalyst prunes to the one matching "
    "directory, so the scan reads ~1/5 of the files "
    "(PartitionFilters, plan-asserted in tests/test_plans.py) while "
    "the oracle states the plain logical filter over the full "
    "table. The partitioned copy is rebuilt per run in a temp dir "
    "and the result pinned before cleanup (the streaming_cdc_apply "
    "temp-tree pattern)",
)
def transform_partition_pruned_scan(spark, sf_dir):
    import shutil as _shutil
    import tempfile as _tempfile

    e = t(spark, sf_dir, "events")
    work = _tempfile.mkdtemp(prefix="chiv-part-")
    try:
        e.write.mode("overwrite").partitionBy("event_type").parquet(f"{work}/events_by_type")
        pruned = (
            spark.read.parquet(f"{work}/events_by_type")
            .filter(F.col("event_type") == "purchase")
            .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.sum(F.round(F.col("value") * 100.0).cast("long"))
                .cast("long")
                .alias("cents"),
            )
        )
        return pruned.localCheckpoint(eager=True)
    finally:
        _shutil.rmtree(work, ignore_errors=True)


# --------------------------------------------------------------------------
# scan_orc_roundtrip / scan_ndjson_source — columnar + line formats


@query(
    "scan_orc_roundtrip",
    """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY event_type
    """,
    doc="ORC round trip: events written to ORC (Spark's second "
    "native columnar format — the Hive-ecosystem interchange the "
    "reference's warehouse users bring) and aggregated from the ORC "
    "scan; the oracle aggregates the source parquet, so any "
    "type-mapping loss in the ORC writer/reader surfaces as a "
    "mismatch. Predicate/column pushdown works on the ORC scan the "
    "same as parquet (native vectorized reader)",
)
def scan_orc_roundtrip(spark, sf_dir):
    import shutil as _shutil
    import tempfile as _tempfile

    e = t(spark, sf_dir, "events")
    work = _tempfile.mkdtemp(prefix="chiv-orc-")
    try:
        e.write.mode("overwrite").orc(f"{work}/events_orc")
        out = (
            spark.read.orc(f"{work}/events_orc")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.round(F.col("value") * 100.0).cast("long"))
                .cast("long")
                .alias("cents"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        _shutil.rmtree(work, ignore_errors=True)


@query(
    "scan_ndjson_source",
    """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS cents,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us
    FROM events GROUP BY event_type
    """,
    doc="NDJSON source: events serialized to newline-delimited JSON "
    "(the log-shipping interchange format) and read back with an "
    "EXPLICIT schema — no sampling-based inference, the 100 TB "
    "discipline (schema inference reads the data twice and guesses "
    "types per run). Timestamps round-trip through ISO-8601 "
    "strings; the oracle aggregates the source parquet, so any "
    "serialization loss surfaces as a value mismatch",
)
def scan_ndjson_source(spark, sf_dir):
    import shutil as _shutil
    import tempfile as _tempfile

    e = t(spark, sf_dir, "events")
    work = _tempfile.mkdtemp(prefix="chiv-ndjson-")
    try:
        # microsecond timestampFormat on BOTH sides: the default JSON
        # format truncates to milliseconds, a real serialization loss
        # the oracle catches
        us_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
        e.write.mode("overwrite").option("timestampFormat", us_fmt).json(
            f"{work}/events_json"
        )
        out = (
            spark.read.schema(e.schema)
            .option("timestampFormat", us_fmt)
            .json(f"{work}/events_json")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.round(F.col("value") * 100.0).cast("long"))
                .cast("long")
                .alias("cents"),
                F.max(F.unix_micros("ts")).cast("long").alias("max_ts_us"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        _shutil.rmtree(work, ignore_errors=True)


# --------------------------------------------------------------------------
# streaming_session_window_native


@query(
    "streaming_session_window_native",
    # append-mode emission closure: a session emits once the final
    # watermark (max event time - 2h) passes its window end
    # (last event + 30min gap). The oracle states the batch native
    # sessionization filtered by that closure.
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM gaps),
    agg AS (
      SELECT user_id,
             CAST(MIN(ts) AS TIMESTAMP) AS session_start,
             CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
             COUNT(*) AS n_events
      FROM sess GROUP BY user_id, sid),
    wm AS (SELECT MAX(ts) - INTERVAL 2 HOUR AS w FROM events)
    SELECT user_id, session_start, session_end, n_events
    FROM agg, wm WHERE session_end < w
    """,
    doc="NATIVE session windows as a real APPEND-mode stream: "
    "Structured Streaming merges per-user session windows in the "
    "state store and emits each one exactly once, when the "
    "watermark passes its end — the production sessionization "
    "operator (the applyInPandasWithState sessionizer is the "
    "custom-logic variant; this is the built-in). Under availableNow "
    "the final watermark is max(event time) - 2h, so the emitted "
    "set is the batch sessions closed before it — stated exactly by "
    "the oracle; the dangling tail stays in state by design",
)
def streaming_session_window_native(spark, sf_dir):
    from chiv_spark.streaming.events import run_native_session_windows

    ckpt = tempfile.mkdtemp(prefix="chiv-nsw-ckpt-")
    return run_native_session_windows(spark, sf_dir, ckpt)


# --------------------------------------------------------------------------
# events_scd2_state — type-2 slowly-changing-dimension build


@query(
    "events_scd2_state",
    """
    WITH ordered AS (
      SELECT user_id, event_type AS state, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_state
      FROM events),
    starts AS (
      SELECT user_id, state, ts, event_id,
             CASE WHEN prev_state IS NULL OR prev_state != state
                  THEN 1 ELSE 0 END AS is_change
      FROM ordered),
    versioned AS (
      SELECT user_id, state, ts, event_id,
             SUM(is_change) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS version
      FROM starts),
    spans AS (
      SELECT user_id, state, version,
             COUNT(*) AS n_events,
             MIN(ts) AS valid_from
      FROM versioned GROUP BY user_id, state, version)
    SELECT user_id, CAST(version AS BIGINT) AS version, state,
           CAST(valid_from AS TIMESTAMP) AS valid_from,
           CAST(LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version)
                AS TIMESTAMP) AS valid_to,
           CAST(n_events AS BIGINT) AS n_events
    FROM spans
    """,
    doc="type-2 slowly-changing-dimension build from an event "
    "stream: consecutive equal states compress into versioned "
    "validity spans (valid_from inclusive, valid_to = next span's "
    "start, NULL while current) via lag-change flag + running sum + "
    "lead — the warehouse dimension-history primitive (state = "
    "event_type as the tracked attribute). Every span carries its "
    "event count so silent row loss is visible. Scale: all three "
    "windows share ONE user-keyed sort/shuffle (same partition key, "
    "same ordering), spans are change-bounded not event-bounded, "
    "and the skew answer is the sessionize_scalable bucket "
    "decomposition (a span's membership depends only on its "
    "neighbors, like session boundaries)",
)
def events_scd2_state(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ordered = e.select(
        "user_id",
        F.col("event_type").alias("state"),
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_state"),
    )
    starts = ordered.withColumn(
        "is_change",
        F.when(
            F.col("prev_state").isNull() | (F.col("prev_state") != F.col("state")), 1
        ).otherwise(0),
    )
    versioned = starts.withColumn("version", F.sum("is_change").over(wrun))
    spans = versioned.groupBy("user_id", "state", "version").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("valid_from"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return spans.select(
        "user_id",
        F.col("version").cast("long").alias("version"),
        "state",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.lead("valid_from").over(wv).cast("timestamp").alias("valid_to"),
        F.col("n_events").cast("long").alias("n_events"),
    )


@query(
    "scan_csv_roundtrip",
    """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY event_type
    """,
    doc="CSV source round trip (completes the interchange-format "
    "set next to ORC and NDJSON): the measure columns are written "
    "to headered CSV and read back with an EXPLICIT schema (never "
    "inference — nondeterministic sampling has no place in a "
    "pipeline), then aggregated; the oracle aggregates the source "
    "parquet, so any serialization loss surfaces as a mismatch. "
    "Doubles survive because Spark writes Java shortest round-trip "
    "representations; the distributed read splits CSV by line "
    "ranges, so parallelism matches the parquet scan's",
)
def scan_csv_roundtrip(spark, sf_dir):
    import shutil as _shutil
    import tempfile as _tempfile

    e = t(spark, sf_dir, "events")
    work = _tempfile.mkdtemp(prefix="chiv-csvscan-")
    try:
        e.select("event_type", "value").write.mode("overwrite").option(
            "header", "true"
        ).csv(f"{work}/events_csv")
        back = (
            spark.read.schema("event_type string, value double")
            .option("header", "true")
            .csv(f"{work}/events_csv")
        )
        out = back.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100.0).cast("long")).cast("long").alias("cents"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        _shutil.rmtree(work, ignore_errors=True)


@query(
    "transform_dynamic_partition_pruning",
    """
    WITH dim AS (
      SELECT * FROM (VALUES ('view', 'browse'), ('click', 'browse'),
                            ('purchase', 'convert'), ('signup', 'convert'),
                            ('logout', 'other')) AS t(event_type, category))
    SELECT d.category,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(e.value * 100.0) AS BIGINT)) AS BIGINT) AS cents
    FROM events e JOIN dim d ON d.event_type = e.event_type
    WHERE d.category = 'convert'
    GROUP BY d.category
    """,
    doc="DYNAMIC partition pruning end-to-end (the runtime twin of "
    "transform_partition_pruned_scan's static pruning): the fact "
    "side is written partitioned by event_type, the join dim "
    "carries the filter (category = 'convert'), and Catalyst "
    "injects a dynamicpruning#N subquery into the fact scan's "
    "partition filters — at 100 TB this is how a star join reads "
    "only the partitions the filtered dimension reaches, without "
    "the author naming them. The fact predicate never appears in "
    "the query text; tests/test_plans.py pins the dynamicpruning "
    "expression in the scan. Oracle states the plain logical join",
)
def transform_dynamic_partition_pruning(spark, sf_dir):
    import shutil as _shutil
    import tempfile as _tempfile

    e = t(spark, sf_dir, "events")
    dim = e.sparkSession.createDataFrame(
        [
            ("view", "browse"),
            ("click", "browse"),
            ("purchase", "convert"),
            ("signup", "convert"),
            ("logout", "other"),
        ],
        "event_type string, category string",
    )
    work = _tempfile.mkdtemp(prefix="chiv-dpp-")
    try:
        e.write.mode("overwrite").partitionBy("event_type").parquet(f"{work}/events_by_type")
        fact = spark.read.parquet(f"{work}/events_by_type")
        out = (
            fact.join(dim.filter(F.col("category") == "convert"), "event_type")
            .groupBy("category")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.sum(F.round(F.col("value") * 100.0).cast("long"))
                .cast("long")
                .alias("cents"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        _shutil.rmtree(work, ignore_errors=True)


@query(
    "join_scd2_enrich",
    """
    WITH ordered AS (
      SELECT user_id, event_type AS state, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_state
      FROM events),
    versioned AS (
      SELECT user_id, state, ts, event_id,
             SUM(CASE WHEN prev_state IS NULL OR prev_state != state
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
      FROM ordered),
    spans AS (
      SELECT user_id, state, version, MIN(ts) AS valid_from
      FROM versioned GROUP BY user_id, state, version),
    purchases AS (
      SELECT event_id, user_id, ts
      FROM events WHERE event_type = 'purchase'),
    matched AS (
      SELECT p.event_id, p.user_id, p.ts, s.state, s.version,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY s.valid_from DESC, s.version DESC) AS rk
      FROM purchases p JOIN spans s
        ON s.user_id = p.user_id AND s.valid_from <= p.ts)
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
           state AS state_at_purchase, CAST(version AS BIGINT) AS version
    FROM matched WHERE rk = 1
    """,
    doc="point-in-time dimension enrichment (the consumption side "
    "of events_scd2_state): each purchase joins the SCD2 validity "
    "span in force at its timestamp — an as-of backward match "
    "implemented as a user-keyed range join + per-event argmax of "
    "valid_from, the standard late-binding dimension lookup of a "
    "bitemporal warehouse. Scale: the join fans out only by "
    "spans-per-user (change-bounded, not event-bounded), the rank "
    "window partitions by event — uniform keys; at extreme "
    "span-counts the swap is the interval-bucketed join "
    "(join_interval_bucketed's calendar decomposition)",
)
def join_scd2_enrich(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ordered = e.select(
        "user_id",
        F.col("event_type").alias("state"),
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_state"),
    )
    versioned = ordered.withColumn(
        "version",
        F.sum(
            F.when(
                F.col("prev_state").isNull()
                | (F.col("prev_state") != F.col("state")),
                1,
            ).otherwise(0)
        ).over(wrun),
    )
    spans = versioned.groupBy("user_id", "state", "version").agg(
        F.min("ts").alias("valid_from")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    matched = purchases.join(spans, "user_id").filter(
        F.col("valid_from") <= F.col("ts")
    )
    rk = F.row_number().over(
        Window.partitionBy("event_id").orderBy(
            F.col("valid_from").desc(), F.col("version").desc()
        )
    )
    return (
        matched.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            F.col("state").alias("state_at_purchase"),
            F.col("version").cast("long").alias("version"),
        )
    )


@query(
    "events_scd2_state_scalable",
    None,  # oracle attached below: events_scd2_state's, verbatim
    doc="skew-safe twin of events_scd2_state (the fifth member of "
    "the bucketed-window family): state runs are computed WITHIN "
    "(user, day-bucket) windows — a hot user's events spread across "
    "as many tasks as they span days — then the per-bucket RUN rows "
    "(change-bounded, not event-bounded) merge across boundaries in "
    "a second per-user pass that re-run-length-encodes adjacent "
    "equal states. A span's membership depends only on its "
    "neighbors, exactly like session boundaries, so the prefix "
    "decomposition is lossless; identical oracle to the plain "
    "variant, 1000x hot-user generator test proves row identity",
)
def events_scd2_state_scalable(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    bucket_us = 86_400_000_000  # 1 day

    # stage 1: run-length encode WITHIN (user, day-bucket)
    wb = Window.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    wbrun = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed = e.select(
        "user_id",
        F.col("event_type").alias("state"),
        "ts",
        "event_id",
        (F.unix_micros("ts") / bucket_us).cast("long").alias("bucket"),
    )
    runs = (
        bucketed.withColumn(
            "chg",
            F.when(
                F.lag("state").over(wb).isNull()
                | (F.lag("state").over(wb) != F.col("state")),
                1,
            ).otherwise(0),
        )
        .withColumn("run_idx", F.sum("chg").over(wbrun))
        .groupBy("user_id", "bucket", "run_idx")
        .agg(
            F.min("state").alias("state"),  # constant within a run
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("run_from"),
        )
    )
    # stage 2: merge runs across bucket boundaries — per-user rows
    # are now change-bounded, never event-bounded
    wu = Window.partitionBy("user_id").orderBy("bucket", "run_idx")
    wurun = wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged = (
        runs.withColumn(
            "chg2",
            F.when(
                F.lag("state").over(wu).isNull()
                | (F.lag("state").over(wu) != F.col("state")),
                1,
            ).otherwise(0),
        )
        .withColumn("version", F.sum("chg2").over(wurun))
        .groupBy("user_id", "version")
        .agg(
            F.min("state").alias("state"),  # constant within a span
            F.sum("n_events").alias("n_events"),
            F.min("run_from").alias("valid_from"),
        )
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return merged.select(
        "user_id",
        F.col("version").cast("long").alias("version"),
        "state",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.lead("valid_from").over(wv).cast("timestamp").alias("valid_to"),
        F.col("n_events").cast("long").alias("n_events"),
    )


from chiv_spark.queries.base import REGISTRY as _SCD2_REG  # noqa: E402

_SCD2_REG["events_scd2_state_scalable"] = _SCD2_REG["events_scd2_state_scalable"].__class__(
    name="events_scd2_state_scalable",
    fn=_SCD2_REG["events_scd2_state_scalable"].fn,
    oracle=_SCD2_REG["events_scd2_state"].oracle,
    doc=_SCD2_REG["events_scd2_state_scalable"].doc,
)
