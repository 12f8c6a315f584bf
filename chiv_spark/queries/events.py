"""Event-stream queries: tumbling-window aggregation (batch twin of
the Structured Streaming pipeline), gap-based sessionization, and the
real streaming run (no SQL oracle — rows-only check)."""

from __future__ import annotations

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
    "streaming_events_window",
    None,  # genuine Structured Streaming run — rows-only check
    doc="real readStream→watermark→window→writeStream run (availableNow trigger, memory sink)",
)
def streaming_events_window(spark, sf_dir):
    ckpt = tempfile.mkdtemp(prefix="chiv-stream-ckpt-")
    return run_events_stream(spark, sf_dir, ckpt)


@query(
    "streaming_stateful_sessions",
    None,  # custom stateful operator (applyInPandasWithState) — rows-only
    doc="custom stateful streaming sessionizer via applyInPandasWithState "
    "(closed sessions match the batch events_sessionize twin exactly)",
)
def streaming_stateful_sessions(spark, sf_dir):
    from chiv_spark.streaming.sessions import run_stateful_sessions

    ckpt = tempfile.mkdtemp(prefix="chiv-state-ckpt-")
    return run_stateful_sessions(spark, sf_dir, ckpt)
