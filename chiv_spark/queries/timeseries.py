"""Time-series / change-data-capture tier over the events table.

- ``timeseries_gapfill``: hourly resample per user with a generated
  spine (``sequence`` + explode), zero-fill for missing hours and
  forward-fill of the last observed hourly sum. The spine is built
  per-user from that user's own [min, max] range, so spine size is
  O(users x span-hours) regardless of event volume; the fill window
  partitions by user (one shuffle, bounded state).
- ``cdc_scd2_intervals``: slowly-changing-dimension type-2 validity
  intervals from an append-only change log — each (user, type) row
  gets valid_from/valid_to via ``lead`` and an is_current flag.
- ``events_markov_transitions``: first-order event-type transition
  probabilities per user-session stream (lead over (ts, event_id),
  then a transition-pair aggregation — output is |types|^2-sized).
- ``window_ntile_distribution``: ntile quartiles + percent_rank /
  cume_dist over a unique ordering key (no ties -> deterministic),
  aggregated to a quartile summary.

Float sums go through DECIMAL transit (detmath.py rationale); every
window ordering key is unique so rank-family outputs are
order-deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from chiv_spark.functions.detmath import det_round, duckdb_det_round
from chiv_spark.queries.base import query, t

# --------------------------------------------------------------------------
# timeseries_gapfill

_GAPFILL_USERS = 20  # bound the demo spine; the shape is per-user regardless


@query(
    "timeseries_gapfill",
    f"""
    WITH ev AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             COUNT(*) AS n_events,
             SUM(CAST(value AS DECIMAL(18,6))) AS v_sum
      FROM events WHERE user_id < {_GAPFILL_USERS}
      GROUP BY user_id, date_trunc('hour', ts)),
    b AS (
      SELECT user_id, MIN(h) AS mn, MAX(h) AS mx FROM ev GROUP BY user_id),
    spine AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
      FROM b),
    j AS (
      SELECT s.user_id, s.h,
             CAST(COALESCE(ev.n_events, 0) AS BIGINT) AS n_events,
             ev.v_sum
      FROM spine s LEFT JOIN ev ON s.user_id = ev.user_id AND s.h = ev.h)
    SELECT user_id, h AS hour_ts, n_events,
           {duckdb_det_round("CAST(last_value(v_sum IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)")} AS v_filled
    FROM j
    """,
    doc="hourly resample + zero-fill + forward-fill over a generated "
    "per-user spine (sequence/explode; spine is O(users x hours))",
)
def timeseries_gapfill(spark, sf_dir):
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") < _GAPFILL_USERS)
        .groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("v_sum"),
        )
    )
    bounds = ev.groupBy("user_id").agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    j = spine.join(ev, ["user_id", "h"], "left").select(
        "user_id",
        "h",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "v_sum",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        F.col("h").alias("hour_ts"),
        "n_events",
        det_round(F.last("v_sum", ignorenulls=True).over(w).cast("double")).alias("v_filled"),
    )


# --------------------------------------------------------------------------
# cdc_scd2_intervals

_CDC_USERS = 50


@query(
    "cdc_scd2_intervals",
    f"""
    SELECT user_id, event_type,
           CAST(value AS DOUBLE) AS value,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM events WHERE user_id < {_CDC_USERS}
    WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    """,
    doc="SCD2 validity intervals from an append-only change log: "
    "valid_from/valid_to via lead, is_current flag (one shuffle on key)",
)
def cdc_scd2_intervals(spark, sf_dir):
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < _CDC_USERS)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_type",
        F.col("value").cast("double").alias("value"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# --------------------------------------------------------------------------
# cdc_merge_upsert

_MERGE_CUTOVER = "2024-01-15"


@query(
    "cdc_merge_upsert",
    f"""
    WITH base AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{_MERGE_CUTOVER}')
      WHERE rn = 1),
    upd AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{_MERGE_CUTOVER}')
      WHERE rn = 1)
    SELECT COALESCE(base.user_id, upd.user_id) AS user_id,
           COALESCE(base.event_type, upd.event_type) AS event_type,
           CAST(COALESCE(upd.value, base.value) AS DOUBLE) AS value,
           CASE WHEN base.user_id IS NULL THEN 'insert'
                WHEN upd.user_id IS NULL THEN 'keep'
                ELSE 'update' END AS action
    FROM base FULL OUTER JOIN upd
      ON base.user_id = upd.user_id AND base.event_type = upd.event_type
    """,
    doc="Delta-style MERGE/upsert: latest pre-cutover state full-outer-"
    "joined with post-cutover changes; insert/update/keep actions. "
    "Both sides shuffle once on the merge key and the join co-locates",
)
def cdc_merge_upsert(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def latest(df):
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_type", "value")
        )

    cut = F.lit(_MERGE_CUTOVER).cast("timestamp")
    base = latest(ev.filter(F.col("ts") < cut))
    upd = latest(ev.filter(F.col("ts") >= cut))
    j = base.alias("b").join(
        upd.alias("u"),
        (F.col("b.user_id") == F.col("u.user_id"))
        & (F.col("b.event_type") == F.col("u.event_type")),
        "full_outer",
    )
    return j.select(
        F.coalesce(F.col("b.user_id"), F.col("u.user_id")).alias("user_id"),
        F.coalesce(F.col("b.event_type"), F.col("u.event_type")).alias("event_type"),
        F.coalesce(F.col("u.value"), F.col("b.value")).cast("double").alias("value"),
        F.when(F.col("b.user_id").isNull(), F.lit("insert"))
        .when(F.col("u.user_id").isNull(), F.lit("keep"))
        .otherwise(F.lit("update"))
        .alias("action"),
    )


# --------------------------------------------------------------------------
# events_markov_transitions


@query(
    "events_markov_transitions",
    f"""
    WITH seq AS (
      SELECT user_id, event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      FROM events),
    pairs AS (
      SELECT src, dst, COUNT(*) AS n FROM seq WHERE dst IS NOT NULL GROUP BY src, dst),
    tot AS (
      SELECT src, SUM(n) AS n_src FROM pairs GROUP BY src)
    SELECT pairs.src, pairs.dst,
           CAST(pairs.n AS BIGINT) AS n_transitions,
           {duckdb_det_round('pairs.n / CAST(tot.n_src AS DOUBLE)')} AS prob
    FROM pairs JOIN tot ON pairs.src = tot.src
    """,
    doc="first-order Markov transition matrix over per-user event streams "
    "(lead window + |types|^2-sized aggregation)",
)
def events_markov_transitions(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"), F.lead("event_type").over(w).alias("dst")
    ).filter(F.col("dst").isNotNull())
    pairs = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    tot = pairs.groupBy("src").agg(F.sum("n").alias("n_src"))
    return (
        pairs.join(F.broadcast(tot), "src")
        .select(
            "src",
            "dst",
            F.col("n").cast("long").alias("n_transitions"),
            det_round(F.col("n") / F.col("n_src").cast("double")).alias("prob"),
        )
    )


# --------------------------------------------------------------------------
# window_ntile_distribution


@query(
    "window_ntile_distribution",
    f"""
    WITH ranked AS (
      SELECT o_orderpriority,
             o_totalprice,
             ntile(4)       OVER w AS quartile,
             percent_rank() OVER w AS pr,
             cume_dist()    OVER w AS cd
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey))
    SELECT o_orderpriority, quartile,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {duckdb_det_round('MIN(o_totalprice)', 2)} AS min_price,
           {duckdb_det_round('MAX(o_totalprice)', 2)} AS max_price,
           {duckdb_det_round('MAX(pr)')} AS max_percent_rank,
           {duckdb_det_round('MAX(cd)')} AS max_cume_dist
    FROM ranked GROUP BY o_orderpriority, quartile
    """,
    doc="ntile quartiles + percent_rank/cume_dist over a unique ordering "
    "key, aggregated to a per-quartile summary",
)
def window_ntile_distribution(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return ranked.groupBy("o_orderpriority", "quartile").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        det_round(F.min("o_totalprice"), 2).alias("min_price"),
        det_round(F.max("o_totalprice"), 2).alias("max_price"),
        det_round(F.max("pr")).alias("max_percent_rank"),
        det_round(F.max("cd")).alias("max_cume_dist"),
    )


@query(
    "timeseries_multi_rollup",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
           date_trunc('hour', ts) AS bucket_hour,
           COUNT(*) AS n_events,
           (CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS DOUBLE) / 100.0)
             AS sum_value
    FROM events
    GROUP BY ROLLUP (CAST(date_trunc('day', ts) AS TIMESTAMP), date_trunc('hour', ts))
    """,
    doc="hypertable-style multi-resolution rollup: day + hour + grand "
    "totals in ONE pass (GROUP BY ROLLUP over truncated timestamps — "
    "Catalyst expands grouping sets with map-side partials, so the "
    "exchange carries groups-per-resolution, not events). NULL bucket "
    "columns mark the coarser levels, as in agg_rollup",
)
def timeseries_multi_rollup(spark, sf_dir):
    from chiv_spark.functions.detmath import money_sum

    e = t(spark, sf_dir, "events")
    return (
        e.select(
            F.date_trunc("day", "ts").alias("bucket_day"),
            F.date_trunc("hour", "ts").alias("bucket_hour"),
            "value",
        )
        .rollup("bucket_day", "bucket_hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            money_sum("value").alias("sum_value"),
        )
    )


#: EWMA smoothing factor — s_t = ALPHA*x_t + (1-ALPHA)*s_{t-1}
_EWMA_A = 0.3


@query(
    "timeseries_ewma",
    f"""
    WITH per_user AS (
      SELECT user_id,
             list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals
      FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           {duckdb_det_round(f"list_reduce(vals, (acc, x) -> {_EWMA_A} * x + {1 - _EWMA_A} * acc)")}
             AS ewma_value
    FROM per_user
    """,
    doc="per-user exponential moving average of event values — an "
    "order-dependent recurrence SQL windows can't express directly. "
    "One groupBy collects each user's series (bounded: events-per-user, "
    "not table-sized), then a JVM-side higher-order aggregate() folds "
    "s_t = a*x_t + (1-a)*s_(t-1) left-to-right; ordering key "
    "(ts, event_id) is unique so the fold order — and the IEEE float "
    "result — is identical in both engines. No UDF, no window spill",
)
def timeseries_ewma(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    series = e.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col("ts"), F.col("event_id"), F.col("value").cast("double").alias("value"))
            )
        ).alias("xs")
    )
    vals = F.transform(F.col("xs"), lambda s: s["value"])
    fold = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(_EWMA_A) * x + F.lit(1 - _EWMA_A) * acc,
    )
    return series.select(
        "user_id",
        F.size(vals).cast("long").alias("n_events"),
        det_round(fold).alias("ewma_value"),
    )


@query(
    "cdc_point_in_time_join",
    f"""
    WITH dim AS (
      SELECT user_id,
             CAST(value AS DOUBLE) AS profile_value,
             ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM events
      WHERE event_type = 'signup' AND user_id < {_CDC_USERS}),
    facts AS (
      SELECT event_id, user_id, ts, CAST(value AS DOUBLE) AS amount
      FROM events
      WHERE event_type = 'purchase' AND user_id < {_CDC_USERS})
    SELECT f.event_id, f.user_id, f.amount,
           d.profile_value,
           (d.valid_to IS NULL) AS joined_current_version
    FROM facts f JOIN dim d
      ON f.user_id = d.user_id
     AND f.ts >= d.valid_from
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    """,
    doc="point-in-time (temporal) join: each purchase fact looks up the "
    "SCD2 dimension version valid at its timestamp — the classic "
    "warehouse pattern composing cdc_scd2_intervals' interval "
    "construction with a BETWEEN join. The equi key (user_id) carries "
    "the join; the validity predicate is a residual filter, so the "
    "plan is one key shuffle with per-user version lists bounded by "
    "change frequency — no interval cross product at any scale",
)
def cdc_point_in_time_join(spark, sf_dir):
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < _CDC_USERS)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("d_user"),
        F.col("value").cast("double").alias("profile_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").cast("double").alias("amount")
    )
    cond = (
        (facts.user_id == dim.d_user)
        & (facts.ts >= dim.valid_from)
        & (dim.valid_to.isNull() | (facts.ts < dim.valid_to))
    )
    return facts.join(dim, cond).select(
        "event_id",
        "user_id",
        "amount",
        "profile_value",
        dim.valid_to.isNull().alias("joined_current_version"),
    )


@query(
    "window_running_distinct",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events)
    SELECT user_id, event_id,
           CAST(SUM(first_seen) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS BIGINT)
             AS distinct_types_so_far
    FROM flagged
    """,
    doc="cumulative DISTINCT count over an expanding window (distinct "
    "event types each user has seen up to each event) via the "
    "first-occurrence trick: flag each (user, type)'s first row with "
    "one per-key window, then a running SUM of flags — neither engine "
    "needs DISTINCT-in-window, and both shuffles key on user_id "
    "(bounded per-user state, unique (ts, event_id) ordering keeps "
    "ranks deterministic)",
)
def window_running_distinct(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(w_run).cast("long").alias("distinct_types_so_far"),
    )


# --------------------------------------------------------------------------
# timeseries_ohlc_bars


@query(
    "timeseries_ohlc_bars",
    """
    SELECT user_id, date_trunc('hour', ts) AS bar_hour,
           arg_min(value, ts) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, ts) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id, date_trunc('hour', ts)
    """,
    doc="OHLC resampling (the finance/telemetry bar aggregation): "
    "open/close via min_by/max_by on the event time — ONE hash "
    "aggregate with map-side partials, no per-bar window sort "
    "((user_id, ts) is unique, so min_by/max_by are deterministic; "
    "high/low/count are plain aggregates; values pass through "
    "untouched so no float accumulation exists)",
)
def timeseries_ohlc_bars(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bar_hour")
    ).agg(
        F.min_by("value", "ts").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "ts").alias("close"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


# --------------------------------------------------------------------------
# window_drawdown


# shared by the plain and skew-resilient variants (same logical result)
_DRAWDOWN_ORACLE = """
    WITH cum AS (
      SELECT user_id, ts, event_id,
             SUM(CAST(ROUND(value * 100.0) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS equity_cents
      FROM events),
    peaks AS (
      SELECT user_id, ts, event_id, equity_cents,
             MAX(equity_cents)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS peak_cents
      FROM cum)
    SELECT event_id, user_id,
           (CAST(equity_cents AS DOUBLE) / 100.0) AS equity,
           (CAST(peak_cents AS DOUBLE) / 100.0) AS running_peak,
           (CAST(peak_cents - equity_cents AS DOUBLE) / 100.0) AS drawdown
    FROM peaks
    """


@query(
    "window_drawdown",
    _DRAWDOWN_ORACLE,
    doc="running maximum drawdown per user over the cumulative value "
    "series — the risk-analytics window pattern (running sum, "
    "running max, gap). The nested max-of-running-sum plans as two "
    "Window nodes sharing ONE user-keyed sort and ONE exchange "
    "(plan-asserted): the data moves and sorts once regardless of "
    "frame nesting. The accumulation rides integer cents so the "
    "running values are exact and order-stable ((user_id, ts) is a "
    "unique key — pinned by a data-contract test)",
)
def window_drawdown(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.round(F.col("value") * 100.0).cast("long")
    # nested frames over the SAME (user_id, ts) ordering: Catalyst
    # plans both in one Window pass over one sort/exchange
    peaks = e.select(
        "event_id",
        "user_id",
        F.sum(cents).over(w).alias("equity_cents"),
        F.max(F.sum(cents).over(w)).over(w).alias("peak_cents"),
    )
    return peaks.select(
        "event_id",
        "user_id",
        (F.col("equity_cents").cast("double") / 100.0).alias("equity"),
        (F.col("peak_cents").cast("double") / 100.0).alias("running_peak"),
        ((F.col("peak_cents") - F.col("equity_cents")).cast("double") / 100.0).alias(
            "drawdown"
        ),
    )


# --------------------------------------------------------------------------
# window_drawdown_scalable


@query(
    "window_drawdown_scalable",
    # IDENTICAL oracle to window_drawdown: same logical result via a
    # skew-resilient physical strategy
    _DRAWDOWN_ORACLE,
    doc="skew-resilient drawdown — third instance of the bucketed "
    "prefix-decomposition pattern (after sessionize and the two "
    "attribution models), proving it generalizes to NESTED frames: "
    "running sum AND running max-of-sum both decompose across "
    "(user, day-bucket) boundaries. Within-bucket: local running "
    "sum + local running peak (one window pass, one sort). Per "
    "bucket: (sum, peak) aggregate; two chained windows over the "
    "bucket rows (days-per-user, not events) derive each bucket's "
    "equity offset (prefix sum of earlier bucket sums) and the "
    "global peak carried in (running max of offset+peak over "
    "earlier buckets). Join back on the composite key: equity = "
    "offset + local run, peak = max(carried peak, offset + local "
    "peak run). Integer-cents arithmetic keeps every partial exact "
    "and order-free, so the decomposition is bit-identical to the "
    "single-window formulation (shared oracle; hot-key pytest)",
)
def window_drawdown_scalable(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100.0).cast("long")
    base = e.select(
        "event_id",
        "user_id",
        "ts",
        cents.alias("cents"),
        (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("bucket"),
    )
    wb = (
        Window.partitionBy("user_id", "bucket")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.select(
        "event_id",
        "user_id",
        "bucket",
        F.sum("cents").over(wb).alias("lrun"),
        F.max(F.sum("cents").over(wb)).over(wb).alias("lpeak"),
    )
    bagg = base.groupBy("user_id", "bucket").agg(F.sum("cents").alias("bsum"))
    bpeak = local.groupBy("user_id", "bucket").agg(F.max("lrun").alias("bpeak"))
    wu = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        bagg.join(bpeak, ["user_id", "bucket"])
        .withColumn("off", F.coalesce(F.sum("bsum").over(wu), F.lit(0)))
        .withColumn("peak_before", F.max(F.col("off") + F.col("bpeak")).over(wu))
        .select("user_id", "bucket", "off", "peak_before")
    )
    j = local.join(carry, ["user_id", "bucket"])
    equity = F.col("off") + F.col("lrun")
    local_peak = F.col("off") + F.col("lpeak")
    peak = F.when(
        F.col("peak_before").isNull(), local_peak
    ).otherwise(F.greatest("peak_before", local_peak))
    return j.select(
        "event_id",
        "user_id",
        (equity.cast("double") / 100.0).alias("equity"),
        (peak.cast("double") / 100.0).alias("running_peak"),
        ((peak - equity).cast("double") / 100.0).alias("drawdown"),
    )


# --------------------------------------------------------------------------
# timeseries_seasonality_profile


@query(
    "timeseries_seasonality_profile",
    f"""
    WITH q AS (
      SELECT event_type,
             CAST(date_part('hour', ts) AS BIGINT) AS hod,
             CAST(ROUND(value * 100.0) AS BIGINT) AS cents
      FROM events),
    mom AS (
      SELECT event_type, hod,
             COUNT(*) AS n,
             SUM(CAST(cents AS HUGEINT)) AS s1,
             SUM(CAST(cents AS HUGEINT) * cents) AS s2
      FROM q GROUP BY event_type, hod)
    SELECT event_type, hod, CAST(n AS BIGINT) AS n,
           {duckdb_det_round('CAST(s1 AS DOUBLE) / n / 100.0')} AS seasonal_mean,
           {duckdb_det_round(
               '(CAST(s2 AS DOUBLE) / n'
               ' - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))'
               ' / 10000.0')} AS residual_var
    FROM mom
    """,
    doc="hour-of-day seasonality profile per event type: seasonal "
    "mean and residual (within-hour) variance from exact centi-"
    "quantized power sums — the decomposition table a seasonal "
    "anomaly detector subtracts before thresholding. ONE hash agg "
    "over a 5x24-key space (map-side partials); power sums ride "
    "DECIMAL(38)/HUGEINT so 100 TB row counts cannot overflow, and "
    "each output is one IEEE chain per cell",
)
def timeseries_seasonality_profile(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100.0).cast("long")
    q = e.select(
        "event_type", F.hour("ts").cast("long").alias("hod"), cents.alias("cents")
    )
    xd = F.col("cents").cast("decimal(38,0)")
    mom = q.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("s1"),
        F.sum(xd * F.col("cents")).alias("s2"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mu * mu
    return mom.select(
        "event_type",
        "hod",
        F.col("n").cast("long").alias("n"),
        det_round(mu / 100.0).alias("seasonal_mean"),
        det_round(var / 10000.0).alias("residual_var"),
    )


# --------------------------------------------------------------------------
# timeseries_holt_linear — double exponential smoothing

_HOLT_A = 0.5  # level smoothing
_HOLT_G = 0.25  # trend smoothing


@query(
    "timeseries_holt_linear",
    # recursive-CTE restatement of the fold: DuckDB's list_reduce
    # with STRUCT accumulators showed field-evaluation-order
    # surprises (scalar folds like the EWMA oracle are fine), so the
    # two-variable recurrence steps through an explicit recursion —
    # one row per user per step, depth = max series length, the same
    # IEEE op sequence as the engine fold
    f"""
    WITH RECURSIVE seq AS (
      SELECT user_id, CAST(value AS DOUBLE) AS x,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events),
    rec AS (
      SELECT user_id, 1 AS i, n, x AS l, CAST(0.0 AS DOUBLE) AS b
      FROM seq WHERE i = 1
      UNION ALL
      SELECT r.user_id, r.i + 1, r.n,
             CAST({_HOLT_A} AS DOUBLE) * s.x
               + CAST({1 - _HOLT_A} AS DOUBLE) * (r.l + r.b),
             CAST({_HOLT_G} AS DOUBLE)
               * ((CAST({_HOLT_A} AS DOUBLE) * s.x
                   + CAST({1 - _HOLT_A} AS DOUBLE) * (r.l + r.b)) - r.l)
               + CAST({1 - _HOLT_G} AS DOUBLE) * r.b
      FROM rec r JOIN seq s ON s.user_id = r.user_id AND s.i = r.i + 1)
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           (FLOOR(l * 1000000.0 + 0.5) / 1000000.0) AS level,
           (FLOOR(b * 1000000.0 + 0.5) / 1000000.0) AS trend,
           (FLOOR((l + b) * 1000000.0 + 0.5) / 1000000.0) AS forecast_1
    FROM rec WHERE i = n
    """,
    doc="Holt double exponential smoothing per user (level + linear "
    "trend, the one-step forecaster a bare EWMA can't provide): the "
    "TWO-variable recurrence l' = a*x + (1-a)(l+b), "
    "b' = g*(l'-l) + (1-g)*b folds left-to-right over each user's "
    "ordered series as a STRUCT accumulator inside a JVM "
    "higher-order aggregate — no UDF, no window, state rides "
    "through the lambda exactly like the streaming formulation "
    "would ride applyInPandasWithState state. Initialization "
    "convention (l0 = x1, b0 = 0) is expressible as the fold seed "
    "in BOTH engines, and the (ts, event_id) ordering key is unique "
    "so the IEEE op sequence — and the result bits — match. "
    "Per-user lists are bounded by events-per-user; the skew-safe "
    "rewrite at extreme hot keys is the bucketed fold of the "
    "drawdown pattern (Holt is not prefix-decomposable exactly, "
    "so hot keys instead get the documented sessionize-style "
    "mini-batch approximation — or the streaming stateful form)",
)
def timeseries_holt_linear(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    series = e.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("ts"),
                    F.col("event_id"),
                    F.col("value").cast("double").alias("value"),
                )
            )
        ).alias("xs")
    )
    vals = F.transform(F.col("xs"), lambda s: s["value"])
    a, g = _HOLT_A, _HOLT_G

    def step(acc, x):
        lvl = F.lit(a) * x + F.lit(1 - a) * (acc["a"] + acc["b"])
        tr = F.lit(g) * (lvl - acc["a"]) + F.lit(1 - g) * acc["b"]
        return F.struct(lvl.alias("a"), tr.alias("b"))

    zero = F.struct(
        F.element_at(vals, 1).alias("a"), F.lit(0.0).alias("b")
    )
    fold = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))), zero, step
    )
    return series.select(
        "user_id",
        F.size(vals).cast("long").alias("n_events"),
        det_round(fold["a"]).alias("level"),
        det_round(fold["b"]).alias("trend"),
        det_round(fold["a"] + fold["b"]).alias("forecast_1"),
    )


# --------------------------------------------------------------------------
# timeseries_m4_downsample


@query(
    "timeseries_m4_downsample",
    """
    WITH pts AS (
      SELECT user_id, epoch_us(ts) AS us,
             CAST(ROUND(value * 100.0) AS BIGINT) AS cents,
             event_id
      FROM events),
    b AS (
      SELECT user_id, MIN(us) AS mn, MAX(us) AS mx
      FROM pts GROUP BY user_id),
    binned AS (
      SELECT p.user_id,
             LEAST(((p.us - b.mn) * 20) // (b.mx - b.mn + 1), 19) AS bucket,
             p.us, p.cents, p.event_id
      FROM pts p JOIN b ON p.user_id = b.user_id)
    SELECT user_id, CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents,
           CAST(arg_min(cents, us) AS BIGINT) AS first_cents,
           CAST(arg_max(cents, us) AS BIGINT) AS last_cents
    FROM binned GROUP BY user_id, bucket
    """,
    doc="M4 plot downsampling (Jugel et al., VLDB 2014): each user's "
    "value series reduced to 20 equal-time buckets carrying min / "
    "max / first / last — the four points that make a line chart "
    "pixel-identical to the full series at bucket-per-pixel-column "
    "resolution, which is how dashboards render a 100 TB series "
    "without shipping it. Per-user [min,max] time bounds come from "
    "one hash agg broadcast back; bucket assignment is exact "
    "integer arithmetic (no float division ambiguity at bucket "
    "edges); first/last ride min_by/max_by on the unique (us, "
    "event_id) key inside the SAME single aggregate — no per-bucket "
    "window sort anywhere",
)
def timeseries_m4_downsample(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    pts = e.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100.0).cast("long").alias("cents"),
        "event_id",
    )
    b = pts.groupBy("user_id").agg(
        F.min("us").alias("mn"), F.max("us").alias("mx")
    )
    binned = pts.join(F.broadcast(b), "user_id").select(
        "user_id",
        # integer division: (us - mn)*20 can exceed 2^53, so a float
        # quotient would mis-bucket edge points (engine/oracle skew)
        F.least(
            F.expr("(us - mn) * 20 div (mx - mn + 1)"),
            F.lit(19),
        ).alias("bucket"),
        "us",
        "cents",
        "event_id",
    )
    # (user_id, ts) is unique (data-contract test), so `us` alone is
    # a total ordering key within each user
    key = F.col("us")
    return binned.groupBy(
        "user_id", F.col("bucket").cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.min("cents").cast("long").alias("min_cents"),
        F.max("cents").cast("long").alias("max_cents"),
        F.min_by("cents", key).cast("long").alias("first_cents"),
        F.max_by("cents", key).cast("long").alias("last_cents"),
    )


# --------------------------------------------------------------------------
# streaming_ewma_state — the EWMA fold as per-key streaming state


@query(
    "streaming_ewma_state",
    None,  # oracle attached below: timeseries_ewma's, verbatim
    doc="per-user EWMA as a REAL stream: readStream -> "
    "applyInPandasWithState -> writeStream under the availableNow "
    "batch-twin protocol. EWMA is the family whose skew/scale answer "
    "is streaming state rather than bucketing — the recurrence has "
    "no prefix decomposition, so the batch variant must collect each "
    "user's series while this carries O(1) state (smoothed value + "
    "count) per key across microbatches in the identical IEEE op "
    "order. Shares timeseries_ewma's oracle verbatim; a two-"
    "microbatch pytest drives the state-carry path availableNow's "
    "single batch never exercises",
)
def streaming_ewma_state(spark, sf_dir):
    import tempfile

    from chiv_spark.streaming.ewma import run_streaming_ewma

    ckpt = tempfile.mkdtemp(prefix="chiv-ewma-ckpt-")
    out = run_streaming_ewma(spark, sf_dir, ckpt)
    return out.select(
        "user_id", "n_events", det_round(F.col("ewma_raw")).alias("ewma_value")
    )


from chiv_spark.queries.base import REGISTRY as _EWMA_REG  # noqa: E402

_EWMA_REG["streaming_ewma_state"] = _EWMA_REG["streaming_ewma_state"].__class__(
    name="streaming_ewma_state",
    fn=_EWMA_REG["streaming_ewma_state"].fn,
    oracle=_EWMA_REG["timeseries_ewma"].oracle,
    doc=_EWMA_REG["streaming_ewma_state"].doc,
)


# --------------------------------------------------------------------------
# streaming_holt_state — the two-variable Holt fold as streaming state


@query(
    "streaming_holt_state",
    None,  # oracle attached below: timeseries_holt_linear's, verbatim
    doc="per-user Holt double exponential smoothing as a REAL "
    "stream: readStream -> applyInPandasWithState -> writeStream "
    "under the availableNow batch-twin protocol. Completes the "
    "non-prefix-decomposable-fold family next to streaming_ewma_"
    "state: the recurrence carries TWO state variables (level + "
    "trend) per key, O(1) across microbatches, in the identical "
    "IEEE op order as the batch F.aggregate struct fold — level "
    "from (l+b) first, trend from the new level second. Shares "
    "timeseries_holt_linear's recursive-CTE oracle verbatim; a "
    "two-microbatch pytest drives the state-carry path",
)
def streaming_holt_state(spark, sf_dir):
    import tempfile

    from chiv_spark.streaming.holt import run_streaming_holt

    ckpt = tempfile.mkdtemp(prefix="chiv-holt-ckpt-")
    out = run_streaming_holt(spark, sf_dir, ckpt)
    return out.select(
        "user_id",
        "n_events",
        det_round(F.col("level_raw")).alias("level"),
        det_round(F.col("trend_raw")).alias("trend"),
        det_round(F.col("level_raw") + F.col("trend_raw")).alias("forecast_1"),
    )


_EWMA_REG["streaming_holt_state"] = _EWMA_REG["streaming_holt_state"].__class__(
    name="streaming_holt_state",
    fn=_EWMA_REG["streaming_holt_state"].fn,
    oracle=_EWMA_REG["timeseries_holt_linear"].oracle,
    doc=_EWMA_REG["streaming_holt_state"].doc,
)
