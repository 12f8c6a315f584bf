"""Advanced relational coverage: as-of join, grouping sets, pivot,
subqueries (IN / scalar), ordered string aggregation, median, moving
windows, date arithmetic. Several run through ``spark.sql`` to
exercise the engine's SQL surface (the reference's custom-query path,
SURVEY.md §2.1-S2) rather than the DataFrame DSL.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chiv_spark.functions.detmath import det_round
from chiv_spark.queries.base import query, t
from chiv_spark.sources.catalog import load_tables


@query(
    "join_asof",
    """
    SELECT p.event_id, p.user_id,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           c.event_id AS click_id,
           CAST(c.ts AS TIMESTAMP) AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    doc="as-of join: attribute each purchase to the user's most recent prior click "
    "(window-based in Spark, native ASOF JOIN in the oracle)",
)
def join_asof(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    # union clicks+purchases, carry the latest click forward per user
    # (last with ignoreNulls over an ordered window — the streaming-
    # friendly as-of shape: one shuffle on user_id, no range join)
    tagged = e.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    enriched = tagged.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(click_id, ignorenulls=True).over(w).alias("click_id"),
        F.last(click_ts, ignorenulls=True).over(w).alias("click_ts"),
    )
    return enriched.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("purchase_ts"),
        "click_id",
        F.col("click_ts").cast("timestamp").alias("click_ts"),
    )


@query(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="GROUPING SETS aggregation via the SQL surface",
)
def agg_grouping_sets(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    ).select("l_returnflag", "l_linestatus", F.col("n").cast("long").alias("n"))


@query(
    "agg_pivot",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS status_f,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS status_o,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS status_p
    FROM orders GROUP BY o_orderpriority
    """,
    doc="pivot: order counts per priority, one column per status",
)
def agg_pivot(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("status_p"),
    )


@query(
    "subquery_in",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    """,
    doc="IN-subquery (decorrelates to a semi join) via the SQL surface",
)
def subquery_in(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        """
    )


@query(
    "subquery_scalar",
    """
    WITH g AS (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS s,
                      COUNT(*) AS n FROM orders)
    SELECT o_orderkey,
           (FLOOR((o_totalprice / (g.s / g.n)) * 1000000.0 + 0.5) / 1000000.0) AS price_vs_avg
    FROM orders, g
    WHERE o_totalprice > 450000
    """,
    doc="scalar subquery: each price as a ratio of the global average (broadcast scalar)",
)
def subquery_scalar(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    g = o.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        o.filter(F.col("o_totalprice") > 450000)
        .crossJoin(F.broadcast(g))
        .select(
            "o_orderkey",
            det_round(F.col("o_totalprice") / (F.col("s") / F.col("n")), 6).alias("price_vs_avg"),
        )
    )


@query(
    "agg_listagg",
    """
    SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="ordered string aggregation (listagg) per group",
)
def agg_listagg(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("s_name"))).alias("suppliers")
        )
    )


@query(
    "agg_median",
    """
    SELECT o_orderpriority,
           (FLOOR(quantile_cont(o_totalprice, 0.5) * 1000000.0 + 0.5) / 1000000.0) AS median_price,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    doc="exact median (interpolated) per group",
)
def agg_median(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        det_round(F.median("o_totalprice"), 6).alias("median_price"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@query(
    "window_moving_avg",
    """
    SELECT event_id, user_id,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                / COUNT(*) OVER w AS DOUBLE) AS moving_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    doc="4-row moving average per user (decimal transit keeps the sliding sum exact)",
)
def window_moving_avg(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        (
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        )
        .cast("double")
        .alias("moving_avg"),
    )


@query(
    "window_first_last",
    """
    SELECT DISTINCT o_custkey AS c_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER w AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="first/last order per customer over an unbounded window",
)
def window_first_last(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        F.col("o_custkey").alias("c_custkey"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    ).distinct()


@query(
    "scalar_date_format",
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS month_str,
           CAST(o_orderdate + INTERVAL 1 DAY AS TIMESTAMP) AS next_day,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1, 2
    """,
    doc="date formatting (engine-dialect format strings producing identical text) + interval arithmetic",
)
def scalar_date_format(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month_str"),
            (F.col("o_orderdate") + F.expr("INTERVAL 1 DAY")).cast("timestamp").alias("next_day"),
        )
        .groupBy("month_str", "next_day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@query(
    "scalar_string_pad",
    """
    SELECT c_custkey,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           rpad(c_mktsegment, 12, '.') AS padded_seg,
           trim(concat('  ', c_name, '  ')) AS trimmed,
           reverse(c_mktsegment) AS seg_rev,
           repeat('-', CAST(c_custkey % 5 AS INT)) AS dashes
    FROM customer WHERE c_custkey <= 200
    """,
    doc="string pad/trim family: lpad/rpad/trim/reverse/repeat",
)
def scalar_string_pad(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.rpad("c_mktsegment", 12, ".").alias("padded_seg"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.repeat(F.lit("-"), (F.col("c_custkey") % 5).cast("int")).alias("dashes"),
    )


@query(
    "scalar_date_arith",
    """
    SELECT l_returnflag,
           CAST(MIN(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS min_delay,
           CAST(MAX(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS max_delay,
           (FLOOR(CAST(SUM(date_diff('day', o_orderdate, l_shipdate)) AS DOUBLE) / COUNT(*) * 1000000.0 + 0.5) / 1000000.0) AS avg_delay
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_returnflag
    """,
    doc="date arithmetic: ship-delay statistics (datediff over a fact join)",
)
def scalar_date_arith(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    cnt = F.count(F.lit(1))
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.min(delay).cast("long").alias("min_delay"),
            F.max(delay).cast("long").alias("max_delay"),
            det_round(F.sum(delay).cast("double") / cnt, 6).alias("avg_delay"),
        )
    )


@query(
    "window_range_interval",
    """
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS value_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    doc="value-range window frame (RANGE INTERVAL 1 HOUR PRECEDING): frame "
    "membership decided by timestamp distance, not row offsets — peers with "
    "equal ts share one frame, so the result is tie-order independent",
)
def window_range_interval(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    # rangeBetween needs a numeric ordering key: order by epoch seconds
    # and phrase the hour as -3600 (micros would overflow neither, but
    # the oracle's INTERVAL arithmetic is second-granular here)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_last_hour"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("value_last_hour"),
    )


@query(
    "agg_mode_deterministic",
    """
    WITH counts AS (
      SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, o_orderpriority),
    ranked AS (
      SELECT c_mktsegment, o_orderpriority, n,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY n DESC, o_orderpriority) AS rk
      FROM counts)
    SELECT c_mktsegment, o_orderpriority AS mode_priority, n AS n_orders
    FROM ranked WHERE rk = 1
    """,
    doc="deterministic mode per group: most frequent order priority per market "
    "segment, ties broken by value (native mode() tie-breaks differ per "
    "engine, so the count+rank formulation IS the cross-engine contract)",
)
def agg_mode_deterministic(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    counts = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("n").desc(), "o_orderpriority")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").cast("long").alias("n_orders"),
        )
    )


@query(
    "join_lateral_topn",
    """
    SELECT c.c_custkey, o.o_orderkey, CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice
                  FROM orders
                  WHERE o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey
                  LIMIT 2) o
    """,
    doc="correlated LATERAL join: top-2 orders per customer via a per-row "
    "subquery (Catalyst decorrelates to a ranked join, no nested loop)",
)
def join_lateral_topn(spark, sf_dir):
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
        FROM customer_lat c
        JOIN LATERAL (SELECT o_orderkey, o_totalprice
                      FROM orders_lat
                      WHERE o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      LIMIT 2) o
        """
    )


@query(
    "transform_unpivot",
    """
    SELECT l_orderkey, l_linenumber, metric, CAST(value AS DOUBLE) AS value
    FROM (SELECT l_orderkey, l_linenumber,
                 CAST(l_extendedprice AS DOUBLE) AS extendedprice,
                 CAST(l_discount AS DOUBLE) AS discount,
                 CAST(l_tax AS DOUBLE) AS tax
          FROM lineitem WHERE l_orderkey < 100)
    UNPIVOT (value FOR metric IN (extendedprice, discount, tax))
    """,
    doc="UNPIVOT/melt: wide measure columns to (metric, value) rows — the "
    "long-format reshape feature tables need before per-metric aggregation",
)
def transform_unpivot(spark, sf_dir):
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").cast("double").alias("extendedprice"),
            F.col("l_discount").cast("double").alias("discount"),
            F.col("l_tax").cast("double").alias("tax"),
        )
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["extendedprice", "discount", "tax"],
        "metric",
        "value",
    )


# --------------------------------------------------------------------------
# join_interval_bucketed — scalable big-big interval overlap join


@query(
    "join_interval_bucketed",
    """
    WITH spans AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             MIN(ts) AS span_start, MAX(ts) AS span_end
      FROM events GROUP BY user_id, CAST(ts AS DATE)),
    hourly AS (
      SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c
      FROM events GROUP BY date_trunc('hour', ts)),
    thr AS (SELECT 1.5 * AVG(c) AS t FROM hourly),
    incidents AS (SELECT h FROM hourly, thr WHERE c > t),
    joined AS (
      SELECT i.h, sp.span_start, sp.span_end
      FROM spans sp JOIN incidents i
        ON sp.span_start < i.h + INTERVAL 1 HOUR AND sp.span_end >= i.h)
    SELECT h AS incident_hour,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(LEAST(CAST(FLOOR(epoch(span_end)) AS BIGINT),
                          CAST(FLOOR(epoch(h)) AS BIGINT) + 3600)
                    - GREATEST(CAST(FLOOR(epoch(span_start)) AS BIGINT),
                               CAST(FLOOR(epoch(h)) AS BIGINT))) AS BIGINT)
           AS overlap_sec
    FROM joined GROUP BY h
    """,
    doc="Interval overlap join, the bin-bucketed scale formulation: "
    "user-day activity spans overlapped against high-traffic incident "
    "hours. The oracle states the textbook range join (start < h+1h "
    "AND end >= h) — on Spark that plan is a nested loop, quadratic "
    "at scale — while the engine EXPLODES each span into the hour "
    "buckets it covers (sequence(trunc(start), trunc(end), 1h)) and "
    "equi-joins on the bucket: for unit-width aligned windows the "
    "bucket match IS the overlap predicate (proof in-code), so the "
    "join is a plain shuffled/broadcast hash join, linear in "
    "span-hours, skew-bounded by the bucket width dial. Plan test "
    "pins no-BNLJ. The threshold scalar is a 1-row broadcast",
)
def join_interval_bucketed(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    spans = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.min("ts").alias("span_start"), F.max("ts").alias("span_end")
    )
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("c")
    )
    thr = hourly.agg((F.avg("c") * 1.5).alias("t"))
    incidents = (
        hourly.join(F.broadcast(thr)).filter(F.col("c") > F.col("t")).select("h")
    )
    # bin each span into the hour buckets it covers. Equivalence with
    # the oracle's range predicate, for bucket h and closed span
    # [s, e] vs window [h, h+1h):
    #   trunc(s) <= h  <=>  s < h + 1h      (both say s starts before
    #                                        the window closes)
    #   trunc(e) >= h  <=>  e >= h          (span ends inside/after)
    # so membership in the exploded bucket list is exactly overlap —
    # no residual filter, no dedup (one row per covered bucket).
    binned = spans.select(
        "span_start",
        "span_end",
        F.explode(
            F.expr(
                "sequence(date_trunc('hour', span_start),"
                " date_trunc('hour', span_end), interval 1 hour)"
            )
        ).alias("h"),
    )
    ov = F.least(
        F.unix_timestamp("span_end"), F.unix_timestamp("h") + 3600
    ) - F.greatest(F.unix_timestamp("span_start"), F.unix_timestamp("h"))
    return (
        binned.join(incidents, "h")
        .groupBy(F.col("h").alias("incident_hour"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum(ov).cast("long").alias("overlap_sec"),
        )
    )


# --------------------------------------------------------------------------
# join_asof_forward — the time-to-convert direction, with tolerance


@query(
    "join_asof_forward",
    """
    WITH hit AS (
      SELECT c.event_id, c.user_id,
             CAST(c.ts AS TIMESTAMP) AS click_ts,
             p.event_id AS purchase_id,
             CAST(p.ts AS TIMESTAMP) AS purchase_ts
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id AND c.ts <= p.ts)
    SELECT event_id, user_id, click_ts,
           CASE WHEN purchase_ts <= click_ts + INTERVAL 1 HOUR
                THEN purchase_id END AS purchase_id,
           CASE WHEN purchase_ts <= click_ts + INTERVAL 1 HOUR
                THEN purchase_ts END AS purchase_ts,
           CASE WHEN purchase_ts <= click_ts + INTERVAL 1 HOUR
                THEN CAST(FLOOR(epoch(purchase_ts)) AS BIGINT)
                     - CAST(FLOOR(epoch(click_ts)) AS BIGINT) END
             AS secs_to_convert
    FROM hit
    """,
    doc="FORWARD as-of join with tolerance (time-to-convert: each "
    "click matched to the user's NEXT purchase within 1 hour, NULLs "
    "past the window). Same streaming-friendly shape as join_asof "
    "but mirrored: one user-keyed shuffle, a DESC-ordered running "
    "last-non-null carries the nearest following purchase — no range "
    "join. The oracle is DuckDB's native forward ASOF (c.ts <= "
    "p.ts picks the smallest qualifying p.ts). Tie safety: "
    "(user_id, ts) is a unique key (data-contract test), so the "
    "window's event_id tiebreak can never disagree with ASOF "
    "semantics",
)
def join_asof_forward(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    tagged = e.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_id", "user_id", "ts", "event_type"
    )
    # DESC ordering makes "last non-null so far" = "nearest following"
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p_id = F.when(F.col("event_type") == "purchase", F.col("event_id"))
    p_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    enriched = tagged.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(p_id, ignorenulls=True).over(w).alias("purchase_id"),
        F.last(p_ts, ignorenulls=True).over(w).alias("purchase_ts"),
    )
    within = F.col("purchase_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")
    return enriched.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("click_ts"),
        F.when(within, F.col("purchase_id")).alias("purchase_id"),
        F.when(within, F.col("purchase_ts").cast("timestamp")).alias("purchase_ts"),
        F.when(
            within,
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("ts"),
        ).alias("secs_to_convert"),
    )


# --------------------------------------------------------------------------
# join_asof_nearest — closest match in either direction


@query(
    "join_asof_nearest",
    """
    WITH tagged AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type IN ('purchase', 'click')),
    marked AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
               OVER wb AS b_id,
             last_value(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END IGNORE NULLS)
               OVER wb AS b_us,
             first_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
               OVER wf AS f_id,
             first_value(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END IGNORE NULLS)
               OVER wf AS f_us
      FROM tagged
      WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS click_ts,
           CASE WHEN b_us IS NULL THEN f_id
                WHEN f_us IS NULL THEN b_id
                WHEN epoch_us(ts) - b_us <= f_us - epoch_us(ts) THEN b_id
                ELSE f_id END AS purchase_id,
           CASE WHEN b_us IS NULL THEN f_us - epoch_us(ts)
                WHEN f_us IS NULL THEN epoch_us(ts) - b_us
                WHEN epoch_us(ts) - b_us <= f_us - epoch_us(ts)
                THEN epoch_us(ts) - b_us
                ELSE f_us - epoch_us(ts) END AS abs_gap_us
    FROM marked WHERE event_type = 'click'
    """,
    doc="NEAREST as-of join — the third direction completing the "
    "family (backward join_asof, forward join_asof_forward): each "
    "click matched to its closest purchase in EITHER direction by "
    "absolute event-time gap, ties to the earlier (backward) "
    "purchase. One window pass computes both candidates — a running "
    "last over the preceding frame and a running first over the "
    "following frame share ONE user-keyed sort/exchange — then the "
    "pick is exact integer micro arithmetic. No range join, no "
    "second shuffle; NULL-side clicks fall back to the surviving "
    "direction",
)
def join_asof_nearest(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    tagged = e.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_id", "user_id", "ts", "event_type"
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    p_id = F.when(F.col("event_type") == "purchase", F.col("event_id"))
    p_us = F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
    m = tagged.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.last(p_id, ignorenulls=True).over(wb).alias("b_id"),
        F.last(p_us, ignorenulls=True).over(wb).alias("b_us"),
        F.first(p_id, ignorenulls=True).over(wf).alias("f_id"),
        F.first(p_us, ignorenulls=True).over(wf).alias("f_us"),
    )
    back_gap = F.col("us") - F.col("b_us")
    fwd_gap = F.col("f_us") - F.col("us")
    pick_back = F.when(F.col("b_us").isNull(), F.lit(False)).otherwise(
        F.col("f_us").isNull() | (back_gap <= fwd_gap)
    )
    return m.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("click_ts"),
        F.when(pick_back, F.col("b_id")).otherwise(F.col("f_id")).alias("purchase_id"),
        F.when(pick_back, back_gap).otherwise(fwd_gap).alias("abs_gap_us"),
    )


# --------------------------------------------------------------------------
# window_percentile_position — percent_rank + cume_dist (r7: the two
# distribution-position functions completing the §2.5 window family)


@query(
    "window_percentile_position",
    """
    WITH pos AS (
      SELECT event_type,
             CAST(ROUND(value * 1000000.0) AS BIGINT) AS xm,
             percent_rank() OVER (PARTITION BY event_type ORDER BY value) AS pr,
             cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd
      FROM events WHERE value IS NOT NULL)
    SELECT event_type, xm AS value_micro,
           CAST(COUNT(*) AS BIGINT) AS n_ties,
           (FLOOR(MIN(pr) * 1000000.0 + 0.5) / 1000000.0) AS percent_rank,
           (FLOOR(MAX(cd) * 1000000.0 + 0.5) / 1000000.0) AS cume_dist
    FROM pos GROUP BY event_type, xm
    """,
    doc="distribution position per distinct value: percent_rank "
    "((rank-1)/(n-1), tie rows share the MIN) and cume_dist "
    "(peers-inclusive running share, tie rows share the MAX) per "
    "event type, grouped to one row per distinct value so the "
    "output is distribution-sized. Both are single integer-ratio "
    "divisions — engine-identical; the value-ordered window "
    "partitions by event_type (the KS-test/value-distribution "
    "family's shape: at extreme scale the swap is ranking over "
    "grouped value counts, no per-row sort)",
)
def window_percentile_position(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    pos = e.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value").cast("double") * 1_000_000.0).cast("long").alias("xm"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return pos.groupBy("event_type", F.col("xm").alias("value_micro")).agg(
        F.count(F.lit(1)).cast("long").alias("n_ties"),
        det_round(F.min("pr")).alias("percent_rank"),
        det_round(F.max("cd")).alias("cume_dist"),
    )
