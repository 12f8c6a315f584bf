"""Relational operator coverage: joins (all flavors), aggregation
variants (distinct/rollup/cube), window functions, sorts/top-k, set
operations, scalar function families (SURVEY.md §2.3-2.8).

Each query is a thin, named composition of Catalyst built-ins with an
exact DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chiv_spark.functions.detmath import det_round, duckdb_det_round, money_sum
from chiv_spark.queries.base import query, t

# ---------------------------------------------------------------- joins


@query(
    "join_inner_agg",
    """
    SELECT c_custkey, c_name, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_spent
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    doc="inner equi-join + per-key aggregation (the reference's join test shape, chiv_integration_test.go:353-388)",
)
def join_inner_agg(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        # customer is NOT hint-broadcast: forced hints override AQE's size
        # check and OOM at 100 TB; AQE picks broadcast when c is small enough.
        o.join(c, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("total_spent"),
        )
    )


@query(
    "join_left_outer",
    """
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    doc="left outer join preserving order-less customers (count=0)",
)
def join_left_outer(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("n_orders"))
    )


@query(
    "join_right_outer",
    """
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM orders RIGHT JOIN customer ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    doc="right outer join preserving order-less customers (count=0) — "
    "mirror of join_left_outer with the build/probe sides swapped",
)
def join_right_outer(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        o.join(c, c.c_custkey == o.o_custkey, "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("n_orders"))
    )


@query(
    "join_semi",
    """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="left semi join: customers having at least one order",
)
def join_semi(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_mktsegment")


@query(
    "join_anti",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="left anti join: customers with no orders",
)
def join_anti(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross",
    """
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    doc="cross join of two broadcast-size dims (125 rows)",
)
def join_cross(spark, sf_dir):
    r = t(spark, sf_dir, "region").select("r_name")
    n = t(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@query(
    "join_range_theta",
    """
    SELECT o_orderkey, o_totalprice, b.tier
    FROM orders o
    JOIN (SELECT 'low' AS tier, 0.0 AS lo, 150000.0 AS hi
          UNION ALL SELECT 'mid', 150000.0, 300000.0
          UNION ALL SELECT 'high', 300000.0, 1e18) b
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    """,
    doc="non-equi (range/theta) join against a broadcast tier table",
)
def join_range_theta(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    tiers = o.sparkSession.createDataFrame(
        [("low", 0.0, 150000.0), ("mid", 150000.0, 300000.0), ("high", 300000.0, 1e18)],
        "tier string, lo double, hi double",
    )
    return o.join(
        F.broadcast(tiers),
        (o.o_totalprice >= tiers.lo) & (o.o_totalprice < tiers.hi),
    ).select("o_orderkey", "o_totalprice", "tier")


# ------------------------------------------------------- aggregations


@query(
    "agg_global_stats",
    """
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_partkey) AS n_parts,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           (CAST(SUM(CAST(ROUND((l_quantity) * 100) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_qty,
           (FLOOR((CAST(SUM(CAST(ROUND((l_extendedprice) * 100) AS BIGINT)) AS DOUBLE) / 100.0) / COUNT(*) * 1000000.0 + 0.5) / 1000000.0) AS avg_price
    FROM lineitem
    """,
    doc="global aggregate: count / distinct / min / max / sum / avg",
)
def agg_global_stats(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    return li.agg(
        cnt.cast("long").alias("n_rows"),
        F.countDistinct("l_partkey").cast("long").alias("n_parts"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
        money_sum("l_quantity").alias("sum_qty"),
        det_round(money_sum("l_extendedprice") / cnt, 6).alias("avg_price"),
    )


@query(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           (CAST(SUM(CAST(ROUND((l_quantity) * 100) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy totals (grand total + per-flag subtotals)",
)
def agg_rollup(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        money_sum("l_quantity").alias("sum_qty"),
    )


@query(
    "agg_cube",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over two dimensions (all grouping-set combinations)",
)
def agg_cube(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


@query(
    "agg_having",
    """
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    HAVING COUNT(*) > 5
    """,
    doc="grouped aggregate with HAVING filter",
)
def agg_having(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .filter(F.col("n_customers") > 5)
    )


@query(
    "agg_approx_distinct",
    # DuckDB cannot replay Spark's HLL++ internals, but it CAN assert
    # the accuracy contract held: exact distinct hash-compared + a
    # realized-error-within-bound flag the oracle asserts TRUE (the
    # agg_quantile_approx / events_active_users_mau_approx gating
    # pattern — r7 verdict task 4 closes the last rows-only row)
    """
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS err_ok
    FROM lineitem
    """,
    doc="approximate distinct count via HyperLogLog++ (rsd=0.02) — "
    "the sketch path exact COUNT(DISTINCT) cannot take at 100 TB, "
    "where the HLL register set is a few KB of map-side-mergeable "
    "state vs a full shuffle of the distinct keys. Gated, not "
    "hash-matched: the emitted row carries the EXACT distinct count "
    "(engine-comparable) plus err_ok asserting the realized relative "
    "error stayed within 5 standard deviations of the configured "
    "rsd (|approx-exact|*100 <= 10*exact, integer arithmetic — no "
    "float summation ambiguity), which the oracle asserts TRUE",
)
def agg_approx_distinct(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    both = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02)
        .cast("long")
        .alias("approx_parts"),
        F.countDistinct("l_partkey").cast("long").alias("exact_parts"),
    )
    err_ok = (
        F.abs(F.col("approx_parts") - F.col("exact_parts")) * 100
        <= 10 * F.col("exact_parts")
    )
    return both.select("exact_parts", err_ok.alias("err_ok"))


# ------------------------------------------------------------ windows


@query(
    "window_rank_topn",
    """
    SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
    doc="row_number window: top-3 orders per customer",
)
def window_rank_topn(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.col("rn").cast("int").alias("rn"),
        )
    )


@query(
    "window_lag_delta",
    """
    SELECT event_id, user_id, value,
           CAST(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS delta
    FROM events
    """,
    doc="lag window: per-user event value delta over time",
)
def window_lag_delta(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).cast("double").alias("delta"),
    )


@query(
    "window_running_sum",
    """
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM orders
    """,
    doc="running total per customer (decimal transit keeps it exact)",
)
def window_running_sum(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double").alias("running_total"),
    )


# -------------------------------------------------------- sorts / topk


@query(
    "sort_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    doc="global top-k (Catalyst TakeOrderedAndProject — no full sort)",
)
def sort_topk(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@query(
    "distinct_values",
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    doc="DISTINCT projection",
)
def distinct_values(spark, sf_dir):
    return t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ------------------------------------------------------------- set ops


@query(
    "set_union",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    doc="UNION (distinct) of customer and supplier nation keys",
)
def set_union(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    doc="INTERSECT of customer and supplier nation keys",
)
def set_intersect(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
    doc="EXCEPT: nations with customers but no suppliers",
)
def set_except(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    # subtract == SQL EXCEPT (distinct, removes all matches) — unlike exceptAll
    return c.subtract(s)


@query(
    "set_union_by_name",
    """
    SELECT * FROM (
      SELECT o_orderkey, o_totalprice, NULL::VARCHAR AS o_orderpriority
      FROM orders WHERE o_orderkey <= 400
      UNION ALL BY NAME
      SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey > 5600)
    """,
    doc="union by name with missing columns (null-filled schema alignment)",
)
def set_union_by_name(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") <= 400).select(
        "o_orderkey", "o_totalprice", F.lit(None).cast("string").alias("o_orderpriority")
    )
    b = o.filter(F.col("o_orderkey") > 5600).select("o_orderkey", "o_orderpriority")
    return a.unionByName(b, allowMissingColumns=True)


@query(
    "scalar_hash_funcs",
    """
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256,
           CAST(length(md5(c_name)) AS INT) AS md5_len
    FROM customer WHERE c_custkey <= 200
    """,
    doc="cryptographic hash family: md5 / sha256 over strings",
)
def scalar_hash_funcs(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
        F.length(F.md5("c_name")).cast("int").alias("md5_len"),
    )


# ------------------------------------------------------ scalar functions


@query(
    "scalar_string_funcs",
    """
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           CAST(LENGTH(c_name) AS BIGINT) AS name_len,
           CONCAT(c_mktsegment, ':', c_name) AS tagged,
           REPLACE(c_name, 'Customer', 'Cust') AS shortened
    FROM customer WHERE c_custkey <= 500
    """,
    doc="string function family: upper/substr/length/concat/replace",
)
def scalar_string_funcs(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat_ws("", F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("tagged"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("shortened"),
    )


@query(
    "scalar_date_funcs",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
           COUNT(*) AS n_orders,
           CAST(MIN(EXTRACT(day FROM o_orderdate)) AS BIGINT) AS first_day
    FROM orders
    GROUP BY 1, 2
    """,
    doc="date function family: date_trunc/extract + monthly grouping",
)
def scalar_date_funcs(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.select(
            F.date_trunc("month", "o_orderdate").cast("timestamp").alias("order_month"),
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        )
        .groupBy("order_month", "order_year")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.min("dom").cast("long").alias("first_day"),
        )
    )


@query(
    "scalar_math_funcs",
    """
    SELECT p_partkey,
           CAST(ABS(p_retailprice - 500) AS DOUBLE) AS abs_diff,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
           CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
           (FLOOR(SQRT(p_retailprice) * 1000000.0 + 0.5) / 1000000.0) AS price_sqrt,
           CAST(p_size % 7 AS BIGINT) AS size_mod
    FROM part
    """,
    doc="math function family: abs/floor/ceil/sqrt/mod",
)
def scalar_math_funcs(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 500).cast("double").alias("abs_diff"),
        F.floor("p_retailprice").cast("long").alias("price_floor"),
        F.ceil("p_retailprice").cast("long").alias("price_ceil"),
        det_round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        (F.col("p_size") % 7).cast("long").alias("size_mod"),
    )


@query(
    "scalar_json_funcs",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="JSON extraction from string props column + aggregation",
)
def scalar_json_funcs(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(k).cast("long").alias("sum_k"),
        F.max(k).cast("long").alias("max_k"),
    )


@query(
    "scalar_case_when",
    """
    SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 300000 THEN 'medium'
                ELSE 'large' END AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM orders GROUP BY 1
    """,
    doc="CASE WHEN bucketing + aggregation",
)
def scalar_case_when(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("total"),
    )


@query(
    "join_salted_skew",
    """
    SELECT o_custkey, COUNT(*) AS n_items,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_custkey
    """,
    doc="salted hot-key join: the big side scatters each key across 8 salt "
    "buckets, the small side replicates 8x — shuffle distribution changes, "
    "results are provably identical to the plain join (this oracle IS the "
    "plain join)",
)
def join_salted_skew(spark, sf_dir):
    from chiv_spark.operators.skew import salted_join

    li = t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("o_orderkey"))
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    return (
        salted_join(li, o, "o_orderkey")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("total"),
        )
    )


@query(
    "scalar_map_funcs",
    """
    WITH per AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY user_id, event_type)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           string_agg(event_type, ',' ORDER BY event_type) AS types,
           CAST(COALESCE(MAX(CASE WHEN event_type = 'click' THEN c END), 0) AS BIGINT) AS n_clicks
    FROM per GROUP BY user_id
    """,
    doc="map-function family (SURVEY 2.8): per-user event-type counts "
    "built as a real MapType via map_from_entries, then read back with "
    "size/map_keys/element_at (gradeable outputs are scalars-only by "
    "repo convention — the map itself is the intermediate)",
)
def scalar_map_funcs(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    per = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    entries = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "c")))
        ).alias("m")
    )
    return entries.select(
        "user_id",
        F.size("m").cast("long").alias("n_types"),
        F.array_join(F.sort_array(F.map_keys("m")), ",").alias("types"),
        F.coalesce(F.element_at("m", F.lit("click")), F.lit(0)).cast("long").alias("n_clicks"),
    )


@query(
    "scalar_variant_funcs",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(COUNT(*) FILTER (WHERE value > 50) AS BIGINT) AS n_hot,
           CAST(COUNT(*) AS BIGINT) AS n_missing_path
    FROM events
    GROUP BY event_type
    """,
    doc="Spark-4 VARIANT path for semi-structured data: build a nested "
    "doc, parse_json ONCE into the binary VARIANT encoding, then do "
    "multiple typed extractions (variant_get '$.meta.k' long / "
    "'$.meta.hot' boolean, try_variant_get on a missing path -> NULL "
    "instead of error). At scale this is the point of VARIANT: one "
    "parse amortizes N field accesses, where get_json_object re-parses "
    "the text per call. Oracle states the same semantics in plain SQL "
    "(the mechanism under test is the VARIANT encoding, as with the "
    "oriented-vs-naive triangle oracle pair)",
)
def scalar_variant_funcs(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    nested = F.to_json(
        F.struct(
            F.col("event_type").alias("et"),
            F.struct(
                F.get_json_object("props", "$.k").cast("long").alias("k"),
                (F.col("value") > 50).alias("hot"),
            ).alias("meta"),
        )
    )
    v = F.parse_json(nested)
    k = F.variant_get(v, "$.meta.k", "long")
    hot = F.variant_get(v, "$.meta.hot", "boolean")
    missing = F.try_variant_get(v, "$.meta.absent", "long")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(k).cast("long").alias("sum_k"),
        F.count_if(hot).cast("long").alias("n_hot"),
        F.count_if(missing.isNull()).cast("long").alias("n_missing_path"),
    )


@query(
    "agg_correlation",
    f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           {duckdb_det_round("corr(CAST(l_quantity AS DOUBLE), CAST(l_extendedprice AS DOUBLE))")}
             AS corr_qty_price,
           {duckdb_det_round("covar_samp(CAST(l_quantity AS DOUBLE), CAST(l_extendedprice AS DOUBLE))", 2)}
             AS covar_qty_price,
           {duckdb_det_round("regr_slope(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE))", 4)}
             AS price_per_qty_slope
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="bivariate statistics family: Pearson correlation, sample "
    "covariance, and regression slope per group — single-pass "
    "numerically-stable co-moment aggregates (Welford-style) in both "
    "engines; one groups-sized exchange",
)
def agg_correlation(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("double")
    p = F.col("l_extendedprice").cast("double")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        det_round(F.corr(q, p)).alias("corr_qty_price"),
        det_round(F.covar_samp(q, p), 2).alias("covar_qty_price"),
        det_round(F.regr_slope(p, q), 4).alias("price_per_qty_slope"),
    )


@query(
    "join_null_safe_eq",
    """
    WITH l AS (
      SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status_key
      FROM orders WHERE o_orderkey % 7 = 0),
    r AS (
      SELECT NULLIF(o_orderstatus, 'O') AS status_key,
             COUNT(*) AS n_side
      FROM orders WHERE o_orderkey % 11 = 0
      GROUP BY NULLIF(o_orderstatus, 'O'))
    SELECT l.status_key, CAST(COUNT(*) AS BIGINT) AS n_left,
           CAST(MAX(r.n_side) AS BIGINT) AS n_right
    FROM l JOIN r ON l.status_key IS NOT DISTINCT FROM r.status_key
    GROUP BY l.status_key
    """,
    doc="null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL "
    "keys MATCH each other instead of dropping out — the semantics "
    "that separate it from a plain equi join. Catalyst plans "
    "eqNullSafe as a hash-join key (Coalesce+isnull wrapping), so it "
    "shuffles like any equi join; the NULL bucket is a single hot key "
    "at scale — the salting playbook (operators/skew.py) applies when "
    "the null fraction is large",
)
def join_null_safe_eq(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    key = F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_key")
    left = o.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey", key)
    right = (
        o.filter(F.col("o_orderkey") % 11 == 0)
        .select(key)
        .groupBy("status_key")
        .agg(F.count(F.lit(1)).alias("n_side"))
        .withColumnRenamed("status_key", "r_key")
    )
    return (
        left.join(right, left.status_key.eqNullSafe(right.r_key))
        .groupBy("status_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_left"),
            F.max("n_side").cast("long").alias("n_right"),
        )
    )


@query(
    "agg_boolean_funcs",
    """
    SELECT event_type,
           CAST(bool_and(value > 0) AS BOOLEAN) AS all_positive,
           CAST(bool_or(value > 95) AS BOOLEAN) AS any_above_95,
           CAST(COUNT(*) FILTER (WHERE value > 50) AS BIGINT) AS n_above_50,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="boolean aggregate family: every/bool_and, any/bool_or, and "
    "count_if — short-circuitable predicates with map-side partials, "
    "one groups-sized exchange",
)
def agg_boolean_funcs(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.every(F.col("value") > 0).alias("all_positive"),
        F.some(F.col("value") > 95).alias("any_above_95"),
        F.count_if(F.col("value") > 50).cast("long").alias("n_above_50"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
