"""Additional TPC-H-shaped operator patterns: conditional semi join
(Q4), distribution-of-counts (Q13), grouped distinct counts (Q16
shape), ranking-statistics windows, and sorted set aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chiv_spark.queries.base import query, t


@query(
    "q4_late_orders",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND date_diff('day', o_orderdate, l_shipdate) > 90)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: conditional (equi + non-equi) semi join — orders with any lineitem shipped >90 days after ordering",
)
def q4_late_orders(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        F.datediff(li.l_shipdate, o.o_orderdate) > 90
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )


@query(
    "q13_order_count_distribution",
    """
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
    SELECT CAST(c_count AS BIGINT) AS c_count, COUNT(*) AS n_customers
    FROM per_cust GROUP BY c_count
    """,
    doc="TPC-H Q13: distribution of per-customer order counts (count-of-counts, two-level aggregation)",
)
def q13_order_count_distribution(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy(F.col("c_count").cast("long").alias("c_count")).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )


@query(
    "agg_grouped_countdistinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="grouped multi-column COUNT DISTINCT (expand-based distinct aggregation)",
)
def agg_grouped_countdistinct(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("long").alias("n_parts"),
        F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


@query(
    "window_rank_stats",
    """
    SELECT o_orderkey, o_custkey,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
           (FLOOR(PERCENT_RANK() OVER w * 1000000.0 + 0.5) / 1000000.0) AS pct_rank,
           (FLOOR(CUME_DIST() OVER w * 1000000.0 + 0.5) / 1000000.0) AS cume,
           LEAD(o_orderkey) OVER w AS next_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="ranking-statistics windows: ntile / percent_rank / cume_dist / lead",
)
def window_rank_stats(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    from chiv_spark.functions.detmath import det_round

    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        det_round(F.percent_rank().over(w), 6).alias("pct_rank"),
        det_round(F.cume_dist().over(w), 6).alias("cume"),
        F.lead("o_orderkey").over(w).alias("next_order"),
    )


@query(
    "agg_collect_set",
    """
    SELECT c_nationkey AS nationkey,
           list_sort(list(DISTINCT c_mktsegment)) AS segments,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_nationkey
    """,
    doc="sorted set aggregation: distinct segments per nation as an array column",
)
def agg_collect_set(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.sort_array(F.collect_set("c_mktsegment")).alias("segments"),
        F.count(F.lit(1)).cast("long").alias("n_customers"),
    )
