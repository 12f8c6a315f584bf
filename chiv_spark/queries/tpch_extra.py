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
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_nationkey
    """,
    doc="sorted set aggregation: distinct segments per nation, joined to a "
    "scalar CSV string (gradeable outputs are scalars-only by repo convention; "
    "the underlying collect_set is still exercised before the join)",
)
def agg_collect_set(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias("segments"),
        F.count(F.lit(1)).cast("long").alias("n_customers"),
    )


_PRICE = "decimal(12,2)"
_FRAC = "decimal(4,2)"
_REV_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"


def _rev():
    return F.col("l_extendedprice").cast(_PRICE) * (
        F.lit(1).cast(_FRAC) - F.col("l_discount").cast(_FRAC)
    )


@query(
    "q10_returned_revenue",
    f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: top customers by revenue lost to returns "
    "(fact-fact join + tiny-dim broadcast + top-k, no global sort)",
)
def q10_returned_revenue(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    f"""
    SELECT FLOOR(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_REV_SQL} ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                 / CAST(SUM({_REV_SQL}) AS DOUBLE) * 100.0 * 1000000000.0 + 0.5) / 1000000000.0
           AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    doc="TPC-H Q14: promo revenue share — conditional aggregation over a "
    "fact⋈dim join with a tight pushed date filter",
)
def q14_promo_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    promo = F.when(F.col("p_type").like("PROMO%"), _rev()).otherwise(
        F.lit(0).cast(_PRICE)
    )
    # the engines' decimal->double conversions can differ by 1 ulp on
    # wide-scale sums; det_round at 9dp (far above ulp noise for a
    # 0-100 pct) makes the outputs identical
    from chiv_spark.functions.detmath import det_round

    return joined.agg(
        det_round(
            F.sum(promo).cast("double") / F.sum(_rev()).cast("double") * F.lit(100.0), 9
        ).alias("promo_revenue_pct")
    )


@query(
    "q19_disjunctive_predicates",
    f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: disjunctive multi-attribute predicates across a "
    "fact⋈dim join — Catalyst extracts the common sub-predicates for pushdown",
)
def q19_disjunctive_predicates(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    b = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return j.filter(b).agg(
        F.sum(_rev()).cast("double").alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


@query(
    "agg_weighted_avg",
    f"""
    SELECT l_returnflag,
           FLOOR(CAST(SUM({_REV_SQL} * CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE)
                 / CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
           AS wavg_disc_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="quantity-weighted average discounted price per return flag: exact "
    "decimal sums on both numerator and denominator, one deterministic "
    "double division at the end (order-free at any parallelism)",
)
def agg_weighted_avg(spark, sf_dir):
    from chiv_spark.functions.detmath import det_round

    li = t(spark, sf_dir, "lineitem")
    num = F.sum(_rev() * F.col("l_quantity").cast("decimal(8,2)")).cast("double")
    den = F.sum(F.col("l_quantity").cast("decimal(8,2)")).cast("double")
    # det_round 6dp absorbs the engines' 1-ulp decimal->double gap on
    # wide-scale sums (same pattern as q14)
    return li.groupBy("l_returnflag").agg(det_round(num / den, 6).alias("wavg_disc_price"))
