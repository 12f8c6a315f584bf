"""TPC-H-flavored analytical queries — the relational core the
reference delegates to its backing RDBMS (SURVEY.md §2.3-2.4), run
natively on Catalyst.

Plan notes (the 100 TB story):
- dims (region/nation/customer/supplier) broadcast — verified via
  .explain in tests; no shuffle on the fact side for dim joins.
- plain money sums use integer cents (money_sum — exact, order-free,
  ~2× faster than decimal); column *products* (disc_price/charge)
  stay in DECIMAL because their cent-scale sums would overflow bigint
  at 100 TB row counts (see functions.detmath for the bound).
- aggregations are partial+final hash aggregates (map-side combine)
  by construction of groupBy().agg().
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chiv_spark.functions.detmath import det_round, money_sum
from chiv_spark.queries.base import query, t

# lossless fixed-point casts for the 2-decimal money columns
_PRICE = "decimal(12,2)"  # l_extendedprice <= ~110k
_FRAC = "decimal(4,2)"  # discount/tax in [0, 0.10]


def _disc_price() -> F.Column:
    return F.col("l_extendedprice").cast(_PRICE) * (
        F.lit(1).cast(_FRAC) - F.col("l_discount").cast(_FRAC)
    )


def _charge() -> F.Column:
    return _disc_price() * (F.lit(1).cast(_FRAC) + F.col("l_tax").cast(_FRAC))


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           (CAST(SUM(CAST(ROUND((l_quantity) * 100) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_qty,
           (CAST(SUM(CAST(ROUND((l_extendedprice) * 100) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           (FLOOR((CAST(SUM(CAST(ROUND((l_quantity) * 100) AS BIGINT)) AS DOUBLE) / 100.0) / COUNT(*) * 1000000.0 + 0.5) / 1000000.0) AS avg_qty,
           (FLOOR((CAST(SUM(CAST(ROUND((l_extendedprice) * 100) AS BIGINT)) AS DOUBLE) / 100.0) / COUNT(*) * 1000000.0 + 0.5) / 1000000.0) AS avg_price,
           (FLOOR((CAST(SUM(CAST(ROUND((l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0) / COUNT(*) * 1000000.0 + 0.5) / 1000000.0) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1: pricing summary report (grouped aggregation with derived measures)",
)
def q1_pricing_summary(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp")
    )
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        money_sum("l_quantity").alias("sum_qty"),
        money_sum("l_extendedprice").alias("sum_base_price"),
        F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
        F.sum(_charge()).cast("double").alias("sum_charge"),
        det_round(money_sum("l_quantity") / cnt, 6).alias("avg_qty"),
        det_round(money_sum("l_extendedprice") / cnt, 6).alias("avg_price"),
        det_round(money_sum("l_discount") / cnt, 6).alias("avg_disc"),
        cnt.cast("long").alias("count_order"),
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3: top-k revenue (3-way join + agg + TakeOrderedAndProject)",
)
def q3_shipping_priority(spark, sf_dir):
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        # No broadcast hint on customer: at 100 TB it is tens of GB and a
        # forced hint would override AQE's size threshold; AQE broadcasts it
        # when (and only when) the filtered side is actually small.
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_revenue_by_nation",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    doc="TPC-H Q5-style: revenue per nation (5-way star join; tiny dims hint-broadcast, customer left to AQE)",
)
def q5_revenue_by_nation(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dims, orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@query(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: selective filter + scalar aggregate (predicate pushdown showcase)",
)
def q6_forecast_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.sum(F.col("l_extendedprice").cast(_PRICE) * F.col("l_discount").cast(_FRAC))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )
