"""TPC-H Q7/Q8/Q9/Q12/Q15/Q16/Q17/Q18/Q22-shaped queries — the
remaining benchmark patterns expressible on the reduced testdata
schema (no partsupp, no commit/receipt dates, no c_phone;
Q2/Q11/Q20/Q21 need those columns and are structurally out of reach).
Q9 drops the ps_supplycost term, Q22 replaces the phone-prefix
country code with c_nationkey, Q12 substitutes l_linestatus for the
missing l_shipmode and an order-to-ship lateness window for the
missing commit/receipt dates, and Q16 derives the part-supplier
relation from DISTINCT lineitem pairs in place of partsupp — all
noted per-query.

Plan notes (the 100 TB story):
- nation/region broadcast everywhere (25 / 5 rows at any SF).
- scalar thresholds (Q15 max, Q22 avg) are single-row aggregates
  joined back by broadcast — never a driver-side collect.
- Q17's correlated per-part average filters lineitem down to the
  brand's partkeys BEFORE the per-part aggregate, so the shuffle is
  brand-sized, not table-sized (part-side joins are unhinted — AQE
  broadcasts them only when the filtered side actually fits).
- Q18's HAVING subquery is a bucket-key semi join on l_orderkey.
- float determinism: exact DECIMAL / integer-cent sums, one IEEE
  division at the end, det_round where engines' decimal→double
  conversions can differ by an ulp (see functions/detmath.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chiv_spark.functions.detmath import (
    det_round,
    duckdb_money_sum,
    money_sum,
)
from chiv_spark.queries.base import query, t

_PRICE = "decimal(12,2)"
_FRAC = "decimal(4,2)"
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


def _rev() -> F.Column:
    return F.col("l_extendedprice").cast(_PRICE) * (
        F.lit(1).cast(_FRAC) - F.col("l_discount").cast(_FRAC)
    )


@query(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             {_REV_SQL} AS volume
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
          OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00')
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7: bilateral shipping volume between two nations by year "
    "(6-way join; both nation sides broadcast, disjunctive pair predicate)",
)
def q7_volume_shipping(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_10")
    ) | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_12"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    f"""
    SELECT o_year,
           (FLOOR(CAST(SUM(CASE WHEN supp_nation = 'NATION_12' THEN volume
                                ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                  / CAST(SUM(volume) AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0)
           AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             {_REV_SQL} AS volume,
             n2.n_name AS supp_nation
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY')
    GROUP BY o_year
    """,
    doc="TPC-H Q8: one nation's market share of ECONOMY-part volume sold "
    "into ASIA, by order year (8-way join, conditional share aggregate; "
    "det_round 9dp absorbs the engines' 1-ulp decimal->double gap)",
)
def q8_market_share(spark, sf_dir):
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_12", _rev()).otherwise(
            F.lit(0).cast(_PRICE)
        )
    ).cast("double")
    den = F.sum(_rev()).cast("double")
    return (
        # no hint on part: type-filtered part is still huge at 100 TB, and a
        # forced broadcast would override AQE's size check (same rule as q3's
        # customer side); AQE broadcasts it only when actually small
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(det_round(num / den, 9).alias("mkt_share"))
    )


@query(
    "q9_profit_by_nation_year",
    f"""
    SELECT nation, o_year, CAST(SUM(volume) AS DOUBLE) AS profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             {_REV_SQL} AS volume
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN part     ON p_partkey = l_partkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%')
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 (adapted: no partsupp table, so profit omits the "
    "ps_supplycost*l_quantity term): product-line profit by supplier "
    "nation and order year; part filtered+broadcast, nation broadcast",
)
def q9_profit_by_nation_year(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    return (
        # part unhinted for the same 100 TB reason as q8; nation stays hinted
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("profit"))
    )


@query(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_REV_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
    doc="TPC-H Q15: supplier(s) with maximum quarterly revenue — scalar "
    "max computed distributed and joined back by broadcast (single-row "
    "build side), equality on exact DECIMAL so ties are bit-safe",
)
def q15_top_supplier(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    s = t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_rev")
    )
    mx = revenue.agg(F.max("total_rev").alias("mx"))
    return (
        revenue.join(F.broadcast(mx), revenue.total_rev == mx.mx)
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


@query(
    "q17_small_quantity_revenue",
    f"""
    WITH pp AS (
      SELECT l_partkey,
             ({duckdb_money_sum('l_quantity')} / COUNT(*)) AS avg_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#11'
      GROUP BY l_partkey)
    SELECT CAST(({duckdb_money_sum('l_extendedprice')} / 7.0) AS DOUBLE) AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem JOIN pp ON lineitem.l_partkey = pp.l_partkey
    WHERE l_quantity < 0.2 * avg_qty
    """,
    doc="TPC-H Q17: revenue from small-quantity orders vs the part's own "
    "average (correlated per-part aggregate). Lineitem is reduced to the "
    "brand's partkeys BEFORE the per-part aggregate, "
    "so the shuffle is brand-sized; threshold uses the integer-cent "
    "average so the < comparison is bit-deterministic across engines",
)
def q17_small_quantity_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    pk = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#11")
        .select("p_partkey")
    )
    # unhinted: a brand's partkey set is ~1/25 of part — still too big to
    # force-broadcast at 100 TB; AQE picks broadcast when it fits
    brand_li = li.join(pk, li.l_partkey == pk.p_partkey)
    per_part = brand_li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        (money_sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        brand_li.join(per_part, brand_li.l_partkey == per_part.pp_key)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (money_sum("l_extendedprice") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


@query(
    "q18_large_volume_customers",
    f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {duckdb_money_sum('l_quantity')} AS total_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING {duckdb_money_sum('l_quantity')} > 300.0)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    doc="TPC-H Q18: customers with orders above 300 total quantity — the "
    "HAVING subquery becomes a semi join on the orderkey bucket key; "
    "quantity sums via exact integer cents",
)
def q18_large_volume_customers(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("big_key"))
        .agg(money_sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300.0)
        .select("big_key")
    )
    return (
        li.join(big, li.l_orderkey == big.big_key, "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(money_sum("l_quantity").alias("total_qty"))
    )


@query(
    "q22_dormant_customers",
    f"""
    WITH pos_avg AS (
      SELECT ({duckdb_money_sum('c_acctbal')} / COUNT(*)) AS threshold
      FROM customer WHERE c_acctbal > 0.0)
    SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
           COUNT(*) AS numcust,
           {duckdb_money_sum('c_acctbal')} AS totacctbal
    FROM customer, pos_avg
    WHERE c_acctbal > threshold
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 (adapted: the schema has no c_phone, so the country "
    "code is c_nationkey, and 'never ordered' becomes 'no orders since "
    "2000' to keep the anti-join non-empty on this data): well-funded "
    "customers gone dormant. Scalar threshold is a 1-row broadcast; the "
    "NOT EXISTS is a left-anti join on a date-filtered orders side",
)
def q22_dormant_customers(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    thr = c.filter(F.col("c_acctbal") > 0.0).agg(
        (money_sum("c_acctbal") / F.count(F.lit(1))).alias("threshold")
    )
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            money_sum("c_acctbal").alias("totacctbal"),
        )
    )


@query(
    "q12_shipmode_priority",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 (adapted: the schema has no l_shipmode or "
    "commit/receipt dates — SURVEY §2.13 — so the mode dimension is "
    "l_linestatus and 'received late' becomes 'shipped more than 60 "
    "days after ordering'): late-shipment line counts split by order "
    "priority class. The year predicate is pushed to the lineitem "
    "scan; the lateness predicate rides the orderkey join as a "
    "residual; one hash-agg over a 2-value key",
)
def q12_shipmode_priority(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q16_supplier_part_variety",
    """
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 (adapted: no partsupp table — SURVEY §2.13 — so the "
    "part-supplier relation is the DISTINCT (l_partkey, l_suppkey) "
    "pairs actually observed in lineitem, and the complaint-supplier "
    "exclusion becomes the low-acctbal set): supplier variety per "
    "(brand, type, size). The pair-distinct is the one big shuffle "
    "(map-side partial dedup); part is filtered BEFORE its join so "
    "AQE broadcasts it; the exclusion is a broadcast anti join",
)
def q16_supplier_part_variety(spark, sf_dir):
    ps = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49))
    )
    bad_supp = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 1000).select(
        "s_suppkey"
    )
    return (
        ps.join(bad_supp, ps.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )
