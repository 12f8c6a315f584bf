"""Direct reference-parity queries: full scan, ordered projection,
NULL-placeholder substitution, and the type-parse/cast table
(SURVEY.md §2.1-S1, §2.2 P1/P3/P4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chiv_spark.queries.base import query, t


@query(
    "scan_full_table",
    """
    SELECT r_regionkey, r_name FROM region
    """,
    doc="S1 full table scan (SELECT * FROM table, chiv.go:213)",
)
def scan_full_table(spark, sf_dir):
    return t(spark, sf_dir, "region").select("r_regionkey", "r_name")


@query(
    "projection_ordered",
    """
    SELECT c_custkey, c_mktsegment, c_name FROM customer
    """,
    doc="P1 order-preserving column projection (WithColumns, chiv_options.go:35-39)",
)
def projection_ordered(spark, sf_dir):
    return t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_name")


@query(
    "filter_predicate",
    """
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
    WHERE o_totalprice > 400000 AND o_orderstatus = 'O'
    """,
    doc="P2 row predicate (delegated-to-RDBMS in the reference; native here)",
)
def filter_predicate(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.filter((F.col("o_totalprice") > 400000) & (F.col("o_orderstatus") == "O")).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )


@query(
    "null_placeholder",
    """
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'custom_null') AS status_filled
    FROM orders
    """,
    doc="P3 NULL→placeholder substitution pre-encoding (chiv.go:175-181)",
)
def null_placeholder(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    # NULLIF manufactures NULLs (the test tables have none); COALESCE
    # is the engine-side placeholder substitution the archiver applies
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("custom_null")).alias(
            "status_filled"
        ),
    )


@query(
    "cast_type_table",
    """
    SELECT l_orderkey,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_int,
           CAST(l_linenumber AS DOUBLE) AS line_float,
           (l_discount > 0.05) AS high_discount
    FROM lineitem WHERE l_orderkey <= 2000
    """,
    doc="P4 type parse/cast table (chiv_formatters.go:244-276): str/int/float/bool coercions",
)
def cast_type_table(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    return li.select(
        "l_orderkey",
        F.col("l_orderkey").cast("string").alias("key_str"),
        # floor-then-cast: Spark's double→long truncates but DuckDB's
        # rounds; floor on both sides pins the semantics
        F.floor("l_quantity").cast("long").alias("qty_int"),
        F.col("l_linenumber").cast("double").alias("line_float"),
        (F.col("l_discount") > 0.05).alias("high_discount"),
    )
