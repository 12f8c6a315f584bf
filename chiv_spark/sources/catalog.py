"""Test-data catalog: the driver's parquet star schema.

The reference's source is any ``database/sql`` handle
(/root/reference/chiv.go:17-19); our correctness harness sources are
the driver-generated parquet tables (TESTDATA.md). Parquet is
self-describing, so this is the analog of the reference's
runtime-inferred column metadata (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects; read nanos as long (runtime-settable legacy
        # conf) and convert to a proper timestamp via integer division
        # (floor — matches DuckDB's ns→us truncation bit-exactly).
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, register: bool = True) -> dict[str, DataFrame]:
    """Load every table; optionally register temp views so
    ``spark.sql`` / ``Archiver.archive(table, ...)`` can name them."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = read_table(spark, sf_dir, name)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
