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
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


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
