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


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events timestamp column to TIMESTAMP regardless of
    how the parquet encoded it. Three encodings have been observed from
    the generator across rounds:

    - ``TIMESTAMP(NANOS)`` read as ``bigint`` under
      ``spark.sql.legacy.parquet.nanosAsLong`` → floor-divide to micros
      (matches DuckDB's ns→us truncation bit-exactly);
    - tz-less ``timestamp[us]`` read as ``timestamp_ntz`` (PySpark 4.1
      infers NTZ by default) → cast to ``timestamp``, exact under the
      engine's UTC session timezone;
    - plain ``timestamp`` → no-op.

    Every events consumer (batch catalog + the three streaming readers)
    must go through this: ``unix_micros()`` and ``withWatermark()``
    both reject TIMESTAMP_NTZ.
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_event_ts(spark.read.parquet(path))
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
