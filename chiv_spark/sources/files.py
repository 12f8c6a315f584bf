"""File sources beyond parquet: CSV and JSON readers with the
engine's type conventions, plus columnar sinks for the scale path.

The reference reads only from RDBMS cursors; file ingestion is the
Spark-native widening of its source surface (SURVEY.md §1.3) — schema
either inferred, supplied, or built from DB-style type names via
formats.parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from chiv_spark.formats.parse import schema_for_db_columns


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | list[tuple[str, str]] | None = None,
    null_value: str | None = None,
    **options: str,
) -> DataFrame:
    """CSV reader: header row expected (the archiver writes one);
    ``schema`` may be a StructType or (name, db_type_name) pairs
    mapped through the reference's type table."""
    reader = spark.read.option("header", True)
    if schema is None:
        reader = reader.option("inferSchema", True)
    else:
        if isinstance(schema, list):
            schema = schema_for_db_columns(schema)
        reader = reader.schema(schema)
    if null_value is not None:
        reader = reader.option("nullValue", null_value)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    """NDJSON/JSON-array reader (multiLine handles the archiver's
    single-array objects)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("multiLine", True)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def write_columnar(df: DataFrame, path: str, fmt: str = "parquet", partition_by: list[str] | None = None, **options: str) -> None:
    """Columnar sink (parquet/orc) with optional partition layout —
    the organization a 100 TB archive actually wants (partition
    pruning on read); single-object text formats are the reference-
    parity path, this is the scale path."""
    writer = df.write.mode("overwrite")
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)
