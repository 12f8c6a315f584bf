"""Live PostgreSQL source via the ``psql`` CLI (COPY csv transport).

The reference's primary integration target is a live Postgres server
(chiv_integration_test.go:24-25 runs against docker-compose
postgres). This container ships the full postgres + psql binaries but
no Python/JDBC pg driver, so the live wire personality rides COPY:
the SERVER renders every value (uuid, json, numeric, bool, timestamp
— the exact type surface of the reference's postgres testdata) and
this source parses the CSV back into a TYPED DataFrame per a caller
schema, like the reference's database/sql scan into typed columns.

Scale note: this is the wire-personality parity path — extraction is
driver-side, exactly like the reference's single cursor. For bulk
extraction at scale use sources/jdbc.py with partitioned predicates;
the sink side (Archiver) is identical either way.
"""

from __future__ import annotations

import csv
import datetime as dt
import io
import subprocess
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: COPY NULL marker — must be distinguishable from the empty string
#: (char_column NULL vs '' matters for golden parity)
_NULL = "\\N"


def _psql(conninfo: list[str], *args: str, sql: str | None = None) -> str:
    cmd = ["psql", *conninfo, "-v", "ON_ERROR_STOP=1", "-qAt", *args]
    if sql is not None:
        cmd += ["-c", sql]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    if proc.returncode != 0:
        raise RuntimeError(f"psql failed: {proc.stderr.strip()}")
    return proc.stdout


def _parse(value: str | None, dtype: T.DataType) -> object:
    if value is None:
        return None
    if isinstance(dtype, T.StringType):
        return value
    if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType)):
        return int(value)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return float(value)
    if isinstance(dtype, T.DecimalType):
        return Decimal(value)
    if isinstance(dtype, T.BooleanType):
        return value == "t"  # COPY csv renders booleans t/f
    if isinstance(dtype, T.TimestampType):
        return dt.datetime.fromisoformat(value)
    if isinstance(dtype, T.DateType):
        return dt.date.fromisoformat(value)
    raise NotImplementedError(f"postgres_cli: no parser for {dtype}")


def read_postgres_sql(
    spark: SparkSession,
    conninfo: list[str],
    sql: str,
    schema: T.StructType,
) -> DataFrame:
    """Run ``sql`` on a live postgres and return a typed DataFrame.

    ``conninfo`` is the psql argument list (e.g. ``["-h", sockdir,
    "-U", user, "-d", db]``). The result arrives via
    ``COPY (sql) TO STDOUT (FORMAT csv)`` — server-rendered values,
    lossless NULL marker — and is parsed per ``schema``. Row order is
    the query's order (pin it with ORDER BY for byte-stable sinks,
    the reference's cursor-order contract)."""
    out = _psql(
        conninfo,
        sql=f"COPY ({sql}) TO STDOUT WITH (FORMAT csv, NULL '{_NULL}')",
    )
    rows = []
    for rec in csv.reader(io.StringIO(out)):
        rows.append(
            tuple(
                _parse(None if v == _NULL else v, f.dataType)
                for v, f in zip(rec, schema.fields)
            )
        )
    # coalesce(1): single-cursor semantics — the order the server sent
    # is the order every sink sees (SURVEY.md §2.6)
    return spark.createDataFrame(rows, schema).coalesce(1)


def read_postgres_table(
    spark: SparkSession,
    conninfo: list[str],
    table: str,
    schema: T.StructType,
    order_by: str | None = None,
) -> DataFrame:
    cols = ", ".join(f.name for f in schema.fields)
    sql = f"SELECT {cols} FROM {table}"
    if order_by:
        sql += f" ORDER BY {order_by}"
    return read_postgres_sql(spark, conninfo, sql, schema)
