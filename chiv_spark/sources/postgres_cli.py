"""Live PostgreSQL source via the ``psql`` CLI (COPY text transport).

The reference's primary integration target is a live Postgres server
(chiv_integration_test.go:24-25 runs against docker-compose
postgres). This container ships the full postgres + psql binaries but
no Python/JDBC pg driver, so the live wire personality rides COPY:
the SERVER renders every value (uuid, json, numeric, bool, timestamp
— the exact type surface of the reference's postgres testdata) and
this source parses the stream back into a TYPED DataFrame per a
caller schema, like the reference's database/sql scan into typed
columns.

Transport is COPY **text** format, not csv: csv COPY distinguishes a
genuine string value ``\\N`` from NULL only by quoting it, and
Python's csv.reader discards quote information — so the csv path
misparsed that one value back as NULL (round-6 ADVICE). Text format
is unambiguous by construction: NULL is the bare two-byte marker
``\\N`` while a data backslash is always escaped to ``\\\\``, so a
data value ``\\N`` arrives as ``\\\\N`` and no quote detection is
needed.

Scale note: this is the wire-personality parity path — extraction is
driver-side, exactly like the reference's single cursor. For bulk
extraction at scale use sources/jdbc.py with partitioned predicates;
the sink side (Archiver) is identical either way.
"""

from __future__ import annotations

import datetime as dt
import subprocess
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: COPY text NULL marker (backslash + N). Lossless: COPY escapes a
#: literal backslash in DATA to ``\\\\``, so the bare marker can only
#: mean NULL — unlike csv, where only quoting disambiguates.
_NULL = "\\N"

#: COPY text escape sequences (src/backend/commands/copyto.c emits
#: exactly these for control chars and backslash)
_ESCAPES = {
    "\\": "\\",
    "b": "\b",
    "f": "\f",
    "n": "\n",
    "r": "\r",
    "t": "\t",
    "v": "\v",
}


def _psql(conninfo: list[str], *args: str, sql: str | None = None) -> str:
    cmd = ["psql", *conninfo, "-v", "ON_ERROR_STOP=1", "-qAt", *args]
    if sql is not None:
        cmd += ["-c", sql]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    if proc.returncode != 0:
        raise RuntimeError(f"psql failed: {proc.stderr.strip()}")
    return proc.stdout


def _unescape(field: str) -> str:
    """Undo COPY text escaping for one non-NULL field."""
    if "\\" not in field:
        return field
    out: list[str] = []
    i = 0
    while i < len(field):
        c = field[i]
        if c == "\\" and i + 1 < len(field) and field[i + 1] in _ESCAPES:
            out.append(_ESCAPES[field[i + 1]])
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


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
        return value == "t"  # COPY renders booleans t/f
    if isinstance(dtype, T.TimestampType):
        return dt.datetime.fromisoformat(value)
    if isinstance(dtype, T.DateType):
        return dt.date.fromisoformat(value)
    raise NotImplementedError(f"postgres_cli: no parser for {dtype}")


def parse_copy_text(out: str, schema: T.StructType) -> list[tuple]:
    """Parse a COPY-text stream into typed rows per ``schema``.

    Data newlines/tabs arrive escaped (``\\n``/``\\t``), so splitting
    on literal newline/tab is record/field-exact; the bare ``\\N``
    marker (never produced by escaping data) is NULL."""
    rows = []
    if out.endswith("\n"):  # strip exactly one terminator: an empty
        out = out[:-1]  # single-column '' row is a real (empty) line
    if out == "":
        return rows
    for line in out.split("\n"):
        fields = line.split("\t")
        rows.append(
            tuple(
                _parse(None if v == _NULL else _unescape(v), f.dataType)
                for v, f in zip(fields, schema.fields)
            )
        )
    return rows


def read_postgres_sql(
    spark: SparkSession,
    conninfo: list[str],
    sql: str,
    schema: T.StructType,
) -> DataFrame:
    """Run ``sql`` on a live postgres and return a typed DataFrame.

    ``conninfo`` is the psql argument list (e.g. ``["-h", sockdir,
    "-U", user, "-d", db]``). The result arrives via
    ``COPY (sql) TO STDOUT`` (text format) — server-rendered values,
    lossless NULL marker (see module docstring) — and is parsed per
    ``schema``. Row order is the query's order (pin it with ORDER BY
    for byte-stable sinks, the reference's cursor-order contract)."""
    out = _psql(conninfo, sql=f"COPY ({sql}) TO STDOUT")
    # coalesce(1): single-cursor semantics — the order the server sent
    # is the order every sink sees (SURVEY.md §2.6)
    return spark.createDataFrame(parse_copy_text(out, schema), schema).coalesce(1)


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
