"""The reference's type-parse table (P4) as a reusable schema mapper.

Reference: /root/reference/chiv_formatters.go:236-276 — precedence is
driver scan-type first, database type-name regex second, string
fallback last. Here the table maps database type names to Spark types
for sources that don't carry Catalyst types natively (CSV without
inference, JDBC drivers reporting exotic names), and backs the
sink-side re-typing rules (SURVEY.md §1.2).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# the reference's regexes, verbatim semantics (chiv_formatters.go:236-242)
_BOOLEAN = re.compile(r"BOOL")
_FLOAT = re.compile(r"DECIMAL|FLOAT|NUMERIC|DOUBLE")
_INTEGER = re.compile(r"INT")


def spark_type_for_db_type(db_type_name: str) -> T.DataType:
    """Map a database type name to the engine's Spark type.

    Matches the reference's effective lattice: BOOL* → boolean,
    DECIMAL*/FLOAT*/NUMERIC*/DOUBLE* → double (the reference collapses
    NUMERIC to float64 — SURVEY.md §1.2), INT* → long, everything else
    (TEXT, VARCHAR, UUID, TIMESTAMP, JSON) → string passthrough.
    Precedence: boolean before float before integer, as in parse()
    (chiv_formatters.go:265-273).
    """
    name = db_type_name.upper()
    if _BOOLEAN.search(name):
        return T.BooleanType()
    if _FLOAT.search(name):
        return T.DoubleType()
    if _INTEGER.search(name):
        return T.LongType()
    return T.StringType()


def schema_for_db_columns(columns: list[tuple[str, str]]) -> T.StructType:
    """Build a Spark schema from (name, db_type_name) column metadata —
    the analog of the reference's runtime ColumnTypes() inference
    (chiv.go:122-125)."""
    return T.StructType(
        [T.StructField(name, spark_type_for_db_type(db_type), True) for name, db_type in columns]
    )


def parse_value(raw: str | None, db_type_name: str) -> object:
    """Parse one raw string value per the type table — the scalar
    behavior of the reference's parse() (chiv_formatters.go:244-276):
    None→None, bool/int/float per type name, string fallback.
    Raises ValueError on unparseable typed values (strconv error
    parity)."""
    if raw is None:
        return None
    dtype = spark_type_for_db_type(db_type_name)
    if isinstance(dtype, T.BooleanType):
        low = raw.lower()
        if low in ("1", "t", "true"):
            return True
        if low in ("0", "f", "false"):
            return False
        raise ValueError(f"cannot parse {raw!r} as boolean")
    if isinstance(dtype, T.DoubleType):
        return float(raw)
    if isinstance(dtype, T.LongType):
        return int(raw)
    return raw
