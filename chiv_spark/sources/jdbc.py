"""JDBC source facade — RDBMS parity with the reference.

The reference extracts from Postgres/MySQL via ``database/sql``
(/root/reference/cmd/chiv/main.go:16-17). The Spark-native equivalent
is the JDBC DataFrame source, which additionally gives *partitioned*
parallel extraction (numPartitions/partitionColumn) — something a
single row cursor can never do.

Exercised two ways: option-construction unit tests
(tests/test_sources.py) and a LIVE round-trip against embedded Apache
Derby on the Spark classpath (tests/test_jdbc_integration.py — typed
table over java.sql.DriverManager, driver-metadata type inference,
partitioned parallel read, archive + download-back byte compare: the
reference's chiv_integration_test.go:313-319 loop with an embedded
engine standing in for its dockerized Postgres/MariaDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_reader_options(
    url: str,
    table_or_query: str,
    *,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> dict[str, str]:
    """Build the option map for a (possibly partitioned) JDBC read.

    ``table_or_query``: a table name, or any SQL wrapped as a derived
    table — the reference's ArchiveRows custom-query path
    (/root/reference/README.md:70-77) maps to ``(SELECT ...) AS q``.
    """
    dbtable = table_or_query
    stripped = table_or_query.lstrip()
    if stripped.upper().startswith(("SELECT", "WITH", "(")):
        if not stripped.startswith("("):
            dbtable = f"({table_or_query.rstrip(';')}) AS q"
    opts: dict[str, str] = {
        "url": url,
        "dbtable": dbtable,
        "fetchsize": str(fetch_size),
    }
    if partition_column is not None:
        if num_partitions is None or lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned JDBC reads need num_partitions, lower_bound and upper_bound"
            )
        opts.update(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
        )
    for k, v in (properties or {}).items():
        opts[k] = v
    return opts


def read_sql(spark: SparkSession, url: str, table_or_query: str, **kwargs: object) -> DataFrame:
    """``spark.read.jdbc`` with the facade's option handling."""
    opts = jdbc_reader_options(url, table_or_query, **kwargs)  # type: ignore[arg-type]
    return spark.read.format("jdbc").options(**opts).load()
