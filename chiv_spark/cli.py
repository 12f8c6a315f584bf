"""CLI mirror of the reference's cmd/chiv (flags at
/root/reference/cmd/chiv/main.go:30-79): archive a table (or the
result of an arbitrary SQL query) to a bucket in csv/json/yaml.

Usage:
  python -m chiv_spark.cli --table lineitem --bucket /tmp/out \\
      --data-dir /root/testdata/sf0.001 --format csv [--key K] \\
      [--extension E] [--null N] [--column a --column b ...]
  python -m chiv_spark.cli --query "SELECT ... FROM ..." --bucket ...
"""

from __future__ import annotations

import argparse
import os
import sys

from chiv_spark.core.archiver import Archiver
from chiv_spark.session import get_spark
from chiv_spark.sources.catalog import load_tables


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="chiv_spark", description=__doc__)
    p.add_argument("--table", "-t", help="table to archive")
    p.add_argument("--query", "-q", help="arbitrary SQL to archive (ArchiveRows analog)")
    p.add_argument(
        "--database",
        default=os.environ.get("DATABASE_URL"),
        help="JDBC connection string (env fallback DATABASE_URL, mirroring the "
        "reference CLI, cmd/chiv/main.go:32-35); when set, --table/--query read "
        "through the JDBC source instead of the parquet catalog",
    )
    p.add_argument("--bucket", "-b", required=True, help="destination bucket (path or URI)")
    p.add_argument("--data-dir", "-d", default="/root/testdata/sf0.001", help="parquet table dir")
    p.add_argument("--format", "-f", default="csv", choices=["csv", "json", "yaml"])
    p.add_argument("--key", "-k", default=None, help="object key (overrides extension)")
    p.add_argument("--extension", "-e", default=None, help="key extension")
    p.add_argument("--null", "-n", default=None, help="NULL placeholder")
    p.add_argument(
        "--column", "-c", action="append", default=None, help="column projection (repeatable)"
    )
    p.add_argument("--distributed", action="store_true", help="parallel part-file sink")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if bool(args.table) == bool(args.query):
        print("error: exactly one of --table / --query is required", file=sys.stderr)
        return 2
    spark = get_spark("chiv-cli")
    spark.sparkContext.setLogLevel("ERROR")
    if args.database:
        # RDBMS mode (reference parity): resolve --table/--query through
        # the partitioned JDBC source; requires a JDBC driver jar on the
        # Spark classpath
        from chiv_spark.sources.jdbc import read_sql

        src = args.table or args.query
        df = read_sql(spark, args.database, src)
        df.createOrReplaceTempView(args.table or "q")
        if args.query:
            args.table, args.query = "q", None
    else:
        load_tables(spark, args.data_dir)
    a = Archiver(spark)
    opts = dict(
        format=args.format,
        key=args.key,
        extension=args.extension,
        null=args.null,
        columns=args.column,
        distributed=args.distributed,
    )
    opts = {k: v for k, v in opts.items() if v not in (None, False)}
    if args.table:
        key = a.archive(args.table, args.bucket, **opts)
    else:
        key = a.archive_query(args.query, args.bucket, **opts)
    print(f"archived to {args.bucket.rstrip('/')}/{key}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
