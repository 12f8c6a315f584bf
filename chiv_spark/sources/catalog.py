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


#: (applicationId, table path, content fingerprint) -> DataFrame.
#: ``spark.read.parquet`` costs a ~90 ms JVM round (file listing +
#: footer/schema read) PER CALL, and composed queries call t() for the
#: same table several times per construction — the r17 driver bench
#: paid it on every rep of every row (r18, guide §5 "the driver should
#: do almost no data work"). DataFrames are immutable, so handing the
#: same object back is safe; the CONTENT fingerprint (path/size/mtime
#: of the table's files — the r15 staleness contract) keys the cache
#: so a corpus rewritten mid-session re-reads instead of serving a
#: stale file-index snapshot. This memoizes the plan handle only —
#: never rows; every action still computes from the parquet files.
_TABLE_CACHE: dict = {}


def _table_files_fp(path: str) -> tuple:
    import os

    out: list[tuple] = []
    if os.path.isdir(path):
        for root, dirs, files in os.walk(path):
            dirs.sort()
            for fn in sorted(files):
                fp = os.path.join(root, fn)
                st = os.stat(fp)
                out.append((fp, st.st_size, st.st_mtime_ns))
    elif os.path.exists(path):
        st = os.stat(path)
        out.append((path, st.st_size, st.st_mtime_ns))
    return tuple(out)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        # execution-time conf: set on every call (cache hit included)
        # so a session whose conf was reset still scans NANOS correctly
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = (spark.sparkContext.applicationId, path, _table_files_fp(path))
    hit = _TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    # drop stale snapshots of the same table (content changed)
    for old_key in [k for k in _TABLE_CACHE if k[:2] == key[:2]]:
        del _TABLE_CACHE[old_key]
    df = spark.read.parquet(path)
    if name == "events":
        df = normalize_event_ts(df)
    _TABLE_CACHE[key] = df
    return df


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
