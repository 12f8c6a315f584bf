"""Source tests: type-parse table (P4), CSV/JSON roundtrips through
the archiver's own output, JDBC option facade, columnar sinks."""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from chiv_spark import Archiver
from chiv_spark.formats.parse import parse_value, schema_for_db_columns, spark_type_for_db_type
from chiv_spark.sources.files import read_csv, read_json, write_columnar
from chiv_spark.sources.jdbc import jdbc_reader_options


class TestTypeParseTable:
    """chiv_formatters.go:236-276 semantics."""

    @pytest.mark.parametrize(
        ("db_type", "expected"),
        [
            ("BOOL", T.BooleanType()),
            ("BOOLEAN", T.BooleanType()),
            ("NUMERIC", T.DoubleType()),
            ("DECIMAL", T.DoubleType()),
            ("DOUBLE", T.DoubleType()),
            ("FLOAT8", T.DoubleType()),
            ("INT", T.LongType()),
            ("INTEGER", T.LongType()),
            ("BIGINT", T.LongType()),
            ("SMALLINT", T.LongType()),
            ("TEXT", T.StringType()),
            ("VARCHAR", T.StringType()),
            ("UUID", T.StringType()),
            ("TIMESTAMP", T.StringType()),
            ("JSON", T.StringType()),
        ],
    )
    def test_mapping(self, db_type, expected):
        assert spark_type_for_db_type(db_type) == expected

    def test_schema_builder(self):
        s = schema_for_db_columns([("id", "UUID"), ("n", "NUMERIC"), ("ok", "BOOL")])
        assert [f.dataType for f in s.fields] == [T.StringType(), T.DoubleType(), T.BooleanType()]

    def test_parse_value(self):
        assert parse_value("42", "INTEGER") == 42
        assert parse_value("3.14", "NUMERIC") == 3.14
        assert parse_value("true", "BOOL") is True
        assert parse_value("1", "BOOL") is True
        assert parse_value(None, "INTEGER") is None
        assert parse_value("hello", "TEXT") == "hello"
        with pytest.raises(ValueError):
            parse_value("notanint", "INTEGER")


class TestFileRoundtrips:
    def test_csv_roundtrip_via_archiver(self, spark, sf_dir, tmp_path):
        import chiv_spark.sources.catalog as cat

        df = cat.read_table(spark, sf_dir, "region")
        Archiver(spark).archive_df(df, str(tmp_path), key="region.csv")
        back = read_csv(
            spark, str(tmp_path / "region.csv"), schema=[("r_regionkey", "INTEGER"), ("r_name", "TEXT")]
        )
        assert back.count() == df.count()
        assert dict(back.dtypes) == {"r_regionkey": "bigint", "r_name": "string"}

    def test_json_array_roundtrip_via_archiver(self, spark, sf_dir, tmp_path):
        import chiv_spark.sources.catalog as cat

        df = cat.read_table(spark, sf_dir, "nation")
        Archiver(spark).archive_df(df, str(tmp_path), format="json", key="nation.json")
        back = read_json(spark, str(tmp_path / "nation.json"))
        assert back.count() == 25
        assert set(back.columns) == {"n_nationkey", "n_name", "n_regionkey"}

    def test_orc_roundtrip(self, spark, sf_dir, tmp_path):
        import chiv_spark.sources.catalog as cat

        df = cat.read_table(spark, sf_dir, "nation")
        write_columnar(df, str(tmp_path / "nation_orc"), fmt="orc")
        back = spark.read.orc(str(tmp_path / "nation_orc"))
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    def test_columnar_partitioned_write(self, spark, sf_dir, tmp_path):
        import chiv_spark.sources.catalog as cat

        df = cat.read_table(spark, sf_dir, "orders")
        write_columnar(df, str(tmp_path / "orders_pq"), partition_by=["o_orderstatus"])
        back = spark.read.parquet(str(tmp_path / "orders_pq"))
        assert back.count() == df.count()
        # partition layout exists (partition pruning works on read)
        assert (tmp_path / "orders_pq" / "o_orderstatus=O").exists()


class TestJdbcFacade:
    def test_table_options(self):
        opts = jdbc_reader_options("jdbc:postgresql://h/db", "mytable")
        assert opts["dbtable"] == "mytable"
        assert opts["fetchsize"] == "10000"

    def test_query_wrapped_as_derived_table(self):
        opts = jdbc_reader_options("jdbc:postgresql://h/db", "SELECT a FROM t WHERE x > 1;")
        assert opts["dbtable"] == "(SELECT a FROM t WHERE x > 1) AS q"

    def test_partitioned_read_options(self):
        opts = jdbc_reader_options(
            "jdbc:mysql://h/db",
            "big_table",
            partition_column="id",
            num_partitions=16,
            lower_bound=0,
            upper_bound=1_000_000,
        )
        assert opts["numPartitions"] == "16"
        assert opts["partitionColumn"] == "id"

    def test_partitioned_requires_bounds(self):
        with pytest.raises(ValueError, match="lower_bound"):
            jdbc_reader_options("jdbc:x://h/db", "t", partition_column="id")


class TestEventsTimestampContract:
    """Pin the events.ts contract: whatever the generator's parquet
    encoding (TIMESTAMP(NANOS)-as-long, tz-less timestamp[us]/NTZ, or
    plain TIMESTAMP), `read_table` must yield a TIMESTAMP column —
    `unix_micros()` and `withWatermark()` both reject TIMESTAMP_NTZ,
    so a silent encoding change must fail here, not in the driver gate."""

    def test_read_table_yields_timestamp(self, spark, sf_dir):
        from chiv_spark.sources.catalog import read_table

        df = read_table(spark, sf_dir, "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        # unix_micros is the canary: it raises on NTZ
        from pyspark.sql import functions as F

        assert df.select(F.unix_micros("ts")).first()[0] is not None

    def test_normalize_handles_ntz_and_bigint(self, spark):
        from pyspark.sql import functions as F

        from chiv_spark.sources.catalog import normalize_event_ts

        base = spark.range(3).select(
            (F.col("id") * 1_000_000_000).alias("ns"),
        )
        # bigint nanos -> timestamp, floor to micros
        as_big = base.withColumnRenamed("ns", "ts")
        out = normalize_event_ts(as_big)
        assert dict(out.dtypes)["ts"] == "timestamp"
        # NTZ -> timestamp, value-identical under the UTC session tz
        as_ntz = base.select(
            F.timestamp_micros((F.col("ns") / 1000).cast("long")).cast("timestamp_ntz").alias("ts")
        )
        out2 = normalize_event_ts(as_ntz)
        assert dict(out2.dtypes)["ts"] == "timestamp"
        vals = [r[0] for r in out2.select(F.unix_micros("ts")).collect()]
        assert vals == [0, 1_000_000, 2_000_000]
