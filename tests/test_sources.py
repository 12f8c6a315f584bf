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
