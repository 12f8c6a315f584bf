"""Live JDBC extraction tests against embedded Apache Derby.

The reference's defining integration tier extracts from real running
databases (/root/reference/chiv_integration_test.go:24-25, Postgres +
MariaDB via docker-compose) and download-back compares the archived
object (:313-319). No network databases exist in this sandbox, but
Spark ships Derby (derby-10.16 on the JVM classpath), so this tier
runs a REAL JDBC round-trip: create a typed table over
java.sql.DriverManager, extract it through ``sources.jdbc.read_sql``
(driver-metadata → Catalyst type inference included), archive it, and
byte-compare the object — the same loop as the reference, with an
embedded engine standing in for the dockerized ones.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from pyspark.sql import types as T

from chiv_spark import Archiver
from chiv_spark.sources.jdbc import read_sql


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """Create a Derby database with a typed table via real JDBC
    (DriverManager in the Spark JVM — the same classpath the JDBC
    source uses)."""
    db_dir = tmp_path_factory.mktemp("derby") / "testdb"
    url = f"jdbc:derby:{db_dir};create=true"
    jvm = spark._jvm  # noqa: SLF001
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        """
        CREATE TABLE typed_tbl (
            id INT NOT NULL,
            name VARCHAR(50),
            price NUMERIC(10,2),
            active BOOLEAN,
            created TIMESTAMP,
            ratio DOUBLE
        )
        """
    )
    rows = [
        "(1, 'widget', 19.99, true, TIMESTAMP('2018-01-04 00:00:00'), 0.5)",
        "(2, 'gadget', 0.01, false, TIMESTAMP('2018-02-04 12:30:15'), 2.25)",
        "(3, NULL, NULL, NULL, NULL, NULL)",
    ]
    for r in rows:
        st.executeUpdate(f"INSERT INTO typed_tbl VALUES {r}")
    st.close()
    conn.close()
    return url


class TestDerbyExtraction:
    def test_type_inference_from_driver_metadata(self, spark, derby_url):
        """NUMERIC/BOOLEAN/TIMESTAMP must arrive as Catalyst
        Decimal/Boolean/Timestamp — the SURVEY §1.2 inference path,
        exercised against a real driver's ResultSetMetaData."""
        df = read_sql(spark, derby_url, "typed_tbl")
        fields = {f.name.lower(): f.dataType for f in df.schema.fields}
        assert fields["id"] == T.IntegerType()
        assert fields["name"] == T.StringType()
        assert fields["price"] == T.DecimalType(10, 2)
        assert fields["active"] == T.BooleanType()
        assert fields["created"] == T.TimestampType()
        assert fields["ratio"] == T.DoubleType()

    def test_values_round_trip(self, spark, derby_url):
        rows = {r["ID"]: r for r in read_sql(spark, derby_url, "typed_tbl").collect()}
        assert len(rows) == 3
        assert rows[1]["NAME"] == "widget"
        assert rows[1]["PRICE"] == Decimal("19.99")
        assert rows[1]["ACTIVE"] is True
        assert rows[1]["CREATED"] == dt.datetime(2018, 1, 4)
        assert rows[2]["ACTIVE"] is False
        assert rows[2]["RATIO"] == 2.25
        assert all(rows[3][c] is None for c in ("NAME", "PRICE", "ACTIVE", "CREATED", "RATIO"))

    def test_query_path_derived_table(self, spark, derby_url):
        """The reference's custom-query extraction (ArchiveRows README
        path) — arbitrary SQL wrapped as a derived table."""
        df = read_sql(
            spark, derby_url, "SELECT id, name FROM typed_tbl WHERE active = true"
        )
        got = [(r[0], r[1]) for r in df.collect()]
        assert got == [(1, "widget")]

    def test_partitioned_parallel_read(self, spark, derby_url):
        """Partitioned extraction — N concurrent JDBC cursors, the
        scale capability a single row cursor can never give. Verify
        partition count AND that the union of stripes is the table."""
        df = read_sql(
            spark,
            derby_url,
            "typed_tbl",
            partition_column="id",
            num_partitions=3,
            lower_bound=1,
            upper_bound=4,
        )
        assert df.rdd.getNumPartitions() == 3
        assert sorted(r["ID"] for r in df.collect()) == [1, 2, 3]

    def test_extract_archive_download_back(self, spark, derby_url, tmp_path):
        """The full reference loop (chiv_integration_test.go:313-319):
        extract via live JDBC -> archive -> read the object back and
        byte-compare."""
        df = read_sql(spark, derby_url, "typed_tbl").orderBy("ID").coalesce(1)
        key = Archiver(spark).archive_df(df, str(tmp_path), format="csv", key="typed.csv")
        got = (tmp_path / key).read_bytes().decode()
        # PRICE keeps the driver's NUMERIC scale in CSV (raw-bytes
        # sink parity: 19.99 / 0.01 would survive, and so would 9.50)
        expected = (
            "ID,NAME,PRICE,ACTIVE,CREATED,RATIO\n"
            "1,widget,19.99,true,2018-01-04T00:00:00Z,0.5\n"
            "2,gadget,0.01,false,2018-02-04T12:30:15Z,2.25\n"
            "3,,,,,\n"
        )
        assert got == expected

    def test_null_placeholder_through_jdbc(self, spark, derby_url, tmp_path):
        """NULL placeholder substitution applies to live-extracted rows
        exactly as to local frames (reference WithNull, chiv.go:175-181)."""
        df = read_sql(spark, derby_url, "typed_tbl").orderBy("ID").coalesce(1)
        key = Archiver(spark).archive_df(
            df, str(tmp_path), format="csv", key="typed_null.csv", null="N/A"
        )
        got = (tmp_path / key).read_bytes().decode()
        assert got.splitlines()[-1] == "3,N/A,N/A,N/A,N/A,N/A"


@pytest.fixture(scope="module")
def mariadb_wire_url(spark, tmp_path_factory):
    """A second live wire personality (r4 verdict item 7): MariaDB's
    BOOLEAN is TINYINT(1) on the wire, so the reference receives raw
    1/0 integers and passes them through UN-normalized
    (/root/reference/testdata/mariadb/happy.csv:2-4 — `1`/`0`, not
    `true`/`false`; SURVEY §1.2 "no normalization"). Derby stands in
    with SMALLINT columns: the driver metadata reports an integer
    type, exactly what a MariaDB TINYINT(1) reports, and the engine
    must emit the integers untouched. Quoted identifiers keep the
    golden's lowercase column names through Derby's metadata."""
    db_dir = tmp_path_factory.mktemp("derby_maria") / "mariadb_wire"
    url = f"jdbc:derby:{db_dir};create=true"
    jvm = spark._jvm  # noqa: SLF001
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        """
        CREATE TABLE test_table (
            "id" INTEGER NOT NULL,
            "text_column" VARCHAR(100),
            "char_column" VARCHAR(50),
            "int_column" INTEGER,
            "float_column" DOUBLE,
            "bool_column" SMALLINT,
            "ts_column" TIMESTAMP
        )
        """
    )
    for r in (
        "(1, 'some text', 'some chars', 42, 3.14, 1,"
        " TIMESTAMP('2018-01-04 00:00:00'))",
        "(2, 'some other text', NULL, 100, 3.141592, 1,"
        " TIMESTAMP('2018-02-04 00:00:00'))",
        "(3, 'some more text', 'some more chars', 101, NULL, 0,"
        " TIMESTAMP('2018-02-05 00:00:00'))",
    ):
        st.executeUpdate(f"INSERT INTO test_table VALUES {r}")
    st.close()
    conn.close()
    return url


class TestMariadbWirePersonality:
    """Live second-personality round trip: integer bools must survive
    every sink byte-exact vs the reference's MariaDB goldens."""

    GOLDEN = "/root/reference/testdata/mariadb/happy.{ext}"

    def _archive(self, spark, url, tmp_path, fmt, ext):
        df = read_sql(spark, url, "test_table").orderBy("id").coalesce(1)
        key = Archiver(spark).archive_df(
            df, str(tmp_path), format=fmt, key=f"happy.{ext}"
        )
        return (tmp_path / key).read_bytes()

    def test_bool_arrives_as_integer_not_boolean(self, spark, mariadb_wire_url):
        df = read_sql(spark, mariadb_wire_url, "test_table")
        kind = {f.name: f.dataType for f in df.schema.fields}["bool_column"]
        assert kind in (T.ShortType(), T.IntegerType())
        assert sorted(r["bool_column"] for r in df.collect()) == [0, 1, 1]

    def test_csv_byte_exact(self, spark, mariadb_wire_url, tmp_path):
        got = self._archive(spark, mariadb_wire_url, tmp_path, "csv", "csv")
        assert got == open(self.GOLDEN.format(ext="csv"), "rb").read()

    def test_json_byte_exact(self, spark, mariadb_wire_url, tmp_path):
        got = self._archive(spark, mariadb_wire_url, tmp_path, "json", "json")
        assert got == open(self.GOLDEN.format(ext="json"), "rb").read()

    def test_yaml_byte_exact(self, spark, mariadb_wire_url, tmp_path):
        got = self._archive(spark, mariadb_wire_url, tmp_path, "yaml", "yaml")
        assert got == open(self.GOLDEN.format(ext="yaml"), "rb").read()
