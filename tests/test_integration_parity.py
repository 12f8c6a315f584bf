"""Reference integration-test parity: the join and two-tables
fixtures (FIXTURES.md §3-4), archived through OUR engine's native
operators and compared byte-exact against the reference's golden
files (/root/reference/testdata/postgres/join.csv,
two_tables_*.csv; tests chiv_integration_test.go:194-217,353-388).

The crucial difference from the reference: the join itself runs in
this engine (Catalyst), not in a backing RDBMS — the exact capability
the reference delegates (SURVEY.md §2.3)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from chiv_spark import Archiver


def golden(name: str) -> bytes:
    with open(f"/root/reference/testdata/postgres/{name}", "rb") as fh:
        return fh.read()


class TestJoinFixture:
    def test_native_join_matches_reference_golden(self, spark, tmp_path):
        first = spark.createDataFrame(
            [
                ("eb3898fc-6727-4264-a3eb-0ec1f96fc511", "first row", 22),
                ("34182855-aef8-4cfa-a299-d442b30dbfd1", "lorem ipsum", 23),
                ("ddd09249-9461-4177-8b31-12bd0c21271a", "final row", 24),
            ],
            "id string, first_text string, first_int long",
        )
        second = spark.createDataFrame(
            [
                ("eb3898fc-6727-4264-a3eb-0ec1f96fc511", "some text", 12),
                ("34182855-aef8-4cfa-a299-d442b30dbfd1", "dolor est", 13),
            ],
            "id string, second_text string, second_int long",
        )
        # the inner equi-join runs HERE, not in a database
        joined = (
            first.join(second, "id")
            .select("id", "first_text", "first_int", "second_text", "second_int")
            .orderBy("id")  # golden is in this order; chiv inherits cursor order
            .coalesce(1)
        )
        key = Archiver(spark).archive_df(joined, str(tmp_path), key="join.csv")
        assert (tmp_path / key).read_bytes() == golden("join.csv")


class TestTwoTablesFixture:
    def test_one_archiver_two_tables(self, spark, tmp_path):
        """One archiver session, two tables, two distinct objects
        (reference chiv_integration_test.go:194-217)."""
        first = spark.createDataFrame(
            [("some second text", 22), ("lorem second ipsum", 23), ("final row", 24)],
            "text_column string, integer_column long",
        ).coalesce(1)
        second = spark.createDataFrame(
            [("some text", 12), ("lorem ipsum", 13)],
            "text_column string, integer_column long",
        ).coalesce(1)
        first.createOrReplaceTempView("first_table")
        second.createOrReplaceTempView("second_table")
        a = Archiver(spark)  # one session archiver, reused (S9)
        k1 = a.archive("first_table", str(tmp_path))
        k2 = a.archive("second_table", str(tmp_path))
        assert k1 == "first_table.csv" and k2 == "second_table.csv"
        assert (tmp_path / k1).read_bytes() == golden("two_tables_first.csv")
        assert (tmp_path / k2).read_bytes() == golden("two_tables_second.csv")
