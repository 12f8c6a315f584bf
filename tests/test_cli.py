"""CLI tests (reference cmd/chiv mirror, SURVEY.md §3.3)."""

from __future__ import annotations

import subprocess
import sys

import pytest

from chiv_spark.cli import build_parser, main


class TestParser:
    def test_defaults(self):
        args = build_parser().parse_args(["--table", "region", "--bucket", "/tmp/b"])
        assert args.format == "csv"
        assert args.key is None

    def test_columns_repeatable(self):
        args = build_parser().parse_args(
            ["--table", "t", "--bucket", "b", "-c", "x", "-c", "y"]
        )
        assert args.column == ["x", "y"]

    def test_table_xor_query_enforced(self, capsys):
        assert main(["--bucket", "b"]) == 2
        assert main(["--table", "t", "--query", "q", "--bucket", "b"]) == 2


@pytest.mark.slow
class TestEndToEnd:
    def test_archive_table_via_cli(self, tmp_path):
        out = subprocess.run(
            [
                sys.executable,
                "-m",
                "chiv_spark.cli",
                "--table",
                "region",
                "--bucket",
                str(tmp_path),
                "--data-dir",
                "/root/testdata/sf0.001",
                "--format",
                "json",
            ],
            capture_output=True,
            text=True,
            cwd="/root/repo",
            timeout=180,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "archived to" in out.stdout
        data = (tmp_path / "region.json").read_bytes()
        assert data.startswith(b"[{") and data.endswith(b"}]")


class TestCliDatabaseMode:
    """The reference's defining CLI invocation — `chiv --database
    $DATABASE_URL table bucket` (cmd/chiv/main.go:30-45) — run for
    real against embedded Derby."""

    def test_archive_live_jdbc_table(self, spark, tmp_path):
        db = tmp_path / "clidb"
        url = f"jdbc:derby:{db};create=true"
        conn = spark._jvm.java.sql.DriverManager.getConnection(url)  # noqa: SLF001
        st = conn.createStatement()
        st.executeUpdate("CREATE TABLE cli_tbl (id INT, name VARCHAR(20))")
        st.executeUpdate("INSERT INTO cli_tbl VALUES (1, 'alpha'), (2, 'beta')")
        st.close()
        conn.close()
        rc = main(
            [
                "--database",
                url,
                "--table",
                "cli_tbl",
                "--bucket",
                str(tmp_path),
                "--format",
                "csv",
                "--key",
                "cli.csv",
            ]
        )
        assert rc == 0
        body = (tmp_path / "cli.csv").read_text()
        assert body.startswith("ID,NAME\n")
        assert "1,alpha\n" in body and "2,beta\n" in body

    def test_archive_live_jdbc_query(self, spark, tmp_path):
        db = tmp_path / "clidb2"
        url = f"jdbc:derby:{db};create=true"
        conn = spark._jvm.java.sql.DriverManager.getConnection(url)  # noqa: SLF001
        st = conn.createStatement()
        st.executeUpdate("CREATE TABLE q_tbl (id INT, v DOUBLE)")
        st.executeUpdate("INSERT INTO q_tbl VALUES (1, 0.5), (2, 1.5), (3, 2.5)")
        st.close()
        conn.close()
        rc = main(
            [
                "--database",
                url,
                "--query",
                "SELECT id, v FROM q_tbl WHERE v > 1.0",
                "--bucket",
                str(tmp_path),
                "--format",
                "json",
                "--key",
                "cliq.json",
            ]
        )
        assert rc == 0
        body = (tmp_path / "cliq.json").read_text()
        assert '"ID":2' in body and '"ID":3' in body and '"ID":1' not in body
