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
