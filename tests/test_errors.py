"""Error-path parity tests — the reference's tier-1 strategy
(chiv_test.go:61-148): every pipeline failure site wraps with a
stage-chained message."""

from __future__ import annotations

import pytest

from chiv_spark import Archiver
from chiv_spark.core.errors import ArchiveError, UploadError


@pytest.fixture(scope="module")
def small_df(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string").coalesce(1)
    df.createOrReplaceTempView("err_table")
    return df


class TestStageChainedErrors:
    def test_querying_stage(self, spark, small_df, tmp_path):
        with pytest.raises(ArchiveError, match=r"^chiv: querying 'missing_table':"):
            Archiver(spark).archive("missing_table", str(tmp_path))

    def test_formatting_stage(self, spark, small_df, tmp_path):
        class ExplodingFormatter:
            extension = "x"

            def __init__(self, sink, columns):
                pass

            def open(self):
                pass

            def format_row(self, record):
                raise ValueError("boom")

            def close(self):
                pass

        with pytest.raises(ArchiveError, match=r"^chiv: downloading: formatting row: boom"):
            Archiver(spark).archive_df(small_df, str(tmp_path), format=ExplodingFormatter)

    def test_opening_formatter_stage(self, spark, small_df, tmp_path):
        class BadOpen:
            extension = "x"

            def __init__(self, sink, columns):
                pass

            def open(self):
                raise RuntimeError("no header for you")

            def format_row(self, record):
                pass

            def close(self):
                pass

        with pytest.raises(ArchiveError, match=r"^chiv: downloading: opening formatter:"):
            Archiver(spark).archive_df(small_df, str(tmp_path), format=BadOpen)

    def test_closing_formatter_stage(self, spark, small_df, tmp_path):
        class BadClose:
            extension = "x"

            def __init__(self, sink, columns):
                pass

            def open(self):
                pass

            def format_row(self, record):
                pass

            def close(self):
                raise RuntimeError("flush failed")

        with pytest.raises(ArchiveError, match=r"^chiv: downloading: closing formatter:"):
            Archiver(spark).archive_df(small_df, str(tmp_path), format=BadClose)

    def test_uploading_stage_from_sink_write(self, spark, small_df, tmp_path):
        """A failure inside sink.write surfaces as the uploading stage
        even though it's raised mid-format (the pipe separation the
        reference gets from its errgroup, chiv.go:130-142)."""
        import chiv_spark.core.archiver as archiver_mod

        class BadSink:
            def write(self, data):
                raise OSError("disk full")

        class BadStorage:
            def writer(self, bucket, key):
                from contextlib import contextmanager

                @contextmanager
                def cm():
                    yield BadSink()

                return cm()

        orig = archiver_mod.storage_for
        archiver_mod.storage_for = lambda bucket, spark=None: BadStorage()
        try:
            with pytest.raises(UploadError, match=r"^chiv: uploading: disk full"):
                Archiver(spark).archive_df(small_df, str(tmp_path))
        finally:
            archiver_mod.storage_for = orig

    def test_unwritable_bucket_is_uploading(self, spark, small_df):
        with pytest.raises(ArchiveError, match=r"^chiv: uploading:"):
            Archiver(spark).archive_df(small_df, "/proc/definitely/not/writable")

    def test_error_carries_stage_and_cause(self, spark, small_df, tmp_path):
        try:
            Archiver(spark).archive("missing_table", str(tmp_path))
        except ArchiveError as e:
            assert e.stage == "querying 'missing_table'"
            assert e.cause is not None
