"""Cooperative cancellation — the reference's ArchiveWithContext
semantics (ctx cancelled mid-archive aborts the pipeline,
chiv_integration_test.go:324-351)."""

from __future__ import annotations

import threading
import time

import pytest

from pyspark.sql import functions as F

from chiv_spark import Archiver
from chiv_spark.core.errors import ArchiveError


@pytest.mark.slow
class TestCancellation:
    def test_cancel_aborts_running_archive(self, spark, tmp_path):
        # a deliberately slow but MEMORY-LIGHT plan: range() generates
        # lazily (no materialization), and the single-object sink
        # drains it through the Python encoder at ~70k rows/s, so this
        # would take ~10 minutes if not cancelled
        big = spark.range(50_000_000).select(
            F.col("id").alias("v"), (F.col("id") * 2).alias("w")
        )
        a = Archiver(spark)
        errors: list[BaseException] = []

        def run():
            try:
                a.archive_df(big, str(tmp_path), key="never.csv", job_group="cancel-me")
            except BaseException as e:  # noqa: BLE001
                errors.append(e)

        t = threading.Thread(target=run, daemon=True)
        t.start()
        time.sleep(3)  # let jobs start
        a.cancel("cancel-me")
        t.join(timeout=60)
        assert not t.is_alive(), "archive did not abort after cancellation"
        assert errors, "cancelled archive should raise"
        # surfaces through the stage-chained wrapper or Spark's own
        # cancellation exception — either way the caller sees a failure
        assert isinstance(errors[0], (ArchiveError, Exception))
