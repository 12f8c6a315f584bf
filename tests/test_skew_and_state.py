"""Tests for the salted-join skew utility and the stateful streaming
sessionizer."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from chiv_spark.operators.skew import key_skew_profile, salted_join
from chiv_spark.queries.base import t as read_t
from chiv_spark.streaming.sessions import run_stateful_sessions


class TestSaltedJoin:
    @pytest.fixture(scope="class")
    def skewed(self, spark):
        # one hot key (90% of rows) + a tail
        hot = spark.range(900).select(F.lit(1).alias("k"), F.col("id").alias("v"))
        tail = spark.range(100).select((F.col("id") % 50 + 2).alias("k"), F.col("id").alias("v"))
        return hot.unionByName(tail)

    @pytest.fixture(scope="class")
    def dim(self, spark):
        return spark.range(60).select(F.col("id").alias("k"), (F.col("id") * 10).alias("label"))

    def test_salted_equals_plain_inner(self, skewed, dim):
        plain = skewed.join(dim, "k").select("k", "v", "label")
        salted = salted_join(skewed, dim, "k").select("k", "v", "label")
        assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))

    def test_salted_left_join(self, spark, skewed, dim):
        only_small_keys = dim.filter(F.col("k") < 10)
        plain = skewed.join(only_small_keys, "k", "left").select("k", "v", "label")
        salted = salted_join(skewed, only_small_keys, "k", how="left").select("k", "v", "label")
        assert sorted(map(tuple, salted.collect()), key=repr) == sorted(
            map(tuple, plain.collect()), key=repr
        )

    def test_skew_profile(self, skewed):
        prof = key_skew_profile(skewed, "k", top=3).collect()
        assert prof[0]["k"] == 1
        assert prof[0]["share"] == 0.9


class TestStatefulSessions:
    def test_closed_sessions_subset_of_batch(self, spark, sf_dir, tmp_path):
        from chiv_spark.queries import REGISTRY

        streamed = run_stateful_sessions(spark, sf_dir, str(tmp_path / "ckpt"))
        srows = streamed.collect()
        assert len(srows) > 0
        batch = {
            (r["user_id"], r["session_id"]): r["n_events"]
            for r in REGISTRY["events_sessionize"].fn(spark, sf_dir).collect()
        }
        # every CLOSED streaming session must match its batch twin
        # exactly (the dangling last session per user stays in state)
        for r in srows:
            assert batch[(r["user_id"], r["session_id"])] == r["n_events"]


class TestScalableSessionizer:
    def test_midnight_spanning_session_not_split(self, spark, tmp_path):
        """A session crossing the day-bucket boundary must merge back
        into one session (the case a naive bucketed sessionizer
        silently breaks)."""
        import datetime as dt

        from chiv_spark.queries import REGISTRY

        base = dt.datetime(2024, 3, 1, 23, 50)
        rows = [
            (999, base + dt.timedelta(minutes=5 * i), 10_000 + i, "click", 1.0, "{}")
            for i in range(6)
        ]
        hot = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, event_type string, value double, props string"
        )
        hot.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
        out = REGISTRY["events_sessionize_scalable"].fn(spark, str(tmp_path)).collect()
        assert len(out) == 1
        assert out[0]["n_events"] == 6

    def test_equals_plain_sessionizer(self, spark, sf_dir):
        from chiv_spark.queries import REGISTRY

        plain = {tuple(r) for r in REGISTRY["events_sessionize"].fn(spark, sf_dir).collect()}
        scal = {tuple(r) for r in REGISTRY["events_sessionize_scalable"].fn(spark, sf_dir).collect()}
        assert plain == scal
