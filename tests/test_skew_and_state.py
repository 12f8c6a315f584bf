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


def _hot_user_events(spark, tmp_path, hot_events=5000, tail_users=50):
    """Skewed generator (r5 verdict task 1): one bot user emitting
    1000x a tail user's volume. Deterministic (no RNG): event types
    cycle so purchases interleave with touches; the hot user spans
    several day buckets and the tail users include carry-across-bucket
    and never-touched shapes."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1, 0, 0)
    types = ["view", "click", "purchase", "view", "click"]
    rows = [
        # hot user: one event/minute -> ~3.5 days of continuous noise
        (1, base + dt.timedelta(minutes=i), 1_000_000 + i, types[i % 5], 1.0, "{}")
        for i in range(hot_events)
    ]
    for u in range(2, 2 + tail_users):
        rows += [
            # touch on day 1, purchase on day 3: exercises the
            # carry-in path (no touch inside the purchase's bucket)
            (u, base + dt.timedelta(minutes=u), 10_000 * u + 1, "click", 1.0, "{}"),
            (u, base + dt.timedelta(days=2, minutes=u), 10_000 * u + 2, "purchase", 5.0, "{}"),
            # purchase with NO prior touch ever (NULL attribution)
            (u + 1000, base + dt.timedelta(minutes=u), 10_000 * u + 3, "purchase", 2.0, "{}"),
        ]
    df = spark.createDataFrame(
        rows,
        "user_id long, ts timestamp, event_id long, event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


class TestScalableAttribution:
    def test_hot_user_equals_plain(self, spark, tmp_path):
        """1000x hot-key generator: the skew-resilient variant must be
        row-identical to the plain window formulation, including the
        carry-across-bucket and never-touched tail shapes."""
        from chiv_spark.queries import REGISTRY

        sfd = _hot_user_events(spark, tmp_path)
        for model in ("last", "first"):
            plain = {
                tuple(r)
                for r in REGISTRY[f"events_attribution_{model}_touch"].fn(spark, sfd).collect()
            }
            scal = {
                tuple(r)
                for r in REGISTRY[f"events_attribution_{model}_touch_scalable"]
                .fn(spark, sfd)
                .collect()
            }
            assert plain == scal, f"{model}-touch scalable diverged under skew"
            # the generator actually produced the three shapes it claims
            assert sum(1 for r in plain if r[3] is None) > 0, "NULL-attribution rows missing"
            assert len(plain) > 1000

    def test_hot_user_drawdown_equals_plain(self, spark, tmp_path):
        """The nested-frame (running max of running sum) decomposition
        must match the single-window drawdown under the same 1000x
        hot-key generator — including negative equity excursions
        crossing bucket boundaries (values alternate sign by type)."""
        from pyspark.sql import functions as F

        from chiv_spark.queries import REGISTRY

        sfd = _hot_user_events(spark, tmp_path)
        # rewrite values so the cumulative series actually oscillates
        # (all-1.0 values make the running max trivially the last sum)
        ev = spark.read.parquet(f"{sfd}/events.parquet").withColumn(
            "value",
            F.when(F.col("event_id") % 3 == 0, -2.5).otherwise(
                (F.col("event_id") % 7).cast("double")
            ),
        )
        ev.write.mode("overwrite").parquet(str(tmp_path / "osc" / "events.parquet"))
        osc = str(tmp_path / "osc")
        plain = {tuple(r) for r in REGISTRY["window_drawdown"].fn(spark, osc).collect()}
        scal = {
            tuple(r) for r in REGISTRY["window_drawdown_scalable"].fn(spark, osc).collect()
        }
        assert plain == scal
        assert any(r[4] > 0 for r in plain), "no nonzero drawdowns — degenerate data"

    def test_mau_sketch_error_bounded(self, spark, sf_dir, tmp_path):
        """HLL-sketch MAU (r5 verdict task 2): the realized relative
        error vs the in-query exact count must stay inside the
        published 5% bound — checked on the testdata AND on a
        10k-distinct-user synthetic day where HLL actually estimates
        (small sets sit in the sketch's near-exact regime)."""
        import datetime as dt

        from pyspark.sql import functions as F

        from chiv_spark.queries import REGISTRY

        fn = REGISTRY["events_active_users_mau_approx"].fn
        rows = fn(spark, sf_dir).collect()
        assert rows and all(r["err_within_5pct"] for r in rows)
        assert all(r["mau_exact"] > 0 for r in rows)

        # synthetic: 10k users active on day 1, 4k on day 20 (2k
        # overlap) -> trailing-30d MAU on day 20 = 12k distinct
        base = dt.datetime(2024, 5, 1, 12, 0)
        big = spark.range(10_000).select(
            F.col("id").alias("user_id"),
            F.lit(base).alias("ts"),
            F.col("id").alias("event_id"),
            F.lit("view").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        later = spark.range(8_000, 12_000).select(
            F.col("id").alias("user_id"),
            F.lit(base + dt.timedelta(days=19)).alias("ts"),
            (F.col("id") + 50_000).alias("event_id"),
            F.lit("view").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        big.unionByName(later).write.mode("overwrite").parquet(
            str(tmp_path / "events.parquet")
        )
        out = {r["day"]: r for r in fn(spark, str(tmp_path)).collect()}
        assert len(out) == 2
        assert all(r["err_within_5pct"] for r in out.values())
        day20 = out[(base + dt.timedelta(days=19)).date()]
        assert day20["mau_exact"] == 12_000

    def test_event_window_partitions_by_bucket(self, spark, sf_dir):
        """The event-scale window must partition by (user_id, bucket),
        never by user_id alone — the whole point of the variant. Only
        the second (per-bucket carry) window may key on bare user_id."""
        from chiv_spark.queries import REGISTRY

        df = REGISTRY["events_attribution_last_touch_scalable"].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        import re

        windows = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        assert windows, f"no window nodes in plan:\n{plan}"
        event_scale = [w for w in windows if "bucket" in w]
        assert event_scale, f"no (user_id, bucket)-partitioned window found:\n{windows}"


class TestScalableScd2:
    def test_hot_user_scd2_equals_plain(self, spark, tmp_path):
        """The run-length bucket decomposition must be row-identical
        to the plain single-window SCD2 build under the 1000x hot
        user, including spans that CROSS day buckets (the hot user's
        5-type cycle produces runs entirely inside buckets and the
        tail users' single-state days produce cross-bucket merges)."""
        from chiv_spark.queries import REGISTRY

        sfd = _hot_user_events(spark, tmp_path)
        plain = {
            tuple(r) for r in REGISTRY["events_scd2_state"].fn(spark, sfd).collect()
        }
        scal = {
            tuple(r)
            for r in REGISTRY["events_scd2_state_scalable"].fn(spark, sfd).collect()
        }
        assert plain == scal, "scalable SCD2 diverged under skew"
        assert len(plain) > 1000
        # cross-bucket merge actually exercised: at least one span
        # longer than a day bucket (valid_to - valid_from > 1 day)
        import datetime as dt

        assert any(
            r[4] is not None and (r[4] - r[3]) > dt.timedelta(days=1) for r in plain
        ), "no cross-bucket span in the generator output"


class TestScalableRfm:
    def _distinct_rfm_events(self, spark, tmp_path, n_users=64):
        """Generator for the RFM twin equivalence proof: n_users
        divisible by 4, and every per-user metric (recency day,
        frequency, monetary) DISTINCT across users — the regime where
        cutoff quartiles provably equal ntile(4) quartiles. User u
        emits u events of value u on day u, so frequency=u,
        monetary=u*u, recency=(n-u) days: three distinct, differently
        ordered rankings."""
        import datetime as dt

        base = dt.datetime(2024, 3, 1, 12, 0)
        rows = []
        eid = 0
        for u in range(1, n_users + 1):
            for i in range(u):
                eid += 1
                rows.append(
                    (u, base + dt.timedelta(days=u, minutes=i), eid,
                     "click", float(u), "{}")
                )
        df = spark.createDataFrame(
            rows,
            "user_id long, ts timestamp, event_id long, "
            "event_type string, value double, props string",
        )
        df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
        return str(tmp_path)

    def test_distinct_divisible_equals_ntile(self, spark, tmp_path):
        """On distinct metrics with user count % 4 == 0 the broadcast-
        cutoff twin must be ROW-IDENTICAL to the plain three-ntile
        formulation (interpolated P25/P50/P75 land strictly between
        the rank-k and rank-k+1 values, so the cutoff count reproduces
        ntile's equal fourths exactly)."""
        from chiv_spark.queries import REGISTRY

        sfd = self._distinct_rfm_events(spark, tmp_path)
        plain = {
            tuple(r) for r in REGISTRY["events_user_rfm"].fn(spark, sfd).collect()
        }
        scal = {
            tuple(r)
            for r in REGISTRY["events_user_rfm_scalable"].fn(spark, sfd).collect()
        }
        assert plain == scal, "RFM twin diverged from ntile on the distinct/divisible regime"
        assert len(plain) == 64
        # each quartile got exactly 16 users on every metric
        for col in (4, 5, 6):
            from collections import Counter

            c = Counter(r[col] for r in plain)
            assert c == {1: 16, 2: 16, 3: 16, 4: 16}, (col, c)
