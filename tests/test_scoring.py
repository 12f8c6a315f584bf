"""Invariant tests for the scoring tier (queries/scoring.py).

The oracle harness proves value-equality vs DuckDB; these pin the
semantic contracts: sigmoid monotonicity/range, quartile balance,
TF-IDF ranking shape, and the CUSUM recurrence against a reference
fold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chiv_spark.plans import op_counts
from chiv_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_linear_score_is_a_probability_and_threshold_consistent(spark):
    rows = REGISTRY["mlprep_linear_score"].fn(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        assert 0.0 < r["quality_score"] < 1.0
        assert r["accepted"] == (r["quality_score"] >= 0.5)
    # the model must actually separate: both classes present
    accepted = sum(r["accepted"] for r in rows)
    assert 0 < accepted < len(rows)


def test_rfm_quartiles_are_balanced_and_cover_users(spark):
    out = REGISTRY["events_user_rfm"].fn(spark, SF).cache()
    try:
        users = (
            spark.read.parquet(f"{SF}/events.parquet").select("user_id").distinct().count()
        )
        assert out.count() == users
        for qcol in ("r_quartile", "f_quartile", "m_quartile"):
            sizes = [r["n"] for r in out.groupBy(qcol).agg(F.count(F.lit(1)).alias("n")).collect()]
            assert len(sizes) == 4
            assert max(sizes) - min(sizes) <= 1  # ntile balance
        bad = out.filter((F.col("recency_days") < 0) | (F.col("frequency") <= 0)).count()
        assert bad == 0
    finally:
        out.unpersist()


def test_tfidf_top3_per_doc_ranked_descending(spark):
    out = REGISTRY["text_keyword_tfidf"].fn(spark, SF).cache()
    try:
        per_doc = out.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.collect_list(F.struct("rank", "tfidf")).alias("rt"),
        )
        assert per_doc.filter(F.col("n") != 3).count() == 0
        for r in per_doc.limit(50).collect():
            by_rank = sorted(r["rt"], key=lambda s: s["rank"])
            scores = [s["tfidf"] for s in by_rank]
            assert scores == sorted(scores, reverse=True)
        # a token appearing in every document has idf 0 and can never be
        # a keyword unless everything ties at 0
        assert out.filter(F.col("tfidf") < 0).count() == 0
    finally:
        out.unpersist()


def test_cusum_matches_reference_fold(spark):
    out = {r["user_id"]: r for r in REGISTRY["timeseries_cusum"].fn(spark, SF).collect()}
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    series: dict[int, list] = {}
    for r in ev:
        series.setdefault(r["user_id"], []).append((r["ts"], r["event_id"], r["value"]))
    assert set(out) == set(series)
    for uid, rows in series.items():
        s = 0.0
        for _, _, v in sorted(rows):
            s = max(0.0, s + float(v) - 150.0)
        got = out[uid]
        assert abs(got["cusum_final"] - s) < 1e-6, uid
        assert got["drift"] == (s > 500.0)
        assert got["n_events"] == len(rows)


class TestScoringPlans:
    def test_linear_score_has_no_shuffle_or_udf(self, spark):
        df = REGISTRY["mlprep_linear_score"].fn(spark, SF)
        ops = op_counts(df)
        assert ops.get("Exchange", 0) == 0
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_tfidf_has_no_global_sort_window(self, spark):
        # the ranking window is doc-partitioned (the only permitted
        # SinglePartition exchange is the 1-row n_docs scalar aggregate)
        df = REGISTRY["text_keyword_tfidf"].fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "hashpartitioning(doc_id" in plan
        for line in plan.splitlines():
            if "Window" in line:
                assert "SinglePartition" not in line

    def test_cusum_is_one_aggregate_no_window(self, spark):
        df = REGISTRY["timeseries_cusum"].fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        ops = op_counts(df)
        assert ops.get("Exchange", 0) <= 1
