"""Invariant tests for the mining tier (queries/mining.py): streak
contiguity, moment sanity vs numpy, perplexity bounds, and bitwise
identities.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from chiv_spark.plans import op_counts
from chiv_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_streaks_are_contiguous_and_partition_active_days(spark):
    out = REGISTRY["events_activity_streaks"].fn(spark, SF).cache()
    try:
        rows = out.collect()
        assert rows
        # each streak's day span equals its length
        for r in rows:
            assert (r["streak_end"] - r["streak_start"]).days + 1 == r["streak_days"]
        # streaks of one user never overlap or touch (else they'd merge)
        by_user: dict[int, list] = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append(r)
        for streaks in by_user.values():
            streaks.sort(key=lambda r: r["streak_start"])
            for a, b in zip(streaks, streaks[1:]):
                assert (b["streak_start"] - a["streak_end"]).days >= 2
        # total streak days == number of distinct active (user, day) pairs
        total = sum(r["streak_days"] for r in rows)
        active = (
            spark.read.parquet(f"{SF}/events.parquet")
            .select("user_id", F.col("ts").cast("date").alias("d"))
            .distinct()
            .count()
        )
        assert total == active
    finally:
        out.unpersist()


def test_skew_kurtosis_matches_numpy_reference(spark):
    import numpy as np

    got = {r["event_type"]: r for r in REGISTRY["agg_skew_kurtosis"].fn(spark, SF).collect()}
    raw = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_type", "value")
        .collect()
    )
    series: dict[str, list] = {}
    for r in raw:
        series.setdefault(r["event_type"], []).append(float(r["value"]))
    assert set(got) == set(series)
    for et, xs in series.items():
        a = np.array(xs)
        mu, m2 = a.mean(), ((a - a.mean()) ** 2).mean()
        m3 = ((a - mu) ** 3).mean()
        m4 = ((a - mu) ** 4).mean()
        r = got[et]
        assert abs(r["mean"] - mu) < 1e-4
        assert abs(r["stddev_pop"] - math.sqrt(m2)) < 1e-4
        assert abs(r["skewness"] - m3 / m2**1.5) < 1e-4
        assert abs(r["kurtosis_excess"] - (m4 / m2**2 - 3)) < 1e-4


def test_perplexity_bounds_and_seen_bigram_floor(spark):
    out = REGISTRY["text_lm_perplexity"].fn(spark, SF).cache()
    try:
        assert out.count() == 500
        rows = out.collect()
        for r in rows:
            # add-one smoothing keeps every bigram probability in (0, 1):
            # c12 <= c1 and V >= 1, so nll > 0 and ppl > 1
            assert r["avg_nll"] > 0
            assert r["perplexity"] > 1.0
            assert abs(r["perplexity"] - math.exp(r["avg_nll"])) < 1e-3
        # scores must discriminate (not a constant column)
        assert len({r["perplexity"] for r in rows}) > 10
    finally:
        out.unpersist()


def test_bitwise_identities(spark):
    rows = REGISTRY["scalar_bitwise_funcs"].fn(spark, SF).limit(200).collect()
    assert rows
    for r in rows:
        a = r["event_id"]
        assert r["bit_and"] | r["bit_xor"] == r["bit_or"]
        assert r["bit_and"] & r["bit_xor"] == 0
        assert r["bit_not"] == ~a
        assert r["shifted_left"] == (a % 1024) << 3
        assert r["shifted_right"] == a >> 2
        assert r["popcount"] == bin(a).count("1")


class TestMiningPlans:
    def test_bitwise_is_shuffle_free(self, spark):
        ops = op_counts(REGISTRY["scalar_bitwise_funcs"].fn(spark, SF))
        assert ops.get("Exchange", 0) == 0

    def test_streaks_windows_are_user_partitioned(self, spark):
        df = REGISTRY["events_activity_streaks"].fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Window" in line:
                assert "SinglePartition" not in line

    def test_perplexity_joins_are_equi(self, spark):
        ops = op_counts(REGISTRY["text_lm_perplexity"].fn(spark, SF))
        assert ops.get("CartesianProduct", 0) == 0
        # the only nested-loop is the 1-row vocab-size broadcast
        assert ops.get("BroadcastNestedLoopJoin", 0) <= 1


def test_rolling_median_reference_fold(spark):
    out = REGISTRY["window_rolling_median"].fn(spark, SF)
    got = {r["event_id"]: r["rolling_median"] for r in out.collect()}
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    series: dict[int, list] = {}
    for r in ev:
        series.setdefault(r["user_id"], []).append((r["ts"], r["event_id"], float(r["value"])))
    import statistics

    for rows in series.values():
        rows.sort()
        for i, (_, eid, _) in enumerate(rows):
            frame = [v for _, _, v in rows[max(0, i - 6) : i + 1]]
            assert abs(got[eid] - statistics.median(frame)) < 1e-6, eid


def test_negative_pairs_are_valid_reproducible_non_self(spark):
    a = REGISTRY["sample_negative_pairs"].fn(spark, SF)
    rows = a.collect()
    assert rows
    ids = {
        r["doc_id"] for r in spark.read.parquet(f"{SF}/documents.parquet").select("doc_id").collect()
    }
    for r in rows:
        assert r["neg_id"] in ids
        assert r["neg_id"] != r["anchor_id"]
        assert 0 <= r["slot"] < 3
    # deterministic: a second run yields the identical multiset
    again = sorted(map(tuple, REGISTRY["sample_negative_pairs"].fn(spark, SF).collect()))
    assert sorted(map(tuple, rows)) == again
    # near-complete coverage: at most K slots can self-collide away
    assert len(rows) >= 3 * len(ids) - len(ids)


def test_entropy_bounds_and_uniform_limit(spark):
    import math

    rows = REGISTRY["agg_entropy_per_user"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["entropy"] <= math.log(r["n_types"]) + 1e-9
        assert 0.0 <= r["entropy_norm"] <= 1.0 + 1e-9
        # entropy_norm == 1 iff the user's mix is exactly uniform;
        # either way the two columns must be consistent
        if r["n_types"] > 1:
            assert abs(r["entropy_norm"] - r["entropy"] / math.log(r["n_types"])) < 1e-5


class TestHeavyHittersSketch:
    """The registry corpus has a tiny vocabulary (every token is a
    candidate), so the Misra-Gries mechanics need an adversarial pin:
    vocabulary >> sketch width, heavy hitters interleaved with a long
    tail, multiple partitions — the 2-pass result must equal the
    exact computation, which is the certified-superset guarantee in
    action (a single false negative in pass 1 would drop a row)."""

    def test_two_pass_equals_exact_under_wide_vocab(self, spark, tmp_path):
        import random

        from chiv_spark.queries.mining import _MG_WIDTH, _mg_summaries
        from pyspark.sql import functions as F

        rng = random.Random(7)
        # 3 heavy tokens (freq ~2000 each) + 2000 singleton-ish tail
        # tokens spread over 400 docs and 8 partitions
        words = []
        for i in range(6000):
            words.append(f"hh{i % 3}")
        for i in range(2000):
            words.append(f"tail{i}")
        rng.shuffle(words)
        docs = [
            (i, " ".join(words[i * 20 : (i + 1) * 20]))
            for i in range(len(words) // 20)
        ]
        sf = str(tmp_path / "sf")
        spark.createDataFrame(docs, "doc_id long, text string").repartition(
            8
        ).write.parquet(sf + "/documents.parquet")

        df = spark.read.parquet(sf + "/documents.parquet")
        cand = df.select("text").mapInPandas(
            _mg_summaries(_MG_WIDTH), "w string"
        ).distinct()
        toks = df.select(F.explode(F.split("text", " ")).alias("w"))
        n = toks.count()
        exact = {
            (r["w"], r["freq"])
            for r in toks.groupBy("w")
            .agg(F.count(F.lit(1)).alias("freq"))
            .filter(F.col("freq") > n / float(_MG_WIDTH))
            .collect()
        }
        two_pass = {
            (r["w"], r["freq"])
            for r in toks.join(cand, "w", "left_semi")
            .groupBy("w")
            .agg(F.count(F.lit(1)).cast("long").alias("freq"))
            .filter(F.col("freq") > n / float(_MG_WIDTH))
            .collect()
        }
        assert exact == two_pass
        assert {w for w, _ in exact} == {"hh0", "hh1", "hh2"}
        # the sketch really did prune: candidates far below the vocab
        assert cand.count() < 2003


class TestLeakageSafeSplit:
    def test_near_dup_pairs_never_straddle_splits(self, spark, tmp_path):
        """The leakage guarantee, asserted pairwise: every MinHash-LSH
        near-dup pair must land in the SAME split, and every cluster
        must map to exactly one split — on a corpus constructed so
        that a naive per-doc hash split would straddle (near-dup ids
        are far apart, so their doc-level fates differ)."""
        from chiv_spark.operators import dedup

        rows = []
        # 12 near-dup families of 3 docs each, ids deliberately spread
        # so per-doc hash fates disagree within a family
        for fam in range(12):
            base = f"family {fam} text about topic{fam} alpha beta gamma delta epsilon"
            for j, off in enumerate((0, 10_000, 20_000)):
                suffix = "" if j == 0 else f" v{j}"
                rows.append((fam + 1 + off, base + suffix, "en", "s", len(base)))
        # plus unrelated singletons
        for i in range(200, 220):
            rows.append((i, f"singleton doc {i} unique words here {i * 7}", "en", "s", 30))
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        sfd = str(tmp_path)

        split = {
            r.doc_id: (r.cluster_id, r.split)
            for r in REGISTRY["split_leakage_safe"].fn(spark, sfd).collect()
        }
        assert len(split) == len(rows)
        # pairwise: every near-dup pair shares a split
        pairs = dedup.minhash_lsh_pairs(
            spark.read.parquet(str(tmp_path / "documents.parquet"))
        ).collect()
        assert pairs, "generator produced no near-dup pairs"
        for r in pairs:
            assert split[r.doc_a][1] == split[r.doc_b][1], (r.doc_a, r.doc_b)
        # cluster-level: one split per cluster id
        from collections import defaultdict

        by_cluster = defaultdict(set)
        for _doc, (cid, s) in split.items():
            by_cluster[cid].add(s)
        assert all(len(s) == 1 for s in by_cluster.values())
        # the test would be vacuous if every split came out equal:
        # with 12 families + 20 singletons expect >= 2 distinct splits
        assert len({s for _, (_, s) in split.items()}) >= 2
