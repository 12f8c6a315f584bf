"""Streaming CDC apply (streaming/cdc.py): a multi-batch streamed
apply must converge to the same table as a single-pass batch MERGE of
the same change set (seq carries merge priority, not batch order),
deletes must tombstone, rewrites must stay partition-scoped, and a
replayed epoch must be a no-op (idempotence = exactly-once with the
checkpoint)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from chiv_spark.queries.base import t as read_t
from chiv_spark.streaming.cdc import apply_changes_batch, apply_changes_stream

KEYS = ["user_id", "event_type"]
SEQ = ["ts", "event_id"]


def _changes(spark, sf_dir):
    ev = read_t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    # deterministic tombstones: smallest values are deletes
    return ev.withColumn("op", F.when(F.col("value") < 2.0, "D").otherwise("U"))


def _expected(changes):
    from pyspark.sql.window import Window

    w = Window.partitionBy(*KEYS).orderBy(*[F.col(c).desc() for c in SEQ])
    latest = (
        changes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    return latest.filter(F.col("op") != "D")


def _rows(df):
    return sorted(
        (r.user_id, r.event_type, r.ts, r.event_id, r.value, r.op) for r in df.collect()
    )


class TestStreamingCdcApply:
    def test_multi_batch_stream_matches_single_pass_merge(self, spark, sf_dir, tmp_path):
        changes = _changes(spark, sf_dir)
        changes_dir = str(tmp_path / "changes")
        # three change files -> three microbatches under
        # maxFilesPerTrigger=1; batch order must not matter
        for i in range(3):
            changes.filter(F.col("event_id") % 3 == i).write.mode("overwrite").parquet(
                f"{changes_dir}/part{i}"
            )
        # the file source reads a flat dir; point it at the parent with
        # a recursive lookup
        spark.conf.set("spark.sql.streaming.fileSource.cleaner.numThreads", "0")
        final = apply_changes_stream(
            spark,
            f"{changes_dir}/part*",
            changes.schema,
            str(tmp_path / "target"),
            str(tmp_path / "ckpt"),
            KEYS,
            SEQ,
            op_col="op",
            n_buckets=8,
            max_files_per_trigger=1,
        )
        got = _rows(final.drop("kb"))
        want = _rows(_expected(changes))
        assert got == want
        assert len(got) > 0

    def test_partition_scoped_rewrite_and_idempotence(self, spark, sf_dir, tmp_path):
        changes = _changes(spark, sf_dir)
        target = str(tmp_path / "target2")
        apply_changes_batch(spark, changes, target, KEYS, SEQ, op_col="op", n_buckets=8)

        def bucket_files():
            out = {}
            for d in os.listdir(target):
                if d.startswith("kb="):
                    p = os.path.join(target, d)
                    out[d] = {
                        f: os.path.getmtime(os.path.join(p, f))
                        for f in os.listdir(p)
                        if f.endswith(".parquet")
                    }
            return out

        before = bucket_files()
        assert len(before) > 1  # multiple bucket partitions exist

        # a single-key update batch must rewrite ONLY that key's bucket
        one = changes.orderBy("user_id", "event_type", "event_id").limit(1)
        one_up = one.withColumn("op", F.lit("U")).withColumn(
            "event_id", F.col("event_id") + 10_000_000
        )
        kb = one_up.select(
            F.pmod(F.xxhash64(*KEYS), F.lit(8)).cast("int").alias("kb")
        ).collect()[0].kb
        apply_changes_batch(spark, one_up, target, KEYS, SEQ, op_col="op", n_buckets=8)
        after = bucket_files()
        for d in before:
            if d == f"kb={kb}":
                assert before[d] != after[d]  # rewritten
            else:
                assert before[d] == after[d]  # untouched files, same mtimes

        # replaying the same batch converges (idempotent epoch retry)
        from chiv_spark.streaming.cdc import read_target

        state1 = _rows(read_target(spark, target, op_col="op").drop("kb"))
        apply_changes_batch(spark, one_up, target, KEYS, SEQ, op_col="op", n_buckets=8)
        state2 = _rows(read_target(spark, target, op_col="op").drop("kb"))
        assert state1 == state2
        # the live view matches the single-pass merge of the full set
        assert state1 == _rows(
            _expected(changes.unionByName(one_up)).drop(*[])
        )
