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

    def test_checkpoint_resume_is_exactly_once(self, spark, sf_dir, tmp_path):
        changes = _changes(spark, sf_dir)
        changes_dir = str(tmp_path / "changes3")
        target = str(tmp_path / "target3")
        ckpt = str(tmp_path / "ckpt3")
        changes.filter(F.col("event_id") % 2 == 0).write.parquet(f"{changes_dir}/a")

        def run():
            return apply_changes_stream(
                spark, f"{changes_dir}/*", changes.schema, target, ckpt,
                KEYS, SEQ, op_col="op", n_buckets=8,
            )

        first = _rows(run().drop("kb"))
        # re-running against the SAME checkpoint with no new files must
        # be a no-op (offsets already committed -> zero new batches)
        second = _rows(run().drop("kb"))
        assert first == second
        # a new change file is picked up incrementally from the
        # committed offsets and merged on top
        changes.filter(F.col("event_id") % 2 == 1).write.parquet(f"{changes_dir}/b")
        third = _rows(run().drop("kb"))
        assert third == _rows(_expected(changes))

    def test_merge_read_prunes_to_touched_buckets(self, spark, sf_dir, tmp_path):
        from chiv_spark.plans import physical_plan
        from chiv_spark.streaming.cdc import read_touched_buckets

        changes = _changes(spark, sf_dir)
        target = str(tmp_path / "target4")
        apply_changes_batch(spark, changes, target, KEYS, SEQ, op_col="op", n_buckets=8)
        plan = physical_plan(read_touched_buckets(spark, target, [1, 3]))
        # the bucket IN-filter must land in PartitionFilters (directory
        # pruning), not as a post-scan data filter
        assert "PartitionFilters" in plan
        seg = plan[plan.index("PartitionFilters"):].split("]", 1)[0]
        assert "kb" in seg and ("1" in seg and "3" in seg)
