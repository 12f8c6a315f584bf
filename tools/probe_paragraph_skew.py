"""Boilerplate-skew probe for the paragraph-dedup tier (r13 verdict
task 8).

``dedup_paragraph_exact`` keys its first-occurrence agg AND the
rebuild join-back on the chunk fingerprint ``h``. The min-agg is
skew-immune (map-side partial aggregation collapses a hot key to one
row per input partition before the exchange), but the JOIN-BACK is
not: a boilerplate chunk shared by 30% of documents lands 30% of all
chunk rows in one shuffle partition of the join. This probe measures
exactly that shape and records whether the session's AQE skew-join
handling (spark.sql.adaptive.skewJoin, on by default in
chiv_spark.session) absorbs it — the decision input for whether the
tier needs a salted two-phase twin.

Replica: the probe_scale 10x replica (every doc + 9 suffix variants),
then a BOILERPLATE variant where a stable-hash 30% of replica docs
get the same 40-token paragraph PREPENDED (one fingerprint in 30% of
docs — the adversarial shape the verdict names). Organic-10x vs
boilerplate-10x wall times compare like for like; a skew cliff would
show as the boilerplate run degrading far beyond its +12% extra
input volume.

Usage: python tools/probe_paragraph_skew.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chiv_spark.queries import REGISTRY
from chiv_spark.session import get_spark
from tools.probe_scale import build_replicas

PROBE_DIR = "/tmp/chiv-probe-paraskew"
BOILER = " ".join(f"bp{i}" for i in range(40))


def add_boilerplate(spark, probe_dir: str, out_dir: str) -> None:
    """30% stable-hash slice of the 10x replica gets the SAME 40-token
    paragraph prepended (chunk 0 of every hit doc -> one fingerprint
    in 30% of the corpus)."""
    from chiv_spark.functions.hashing import hash64

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    docs = spark.read.parquet(f"{probe_dir}/documents.parquet")
    hit = hash64(F.concat(F.lit("bp:"), F.col("doc_id").cast("string"))) % 10 < 3
    out = docs.withColumn(
        "text",
        F.when(hit, F.concat(F.lit(BOILER + " "), F.col("text"))).otherwise(
            F.col("text")
        ),
    )
    out.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    shutil.copytree(
        f"{probe_dir}/embeddings.parquet", f"{out_dir}/embeddings.parquet"
    )


def time_engine(spark, name: str, sf_dir: str) -> float:
    fn = REGISTRY[name].fn
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("para-skew-probe")
    build_replicas(spark, sf_dir, PROBE_DIR)
    skew_dir = PROBE_DIR + "-boiler"
    add_boilerplate(spark, PROBE_DIR, skew_dir)

    organic = time_engine(spark, "dedup_paragraph_exact", PROBE_DIR)
    boiler = time_engine(spark, "dedup_paragraph_exact", skew_dir)

    # at probe scale the join-back broadcasts `firsts` (inherently
    # skew-immune), so the broadcast legs can't exercise the 100 TB
    # shape. Force the SortMergeJoin leg — what actually runs when
    # firsts is corpus-sized — and let AQE's skew-join handling face
    # the hot fingerprint partition directly.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        organic_smj = time_engine(spark, "dedup_paragraph_exact", PROBE_DIR)
        boiler_smj = time_engine(spark, "dedup_paragraph_exact", skew_dir)
        df = REGISTRY["dedup_paragraph_exact"].fn(spark, skew_dir)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        smj = "SortMergeJoin" in plan
        skewed = "skewed=true" in plan or "isSkew" in plan or "skew=true" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    print(
        f'{{"probe": "paragraph_boilerplate_skew", "sf": "{sf_dir}x10", '
        f'"organic_bcast_sec": {organic:.2f}, "boiler_bcast_sec": {boiler:.2f}, '
        f'"organic_smj_sec": {organic_smj:.2f}, "boiler_smj_sec": {boiler_smj:.2f}, '
        f'"smj_ratio": {boiler_smj / organic_smj:.2f}, '
        f'"smj_leg_is_smj": {str(smj).lower()}, '
        f'"aqe_skew_split_in_plan": {str(skewed).lower()}}}'
    )
    spark.stop()


if __name__ == "__main__":
    main()
