"""MEASURED recall/cost curve for the fuzzy-join cap dial (r14
verdict task 8's evidence half — join_fuzzy_cap_autotune computes the
curve's BOUNDS from block statistics; this tool measures the real
thing): for each cap on the ladder, run the capped join and record
its true-pair recall against the uncapped join plus the wall, AND
(round 16, r15 verdict task 2) the cluster formulation's MEMBER
recall at the same cap — the number that shows representative
propagation recovering exactly what pair-capping drops. The uncapped
total uses the dictionary rewrite (fast even at sf0.1); the per-cap
joins are bounded by n_sub_blocks * cap^2 / 2 by construction, so
the whole curve costs seconds.

Usage: python tools/fuzzy_cap_curve.py [sf_dir]
Output: one markdown table (goes to SCALING.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chiv_spark.queries import REGISTRY
from chiv_spark.queries.fuzzy import (
    _FZ_CAP_LADDER,
    capped_fuzzy_pairs,
    fuzzy_cluster_assign,
)
from chiv_spark.session import get_spark


def _member_recall(spark, sf_dir, cap, true_members) -> float:
    """Fraction of true-partnered members landing in a multi-member
    cluster at this cap (join_fuzzy_cluster_recall's semantics)."""
    asn = fuzzy_cluster_assign(spark, sf_dir, cap).filter("assigned")
    sizes = asn.groupBy("rep_key").agg(F.count(F.lit(1)).alias("sz"))
    recovered = asn.join(
        sizes.filter(F.col("sz") >= 2), "rep_key", "left_semi"
    ).select(F.col("member_key").alias("k"))
    n_rec = true_members.join(recovered, "k", "left_semi").count()
    return n_rec / max(true_members.count(), 1)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("fuzzy-cap-curve")
    spark.sparkContext.setLogLevel("ERROR")
    uncapped = REGISTRY["join_fuzzy_levenshtein"].fn(spark, sf_dir)
    total = uncapped.count()
    true_members = (
        uncapped.select(F.col("key_a").alias("k"))
        .unionByName(uncapped.select(F.col("key_b").alias("k")))
        .distinct()
        .persist()
    )
    n_true = true_members.count()
    print(
        f"uncapped true pairs @ {os.path.basename(sf_dir)}: {total:,} "
        f"({n_true:,} partnered members)"
    )
    print("\n| cap | pairs kept | pair recall | member recall (cluster) | wall (s) |")
    print("|---|---|---|---|---|")
    for cap in _FZ_CAP_LADDER:
        df = capped_fuzzy_pairs(spark, sf_dir, cap)
        kept = df.count()  # warmup + volume
        t0 = time.perf_counter()
        capped_fuzzy_pairs(spark, sf_dir, cap).write.format("noop").mode(
            "overwrite"
        ).save()
        w = time.perf_counter() - t0
        mr = _member_recall(spark, sf_dir, cap, true_members)
        print(
            f"| {cap} | {kept:,} | {kept / total:.3f} | {mr:.3f} | {w:.2f} |",
            flush=True,
        )
    true_members.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
