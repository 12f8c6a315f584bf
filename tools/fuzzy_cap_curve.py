"""MEASURED recall/cost curve for the fuzzy-join cap dial (r14
verdict task 8's evidence half — join_fuzzy_cap_autotune computes the
curve's BOUNDS from block statistics; this tool measures the real
thing): for each cap on the ladder, run the capped join and record
its true-pair recall against the uncapped join plus the wall. The
uncapped total uses the dictionary rewrite (fast even at sf0.1); the
per-cap joins are bounded by n_sub_blocks * cap^2 / 2 by
construction, so the whole curve costs seconds.

Usage: python tools/fuzzy_cap_curve.py [sf_dir]
Output: one markdown table (goes to SCALING.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chiv_spark.queries import REGISTRY
from chiv_spark.queries.fuzzy import _FZ_CAP_LADDER, capped_fuzzy_pairs
from chiv_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("fuzzy-cap-curve")
    spark.sparkContext.setLogLevel("ERROR")
    total = REGISTRY["join_fuzzy_levenshtein"].fn(spark, sf_dir).count()
    print(f"uncapped true pairs @ {os.path.basename(sf_dir)}: {total:,}")
    print("\n| cap | pairs kept | pair recall | wall (s) |")
    print("|---|---|---|---|")
    for cap in _FZ_CAP_LADDER:
        df = capped_fuzzy_pairs(spark, sf_dir, cap)
        kept = df.count()  # warmup + volume
        t0 = time.perf_counter()
        capped_fuzzy_pairs(spark, sf_dir, cap).write.format("noop").mode(
            "overwrite"
        ).save()
        w = time.perf_counter() - t0
        print(
            f"| {cap} | {kept:,} | {kept / total:.3f} | {w:.2f} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
