"""Third-decade scale probe for the superlinear dedup/similarity tier
(r7 verdict task 7) plus the bucket-cap demonstration (task 5).

The r7 fits measured sf0.01 -> sf0.1 -> 10x-adversarial-replica and
found b > 1 for four pipelines, with an output-bound root cause (the
adversarial replica multiplies TRUE near-dup pairs quadratically per
replica group, so wall tracks output volume, not input size). This
probe extends each of those pipelines one more decade — a 100x
replica of sf0.1 (every doc + 99 near-dup variants; every embedding
x100 verbatim) — and records wall AND output rows per scale, so the
output-bound argument can be checked directly: wall-per-output-pair
must stay flat or fall across the new decade.

It also runs the two capped variants (bucket_cap=50, the new
defensive dial) at the same scales: on the adversarial replica every
verbatim group saturates its LSH buckets past the cap, so the capped
wall must flatten while organic small-bucket pairs keep flowing.

Timing protocol: the output .count() doubles as the untimed warmup,
then ONE timed noop-sink wall per scale (walls at the top decade are
minutes — far above this box's ~0.3 s job overhead and its run-to-run
spread, so best-of-3 would triple a multi-hour run for noise that is
<<1% of signal; the r7 fits used best-of-3 at their much smaller
scales).

Usage: python tools/fit_decade3.py [names...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chiv_spark.operators import dedup as dedup_ops
from chiv_spark.operators import similarity as sim_ops
from chiv_spark.queries import REGISTRY
from chiv_spark.queries.base import t as read_table
from chiv_spark.queries.llm import EMB_DIM
from chiv_spark.session import get_spark
from tools.probe_scale import build_replicas

SF1 = "/root/testdata/sf0.1"
PROBE10 = "/tmp/chiv-probe-10x"
PROBE100 = "/tmp/chiv-probe-100x"
CAP = 50

# name -> (dataframe factory, input table for N)
PIPELINES = {
    "dedup_ngram_jaccard": (
        lambda s, d: REGISTRY["dedup_ngram_jaccard"].fn(s, d),
        "documents",
    ),
    "dedup_ngram_containment": (
        lambda s, d: REGISTRY["dedup_ngram_containment"].fn(s, d),
        "documents",
    ),
    "dedup_semdedup": (
        lambda s, d: REGISTRY["dedup_semdedup"].fn(s, d),
        "embeddings",
    ),
    "embedding_neardup": (
        lambda s, d: REGISTRY["embedding_neardup"].fn(s, d),
        "embeddings",
    ),
    f"embedding_neardup_cap{CAP}": (
        lambda s, d: sim_ops.embedding_neardup(
            read_table(s, d, "embeddings"), threshold=0.3, dim=EMB_DIM,
            bucket_cap=CAP,
        ),
        "embeddings",
    ),
    f"dedup_minhash_lsh_cap{CAP}": (
        lambda s, d: dedup_ops.minhash_lsh_pairs(
            read_table(s, d, "documents"), bucket_cap=CAP
        ),
        "documents",
    ),
    # round 9: the stage-2 rescue at the exact replica where the
    # UNCAPPED pair join was unbounded (OOM at 8 g, 38-min abort at
    # 48 g) — membership star edges must come back in seconds because
    # the per-bucket cost is m*reps, never m^2/2
    f"dedup_lsh_rescue_cap{CAP}": (
        lambda s, d: dedup_ops.lsh_quarantine_rescue(
            read_table(s, d, "documents"), bucket_cap=CAP, reps=2
        ),
        "documents",
    ),
}


def main() -> None:
    names = sys.argv[1:] or list(PIPELINES)
    spark = get_spark("fit-decade3")
    spark.sparkContext.setLogLevel("ERROR")
    build_replicas(spark, SF1, PROBE10, scale=10)
    build_replicas(spark, SF1, PROBE100, scale=100)
    rows = []
    for name in names:
        fn, table = PIPELINES[name]
        ns, ts, outs = [], [], []
        for d in (SF1, PROBE10, PROBE100):
            n = spark.read.parquet(f"{d}/{table}.parquet").count()
            t0 = time.perf_counter()
            out = fn(spark, d).count()  # warmup + output volume
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            w = time.perf_counter() - t0
            ns.append(n)
            ts.append(w)
            outs.append(out)
            print(
                f"{name} @ {os.path.basename(d)}: N={n:,} out={out:,} "
                f"wall={w:.2f}s (warmup {warm:.2f}s)",
                flush=True,
            )
        top = math.log(ts[2] / ts[1]) / math.log(ns[2] / ns[1])
        rows.append((name, table, ns, ts, outs, top))
    print(
        "\n| pipeline | N (low→high) | walls (s) | out rows | "
        "top-decade b | ms/out-pair (per scale) |"
    )
    print("|---|---|---|---|---|---|")
    for name, table, ns, ts, outs, top in rows:
        walls = " / ".join(f"{x:.2f}" for x in ts)
        os_ = " / ".join(f"{o:,}" for o in outs)
        per = " / ".join(
            f"{1000.0 * w / o:.2f}" if o else "inf" for w, o in zip(ts, outs)
        )
        print(
            f"| `{name}` | {table} ({ns[0]:,}→{ns[2]:,}) | {walls} | "
            f"{os_} | {top:.2f} | {per} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
