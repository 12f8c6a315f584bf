"""10× scale-up probe for the dedup/similarity tier.

Builds a duplication-heavy 10× replica of documents/embeddings (every
original + 9 near-dup variants — an adversarial shape: shingle
document frequencies multiply by 10 and every replica group is 45
true near-dup pairs) and times the pipelines at sf0.1 vs 10×.

Usage: python tools/probe_scale.py [sf_dir] [query ...]
Defaults: sf0.1 and the three round-2-tuned pipelines. Results print
as one line per (query, scale); SCALING.md records the interpretation
(wall should track OUTPUT volume, not input size).
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

DEFAULT_QUERIES = ["dedup_ngram_jaccard", "embedding_neardup", "dedup_clusters"]
PROBE_DIR = "/tmp/chiv-probe-10x"


def build_replicas(spark, sf_dir: str, probe_dir: str, scale: int = 10) -> None:
    """Adversarial near-dup replica: every doc + (scale-1) variants,
    every embedding duplicated verbatim x scale. scale=100 gives the
    third decade used by tools/fit_decade3.py."""
    shutil.rmtree(probe_dir, ignore_errors=True)
    os.makedirs(probe_dir)
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    reps = None
    for i in range(scale):
        r = docs.select(
            (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
            F.when(F.lit(i) == 0, F.col("text"))
            .otherwise(F.concat("text", F.lit(f" variant {i}")))
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        reps = r if reps is None else reps.unionByName(r)
    reps.write.mode("overwrite").parquet(f"{probe_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet")
    extra = [c for c in emb.columns if c != "vec_id"]  # embedding, label, ...
    er = None
    for i in range(scale):
        r = emb.select((F.col("vec_id") + i * 1_000_000).alias("vec_id"), *extra)
        er = r if er is None else er.unionByName(r)
    er.write.mode("overwrite").parquet(f"{probe_dir}/embeddings.parquet")


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    names = [a for a in args if "/" not in a] or DEFAULT_QUERIES
    spark = get_spark("probe-scale")
    spark.sparkContext.setLogLevel("ERROR")
    build_replicas(spark, sf_dir, PROBE_DIR)
    for name in names:
        for label, d in [("base", sf_dir), ("10x", PROBE_DIR)]:
            t0 = time.perf_counter()
            cnt = REGISTRY[name].fn(spark, d).count()
            print(
                f"{name} {label}: {time.perf_counter() - t0:.2f}s rows={cnt}", flush=True
            )
    spark.stop()


if __name__ == "__main__":
    main()
