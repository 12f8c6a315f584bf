"""Row-count-scaled archive benchmark — the reference's benchmark
shape (/root/reference/chiv_benchmark_test.go: 1 → 1M rows, constant
cells, no-op sink isolating pipeline overhead; SURVEY.md §6).

Measures both sink modes at each scale point and prints a JSON table:
rows, single-object wall (s), distributed wall (s), rows/sec. Run:
    python tools/bench_archive_scaling.py [max_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chiv_spark.core.archiver import Archiver
from chiv_spark.session import get_spark

SCALE_POINTS = [1, 10, 100, 1_000, 5_000, 10_000, 100_000, 1_000_000]


class _NoopSink:
    def write(self, data: bytes) -> None:
        pass


class _NoopStorage:
    from contextlib import contextmanager

    @contextmanager
    def writer(self, bucket, key):  # noqa: ANN001
        yield _NoopSink()


def main() -> None:
    max_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("chiv-archive-bench")
    spark.sparkContext.setLogLevel("ERROR")
    a = Archiver(spark)

    # 10 constant columns, mirroring the reference fixture
    def table(n: int):
        df = spark.range(n)
        return df.select(
            *[F.lit("column_value").alias(f"c{i}") for i in range(10)]
        )

    # warmup
    a.archive_df(table(10).coalesce(1), "/tmp", key="warmup.csv")

    import chiv_spark.core.archiver as archiver_mod

    orig = archiver_mod.storage_for
    archiver_mod.storage_for = lambda bucket, spark=None: _NoopStorage()  # no-op sink
    results = []
    try:
        for n in SCALE_POINTS:
            if n > max_rows:
                break
            df = table(n)
            t0 = time.perf_counter()
            a.archive_df(df, "noop", key="t.csv")
            single = time.perf_counter() - t0
            results.append(
                {
                    "rows": n,
                    "single_object_sec": round(single, 3),
                    "rows_per_sec": round(n / single) if single > 0 else None,
                }
            )
    finally:
        archiver_mod.storage_for = orig

    # distributed mode at the top scale point (real fs, parallel parts)
    import shutil
    import tempfile

    top = min(max_rows, SCALE_POINTS[-1])
    bucket = tempfile.mkdtemp(prefix="chiv-archbench-")
    try:
        t0 = time.perf_counter()
        a.archive_df(table(top), bucket, key="t.csv", distributed=True)
        dist = time.perf_counter() - t0
    finally:
        shutil.rmtree(bucket, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "archive_scaling",
                "unit": "sec",
                "points": results,
                "distributed_at_top": {"rows": top, "sec": round(dist, 3), "rows_per_sec": round(top / dist)},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
