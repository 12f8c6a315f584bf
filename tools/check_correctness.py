"""Local correctness harness mirroring the driver's t2 gate:
run every REGISTRY query on Spark and its DuckDB oracle twin,
compare row count, sorted column names, and the exact multiset of
values (floats compared bit-exact, with near-miss diagnostics).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from chiv_spark.queries import REGISTRY
from chiv_spark.session import get_spark
from chiv_spark.sources.catalog import TABLES


def norm(v: object) -> object:
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def run(sf_dir: str, names: list[str]) -> int:
    spark = get_spark("correctness", shuffle_partitions=8)
    con = duckdb.connect()
    for tname in TABLES:
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{sf_dir}/{tname}.parquet'")
    failures = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(norm(v) for v in row) for row in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only (no oracle), {len(srows)} rows  [{time.time()-t0:.1f}s]")
            if not srows and name != "dedup_exact":
                print(f"WARN {name}: zero rows from rows-only query")
            continue
        try:
            res = con.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            orows = [tuple(norm(v) for v in row) for row in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"row count: spark={len(srows)} oracle={len(orows)}")
        if not problems:
            order = [scols.index(c) for c in sorted(scols)]
            oorder = [ocols.index(c) for c in sorted(ocols)]
            sset = sorted((tuple(r[i] for i in order) for r in srows), key=repr)
            oset = sorted((tuple(r[i] for i in oorder) for r in orows), key=repr)
            if sset != oset:
                mism = [
                    (a, b) for a, b in zip(sset, oset) if a != b
                ][:3]
                problems.append(f"values differ; first mismatches: {mism}")
        if problems:
            failures += 1
            print(f"FAIL {name}: " + " | ".join(problems))
        else:
            print(f"PASS {name}: {len(srows)} rows, {len(scols)} cols  [{time.time()-t0:.1f}s]")
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a] or list(REGISTRY)
    sys.exit(1 if run(sf, names) else 0)
