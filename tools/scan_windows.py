"""Scan every REGISTRY query's optimized logical plan for unpartitioned
Window nodes (the single-partition scale hazard — see
chiv_spark.plans.explain.unpartitioned_windows for why).

Usage: python tools/scan_windows.py [sf_dir [names...]]
Prints one line per unpartitioned window: LIMITED (GlobalLimit below —
bounded, safe) or HIT (needs a bounded-relation justification).
The pytest twin of this tool is tests/test_plans.py::TestWindowAudit,
which enforces an explicit allowlist.
"""
from __future__ import annotations

import sys
import traceback

sys.path.insert(0, "/root/repo")

from chiv_spark.plans import unpartitioned_windows  # noqa: E402
from chiv_spark.queries import REGISTRY  # noqa: E402
from chiv_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:]
    spark = get_spark("scan-windows", master="local[4]", shuffle_partitions=4)
    names = only or sorted(REGISTRY)
    hits = 0
    for name in names:
        try:
            ws = unpartitioned_windows(REGISTRY[name].fn(spark, sf_dir))
        except Exception:
            print(f"ERR  {name}: {traceback.format_exc(limit=1).splitlines()[-1]}")
            continue
        flagged = [w for w, limited in ws if not limited]
        for w, limited in ws:
            print(f"{'HIT ' if not limited else 'LIMITED'} {name}: {w[:160]}")
        hits += bool(flagged)
    print(f"-- {hits} queries with non-limit-bounded unpartitioned "
          f"Window nodes (of {len(names)} scanned)")


if __name__ == "__main__":
    main()
