"""Physical-plan introspection helpers.

The scale contract of this engine is enforced by *tests over plans*:
dims must broadcast, filters must reach the parquet scan, projections
must prune the read schema, top-k must not global-sort. These helpers
extract those facts from the executed plan so tests can assert them
(see tests/test_plans.py).
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame

_OPS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "TakeOrderedAndProject",
    "Exchange",
    "Sort",
    "Window",
    "WholeStageCodegen",
)


def physical_plan(df: DataFrame) -> str:
    # default metadata truncation (100 chars) cuts PushedFilters lists
    df.sparkSession.conf.set("spark.sql.maxMetadataStringLength", "2000")
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def op_counts(df: DataFrame) -> dict[str, int]:
    plan = physical_plan(df)
    counts: Counter[str] = Counter()
    for op in _OPS:
        counts[op] = len(re.findall(rf"\b{op}\b", plan))
    return {k: v for k, v in counts.items() if v}


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = physical_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schema(df: DataFrame) -> list[str]:
    """ReadSchema structs across the plan's file scans."""
    plan = physical_plan(df)
    return re.findall(r"ReadSchema: (struct<[^>]*>)", plan)
