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


def unpartitioned_windows(df: DataFrame) -> list[tuple[str, bool]]:
    """Every Window node in df's OPTIMIZED logical plan whose
    partitionSpec is empty, as (window_expressions_string,
    limit_below) pairs.

    Unpartitioned windows are the single-partition scale hazard:
    Spark's InferWindowGroupLimit does NOT rewrite rank-filters over
    unpartitioned windows (verified live on 4.1.2 — it fires only
    with partitionBy), so `row_number().over(Window.orderBy(...))` +
    `filter(rk <= k)` physically moves the ENTIRE input relation to
    one task. ``limit_below=True`` means a GlobalLimit bounds EVERY
    leaf path below the window — the window provably runs on a
    bounded (post-limit) relation and is safe at any scale (the
    seed/re-rank pattern). Every-path matters: a window over
    ``join(corpus, limited_seed)`` is still corpus-scale through the
    non-limited branch, so an any-descendant check would
    false-negative exactly the hazard this audit exists to catch —
    binary nodes (Join/Union) count as bounded only when ALL their
    children are. Everything else must be justified by a documented
    bounded-relation argument (see
    tests/test_plans.py::TestWindowAudit's allowlist)."""
    plan = df._jdf.queryExecution().optimizedPlan()  # noqa: SLF001
    out: list[tuple[str, bool]] = []

    def children_of(node):
        ch = node.children()
        kids = [ch.apply(i) for i in range(ch.size())]
        try:
            sq = node.subqueries()
            kids += [sq.apply(i) for i in range(sq.size())]
        except Exception:  # noqa: BLE001 — older node types lack subqueries()
            pass
        return kids

    def has_limit_below(node) -> bool:
        # a node is bounded iff every root→leaf path under it passes
        # through a GlobalLimit: GlobalLimit → True regardless of
        # subtree; leaf → False; any other node → ALL children bounded
        # (an unlimited join/union branch keeps corpus-scale rows
        # flowing to the window no matter what the other side does)
        def bounded(n) -> bool:
            if n.nodeName() == "GlobalLimit":
                return True
            kids = n.children()
            if kids.size() == 0:
                return False
            return all(bounded(kids.apply(i)) for i in range(kids.size()))

        kids = node.children()
        if kids.size() == 0:
            return False
        return all(bounded(kids.apply(i)) for i in range(kids.size()))

    stack = [plan]
    while stack:
        node = stack.pop()
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            out.append(
                (
                    node.windowExpressions().mkString("; ")[:200],
                    has_limit_below(node),
                )
            )
        stack.extend(children_of(node))
    return out
