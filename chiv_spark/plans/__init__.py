from chiv_spark.plans.explain import (
    op_counts,
    physical_plan,
    pushed_filters,
    read_schema,
    unpartitioned_windows,
)

__all__ = [
    "op_counts",
    "physical_plan",
    "pushed_filters",
    "read_schema",
    "unpartitioned_windows",
]
