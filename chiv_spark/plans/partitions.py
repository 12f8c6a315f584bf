"""Cached-DataFrame partition right-sizing.

A ``persist()`` pins the pre-AQE shuffle partition count — AQE cannot
re-coalesce a cached RDD — so every downstream stage over a cached,
usually-small intermediate (a thresholded edge list, an LSH pair set)
sprays that many near-empty tasks. After the materializing ``count()``
the exact row count is known, so the partitioning can be sized from
the DATA: keep the full partitioning when the intermediate is big,
collapse the task spray when it is small. ``coalesce`` is narrow —
no extra shuffle either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: default rows-per-task target for coalesced cached intermediates
ROWS_PER_TASK = 2_000_000


def right_size(cached: DataFrame, n_rows: int, rows_per_task: int = ROWS_PER_TASK) -> DataFrame:
    """Coalesce a just-materialized cached DataFrame to
    ``ceil(n_rows / rows_per_task)`` partitions (floor 1), never more
    than it already has. Call AFTER the eager count that populated the
    cache; keep a handle on the original for ``unpersist()``."""
    target = max(1, min(cached.rdd.getNumPartitions(), n_rows // rows_per_task + 1))
    return cached.coalesce(target)
