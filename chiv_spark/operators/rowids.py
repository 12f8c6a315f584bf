"""Scalable global row-ID assignment.

The naive ``row_number() OVER (ORDER BY key)`` funnels the whole
table through ONE partition (Catalyst plans an un-partitioned window
as Exchange SinglePartition) — a guaranteed driver-of-one-executor
bottleneck at 100 TB. This module implements the classic two-pass
``zipWithIndex`` pattern in pure DataFrame terms:

1. **Distributed sort**: ``repartitionByRange(order) +
   sortWithinPartitions(order)`` — the one unavoidable shuffle; range
   partition *i* holds keys strictly below partition *i+1*'s.
2. **Local offsets for free**: ``monotonically_increasing_id()``
   encodes ``partition_id * 2^33 + row_offset_within_partition``, and
   is evaluated in scan order — which after step 1 IS the sorted
   order. One narrow projection recovers (pid, local_idx) with no
   window and no extra shuffle.
3. **Pin**: an eager ``localCheckpoint`` materializes the ids —
   mono-id is marked nondeterministic, so without pinning the two
   downstream consumers (the count pass and the join) could observe
   different partitionings after a recompute.
4. **Global offsets**: per-partition counts (≤ num-buckets rows —
   KBs at any scale), prefix-summed, **broadcast**-joined back on
   pid. The big side never shuffles again.

Net cost: one range exchange + one tiny aggregate + a broadcast
hash join — exactly what RDD ``zipWithIndex`` does, but staying in
DataFrame land so the result composes with Catalyst downstream.

Ties in ``order_cols`` across partition boundaries are ordered by
the range partitioner (equal keys always land in one partition) but
within a partition tie order is undefined — pass a unique (or
uniquified) key list for deterministic ids, same contract as any
``ROW_NUMBER`` without a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

#: monotonically_increasing_id packs the partition id above bit 33
_MONO_PART_SHIFT = 33
_MONO_LOCAL_MASK = (1 << _MONO_PART_SHIFT) - 1


def ranged_stage(df: DataFrame, order_cols: list[str], buckets: int) -> DataFrame:
    """The pre-pin stage: range exchange, partition-local sort, and the
    (pid << 33 | local_offset) tag. Split out so plan tests can assert
    its shape — after the eager checkpoint the exchange is no longer
    visible in the downstream plan (it shows ``Scan ExistingRDD``)."""
    ranged = df.repartitionByRange(buckets, *[F.col(c) for c in order_cols])
    return ranged.sortWithinPartitions(*order_cols).withColumn(
        "__mono", F.monotonically_increasing_id()
    )


def assign_global_row_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "row_id",
    buckets: int | None = None,
    start: int = 1,
) -> DataFrame:
    """Add ``id_col`` = consecutive longs (``start``, ``start+1``, …)
    in ``order_cols`` order, without a single-partition window.

    The returned DataFrame is backed by an eager localCheckpoint (the
    pinning is what makes the ids stable); row order is unspecified —
    sort on ``id_col`` downstream if a sorted layout is needed.
    """
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    spark = df.sparkSession
    if buckets is None:
        buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    pinned = ranged_stage(df, order_cols, buckets).localCheckpoint(eager=True)

    pid = F.shiftright(F.col("__mono"), _MONO_PART_SHIFT).alias("__pid")
    local = F.col("__mono").bitwiseAND(F.lit(_MONO_LOCAL_MASK))

    counts = pinned.groupBy(pid).agg(F.count(F.lit(1)).alias("__n"))
    # prefix sum over ≤ `buckets` rows — the SinglePartition window
    # here touches the tiny counts side only, never the data
    cum = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__n").over(cum), F.lit(0)).cast("long").alias("__off"),
    )

    return (
        pinned.withColumn("__pid", pid)
        .join(F.broadcast(offsets), "__pid")
        .withColumn(
            id_col,
            (F.col("__off") + local + F.lit(int(start))).cast("long"),
        )
        .drop("__pid", "__mono", "__off")
    )
