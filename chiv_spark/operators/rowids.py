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
   KBs at any scale), collected and prefix-summed on the driver,
   attached as a pure array-literal projection indexed by pid (a
   broadcast join only above 4096 buckets, where an array literal
   would bloat the plan). The big side never shuffles again — and
   the offsets never re-compute: keeping them as a lazy subplan made
   every downstream action re-run the counts aggregate.

Net cost: one range exchange + one tiny collected aggregate —
exactly what RDD ``zipWithIndex`` does, but staying in DataFrame
land so the result composes with Catalyst downstream.

Ties in ``order_cols`` across partition boundaries are ordered by
the range partitioner (equal keys always land in one partition) but
within a partition tie order is undefined — pass a unique (or
uniquified) key list for deterministic ids, same contract as any
``ROW_NUMBER`` without a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

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
    with_count: bool = False,
) -> DataFrame | tuple[DataFrame, int]:
    """Add ``id_col`` = consecutive longs (``start``, ``start+1``, …)
    in ``order_cols`` order, without a single-partition window.

    The returned DataFrame is backed by an eager localCheckpoint (the
    pinning is what makes the ids stable); row order is unspecified —
    sort on ``id_col`` downstream if a sorted layout is needed.

    ``with_count=True`` additionally returns the relation's row count
    — free here, because the per-partition counts are collected to
    compute the offsets anyway, where a caller-side ``.count()`` is a
    whole extra job over the pinned table (the r17 suffix-tier loop
    paid exactly that once per densify round).
    """
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    spark = df.sparkSession
    if buckets is None:
        buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    pinned = ranged_stage(df, order_cols, buckets).localCheckpoint(eager=True)

    pid = F.shiftright(F.col("__mono"), _MONO_PART_SHIFT).alias("__pid")
    local = F.col("__mono").bitwiseAND(F.lit(_MONO_LOCAL_MASK))

    # Per-partition counts, collected NOW (≤ `buckets` rows — KBs at
    # any scale). Prior shape kept these lazy under a broadcast join,
    # which re-ran the counts aggregate inside EVERY downstream action
    # on the returned relation; one eager driver-side prefix sum makes
    # the offsets a pure projection instead.
    rows = pinned.groupBy(pid).agg(F.count(F.lit(1)).alias("__n")).collect()
    by_pid = {r["__pid"]: r["__n"] for r in rows}
    offs: list[int] = []
    acc = 0
    for p in range(buckets):
        offs.append(acc)
        acc += by_pid.get(p, 0)
    total = acc

    if buckets <= 4096:
        # offsets as an array literal indexed by pid — zero extra
        # relation in the plan
        off_expr = F.element_at(F.lit(offs), F.col("__pid").cast("int") + 1)
    else:
        # very wide layouts: keep the plan small with a broadcast join
        # against the tiny collected offsets table
        offsets = spark.createDataFrame(
            [(p, o) for p, o in enumerate(offs)], "__pid long, __off long"
        )
        off_expr = None  # joined below
    out = pinned.withColumn("__pid", pid)
    if off_expr is not None:
        out = out.withColumn("__off", off_expr)
    else:
        out = out.join(F.broadcast(offsets), "__pid")
    out = out.withColumn(
        id_col,
        (F.col("__off") + local + F.lit(int(start))).cast("long"),
    ).drop("__pid", "__mono", "__off")
    if with_count:
        return out, total
    return out
