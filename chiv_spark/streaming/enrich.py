"""Stream-static enrichment and streaming deduplication.

Two more Structured Streaming shapes beyond the window/join/session
trio (net-new surface vs the reference, whose "streaming" is bounded
-memory batch pipelining — /root/reference/chiv.go:210-260 sink loop):

- stream ⋈ static dimension: stateless per-microbatch join; the
  static side is re-planned each batch, so Catalyst broadcasts it
  when it fits and shuffles otherwise — no watermark state involved.
- dropDuplicatesWithinWatermark: watermark-bounded dedup state keyed
  on the dedup columns; at 100 TB/day the state store holds only keys
  inside the watermark horizon instead of the full key history
  (unlike plain dropDuplicates on a stream, which grows forever).

Both run as bounded jobs via trigger(availableNow=True) on the static
events parquet so tests and the driver execute them to completion.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chiv_spark.sources.catalog import normalize_event_ts, read_table


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
    return normalize_event_ts(
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
    )


def purchases_by_segment(spark: SparkSession, sf_dir: str, checkpoint_dir: str) -> DataFrame:
    """Stream purchases enriched with the static customer dimension,
    aggregated to revenue per market segment.

    The stream-static join is stateless: each microbatch joins against
    the (unhinted) static side, so the plan survives any customer-table
    size. The aggregation is the only stateful operator."""
    purchases = _event_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    name = f"purchases_by_segment_{uuid.uuid4().hex[:8]}"
    q = (
        purchases.join(cust, purchases.user_id == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            # decimal sum: exact/order-free → bit-identical to the batch twin
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def deduped_user_types(spark: SparkSession, sf_dir: str, checkpoint_dir: str) -> DataFrame:
    """Watermark-bounded streaming dedup on (user_id, event_type):
    emits each pair's first-seen row, append mode.

    The availableNow run processes the file in one batch before the
    watermark advances, so nothing is dropped as late and the emitted
    set is exactly the batch DISTINCT (first occurrence per pair)."""
    events = _event_stream(spark, sf_dir)
    name = f"deduped_user_types_{uuid.uuid4().hex[:8]}"
    q = (
        events.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
