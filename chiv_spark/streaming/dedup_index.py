"""Streaming incremental near-dup detection against a persisted
MinHash band index.

The streaming form of the round-8 ``dedup_incremental_lsh`` batch
query — the shape a production ingest pipeline actually runs: document
shards ARRIVE as a stream; each microbatch is deduped against the
corpus's persisted band-signature index (``minhash_band_index``
parquet) plus within-batch self-pairs, and then the batch's own
signatures are FOLDED INTO the index so every later batch sees them.
Cross-batch near-dup pairs are therefore caught through the index, not
through any cross-batch join — per-arrival cost stays O(|batch| +
matching index buckets) and the raw corpus text is never re-read.

Why ``foreachBatch`` and not a stream-stream/stream-static join: the
MinHash signature of an arriving document is a shingle-explode →
16-way min aggregation, and Structured Streaming cannot place a
stateful aggregation below a join without unsupported-operation
errors; more fundamentally the index UPDATE (append this batch's
signatures) is a side effect no declarative streaming join expresses.
``foreachBatch`` is the documented escape hatch for exactly this
merge-into-index shape (the same reason streaming/cdc.py uses it for
MERGE semantics). Everything inside the batch function is JVM-side
DataFrame API — no Python row UDFs, no collect.

At 100 TB the index relation is hash-partitioned parquet keyed by
(band, bh); each microbatch's band join prunes to the buckets the
batch actually touches once the index is bucketed/Z-ordered on bh,
and the per-batch append is a blind partition write. Under
``trigger(availableNow=True)`` with the whole delta in one batch the
result is exactly the batch ``incremental_lsh_pairs`` relation, which
is how the registry query shares its DuckDB oracle verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession

from chiv_spark.operators import dedup

#: the (doc_a, doc_b, est_jaccard) sink schema, used to seed the
#: output directory so the post-run read succeeds even if every
#: arriving batch had an empty delta slice
PAIR_SCHEMA = "doc_a bigint, doc_b bigint, est_jaccard double"


def incremental_dedup_stream(
    spark: SparkSession,
    base_docs: DataFrame,
    doc_stream: DataFrame,
    work_dir: str,
    delta_predicate: Column | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """Run the bounded streaming incremental dedup job.

    ``base_docs``: the already-resident corpus; its band index is
    written to ``<work_dir>/index`` ONCE before the stream starts
    (in production the index already exists — tests assert the
    original index files survive every batch untouched).
    ``doc_stream``: a streaming DataFrame of arriving document rows
    (``doc_id``, ``text``, ...). ``delta_predicate``: optional filter
    applied per batch (the registry query streams the full documents
    file and carves out the 1-in-10 delta fate slice with it; a real
    ingest stream carries only new docs and passes None).

    Returns the accumulated pair relation read back from the sink.
    """
    work = work_dir.rstrip("/")
    index_dir = f"{work}/index"
    out_dir = f"{work}/pairs"
    ckpt_dir = f"{work}/ckpt"

    dedup.minhash_band_index(base_docs).write.parquet(index_dir)
    spark.createDataFrame([], PAIR_SCHEMA).write.parquet(out_dir)

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        delta = batch_df if delta_predicate is None else batch_df.filter(delta_predicate)
        # fresh read per batch: picks up every prior batch's appended
        # signatures (file listing happens at read time)
        index = spark.read.parquet(index_dir)
        pairs = dedup.incremental_lsh_pairs(delta, index, threshold=threshold)
        pairs.write.mode("append").parquet(out_dir)
        # AFTER the pairs action: fold this batch's signatures into
        # the index so later batches dedup against them (appending
        # first would double-count within-batch self-pairs)
        dedup.minhash_band_index(delta).write.mode("append").parquet(index_dir)

    q = (
        doc_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
