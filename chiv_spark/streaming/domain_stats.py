"""Streaming per-domain quality statistics — a MERGEABLE-COUNTER fold.

The streaming form of ``quality_domain_report``: document shards
arrive as a stream; each microbatch computes its own per-(source,
normalized-fingerprint) counters (doc count, Gopher-keep count — both
pure functions of the batch's rows) and appends them as one
generation; the report is computed on demand by summing counters
across generations and running the SHARED report tail
(queries.quality.domain_report_from_counts).

This is a different streaming pattern from the index-fold dedup tiers
(streaming.dedup_index) and worth having side by side with them:

- **Retroactively exact.** The counters form a commutative monoid
  (per-batch counts sum to whole-corpus counts), so the final report
  equals the batch recompute REGARDLESS of how the corpus was split
  into microbatches — there is no arrival-order caveat, and the batch
  oracle is shared verbatim even under multi-batch triggers (the
  dedup tiers earn oracle sharing only under availableNow's single
  batch). Duplicate detection is retroactive too: a fingerprint whose
  copies arrive in different batches still counts as a duplicate,
  because global multiplicity is summed at READ time, not probed at
  arrival time.
- **Bounded state.** The store holds counter rows, not documents —
  at most one row per (source, fingerprint) pair per generation, and
  compaction (sum into SEED_BATCH, the dedup_index convention) keeps
  it at the distinct-pair count regardless of corpus size.

Idempotency is the standard generational contract: each batch writes
its counters under ``src_batch`` with dynamic partition overwrite, so
a replayed batch replaces its own partition instead of double-counting
— the exactly-once caveat of foreachBatch handled the same way the
index tiers handle it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chiv_spark.streaming.dedup_index import SEED_BATCH, _dir_exists

#: counter-store schema (src_batch is the partition column)
COUNTS_SCHEMA = "source string, fingerprint bigint, n bigint, k bigint"

#: deletion generations live in their own reserved id range,
#: DELETE_BASE - request_id, strictly below SEED_BATCH (-1) and every
#: foreachBatch generation (>= 0) — a deletion id can therefore never
#: collide with (and dynamically OVERWRITE) a stream generation's
#: counters, which would have replaced that generation with the
#: negation instead of subtracting.
DELETE_BASE = -1_000_000


def write_counts_generation(
    counts: DataFrame, counts_dir: str, batch_id: int
) -> None:
    """One counter generation under src_batch partitions with dynamic
    partition overwrite (replay replaces, never double-counts)."""
    (
        counts.withColumn("src_batch", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("src_batch")
        .parquet(counts_dir)
    )


def read_counts(spark: SparkSession, counts_dir: str) -> DataFrame:
    """The folded counter relation: generations summed per
    (source, fingerprint) — the commutative-monoid collapse. Pairs
    whose fold reaches n = 0 (every contributing doc later deleted
    via a negative generation) are DROPPED: they represent no
    documents, and leaving them in would feed n_docs = 0 sources into
    the report's rate divisions."""
    return (
        spark.read.schema(f"{COUNTS_SCHEMA}, src_batch bigint")
        .parquet(counts_dir)
        .groupBy("source", "fingerprint")
        .agg(F.sum("n").alias("n"), F.sum("k").alias("k"))
        .filter(F.col("n") != 0)
    )


def compact_counts(spark: SparkSession, counts_dir: str) -> None:
    """Fold every generation into one SEED_BATCH generation: the
    report is unchanged (summing is associative), the store shrinks
    to one row per distinct (source, fingerprint) pair."""
    folded = read_counts(spark, counts_dir)
    staged = f"{counts_dir.rstrip('/')}__staged"
    (
        folded.withColumn("src_batch", F.lit(int(SEED_BATCH)))
        .write.mode("overwrite")
        .partitionBy("src_batch")
        .parquet(staged)
    )
    import shutil

    shutil.rmtree(counts_dir)
    shutil.move(staged, counts_dir)


def domain_stats_stream(
    spark: SparkSession,
    arrivals_stream: DataFrame,
    work_dir: str,
) -> DataFrame:
    """Run the bounded streaming domain-stats job: fold each batch's
    counters, then return the report over the folded store via the
    shared report tail. See module docstring for why the result is
    retroactively exact under ANY batching."""
    from chiv_spark.queries.quality import (
        domain_counts,
        domain_report_from_counts,
    )

    work = work_dir.rstrip("/")
    counts_dir = f"{work}/counts"
    ckpt_dir = f"{work}/ckpt"

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        write_counts_generation(
            domain_counts(batch_df), counts_dir, batch_id
        )

    q = (
        arrivals_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not _dir_exists(spark, counts_dir):
        return spark.createDataFrame(
            [],
            "source string, n_docs bigint, n_keep bigint, n_dup bigint, "
            "keep_frac double, dup_rate double, kept boolean",
        )
    return domain_report_from_counts(read_counts(spark, counts_dir))


def domain_gate_from_counts(
    spark: SparkSession,
    counts_dir: str,
    docs: DataFrame,
    doc_keep: DataFrame,
) -> DataFrame:
    """The two-level domain gate computed FROM the folded counter
    store (r14 verdict task 5): the per-domain verdict needs only the
    sufficient statistics the fold already holds, so the corpus is
    touched exactly once — for the per-doc verdict join and the final
    projection — instead of being re-aggregated into a fresh domain
    report on every gating pass. Because the counters are
    retroactively exact under ANY batching, the gate equals the batch
    recompute no matter how the corpus arrived (pytest-pinned
    cross-batch). ``doc_keep`` is the (doc_id)-only relation of docs
    whose own per-doc verdict is keep (the text_quality_filter
    surviving set)."""
    from chiv_spark.queries.quality import domain_report_from_counts

    kept = (
        domain_report_from_counts(read_counts(spark, counts_dir))
        .filter(F.col("kept"))
        .select("source")
    )
    return (
        docs.join(F.broadcast(kept), "source")
        .join(doc_keep, "doc_id")
        .select("doc_id", "source", "lang")
    )


def delete_docs_counts(deleted_docs: DataFrame, counts_dir: str, batch_id: int) -> None:
    """GDPR-style forget on the counter store, expressed IN the
    monoid: a deletion writes the deleted documents' own counters
    NEGATED as one more generation — the read-time sum then equals
    the recompute without those documents, exactly (no tombstone
    filter, no rewrite; compaction later folds the negation away
    physically). ``deleted_docs`` is the (doc_id, text, source)
    relation of the docs to forget — the caller supplies what it is
    erasing, the store itself never held the documents. ``batch_id``
    is the caller's deletion-request id (>= 0, unique per request:
    replay of the same id overwrites, never double-subtracts — the
    same dynamic-overwrite idempotency contract as the fold); it is
    mapped into the reserved DELETE_BASE range so it can never
    collide with a stream generation or SEED_BATCH.

    FORMAT NOTE: the DELETE_BASE remapping is a store-format break
    versus the original scheme that wrote deletions under the raw
    request id. No store written under the old scheme persists (the
    layout ships fresh per store dir and nothing in-repo ever wrote
    the old format to a durable path), so no migration is shipped;
    if one ever surfaces, replaying a request id against it would
    leave the legacy raw-id negation in place AND write the remapped
    one — compact or rebuild such a store rather than replaying into
    it."""
    from chiv_spark.queries.quality import domain_counts

    if batch_id < 0:
        raise ValueError(
            f"deletion request id must be >= 0, got {batch_id}"
        )
    neg = domain_counts(deleted_docs).select(
        "source",
        "fingerprint",
        (-F.col("n")).alias("n"),
        (-F.col("k")).alias("k"),
    )
    write_counts_generation(neg, counts_dir, DELETE_BASE - int(batch_id))
