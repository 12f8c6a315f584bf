"""Streaming incremental ExactSubstr against the persisted window
index — the suffix tier's fold twin (every other incremental dedup
tier — MinHash, embedding, paragraph, bloom — already has one).

Shape: the corpus's 8-gram window index (operators/suffixes.py
``window_index``: per-doc occurrence counts, pb-bucketed on hash(w))
is seeded once from the resident base; each arriving microbatch is
span-checked and trimmed against the pb-PRUNED index through the
SHARED ``incremental_span_trim`` core (one implementation with the
batch registry query — the two cannot drift), then the batch's own
windows fold into the index and its raw text into a doc store so
later batches catch cross-batch repeats THROUGH the index — never a
cross-batch join.

Why a doc store alongside the index: pigeonhole makes {delta
candidates + index twins} a complete detector subcorpus, but the
suffix detector needs the twin documents' full TOKEN SEQUENCES, not
just their window counts — in production that is one pruned read of
the corpus table; here arrived generations persist next to the index
(the resident base stays a static relation). Only twin docs' text is
ever re-read.

foreachBatch conventions are the dedup_index ones: dynamic partition
overwrite keyed on src_batch for replay idempotence, each batch's
index read excluding its own generation, bounded touched-bucket
collect (≤ WINDOW_PB values). Under availableNow with the whole
delta in one batch the result equals the batch query's relation, so
the registry twins share their DuckDB oracle verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chiv_spark.operators.suffixes import incremental_span_trim, window_index
from chiv_spark.streaming.dedup_index import SEED_BATCH, _dir_exists

OUT_COLS = ["doc_id", "n_tokens", "span_ge8", "trimmed_text", "keep"]
OUT_SCHEMA = (
    "doc_id bigint, n_tokens bigint, span_ge8 bigint,"
    " trimmed_text string, keep boolean"
)


def _write_gen(rel: DataFrame, out_dir: str, batch_id: int, parts: list[str]) -> None:
    (
        rel.withColumn("src_batch", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*parts, "src_batch")
        .parquet(out_dir)
    )


def incremental_exact_substr_stream(
    spark: SparkSession,
    base_docs: DataFrame,
    doc_stream: DataFrame,
    work_dir: str,
    threshold: int,
    delta_predicate: Column | None = None,
    scratch_dir: str | None = None,
) -> DataFrame:
    """Run the bounded streaming incremental-ExactSubstr job; returns
    the accumulated per-arrival (doc_id, n_tokens, span_ge8,
    trimmed_text, keep) relation read back from the sink."""
    work = work_dir.rstrip("/")
    index_dir = f"{work}/winidx"
    docs_dir = f"{work}/docs"
    out_dir = f"{work}/out"
    ckpt_dir = f"{work}/ckpt"

    _write_gen(window_index(base_docs), index_dir, SEED_BATCH, ["pb"])

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        delta = (
            batch_df if delta_predicate is None else batch_df.filter(delta_predicate)
        ).select("doc_id", "text")
        dwin = window_index(delta).persist()
        touched = [r.pb for r in dwin.select("pb").distinct().collect()]
        if touched:
            idx = spark.read.parquet(index_dir).filter(
                F.col("pb").isin([int(x) for x in touched])
                & (F.col("src_batch") != int(batch_id))
            )
            if _dir_exists(spark, docs_dir):
                arrived = (
                    spark.read.parquet(docs_dir)
                    .filter(F.col("src_batch") != int(batch_id))
                    .select("doc_id", "text")
                )
            else:
                arrived = spark.createDataFrame([], "doc_id bigint, text string")
            resident = base_docs.select("doc_id", "text").unionByName(arrived)
            out = incremental_span_trim(
                delta, dwin, idx, resident, threshold, scratch_dir=scratch_dir
            )
        else:
            # r13 ADVICE (medium): window_index drops sub-WINDOW_N-token
            # docs, so a microbatch whose delta is ALL such docs has an
            # empty dwin. Skipping the output write here would silently
            # drop those arrivals from the returned relation, while the
            # batch twin's incremental_span_trim emits them through its
            # non-candidate branch — the "shared core" twins would
            # diverge. Emit the same out_non-shaped rows; nothing folds
            # (a sub-8-token doc has no windows, so it can never be a
            # later arrival's twin and its text need not persist).
            out = delta.select(
                "doc_id",
                F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
                F.lit(0).cast("long").alias("span_ge8"),
                F.col("text").alias("trimmed_text"),
                F.lit(True).alias("keep"),
            )
        _write_gen(out, out_dir, batch_id, [])
        if touched:
            # AFTER the output action: fold this batch's windows and
            # text in, so a replay's excluded-own-generation read and
            # the dynamic overwrite keep the run idempotent
            _write_gen(dwin, index_dir, batch_id, ["pb"])
            _write_gen(delta, docs_dir, batch_id, [])
        dwin.unpersist()

    q = (
        doc_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not _dir_exists(spark, out_dir):
        return spark.createDataFrame([], OUT_SCHEMA)
    # explicit schema: a batch whose delta was EMPTY writes a file-less
    # sink directory (dynamic overwrite of zero rows), which schema
    # inference rejects — that is a legitimately empty result, not a
    # corrupt sink, so read it as such
    return spark.read.schema(f"{OUT_SCHEMA}, src_batch bigint").parquet(
        out_dir
    ).select(*OUT_COLS)
