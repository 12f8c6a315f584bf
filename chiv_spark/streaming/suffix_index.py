"""Streaming incremental ExactSubstr against the persisted window
index — the suffix tier's fold twin (every other incremental dedup
tier — MinHash, embedding, paragraph, bloom — already has one).

Shape: the corpus's 8-gram window index (operators/suffixes.py
``window_index``: per-doc occurrence counts keyed by the window's
xxhash64, pb-bucketed on pmod(wh, WINDOW_PB))
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

from chiv_spark.operators.suffixes import (
    WINDOW_PB,
    incremental_span_trim,
    window_index,
)
from chiv_spark.streaming.dedup_index import (
    SEED_BATCH,
    _dir_exists,
    anti_join_tombstones,
    compact_index,
    read_index_pruned,
    read_tombstones,
    write_tombstones,
)

OUT_COLS = ["doc_id", "n_tokens", "span_ge8", "trimmed_text", "keep"]
OUT_SCHEMA = (
    "doc_id bigint, n_tokens bigint, span_ge8 bigint,"
    " trimmed_text string, keep boolean"
)

#: directory-partition fan-out of the DOC STORE on pmod(doc_id, P) —
#: gives the store the same bucketed/compactable layout as the window
#: index so one compaction lifecycle (compact_index) serves both
DOC_PB = 16

#: explicit read schemas: both stores can be legitimately EMPTY after
#: a forget-everything compaction (a file-less dir schema inference
#: rejects), and the GDPR lifecycle must survive that state
WINIDX_SCHEMA = "doc_id bigint, wh bigint, cnt bigint, pb int, src_batch int"
DOCS_SCHEMA = "doc_id bigint, text string, pb int, src_batch int"

#: window-index dirs already verified non-legacy this process (the
#: check costs a schema inference — one footer read — per store)
_WINIDX_LAYOUT_OK: set = set()


def _check_winidx_layout(spark: SparkSession, index_dir: str) -> None:
    """Fail LOUDLY on a pre-r17 window-index layout (r17 advice): the
    r17 format keyed windows by ``wh bigint`` (xxhash64) instead of
    the joined window string ``w``. Reading an old store with the new
    explicit schema would silently fill ``wh`` with nulls — index
    joins then match nothing and incremental dedup silently misses
    every resident duplicate. Detect the legacy column and raise with
    re-seed instructions instead."""
    if index_dir in _WINIDX_LAYOUT_OK:
        return
    try:
        names = set(spark.read.parquet(index_dir).schema.names)
    except Exception:  # noqa: BLE001 — empty/missing store: nothing to check
        _WINIDX_LAYOUT_OK.add(index_dir)
        return
    if "w" in names and "wh" not in names:
        raise ValueError(
            f"window index at {index_dir} uses the pre-r17 string-keyed "
            "layout (column 'w'); the engine now keys windows by xxhash64 "
            "('wh'). Re-seed the store (seed_suffix_store / the streaming "
            "fold) from the corpus — reading it as-is would silently "
            "nominate zero twins."
        )
    _WINIDX_LAYOUT_OK.add(index_dir)


def _doc_pb():
    return F.pmod(F.col("doc_id"), F.lit(DOC_PB)).cast("int")


def read_doc_store(
    spark: SparkSession, docs_dir: str, exclude_batch: int | None = None
) -> DataFrame:
    """The doc store's visible (doc_id, text) relation: all persisted
    generations minus the reader's own (replay guard) minus any
    tombstoned ids whose generation falls inside the tombstone's
    scope — a GDPR-style forget takes effect at READ time, before
    compaction physically drops the text (r13 verdict task 3: raw
    document text is the most sensitive store the lifecycle guards)."""
    rel = spark.read.schema(DOCS_SCHEMA).parquet(docs_dir)
    if exclude_batch is not None:
        rel = rel.filter(F.col("src_batch") != int(exclude_batch))
    tomb = read_tombstones(spark, docs_dir)
    if tomb is not None:
        rel = anti_join_tombstones(rel, tomb, "doc_id")
    return rel.select("doc_id", "text")


def suffix_forget(spark: SparkSession, work_dir: str, doc_ids) -> None:
    """GDPR-style forget across BOTH of the suffix tier's persisted
    stores: the window index (the doc's 8-gram counts stop nominating
    it as a twin) and the doc store (its raw text is never re-read).
    Generation-scoped tombstones (dedup_index.write_tombstones), so a
    re-ingest of the same id after the delete lands in a later
    generation and stays visible; compact_suffix_store physically
    drops the suppressed rows from both stores."""
    from concurrent.futures import ThreadPoolExecutor

    work = work_dir.rstrip("/")
    # two independent tiny writes to disjoint dirs — overlap them
    # (guide §2.6); exceptions propagate through result()
    with ThreadPoolExecutor(max_workers=2) as pool:
        fa = pool.submit(write_tombstones, spark, f"{work}/winidx", doc_ids)
        fb = pool.submit(write_tombstones, spark, f"{work}/docs", doc_ids)
        fa.result()
        fb.result()


def seed_suffix_store(spark: SparkSession, docs: DataFrame, work_dir: str) -> None:
    """Persist a corpus snapshot as the suffix tier's generation-SEED
    state: its window index under pb(hash(w)) buckets and its raw
    text under pb(doc_id) buckets — what a production pipeline has on
    disk before any arrival, and the store the deletion lifecycle
    operates on."""
    from concurrent.futures import ThreadPoolExecutor

    work = work_dir.rstrip("/")
    # seeding into a PRE-EXISTING legacy store would dynamic-overwrite
    # only the seed generation and leave string-keyed generations in
    # place — check before writing (no-op for the usual fresh dir)
    _check_winidx_layout(docs.sparkSession, f"{work}/winidx")
    # the two seed writes land in disjoint dirs — overlap them (guide
    # §2.6; the doc-store write back-fills the window aggregation's
    # tail); exceptions propagate through result()
    with ThreadPoolExecutor(max_workers=2) as pool:
        fa = pool.submit(
            _write_gen, window_index(docs), f"{work}/winidx", SEED_BATCH, ["pb"]
        )
        fb = pool.submit(
            _write_gen,
            docs.select("doc_id", "text").withColumn("pb", _doc_pb()),
            f"{work}/docs",
            SEED_BATCH,
            ["pb"],
        )
        fa.result()
        fb.result()
    # this process just wrote the current layout: probes can skip the
    # legacy-layout schema inference (a directory-discovery job)
    _WINIDX_LAYOUT_OK.add(f"{work}/winidx")


def probe_suffix_store(
    spark: SparkSession,
    delta: DataFrame,
    work_dir: str,
    threshold: int,
    scratch_dir: str | None = None,
) -> DataFrame:
    """Span-check and trim an arriving shard against the PERSISTED
    suffix store (window index + doc store), honoring pending
    tombstones on both reads — the probe half of the deletion
    lifecycle: a tombstoned doc's windows no longer nominate twins
    and its text is never re-read. Shares incremental_span_trim with
    the batch and streaming rows, so the three cannot drift."""
    work = work_dir.rstrip("/")
    delta = delta.select("doc_id", "text")
    dwin = window_index(delta).persist()
    touched = [r.pb for r in dwin.select("pb").distinct().collect()]
    if not touched:
        out = delta.select(
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
            F.lit(0).cast("long").alias("span_ge8"),
            F.col("text").alias("trimmed_text"),
            F.lit(True).alias("keep"),
        )
        dwin.unpersist()
        return out
    _check_winidx_layout(spark, f"{work}/winidx")
    idx = read_index_pruned(
        spark, f"{work}/winidx", touched, id_col="doc_id", schema=WINIDX_SCHEMA
    )
    resident = read_doc_store(spark, f"{work}/docs")
    out = incremental_span_trim(
        delta, dwin, idx, resident, threshold, scratch_dir=scratch_dir
    )
    dwin.unpersist()
    return out


def compact_suffix_store(
    spark: SparkSession, work_dir: str, committed_through: int | None = None
) -> tuple[tuple[int, int], tuple[int, int]]:
    """Fold both stores' generations and PHYSICALLY drop tombstoned
    rows — window counts and raw text (the one store where 'physically
    dropped' is a privacy obligation, not just hygiene). Returns the
    (files_before, files_after) pair per store."""
    work = work_dir.rstrip("/")
    widx = compact_index(
        spark, f"{work}/winidx", committed_through, id_col="doc_id",
        part_col="pb", n_parts=WINDOW_PB,
    )
    docs = compact_index(
        spark, f"{work}/docs", committed_through, id_col="doc_id",
        part_col="pb", n_parts=DOC_PB,
    )
    return widx, docs


def _write_gen(rel: DataFrame, out_dir: str, batch_id: int, parts: list[str]) -> None:
    rel = rel.withColumn("src_batch", F.lit(int(batch_id)))
    if parts:
        # cluster rows by the directory-partition key before the write
        # (guide §6 output sizing): without this every upstream task
        # writes a sliver into every pb dir — measured at sf0.1, one
        # window-index generation wrote 64 tasks x 16 dirs ≈ 1,000
        # tiny files in 3.4 s vs 16 files in 0.65 s repartitioned, and
        # every later pruned read pays the file-count again. One file
        # per (pb, src_batch) dir; at 100 TB the bucket count is
        # thousands, so the write still fans wide.
        rel = rel.repartition(*[F.col(p) for p in parts])
    (
        rel.write.mode("overwrite")
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

    # a pre-existing work_dir may hold a pre-r17 string-keyed index;
    # the seed's dynamic overwrite would leave its old generations in
    # place — fail loudly before folding anything into it
    _check_winidx_layout(spark, index_dir)
    _write_gen(window_index(base_docs), index_dir, SEED_BATCH, ["pb"])

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        delta = (
            batch_df if delta_predicate is None else batch_df.filter(delta_predicate)
        ).select("doc_id", "text")
        dwin = window_index(delta).persist()
        touched = [r.pb for r in dwin.select("pb").distinct().collect()]
        if touched:
            # pruned + tombstone-aware reads (r13 verdict task 3):
            # a suffix_forget issued between batches takes effect on
            # the NEXT batch's index probe and twin-text read
            idx = read_index_pruned(
                spark, index_dir, touched, exclude_batch=batch_id,
                id_col="doc_id", schema=WINIDX_SCHEMA,
            )
            if _dir_exists(spark, docs_dir):
                arrived = read_doc_store(spark, docs_dir, exclude_batch=batch_id)
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
            # the dynamic overwrite keep the run idempotent; the doc
            # store shares the window index's bucketed layout (pb on
            # doc_id) so compact_suffix_store serves both. The two
            # folds land in disjoint dirs — overlapped (guide §2.6)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=2) as pool:
                fa = pool.submit(_write_gen, dwin, index_dir, batch_id, ["pb"])
                fb = pool.submit(
                    _write_gen,
                    delta.withColumn("pb", _doc_pb()),
                    docs_dir,
                    batch_id,
                    ["pb"],
                )
                fa.result()
                fb.result()
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
