"""Streaming incremental IVFPQ index maintenance — the ANN analog of
the dedup-index fold (streaming/dedup_index.py), r9 verdict task 2.

Production shape: the vector index's FROZEN artifacts (cell
centroids + PQ codebooks, trained once on the resident base) live as
parquet; vector shards ARRIVE as a stream and each microbatch is
coarse-assigned and residual-encoded against the read-back artifacts
(similarity.ivfpq_encode_against — broadcast-only integer math, no
retraining, corpus untouched), then its code rows are appended to
the bucketed codes index. Why ``foreachBatch``: the index APPEND is
a side effect no declarative streaming operator expresses — the same
merge-into-index rationale as dedup_index.py and cdc.py; everything
inside the batch function is JVM DataFrame API.

The 100 TB layout, shared with the dedup index:

- **Bucketed**: code rows land under ``cell`` directory partitions —
  an ANN probe reads ONLY its probed cells' partitions (the
  PartitionFilters pruning is plan-pinned by
  tests/test_streaming.py::TestIvfpqFold).
- **Idempotent**: codes are written with dynamic partition overwrite
  keyed by ``src_batch`` — a replayed microbatch overwrites its own
  generation instead of appending twice (pytest'd).
- Compaction/tombstones generalize identically (the dedup_index
  machinery is the reference implementation; cells here play the pb
  role with natural rather than hashed keys).

Under ``trigger(availableNow=True)`` with the whole delta in one
batch the accumulated (vec_id, cell, q_err) relation equals the
batch query ``ann_ivfpq_incremental``'s, which is how the registry
row shares its DuckDB oracle verbatim.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chiv_spark.operators import similarity
from chiv_spark.streaming.dedup_index import SEED_BATCH

OUT_COLS = ["vec_id", "cell", "q_err"]
OUT_SCHEMA = "vec_id bigint, cell bigint, q_err bigint"


def write_codes_generation(codes: DataFrame, codes_dir: str, batch_id: int) -> None:
    """Persist one generation of PER-SUB code rows (vec_id, sub, code,
    qerr) under (cell, src_batch) directory partitions with dynamic
    overwrite — the replay-idempotency contract of
    dedup_index.write_index_generation on the ANN layout.

    Per-sub rows (not the per-vector q_err aggregate the fold
    previously stored — r11 ADVICE): the ADC probe joins on
    (cell, sub, code), so a SEARCHABLE index must persist the m code
    bytes per vector. ivfpq_search_index over read_codes_pruned runs
    directly against this layout; per-vector aggregates are derived
    at read time."""
    (
        codes.select(
            "vec_id", "sub", "code", "qerr", F.col("cell").cast("long").alias("cell")
        )
        .withColumn("src_batch", F.lit(int(batch_id)))
        # one file per (cell, src_batch) dir instead of one sliver per
        # upstream task per dir (guide §6 — see the suffix tier's
        # measured tiny-file cost); the pruned probe scan then opens
        # exactly one file per probed cell
        .repartition(F.col("cell"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell", "src_batch")
        .parquet(codes_dir)
    )


def agg_code_errors(rel: DataFrame) -> DataFrame:
    """(vec_id, cell, q_err): the per-vector quantization-error view
    of a per-sub codes relation — what the drift report and the
    incremental registry rows consume."""
    return (
        rel.groupBy("vec_id", "cell")
        .agg(F.sum("qerr").cast("long").alias("q_err"))
        .select("vec_id", F.col("cell").cast("long").alias("cell"), "q_err")
    )


def write_ivfpq_artifacts(
    base_emb: DataFrame, art_dir: str, dim: int, **kw
) -> None:
    """Train on the resident base and persist the frozen artifacts:
    ``<art_dir>/cents`` (cell, pos, cm) and ``<art_dir>/codebook``
    (sub, c, cvec) — n_cells × dim and m × n_codes × dim/m integers,
    KB-sized at any corpus scale."""
    from concurrent.futures import ThreadPoolExecutor

    cents, cb = similarity.ivfpq_artifacts(base_emb, dim=dim, **kw)
    # the two artifact writes are independent jobs (cents is a cheap
    # first-8-vectors scan, the codebook carries the train chain) —
    # overlap them so the small job back-fills the train's tail
    # (r18, guide §2.6); exceptions propagate through result()
    with ThreadPoolExecutor(max_workers=2) as pool:
        fa = pool.submit(
            lambda: cents.coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{art_dir.rstrip('/')}/cents")
        )
        fb = pool.submit(
            lambda: cb.coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{art_dir.rstrip('/')}/codebook")
        )
        fa.result()
        fb.result()


def read_codes_pruned(
    spark: SparkSession, codes_dir: str, cells: list[int]
) -> DataFrame:
    """The probe-side codes scan: only the directory partitions of the
    probed cells (PartitionFilters file skipping, plan-pinned) — what
    an ANN query reads from the grown index. Tombstoned (deleted)
    vectors are anti-joined out immediately, before compaction
    physically drops them — the dedup index's deletion contract."""
    from chiv_spark.streaming.dedup_index import (
        anti_join_tombstones,
        read_tombstones,
    )

    rel = spark.read.parquet(codes_dir).filter(
        F.col("cell").isin([int(c) for c in cells])
    )
    tomb = read_tombstones(spark, codes_dir)
    if tomb is not None:
        rel = anti_join_tombstones(rel, tomb, "vec_id")
    return rel


def delete_vectors(spark: SparkSession, codes_dir: str, vec_ids) -> None:
    """GDPR-style vector deletion against the codes index: tombstoned
    ids stop appearing in every read_codes_pruned scan immediately and
    their code rows are physically dropped at compact_codes."""
    from chiv_spark.streaming.dedup_index import write_tombstones

    write_tombstones(spark, codes_dir, vec_ids, id_col="vec_id")


def compact_codes(
    spark: SparkSession,
    codes_dir: str,
    committed_through: int | None = None,
    n_cells: int = 8,
) -> tuple[int, int]:
    """Fold the per-batch code generations into one file per cell and
    apply pending deletions — the dedup index's compaction lifecycle
    (streaming/dedup_index.py compact_index) on the (cell, src_batch)
    layout."""
    from chiv_spark.streaming.dedup_index import compact_index

    return compact_index(
        spark,
        codes_dir,
        committed_through=committed_through,
        id_col="vec_id",
        part_col="cell",
        n_parts=n_cells,
    )


def reencode_cells(
    spark: SparkSession,
    codes_dir: str,
    cells: list[int],
    codes_new: DataFrame,
    batch_id: int = SEED_BATCH,
) -> None:
    """Rewrite ONLY the given cells' partitions with re-encoded code
    rows, leaving every other cell's files untouched (byte-identical
    — the partition-scoped maintenance contract, pytest-pinned). The
    per-cell directory swap is the local-FS stand-in for a
    transactional format's partition-level rewrite commit, the
    compact_index precedent. The rewritten cells collapse to a single
    ``batch_id`` generation (default SEED_BATCH: maintenance
    re-encodes a cell's FULL membership, so its per-batch history is
    spent the same way compaction spends it)."""
    import os
    import shutil

    root = codes_dir.rstrip("/")
    staged = root + ".reencoding"
    (
        codes_new.filter(F.col("cell").isin([int(c) for c in cells]))
        .select(
            "vec_id", "sub", "code", "qerr", F.col("cell").cast("long").alias("cell")
        )
        .withColumn("src_batch", F.lit(int(batch_id)))
        .repartition(F.col("cell"))  # one file per rewritten cell dir
        .write.mode("overwrite")
        .partitionBy("cell", "src_batch")
        .parquet(staged)
    )
    for c in cells:
        old_dir = os.path.join(root, f"cell={int(c)}")
        new_dir = os.path.join(staged, f"cell={int(c)}")
        if os.path.isdir(old_dir):
            shutil.rmtree(old_dir)
        if os.path.isdir(new_dir):
            os.rename(new_dir, old_dir)
    shutil.rmtree(staged)


def maintain_codes(
    spark: SparkSession,
    codes_dir: str,
    art_dir: str,
    emb: DataFrame,
    dim: int = 64,
    m: int = 32,
    drift_num: int = 23,
    drift_den: int = 20,
) -> list[int]:
    """Drift-ACTING index maintenance (r10 verdict task 4): measure
    per-cell codebook drift from the PERSISTED index — streamed
    generations (src_batch > SEED_BATCH) vs the seed generation —
    and for cells whose arrival-cohort mean quantization error
    exceeds ``drift_num/drift_den`` × the resident cohort's (exact
    integer cross-multiplication, no float means), retrain codebooks
    on base+delta (= ``emb``), re-encode ONLY those cells' vectors,
    and swap only their partitions. Healthy cells' files stay
    byte-identical. The retrained codebook is persisted as
    ``<art_dir>/codebook_gen2`` alongside a ``<art_dir>/cell_versions``
    map (cell, ver) so a searcher can build its per-cell ADC LUTs
    against the codebook generation each cell is encoded under.
    Returns the retrained cell list.

    100 TB shape: the drift scan is one pruned aggregate over the
    codes index (KB per cell of state); retraining touches the
    broadcast-sized artifacts; the rewrite is bounded by the drifted
    cells' membership — the (cell, src_batch) layout makes every step
    partition-scoped, nothing corpus-wide."""
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    rel = spark.read.parquet(codes_dir)
    delta = F.col("src_batch") > SEED_BATCH
    perv = rel.groupBy("vec_id", "cell", delta.alias("is_delta")).agg(
        F.sum("qerr").alias("q")
    )
    stat = perv.groupBy("cell").agg(
        F.coalesce(F.sum((~F.col("is_delta")).cast("long")), F.lit(0)).alias("nb"),
        F.coalesce(F.sum(F.when(~F.col("is_delta"), F.col("q"))), F.lit(0)).alias("sb"),
        F.coalesce(F.sum(F.col("is_delta").cast("long")), F.lit(0)).alias("nd"),
        F.coalesce(F.sum(F.when(F.col("is_delta"), F.col("q"))), F.lit(0)).alias("sd"),
    )
    drifted = sorted(
        r.cell
        for r in stat.filter(
            (F.lit(int(drift_den)) * dec("sd") * dec("nb"))
            > (F.lit(int(drift_num)) * dec("sb") * dec("nd"))
        )
        .select("cell")
        .collect()
    )
    if not drifted:
        return []
    cents, cb_new = similarity.ivfpq_artifacts(emb, dim=dim, m=m)
    art = art_dir.rstrip("/")
    cb_new.coalesce(1).write.mode("overwrite").parquet(f"{art}/codebook_gen2")
    codes_new = similarity.ivfpq_encode_against(emb, cents, cb_new, dim=dim, m=m)
    reencode_cells(spark, codes_dir, drifted, codes_new)
    vers = spark.createDataFrame(
        [(int(c), 2) for c in drifted], "cell long, ver int"
    )
    vers.coalesce(1).write.mode("overwrite").parquet(f"{art}/cell_versions")
    return drifted


def ivfpq_fold_stream(
    spark: SparkSession,
    base_emb: DataFrame,
    emb_stream: DataFrame,
    work_dir: str,
    delta_predicate: Column | None = None,
    dim: int = 64,
    m: int = 32,
) -> DataFrame:
    """Run a bounded streaming incremental-index job: artifacts
    written once from ``base_emb``; each microbatch of the stream
    (optionally carved by ``delta_predicate``) encodes against the
    read-back artifacts and appends its code rows under
    (cell, src_batch) partitions with dynamic overwrite. Returns the
    accumulated per-vector (vec_id, cell, q_err) relation."""
    work = work_dir.rstrip("/")
    art_dir = f"{work}/artifacts"
    codes_dir = f"{work}/codes"
    ckpt_dir = f"{work}/ckpt"

    write_ivfpq_artifacts(base_emb, art_dir, dim=dim, m=m)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        delta = batch_df if delta_predicate is None else batch_df.filter(delta_predicate)
        # fresh artifact read per batch (tiny files; in production a
        # retrain job may swap them between batches)
        cents = spark.read.parquet(f"{art_dir}/cents")
        cb = spark.read.parquet(f"{art_dir}/codebook")
        codes = similarity.ivfpq_encode_against(delta, cents, cb, dim=dim, m=m)
        write_codes_generation(codes, codes_dir, batch_id)

    q = (
        emb_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # explicit missing-sink check (not a bare except): an unreadable
    # sink must raise, never silently report an empty index; remote
    # URI sinks resolve through the Hadoop FS API (r12 ADVICE)
    from chiv_spark.streaming.dedup_index import _dir_exists

    if not _dir_exists(spark, codes_dir):
        return spark.createDataFrame([], OUT_SCHEMA)
    # pending deletions apply to THIS read too, not only to
    # read_codes_pruned — a caller that ran delete_vectors mid-stream
    # must never get tombstoned vectors back (r10 ADVICE)
    from chiv_spark.streaming.dedup_index import (
        anti_join_tombstones,
        read_tombstones,
    )

    rel = spark.read.parquet(codes_dir)
    tomb = read_tombstones(spark, codes_dir)
    if tomb is not None:
        rel = anti_join_tombstones(rel, tomb, "vec_id")
    return agg_code_errors(rel)
