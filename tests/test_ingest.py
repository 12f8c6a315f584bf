"""The composed delta-cost ingest capstone's contracts (r15 verdict
task 1) — what the oracle sweep can't see:

1. NO stage re-reads resident corpus text: after seeding, the source
   corpus's resident rows are CORRUPTED on disk and the ingest
   result is byte-identical (base contributions come from the
   persisted indexes + the state's own doc-store).
2. Cross-batch: folding shard A into the state makes shard B dedup
   against A through the INDEXES (a B-doc near-dupping an A-doc
   flips f3 only after the fold) — never a cross-batch join.
3. The card is a counter-monoid fold: after folding A, the resident
   counts equal seed + A's generation, and the shard column carries
   B's own funnel.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from chiv_spark.queries.ingest import (
    fold_shard,
    seed_ingest_state,
    shard_flags,
    updated_card,
)

#: ~30 distinct tokens per doc: enough for 3-word shingles and 8-token
#: windows, no internal repeats (suffix stage keeps everything)
def _text(seed: str) -> str:
    return " ".join(f"{seed}tok{i}" for i in range(30))


@pytest.fixture(scope="class")
def tiny_state(spark):
    """base d1..d4 seeded; shard A = {d10, d11}; shard B = {d20 (verbatim
    near-dup of d10 — NOT of any base doc), d21 (clean)}."""
    base = spark.createDataFrame(
        [(i, _text(f"base{i}")) for i in (1, 2, 3, 4)], "doc_id long, text string"
    )
    a = spark.createDataFrame(
        [(10, _text("ashard")), (11, _text("aclean"))], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(20, _text("ashard")), (21, _text("bclean"))], "doc_id long, text string"
    )
    keepers = {
        m: spark.createDataFrame(
            [(i, i, 1) for i in range(60)],
            "media_id long, cluster_id long, cluster_size long",
        )
        for m in ("img", "aud", "vid")
    }
    state = tempfile.mkdtemp(prefix="chiv-ingest-test-")
    seed_ingest_state(spark, base, keepers, state)
    yield {"base": base, "a": a, "b": b, "state": state}
    shutil.rmtree(state, ignore_errors=True)


class TestCrossBatchIngest:
    def test_pre_fold_shard_b_sees_only_base(self, spark, tiny_state):
        flags = {
            r["doc_id"]: r.asDict()
            for r in shard_flags(spark, tiny_state["b"], tiny_state["state"]).collect()
        }
        # d20 duplicates an A doc that is NOT folded yet -> clean
        assert flags[20]["f3"] is True
        assert flags[21]["f3"] is True

    def test_fold_then_cross_batch_dedup(self, spark, tiny_state):
        fold_shard(spark, tiny_state["a"], tiny_state["state"], batch_id=1)
        flags = {
            r["doc_id"]: r.asDict()
            for r in shard_flags(spark, tiny_state["b"], tiny_state["state"]).collect()
        }
        # d20 is a verbatim dup of folded d10: near-dup flag flips
        # (f3 false) AND paragraph tier drops its chunks (f1 false —
        # d10's fingerprints are in the index with the smaller site)
        assert flags[20]["f3"] is False
        assert flags[20]["f1"] is False
        # the clean B doc is untouched by the fold
        assert flags[21]["f3"] is True and flags[21]["f1"] is True

    def test_card_is_a_counter_fold(self, spark, tiny_state):
        # runs after the fold above (same class-scoped state): the
        # resident column = seed (4 docs) + folded A (2 docs)
        card = {
            r["stage"]: r.asDict()
            for r in updated_card(spark, tiny_state["b"], tiny_state["state"]).collect()
        }
        assert card["0_total"]["n_surviving_resident"] == 6
        assert card["0_total"]["n_surviving_arrived"] == 2
        assert card["0_total"]["n_surviving_total"] == 8
        # B's funnel in the arrived column: d20 fell at stage 1
        # (paragraph) so stage-6 survivors among arrivals <= 1
        assert card["6_media_linkage"]["n_surviving_arrived"] <= 1
        # media rows: full-universe keepers, zero shard contribution
        assert card["7_image_canonical"]["n_surviving_resident"] == 60
        assert card["7_image_canonical"]["n_surviving_arrived"] == 0


class TestNoResidentTextReread:
    def test_source_corruption_does_not_change_ingest(self, spark, tmp_path):
        """Seed from a corpus COPY, corrupt every resident row's text
        on disk, re-run the ingest reading the corrupted source: the
        flags are identical, so no stage read resident text from the
        source after seeding (suffix twins come from the state's own
        doc-store)."""
        from chiv_spark.queries.ingest import _fate_col

        src = "/root/testdata/sf0.001/documents.parquet"
        work = str(tmp_path / "docs.parquet")
        shutil.copy(src, work)
        docs = spark.read.parquet(work).select("doc_id", "text")
        resident = docs.filter(_fate_col() != 0)
        shard = docs.filter(_fate_col() == 0)
        keepers = {
            m: spark.createDataFrame(
                [(i, i, 1) for i in range(60)],
                "media_id long, cluster_id long, cluster_size long",
            )
            for m in ("img", "aud", "vid")
        }
        state = tempfile.mkdtemp(prefix="chiv-ingest-corrupt-")
        try:
            seed_ingest_state(spark, resident, keepers, state)
            before = {
                r["doc_id"]: tuple(r)
                for r in shard_flags(spark, shard, state).collect()
            }
            # corrupt resident text in the source (shard rows intact),
            # atomically replacing the parquet file
            corrupted = docs.select(
                "doc_id",
                F.when(_fate_col() != 0, F.lit("CORRUPTED"))
                .otherwise(F.col("text"))
                .alias("text"),
            ).toPandas()
            import pyarrow as pa
            import pyarrow.parquet as pq

            pq.write_table(pa.Table.from_pandas(corrupted), work)
            docs2 = spark.read.parquet(work).select("doc_id", "text")
            spark.catalog.clearCache()
            shard2 = docs2.filter(_fate_col() == 0)
            after = {
                r["doc_id"]: tuple(r)
                for r in shard_flags(spark, shard2, state).collect()
            }
            assert before == after
            assert before  # non-vacuous
        finally:
            shutil.rmtree(state, ignore_errors=True)
