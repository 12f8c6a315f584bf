"""Distributed suffix ranking (operators/suffixes.py) vs brute force.

The oracle here is a quadratic pure-Python reference: a span repeats
iff the same token sequence occurs at >= 2 distinct (doc, position)
sites, overlapping and within-document occurrences included — the
ExactSubstr counting rule the DuckDB registry oracle also states.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from chiv_spark.operators.suffixes import max_repeated_spans, suffix_rank_tables, token_positions


def brute_spans(rows):
    toks = {d: t.split(" ") for d, t in rows}
    occ: dict[tuple, int] = {}
    for d, tk in toks.items():
        for i in range(len(tk)):
            for L in range(1, len(tk) - i + 1):
                occ[tuple(tk[i : i + L])] = occ.get(tuple(tk[i : i + L]), 0) + 1
    out = {}
    for d, tk in toks.items():
        best = 0
        for i in range(len(tk)):
            for L in range(best + 1, len(tk) - i + 1):
                if occ[tuple(tk[i : i + L])] >= 2:
                    best = L
        out[d] = (len(tk), best)
    return out


def run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: (r.n_tokens, r.max_rep_span) for r in max_repeated_spans(df).collect()
    }


class TestMaxRepeatedSpans:
    def test_cross_doc_within_doc_and_exact_dup(self, spark):
        rows = [
            (1, "a b c d e f g h"),
            (2, "x y z a b c d q"),  # shares "a b c d" with doc 1
            (3, "p q r p q r p q r"),  # internal stutter: 6-token repeat
            (4, "unique words only here"),
            (5, "x y z a b c d q"),  # exact dup of doc 2
        ]
        assert run(spark, rows) == brute_spans(rows)

    def test_overlapping_self_repeat_counts(self, spark):
        # "a a a a": positions 0 and 1 both start "a a a" — overlap is
        # a legitimate second site (suffix neighbors in rank order)
        rows = [(1, "a a a a"), (2, "b c")]
        got = run(spark, rows)
        assert got[1] == (4, 3)
        assert got[2] == (2, 0)

    def test_single_token_docs_and_empty_string(self, spark):
        # split("") -> [""] : one empty token; two such docs are exact
        # dups of span 1
        rows = [(1, ""), (2, ""), (3, "z"), (4, "z y")]
        got = run(spark, rows)
        assert got[1] == (1, 1) and got[2] == (1, 1)
        assert got[3] == (1, 1) and got[4][1] == 1  # "z" repeats across 3/4
        single = run(spark, [(9, "only")])
        assert single[9] == (1, 0)

    def test_long_shared_prefix_exercises_deep_rounds(self, spark):
        # 40-token shared prefix forces the doubling past k=32 — the
        # deep-round path the stable-partition early exit must not skip
        shared = " ".join(f"t{i}" for i in range(40))
        rows = [(1, shared + " endone x"), (2, shared + " endtwo y"), (3, "n m")]
        got = run(spark, rows)
        assert got[1] == (42, 40) and got[2] == (42, 40)

    def test_rank_tables_order_suffixes(self, spark):
        # final ranks must order the suffix multiset lexicographically
        rows = [(1, "b a c"), (2, "a c a")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        tables, maxlen = suffix_rank_tables(token_positions(df))
        _, final = tables[-1]
        ranked = {(r.doc_id, r.pos): r.r for r in final.collect()}
        toks = {d: t.split(" ") for d, t in rows}
        sufs = sorted(
            ((tuple(toks[d][p:]), (d, p)) for (d, p) in ranked), key=lambda x: x[0]
        )
        # equal suffixes share a rank; order of ranks == lexicographic
        expect_rank, prev = {}, None
        nxt = 0
        for s, key in sufs:
            if s != prev:
                nxt += 1
                prev = s
            expect_rank[key] = nxt
        assert ranked == expect_rank

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        data=st.lists(
            st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=8),
            min_size=1,
            max_size=4,
        )
    )
    def test_property_matches_bruteforce(self, spark, data):
        rows = [(i + 1, " ".join(tk)) for i, tk in enumerate(data)]
        assert run(spark, rows) == brute_spans(rows)


class TestEmptyCorpus:
    def test_empty_relation_yields_empty_result(self, spark):
        """A filtered-to-nothing corpus must compose, not crash with
        the int-vs-None TypeError of the unguarded loop bound (r10
        ADVICE): suffix_rank_tables returns the degenerate single
        empty table and max_repeated_spans an empty 4-column frame."""
        df = spark.createDataFrame([], "doc_id long, text string")
        tables, maxlen = suffix_rank_tables(token_positions(df))
        assert maxlen == 0 and len(tables) == 1
        assert tables[0][1].count() == 0
        out = max_repeated_spans(df)
        assert out.columns == ["doc_id", "n_tokens", "max_rep_span", "span_pos"]
        assert out.count() == 0


class TestScratchSpill:
    def test_scratch_dir_matches_checkpoint_path(self, spark, tmp_path):
        """The 100 TB spill path (r10 verdict task 5): with
        scratch_dir set, every round table is written to parquet and
        read back instead of localCheckpoint-pinned — results must be
        identical, and one parquet dir per doubling round (plus the
        rank-1 table) must exist on the scratch filesystem."""
        import os

        rows = [
            (1, "a b c d e f g h"),
            (2, "x y z a b c d q"),
            (3, "p q r p q r p q r"),
            (4, "x y z a b c d q"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        scratch = str(tmp_path / "rounds")
        os.makedirs(scratch)
        plain = {
            (r.doc_id, r.n_tokens, r.max_rep_span, r.span_pos)
            for r in max_repeated_spans(df).collect()
        }
        spilled = {
            (r.doc_id, r.n_tokens, r.max_rep_span, r.span_pos)
            for r in max_repeated_spans(df, scratch_dir=scratch).collect()
        }
        assert spilled == plain
        # the call spilled under its own unique subdir of the shared
        # root (r11 ADVICE: two calls sharing a root must never
        # overwrite each other's round tables)
        subs = sorted(d for d in os.listdir(scratch) if d.startswith("sfx-"))
        assert len(subs) == 1
        dirs = sorted(
            d
            for d in os.listdir(os.path.join(scratch, subs[0]))
            if d.startswith("rank_")
        )
        assert "rank_L1" in dirs and len(dirs) >= 3  # L1 + doubling rounds
        # a second call on the SAME root lands in a fresh subdir and
        # leaves the first call's tables untouched
        max_repeated_spans(df, scratch_dir=scratch).count()
        subs2 = sorted(d for d in os.listdir(scratch) if d.startswith("sfx-"))
        assert len(subs2) == 2 and subs[0] in subs2
        tables, _ = suffix_rank_tables(
            token_positions(df), scratch_dir=str(tmp_path / "r2")
        )
        # spilled tables scan from parquet: no RDD-checkpoint lineage
        _, final = tables[-1]
        assert "FileScan parquet" in final._jdf.queryExecution().executedPlan().toString()


class TestSpanArgmax:
    def test_leftmost_maximal_span_and_pos(self, spark):
        # doc 1: "a b c" repeats at pos 0 and pos 4 (leftmost wins);
        # doc 2 supplies the cross-doc twin
        rows = [(1, "a b c z a b c"), (2, "a b c y")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: (r.max_rep_span, r.span_pos) for r in max_repeated_spans(df).collect()}
        assert got[1] == (3, 0)
        assert got[2] == (3, 0)

    def test_no_repeat_reports_zero_pos(self, spark):
        rows = [(1, "q w e r t y")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        r = max_repeated_spans(df).collect()[0]
        assert (r.max_rep_span, r.span_pos) == (0, 0)

    def test_interior_span_position(self, spark):
        # shared run sits INSIDE doc 1 (pos 2) and at the head of doc 2
        rows = [(1, "x y a b c d z"), (2, "a b c d w")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: (r.max_rep_span, r.span_pos) for r in max_repeated_spans(df).collect()}
        assert got[1] == (4, 2)
        assert got[2] == (4, 0)
