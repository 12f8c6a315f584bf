"""Fuzzy-matching composition tests (r15 verdict tasks 2 and 5).

The sweep already proves each registered row equals its oracle; these
pin the COMPOSITION contracts the sweep can't see: the autotune-wired
row really runs at the pick the dial computes, and the cluster
formulation's assignment invariants + the >= 95% member-recall gate
hold where pair-capping provably collapsed (0.1% pair recall at
cap=64/sf0.1, SCALING.md curve).
"""

from __future__ import annotations

import duckdb

from chiv_spark.queries import REGISTRY
from chiv_spark.queries.fuzzy import (
    _FZ_CAP,
    _MAX_DIST,
    _autotuned_pick,
    capped_fuzzy_pairs,
    fuzzy_cluster_assign,
)
from tests.conftest import SF0001, SF001


def _oracle_con(sf_dir: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{sf_dir}/part.parquet'")
    return con


class TestAutotunedCapJoin:
    def test_pick_matches_the_autotune_relation(self, spark):
        cap, meets = _autotuned_pick(spark, SF0001)
        rows = REGISTRY["join_fuzzy_cap_autotune"].fn(spark, SF0001).collect()
        rec = [r for r in rows if r["recommended"]]
        assert len(rec) == 1
        assert (cap, meets) == (rec[0]["cap"], rec[0]["meets_target"])

    def test_composed_row_runs_at_the_picked_cap(self, spark):
        cap, meets = _autotuned_pick(spark, SF0001)
        got = REGISTRY["join_fuzzy_at_autotuned_cap"].fn(spark, SF0001)
        rows = got.collect()
        assert rows, "composed row must be non-vacuous at sf0.001"
        assert {r["cap_used"] for r in rows} == {cap}
        assert {r["meets_target"] for r in rows} == {meets}
        want = {
            (r["key_a"], r["key_b"], r["dist"])
            for r in capped_fuzzy_pairs(spark, SF0001, cap).collect()
        }
        assert {(r["key_a"], r["key_b"], r["dist"]) for r in rows} == want


class TestClusterAssign:
    def test_assignment_invariants(self, spark):
        rows = fuzzy_cluster_assign(spark, SF0001, _FZ_CAP).collect()
        parts = [r["member_key"] for r in rows]
        assert len(parts) == len(set(parts)), "exactly one row per member"
        for r in rows:
            if r["assigned"]:
                assert r["dist_to_rep"] is not None
                assert r["dist_to_rep"] <= _MAX_DIST
            else:
                # singleton: its own cluster, no distance
                assert r["rep_key"] == r["member_key"]
                assert r["dist_to_rep"] is None
            if r["is_rep"]:
                # a rep always matches itself at distance 0 (possibly
                # claimed by a more senior same-name rep, still dist 0)
                assert r["assigned"] and r["dist_to_rep"] == 0

    def test_rep_count_bounded_by_cap(self, spark):
        import collections

        rows = fuzzy_cluster_assign(spark, SF0001, _FZ_CAP).collect()
        per_block = collections.Counter(
            (r["block"], r["len_band"]) for r in rows if r["is_rep"]
        )
        assert per_block and all(v <= _FZ_CAP for v in per_block.values())


class TestClusterRecallGate:
    def test_member_recall_gate_holds_at_sf001(self, spark):
        """The r15 verdict task-2 gate: >= 95% of true-partnered
        members land in a multi-member cluster at sf0.01 — measured
        1.0 at BOTH SFs (near-clique blocks: a member is within
        distance 3 of essentially any representative), vs 0.1% PAIR
        recall at the same cap (SCALING.md fuzzy curve)."""
        row = REGISTRY["join_fuzzy_cluster_recall"].fn(spark, SF001).collect()
        assert len(row) == 1
        r = row[0]
        assert r["meets_gate"] is True
        assert r["n_recovered_true"] * 100 >= r["n_true_members"] * 95
        assert r["n_true_members"] > 0

    def test_gate_is_integer_and_cross_engine(self, spark):
        """The gate must be the same integer comparison in DuckDB."""
        spec = REGISTRY["join_fuzzy_cluster_recall"]
        con = _oracle_con(SF001)
        want = con.execute(spec.oracle).fetchall()
        got = [tuple(r) for r in spec.fn(spark, SF001).collect()]
        assert got == [tuple(w) for w in want]
