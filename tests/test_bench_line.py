"""The bench compact stdout line must stay parseable inside the
driver's 2000-char tail capture window. Round 14's line hit 2379
bytes at 75 headline rows and BENCH_r14.json came back parsed:null
despite the print-twice defense — so bench._compact_line now trims
``queries`` to the slowest rows until the line fits, and bench.main
hard-asserts the final length. These tests pin that contract without
running Spark."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _out(n_queries: int) -> dict:
    qs = {f"query_with_a_long_name_{i:03d}": round(0.1 * i, 3) for i in range(n_queries)}
    return {
        "metric": "headline_queries_total_wall",
        "value": round(sum(qs.values()), 3),
        "unit": "sec",
        "queries": qs,
        "sf": 0.1,
    }


class TestCompactLine:
    def test_small_output_passes_through_unchanged(self):
        out = _out(5)
        line = bench._compact_line(out)
        assert json.loads(line) == out

    def test_oversized_output_is_trimmed_to_fit(self):
        out = _out(200)  # far beyond any plausible headline count
        line = bench._compact_line(out)
        assert len(line) < 1900
        parsed = json.loads(line)
        # headline total survives exactly; truncation is explicit
        assert parsed["value"] == out["value"]
        assert parsed["queries_total"] == 200
        assert parsed["queries_shown"] == len(parsed["queries"]) < 200
        # the rows kept are the SLOWEST ones (the perf-relevant tail)
        kept_min = min(parsed["queries"].values())
        dropped = [
            v for k, v in out["queries"].items() if k not in parsed["queries"]
        ]
        assert all(v <= kept_min for v in dropped)

    def test_current_headline_count_fits(self):
        # r14 had 75 rows at ~2379B full; the trimmed line must fit
        # with today's real row names too, which this synthetic bound
        # over-approximates (names here are 25 chars, real max is
        # comparable). A regression that outgrows even trimming would
        # fail main()'s assert; this guards the helper's math.
        out = _out(120)
        assert len(bench._compact_line(out)) < 1900


class TestSweepCompaction:
    """tools/check_correctness.py's per-block compacted value check
    (r14 verdict task 7): at sf >= 0.1 the fuzzy join's 11M-row
    multiset compare collapses to per-block (count, dist-sum,
    hash-sum) aggregates. These pin that (a) the compacted relations
    agree between engines, (b) the check is BINDING — a single
    perturbed row flips it, (c) the threshold keeps the full compare
    at the small sweep SF."""

    def test_threshold_parses_sf_dirs(self):
        from tools.check_correctness import _COMPACT_MIN_SF, _sf_of

        assert _sf_of("/root/testdata/sf0.01") < _COMPACT_MIN_SF
        assert _sf_of("/root/testdata/sf0.001/") < _COMPACT_MIN_SF
        assert _sf_of("/root/testdata/sf0.1") >= _COMPACT_MIN_SF
        assert _sf_of("/root/testdata/sf1") >= _COMPACT_MIN_SF
        assert _sf_of("/weird/path") < _COMPACT_MIN_SF

    def test_compacted_sides_agree_and_check_is_binding(self, spark):
        import duckdb

        from chiv_spark.queries.base import REGISTRY
        from tools.check_correctness import (
            _fuzzy_compact_oracle,
            _fuzzy_compact_spark,
        )

        sf = "/root/testdata/sf0.001"
        spec = REGISTRY["join_fuzzy_levenshtein"]
        got = {
            tuple(r)
            for r in _fuzzy_compact_spark(spec.fn(spark, sf)).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW part AS SELECT * FROM '{sf}/part.parquet'"
        )
        want = {
            tuple(r)
            for r in con.execute(
                _fuzzy_compact_oracle(spec.oracle)
            ).fetchall()
        }
        assert got == want
        assert got  # non-vacuous
        # binding: perturb ONE row's dist on the oracle side — the
        # block's dist_sum AND hash_sum must both move
        tampered = f"""
        SELECT key_a, key_b, name_a, name_b,
               CASE WHEN ROW_NUMBER() OVER (ORDER BY key_a, key_b) = 1
                    THEN dist + 1 ELSE dist END AS dist
        FROM ({spec.oracle})
        """
        bad = {
            tuple(r)
            for r in con.execute(_fuzzy_compact_oracle(tampered)).fetchall()
        }
        assert bad != got
        # binding on DROPPED rows too (r15 verdict task 7): remove a
        # single pair — n_pairs, dist_sum and h_sum all move for its
        # block, so the compacted compare catches a silently-missing
        # row exactly like a perturbed one
        dropped = f"""
        SELECT * FROM (
            SELECT key_a, key_b, name_a, name_b, dist,
                   ROW_NUMBER() OVER (ORDER BY key_a, key_b) AS rn
            FROM ({spec.oracle})
        ) WHERE rn > 1
        """
        dropped_q = _fuzzy_compact_oracle(
            f"SELECT key_a, key_b, name_a, name_b, dist FROM ({dropped})"
        )
        short = {tuple(r) for r in con.execute(dropped_q).fetchall()}
        assert short != got

    def test_null_fields_hash_identically_on_both_sides(self, spark):
        """A NULL field must hash to the SAME sentinel value on both
        engines (r15 advice, check_correctness.py:112): Spark's
        concat_ws silently skips NULLs while DuckDB's || nulls the
        whole expression and SUM drops it — both sides now coalesce
        every field to '<null>' so a future nullable column fails the
        compare loudly instead of diverging asymmetrically."""
        import duckdb
        import pandas as pd

        from tools.check_correctness import (
            _fuzzy_compact_oracle,
            _fuzzy_compact_spark,
        )

        pdf = pd.DataFrame(
            {
                "key_a": [1, 2, 3],
                "key_b": [10, 20, 30],
                "name_a": ["alpha blue", None, "gamma blue"],
                "name_b": ["x", "y", None],
                "dist": [1, 2, 3],
            }
        )
        sdf = spark.createDataFrame(pdf)
        got = {tuple(r) for r in _fuzzy_compact_spark(sdf).collect()}
        con = duckdb.connect()
        con.register("fz", pdf)
        want = {
            tuple(r)
            for r in con.execute(
                _fuzzy_compact_oracle("SELECT * FROM fz")
            ).fetchall()
        }
        assert got == want
        assert got  # non-vacuous
