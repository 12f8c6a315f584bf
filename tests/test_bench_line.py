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
