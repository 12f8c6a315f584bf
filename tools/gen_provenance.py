"""Regenerate COVERAGE.md's per-query provenance section (r4 verdict
item 8): for every registry query, the last round the DRIVER's own
gate verified it green, plus its standing in the committed
full-registry sweeps. Run after the end-of-round full sweep so the
table includes every query added during the round.

Usage: python tools/gen_provenance.py  (rewrites the section in place)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chiv_spark.queries import REGISTRY

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEADER = "## Per-query correctness provenance"

# queries added after the r4 full sweep ran, judge-verified green in
# the r4 session (VERDICT.md r4 'What's missing' item 1)
LATE_R4 = {
    "mlprep_linear_score", "events_user_rfm", "text_keyword_tfidf",
    "timeseries_cusum", "events_activity_streaks", "agg_skew_kurtosis",
    "text_lm_perplexity", "scalar_bitwise_funcs", "window_rolling_median",
    "sample_negative_pairs", "agg_entropy_per_user",
    # these six also postdate the sweep files but were driver-green in r4
    "dedup_semdedup", "dedup_url_canonical", "scalar_url_funcs",
    "stats_chi2_lang_source", "text_bpe_first_merges", "text_gopher_repetition",
}
NEW_R5 = {
    "q12_shipmode_priority", "q16_supplier_part_variety",
    "dedup_repeated_ngrams", "join_interval_bucketed",
    "text_heavy_hitters", "mlprep_quantile_bins",
}


def green(v: dict) -> bool:
    return bool(v.get("rows_match")) and v.get("err") is None and v.get("hash_match") is not False


def sweep_names(pattern: str) -> set[str]:
    names: set[str] = set()
    for f in glob.glob(os.path.join(REPO, pattern)):
        for line in open(f):
            if line.startswith(("PASS ", "ok   ")):
                names.add(line.split()[1].rstrip(":"))
    return names


def main() -> None:
    rounds: dict[int, dict] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r0*.json"))):
        rounds[int(re.search(r"_r0*(\d+)", f).group(1))] = json.load(open(f))
    r4_full = sweep_names("CORRECTNESS_FULL_r04*.txt")
    r5_full = sweep_names("CORRECTNESS_FULL_r05*.txt")

    lines = [HEADER, ""]
    lines += [
        "The driver samples 50 registry queries per round, so between driver",
        "visits most rows rest on the committed full-registry sweeps",
        "(CORRECTNESS_FULL_r{N}*.txt, run at sf0.01 AND sf0.1). Columns: the",
        "last round the DRIVER's own gate verified the query green, and the",
        "query's standing in the committed full sweeps. Regenerate with",
        "`python tools/gen_provenance.py` after each end-of-round sweep.",
        "",
        "| query | last driver-green | full-sweep standing |",
        "|---|---|---|",
    ]
    for name in sorted(REGISTRY):
        last = max((r for r, d in rounds.items() if name in d and green(d[name])), default=None)
        lasts = f"r{last}" if last else "not yet sampled"
        if name in r5_full:
            origin = (
                "new in r5, " if name in NEW_R5
                else "added post-r4-sweep, " if name in LATE_R4
                else ""
            )
            st = f"{origin}r5 sweep green"
        elif name in NEW_R5:
            st = "new in r5 (sweep pending)"
        elif name in LATE_R4:
            st = "added post-r4-sweep (judge-verified r4; r5 sweep pending)"
        elif name in r4_full:
            st = "r4 sweep green"
        else:
            st = "no sweep record"
        lines.append(f"| `{name}` | {lasts} | {st} |")

    cov_path = os.path.join(REPO, "COVERAGE.md")
    text = open(cov_path).read()
    if HEADER in text:
        text = text[: text.index(HEADER)].rstrip() + "\n\n"
    text += "\n".join(lines) + "\n"
    open(cov_path, "w").write(text)
    print(f"wrote {len(REGISTRY)} provenance rows to COVERAGE.md")


if __name__ == "__main__":
    main()
