"""Regenerate COVERAGE.md's per-query provenance section (r4 verdict
item 8): for every registry query, the last round the DRIVER's own
gate verified it green, plus its standing in the committed
full-registry sweeps. Run after the end-of-round full sweep so the
table includes every query added during the round.

Round membership is derived from the sweep artifacts themselves (the
first CORRECTNESS_FULL_r0N*.txt a name appears in), not from
hand-maintained per-round name sets — the r5 ADVICE found the old
hard-coded LATE_R4/NEW_R5 sets would mislabel every future round's
additions and invite stale provenance.

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

#: paths whose tree must be IDENTICAL between the swept commit and the
#: current state for the sweep artifacts to stand as evidence
CODE_PATHS = ["chiv_spark", "__spark_entry__.py"]


def check_sweep_sha() -> None:
    """FAIL (exit 1) if the latest round's sweep artifacts carry a
    swept-at SHA whose code tree differs from the current one — in
    committed history OR as uncommitted edits (r12 verdict task 2:
    two rounds running, feature commits landed after the 'final
    close' sweep and the gap was only closed by judge labor; the
    sweep must be the last code-bearing state of the round).
    Artifacts from rounds before the stamp existed are skipped."""
    import subprocess

    # r13 ADVICE: key stamps per ARTIFACT, not per round — the sf0.01
    # and sf0.1 sweeps of one round are separate files, and collapsing
    # them to one dict entry would let one stamp silently overwrite the
    # other (two sweeps run at different SHAs and only one verified)
    stamped: dict[str, str] = {}
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_FULL_r0*.txt")):
        with open(f) as fh:
            first = fh.readline()
        m = re.match(r"# swept-at-sha: ([0-9a-f]{7,40})", first)
        if m:
            stamped[os.path.basename(f)] = m.group(1)
    if not stamped:
        return
    rnd = lambda name: int(re.search(r"_r0*(\d+)", name).group(1))  # noqa: E731
    latest = max(rnd(name) for name in stamped)
    latest_stamps = {n: s for n, s in stamped.items() if rnd(n) == latest}
    if len(set(latest_stamps.values())) > 1:
        sys.exit(
            f"!! r{latest} sweep artifacts disagree on their swept-at SHA — "
            f"{latest_stamps} — the two scale-factor sweeps ran against "
            "different code states. Re-run tools/close_round.sh at HEAD."
        )
    sha = next(iter(latest_stamps.values()))

    def run(*args: str) -> int:
        return subprocess.run(["git", *args], cwd=REPO).returncode

    def porcelain(*paths: str) -> str:
        return subprocess.run(
            ["git", "status", "--porcelain", "--", *paths],
            cwd=REPO,
            capture_output=True,
            text=True,
        ).stdout

    if run("diff", "--quiet", sha, "HEAD", "--", *CODE_PATHS) != 0:
        sys.exit(
            f"!! r{latest} sweep artifacts were produced at {sha} but "
            f"{'/'.join(CODE_PATHS)} changed in commits since — the sweep no "
            "longer covers the code. Re-run tools/close_round.sh at HEAD."
        )
    if run("diff", "--quiet", "HEAD", "--", *CODE_PATHS) != 0:
        sys.exit(
            f"!! uncommitted changes in {'/'.join(CODE_PATHS)} — the r{latest} "
            "sweep artifacts do not cover the working tree. Commit or revert, "
            "then re-run tools/close_round.sh."
        )
    # r13 ADVICE: `git diff` ignores untracked files — a new module
    # under chiv_spark/ sitting untracked is code no commit records
    untracked = [
        ln for ln in porcelain(*CODE_PATHS).splitlines() if ln.startswith("??")
    ]
    if untracked:
        sys.exit(
            f"!! untracked files in {'/'.join(CODE_PATHS)}: {untracked} — the "
            f"r{latest} sweep artifacts do not cover them. git add + commit, "
            "then re-run tools/close_round.sh."
        )


def green(v: dict) -> bool:
    return bool(v.get("rows_match")) and v.get("err") is None and v.get("hash_match") is not False


def sweep_rounds() -> dict[int, set[str]]:
    """Names green in the committed full sweeps, keyed by round."""
    rounds: dict[int, set[str]] = {}
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_FULL_r0*.txt")):
        n = int(re.search(r"_r0*(\d+)", os.path.basename(f)).group(1))
        names = rounds.setdefault(n, set())
        for line in open(f):
            if line.startswith(("PASS ", "ok   ")):
                names.add(line.split()[1].rstrip(":"))
    return rounds


def main() -> None:
    check_sweep_sha()
    driver_rounds: dict[int, dict] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r0*.json"))):
        driver_rounds[int(re.search(r"_r0*(\d+)", f).group(1))] = json.load(open(f))
    sweeps = sweep_rounds()
    latest_sweep = max(sweeps) if sweeps else None

    lines = [HEADER, ""]
    lines += [
        "The driver samples ~50 registry queries per round, so between driver",
        "visits most rows rest on the committed full-registry sweeps",
        "(CORRECTNESS_FULL_r{N}*.txt, run at sf0.01 AND sf0.1). Columns: the",
        "last round the DRIVER's own gate verified the query green, and the",
        "query's standing in the committed full sweeps (first-swept round is",
        "derived from the sweep artifacts, not hand-maintained). Regenerate",
        "with `python tools/gen_provenance.py` after each end-of-round sweep.",
        "",
        "| query | last driver-green | full-sweep standing |",
        "|---|---|---|",
    ]
    for name in sorted(REGISTRY):
        last = max(
            (r for r, d in driver_rounds.items() if name in d and green(d[name])),
            default=None,
        )
        lasts = f"r{last}" if last else "not yet sampled"
        swept_in = sorted(r for r, names in sweeps.items() if name in names)
        if not swept_in:
            st = "new (sweep pending)"
        elif swept_in[-1] == latest_sweep:
            first = swept_in[0]
            since = f"first swept r{first}, " if first != latest_sweep else "new in r%d, " % first
            st = f"{since}r{latest_sweep} sweep green"
        else:
            st = f"r{swept_in[-1]} sweep green (ABSENT from the r{latest_sweep} sweep — investigate)"
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
