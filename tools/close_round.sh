#!/usr/bin/env bash
# End-of-round closing recipe (r4 verdict item 1: the full sweep must
# be the LAST act of a round, committed with a git timestamp after the
# last query-adding commit).
#
# Usage: tools/close_round.sh <round-number>
#
# Runs, in order:
#   1. full pytest suite                  (must be green)
#   2. full-registry sweep at sf0.01  ->  CORRECTNESS_FULL_r0N.txt
#   3. full-registry sweep at sf0.1   ->  CORRECTNESS_FULL_r0N_sf01.txt
#   4. COVERAGE.md provenance regeneration
#   5. prints the git add/commit reminder — commit these artifacts and
#      then STOP adding queries for the round.
#
# Hardened per the r5 ADVICE: the sweeps run WITHOUT `|| true` (a
# crashed check_correctness.py fails the gate instead of producing a
# truncated artifact that greps green), and each artifact's verdict
# line count is asserted equal to the live registry size, so a
# partial sweep can never be declared "all green".
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:?usage: tools/close_round.sh <round-number>}"

# r12 verdict task 2: the sweep must be the LAST code-bearing commit —
# mechanically. Refuse to sweep a dirty code tree (the sweep would
# test code that no commit records), and stamp the swept HEAD SHA into
# the artifacts so gen_provenance can FAIL if code changes after the
# sweep (two rounds running, feature commits landed after the "final
# close" and were only caught by judge labor).
if ! git diff --quiet HEAD -- chiv_spark __spark_entry__.py; then
  echo "!! chiv_spark/ or __spark_entry__.py has uncommitted changes — commit code BEFORE closing the round" >&2
  exit 1
fi
# r13 ADVICE: `git diff` ignores UNTRACKED files — a brand-new module
# under chiv_spark/ would be swept with no commit recording it,
# defeating the sweep-is-last-code-state invariant. Fail on ?? too.
if git status --porcelain -- chiv_spark __spark_entry__.py | grep -q '^??'; then
  echo "!! untracked files under chiv_spark/ or __spark_entry__.py — git add + commit BEFORE closing the round:" >&2
  git status --porcelain -- chiv_spark __spark_entry__.py | grep '^??' >&2
  exit 1
fi
SWEEP_SHA=$(git rev-parse HEAD)
echo "== sweeping at ${SWEEP_SHA}" >&2

REG_COUNT=$(python -c "from chiv_spark.queries import REGISTRY; print(len(REGISTRY))")
echo "== registry: ${REG_COUNT} queries" >&2

# Fail fast on the registry-wide plan audits (~5 min) before paying
# the full suite: a query added with an unregistered
# BroadcastNestedLoopJoin (any 1-row totals crossJoin plans one) or
# an unpartitioned window otherwise surfaces ~20 min in, costing a
# whole pytest leg per offender batch (this happened in r14).
echo "== 0/4 plan audits (fail-fast)" >&2
timeout 900 python -m pytest tests/test_plans.py::TestJoinAudit tests/test_plans.py::TestWindowAudit -q

echo "== 1/4 pytest" >&2
# Measured suite time: ~15 min uncontended at r11 (398 tests), and it
# degrades badly under CPU contention (an r10 close saw a `timeout
# 1200` wrapper kill it at 92% while sf0.1 oracles ran concurrently).
# Run this script with NOTHING else on the box and under NO outer
# timeout shorter than the explicit 3600 s ceiling below — the
# ceiling exists only so a hung JVM can't wedge the close forever,
# not as a performance budget (r10 verdict task 8).
timeout 3600 python -m pytest tests/ -q

sweep() {  # sweep <sf_dir> <artifact>
  local sf_dir="$1" out="$2"
  # stderr passes through (Spark/driver noise goes to the terminal,
  # crashes are visible); a non-zero exit aborts the close
  echo "# swept-at-sha: ${SWEEP_SHA}" > "$out"
  python tools/check_correctness.py "$sf_dir" >> "$out"
  local verdicts
  verdicts=$(grep -cE '^(PASS|FAIL|ok  |ERR )' "$out" || true)
  if [ "$verdicts" -ne "$REG_COUNT" ]; then
    echo "!! $out has $verdicts verdict lines, registry has $REG_COUNT — truncated sweep, aborting" >&2
    exit 1
  fi
  grep -cE '^PASS|^ok  ' "$out" >&2
}

echo "== 2/4 sweep sf0.01" >&2
sweep /root/testdata/sf0.01 "CORRECTNESS_FULL_r0${N}.txt"

echo "== 3/4 sweep sf0.1" >&2
sweep /root/testdata/sf0.1 "CORRECTNESS_FULL_r0${N}_sf01.txt"

echo "== 4/4 provenance" >&2
python tools/gen_provenance.py

if grep -qE '^FAIL|^ERR ' "CORRECTNESS_FULL_r0${N}.txt" "CORRECTNESS_FULL_r0${N}_sf01.txt"; then
  echo "!! FAILURES PRESENT — fix before committing:" >&2
  grep -E '^FAIL|^ERR ' "CORRECTNESS_FULL_r0${N}.txt" "CORRECTNESS_FULL_r0${N}_sf01.txt" >&2
  exit 1
fi
echo "all green — commit CORRECTNESS_FULL_r0${N}*.txt + COVERAGE.md now," >&2
echo "then add NO more queries this round." >&2
