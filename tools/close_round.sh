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
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:?usage: tools/close_round.sh <round-number>}"

echo "== 1/4 pytest" >&2
python -m pytest tests/ -q

echo "== 2/4 sweep sf0.01" >&2
python tools/check_correctness.py /root/testdata/sf0.01 \
  > "CORRECTNESS_FULL_r0${N}.txt" 2>/dev/null || true
grep -cE '^PASS|^ok  ' "CORRECTNESS_FULL_r0${N}.txt" >&2

echo "== 3/4 sweep sf0.1" >&2
python tools/check_correctness.py /root/testdata/sf0.1 \
  > "CORRECTNESS_FULL_r0${N}_sf01.txt" 2>/dev/null || true
grep -cE '^PASS|^ok  ' "CORRECTNESS_FULL_r0${N}_sf01.txt" >&2

echo "== 4/4 provenance" >&2
python tools/gen_provenance.py

if grep -qE '^FAIL' "CORRECTNESS_FULL_r0${N}.txt" "CORRECTNESS_FULL_r0${N}_sf01.txt"; then
  echo "!! FAILURES PRESENT — fix before committing:" >&2
  grep -E '^FAIL' "CORRECTNESS_FULL_r0${N}.txt" "CORRECTNESS_FULL_r0${N}_sf01.txt" >&2
  exit 1
fi
echo "all green — commit CORRECTNESS_FULL_r0${N}*.txt + COVERAGE.md now," >&2
echo "then add NO more queries this round." >&2
