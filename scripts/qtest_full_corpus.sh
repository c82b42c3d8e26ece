#!/bin/sh
# Full-corpus qtest lane (VERDICT r7 #8): run EVERY manifest script —
# not the deterministic ~40% CI slice — once per round, and keep the
# artifact so regressions outside the slice can't land silently.
#
#   sh scripts/qtest_full_corpus.sh            # writes tests/qtest_full_run.txt
#
# The CI slice (tests/test_qtest_corpus.py default) stays the per-commit
# gate; this lane is the per-round sweep. Exit code is pytest's.
set -u
cd "$(dirname "$0")/.."
out="tests/qtest_full_run.txt"
{
  echo "# full-corpus qtest lane — $(git rev-parse --short HEAD 2>/dev/null)"
  QTEST_CORPUS_FULL=1 python -m pytest tests/test_qtest_corpus.py -q 2>&1 \
    | tail -40
} > "$out"
tail -3 "$out"
