#!/usr/bin/env bash
# CI entry point for the test suite, with the retry-once policy from
# ARCHITECTURE.md "Suite-stability campaign": a rare (~1/7 full-suite)
# SIGABRT below JAX hard-aborts the interpreter (rc >= 2 / signal exit)
# without affecting any completed test's result, so one retry on an
# abort-style exit is sound. Genuine test FAILURES exit rc=1 and are
# never retried. Delete the retry when the native abort is fixed.
#
# Usage: scripts/run_tests.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."

run() {
  python -m pytest tests/ -x -q "$@"
}

run "$@"
rc=$?
if [ "$rc" -ge 2 ]; then
  echo "=== suite aborted with rc=$rc (interpreter crash, not a test" \
       "failure); retrying once per ARCHITECTURE.md policy ===" >&2
  run "$@"
  rc=$?
fi
exit $rc
