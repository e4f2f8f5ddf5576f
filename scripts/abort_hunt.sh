#!/usr/bin/env bash
# A/B experiment for the rare native SIGABRT (ARCHITECTURE.md
# "Suite-stability campaign"): the crash always lands inside the jitted
# CPU train step of tests/test_serving.py's `trained` fixture during
# FULL-suite runs, where torch's native runtime is already resident
# (imported by the parity tests). Hypothesis: XLA:CPU-vs-torch native
# runtime collision.
#
#   ARM A: test_serving alone          (torch NEVER imported)
#   ARM B: one torch test FIRST, then test_serving (torch resident)
#
# Both arms run under the LD_PRELOAD SIGABRT-backtrace shim. If B
# crashes at the historical ~1/7 rate and A stays clean across the same
# number of runs, the collision hypothesis is confirmed and the fix is
# process isolation for torch-importing tests.
#
# Usage: scripts/abort_hunt.sh [runs_per_arm]   (default 12)
set -u
cd "$(dirname "$0")/.."
RUNS=${1:-12}
SHIM=native/abortbt.so
[ -f "$SHIM" ] || gcc -shared -fPIC -o "$SHIM" native/debug_abortbt.c

TORCH_TEST="tests/test_ops.py::test_lstm_matches_torch"
declare -i a_crash=0 b_crash=0
for i in $(seq 1 "$RUNS"); do
  echo "=== run $i arm A (no torch) ==="
  LD_PRELOAD=$PWD/$SHIM python -m pytest -p no:faulthandler tests/test_serving.py -q \
    > "/tmp/abort_A_$i.log" 2>&1
  rc=$?
  [ $rc -ge 2 ] && { a_crash+=1; echo "ARM A CRASH rc=$rc (log /tmp/abort_A_$i.log)"; }
  echo "=== run $i arm B (torch resident) ==="
  LD_PRELOAD=$PWD/$SHIM python -m pytest -p no:faulthandler "$TORCH_TEST" tests/test_serving.py -q \
    > "/tmp/abort_B_$i.log" 2>&1
  rc=$?
  [ $rc -ge 2 ] && { b_crash+=1; echo "ARM B CRASH rc=$rc (log /tmp/abort_B_$i.log)"; }
  echo "tally after $i: A=$a_crash B=$b_crash"
done
echo "FINAL: armA_crashes=$a_crash armB_crashes=$b_crash runs=$RUNS"
