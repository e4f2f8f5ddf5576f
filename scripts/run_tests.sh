#!/usr/bin/env bash
# CI entry point for the test suite. The retry-once abort policy is
# GONE: the historical native SIGABRT exposure was removed structurally
# in round 4 (long functional fixtures run 1-device meshes; the
# XLA:CPU AOT cache-load wedge and the Gloo collective-loop wedge in
# the two-process test were root-caused and closed — see
# ARCHITECTURE.md "Suite-stability campaign"). Validated by 10
# consecutive full-suite greens on this host, 2026-08-21
# (226 passed each, 647-735 s, zero retries).
#
# Usage: scripts/run_tests.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -x -q "$@"
