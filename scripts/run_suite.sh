#!/usr/bin/env bash
# Process-isolated test-suite runner (VERDICT r3 item 3).
#
# The full suite in ONE process reliably segfaulted inside a late XLA:CPU
# backend compile (jax 0.9.0; faulthandler stack ending in
# backend_compile_and_load, at code-state-dependent tests ~250 tests in —
# see NOTES_ROUND3.md).  tests/conftest.py mitigates in-process by clearing
# jax caches per module; this runner removes the failure mode structurally
# instead: each test FILE runs in a fresh interpreter, so no process ever
# accumulates more than one module's backend JIT state.  QASR_SUITE_ISOLATED
# additionally DISABLES the conftest cache-clear mitigation, proving the
# suite is green without it.
#
# Usage: scripts/run_suite.sh [pytest args...]
# Exit 0 iff every file passed.  Per-file logs land in /tmp/qasr_suite/.

set -u
cd "$(dirname "$0")/.."
LOGDIR="${QASR_SUITE_LOGDIR:-/tmp/qasr_suite}"
mkdir -p "$LOGDIR"
fail=0
total_pass=0
total_fail=0
for f in tests/test_*.py; do
  name=$(basename "$f" .py)
  if QASR_SUITE_ISOLATED=1 python -m pytest "$f" -q --no-header "$@" \
      >"$LOGDIR/$name.log" 2>&1; then
    tail -1 "$LOGDIR/$name.log" | sed "s|^|$name: |"
  else
    rc=$?
    fail=1
    echo "$name: FAILED (exit $rc)"
    tail -5 "$LOGDIR/$name.log" | sed 's/^/    /'
  fi
done
for l in "$LOGDIR"/*.log; do
  p=$(grep -oE '[0-9]+ passed' "$l" | grep -oE '[0-9]+' || echo 0)
  x=$(grep -oE '[0-9]+ (failed|error)' "$l" | grep -oE '[0-9]+' | head -1 || echo 0)
  total_pass=$((total_pass + p))
  total_fail=$((total_fail + x))
done
echo "TOTAL: $total_pass passed, $total_fail failed/errored (isolated, per-file processes)"
exit $fail
