#!/bin/bash
# Tiered test runner (round-4 verdict item 5).
#
#   tests/run_suite.sh          core tier: pytest -m "not slow", one
#                               process; target <10 min on a 1-CPU box
#   tests/run_suite.sh --full   every test, one pytest process PER FILE —
#                               JAX retains all compiled executables for
#                               the life of a process, which OOM-killed a
#                               single-process full run at 128 GB RSS on a
#                               128 GB box; per-file isolation bounds the
#                               high-water mark (~2 GB). ~48 min total
#                               (measured per-file on an idle box, r4).
#
# Exit code: 0 iff every selected test passed.
set -u
cd "$(dirname "$0")/.."

if [ "${1:-}" != "--full" ]; then
  exec python -m pytest tests/ -q -m "not slow"
fi

overall=0
for f in tests/test_*.py; do
  echo "== $f"
  python -m pytest "$f" -q || overall=1
done
exit $overall
