#!/bin/bash
# Round-5d TPU queue — runs AFTER baselines/tpu_ab_r5c.sh (pass its pid).
# 1. shared-mesh quality, budget-scale 4: tests the round-5 diagnosis that
#    the first study's 0.0365-vs-0.0047 next-frame MSE gap is mesh-capacity
#    starvation (batch-union mesh under the single-sample node_budget), by
#    giving the shared mesh 4x capacity (still amortised over B=8)
# 2. shared-mesh equal-wall-clock row: 120 epochs at scale 1 (~= the
#    per-sample row's 791 s) — the practical promotion question
# 3. quadtree per-op trace at flagship scale: attribute the ~60 ms/step the
#    component breakdown could not (9.86 f/s = ~101 ms/decoder-step; only
#    ~40 ms accounted by remesh+transfer+attention)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/ab_r5d.log}
WAIT_PID=${2:-}

if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID (r5c queue) ..." >> "$LOG"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "r5c queue done, starting r5d" >> "$LOG"
fi

run() {
  local name=$1; shift
  echo "=== $name: $*" >> "$LOG"
  timeout 4200 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $name" >> "$LOG"
}

run shared_quality_scale4 \
  python baselines/shared_mesh_quality.py --mode shared --budget-scale 4
run shared_quality_equal_wall \
  python baselines/shared_mesh_quality.py --mode shared --epochs 120
run quadtree_trace \
  python bench.py --no-probe --budget 3000 --workload ice-quadtree \
  --ice-steps 2 --trace-dir /tmp/qt_trace
echo "=== DONE r5d ===" >> "$LOG"
