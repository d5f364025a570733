#!/bin/bash
# Round-5b TPU queue — runs AFTER baselines/tpu_ab_r5.sh completes.
# 1. waits for the r5 queue pid (arg 2) to exit, so the chip is never shared
# 2. re-runs the two shared-mesh quadtree configs whose first attempt hit
#    bench.py's internal 900 s wall-clock budget mid-compile (--budget 2300
#    keeps them under the 2400 s hard timeout but lets the ~280 s+ cold
#    compile finish)
# 3. per-component quadtree step breakdown (VERDICT r4 #2 attribution)
# 4. integrated-trainer fps (lagged scalar drain, VERDICT r4 #7)
# 5. shared-mesh converged-quality study (promotion evidence)
# 6. bf16-vs-f32 ice flagship quality twin (VERDICT r4 #4, ~60 min, last)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/ab_r5b.log}
WAIT_PID=${2:-}

if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID (r5 queue) ..." >> "$LOG"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  echo "r5 queue done, starting r5b" >> "$LOG"
fi

run() {
  local name=$1; shift
  echo "=== $name: $*" >> "$LOG"
  timeout 4200 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $name" >> "$LOG"
}

run quadtree_shared_b4_retry \
  python bench.py --no-probe --budget 2300 --workload ice-quadtree \
  --shared-mesh --batch 4
run quadtree_csum_shared_b4_retry \
  python bench.py --no-probe --budget 2300 --workload ice-quadtree \
  --adjacency csum --shared-mesh --batch 4
run quadtree_breakdown python baselines/quadtree_step_breakdown.py
run trainer_fps python baselines/trainer_fps.py
run shared_mesh_quality python baselines/shared_mesh_quality.py
run bf16_quality_ice python baselines/bf16_quality_ice.py
echo "=== DONE r5b ===" >> "$LOG"
