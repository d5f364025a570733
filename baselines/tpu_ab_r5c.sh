#!/bin/bash
# Round-5c TPU queue — runs AFTER baselines/tpu_ab_r5b.sh (pass its pid).
# 1. grid-attn pallas retry: the round-5 first attempt crashed in Mosaic
#    lowering under the per-gate nn.vmap layout; with the batched-trace
#    fallback (models/conv.py) the run now measures the fused kernel on the
#    unbatched encoder/decoder conv stacks + XLA chain on the gate stacks
# 2. ice-grid shared-mesh b4: batch-scaling row at the flagship scale (the
#    mnist shared rows showed 5-16x; this is the production-shape twin)
# 3. quadtree remesh_every=3: opt-in reduced-remesh mode (reference
#    remeshes every decoder step; this quantifies what that choice costs)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/ab_r5c.log}
WAIT_PID=${2:-}

if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID (r5b queue) ..." >> "$LOG"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "r5b queue done, starting r5c" >> "$LOG"
fi

run() {
  local name=$1; shift
  echo "=== $name: $*" >> "$LOG"
  timeout 4200 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $name" >> "$LOG"
}

run ice_grid_attn_pallas_retry \
  python bench.py --no-probe --budget 2300 --workload ice --grid-attn pallas
run ice_grid_shared_b4 \
  python bench.py --no-probe --budget 2300 --workload ice \
  --shared-mesh --batch 4
run quadtree_remesh_every3 \
  python bench.py --no-probe --budget 2300 --workload ice-quadtree \
  --remesh-every 3
echo "=== DONE r5c ===" >> "$LOG"
