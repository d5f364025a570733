#!/bin/bash
# Round-5 TPU A/B queue (VERDICT r4 next-items 1-3, 7): each line is one
# bench.py invocation that prints a single headline JSON; results land in
# /tmp/ab_r5.log and are summarised into BASELINE.md / PERF_NOTES.
# Run ALONE on the chip — host contention skews the latency-bound rows.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/ab_r5.log}

run() {
  local name=$1; shift
  echo "=== $name: $*" >> "$LOG"
  timeout 2400 python bench.py --no-probe "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $name" >> "$LOG"
}

# ice-quadtree ladder (VERDICT #2: 9.8 -> >=20 f/s)
run quadtree_sort        --workload ice-quadtree
run quadtree_csum        --workload ice-quadtree --adjacency csum
run quadtree_shared_b4   --workload ice-quadtree --shared-mesh --batch 4
run quadtree_csum_shared_b4 --workload ice-quadtree --adjacency csum --shared-mesh --batch 4
# grid-attention fused kernel A/B (VERDICT #2 lever / round-4 feature)
run ice_grid_attn_pallas --workload ice --grid-attn pallas
run ice_grid_attn_xla    --workload ice --grid-attn xla
echo "=== DONE ===" >> "$LOG"
