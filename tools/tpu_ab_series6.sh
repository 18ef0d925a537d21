#!/bin/bash
# Round-3 TPU A/B series, part 6: soft-tail launch exit (launches stop at
# <=1% lanes short of quota; remainders carry to the next launch). Without
# it, live throughput needed giant per-launch quotas to amortize the tail
# (spp16 54 -> spp600 115 live on spheres). If the soft tail recovers
# spp600-level occupancy at small chunks, the render default stays at a
# preview-friendly chunk size. Plus: merged traversal retest now that
# one-hot pops + packed state halved per-iteration walk cost.
# Usage: bash tools/tpu_ab_series6.sh [outfile]
set -u
cd /root/repo
OUT=${1:-/tmp/ab6_results.txt}
run() {
  local label="$1"; shift
  echo "=== $label $(date +%H:%M:%S)" >> "$OUT"
  timeout 2400 "$@" >> "$OUT" 2>/dev/null
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$OUT"
}

run spheres_regen_tail_spp16      python tools/tpu_ab.py spheres_regen 16
run spheres_regen_tail_spp64      python tools/tpu_ab.py spheres_regen 64
run spheres_regen_tail_spp150     python tools/tpu_ab.py spheres_regen 150
run terrain_merge_knobs           env PYRITE_TPU_MERGE_TRAV=1 python tools/tpu_ab.py terrain_oneshot 405
run terrain_regen_tail_spp64      python tools/tpu_ab.py terrain_regen 405 64
run terrain_fetch_kernel          env PYRITE_TPU_FETCH_KERNEL=1 python tools/tpu_ab.py terrain_oneshot 405

echo "=== series6 done $(date +%H:%M:%S)" >> "$OUT"
