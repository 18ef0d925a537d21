#!/bin/bash
# Round-3 TPU A/B series, part 5: with one-hot pops + packed state on by
# default, the leaf-geometry gather dominates each outer iteration
# (series4: COMPACT_DIV=4 doubled sweep width and nearly halved terrain
# throughput). Probe narrower sweeps and fewer leaves per sweep.
# Usage: bash tools/tpu_ab_series5.sh [outfile]
set -u
cd /root/repo
OUT=${1:-/tmp/ab5_results.txt}
run() {
  local label="$1"; shift
  echo "=== $label $(date +%H:%M:%S)" >> "$OUT"
  timeout 2400 "$@" >> "$OUT" 2>/dev/null
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$OUT"
}

run terrain_sweep1                env PYRITE_TPU_SWEEP_LEAVES=1 python tools/tpu_ab.py terrain_oneshot 405
run terrain_div12                 env PYRITE_TPU_COMPACT_DIV=12 python tools/tpu_ab.py terrain_oneshot 405
run terrain_div16                 env PYRITE_TPU_COMPACT_DIV=16 python tools/tpu_ab.py terrain_oneshot 405
run terrain_sweep1_div12          env PYRITE_TPU_SWEEP_LEAVES=1 PYRITE_TPU_COMPACT_DIV=12 python tools/tpu_ab.py terrain_oneshot 405
run terrain_sweep3                env PYRITE_TPU_SWEEP_LEAVES=3 python tools/tpu_ab.py terrain_oneshot 405

echo "=== series5 done $(date +%H:%M:%S)" >> "$OUT"
