#!/bin/bash
# Round-3 TPU A/B series, part 4: after series3 showed one-hot row fetch
# (1.45x) + packed-state compaction (stacking to 1.73x) win on terrain and
# adaptive regen quotas scale with chunk size (spp64 54.3 -> spp150 79.4
# live on spheres), re-tune around the new balance: bigger regen chunks,
# walk/sweep knobs with cheap pops, wider launches with cheap gathers.
# Usage: bash tools/tpu_ab_series4.sh [outfile]
set -u
cd /root/repo
OUT=${1:-/tmp/ab4b_results.txt}
run() {
  local label="$1"; shift
  echo "=== $label $(date +%H:%M:%S)" >> "$OUT"
  timeout 2400 "$@" >> "$OUT" 2>/dev/null
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$OUT"
}
K="PYRITE_TPU_ONEHOT_ROWS=1 PYRITE_TPU_PACK_STATE=1"

run spheres_regen_spp300          python tools/tpu_ab.py spheres_regen 300
run spheres_regen_spp600          python tools/tpu_ab.py spheres_regen 600
run terrain_regen_knobs           env PYRITE_TPU_ONEHOT_ROWS=1 PYRITE_TPU_PACK_STATE=1 python tools/tpu_ab.py terrain_regen 405 32
run terrain_walk3                 env PYRITE_TPU_ONEHOT_ROWS=1 PYRITE_TPU_PACK_STATE=1 PYRITE_TPU_WALK_STEPS=3 python tools/tpu_ab.py terrain_oneshot 405
run terrain_div4                  env PYRITE_TPU_ONEHOT_ROWS=1 PYRITE_TPU_PACK_STATE=1 PYRITE_TPU_COMPACT_DIV=4 python tools/tpu_ab.py terrain_oneshot 405
run terrain_131k_knobs            env PYRITE_TPU_ONEHOT_ROWS=1 PYRITE_TPU_PACK_STATE=1 PYRITE_TPU_CLUSTER_LANES=131072 python tools/tpu_ab.py terrain_oneshot 405
run snowflake_knobs               env PYRITE_TPU_ONEHOT_ROWS=1 PYRITE_TPU_PACK_STATE=1 python tools/tpu_ab.py snowflake 4

echo "=== series4 done $(date +%H:%M:%S)" >> "$OUT"
