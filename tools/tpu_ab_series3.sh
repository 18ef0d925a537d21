#!/bin/bash
# Round-3 TPU A/B series, part 3: launch-tail amortization. A regen launch
# runs until the SLOWEST lane finishes its fixed per-launch sample quota,
# so occupancy ~ mean/max quota-completion time — bigger per-launch quotas
# amortize the tail. Usage: bash tools/tpu_ab_series3.sh [outfile]
set -u
cd /root/repo
OUT=${1:-/tmp/ab3_results.txt}
run() {
  local label="$1"; shift
  echo "=== $label $(date +%H:%M:%S)" >> "$OUT"
  timeout 2400 "$@" >> "$OUT" 2>/dev/null
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$OUT"
}

run spheres_regen_spp64           python tools/tpu_ab.py spheres_regen 64
run spheres_regen_spp150          python tools/tpu_ab.py spheres_regen 150
run terrain_oneshot_onehot        env PYRITE_TPU_ONEHOT_ROWS=1 python tools/tpu_ab.py terrain_oneshot 405
run terrain_oneshot_pack          env PYRITE_TPU_PACK_STATE=1 python tools/tpu_ab.py terrain_oneshot 405
run terrain_oneshot_onehot_pack   env PYRITE_TPU_ONEHOT_ROWS=1 PYRITE_TPU_PACK_STATE=1 python tools/tpu_ab.py terrain_oneshot 405
run terrain_oneshot_ctrl          python tools/tpu_ab.py terrain_oneshot 405
run terrain_regen_spp32           python tools/tpu_ab.py terrain_regen 405 32
run terrain_regen_131k_spp32      env PYRITE_TPU_CLUSTER_LANES=131072 python tools/tpu_ab.py terrain_regen 405 32

echo "=== series3 done $(date +%H:%M:%S)" >> "$OUT"
