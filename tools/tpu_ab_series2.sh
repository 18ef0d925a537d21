#!/bin/bash
# Round-3 TPU A/B series, part 2: re-measures every regen-scheduler case
# after the lane-bin exposure fix (einsum -> VPU select/reduce; the einsum
# lowered to N tiny padded batched matmuls and cost ~8x a bounce at
# megabatch width), plus cluster lane-width A/Bs (PYRITE_TPU_CLUSTER_LANES).
# Part-1 results that remain valid: spheres_oneshot 62.5 live,
# terrain_oneshot 0.592 live, terrain merge OFF loses nothing (merge lost
# 0.444/0.381 vs 0.592/0.569), cornell one-shot 0.4731 spp/s.
# Usage: bash tools/tpu_ab_series2.sh [outfile]
set -u
cd /root/repo
OUT=${1:-/tmp/ab2_results.txt}
run() {
  local label="$1"; shift
  echo "=== $label $(date +%H:%M:%S)" >> "$OUT"
  timeout 2400 "$@" >> "$OUT" 2>/dev/null
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$OUT"
}

# primary metric: regen with the fixed exposure
run spheres_regen                 python tools/tpu_ab.py spheres_regen

# terrain: regen fixed; lane-width ladder on both schedulers
run terrain_regen                 python tools/tpu_ab.py terrain_regen
run terrain_regen_131k            env PYRITE_TPU_CLUSTER_LANES=131072 python tools/tpu_ab.py terrain_regen
run terrain_oneshot_131k          env PYRITE_TPU_CLUSTER_LANES=131072 python tools/tpu_ab.py terrain_oneshot
run terrain_regen_262k            env PYRITE_TPU_CLUSTER_LANES=262144 python tools/tpu_ab.py terrain_regen

# wider spheres one-shot launch (dispatch amortization past 524k lanes)
run spheres_oneshot_b8            env PYRITE_TPU_SAMPLE_BATCH=8 python tools/tpu_ab.py spheres_oneshot

# BDPT regen cases with the fixed exposure
run cornell_force_regen           env PYRITE_TPU_REGEN_BDPT_MIN=1 python tools/tpu_ab.py cornell 6
run diamonds                      python tools/tpu_ab.py diamonds
run dragon                        python tools/tpu_ab.py dragon 24
run dragon_merge                  env PYRITE_TPU_MERGE_TRAV=1 python tools/tpu_ab.py dragon 24
run snowflake                     python tools/tpu_ab.py snowflake 4
run snowflake_merge               env PYRITE_TPU_MERGE_TRAV=1 python tools/tpu_ab.py snowflake 4

echo "=== series2 done $(date +%H:%M:%S)" >> "$OUT"
