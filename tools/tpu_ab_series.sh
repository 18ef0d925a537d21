#!/bin/bash
# Round-3 TPU A/B series: runs every open scheduler question sequentially
# and appends one line per result to $OUT. Each case compiles for minutes
# on first run (Mosaic/XLA remote-compile cache makes reruns fast).
# Usage: bash tools/tpu_ab_series.sh [outfile]
set -u
cd /root/repo
OUT=${1:-/tmp/ab_results.txt}
run() {
  local label="$1"; shift
  echo "=== $label $(date +%H:%M:%S)" >> "$OUT"
  timeout 2400 "$@" >> "$OUT" 2>/dev/null
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$OUT"
}

# primary metric first
run spheres_regen                 python tools/tpu_ab.py spheres_regen
run spheres_oneshot               python tools/tpu_ab.py spheres_oneshot

# terrain: one-shot vs regen vs merged-traversal combos
run terrain_oneshot               python tools/tpu_ab.py terrain_oneshot
run terrain_oneshot_merge         env PYRITE_TPU_MERGE_TRAV=1 python tools/tpu_ab.py terrain_oneshot
run terrain_regen                 python tools/tpu_ab.py terrain_regen
run terrain_regen_merge           env PYRITE_TPU_MERGE_TRAV=1 python tools/tpu_ab.py terrain_regen

# BDPT: cornell regen-forced A/B; dragon merged A/B; snowflake sanity
run cornell                       python tools/tpu_ab.py cornell 6
run cornell_force_regen           env PYRITE_TPU_REGEN_BDPT_MIN=1 python tools/tpu_ab.py cornell 6
run diamonds                      python tools/tpu_ab.py diamonds
run dragon                        python tools/tpu_ab.py dragon 24
run dragon_merge                  env PYRITE_TPU_MERGE_TRAV=1 python tools/tpu_ab.py dragon 24
run snowflake                     python tools/tpu_ab.py snowflake 4
# snowflake's 2000-tri mesh rides the cluster path: regen-BDPT camera walks
# also take the merged shadow+extension traversal when the gate is on
run snowflake_merge               env PYRITE_TPU_MERGE_TRAV=1 python tools/tpu_ab.py snowflake 4

echo "=== series done $(date +%H:%M:%S)" >> "$OUT"
