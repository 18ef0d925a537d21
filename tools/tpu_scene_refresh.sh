#!/bin/bash
# Round-5 PARITY refresh: render every reference scene through the CLI on
# the current schedulers (TPU), writing PNGs to /tmp/r5_scenes/.
# Dragon's OBJ is a stripped blob (.MISSING_LARGE_BLOBS); its workload
# class is covered by the synthetic dragon bench entry instead.
set -x
mkdir -p /tmp/r5_scenes
cd /root/repo
REF=/root/reference/pyrite/test
for s in spheres:64 colors:32 textures:32 rgb_reflection:32 rgb_emission:32 diamonds:24 snowflake:8 cornell:24; do
  name="${s%%:*}"; spp="${s##*:}"
  timeout 1200 python -m pyrite_tpu "$REF/$name/$name.lua" \
      --samples "$spp" --output "/tmp/r5_scenes/$name.png" \
      && echo "SCENE_OK $name" || echo "SCENE_FAIL $name"
done
echo ALL_DONE
