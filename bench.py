"""Benchmark: steady-state trace throughput on the reference spheres scene.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against the north-star target of 100 Mrays/sec/chip (BASELINE.json). Rays
counted are the ray-scene intersection tests actually executed per render
step: every bounce runs 1 path-extension intersection plus light_samples
shadow-ray intersections per wavefront lane.
"""

import json
import time


def main():
    import jax

    from pyrite_tpu.project import load_project
    from pyrite_tpu.scene import build_scene
    from pyrite_tpu.renderers import simple

    scene_path = "/root/reference/pyrite/test/spheres/spheres.lua"
    project_data = load_project(scene_path)
    project_data.project.renderer.pixel_samples = 6
    scene = build_scene(project_data)

    settings = project_data.project.renderer
    width = project_data.project.image.width
    height = project_data.project.image.height
    lanes = width * height
    rays_per_step = lanes * settings.bounces * (1 + settings.light_samples)

    times = []

    def on_progress(progress):
        jax.block_until_ready(progress.acc)
        times.append(time.time())

    times.append(time.time())
    simple.render(project_data, scene, seed=0, on_progress=on_progress)

    # drop the first step (compile); average the rest
    deltas = [b - a for a, b in zip(times[1:], times[2:])]
    step_time = sum(deltas) / len(deltas)
    mrays = rays_per_step / step_time / 1e6

    print(
        json.dumps(
            {
                "metric": "trace throughput, spheres 512x256 simple renderer",
                "value": round(mrays, 3),
                "unit": "Mrays/sec/chip",
                "vs_baseline": round(mrays / 100.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
