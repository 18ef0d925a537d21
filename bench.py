"""Benchmark: steady-state trace throughput on the reference spheres scene.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against the north-star target of 100 Mrays/sec/chip (BASELINE.json). Rays
counted are the ray-scene intersection tests actually executed per render
step: every bounce runs 1 path-extension intersection plus light_samples
shadow-ray intersections per wavefront lane.

Timing note: on the axon TPU backend jax.block_until_ready does not reliably
synchronize, so the measurement brackets K steps between two scalar fetches
(which do force completion) and subtracts nothing — the fetch cost is
amortized over K.
"""

import json
import time


def main():
    import jax

    from pyrite_tpu.film import Film
    from pyrite_tpu.project import load_project
    from pyrite_tpu.scene import CameraModel, build_scene
    from pyrite_tpu.renderers.simple import make_render_step
    from pyrite_tpu.tracer import TraceConfig

    scene_path = "/root/reference/pyrite/test/spheres/spheres.lua"
    project_data = load_project(scene_path)
    scene = build_scene(project_data)
    project = project_data.project
    settings = project.renderer

    film = Film(
        width=project.image.width,
        height=project.image.height,
        bins=settings.spectrum_bins,
        span=settings.spectrum_span,
    )
    camera = CameraModel.from_ir(project.camera)
    cfg = TraceConfig(
        bounces=settings.bounces,
        light_samples=settings.light_samples,
        spectrum_samples=settings.spectrum_samples,
    )
    step = make_render_step(scene, film, camera, cfg)

    acc, wt = film.new_buffers()
    data = scene.device_data()
    key = jax.random.PRNGKey(0)

    # warmup / compile, synchronized by a real fetch
    acc, wt = step(acc, wt, key, data)
    float(acc.sum())

    steps = 10
    import numpy as np

    keys = np.asarray(jax.random.split(key, steps))
    t0 = time.time()
    for i in range(steps):
        acc, wt = step(acc, wt, keys[i], data)
    float(acc.sum())  # forces completion of the whole chain
    elapsed = (time.time() - t0) / steps

    lanes = film.width * film.height
    rays_per_step = lanes * settings.bounces * (1 + settings.light_samples)
    mrays = rays_per_step / elapsed / 1e6

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
