"""Multi-device sharded rendering on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from pyrite_tpu.project import load_project
from pyrite_tpu.scene import build_scene
from pyrite_tpu.renderers import simple

SCENE = """
return {
    image = {width = 16, height = 16},
    camera = camera.perspective {
        fov = 60,
        transform = transform.look_at {from = vector(0, 2, 6), to = vector(0, 1, 0)},
    },
    renderer = renderer.simple {
        pixel_samples = 64, spectrum_samples = 4, bounces = 3, light_samples = 2,
    },
    world = {
        objects = {
            shape.sphere {radius = 50, position = vector(0, -50, 0),
                material = {surface = material.diffuse {color = 0.7}}},
            shape.sphere {radius = 1, position = vector(0, 3, 0),
                material = {surface = material.emissive {color = 2}}},
        },
    },
}
"""


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_render_matches_single_device(tmp_path):
    path = tmp_path / "scene.lua"
    path.write_text(SCENE)
    pd = load_project(str(path))
    scene = build_scene(pd)

    film, acc1, wt1 = simple.render(pd, scene, seed=0, max_samples=64)
    single = np.asarray(film.develop(acc1, wt1)).mean(axis=2)

    from pyrite_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices()[:8])
    film, acc8, wt8 = simple.render_sharded(pd, scene, mesh, seed=1, max_samples=64)
    sharded = np.asarray(film.develop(acc8, wt8)).mean(axis=2)

    assert np.asarray(wt8).sum() > 0
    lit = single > 0.05
    rel = np.abs(single - sharded)[lit] / single[lit]
    assert np.median(rel) < 0.2
