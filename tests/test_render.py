"""End-to-end statistical render tests on tiny scenes (CPU)."""

import numpy as np
import pytest

from pyrite_tpu.project import load_project
from pyrite_tpu.scene import build_scene
from pyrite_tpu.renderers import simple


def render_lua(tmp_path, source, spp=16, name="scene.lua"):
    path = tmp_path / name
    path.write_text(source)
    pd = load_project(str(path))
    scene = build_scene(pd)
    film, acc, wt = simple.render(pd, scene, seed=0, max_samples=spp)
    return film, np.asarray(acc), np.asarray(wt)


FURNACE = """
return {
    image = {width = 8, height = 8},
    camera = camera.perspective {
        fov = 60,
        transform = transform.look_at {from = vector(0, 0, 0), to = vector(0, 0, 1)},
    },
    renderer = renderer.simple {
        pixel_samples = 4, spectrum_samples = 3, spectrum_bins = 8,
        bounces = 2, light_samples = 0,
    },
    world = {
        objects = {
            shape.sphere {
                radius = 10, position = vector(0, 0, 0),
                material = {surface = material.emissive {color = 1}},
            },
        },
    },
}
"""


def test_furnace_emissive_enclosure(tmp_path):
    # Inside a unit-emission sphere every sample must develop to exactly 1.
    film, acc, wt = render_lua(tmp_path, FURNACE, spp=4)
    bins = np.where(wt > 0, acc / np.maximum(wt, 1e-20), 0.0)
    filled = wt > 0
    assert filled.any()
    np.testing.assert_allclose(bins[filled], 1.0, atol=1e-5)


WHITE_FURNACE = """
return {
    image = {width = 8, height = 8},
    camera = camera.perspective {
        fov = 40,
        transform = transform.look_at {from = vector(0, 2, 0), to = vector(0, 0, 0), up = vector {z = 1}},
    },
    renderer = renderer.simple {
        pixel_samples = 400, spectrum_samples = 3, spectrum_bins = 4,
        bounces = 2, light_samples = 0,
    },
    world = {
        sky = 1,
        objects = {
            shape.plane {
                origin = vector(0, 0, 0), normal = vector(0, 1, 0),
                material = {surface = material.diffuse {color = 0.6}},
            },
        },
    },
}
"""


def test_white_furnace_diffuse_albedo(tmp_path):
    # An infinite Lambertian plane with albedo a under a uniform unit sky
    # reflects radiance a: pixels looking at the plane should average 0.6.
    film, acc, wt = render_lua(tmp_path, WHITE_FURNACE, spp=400)
    bins = acc.sum() / wt.sum()
    assert bins == pytest.approx(0.6, abs=0.02)


MIRROR_SCENE = """
return {
    image = {width = 8, height = 8},
    camera = camera.perspective {
        fov = 30,
        transform = transform.look_at {from = vector(0, 1, 0), to = vector(0, 0, 0), up = vector {z = 1}},
    },
    renderer = renderer.simple {
        pixel_samples = 8, spectrum_samples = 3, spectrum_bins = 4,
        bounces = 3, light_samples = 0,
    },
    world = {
        sky = 0.25,
        objects = {
            shape.plane {
                origin = vector(0, 0, 0), normal = vector(0, 1, 0),
                material = {surface = material.mirror {color = 0.5}},
            },
        },
    },
}
"""


def test_mirror_reflects_sky_with_color(tmp_path):
    # mirror with color 0.5 looking at sky 0.25 -> 0.125 exactly (no variance)
    film, acc, wt = render_lua(tmp_path, MIRROR_SCENE, spp=8)
    bins = np.where(wt > 0, acc / np.maximum(wt, 1e-20), 0.0)
    filled = wt > 0
    np.testing.assert_allclose(bins[filled], 0.125, atol=1e-5)


NEE_SCENE = """
return {
    image = {width = 6, height = 6},
    camera = camera.perspective {
        fov = 30,
        transform = transform.look_at {from = vector(0, 3, 0), to = vector(0, 0, 0), up = vector {z = 1}},
    },
    renderer = renderer.simple {
        pixel_samples = 64, spectrum_samples = 3, spectrum_bins = 4,
        bounces = 1, light_samples = 2,
    },
    world = {
        objects = {
            shape.plane {
                origin = vector(0, 0, 0), normal = vector(0, 1, 0),
                material = {surface = material.diffuse {color = 1}},
            },
            light.point {
                position = vector(0, 4, 0),
                color = 1,
            },
        },
    },
}
"""


def test_point_light_nee_matches_closed_form(tmp_path):
    # Single bounce, diffuse albedo 1 plane at y=0, point lamp at height h
    # with unit spectral intensity. The reference's estimator gives, for a
    # point directly under the lamp:
    #   weight = 4*pi/d^2, probability = 1/(2*pi), brdf = 2|n.l|
    #   brightness = 4*pi/(d^2 * 2*pi) * 2 * cos = 4*cos/d^2
    # at the plane origin: d = 4, cos = 1 -> 0.25
    film, acc, wt = render_lua(tmp_path, NEE_SCENE, spp=64)
    bins = np.where(wt > 0, acc / np.maximum(wt, 1e-20), 0.0)
    center = bins[bins.shape[0] // 2, bins.shape[1] // 2]
    mean = center[center > 0].mean()
    assert mean == pytest.approx(4.0 / 16.0, rel=0.05)


def test_cluster_threshold_boundary(tmp_path):
    """Scenes just above CLUSTER_THRESHOLD must take the clustered path
    (the dense path's [lanes, prims, 3] intermediates are only HBM-safe
    below the threshold — round-1 OOM regression), and still render."""
    from pyrite_tpu.scene import CLUSTER_THRESHOLD
    from tools.synthetic import terrain_scene

    # cells chosen so 2*cells^2 straddles the threshold
    above_cells = int(np.ceil(np.sqrt((CLUSTER_THRESHOLD + 2) / 2)))
    lua, tris = terrain_scene(
        str(tmp_path), cells=above_cells, width=16, height=8, spp=2, bounces=2
    )
    assert tris > CLUSTER_THRESHOLD
    pd = load_project(lua)
    scene = build_scene(pd)
    assert scene.use_clusters
    film, acc, wt = simple.render(pd, scene, seed=0, max_samples=2)
    assert np.asarray(wt).sum() > 0

    below_cells = int(np.floor(np.sqrt((CLUSTER_THRESHOLD - 2) / 2)))
    lua2, tris2 = terrain_scene(
        str(tmp_path), cells=below_cells, width=16, height=8, spp=2, bounces=2
    )
    assert tris2 <= CLUSTER_THRESHOLD
    pd2 = load_project(lua2)
    scene2 = build_scene(pd2)
    assert not scene2.use_clusters
    film2, acc2, wt2 = simple.render(pd2, scene2, seed=0, max_samples=2)
    assert np.asarray(wt2).sum() > 0
