"""Cross-algorithm consistency tests on a shared scene (CPU)."""

import numpy as np
import pytest

from pyrite_tpu.project import load_project
from pyrite_tpu.scene import build_scene


SCENE = """
return {
    image = {width = 20, height = 20},
    camera = camera.perspective {
        fov = 60,
        transform = transform.look_at {from = vector(0, 2, 6), to = vector(0, 1, 0)},
    },
    renderer = renderer.%(algo)s {
        pixel_samples = %(spp)d, spectrum_samples = 4, bounces = 4,
        light_samples = 2%(extra)s
    },
    world = {
        objects = {
            shape.sphere {
                radius = 50, position = vector(0, -50, 0),
                material = {surface = material.diffuse {color = 0.7}},
            },
            shape.sphere {
                radius = 1, position = vector(0, 3, 0),
                material = {surface = material.emissive {color = 2}},
            },
            shape.sphere {
                radius = 0.8, position = vector(1.5, 0.8, 0),
                material = {surface = material.diffuse {color = 0.4}},
            },
        },
    },
}
"""


def render(tmp_path, algo, spp, extra=""):
    src = SCENE % {"algo": algo, "spp": spp, "extra": extra}
    path = tmp_path / f"{algo}.lua"
    path.write_text(src)
    pd = load_project(str(path))
    scene = build_scene(pd)
    if algo == "simple":
        from pyrite_tpu.renderers import simple as mod
    elif algo == "bidirectional":
        from pyrite_tpu.renderers import bidirectional as mod
    else:
        from pyrite_tpu.renderers import photon as mod
    film, acc, wt = mod.render(pd, scene, seed=3, max_samples=spp)
    return np.asarray(film.develop(acc, wt)).mean(axis=2)


def test_bdpt_camera_side_matches_simple(tmp_path, monkeypatch):
    """With splats and connections contributing their own weighted samples,
    the estimators differ per-pixel at low spp; but the BDPT camera-side
    transport must match the simple renderer when the extra techniques are
    disabled."""
    from pyrite_tpu.renderers import bidirectional as bd

    simple_img = render(tmp_path, "simple", 250)
    monkeypatch.setattr(
        bd, "_light_splats",
        lambda scene, film, camera, cfg, key, path, wl, pp, aux, acc, wt: (acc, wt),
    )
    bdpt_img = render(tmp_path, "bidirectional", 250, extra=", light_bounces = 4")
    lit = simple_img > 0.02
    rel = np.abs(simple_img - bdpt_img)[lit] / simple_img[lit]
    assert np.median(rel) < 0.25


def test_bdpt_runs_and_produces_light(tmp_path):
    img = render(tmp_path, "bidirectional", 24, extra=", light_bounces = 4")
    assert img.max() > 0.05
    assert np.isfinite(img).all()


def test_photon_mapping_runs_and_produces_light(tmp_path):
    img = render(
        tmp_path,
        "photon_mapping",
        4,
        extra=", photons = 1500, photon_bounces = 4, radius = 0.4",
    )
    assert img.max() > 0.01
    assert np.isfinite(img).all()
    # the emissive ball must be directly visible
    assert img[:8].max() > 0.1


def test_cluster_path_matches_dense_without_native(tmp_path, monkeypatch):
    """With the native builder unavailable and the cluster threshold lowered,
    the numpy clustered-BVH path must render the same image as the dense
    sweep. Hits agree on prim identity everywhere; t can differ by ULPs
    (XLA fuses the two paths differently), which at low spp can flip an
    occasional occlusion test — so a handful of pixels may diverge."""
    import pyrite_tpu.scene as scene_mod
    import pyrite_tpu.tracer as tracer_mod
    from pyrite_tpu import native

    dense_img = render(tmp_path, "simple", 8)

    monkeypatch.setattr(native, "build_bvh_clustered", lambda *a, **k: None)
    monkeypatch.setattr(scene_mod, "CLUSTER_THRESHOLD", 1)
    monkeypatch.setattr(tracer_mod, "BRUTE_FORCE_PRIMS", 1)
    cluster_img = render(tmp_path, "simple", 8)

    close = np.isclose(cluster_img, dense_img, rtol=1e-4, atol=1e-6)
    assert close.mean() > 0.99, f"{(~close).sum()} of {close.size} pixels diverge"
    np.testing.assert_allclose(cluster_img.mean(), dense_img.mean(), rtol=1e-3)
