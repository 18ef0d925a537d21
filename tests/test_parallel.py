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


BDPT_SCENE = SCENE.replace(
    "renderer.simple {", "renderer.bidirectional {"
).replace("light_samples = 2,", "light_samples = 2, light_bounces = 3,")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_bdpt_matches_single_device(tmp_path):
    from pyrite_tpu.renderers import bidirectional

    path = tmp_path / "scene.lua"
    path.write_text(BDPT_SCENE)
    pd = load_project(str(path))
    scene = build_scene(pd)

    film, acc1, wt1 = bidirectional.render(pd, scene, seed=0, max_samples=48)
    single = np.asarray(film.develop(acc1, wt1)).mean(axis=2)

    from pyrite_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices()[:8])
    film, acc8, wt8 = bidirectional.render_sharded(
        pd, scene, mesh, seed=1, max_samples=48
    )
    sharded = np.asarray(film.develop(acc8, wt8)).mean(axis=2)

    assert np.asarray(wt8).sum() > 0
    lit = single > 0.05
    rel = np.abs(single - sharded)[lit] / single[lit]
    assert np.median(rel) < 0.2


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_renders_exact_sample_count(tmp_path):
    """13 samples on 8 devices: the remainder group masks off 3 devices, so
    exactly 13 samples land on the film (renderer/simple.rs:58-78 bar)."""
    path = tmp_path / "scene.lua"
    path.write_text(SCENE)
    pd = load_project(str(path))
    scene = build_scene(pd)

    from pyrite_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices()[:8])
    film, acc, wt = simple.render_sharded(pd, scene, mesh, seed=0, max_samples=13)
    # the scene has no dispersive materials, so every sample exposes exactly
    # spectrum_samples unit weights per lane
    expected = 13 * 16 * 16 * 4
    assert float(np.asarray(wt).sum()) == expected


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_checkpoint_resume_roundtrip(tmp_path, monkeypatch):
    """Kill/resume: a sharded render checkpointed at 8 samples and resumed to
    16 must accumulate exactly 16 samples and match an uninterrupted sharded
    render statistically. Pinned to the one-shot scheduler: its RNG stream is
    indexed per sample group, so resume is bit-exact (regen draws depend on
    launch partitioning — its resume exactness is sample-count-level, covered
    by test_sharded_regen_matches_single_device)."""
    path = tmp_path / "scene.lua"
    path.write_text(SCENE)
    pd = load_project(str(path))
    scene = build_scene(pd)
    monkeypatch.setattr(simple, "regen_enabled", lambda: False)

    from pyrite_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices()[:8])
    film, acc_a, wt_a = simple.render_sharded(pd, scene, mesh, seed=5, max_samples=8)
    resume = {
        "acc": np.asarray(acc_a),
        "wt": np.asarray(wt_a),
        "samples_done": 8,
    }
    film, acc_b, wt_b = simple.render_sharded(
        pd, scene, mesh, seed=5, max_samples=16, resume=resume
    )
    assert float(np.asarray(wt_b).sum()) == 16 * 16 * 16 * 4

    film, acc_c, wt_c = simple.render_sharded(pd, scene, mesh, seed=5, max_samples=16)
    resumed = np.asarray(film.develop(acc_b, wt_b)).mean(axis=2)
    straight = np.asarray(film.develop(acc_c, wt_c)).mean(axis=2)
    # identical RNG stream for the first 8 samples and the same per-group
    # fold_in indices afterwards -> the two films agree exactly
    np.testing.assert_allclose(resumed, straight, rtol=1e-5, atol=1e-7)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_photon_runs(tmp_path):
    from pyrite_tpu.renderers import photon

    src = SCENE.replace(
        "renderer.simple {",
        "renderer.photon_mapping {",
    ).replace(
        "light_samples = 2,",
        "light_samples = 2, photons = 800, photon_bounces = 3, radius = 0.4,",
    )
    path = tmp_path / "scene.lua"
    path.write_text(src)
    pd = load_project(str(path))
    scene = build_scene(pd)

    from pyrite_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices()[:8])
    film, acc, wt = photon.render_sharded(pd, scene, mesh, seed=0, max_samples=8)
    img = np.asarray(film.develop(acc, wt)).mean(axis=2)
    assert img.max() > 0.01
    assert np.isfinite(img).all()


POOLED_SCENE = SCENE.replace("bounces = 3,", "bounces = 24,")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_pooled_matches_single_device(tmp_path, monkeypatch):
    """Deep-bounce budgets (>= POOL_MIN_BOUNCES) take the survivor-pool
    scheduler; the sharded path keeps one pool per shard and must agree with
    the single-device pooled render statistically. Also checks exact sample
    accounting (total weight = samples x pixels x spectrum samples)."""
    path = tmp_path / "scene.lua"
    path.write_text(POOLED_SCENE)
    pd = load_project(str(path))
    scene = build_scene(pd)
    assert pd.project.renderer.bounces >= simple.POOL_MIN_BOUNCES
    # pin the scheduler under test (regen would otherwise take both paths)
    monkeypatch.setattr(simple, "regen_enabled", lambda: False)

    film, acc1, wt1 = simple.render(pd, scene, seed=0, max_samples=40)
    single = np.asarray(film.develop(acc1, wt1)).mean(axis=2)

    from pyrite_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices()[:8])
    film, acc8, wt8 = simple.render_sharded(pd, scene, mesh, seed=1, max_samples=40)
    sharded = np.asarray(film.develop(acc8, wt8)).mean(axis=2)

    # every lane exposed exactly once in both schedulers
    expected_wt = 40 * 16 * 16 * pd.project.renderer.spectrum_samples
    assert np.asarray(wt1).sum() == pytest.approx(expected_wt)
    assert np.asarray(wt8).sum() == pytest.approx(expected_wt)

    lit = single > 0.05
    rel = np.abs(single - sharded)[lit] / single[lit]
    assert np.median(rel) < 0.2


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_regen_matches_single_device(tmp_path):
    """The regeneration scheduler over the mesh (one regen wavefront per
    device, per-device sample targets as a sharded array) must agree with
    the single-device regen render and honor exact sample counts even when
    the total doesn't divide by the device count."""
    path = tmp_path / "scene.lua"
    path.write_text(SCENE)
    pd = load_project(str(path))
    scene = build_scene(pd)
    assert not scene.use_clusters and simple.regen_enabled()

    film, acc1, wt1 = simple.render(pd, scene, seed=0, max_samples=61)
    single = np.asarray(film.develop(acc1, wt1)).mean(axis=2)

    from pyrite_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices()[:8])
    film, acc8, wt8 = simple.render_sharded(pd, scene, mesh, seed=1, max_samples=61)
    sharded = np.asarray(film.develop(acc8, wt8)).mean(axis=2)

    expected_wt = 61 * 16 * 16 * pd.project.renderer.spectrum_samples
    assert np.asarray(wt1).sum() == pytest.approx(expected_wt)
    assert np.asarray(wt8).sum() == pytest.approx(expected_wt)

    lit = single > 0.05
    rel = np.abs(single - sharded)[lit] / single[lit]
    assert np.median(rel) < 0.2

    # checkpoint/resume under regen: sample accounting stays exact
    # (max_samples is capped by the scene's pixel_samples = 64)
    resume = {"acc": np.asarray(acc8), "wt": np.asarray(wt8), "samples_done": 61}
    film, acc_r, wt_r = simple.render_sharded(
        pd, scene, mesh, seed=1, max_samples=64, resume=resume
    )
    expected_wt = 64 * 16 * 16 * pd.project.renderer.spectrum_samples
    assert np.asarray(wt_r).sum() == pytest.approx(expected_wt)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_regen_bdpt_matches_single_device(tmp_path):
    """Deep-camera-budget BDPT over the mesh rides per-device camera
    regeneration (_render_regen_bdpt_sharded): per-device lamp rounds and
    sample targets, remainder split exactly, one psum film merge."""
    from pyrite_tpu.renderers import bidirectional

    deep = BDPT_SCENE.replace("bounces = 3", "bounces = 20")
    path = tmp_path / "scene.lua"
    path.write_text(deep)
    pd = load_project(str(path))
    scene = build_scene(pd)
    assert pd.project.renderer.bounces >= bidirectional.REGEN_BDPT_MIN_BOUNCES

    film, acc1, wt1 = bidirectional.render(pd, scene, seed=0, max_samples=30)
    single = np.asarray(film.develop(acc1, wt1)).mean(axis=2)

    from pyrite_tpu.parallel import make_mesh

    # 30 samples over 4 devices: groups of 4x chunk, remainder split
    mesh = make_mesh(jax.devices()[:4])
    film, acc4, wt4 = bidirectional.render_sharded(
        pd, scene, mesh, seed=1, max_samples=30
    )
    sharded = np.asarray(film.develop(acc4, wt4)).mean(axis=2)

    # same estimator: film weight totals agree up to connection-count noise
    np.testing.assert_allclose(
        np.asarray(wt4).sum(), np.asarray(wt1).sum(), rtol=0.05
    )
    lit = single > 0.05
    rel = np.abs(single - sharded)[lit] / single[lit]
    assert np.median(rel) < 0.25
    np.testing.assert_allclose(single[lit].mean(), sharded[lit].mean(), rtol=0.1)
