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

    # both paths must consume identical RNG streams; the dense path would
    # otherwise take the multi-sample megabatch (different trace keys)
    monkeypatch.setenv("PYRITE_TPU_SAMPLE_BATCH", "1")
    dense_img = render(tmp_path, "simple", 8)

    monkeypatch.setattr(native, "build_bvh_clustered", lambda *a, **k: None)
    monkeypatch.setattr(scene_mod, "CLUSTER_THRESHOLD", 1)
    monkeypatch.setattr(tracer_mod, "BRUTE_FORCE_PRIMS", 1)
    cluster_img = render(tmp_path, "simple", 8)

    close = np.isclose(cluster_img, dense_img, rtol=1e-4, atol=1e-6)
    assert close.mean() > 0.99, f"{(~close).sum()} of {close.size} pixels diverge"
    np.testing.assert_allclose(cluster_img.mean(), dense_img.mean(), rtol=1e-3)


def test_hash_grid_gather_matches_brute_force():
    """The sorted hash-grid 27-cell scan must enumerate exactly the photons
    within the gather radius (vs an O(N*P) brute-force query), as long as no
    cell exceeds the per-cell cap. Replaces the reference kd-tree radius
    query (spatial/kd_tree.rs:47-106; used at photon_mapping.rs:349)."""
    import jax
    import jax.numpy as jnp
    from pyrite_tpu.renderers import photon as ph

    rng = np.random.default_rng(17)
    P, N, radius = 500, 128, 0.35
    p_pos = jnp.asarray(rng.uniform(-3, 3, (P, 3)), jnp.float32)
    p_valid = jnp.asarray(rng.random(P) > 0.2)
    q_pos = jnp.asarray(rng.uniform(-3, 3, (N, 3)), jnp.float32)
    values = jnp.asarray(rng.random(P), jnp.float32)

    order, sorted_keys, starts, ckeys = ph.grid_prepare(p_pos, p_valid, q_pos, radius)

    def body(k, carry):
        total, count = carry
        pj, match = ph.grid_scan_slot(
            k, order, sorted_keys, starts, ckeys, p_valid, p_pos, q_pos, radius
        )
        total = total + jnp.where(match, values[pj], 0.0)
        count = count + match.astype(jnp.int32)
        return total, count

    total, count = jax.lax.fori_loop(
        0, 27 * ph._CELL_CAP, body, (jnp.zeros(N), jnp.zeros(N, jnp.int32))
    )

    d2 = ((np.asarray(p_pos)[None] - np.asarray(q_pos)[:, None]) ** 2).sum(-1)
    in_r = (d2 <= radius * radius) & np.asarray(p_valid)[None]
    # precondition for exactness: no cell over the scan cap
    cells = np.floor(np.asarray(p_pos)[np.asarray(p_valid)] / radius).astype(int)
    _, cell_counts = np.unique(cells, axis=0, return_counts=True)
    assert cell_counts.max() <= ph._CELL_CAP

    np.testing.assert_array_equal(np.asarray(count), in_r.sum(1))
    expect = (np.asarray(values)[None] * in_r).sum(1)
    np.testing.assert_allclose(np.asarray(total), expect, rtol=1e-5)


def test_photon_mapping_tracks_simple_radiance(tmp_path):
    """On the diffuse-only scene, the photon mapper must reproduce the
    simple renderer's radiance DISTRIBUTION (estimator weights
    photon_mapping.rs:47-48,369).

    Note the deliberate tolerance structure: the reference's gather is a
    neighbor-AVERAGING estimator — the photon-density area normalization is
    commented out at photon_mapping.rs:399 (`// (PI * radius * radius)`) and
    each gather divides by num_neighbors — so it does NOT converge to the
    path-traced radiance; it carries a scene-dependent systematic brightness
    factor (~0.5 here, stable across photon counts / passes / radii —
    PARITY.md "Photon-map estimator"). We reproduce the reference estimator,
    so the test pins (a) per-pixel shape agreement after removing that
    global factor and (b) the factor staying inside a stable band."""
    simple_img = render(tmp_path, "simple", 200)
    photon_img = render(
        tmp_path,
        "photon_mapping",
        10,
        extra=", photons = 4000, photon_bounces = 5, photon_passes = 2, radius = 0.25",
    )
    lit = simple_img > 0.05
    assert lit.sum() > 40
    # most pixels agree outright; the estimator's deficit concentrates in
    # the brightest (gather-dominated) regions, dragging the mean ratio down
    rel = np.abs(simple_img - photon_img)[lit] / simple_img[lit]
    assert np.median(rel) < 0.3, f"median rel err {np.median(rel):.3f}"
    ratio = photon_img[lit].mean() / simple_img[lit].mean()
    assert 0.35 < ratio < 0.80, f"brightness ratio {ratio:.3f}"


def test_pooled_scheduler_matches_one_shot(tmp_path, monkeypatch):
    """Deep-bounce scenes use the survivor-pool scheduler (simple.py): dead
    lanes expose at stage end, survivors are stream-compacted into a pool
    that continues across chunks/samples. Every lane must be exposed exactly
    once — total film weight is conserved exactly — and the radiance must
    statistically match the one-shot wavefront."""
    from pyrite_tpu.renderers import simple as simple_mod
    from pyrite_tpu.film import Film
    from pyrite_tpu.project import load_project
    from pyrite_tpu.scene import build_scene

    src = SCENE % {"algo": "simple", "spp": 48, "extra": ""}
    src = src.replace("bounces = 4", "bounces = 20")
    path = tmp_path / "pooled.lua"
    path.write_text(src)

    pd = load_project(str(path))
    scene = build_scene(pd)
    assert pd.project.renderer.bounces >= simple_mod.POOL_MIN_BOUNCES

    film, acc_p, wt_p = simple_mod.render(pd, scene, seed=3, max_samples=48)

    monkeypatch.setattr(simple_mod, "POOL_MIN_BOUNCES", 10_000)
    film, acc_o, wt_o = simple_mod.render(pd, scene, seed=3, max_samples=48)

    # exact invariant: every lane-sample exposed exactly once in both paths
    # (no dispersive materials here, so every wavelength column has weight)
    s = pd.project.renderer.spectrum_samples
    expect_wt = 48 * film.width * film.height * s
    np.testing.assert_allclose(float(np.asarray(wt_p).sum()), expect_wt, rtol=1e-6)
    np.testing.assert_allclose(float(np.asarray(wt_o).sum()), expect_wt, rtol=1e-6)

    img_p = np.asarray(film.develop(acc_p, wt_p)).mean(axis=2)
    img_o = np.asarray(film.develop(acc_o, wt_o)).mean(axis=2)
    lit = img_o > 0.02
    rel = np.abs(img_p - img_o)[lit] / img_o[lit]
    assert np.median(rel) < 0.15, f"median rel {np.median(rel):.3f}"
    np.testing.assert_allclose(img_p[lit].mean(), img_o[lit].mean(), rtol=0.05)
