"""Parity tests for the fused dense-scene bounce kernel (kernels_dense.py).

The kernel is a numerical twin of tracer.bounce_core fed the same PRNG
draws (tracer.draw_bounce_uniforms replicates bounce_core's key
derivation), so state after a bounce must match the XLA path to float
tolerance. Runs the kernel in Pallas interpret mode (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyrite_tpu.project import load_project
from pyrite_tpu.scene import build_scene


@pytest.fixture(scope="module")
def spheres():
    pd = load_project("/root/reference/pyrite/test/spheres/spheres.lua")
    scene = build_scene(pd)
    assert scene.dense_pack is not None
    return pd, scene


def _initial_state(film, camera, cfg, key, rows):
    from pyrite_tpu.renderers.simple import chunk_rays

    _, origin, direction, wavelengths = chunk_rays(
        film, camera, cfg, key, row0=40, rows=rows
    )
    n, s = wavelengths.shape
    state = {
        "origin": origin,
        "direction": direction,
        "brightness": jnp.zeros((n, s)),
        "reflectance": jnp.ones((n, s)),
        "alive": jnp.ones(n, bool),
        "aux_alive": jnp.ones(n, bool),
        "sample_light": jnp.ones(n, bool),
        "light_events": jnp.zeros(n, jnp.int32),
    }
    return state, wavelengths


def test_bounce_dense_matches_bounce_core(spheres, monkeypatch):
    monkeypatch.setenv("PYRITE_TPU_DENSE", "interpret")
    import pyrite_tpu.kernels_dense as kd
    import pyrite_tpu.tracer as T
    from pyrite_tpu.film import Film
    from pyrite_tpu.scene import CameraModel

    pd, scene = spheres
    project = pd.project
    film = Film(width=project.image.width, height=project.image.height,
                bins=project.renderer.spectrum_bins,
                span=project.renderer.spectrum_span)
    camera = CameraModel.from_ir(project.camera)
    cfg = T.TraceConfig(
        bounces=project.renderer.bounces,
        light_samples=project.renderer.light_samples,
        spectrum_samples=project.renderer.spectrum_samples,
    )
    state, wavelengths = _initial_state(
        film, camera, cfg, jax.random.PRNGKey(11), rows=2
    )
    bank_vals = kd.precompute_bank_values(scene, wavelengths)

    # compare each bounce depth from the SAME input state (kernel output is
    # re-synced to the XLA state after each check): float-association noise
    # at binary decision boundaries (u < p) would otherwise diverge single
    # lanes chaotically across bounces
    ref = dict(state)
    for bounce in range(3):
        bkey = jax.random.fold_in(jax.random.PRNGKey(5), bounce)
        ker = kd.bounce_dense(scene, cfg, wavelengths, dict(ref), bkey, bank_vals)
        ref, _ = T.bounce_core(scene, cfg, wavelengths, ref, bkey)

        for k in ("alive", "aux_alive", "sample_light", "light_events"):
            np.testing.assert_array_equal(
                np.asarray(ref[k]), np.asarray(ker[k]),
                err_msg=f"bounce {bounce}: {k}",
            )
        for k in ("origin", "direction", "reflectance"):
            np.testing.assert_allclose(
                np.asarray(ref[k]), np.asarray(ker[k]),
                rtol=1e-3, atol=1e-4, err_msg=f"bounce {bounce}: {k}",
            )
        # NEE shadow tests against the sphere lamp sit within float noise of
        # the eps margin (t^2 vs sqd - eps for lamp self-hits): a handful of
        # lanes legitimately flip blocked between backends. Require lane-level
        # agreement for ~99% of lanes and a tight total-energy match.
        rb = np.asarray(ref["brightness"])
        kb = np.asarray(ker["brightness"])
        lane_bad = (np.abs(rb - kb) > 1e-4 + 1e-3 * np.abs(rb)).any(axis=1)
        assert lane_bad.mean() < 0.015, (
            f"bounce {bounce}: {lane_bad.sum()} divergent lanes"
        )
        assert abs(rb.sum() - kb.sum()) < 0.005 * max(rb.sum(), 1e-6) + 1e-3, (
            f"bounce {bounce}: energy {rb.sum():.4f} vs {kb.sum():.4f}"
        )


def test_trace_paths_rides_dense_kernel(spheres, monkeypatch):
    """End-to-end: trace_paths with the kernel enabled must statistically
    match the XLA path (identical draws -> identical radiance)."""
    import pyrite_tpu.kernels_dense as kd
    import pyrite_tpu.tracer as T
    from pyrite_tpu.film import Film
    from pyrite_tpu.scene import CameraModel

    pd, scene = spheres
    project = pd.project
    film = Film(width=project.image.width, height=project.image.height,
                bins=project.renderer.spectrum_bins,
                span=project.renderer.spectrum_span)
    camera = CameraModel.from_ir(project.camera)
    cfg = T.TraceConfig(bounces=4, light_samples=2, spectrum_samples=6)
    state, wavelengths = _initial_state(
        film, camera, cfg, jax.random.PRNGKey(3), rows=2
    )

    monkeypatch.setenv("PYRITE_TPU_DENSE", "0")
    b_ref, aux_ref = T.trace_paths(
        scene, cfg, jax.random.PRNGKey(9), state["origin"],
        state["direction"], wavelengths,
    )
    monkeypatch.setenv("PYRITE_TPU_DENSE", "interpret")
    b_ker, aux_ker = T.trace_paths(
        scene, cfg, jax.random.PRNGKey(9), state["origin"],
        state["direction"], wavelengths,
    )
    rb, kb = np.asarray(b_ref), np.asarray(b_ker)
    lane_bad = (np.abs(rb - kb) > 1e-4 + 1e-3 * np.abs(rb)).any(axis=1)
    # boundary-chaos lanes accumulate over 4 bounces (see the single-bounce
    # test's comment); the wavefront-level radiance must still agree
    assert lane_bad.mean() < 0.05, f"{lane_bad.sum()} divergent lanes"
    assert abs(rb.sum() - kb.sum()) < 0.01 * max(rb.sum(), 1e-6) + 1e-3
    assert (np.asarray(aux_ref) == np.asarray(aux_ker)).mean() > 0.98
