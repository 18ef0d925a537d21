import numpy as np
import pytest

from pyrite_tpu import spectra


def test_array_spectrum_clamps_to_endpoints():
    s = spectra.make_array_spectrum(400.0, 700.0, [1.0, 2.0, 3.0, 4.0])
    assert s.sample_np(350.0) == pytest.approx(1.0)
    assert s.sample_np(750.0) == pytest.approx(4.0)
    assert s.sample_np(400.0) == pytest.approx(1.0)
    assert s.sample_np(700.0) == pytest.approx(4.0)
    # midpoint of [400, 700] with 4 points: index 1.5 -> 2.5
    assert s.sample_np(550.0) == pytest.approx(2.5)


def test_curve_spectrum_zero_outside():
    s = spectra.make_curve_spectrum([(400, 0.0), (500, 1.0), (600, 0.0)])
    assert s.sample_np(399.0) == 0.0
    assert s.sample_np(601.0) == 0.0
    # strictly zero AT the endpoints, like the reference Interpolated
    assert s.sample_np(400.0) == 0.0
    assert s.sample_np(600.0) == 0.0
    assert s.sample_np(450.0) == pytest.approx(0.5)
    assert s.sample_np(500.0) == pytest.approx(1.0)


def test_cie_response_peaks():
    resp = spectra.xyz_response()
    wl = np.arange(360.0, 831.0)
    xyz = resp.sample_np(wl)
    # y-bar peaks near 555 nm with value ~1
    peak = wl[np.argmax(xyz[:, 1])]
    assert 552.0 <= peak <= 558.0
    assert np.max(xyz[:, 1]) == pytest.approx(1.0, abs=0.01)


def test_rgb_basis_partition_of_unity():
    # Burns basis: r+g+b curves sum to ~1 at every wavelength (reflectance of
    # white). Check in the visible range.
    basis = spectra.rgb_basis()
    wl = np.arange(400.0, 700.0, 5.0)
    vals = basis.sample_np(wl)
    assert vals.shape == (len(wl), 3)
    np.testing.assert_allclose(vals.sum(axis=1), 1.0, atol=0.02)


def test_blackbody_wien_displacement():
    # peak of Planck's law at T=5000K is ~579.6 nm (Wien: b/T)
    wl = np.arange(300.0, 1200.0, 1.0)
    vals = np.asarray(spectra.blackbody(wl, 5000.0))
    assert abs(wl[np.argmax(vals)] - 579.6) < 2.0


def test_fresnel_normal_incidence_and_tir():
    n = np.array([[0.0, 0.0, 1.0]])
    inc = np.array([[0.0, 0.0, -1.0]])
    r = np.asarray(spectra.fresnel(1.5, 1.0, n, inc))
    r0 = ((1.5 - 1.0) / (1.5 + 1.0)) ** 2
    assert r[0] == pytest.approx(r0, rel=1e-5)

    # grazing exit beyond critical angle -> total internal reflection
    inc_grazing = np.array([[np.sin(np.deg2rad(80)), 0.0, np.cos(np.deg2rad(80))]])
    r = np.asarray(spectra.fresnel(1.5, 1.0, n, inc_grazing))
    assert r[0] == pytest.approx(1.0)


def test_development_white_is_neutral():
    # A flat (equal-energy) spectrum should develop to a neutral gray:
    # x ~= y ~= z for CIE E illuminant.
    bins = np.full((1, 64), 0.2, np.float32)
    xyz = np.asarray(spectra.spectrum_to_xyz(bins, (380.0, 780.0), 2.0))
    assert xyz.shape == (1, 3)
    assert xyz[0, 0] == pytest.approx(xyz[0, 1], rel=0.07)
    assert xyz[0, 2] == pytest.approx(xyz[0, 1], rel=0.12)
    rgb = np.asarray(spectra.develop_to_srgb(bins, (380.0, 780.0), 2.0))
    assert np.all(rgb >= 0.0) and np.all(rgb <= 1.0)
    assert np.ptp(rgb) < 0.12  # close to gray


def test_binned_sample_outside_span_is_zero():
    bins = np.ones((64,), np.float32)
    vals = np.asarray(
        spectra.sample_binned(bins, (380.0, 780.0), np.array([300.0, 500.0, 800.0]))
    )
    np.testing.assert_allclose(vals, [0.0, 1.0, 0.0])


def test_array_spectrum_fast_path_matches_gather_path():
    # The masked-weight contraction fast path only engages for 1-D tables
    # <=128 entries sampled at >=4096 wavelengths; make sure it agrees with
    # the plain gather/lerp path bit-for-bit-ish on the same wavelengths.
    rng = np.random.default_rng(0)
    table = rng.uniform(0.0, 2.0, 97).astype(np.float32)
    sp = spectra.ArraySpectrum(380.0, 780.0, table)
    wl = rng.uniform(300.0, 860.0, 5000).astype(np.float32)  # incl. clamping
    fast = np.asarray(sp.sample(wl))
    slow = np.concatenate(
        [np.asarray(sp.sample(wl[i : i + 500])) for i in range(0, 5000, 500)]
    )
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-6)


def test_curve_spectrum_fast_path_matches_interp_path():
    # Same deal for the per-segment masked lerp on curve spectra (<=64 pts).
    rng = np.random.default_rng(1)
    xs = np.sort(rng.uniform(400.0, 700.0, 17)).astype(np.float32)
    ys = rng.uniform(0.0, 1.0, 17).astype(np.float32)
    sp = spectra.CurveSpectrum(xs, ys)
    wl = rng.uniform(350.0, 750.0, 5000).astype(np.float32)
    wl[:3] = [xs[0], xs[-1], xs[8]]  # endpoint + knot behavior
    fast = np.asarray(sp.sample(wl))
    slow = np.concatenate(
        [np.asarray(sp.sample(wl[i : i + 500])) for i in range(0, 5000, 500)]
    )
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-6)
    # strictly-outside rule: 0 AT the endpoints too
    assert fast[0] == 0.0 and fast[1] == 0.0


def test_burns_round_trip_under_d65():
    """Closed-form Burns round trip (program/instruction.rs RgbSpectrumValue
    + data/srgb_cie1931.csv): reflectance = basis @ rgb, lit by D65 and
    integrated against the CIE observer, must develop back to ~rgb in linear
    sRGB (white-normalized). The baked basis + 2-degree observer carry an
    inherent ~0.15 leakage on pure primaries (e.g. green develops with
    r~0.15) — the reference shares these exact tables, so the tolerance
    documents the basis, not an implementation error."""
    import jax.numpy as jnp

    from pyrite_tpu import spectra as sp

    wl = jnp.arange(380.0, 781.0, 2.0)
    basis = sp.rgb_basis().sample(wl)  # [T, 3]
    d65 = sp.d65().sample(wl)
    resp = sp.xyz_response().sample(wl)
    trap = np.full(len(wl), 1.0, np.float32)
    trap[0] = 0.5
    trap[-1] = 0.5
    w = jnp.asarray(trap * 2.0)

    def to_linear(vals):
        xyz = jnp.einsum("t,tc,t->c", vals, resp, w)
        return np.asarray(sp.XYZ_TO_LINEAR_SRGB @ np.asarray(xyz))

    white_y = to_linear(d65)[1]
    for rgb in [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0), (0.3, 0.6, 0.2)]:
        refl = basis @ jnp.asarray(rgb, jnp.float32)
        # reflectance stays physical
        assert float(refl.min()) >= -1e-4 and float(refl.max()) <= 1.01
        lin = to_linear(refl * d65) / white_y
        assert np.abs(lin - np.asarray(rgb)).max() < 0.16, (rgb, lin)
