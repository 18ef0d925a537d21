import numpy as np
import pytest

from pyrite_tpu import exprs, spectra
from pyrite_tpu.project import ir


def make(kind, **fields):
    return ir.ComplexExpression(kind=kind, fields=fields)


def ray_inputs(wavelengths, n=2):
    wl = np.broadcast_to(np.asarray(wavelengths, np.float32), (n, len(wavelengths)))
    return exprs.ProgramInputs(
        wavelength=wl,
        normal=np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1)),
        incident=np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (n, 1)),
        uv=np.zeros((n, 2), np.float32),
    )


def test_constant_program():
    p = exprs.compile_program(0.5, exprs.Resources())
    assert p.constant == 0.5
    assert not p.uses_wavelength
    assert float(p(ray_inputs([500.0]))) == 0.5


def test_builtin_spectrum_times_number():
    expr = make(
        "binary",
        operator="mul",
        lhs=make("spectrum", spectrum=ir.SpectrumIR(format="builtin", builtin="d65")),
        rhs=3.0,
    )
    p = exprs.compile_program(expr, exprs.Resources())
    assert p.uses_wavelength
    out = np.asarray(p(ray_inputs([560.0, 600.0])))
    expected = spectra.d65().sample_np(np.array([560.0, 600.0])) * 3.0
    np.testing.assert_allclose(out[0], expected, rtol=1e-5)


def test_rgb_white_is_flat_spectrum():
    expr = make("rgb", red=1.0, green=1.0, blue=1.0)
    p = exprs.compile_program(expr, exprs.Resources())
    # rgb output coerced to a number samples the Burns basis -> lambda-dependent
    assert p.uses_wavelength
    wl = [420.0, 500.0, 580.0, 660.0]
    out = np.asarray(p(ray_inputs(wl)))
    np.testing.assert_allclose(out, 1.0, atol=0.02)


def test_rgb_red_reflects_red_only():
    expr = make("rgb", red=1.0, green=0.0, blue=0.0)
    p = exprs.compile_program(expr, exprs.Resources())
    out = np.asarray(p(ray_inputs([450.0, 650.0])))
    assert out[0, 1] > 0.6  # strong in the red
    assert out[0, 0] < 0.2  # weak in the blue


def test_fresnel_program_normal_incidence():
    expr = make("fresnel", ior=1.5, env_ior=1.0)
    p = exprs.compile_program(expr, exprs.Resources())
    assert not p.uses_wavelength
    out = np.asarray(p(ray_inputs([500.0])))
    assert out[0, 0] == pytest.approx(0.04, abs=0.001)


def test_mix_with_fresnel_amount():
    # mix(0, 0.2, fresnel(1.1)) from the diamonds scene's plexi material
    expr = make("mix", lhs=0.0, rhs=0.2, amount=make("fresnel", ior=1.1, env_ior=1.0))
    p = exprs.compile_program(expr, exprs.Resources())
    out = np.asarray(p(ray_inputs([500.0])))
    f = ((1.1 - 1.0) / (1.1 + 1.0)) ** 2
    assert out[0, 0] == pytest.approx(0.2 * f, rel=1e-3)


def test_blackbody_program():
    expr = make("blackbody", temperature=4000.0)
    p = exprs.compile_program(expr, exprs.Resources())
    assert p.uses_wavelength
    out = np.asarray(p(ray_inputs([500.0])))
    expected = float(np.asarray(spectra.blackbody(500.0, 4000.0)))
    assert out[0, 0] == pytest.approx(expected, rel=1e-5)


def test_vector_output_and_rgb_decode():
    # normal-map style program: rgb(0.5, 1, 0) decoded to a vector via x*2-1
    expr = make("rgb", red=0.5, green=1.0, blue=0.0)
    p = exprs.compile_program(expr, exprs.Resources(), output_type=exprs.VECTOR)
    out = np.asarray(p(ray_inputs([500.0])))
    np.testing.assert_allclose(out[..., :3], [0.0, 1.0, -1.0], atol=1e-6)


def test_vector_times_vector():
    lhs = make("vector", x=1.0, y=-1.0, z=1.0, w=0.0)
    rhs = make("vector", x=2.0, y=3.0, z=4.0, w=5.0)
    expr = make("binary", operator="mul", lhs=lhs, rhs=rhs)
    p = exprs.compile_program(expr, exprs.Resources(), output_type=exprs.VECTOR)
    out = np.asarray(p(ray_inputs([500.0])))
    np.testing.assert_allclose(out, [2.0, -3.0, 4.0, 0.0], atol=1e-6)


def test_curve_spectrum_program():
    spec = ir.SpectrumIR(format="curve", points=[(400.0, 0.0), (500.0, 1.0), (600.0, 0.0)])
    expr = make("spectrum", spectrum=spec)
    p = exprs.compile_program(expr, exprs.Resources())
    out = np.asarray(p(ray_inputs([450.0, 500.0, 700.0])))
    np.testing.assert_allclose(out[0], [0.5, 1.0, 0.0], atol=1e-6)


def test_bicubic_texture_sampling_flat_region():
    # constant image should sample constant everywhere
    data = np.full((8, 8, 4), 0.25, np.float32)
    uv = np.array([[0.1, 0.2], [0.9, 0.7], [0.5, 0.5]], np.float32)
    out = np.asarray(exprs.sample_texture_bicubic(data, uv))
    np.testing.assert_allclose(out, 0.25, atol=1e-6)


def _cubic_ref(v1, v2, v3, v4, t):
    a = (v4 - v3) - (v1 - v2)
    b = (v1 - v2) - a
    c = v3 - v1
    d = v2
    return d + (c + (b + a * t) * t) * t


def test_bicubic_matches_scalar_reference():
    rng = np.random.default_rng(0)
    data = rng.random((6, 9)).astype(np.float32)
    h, w = data.shape
    uv = rng.random((20, 2)).astype(np.float32)
    out = np.asarray(exprs.sample_texture_bicubic(data, uv))

    for k in range(len(uv)):
        x = uv[k, 0] * w - 0.5
        xf = np.floor(x)
        y = (1.0 - uv[k, 1]) * h - 0.5
        yf = np.floor(y)

        def wrap(f, size):
            i2 = int(f) % size
            i1 = size - 1 if i2 == 0 else i2 - 1
            i3 = 0 if i2 == size - 1 else i2 + 1
            i4 = 0 if i3 == size - 1 else i3 + 1
            return [i1, i2, i3, i4]

        xs = wrap(xf, w)
        ys = wrap(yf, h)
        cols = [
            _cubic_ref(*(data[yi, xi] for xi in xs), x - xf) for yi in ys
        ]
        expected = _cubic_ref(*cols, y - yf)
        assert out[k] == pytest.approx(expected, abs=1e-5)
