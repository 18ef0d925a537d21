"""Statistical golden test against the reference's committed render.

The Rust reference can't run in this image (no cargo), so the committed
hq_example.png renders are the ground truth. RNGs differ, so comparison is
statistical: block-averaged radiance of our low-spp render vs the reference's
high-spp image (SURVEY.md section 4/6 strategy).
"""

import numpy as np
import pytest
from PIL import Image

from pyrite_tpu.project import load_project
from pyrite_tpu.scene import build_scene
from pyrite_tpu.renderers import simple

REF_SPHERES = "/root/reference/pyrite/test/spheres"


def _downscale(img, blocks_y, blocks_x):
    h, w = img.shape[:2]
    return (
        img[: h // blocks_y * blocks_y, : w // blocks_x * blocks_x]
        .reshape(blocks_y, h // blocks_y, blocks_x, w // blocks_x, -1)
        .mean(axis=(1, 3))
    )


def test_spheres_matches_reference_blocks():
    pd = load_project(f"{REF_SPHERES}/spheres.lua")
    pd.project.image.width = 128
    pd.project.image.height = 64
    scene = build_scene(pd)
    film, acc, wt = simple.render(pd, scene, seed=0, max_samples=48)
    mine = film.to_image(acc, wt, step_size=2.0).astype(float)

    ref = np.asarray(
        Image.open(f"{REF_SPHERES}/hq_example.png").convert("RGB"), float
    )

    m = _downscale(mine, 8, 16)
    r = _downscale(ref, 8, 16)

    # sRGB means per 8x16 block; at 48spp the noise per block (64x32 px) is
    # small. Absolute tolerance dominated by spp difference on the dim floor.
    diff = np.abs(m - r)
    frac_close = (diff < 30.0).mean()
    assert frac_close > 0.85, f"only {frac_close:.2f} of blocks within 30/255"

    # structural checks: emissive ball brightest at center, colored balls on
    # the correct sides (orange left, green right — matches the reference)
    mid_row = m[3]
    assert mid_row[7:9].mean() > 200  # white ball
    left = m[2:5, 3:6]
    right = m[2:5, 10:13]
    assert left[..., 0].mean() > left[..., 2].mean() * 1.3  # red/orange left
    assert right[..., 1].mean() > right[..., 2].mean() * 1.3  # green right


REF_CORNELL = "/root/reference/pyrite/test/cornell"


def test_cornell_matches_reference_blocks():
    """Cornell box (BDPT + mesh + quaternion-Julia fractal + blackbody white
    balance) against the committed hq_example.png, block statistics at low
    res/spp. The committed image predates the fractal in cornell.lua
    (PARITY.md "Environment-driven differences"), so the center blocks where
    the fractal renders are masked; the walls, ceiling light and floor carry
    the comparison."""
    from pyrite_tpu.cli import make_develop_sample_fn
    from pyrite_tpu.renderers import bidirectional

    pd = load_project(f"{REF_CORNELL}/cornell.lua")
    pd.project.image.width = 48
    pd.project.image.height = 48
    scene = build_scene(pd)
    # the blackbody white-balance pipeline is part of the reference output
    sample_fn = make_develop_sample_fn(pd, scene, pd.project.renderer.spectrum_span)
    assert sample_fn is not None
    film, acc, wt = bidirectional.render(pd, scene, seed=0, max_samples=10)
    mine = np.asarray(film.to_image(acc, wt, 2.0, sample_fn), float)

    ref = np.asarray(
        Image.open(f"{REF_CORNELL}/hq_example.png").convert("RGB").resize((48, 48)),
        float,
    )

    m = _downscale(mine, 8, 8)
    r = _downscale(ref, 8, 8)

    # mask the fractal footprint (center columns below the ceiling)
    mask = np.ones((8, 8), bool)
    mask[1:8, 2:6] = False

    diff = np.abs(m - r).mean(axis=2)
    frac_close = (diff[mask] < 40.0).mean()
    assert frac_close > 0.85, f"only {frac_close:.2f} of blocks within 40/255\n{diff.astype(int)}"

    # structural checks: red wall left, green wall right, lit ceiling.
    # (the white-balance warms the image, so green-vs-red on the green wall
    # is a modest ratio — 116 vs 91 at this resolution)
    left = m[2:6, 0]
    right = m[2:6, 7]
    assert (left[:, 0] > left[:, 1] * 1.5).all(), left.astype(int)
    assert (right[:, 1] > right[:, 0] * 1.1).all(), right.astype(int)
    top = m[0, 3:5]
    assert top.mean() > 90, top.astype(int)  # light + lit ceiling blocks


_RGB_BALLS = [
    (1, 0, 0), (1, 1, 0), (0, 1, 0), (0, 1, 1), (0, 0, 1), (1, 0, 1),
]


def _ball_chromas(scene_path, spp):
    """Render one of the rgb_* scenes small and return the pre-clip linear
    RGB chromaticity of each ball's core (the most saturated pixels per
    column sextant — saturation picking avoids both the white D65 emitter
    balls and the gray backdrop)."""
    from pyrite_tpu.spectra import spectrum_to_xyz, xyz_to_linear_srgb

    pd = load_project(scene_path)
    pd.project.image.width = 256
    pd.project.image.height = 64
    scene = build_scene(pd)
    film, acc, wt = simple.render(pd, scene, seed=0, max_samples=spp)
    xyz = spectrum_to_xyz(film.develop(acc, wt), film.span, 2.0)
    lin = np.asarray(xyz_to_linear_srgb(xyz))
    chromas = []
    for k in range(6):
        band = lin[:48, k * 256 // 6 : (k + 1) * 256 // 6].reshape(-1, 3)
        band = np.maximum(band, 0.0)
        luminance = band.sum(axis=1)
        usable = band[luminance > np.percentile(luminance, 50)]
        norm = usable / np.maximum(usable.sum(axis=1, keepdims=True), 1e-9)
        sat = norm.max(axis=1) - norm.min(axis=1)
        core = norm[sat >= np.percentile(sat, 90)]
        chromas.append(core.mean(axis=0))
    return chromas


def _assert_channel_structure(chromas, scale):
    for k, rgb in enumerate(_RGB_BALLS):
        on = [c for c, bit in zip(chromas[k], rgb) if bit]
        off = [c for c, bit in zip(chromas[k], rgb) if not bit]
        assert min(on) > scale * max(0.01, max(off)), (
            f"ball {k}: chromaticity {chromas[k]} vs pattern {rgb}"
        )


def test_rgb_reflection_hues():
    """Radiance-level check of Burns RGB->spectrum reflectance
    (program/instruction.rs RgbSpectrumValue) through the full transport:
    rgb_reflection.lua lights six diffuse balls of known rgb() reflectance
    with D65. Every configured channel must dominate every unconfigured one
    (the exact closed-form round trip, without transport/ambient mixing, is
    tests/test_spectra.py::test_burns_round_trip_under_d65). No committed
    reference render exists for this scene."""
    chromas = _ball_chromas(
        "/root/reference/pyrite/test/rgb_reflection/rgb_reflection.lua", 24
    )
    _assert_channel_structure(chromas, 2.0)


def test_rgb_emission_hues():
    """rgb_emission.lua: the same six colors as raw emission spectra. Burns'
    basis is a REFLECTANCE basis, so emission does not round-trip exactly
    (mixed colors skew toward red — the basis functions are not weighted by
    primary luminance; the reference shares this behavior, it evaluates the
    identical RgbSpectrumValue instruction). Assert channel structure only."""
    chromas = _ball_chromas(
        "/root/reference/pyrite/test/rgb_emission/rgb_emission.lua", 12
    )
    _assert_channel_structure(chromas, 2.5)


REF_TEXTURES = "/root/reference/pyrite/test/textures"
REF_COLORS = "/root/reference/pyrite/test/colors"
REF_DIAMONDS = "/root/reference/pyrite/test/diamonds"


def test_textures_matches_reference_blocks():
    """Textures scene (bicubic color/normal maps + texture_scale) against the
    committed hq_example.png: block statistics at low res/spp."""
    pd = load_project(f"{REF_TEXTURES}/textures.lua")
    pd.project.image.width = 128
    pd.project.image.height = 64
    scene = build_scene(pd)
    film, acc, wt = simple.render(pd, scene, seed=0, max_samples=24)
    mine = film.to_image(acc, wt, step_size=2.0).astype(float)

    ref = np.asarray(
        Image.open(f"{REF_TEXTURES}/hq_example.png").convert("RGB").resize((128, 64)),
        float,
    )
    m = _downscale(mine, 8, 16)
    r = _downscale(ref, 8, 16)
    diff = np.abs(m - r).mean(axis=2)
    frac_close = (diff < 40.0).mean()
    assert frac_close > 0.8, f"only {frac_close:.2f} blocks within 40/255\n{diff.astype(int)}"


def test_colors_narrow_band_spheres():
    """Colors scene (12 narrow-band glass spheres, BDPT): block statistics
    against the committed image plus a saturation structure check — narrow
    spectral bands must develop to saturated, hue-varied colors."""
    from pyrite_tpu.renderers import bidirectional

    pd = load_project(f"{REF_COLORS}/colors.lua")
    pd.project.image.width = 96
    pd.project.image.height = 96
    scene = build_scene(pd)
    film, acc, wt = bidirectional.render(pd, scene, seed=0, max_samples=24)
    mine = film.to_image(acc, wt, step_size=2.0).astype(float)

    ref = np.asarray(
        Image.open(f"{REF_COLORS}/hq_example.png").convert("RGB").resize((96, 96)),
        float,
    )
    m = _downscale(mine, 8, 8)
    r = _downscale(ref, 8, 8)
    diff = np.abs(m - r).mean(axis=2)
    frac_close = (diff < 45.0).mean()
    assert frac_close > 0.75, f"only {frac_close:.2f} blocks within 45/255\n{diff.astype(int)}"

    # spectral-purity structure: among bright pixels, hues must span red,
    # green and blue dominances (narrow bands survive development)
    bright = mine.reshape(-1, 3)
    bright = bright[bright.sum(axis=1) > 150]
    assert len(bright) > 50
    norm = bright / np.maximum(bright.sum(axis=1, keepdims=True), 1e-9)
    assert (norm.argmax(axis=1) == 0).any()
    assert (norm.argmax(axis=1) == 1).any()
    assert (norm.argmax(axis=1) == 2).any()


def test_diamonds_survivor_pool_blocks():
    """Diamonds scene (256-bounce dispersion + DoF — exercises the
    survivor-pool scheduler end to end on CPU) against the committed image."""
    pd = load_project(f"{REF_DIAMONDS}/diamonds.lua")
    pd.project.image.width = 96
    pd.project.image.height = 56
    scene = build_scene(pd)
    assert pd.project.renderer.bounces >= simple.POOL_MIN_BOUNCES
    film, acc, wt = simple.render(pd, scene, seed=0, max_samples=12)
    mine = film.to_image(acc, wt, step_size=2.0).astype(float)

    ref = np.asarray(
        Image.open(f"{REF_DIAMONDS}/hq_example.png").convert("RGB").resize((96, 56)),
        float,
    )
    m = _downscale(mine, 7, 12)
    r = _downscale(ref, 7, 12)
    diff = np.abs(m - r).mean(axis=2)
    frac_close = (diff < 45.0).mean()
    assert frac_close > 0.75, f"only {frac_close:.2f} blocks within 45/255\n{diff.astype(int)}"


def test_spheres_chi_square_vs_reference():
    """The SURVEY section-4 statistical bar: per-pixel chi-square in LINEAR
    radiance, with per-pixel variance estimated from independent renders
    (different seeds). Two levels:
    - self-consistency (disjoint seed groups) must be ~1 per pixel — the
      estimator is unbiased across RNG streams;
    - against the committed reference image a lenient bound still catches
      gross estimator errors (a missing NEE term or wrong BRDF factor
      shifts pixels by tens of sigma); the tolerance absorbs the documented
      environment drift of the committed renders (PARITY.md)."""
    from pyrite_tpu.spectra import spectrum_to_xyz, xyz_to_linear_srgb

    pd = load_project(f"{REF_SPHERES}/spheres.lua")
    pd.project.image.width = 64
    pd.project.image.height = 32
    scene = build_scene(pd)

    runs = []
    for seed in range(6):
        film, acc, wt = simple.render(pd, scene, seed=seed, max_samples=24)
        xyz = spectrum_to_xyz(film.develop(acc, wt), film.span, 2.0)
        runs.append(np.asarray(xyz_to_linear_srgb(xyz)).mean(axis=2))
    runs = np.stack(runs)  # [R, H, W]
    mu = runs.mean(axis=0)
    var_mean = runs.var(axis=0, ddof=1) / len(runs)  # variance of the mean

    # self-consistency: disjoint halves of the seed pool
    a = runs[:3].mean(axis=0)
    b = runs[3:].mean(axis=0)
    var_ab = runs[:3].var(axis=0, ddof=1) / 3 + runs[3:].var(axis=0, ddof=1) / 3
    ok_ab = (var_ab > 1e-8) & (a > 0.01) & (a < 0.85)
    self_chi2 = ((a - b) ** 2 / (var_ab + 2e-6))[ok_ab].mean()
    assert self_chi2 < 6.0, f"self chi-square/pixel {self_chi2:.1f}"

    # vs reference, in linear space (sRGB decoded before downscaling so the
    # nonlinear encode doesn't bias block means)
    ref8 = (
        np.asarray(
            Image.open(f"{REF_SPHERES}/hq_example.png").convert("RGB"), float
        )
        / 255.0
    )
    ref_lin = np.where(
        ref8 <= 0.04045, ref8 / 12.92, ((ref8 + 0.055) / 1.055) ** 2.4
    )
    h, w = ref_lin.shape[:2]
    ref_ds = (
        ref_lin.reshape(32, h // 32, 64, w // 64, 3).mean(axis=(1, 3)).mean(axis=2)
    )

    usable = (mu < 0.85) & (ref_ds < 0.85) & (mu > 0.01) & (ref_ds > 0.01)
    usable &= var_mean > 1e-8
    assert usable.sum() > 500

    z2 = (mu - ref_ds) ** 2 / (var_mean + 2e-6)
    chi2 = z2[usable].mean()
    med = np.median(z2[usable])
    assert chi2 < 40.0 and med < 15.0, (
        f"chi-square/pixel mean {chi2:.1f} median {med:.1f}"
    )


REF_SNOWFLAKE = "/root/reference/pyrite/test/snowflake"


def test_snowflake_structure_and_background_radiance():
    """Snowflake (BDPT, refractive ice mesh, thin-lens DoF, dim curve-spectrum
    background sphere). The committed hq_example.png is NOT reproducible from
    the current snowflake.lua: its background reads ~33/255 while the scene's
    background sphere (reflectance curve * 0.2 ~ 0.35%, lit by the two d65
    emitters + the sky it occludes) analytically yields ~3/255 — a ~16x
    radiance gap with no mechanism in the scene description (PARITY.md
    "Environment-driven differences"). So this golden checks physics, not the
    stale image:
    - background raw radiance must sit in the analytic direct+sky window;
    - the ice snowflake must be visibly brighter than the background
      (refraction funnels emitter/sky light toward the camera).
    """
    from pyrite_tpu.renderers import bidirectional

    pd = load_project(f"{REF_SNOWFLAKE}/snowflake.lua")
    pd.project.image.width = 32
    pd.project.image.height = 32
    pd.project.renderer.bounces = 8
    pd.project.renderer.light_bounces = 8
    scene = build_scene(pd)
    film, acc, wt = bidirectional.render(pd, scene, seed=3, max_samples=8)
    raw = np.asarray(acc / np.maximum(wt, 1e-9))  # [H, W, bins]
    mean_bins = raw.mean(axis=2)

    # analytic window for the background (emitters ~0.00024 + sky ~0.0006,
    # derated for partial occlusion/cos falloff; see PARITY.md): the corner
    # 8x8 blocks frame the background sphere only
    corners = np.concatenate([
        mean_bins[:8, :8].ravel(), mean_bins[:8, -8:].ravel(),
        mean_bins[-8:, :8].ravel(), mean_bins[-8:, -8:].ravel(),
    ])
    bg = corners.mean()
    assert 2e-4 < bg < 2.5e-3, f"background radiance {bg:.2e} outside window"

    # the snowflake occupies the center: refracted emitter/sky light must
    # beat the dim background by a clear factor
    center = mean_bins[8:24, 8:24]
    assert center.mean() > 1.25 * bg, (
        f"center {center.mean():.2e} not brighter than background {bg:.2e}"
    )
    assert center.max() > 5 * bg
