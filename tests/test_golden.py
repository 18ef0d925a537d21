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
