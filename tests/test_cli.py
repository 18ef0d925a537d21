"""End-to-end CLI smoke tests (CPU, tiny scene).

The CLI is the reference's binary surface (main.rs:52-109); these cover the
flag plumbing the unit tests can't: output path, checkpoint write/resume,
and the profiler trace (--profile, SURVEY.md section 5 observability).
"""

import os

import numpy as np

from pyrite_tpu.cli import main

SCENE = """
return {
    image = {width = 16, height = 12},
    camera = camera.perspective {
        fov = 60,
        transform = transform.look_at {from = vector(0, 2, 6), to = vector(0, 1, 0)},
    },
    renderer = renderer.simple {
        pixel_samples = 4, spectrum_samples = 3, bounces = 3, light_samples = 1
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
        },
    },
}
"""


def _scene(tmp_path):
    path = tmp_path / "tiny.lua"
    path.write_text(SCENE)
    return str(path)


def test_cli_render_output_and_profile(tmp_path):
    out = tmp_path / "out.png"
    prof = tmp_path / "prof"
    rc = main(
        [
            _scene(tmp_path),
            "--samples",
            "2",
            "--output",
            str(out),
            "--profile",
            str(prof),
        ]
    )
    assert rc == 0
    assert out.exists() and out.stat().st_size > 0
    # jax.profiler.trace writes plugins/profile/<ts>/*.xplane.pb
    traces = [
        f
        for root, _, files in os.walk(prof)
        for f in files
        if f.endswith((".xplane.pb", ".trace.json.gz"))
    ]
    assert traces, "no profiler trace files written"


def test_cli_checkpoint_resume(tmp_path):
    out = tmp_path / "out.png"
    ckpt = tmp_path / "film.npz"
    scene = _scene(tmp_path)
    # write a checkpoint on every progress callback
    rc = main(
        [
            scene,
            "--samples",
            "3",
            "--output",
            str(out),
            "--checkpoint",
            str(ckpt),
            "--preview-interval",
            "0",
        ]
    )
    assert rc == 0
    assert ckpt.exists()
    loaded = np.load(ckpt)
    assert int(loaded["samples_done"]) >= 1
    # resume must pick up from the recorded count and finish cleanly
    rc = main(
        [
            scene,
            "--samples",
            "4",
            "--output",
            str(out),
            "--checkpoint",
            str(ckpt),
            "--preview-interval",
            "1e9",
        ]
    )
    assert rc == 0

    bad = main([str(tmp_path / "missing.lua")])
    assert bad == 1
