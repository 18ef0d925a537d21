"""The "simple" renderer: camera paths with next-event estimation.

Reference: renderer/simple.rs. The tile/thread machinery is replaced by a
wavefront: every chunk traces one stratified sample for every pixel (the
whole film at once) inside a single jit step with donated film buffers;
chunks iterate until pixel_samples is reached. Sample distribution matches
the reference (uniform jitter per pixel, stratified wavelengths with a
uniformly-chosen hero).
"""

from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp

from ..film import Film, expose_lanes
from ..scene import CameraModel, Scene
from ..tracer import TraceConfig, trace_paths


def chunk_rays(film: Film, camera: CameraModel, cfg: TraceConfig, key, row0=0, rows=None):
    """One stratified sample per pixel of a row window: positions, primary
    rays, and hero-ordered wavelengths."""
    h, w = film.height, film.width
    rows = h if rows is None else rows
    n = rows * w
    s = cfg.spectrum_samples

    # one PRNG draw for everything: jitter (2) + lens (2) + wavelengths (S)
    # + hero pick (1)
    u = jax.random.uniform(key, (n, s + 5))

    py, px = jnp.meshgrid(row0 + jnp.arange(rows), jnp.arange(w), indexing="ij")
    pxf = px.reshape(-1) + u[:, 0]
    pyf = py.reshape(-1) + u[:, 1]
    positions = film.pixel_to_view(pxf, pyf)

    origin, direction = camera.ray_towards(positions, u[:, 2], u[:, 3])

    wavelengths = film.sample_wavelengths(u[:, 4 : 4 + s])
    # hero selection: swap a uniformly-chosen column into slot 0 — done with
    # masked sums instead of take_along_axis (TPU gathers are slow)
    hero = jnp.minimum((u[:, 4 + s] * s).astype(jnp.int32), s - 1)
    cols = jnp.arange(s)[None, :]
    is_hero = cols == hero[:, None]
    hero_wl = jnp.sum(jnp.where(is_hero, wavelengths, 0.0), axis=1, keepdims=True)
    first_wl = wavelengths[:, :1]
    wavelengths = jnp.where(
        cols == 0, hero_wl, jnp.where(is_hero, first_wl, wavelengths)
    )

    return positions, origin, direction, wavelengths


def pick_rows(film: Film, scene: Scene, cfg: TraceConfig = None) -> int:
    """Rows per launch, sized so one device launch stays far under the
    execution watchdog: the test budget bounds lanes x prims x bounces x
    (1 + light_samples) per launch."""
    budget_lanes = film.height * film.width
    if scene.use_clusters:
        budget_lanes = min(budget_lanes, 32768)
    elif cfg is not None and scene.num_primitives > 128:
        budget = 6_000_000_000
        per_lane = (
            max(scene.num_primitives, 1)
            * max(cfg.bounces, 1)
            * (1 + cfg.light_samples)
        )
        budget_lanes = min(budget_lanes, max(film.width, budget // per_lane))
    rows = max(1, min(film.height, budget_lanes // film.width))
    while film.height % rows != 0:
        rows -= 1
    return rows


def make_render_step(scene: Scene, film: Film, camera: CameraModel, cfg: TraceConfig, rows=None, jit=True):
    """Build the jitted one-sample-per-pixel accumulation step.

    The step takes the scene's device data as an argument (scene.device_data())
    so geometry and texture arrays are jit inputs, not compiled constants.
    ``jit=False`` returns the traced function un-jitted (for wrapping in a
    shard_map, which jits at the outer level)."""
    rows = film.height if rows is None else rows

    def step(acc, wt, key, data, row0=0):
        with scene.bind(data):
            positions, origin, direction, wavelengths = chunk_rays(
                film, camera, cfg, key, row0=row0, rows=rows
            )
            k_trace = jax.random.fold_in(key, 7)
            brightness, aux_alive = trace_paths(
                scene, cfg, k_trace, origin, direction, wavelengths
            )
            n, s = brightness.shape
            mask = jnp.concatenate(
                [jnp.ones((n, 1), bool), jnp.broadcast_to(aux_alive[:, None], (n, s - 1))],
                axis=1,
            )
            weights = jnp.ones_like(brightness)
            return expose_lanes(
                film, acc, wt, row0, wavelengths, brightness, weights, mask
            )

    return jax.jit(step, donate_argnums=(0, 1)) if jit else step


@dataclass
class RenderProgress:
    sample: int
    total: int
    acc: object
    wt: object
    film: object


def render(project_data, scene: Scene, seed: int = 0, on_progress=None, max_samples=None, resume=None):
    """Render the project with the simple algorithm; returns (film, acc, wt)."""
    project = project_data.project
    settings = project.renderer
    film = Film(
        width=project.image.width,
        height=project.image.height,
        bins=settings.spectrum_bins,
        span=settings.spectrum_span,
    )
    camera = CameraModel.from_ir(project.camera)
    cfg = TraceConfig(
        bounces=settings.bounces,
        light_samples=settings.light_samples,
        spectrum_samples=settings.spectrum_samples,
    )
    rows = pick_rows(film, scene, cfg)
    step = make_render_step(scene, film, camera, cfg, rows=rows)

    acc, wt = film.new_buffers()
    start_sample = 0
    if resume is not None:
        import jax.numpy as _jnp

        acc = _jnp.asarray(resume["acc"])
        wt = _jnp.asarray(resume["wt"])
        start_sample = resume["samples_done"]
    data = scene.device_data()
    total = settings.pixel_samples if max_samples is None else min(
        settings.pixel_samples, max_samples
    )
    chunks = film.height // rows
    # all step keys in one device op: per-step fold_in would pay the host
    # dispatch round-trip between every step
    import numpy as np

    keys = np.asarray(jax.random.split(jax.random.PRNGKey(seed), total * chunks))
    for i in range(start_sample, total):
        for c in range(chunks):
            acc, wt = step(acc, wt, keys[i * chunks + c], data, c * rows)
        if on_progress is not None:
            on_progress(RenderProgress(sample=i + 1, total=total, acc=acc, wt=wt, film=film))
    return film, acc, wt


def render_sharded(project_data, scene: Scene, mesh, seed: int = 0, on_progress=None, max_samples=None, resume=None):
    """Multi-device rendering: the sample axis is sharded over ``mesh`` (one
    stratified sample per device per step into per-device film shards), and
    the film merge is a single all-reduce at development time. Honors the
    exact requested sample count and checkpoint resume (parallel.run_sharded)."""
    from ..parallel.mesh import run_sharded

    project = project_data.project
    settings = project.renderer
    film = Film(
        width=project.image.width,
        height=project.image.height,
        bins=settings.spectrum_bins,
        span=settings.spectrum_span,
    )
    camera = CameraModel.from_ir(project.camera)
    cfg = TraceConfig(
        bounces=settings.bounces,
        light_samples=settings.light_samples,
        spectrum_samples=settings.spectrum_samples,
    )
    rows = pick_rows(film, scene, cfg)
    step = make_render_step(scene, film, camera, cfg, rows=rows, jit=False)
    total = settings.pixel_samples if max_samples is None else min(
        settings.pixel_samples, max_samples
    )
    return run_sharded(
        step,
        film,
        mesh,
        scene.device_data(),
        total,
        seed=seed,
        chunks=film.height // rows,
        rows=rows,
        on_progress=on_progress,
        resume=resume,
        progress_cls=RenderProgress,
    )
