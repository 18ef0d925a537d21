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


def pick_rows(film: Film, scene: Scene, cfg: TraceConfig = None, bounces=None) -> int:
    """Rows per launch, sized so one device launch stays far under the
    execution watchdog: the test budget bounds lanes x prims x bounces x
    (1 + light_samples) per launch. ``bounces`` overrides cfg.bounces (the
    survivor-pool scheduler only traces STAGE_BOUNCES per launch, so its
    chunks can be much larger — launches have a large fixed dispatch cost)."""
    budget_lanes = film.height * film.width
    if scene.use_clusters:
        budget_lanes = min(budget_lanes, 32768)
    elif cfg is not None and scene.num_primitives > 128:
        budget = 6_000_000_000
        depth = bounces if bounces is not None else cfg.bounces
        per_lane = (
            max(scene.num_primitives, 1)
            * max(depth, 1)
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


# =============================================================================
# Survivor-pool scheduler (deep-bounce scenes)
# =============================================================================
#
# For deep path budgets (diamonds/snowflake run 256 bounces) the flat
# wavefront is almost empty almost immediately: on the diamonds scene only
# 4% of lanes survive bounce 2 and the mean occupancy over the full budget
# is 0.7%, so a fixed-depth step executes ~140x more masked lane-bounces
# than useful ones. This is the device-resident ray-pool replacement for
# the reference's per-thread loop (renderer/mod.rs:126-189 runs each path
# exactly as deep as it needs): each chunk traces a short stage; lanes that
# die are exposed immediately; survivors are stream-compacted into a
# persistent pool (carrying film position, wavelengths and accumulated
# state) that continues tracing — across chunks and pixel samples — only
# when full, with whole-pool early exit. Every lane is exposed exactly
# once, so the estimator matches the one-shot path sample-for-sample.

POOL_MIN_BOUNCES = 16  # below this, the flat wavefront is fine
STAGE_BOUNCES = 8  # bounces traced before survivors are pooled
CONT_BOUNCES = 32  # bounces per pool-continuation launch
POOL_FACTOR = 8  # pool capacity as a multiple of the stage chunk size


def _trace_state(origin, direction, s_count):
    n = origin.shape[0]
    return {
        "origin": origin,
        "direction": direction,
        "brightness": jnp.zeros((n, s_count)),
        "reflectance": jnp.ones((n, s_count)),
        "alive": jnp.ones(n, bool),
        "aux_alive": jnp.ones(n, bool),
        "sample_light": jnp.ones(n, bool),
        "light_events": jnp.zeros(n, jnp.int32),
    }


def _run_bounces(scene, cfg, wavelengths, state, key, max_steps):
    """Up to max_steps bounces with whole-batch early exit."""
    from ..tracer import bounce_core

    def cond(carry):
        i, st = carry
        return (i < max_steps) & jnp.any(st["alive"])

    def body(carry):
        i, st = carry
        new, _ = bounce_core(scene, cfg, wavelengths, st, jax.random.fold_in(key, i))
        return i + 1, new

    _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    return state


def make_pooled_steps(scene: Scene, film: Film, camera: CameraModel, cfg: TraceConfig, rows):
    """The jitted pieces of the survivor-pool scheduler: stage (trace +
    expose dead + pool survivors), flush-step and shrink factories (the
    width ladder), expose-pool, plus the empty pool constructor."""
    n = rows * film.width
    s = cfg.spectrum_samples

    def full_mask(state):
        return jnp.concatenate(
            [
                jnp.ones((state["alive"].shape[0], 1), bool),
                jnp.broadcast_to(
                    state["aux_alive"][:, None],
                    (state["alive"].shape[0], s - 1),
                ),
            ],
            axis=1,
        )

    def stage(acc, wt, pool, fill, key, data, row0=0):
        """New chunk: trace STAGE_BOUNCES, expose lanes that completed, and
        stream-compact survivors into the pool at offset ``fill`` — one
        launch for the whole pipeline stage (launches carry a large fixed
        dispatch cost on this backend)."""
        with scene.bind(data):
            positions, origin, direction, wavelengths = chunk_rays(
                film, camera, cfg, key, row0=row0, rows=rows
            )
            state = _trace_state(origin, direction, s)
            state = _run_bounces(
                scene, cfg, wavelengths, state,
                jax.random.fold_in(key, 7), STAGE_BOUNCES,
            )
            mask = full_mask(state) & ~state["alive"][:, None]
            acc, wt = expose_lanes(
                film, acc, wt, row0, wavelengths, state["brightness"],
                jnp.ones((n, s)), mask,
            )
            alive = state["alive"]
            pos = jnp.cumsum(alive) - 1 + fill
            idx = jnp.where(alive, pos, pool_n)  # dead lanes dropped

            def put(dst, src):
                return dst.at[idx].set(src, mode="drop")

            pool = {
                "state": jax.tree_util.tree_map(put, pool["state"], state),
                "positions": put(pool["positions"], positions),
                "wavelengths": put(pool["wavelengths"], wavelengths),
                "valid": pool["valid"].at[idx].set(True, mode="drop"),
            }
            n_alive = jnp.sum(alive.astype(jnp.int32))
            return acc, wt, pool, n_alive

    # Pool capacity is POOL_FACTOR x the chunk size: the host flushes
    # whenever the remaining space could not absorb a worst-case
    # (all-survive) chunk, so the in-stage scatter can never drop a
    # survivor. The pool is deliberately large: the bounce loop is
    # ITERATION-bound on this backend (each bounce iteration costs ~2.5-5 ms
    # regardless of width below ~50k lanes), and a flush pays the full
    # bounce-tail depth in iterations however few lanes it holds — so
    # flushes must be rare, amortized over many pixel samples.
    pool_n = POOL_FACTOR * n

    def empty_pool():
        state = _trace_state(jnp.zeros((pool_n, 3)), jnp.ones((pool_n, 3)), s)
        state["alive"] = jnp.zeros(pool_n, bool)
        return {
            "state": state,
            "positions": jnp.zeros((pool_n, 2)),
            "wavelengths": jnp.full((pool_n, s), film.span[0]),
            "valid": jnp.zeros(pool_n, bool),
        }

    def make_flush_step(steps):
        """Continue a pool ``steps`` bounces; returns (pool, alive count).
        All pool entries always share the same remaining bounce budget
        (every stage runs exactly STAGE_BOUNCES), so the host caps the total
        continuation depth at exactly cfg.bounces - STAGE_BOUNCES by sizing
        the launches — no per-lane depth counters needed. Width-polymorphic:
        jit specializes per pool size (the flush ladder shrinks the pool as
        survivors die off, so the deep tail runs at a narrow width)."""

        def flush_step(pool, key, data):
            with scene.bind(data):
                state = _run_bounces(
                    scene, cfg, pool["wavelengths"], pool["state"], key, steps
                )
                return (
                    {**pool, "state": state},
                    jnp.sum(state["alive"].astype(jnp.int32)),
                )

        return jax.jit(flush_step, donate_argnums=(0,))

    def make_shrink(width_to):
        """Expose a pool's finished lanes and compact the live ones into a
        ``width_to``-wide pool (the host only calls this when the live count
        fits). One rung of the flush ladder."""

        def shrink(acc, wt, pool, data):
            with scene.bind(data):
                state = pool["state"]
                w = state["alive"].shape[0]
                done = pool["valid"] & ~state["alive"]
                mask = full_mask(state) & done[:, None]
                acc, wt = film.expose(
                    acc, wt, pool["positions"], pool["wavelengths"],
                    state["brightness"], jnp.ones((w, s)), mask,
                )
                live = pool["valid"] & state["alive"]
                pos = jnp.cumsum(live) - 1
                idx = jnp.where(live, pos, width_to)

                def put(src, fill_value):
                    empty = jnp.full(
                        (width_to,) + src.shape[1:], fill_value, src.dtype
                    )
                    return empty.at[idx].set(src, mode="drop")

                small = {
                    "state": jax.tree_util.tree_map(
                        lambda x: put(x, 0), pool["state"]
                    ),
                    "positions": put(pool["positions"], 0),
                    "wavelengths": put(pool["wavelengths"], film.span[0]),
                    "valid": put(pool["valid"], False),
                }
                # compacted lanes are live by construction
                small["state"]["alive"] = small["valid"]
                return acc, wt, small

        return jax.jit(shrink, donate_argnums=(0, 1, 2))

    def expose_pool(acc, wt, pool):
        state = pool["state"]
        w = state["alive"].shape[0]
        mask = full_mask(state) & pool["valid"][:, None]
        return film.expose(
            acc, wt, pool["positions"], pool["wavelengths"],
            state["brightness"], jnp.ones((w, s)), mask,
        )

    return (
        jax.jit(stage, donate_argnums=(0, 1, 2)),
        empty_pool,
        make_flush_step,
        make_shrink,
        jax.jit(expose_pool, donate_argnums=(0, 1)),
    )


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

    if cfg.bounces >= POOL_MIN_BOUNCES:
        return _render_pooled(
            scene, film, camera, cfg, rows, acc, wt, data, keys,
            start_sample, total, chunks, on_progress,
        )

    step = make_render_step(scene, film, camera, cfg, rows=rows)
    for i in range(start_sample, total):
        for c in range(chunks):
            acc, wt = step(acc, wt, keys[i * chunks + c], data, c * rows)
        if on_progress is not None:
            on_progress(RenderProgress(sample=i + 1, total=total, acc=acc, wt=wt, film=film))
    return film, acc, wt


def _render_pooled(
    scene, film, camera, cfg, rows, acc, wt, data, keys,
    start_sample, total, chunks, on_progress,
):
    """Host loop of the survivor-pool scheduler (deep-bounce scenes)."""
    stage, empty_pool, make_flush_step, make_shrink, expose_pool = (
        make_pooled_steps(scene, film, camera, cfg, rows)
    )
    capacity = rows * film.width
    # the flush plan caps continuation depth at exactly bounces - STAGE
    q, r = divmod(cfg.bounces - STAGE_BOUNCES, CONT_BOUNCES)
    flush_plan = [CONT_BOUNCES] * q + ([r] if r else [])
    flush_fns = {steps: make_flush_step(steps) for steps in set(flush_plan)}
    shrink_fns = {}
    pool = empty_pool()
    fill = 0
    key_counter = [0]

    def next_key():
        key_counter[0] += 1
        return jax.random.fold_in(jax.random.PRNGKey(0x9E3779B9), key_counter[0])

    def flush(acc, wt, pool, fill):
        """Run the pool to completion down a shrinking width ladder: after
        each continuation launch, if the survivors fit a 4x narrower pool,
        expose the finished lanes and compact — the deep bounce tail (a
        fraction of a percent of lanes by bounce ~100) then runs at a
        narrow width instead of the full pool's."""
        if fill == 0:
            return acc, wt, pool
        count = fill
        for steps in flush_plan:
            pool, n_alive = flush_fns[steps](pool, next_key(), data)
            count = int(n_alive)
            if count == 0:
                break
            width = pool["valid"].shape[0]
            while width >= 2048 and count <= width // 4:
                width_to = width // 4
                if width_to not in shrink_fns:
                    shrink_fns[width_to] = make_shrink(width_to)
                acc, wt, pool = shrink_fns[width_to](acc, wt, pool, data)
                width = width_to
        acc, wt = expose_pool(acc, wt, pool)
        return acc, wt, empty_pool()

    # the pool holds POOL_FACTOR x a chunk's lanes; flushing whenever the
    # remaining space could not absorb a worst-case (all-survive) chunk
    # guarantees the in-stage survivor scatter never drops a lane
    for i in range(start_sample, total):
        for c in range(chunks):
            if fill + capacity > POOL_FACTOR * capacity:
                acc, wt, pool = flush(acc, wt, pool, fill)
                fill = 0
            acc, wt, pool, n_alive = stage(
                acc, wt, pool, fill, keys[i * chunks + c], data, c * rows
            )
            fill += int(n_alive)
        if on_progress is not None:
            on_progress(RenderProgress(sample=i + 1, total=total, acc=acc, wt=wt, film=film))
    acc, wt, pool = flush(acc, wt, pool, fill)
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
