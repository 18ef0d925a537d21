"""Bidirectional path tracing (reference: renderer/bidirectional.rs).

Per pixel sample the reference traces a camera path and a lamp path, then
(a) contributes the camera path like the simple renderer,
(b) connects every diffuse camera vertex to every lamp vertex with a
    visibility ray (connect_paths, bidirectional.rs:310-398), and
(c) splats every diffuse lamp vertex through the camera lens
    (light tracing, bidirectional.rs:253-306).

TPU formulation: lamp paths are recorded as fixed-capacity [N, L+1] vertex
arrays with validity masks, and the repeated suffix walks of connect_paths
collapse to *prefix products* along the lamp path: walking lamp_path[i..]
multiplies color*probability*brdf per vertex and ends at the emitter, so the
connection radiance for forward vertex F is PP_F(lambda) = emitter_radiance *
prod_{k<=F}(color_k prob_k brdf_k) — computed once per path with a cumprod
instead of O(L^2) re-walks. Two reference details worth noting: the
brdf_in "ratio" of connect_paths is identically 1 (the lambertian only dots
its last two arguments, so numerator and denominator coincide), and each
connection sample carries a copy of the camera-side radiance accumulated so
far, exposed at weight 1/(len_cam*len_lamp) — both reproduced exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..exprs import ProgramInputs
from ..film import Film, expose_sums
from ..scene import CameraModel, Scene, camera_inverse_project
from ..tracer import (
    DIST_EPSILON,
    TraceConfig,
    bounce_core,
    eval_color_bank,
    intersect_shadow,
    trace_lamp_path,
)
from .simple import RenderProgress, chunk_rays

# cap on lanes*(L+1)*S to keep lamp-path arrays within memory
_LANE_BUDGET = 48_000_000


def _lamp_path_factors(scene: Scene, path, wavelengths, cfg: TraceConfig):
    """Per-vertex radiance prefix products PP [N, L+1, S], aux-validity
    prefix A [N, L+1], and specular flags."""
    n, slots = path["valid"].shape
    s_count = wavelengths.shape[1]

    # evaluation inputs per vertex, flattened to [(L+1)*N]
    # incident after the reference's pairs() reversal: vertex j sees
    # -(arrival direction of vertex j+1); the trailing limit-ended vertex
    # keeps its own arrival direction (bidirectional.rs:187-192).
    inc = jnp.concatenate(
        [-path["incident_out"][:, 1:], path["incident_out"][:, -1:]], axis=1
    )
    inc = inc.at[:, slots - 1].set(
        jnp.where(
            path["valid"][:, slots - 1, None],
            path["incident_out"][:, slots - 1],
            inc[:, slots - 1],
        )
    )

    flat = lambda x: x.reshape((n * slots,) + x.shape[2:])
    wl_rep = jnp.repeat(wavelengths[:, None, :], slots, axis=1).reshape(
        n * slots, s_count
    )
    inputs = ProgramInputs(
        wavelength=wl_rep,
        normal=flat(path["normal"]),
        incident=flat(inc),
        uv=flat(path["uv"]),
    )
    color = eval_color_bank(
        scene, flat(path["color_prog"]), inputs, active=flat(path["valid"])
    ).reshape(n, slots, s_count)

    # effective brdf: recorded 2|n.incident| except a trailing limit-ended
    # vertex, which keeps its scattered out-direction's brdf
    brdf = path["brdf"]
    if "brdf_limit" in path:
        brdf = brdf.at[:, slots - 1].set(
            jnp.where(
                path["valid"][:, slots - 1],
                path["brdf_limit"],
                brdf[:, slots - 1],
            )
        )

    factor = color * (path["probability"] * brdf)[:, :, None]
    # emitter slot (0) has brdf 1 already; invalid slots contribute factor 1
    factor = jnp.where(path["valid"][:, :, None], factor, 1.0)
    pp = jnp.cumprod(factor, axis=1)

    aux_ok = jnp.cumprod((~path["dispersed"]).astype(jnp.int32), axis=1) > 0

    is_specular = path["valid"] & ~path["is_diffuse"]
    is_specular = is_specular.at[:, 0].set(False)  # the emitter connects
    return pp, aux_ok, is_specular, inc


def _light_splats(
    scene, film, camera, cfg, key, path, wavelengths, pp, aux_ok, acc, wt
):
    """Light-tracing splats (bidirectional.rs:253-306)."""
    n, slots = path["valid"].shape
    s_count = wavelengths.shape[1]
    len_lamp = jnp.maximum(path["length"], 1)
    splat_weight = 1.0 / len_lamp.astype(jnp.float32)

    for k in range(slots):
        mask = path["valid"][:, k] & path["is_diffuse"][:, k]
        k_lens = jax.random.fold_in(key, k)
        u = jax.random.uniform(k_lens, (n, 2))
        view_xy, world_origin, direction, distance, ok = camera_inverse_project(
            camera, path["position"][:, k], u[:, 0], u[:, 1]
        )
        mask &= ok
        mask &= (jnp.abs(view_xy[:, 0]) < 1.0) & (jnp.abs(view_xy[:, 1]) < 1.0)

        t_hit = intersect_shadow(
            scene, world_origin, direction, cfg,
            max_dist=distance, block_below=distance - DIST_EPSILON,
        )
        mask &= ~(jnp.isfinite(t_hit) & (t_hit < distance - DIST_EPSILON))

        scale = 1.0 / jnp.maximum(distance * distance, 1e-20)
        brightness = pp[:, k] * scale[:, None]  # [N, S]

        cols = jnp.concatenate(
            [
                jnp.ones((n, 1), bool),
                jnp.broadcast_to(aux_ok[:, k][:, None], (n, s_count - 1)),
            ],
            axis=1,
        )
        weights = jnp.broadcast_to(splat_weight[:, None], (n, s_count))
        acc, wt = film.expose(
            acc, wt, view_xy, wavelengths, brightness, weights, mask[:, None] & cols
        )
    return acc, wt


def make_render_step(
    scene: Scene,
    film: Film,
    camera: CameraModel,
    cfg: TraceConfig,
    light_bounces: int,
    rows_per_chunk: int,
    jit: bool = True,
):
    lamp_cfg = TraceConfig(
        bounces=light_bounces,
        light_samples=0,
        spectrum_samples=cfg.spectrum_samples,
        max_de_steps=cfg.max_de_steps,
    )

    def chunk_step(acc, wt, key, data, row0=0):
      with scene.bind(data):
        positions, origin, direction, wavelengths = chunk_rays(
            film, camera, cfg, key, row0=row0, rows=rows_per_chunk
        )
        n = origin.shape[0]
        s_count = wavelengths.shape[1]
        k_lamp, k_cam, k_splat = jax.random.split(jax.random.fold_in(key, 11), 3)

        # --- lamp subpaths ----------------------------------------------------
        path = trace_lamp_path(scene, lamp_cfg, k_lamp, wavelengths)
        pp, aux_ok, lamp_specular, _ = _lamp_path_factors(scene, path, wavelengths, cfg)
        slots = path["valid"].shape[1]
        len_lamp = path["length"]

        # --- camera walk with connections --------------------------------------
        state = {
            "origin": origin,
            "direction": direction,
            "brightness": jnp.zeros((n, s_count)),
            "reflectance": jnp.ones((n, s_count)),
            "alive": jnp.ones(n, bool),
            "aux_alive": jnp.ones(n, bool),
            "sample_light": jnp.ones(n, bool),
            "light_events": jnp.zeros(n, jnp.int32),
        }
        extras = {
            "conn_vsum": jnp.zeros((n, s_count)),
            "conn_cnt": jnp.zeros((n, s_count)),
            "len_cam": jnp.zeros(n, jnp.int32),
        }

        def scan_body(carry, bounce_key):
            state, extras = carry
            new_state, info = bounce_core(scene, cfg, wavelengths, state, bounce_key)

            # connections (connect_paths): diffuse camera vertices only
            cam_ok = info["is_diffuse"]
            conn_vsum = extras["conn_vsum"]
            conn_cnt = extras["conn_cnt"]
            if scene.num_lamps > 0:
                for k in range(slots):
                    lamp_ok = path["valid"][:, k] & ~lamp_specular[:, k]
                    dirvec = path["position"][:, k] - info["position"]
                    sqd = jnp.sum(dirvec * dirvec, axis=-1)
                    dist = jnp.sqrt(jnp.maximum(sqd, 1e-20))
                    conn_dir = dirvec / dist[:, None]

                    good = cam_ok & lamp_ok
                    good &= jnp.sum(info["normal"] * conn_dir, axis=-1) > 0.0
                    good &= jnp.sum(path["normal"][:, k] * -conn_dir, axis=-1) > 0.0

                    t_hit = intersect_shadow(
                        scene, info["position"], conn_dir, cfg,
                        max_dist=dist, block_below=dist - DIST_EPSILON,
                    )
                    good &= ~(jnp.isfinite(t_hit) & (t_hit < dist - DIST_EPSILON))

                    cos_out = jnp.abs(jnp.sum(info["normal"] * conn_dir, axis=-1))
                    cos_in = jnp.abs(
                        jnp.sum(path["normal"][:, k] * -conn_dir, axis=-1)
                    )
                    brdf_conn = 2.0 * jnp.abs(
                        jnp.sum(info["normal"] * conn_dir, axis=-1)
                    )
                    brdf_ratio = brdf_conn / jnp.maximum(info["brdf_stored"], 1e-20)
                    scale = (
                        cos_in
                        * cos_out
                        * brdf_ratio
                        / (2.0 * jnp.pi * jnp.maximum(sqd, 1e-20))
                    )

                    delta = new_state["reflectance"] * scale[:, None] * pp[:, k]
                    value = new_state["brightness"] + delta

                    cols = jnp.concatenate(
                        [
                            jnp.ones((n, 1), bool),
                            jnp.broadcast_to(
                                (new_state["aux_alive"] & aux_ok[:, k])[:, None],
                                (n, s_count - 1),
                            ),
                        ],
                        axis=1,
                    )
                    take = good[:, None] & cols
                    conn_vsum = conn_vsum + jnp.where(take, value, 0.0)
                    conn_cnt = conn_cnt + jnp.where(take, 1.0, 0.0)

            new_extras = {
                "conn_vsum": conn_vsum,
                "conn_cnt": conn_cnt,
                "len_cam": extras["len_cam"] + info["recorded"].astype(jnp.int32),
            }
            return (new_state, new_extras), None

        keys = jax.random.split(k_cam, cfg.bounces)
        (state, extras), _ = jax.lax.scan(scan_body, (state, extras), keys)

        # --- exposures ---------------------------------------------------------
        # camera-path samples, weight 1 (hero always, aux if never dispersed)
        cam_mask = jnp.concatenate(
            [
                jnp.ones((n, 1), bool),
                jnp.broadcast_to(state["aux_alive"][:, None], (n, s_count - 1)),
            ],
            axis=1,
        )
        acc, wt = film.expose(
            acc,
            wt,
            positions,
            wavelengths,
            state["brightness"],
            jnp.ones((n, s_count)),
            cam_mask,
        )

        # connection samples: sums of (value * W) with weight sums C * W
        total = jnp.maximum(extras["len_cam"] * len_lamp, 1)
        w_conn = 1.0 / total.astype(jnp.float32)
        acc, wt = expose_sums(
            film,
            acc,
            wt,
            positions,
            wavelengths,
            extras["conn_vsum"] * w_conn[:, None],
            extras["conn_cnt"] * w_conn[:, None],
            jnp.ones((n, s_count), bool),
        )

        # light-tracing splats
        acc, wt = _light_splats(
            scene, film, camera, cfg, k_splat, path, wavelengths, pp, aux_ok, acc, wt
        )
        return acc, wt

    return jax.jit(chunk_step, donate_argnums=(0, 1)) if jit else chunk_step


def pick_rows_per_chunk(
    film: Film, light_bounces: int, spectrum_samples: int, scene=None, bounces=8
) -> int:
    budget_lanes = max(
        film.width, _LANE_BUDGET // ((light_bounces + 1) * spectrum_samples)
    )
    if scene is not None and scene.use_clusters:
        budget_lanes = min(budget_lanes, 32768)
    elif scene is not None and scene.num_primitives > 128:
        budget = 3_000_000_000
        per_lane = max(scene.num_primitives, 1) * max(bounces, 1) * (
            2 + light_bounces
        )
        budget_lanes = min(budget_lanes, max(film.width, budget // per_lane))
    rows = max(1, min(film.height, budget_lanes // film.width))
    # use a divisor of height so all chunks share one compiled shape
    while film.height % rows != 0:
        rows -= 1
    return rows


def render(project_data, scene: Scene, seed: int = 0, on_progress=None, max_samples=None, resume=None):
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
    rows = pick_rows_per_chunk(
        film,
        settings.light_bounces,
        settings.spectrum_samples,
        scene=scene,
        bounces=settings.bounces,
    )
    step = make_render_step(scene, film, camera, cfg, settings.light_bounces, rows)

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
    import numpy as np

    keys = np.asarray(jax.random.split(jax.random.PRNGKey(seed), total * chunks))
    for i in range(start_sample, total):
        for c in range(chunks):
            acc, wt = step(acc, wt, keys[i * chunks + c], data, c * rows)
        if on_progress is not None:
            on_progress(RenderProgress(sample=i + 1, total=total, acc=acc, wt=wt, film=film))
    return film, acc, wt


def render_sharded(project_data, scene: Scene, mesh, seed: int = 0, on_progress=None, max_samples=None, resume=None):
    """Multi-device BDPT: samples sharded over the mesh exactly like the
    simple renderer — the per-chunk step is already a pure film-delta
    function, so it lifts unchanged (reference runs all algorithms through
    one TaskRunner, renderer/mod.rs:77-111)."""
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
    rows = pick_rows_per_chunk(
        film,
        settings.light_bounces,
        settings.spectrum_samples,
        scene=scene,
        bounces=settings.bounces,
    )
    step = make_render_step(
        scene, film, camera, cfg, settings.light_bounces, rows, jit=False
    )
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
