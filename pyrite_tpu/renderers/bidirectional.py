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


def _connection_arrays(scene, path, wavelengths, cfg, k_splat):
    """Everything the camera walk needs per lamp slot, as one dict.

    Built at full [N, L+1] capacity; _compact_connections can then gather it
    down to only the *connectable* slots (valid non-specular vertices: the
    emitter and diffuse vertices — connect_paths and the light-tracing pass
    skip specular vertices, bidirectional.rs:270,330). Splat PRNG draws are
    made here per ORIGINAL slot index so a compacted walk is draw-for-draw
    identical to the full-width walk."""
    pp, aux_ok, lamp_specular, _ = _lamp_path_factors(scene, path, wavelengths, cfg)
    n, slots = path["valid"].shape
    splat_u = jnp.stack(
        [
            jax.random.uniform(jax.random.fold_in(k_splat, k), (n, 2))
            for k in range(slots)
        ],
        axis=1,
    )  # [N, K, 2]
    conn_ok = path["valid"] & ~lamp_specular
    return {
        "position": path["position"],
        "normal": path["normal"],
        "pp": pp,
        "aux_ok": aux_ok,
        "conn_ok": conn_ok,
        "splat_ok": path["valid"] & path["is_diffuse"],
        "splat_u": splat_u,
        "length": path["length"],
    }


def connectable_count(conn):
    """Max connectable slots in any lane — the host reads this to bucket the
    compacted capacity (render()'s two-phase path)."""
    return jnp.max(jnp.sum(conn["conn_ok"].astype(jnp.int32), axis=1))


def _compact_connections(conn, k_new: int):
    """Gather the connectable slots of ``conn`` into [N, k_new] arrays
    (stable slot order via a masked-index sort along the slot axis). With
    deep light budgets (dragon/snowflake run light_bounces = 256) almost
    every slot is specular or invalid, so the per-camera-bounce connection
    shadow batch shrinks from N*(L+1) to N*k_new lanes."""
    n, slots = conn["conn_ok"].shape
    idx = jnp.arange(slots)[None, :]
    order_key = jnp.where(conn["conn_ok"], idx, slots + idx)
    order = jnp.argsort(order_key, axis=1)[:, :k_new]  # [N, k_new]
    kept = jnp.take_along_axis(order_key, order, axis=1) < slots

    def take(x):
        o = order
        while o.ndim < x.ndim:
            o = o[..., None]
        return jnp.take_along_axis(x, jnp.broadcast_to(o, x.shape[:1] + (k_new,) + x.shape[2:]), axis=1)

    return {
        "position": take(conn["position"]),
        "normal": take(conn["normal"]),
        "pp": take(conn["pp"]),
        "aux_ok": take(conn["aux_ok"]) & kept,
        "conn_ok": take(conn["conn_ok"]) & kept,
        "splat_ok": take(conn["splat_ok"]) & kept,
        "splat_u": take(conn["splat_u"]),
        "length": conn["length"],
    }


def _light_splats(scene, film, camera, cfg, conn, wavelengths, acc, wt):
    """Light-tracing splats (bidirectional.rs:253-306).

    All lamp slots are projected and shadow-tested in ONE flattened
    [N*(L+1)] batch and exposed with a single film scatter (the reference's
    per-vertex loop costs (L+1) serial dispatch rounds on this machine)."""
    n, slots = conn["conn_ok"].shape
    s_count = wavelengths.shape[1]
    len_lamp = jnp.maximum(conn["length"], 1)
    splat_weight = 1.0 / len_lamp.astype(jnp.float32)
    pp, aux_ok, u = conn["pp"], conn["aux_ok"], conn["splat_u"]

    flat = lambda x: x.reshape((n * slots,) + x.shape[2:])
    mask = flat(conn["splat_ok"])
    view_xy, world_origin, direction, distance, ok = camera_inverse_project(
        camera, flat(conn["position"]), flat(u[..., 0]), flat(u[..., 1])
    )
    mask &= ok
    mask &= (jnp.abs(view_xy[:, 0]) < 1.0) & (jnp.abs(view_xy[:, 1]) < 1.0)

    t_hit = intersect_shadow(
        scene, world_origin, direction, cfg,
        max_dist=distance, block_below=distance - DIST_EPSILON,
    )
    mask &= ~(jnp.isfinite(t_hit) & (t_hit < distance - DIST_EPSILON))

    scale = 1.0 / jnp.maximum(distance * distance, 1e-20)
    brightness = flat(pp) * scale[:, None]  # [N*K, S]

    cols = jnp.concatenate(
        [
            jnp.ones((n * slots, 1), bool),
            jnp.broadcast_to(flat(aux_ok)[:, None], (n * slots, s_count - 1)),
        ],
        axis=1,
    )
    weights = jnp.broadcast_to(
        jnp.repeat(splat_weight, slots)[:, None], (n * slots, s_count)
    )
    wl_rep = jnp.repeat(wavelengths[:, None, :], slots, axis=1).reshape(
        n * slots, s_count
    )
    acc, wt = film.expose(
        acc, wt, view_xy, wl_rep, brightness, weights, mask[:, None] & cols
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
    two_phase: bool = False,
):
    """``two_phase=False``: one fused chunk step (lamp trace + camera walk),
    the shape render_sharded's shard_map needs. ``two_phase=True``: returns
    (lamp_step, compact_step, cam_step) so the host can read the max
    connectable slot count per chunk and run the camera walk against
    compacted [N, K'] connection arrays — at light_bounces=256 (dragon,
    snowflake) nearly all of the L+1 slots are specular or invalid, so this
    shrinks every per-bounce connection shadow batch by ~K/K'."""
    lamp_cfg = TraceConfig(
        bounces=light_bounces,
        light_samples=0,
        spectrum_samples=cfg.spectrum_samples,
        max_de_steps=cfg.max_de_steps,
    )

    def lamp_step(key, data):
        """Phase 1 of the two-phase path: lamp subpaths -> connection arrays
        (full [N, L+1] capacity) + the max connectable count for bucketing."""
        with scene.bind(data):
            _, _, _, wavelengths = chunk_rays(
                film, camera, cfg, key, row0=0, rows=rows_per_chunk
            )
            k_lamp, _, k_splat = jax.random.split(jax.random.fold_in(key, 11), 3)
            path = trace_lamp_path(scene, lamp_cfg, k_lamp, wavelengths)
            conn = _connection_arrays(scene, path, wavelengths, cfg, k_splat)
            return conn, connectable_count(conn)

    def compact_step(conn, k_new):
        return _compact_connections(conn, k_new)

    def cam_step(acc, wt, key, data, conn, row0=0):
      """Phase 2: camera walk + connections + exposures against ``conn``
      (either full capacity or compacted)."""
      with scene.bind(data):
        positions, origin, direction, wavelengths = chunk_rays(
            film, camera, cfg, key, row0=row0, rows=rows_per_chunk
        )
        n = origin.shape[0]
        s_count = wavelengths.shape[1]
        slots = conn["conn_ok"].shape[1]
        pp, aux_ok = conn["pp"], conn["aux_ok"]
        len_lamp = conn["length"]
        k_cam = jax.random.split(jax.random.fold_in(key, 11), 3)[1]

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

            # connections (connect_paths): diffuse camera vertices only.
            # All L+1 lamp slots are connected in ONE flattened [N*(L+1)]
            # shadow batch per bounce (the reference's per-vertex loop,
            # bidirectional.rs:310-398, is free on a CPU megakernel but costs
            # (L+1) serial dispatch rounds on the wavefront machine).
            cam_ok = info["is_diffuse"]
            conn_vsum = extras["conn_vsum"]
            conn_cnt = extras["conn_cnt"]
            if scene.num_lamps > 0:
                dirvec = conn["position"] - info["position"][:, None, :]  # [N,K,3]
                sqd = jnp.sum(dirvec * dirvec, axis=-1)
                dist = jnp.sqrt(jnp.maximum(sqd, 1e-20))
                conn_dir = dirvec / dist[..., None]

                cos_out_s = jnp.sum(info["normal"][:, None, :] * conn_dir, axis=-1)
                cos_in_s = jnp.sum(conn["normal"] * -conn_dir, axis=-1)
                good = cam_ok[:, None] & conn["conn_ok"]
                good &= cos_out_s > 0.0
                good &= cos_in_s > 0.0

                flat = lambda x: x.reshape((n * slots,) + x.shape[2:])
                origin_f = jnp.broadcast_to(
                    info["position"][:, None, :], (n, slots, 3)
                )
                dist_f = flat(dist)
                t_hit = intersect_shadow(
                    scene, flat(origin_f), flat(conn_dir), cfg,
                    max_dist=dist_f, block_below=dist_f - DIST_EPSILON,
                )
                blocked = (
                    jnp.isfinite(t_hit) & (t_hit < dist_f - DIST_EPSILON)
                ).reshape(n, slots)
                good &= ~blocked

                brdf_conn = 2.0 * jnp.abs(cos_out_s)
                brdf_ratio = brdf_conn / jnp.maximum(
                    info["brdf_stored"][:, None], 1e-20
                )
                scale = (
                    jnp.abs(cos_in_s)
                    * jnp.abs(cos_out_s)
                    * brdf_ratio
                    / (2.0 * jnp.pi * jnp.maximum(sqd, 1e-20))
                )

                delta = (
                    new_state["reflectance"][:, None, :]
                    * scale[..., None]
                    * pp
                )  # [N, K, S]
                value = new_state["brightness"][:, None, :] + delta

                aux_take = new_state["aux_alive"][:, None] & aux_ok  # [N, K]
                cols = jnp.concatenate(
                    [
                        jnp.ones((n, slots, 1), bool),
                        jnp.broadcast_to(
                            aux_take[..., None], (n, slots, s_count - 1)
                        ),
                    ],
                    axis=2,
                )
                take = good[..., None] & cols
                conn_vsum = conn_vsum + jnp.sum(
                    jnp.where(take, value, 0.0), axis=1
                )
                conn_cnt = conn_cnt + jnp.sum(take.astype(jnp.float32), axis=1)

            new_extras = {
                "conn_vsum": conn_vsum,
                "conn_cnt": conn_cnt,
                "len_cam": extras["len_cam"] + info["recorded"].astype(jnp.int32),
            }
            return (new_state, new_extras), None

        keys = jax.random.split(k_cam, cfg.bounces)

        # whole-batch early exit (the reference's per-thread loop stops when
        # a path dies; a fixed scan would pay full masked depth at 256-bounce
        # budgets)
        def cam_cond(carry):
            i, state, extras = carry
            return (i < cfg.bounces) & jnp.any(state["alive"])

        def cam_body(carry):
            i, state, extras = carry
            (state, extras), _ = scan_body((state, extras), keys[i])
            return i + 1, state, extras

        _, state, extras = jax.lax.while_loop(
            cam_cond, cam_body, (jnp.int32(0), state, extras)
        )

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
            scene, film, camera, cfg, conn, wavelengths, acc, wt
        )
        return acc, wt

    def chunk_step(acc, wt, key, data, row0=0):
        conn, _ = lamp_step(key, data)
        return cam_step(acc, wt, key, data, conn, row0=row0)

    if two_phase:
        return (
            jax.jit(lamp_step),
            jax.jit(compact_step, static_argnums=(1,)),
            jax.jit(cam_step, donate_argnums=(0, 1)),
        )
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
    # deep light budgets ride the two-phase compacted-connection path; at
    # small L the full-capacity fused step is already cheap (and avoids the
    # extra host sync per chunk)
    two_phase = settings.light_bounces + 1 > 16
    if two_phase:
        lamp_step, compact_step, cam_step = make_render_step(
            scene, film, camera, cfg, settings.light_bounces, rows,
            two_phase=True,
        )
    else:
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
    from .simple import chunk_order

    order = chunk_order(chunks)
    slots = settings.light_bounces + 1
    for i in range(start_sample, total):
        for c in order:
            key_c = keys[i * chunks + c]
            if two_phase:
                conn, count = lamp_step(key_c, data)
                # bucket to powers of two so only a handful of cam_step
                # shapes ever compile
                k_new = 4
                while k_new < int(count) and k_new < slots:
                    k_new *= 2
                k_new = min(k_new, slots)
                conn = compact_step(conn, k_new)
                acc, wt = cam_step(acc, wt, key_c, data, conn, c * rows)
            else:
                acc, wt = step(acc, wt, key_c, data, c * rows)
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
