"""Progressive photon mapping (reference: renderer/photon_mapping.rs).

Per pixel pass the reference (1) traces camera paths, keeping chains of
diffuse hit vertices, (2) shoots photon batches from the lamps, keeping
diffuse light-bounce chains in a kd-tree, and (3) gathers photons within a
fixed radius around every camera vertex, multiplying the camera-side
reflectance chain by the photon-side light chain (photon_mapping.rs:340-426).

TPU formulation:
  - chain walks become prefix products computed during the traces: a camera
    vertex carries partialR(lambda) = product over its ancestor chain of
    color*probability*brdf times its own color*probability (its own brdf,
    2|n.exit|, is applied per gathered photon); a photon carries its full
    accumulated power P(lambda).
  - the kd-tree radius query becomes a hash-grid gather: photons are sorted
    by cell id (cell size = gather radius) and each camera vertex scans the
    27 neighboring cells with a per-cell photon cap.

Spectral simplifications vs the reference (documented deviations, both below
film-bin resolution): gathers evaluate at the camera ray's own stratified
wavelengths instead of fresh per-gather random wavelengths, and photon powers
are stored on the film's wavelength-bin grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..film import Film
from ..scene import CameraModel, Scene
from ..tracer import TraceConfig, bounce_core, trace_lamp_path
from .simple import RenderProgress, chunk_rays

_CELL_CAP = 32  # max photons consumed per grid cell per query


def _record_camera_vertices(scene, cfg, key, origin, direction, wavelengths):
    """Camera pass: normal film contribution plus recorded diffuse vertices
    with prefix reflectance products (CameraBounce chains,
    photon_mapping.rs:107-148)."""
    n = origin.shape[0]
    s_count = wavelengths.shape[1]
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

    def scan_body(carry, bounce_key):
        state, chainR = carry
        new_state, info = bounce_core(scene, cfg, wavelengths, state, bounce_key)
        # chain product up to and including this bounce's color*probability
        # but NOT its brdf (applied per gathered photon as 2|n.exit|)
        partialR = jnp.where(
            info["reflected"][:, None], chainR * info["color_prob"], chainR
        )
        new_chainR = jnp.where(
            info["reflected"][:, None],
            partialR * info["brdf_stored"][:, None],
            chainR,
        )
        vertex = {
            "valid": info["is_diffuse"],
            "position": info["position"],
            "normal": info["normal"],
            "incident": info["incident"],
            "partialR": partialR,
            "dispersed": info["dispersed"],
        }
        return (new_state, new_chainR), vertex

    keys = jax.random.split(key, cfg.bounces)

    # whole-batch early exit + preallocated [N, L, ...] vertex buffers
    # (a fixed scan would pay full masked depth after every path died)
    carry0 = (state, jnp.ones((n, s_count)))
    probe = jax.eval_shape(lambda: scan_body(carry0, keys[0])[1])
    bufs = jax.tree_util.tree_map(
        lambda s: jnp.zeros((n, cfg.bounces) + s.shape[1:], s.dtype), probe
    )

    def cond(c):
        i, carry, bufs = c
        return (i < cfg.bounces) & jnp.any(carry[0]["alive"])

    def body(c):
        i, carry, bufs = c
        carry, vertex = scan_body(carry, keys[i])
        bufs = jax.tree_util.tree_map(
            lambda b, v: b.at[:, i].set(v), bufs, vertex
        )
        return i + 1, carry, bufs

    _, (state, _), recorded = jax.lax.while_loop(cond, body, (jnp.int32(0), carry0, bufs))
    return state, recorded


def _hash_cells(positions, radius):
    cell = jnp.floor(positions / radius).astype(jnp.int32)
    # mix the three coordinates into one sortable key
    return (
        cell[..., 0] * 73856093 ^ cell[..., 1] * 19349663 ^ cell[..., 2] * 83492791
    ), cell


# the 27 neighbor-cell offsets scanned around each query point
_CELL_OFFSETS = jnp.asarray(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    jnp.int32,
)


def grid_sort_photons(p_pos, p_valid, radius):
    """Photon-side half of the hash grid: sort photons by cell key. Computed
    once per photon batch (the photon map does not change across camera
    bounces). Returns (order [P], sorted_keys [P])."""
    key_of, _ = _hash_cells(p_pos, radius)
    key_of = jnp.where(p_valid, key_of, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(key_of)
    return order, key_of[order]


def grid_query(sorted_keys, q_pos, radius):
    """Query-side half: locate the 27 neighbor cells of each query point in
    the sorted photon keys. Returns (starts [N, 27], ckeys [N, 27])."""
    _, q_cell = _hash_cells(q_pos, radius)
    cells = q_cell[:, None, :] + _CELL_OFFSETS[None, :, :]
    ckeys = (
        cells[..., 0] * 73856093
        ^ cells[..., 1] * 19349663
        ^ cells[..., 2] * 83492791
    )
    n = q_pos.shape[0]
    starts = jnp.searchsorted(sorted_keys, ckeys.reshape(-1)).reshape(n, 27)
    return starts, ckeys


def grid_prepare(p_pos, p_valid, q_pos, radius):
    """Sort photons by cell key and locate the 27 neighbor cells of each
    query: returns (order [P], sorted_keys [P], starts [N, 27], ckeys [N, 27]).
    Replaces the reference's kd-tree radius query (spatial/kd_tree.rs:47-106)
    with a TPU-friendly sorted hash grid (cell size = gather radius)."""
    order, sorted_keys = grid_sort_photons(p_pos, p_valid, radius)
    starts, ckeys = grid_query(sorted_keys, q_pos, radius)
    return order, sorted_keys, starts, ckeys


def grid_scan_slot(k, order, sorted_keys, starts, ckeys, p_valid, p_pos, q_pos, radius):
    """Candidate photon for scan step k (cell k // CAP, slot k % CAP):
    returns (pj [N] photon index, match [N] in-radius mask). Scanning all
    27 * _CELL_CAP steps enumerates every in-radius photon exactly once
    (provided no cell holds more than _CELL_CAP photons)."""
    p_count = p_pos.shape[0]
    c = k // _CELL_CAP
    slot = k % _CELL_CAP
    idx = jnp.clip(starts[:, c] + slot, 0, p_count - 1)
    pj = order[idx]
    match = (sorted_keys[idx] == ckeys[:, c]) & p_valid[pj]
    d2 = jnp.sum((p_pos[pj] - q_pos) ** 2, axis=-1)
    match &= d2 <= radius * radius
    return pj, match


def _gather(
    scene,
    film,
    cfg,
    radius,
    photon_probability,
    cam,
    cam_wavelengths,
    photons,
    acc,
    wt,
    positions_view,
):
    """Radius gather around each camera vertex (photon_mapping.rs:340-426)."""
    n, bounces = cam["valid"].shape[:2]
    s_count = cam_wavelengths.shape[1]

    p_pos = photons["position"]  # [P, 3]
    p_valid = photons["valid"]

    power_bins = photons["power_bins"]  # [P, B]

    # photon-side sort hoisted out of the bounce loop (the photon map does
    # not change across camera bounces); only the query side is per-bounce
    order, sorted_keys = grid_sort_photons(p_pos, p_valid, radius)
    bins = film.wavelength_to_bin(cam_wavelengths)  # [N, S]

    for b in range(bounces):
        valid = cam["valid"][:, b]
        pos = cam["position"][:, b]
        normal = cam["normal"][:, b]
        incident = cam["incident"][:, b]
        partialR = cam["partialR"][:, b]  # [N, S]
        cam_dispersed = cam["dispersed"][:, b]

        starts, ckeys = grid_query(sorted_keys, pos, radius)

        cos_cam = jnp.maximum(jnp.sum(incident * -normal, axis=-1), 0.0)

        def gather_body(k, carry):
            gathered, num_neighbors = carry
            pj, match = grid_scan_slot(
                k, order, sorted_keys, starts, ckeys, p_valid, p_pos, pos, radius
            )
            match &= valid
            # both chains dispersed -> pair skipped (photon_mapping.rs:355)
            match &= ~(cam_dispersed & photons["dispersed"][pj])

            exit_dir = -photons["incident"][pj]  # [N, 3]
            w_geom = jnp.maximum(jnp.sum(exit_dir * normal, axis=-1), 0.0)
            w_geom = w_geom * cos_cam / jnp.pi
            first_brdf = 2.0 * jnp.abs(jnp.sum(normal * exit_dir, axis=-1))
            power = jnp.take_along_axis(power_bins[pj], bins, axis=1)  # [N, S]
            contrib = partialR * (first_brdf * w_geom)[:, None] * power
            gathered = gathered + jnp.where(match[:, None], contrib, 0.0)
            num_neighbors = num_neighbors + match.astype(jnp.int32)
            return gathered, num_neighbors

        gathered, num_neighbors = jax.lax.fori_loop(
            0,
            27 * _CELL_CAP,
            gather_body,
            (jnp.zeros((n, s_count)), jnp.zeros(n, jnp.int32)),
        )

        # the reference exposes each neighbor sample separately with weight
        # photon_probability / num_neighbors; summed per lane that is
        #   acc += gathered * photon_probability / num_neighbors
        #   wt  += num_neighbors * (photon_probability / num_neighbors)
        has = num_neighbors > 0
        per_sample_w = photon_probability / jnp.maximum(num_neighbors, 1)
        from ..film import expose_sums

        acc, wt = expose_sums(
            film,
            acc,
            wt,
            positions_view,
            cam_wavelengths,
            gathered * per_sample_w[:, None],
            jnp.broadcast_to(
                jnp.where(has, photon_probability, 0.0)[:, None], (n, s_count)
            ),
            (valid & has)[:, None] & jnp.ones((n, s_count), bool),
        )

        dark_w = jnp.where(valid & ~has, 1.0 / photons["darkness_denom"], 0.0)
        acc, wt = expose_sums(
            film,
            acc,
            wt,
            positions_view,
            cam_wavelengths,
            jnp.zeros((n, s_count)),
            jnp.broadcast_to(dark_w[:, None], (n, s_count)),
            (valid & ~has)[:, None] & jnp.ones((n, s_count), bool),
        )
    return acc, wt


def _build_parts(project_data, scene: Scene):
    """Shared construction for the single-device and sharded drivers."""
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
    photon_cfg = TraceConfig(
        bounces=settings.photon_bounces,
        light_samples=0,
        spectrum_samples=settings.spectrum_samples,
    )
    radius = settings.radius
    photon_probability = 1.0 / (
        settings.bounces * settings.photon_bounces * settings.photon_passes
    )
    darkness_denom = float(settings.bounces * settings.photon_passes)

    bin_centers = jnp.asarray(
        [
            settings.spectrum_span[0]
            + (i + 0.5)
            * (settings.spectrum_span[1] - settings.spectrum_span[0])
            / settings.spectrum_bins
            for i in range(settings.spectrum_bins)
        ]
    )

    def photon_batch(key, count):
        """Shoot ``count`` photons; returns flat photon arrays with power on
        the film bin grid (light chains -> prefix products)."""
        wl = jnp.broadcast_to(bin_centers[None, :], (count, settings.spectrum_bins))
        path = trace_lamp_path(scene, photon_cfg, key, wl)
        n_slots = path["valid"].shape[1]

        # power prefix products on the bin grid, like BDPT's PP
        from .bidirectional import _lamp_path_factors

        pp, _, _, inc = _lamp_path_factors(scene, path, wl, photon_cfg)
        # a photon's power is its own probability times the PARENT chain's
        # product (accumulate_light, photon_mapping.rs:524-562: the photon's
        # own color and brdf are NOT included)
        pp_parent = jnp.concatenate(
            [jnp.ones_like(pp[:, :1]), pp[:, :-1]], axis=1
        )
        power = path["probability"][:, :, None] * pp_parent

        # photons are the diffuse vertices; emitter (slot 0) is not a photon
        def flat(x):
            return x.reshape((count * n_slots,) + x.shape[2:])

        return {
            "position": flat(path["position"]),
            # stored incident after the reference's pairs() reversal
            "incident": flat(inc),
            "power_bins": power.reshape(count * n_slots, settings.spectrum_bins),
            "valid": flat(path["valid"] & path["is_diffuse"]),
            "dispersed": flat(path["dispersed"]),
            "darkness_denom": darkness_denom,
        }

    def camera_step(acc, wt, key, data):
      with scene.bind(data):
        positions, origin, direction, wavelengths = chunk_rays(film, camera, cfg, key)
        k_t = jax.random.fold_in(key, 3)
        state, recorded = _record_camera_vertices(
            scene, cfg, k_t, origin, direction, wavelengths
        )
        n, s_count = state["brightness"].shape
        mask = jnp.concatenate(
            [
                jnp.ones((n, 1), bool),
                jnp.broadcast_to(state["aux_alive"][:, None], (n, s_count - 1)),
            ],
            axis=1,
        )
        acc, wt = film.expose(
            acc, wt, positions, wavelengths, state["brightness"],
            jnp.ones((n, s_count)), mask,
        )
        return acc, wt, recorded, positions, wavelengths

    def gather_step(acc, wt, key, recorded, positions, wavelengths, data):
        with scene.bind(data):
            photons = photon_batch(key, settings.photons)
            return _gather(
                scene, film, cfg, radius, photon_probability, recorded,
                wavelengths, photons, acc, wt, positions,
            )

    return film, settings, camera_step, gather_step


def make_sample_step(project_data, scene: Scene):
    """One full pixel pass (camera trace + all photon passes) as a pure
    film-delta step ``(acc, wt, key, data, row0) -> (acc, wt)`` — the unit
    the mesh shards over (row0 unused: photon passes sweep the whole film)."""
    film, settings, camera_step, gather_step = _build_parts(project_data, scene)

    def sample_step(acc, wt, key, data, row0=0):
        del row0
        k_cam = jax.random.fold_in(key, 0)
        acc, wt, recorded, positions, wavelengths = camera_step(acc, wt, k_cam, data)
        for p in range(settings.photon_passes):
            k_p = jax.random.fold_in(key, p + 1)
            acc, wt = gather_step(
                acc, wt, k_p, recorded, positions, wavelengths, data
            )
        return acc, wt

    return film, sample_step


def render(project_data, scene: Scene, seed: int = 0, on_progress=None, max_samples=None, resume=None):
    film, settings, camera_step, gather_step = _build_parts(project_data, scene)
    camera_step = jax.jit(camera_step)
    gather_step = jax.jit(gather_step)

    acc, wt = film.new_buffers()
    key = jax.random.PRNGKey(seed)
    total = settings.pixel_samples if max_samples is None else min(
        settings.pixel_samples, max_samples
    )
    start_sample = 0
    if resume is not None:
        acc = jnp.asarray(resume["acc"])
        wt = jnp.asarray(resume["wt"])
        start_sample = resume["samples_done"]
    data = scene.device_data()
    import numpy as np

    all_keys = np.asarray(
        jax.random.split(key, total * (1 + settings.photon_passes))
    )
    cursor = 0
    for i in range(total):
        if i < start_sample:
            cursor += 1 + settings.photon_passes
            continue
        k_i = all_keys[cursor]; cursor += 1
        acc, wt, recorded, positions, wavelengths = camera_step(acc, wt, k_i, data)
        for p in range(settings.photon_passes):
            k_p = all_keys[cursor]; cursor += 1
            acc, wt = gather_step(
                acc, wt, k_p, recorded, positions, wavelengths, data
            )
        if on_progress is not None:
            on_progress(
                RenderProgress(sample=i + 1, total=total, acc=acc, wt=wt, film=film)
            )
    return film, acc, wt


def render_sharded(project_data, scene: Scene, mesh, seed: int = 0, on_progress=None, max_samples=None, resume=None):
    """Multi-device photon mapping: each device runs complete pixel passes
    (camera trace + its own photon batches) — independent progressive
    estimators whose weighted film sums merge with one all-reduce."""
    from ..parallel.mesh import run_sharded

    film, step = make_sample_step(project_data, scene)
    settings = project_data.project.renderer
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
        on_progress=on_progress,
        resume=resume,
        progress_cls=RenderProgress,
    )
