"""Fused dense-scene bounce kernel (Pallas TPU).

The simple renderer's bounce loop on dense scenes (spheres-class: <= 128
finite primitives, no clusters) is bound by per-XLA-op overhead: one bounce
of bounce_core dispatches ~250 post-fusion ops (~12.6 ms at 524k lanes,
CLAUDE.md), of which intersection FLOPs are a trivial fraction. This module
fuses the ENTIRE bounce into TWO kernel launches, so a bounce costs two
dispatches plus one HBM round-trip of the wavefront state:
  - the BOUNCE kernel: closest-hit sweep, miss/sky, material component
    pick, probability programs, BSDF scatter, emission, reflection update;
  - the NEE kernel: lamp sampling + shadow sweep + contribution for ONE
    light sample, with the light_samples axis folded into the Pallas grid
    (the brightness output block is revisited across that grid dim — the
    standard Mosaic accumulation pattern). A single kernel containing all
    unrolled light samples was 220 KB of MLIR and OOM-killed the remote
    Mosaic compile service; the split keeps each program small.

Reference semantics: one iteration of the per-thread path loop
(tracer.rs:208-345) plus trace_direct (tracer.rs:362-399) — the kernel is a
numerical twin of tracer.bounce_core, and the interpret-mode parity test
(tests/test_kernels_dense.py) pins it against bounce_core output.

Division of labor with XLA (same playbook as kernels.py):
  - PRNG: threefry cannot run on-chip; tracer.draw_bounce_uniforms
    replicates bounce_core's exact key derivation outside the kernel and
    the draws ride in as inputs, so results are bit-identical.
  - lambda-only programs (colors, sky, lambda-only probabilities): their
    values at each lane's FIXED wavelengths are computed once per launch in
    XLA (precompute_bank_values) and enter as [P*S, B] rows — a while-loop
    invariant the kernel reads at HBM bandwidth, replacing any in-kernel
    table interpolation.
  - ray-input probability programs (fresnel) are elementwise math: their
    compiled fns are traced directly inside the kernel on [B, 3] inputs.

Per-lane state uses component-form [B] f32 arrays (vector math on [B, 3]
pads lanes 3 -> 128 on the VPU; spectral arrays use [S, B] row-major so the
pad is sublane-side only). Boolean path flags are packed into one int32
(Mosaic cannot lower i1-vector selects).

Scenes gate out (build_pack returns None) when they have clusters, DE
shapes, normal maps, textured/non-lambda color programs, texture-reading
probability programs, directional lamps, or tables that exceed one 128-lane
sheet row.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# enums mirrored from tracer.py (deferred imports avoid a module cycle)
_KIND_NONE = 0
_KIND_TRIANGLE = 1
_KIND_SPHERE = 2
_KIND_PLANE = 3
_PRIM_TRIANGLE = 0
_PRIM_SPHERE = 1
_BSDF_EMISSIVE = 0
_BSDF_DIFFUSE = 1
_BSDF_MIRROR = 2
_BSDF_REFRACTIVE = 3
_DIST_EPSILON = 1e-4

BLOCK = int(os.environ.get("PYRITE_TPU_DENSE_BLOCK", "1024"))

_VMEM_LIMIT = 96 * 1024 * 1024


def enabled() -> bool:
    """Fused-bounce opt-in: PYRITE_TPU_DENSE=1 on TPU, =interpret anywhere
    (parity tests). Default OFF: the first TPU measurement (round 3) put the
    fused path at 2.2 Mrays/s live vs 62.5 for the XLA wavefront — per-grid-
    step overhead at BLOCK=1024 with ~30 operands dominates. Re-flip to
    auto-on once the kernel beats the XLA path at bench widths."""
    mode = os.environ.get("PYRITE_TPU_DENSE", "0")
    if mode == "interpret":
        return True
    if mode == "1":
        return jax.default_backend() == "tpu"
    return False


def _interpret() -> bool:
    return os.environ.get("PYRITE_TPU_DENSE", "0") == "interpret"


# =============================================================================
# Scene packing
# =============================================================================

# sheet row indices (each row is a 128-wide f32 lane vector)
_GEO_ROWS = 22  # rows 0..21: prim channels (see build_pack)


def build_pack(scene, cfg, s_count):
    """Static gate + packed scene sheet. Returns None when the scene cannot
    ride the fused bounce kernel; otherwise a dict with the [R, 128] sheet
    and the static metadata the kernel builder closes over."""
    import pyrite_tpu.tracer as T

    a = scene.arrays
    if scene.use_clusters or scene.de_shapes:
        return None
    if scene.num_primitives > 128 or scene.num_primitives == 0:
        return None
    if scene.num_planes > 128:
        return None
    if scene.directional_lamps:
        return None
    if int(np.asarray(a["mat_normal_prog"]).max(initial=-1)) >= 0:
        return None
    for prog in scene.color_programs:
        if prog.uses_ray_inputs:
            return None
    for prog in scene.prob_programs:
        if prog.uses_texture:
            return None
    if scene.sky_program.uses_ray_inputs:
        return None
    for name in ("mat_comp_count", "comp_bsdf", "lamp_type", "emis_comp"):
        if np.asarray(a[name]).shape[0] > 128:
            return None
    lamp_types = set(np.asarray(a["lamp_type"]).tolist()) if scene.num_lamps else set()
    if not lamp_types <= {T.LAMP_POINT, T.LAMP_SPHERE, T.LAMP_TRIANGLE}:
        return None

    def row(values, dtype=np.float32):
        out = np.zeros(128, np.float32)
        v = np.asarray(values, np.float32).reshape(-1)
        out[: v.shape[0]] = v
        return out

    # prim channels in tracer's packed-geometry layout (cx cy cz e1 e2 r
    # kind ref) plus material and shading-normal channels. The per-kind
    # ref column matches hit["idx"] semantics (index into the tri_*/sph_*
    # tables), and `mat` dodges a second per-kind lookup.
    p = scene.num_primitives
    kind = np.asarray(a["prim_kind"])  # [P]
    ref = np.asarray(a["prim_ref"])
    cx = np.zeros(p, np.float32)
    cy, cz = np.zeros(p, np.float32), np.zeros(p, np.float32)
    e1 = np.zeros((p, 3), np.float32)
    e2 = np.zeros((p, 3), np.float32)
    rad = np.zeros(p, np.float32)
    mat = np.zeros(p, np.float32)
    nrm = np.zeros((p, 3, 3), np.float32)  # triangle vertex normals
    tri_sel = kind == _PRIM_TRIANGLE
    sph_sel = kind == _PRIM_SPHERE
    if tri_sel.any():
        t_ref = ref[tri_sel]
        v0 = np.asarray(a["tri_v0"])[t_ref]
        cx[tri_sel], cy[tri_sel], cz[tri_sel] = v0[:, 0], v0[:, 1], v0[:, 2]
        e1[tri_sel] = np.asarray(a["tri_e1"])[t_ref]
        e2[tri_sel] = np.asarray(a["tri_e2"])[t_ref]
        mat[tri_sel] = np.asarray(a["tri_mat"])[t_ref]
        nrm[tri_sel] = np.asarray(a["tri_n"])[t_ref]
    if sph_sel.any():
        s_ref = ref[sph_sel]
        c = np.asarray(a["sph_center"])[s_ref]
        cx[sph_sel], cy[sph_sel], cz[sph_sel] = c[:, 0], c[:, 1], c[:, 2]
        rad[sph_sel] = np.asarray(a["sph_radius"])[s_ref]
        mat[sph_sel] = np.asarray(a["sph_mat"])[s_ref]

    pk = np.full(128, -1.0, np.float32)
    pk[:p] = kind
    rows = [
        row(cx), row(cy), row(cz),                    # 0-2
        row(e1[:, 0]), row(e1[:, 1]), row(e1[:, 2]),  # 3-5
        row(e2[:, 0]), row(e2[:, 1]), row(e2[:, 2]),  # 6-8
        row(rad),                                     # 9
        pk,                                           # 10 kind (-1 pad)
        row(ref),                                     # 11
        row(mat),                                     # 12
        row(nrm[:, 0, 0]), row(nrm[:, 0, 1]), row(nrm[:, 0, 2]),  # 13-15
        row(nrm[:, 1, 0]), row(nrm[:, 1, 1]), row(nrm[:, 1, 2]),  # 16-18
        row(nrm[:, 2, 0]), row(nrm[:, 2, 1]), row(nrm[:, 2, 2]),  # 19-21
    ]
    assert len(rows) == _GEO_ROWS
    meta = {"n_prims": p, "n_planes": scene.num_planes}

    def add(name, values):
        meta[name] = len(rows)
        rows.append(row(values))

    if scene.num_planes:
        pn = np.asarray(a["pla_normal"])
        add("pla_nx", pn[:, 0]); add("pla_ny", pn[:, 1]); add("pla_nz", pn[:, 2])
        add("pla_d", a["pla_d"]); add("pla_mat", a["pla_mat"])
    add("mat_comp_count", a["mat_comp_count"])
    add("mat_comp_offset", a["mat_comp_offset"])
    add("mat_emis_count", a["mat_emis_count"])
    add("mat_emis_offset", a["mat_emis_offset"])
    add("comp_bsdf", a["comp_bsdf"])
    add("comp_color", a["comp_color"])
    add("comp_prob", a["comp_prob"])
    add("comp_prob_uses_wl", np.asarray(a["comp_prob_uses_wl"], np.float32))
    add("comp_selection", a["comp_selection"])
    add("comp_ior", a["comp_ior"])
    add("comp_disp", a["comp_disp"])
    add("comp_env_ior", a["comp_env_ior"])
    add("comp_env_disp", a["comp_env_disp"])
    if scene.num_lamps:
        add("lamp_type", a["lamp_type"])
        lv = np.asarray(a["lamp_vec"])
        add("lamp_vx", lv[:, 0]); add("lamp_vy", lv[:, 1]); add("lamp_vz", lv[:, 2])
        add("lamp_ref", a["lamp_ref"]); add("lamp_color", a["lamp_color"])
        # lamp shape tables, indexed by lamp_ref per type
        sc = np.asarray(a["sph_center"])
        add("lsph_cx", sc[:, 0]); add("lsph_cy", sc[:, 1]); add("lsph_cz", sc[:, 2])
        add("lsph_r", a["sph_radius"]); add("lsph_mat", a["sph_mat"])
        tv0 = np.asarray(a["tri_v0"]); te1 = np.asarray(a["tri_e1"]); te2 = np.asarray(a["tri_e2"])
        add("ltri_v0x", tv0[:, 0]); add("ltri_v0y", tv0[:, 1]); add("ltri_v0z", tv0[:, 2])
        add("ltri_e1x", te1[:, 0]); add("ltri_e1y", te1[:, 1]); add("ltri_e1z", te1[:, 2])
        add("ltri_e2x", te2[:, 0]); add("ltri_e2y", te2[:, 1]); add("ltri_e2z", te2[:, 2])
        tn = np.asarray(a["tri_n"])
        for vtx in range(3):
            add(f"ltri_n{vtx}x", tn[:, vtx, 0])
            add(f"ltri_n{vtx}y", tn[:, vtx, 1])
            add(f"ltri_n{vtx}z", tn[:, vtx, 2])
        add("ltri_mat", a["tri_mat"])
        add("emis_comp", a["emis_comp"])
        add("emis_selection", a["emis_selection"])

    meta["lamp_types"] = lamp_types
    meta["n_lamps"] = scene.num_lamps
    meta["n_color"] = len(scene.color_programs)
    meta["prob_progs"] = [
        (i, prog) for i, prog in enumerate(scene.prob_programs)
    ]
    return {"sheet": np.stack(rows), "meta": meta}


def precompute_bank_values(scene, wavelengths):
    """XLA-side per-launch bank values at each lane's fixed wavelengths:
    (color_vals [Pc, N, S], prob_vals [Pp, N] hero, sky [N, S]). Loop
    invariants for the kernel (the in-XLA equivalent halves throughput —
    CLAUDE.md — but here they replace per-bounce program dispatch with one
    HBM-bandwidth read inside an already-fused kernel)."""
    from .exprs import ProgramInputs

    n, s = wavelengths.shape
    lam = ProgramInputs(wavelength=wavelengths)
    hero = ProgramInputs(wavelength=wavelengths[:, :1])
    color_vals = jnp.stack(
        [jnp.broadcast_to(p(lam), (n, s)) for p in scene.color_programs]
    ) if scene.color_programs else jnp.zeros((0, n, s))
    prob_vals = jnp.stack(
        [
            jnp.broadcast_to(p(hero), (n, 1))[:, 0]
            if not p.uses_ray_inputs
            else jnp.zeros(n)
            for p in scene.prob_programs
        ]
    ) if scene.prob_programs else jnp.zeros((0, n))
    sky = jnp.broadcast_to(scene.sky_program(lam), (n, s))
    return color_vals, prob_vals, sky


# =============================================================================
# Kernel math helpers (component form)
# =============================================================================


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _cross3(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _norm3(x, y, z, eps=1e-20):
    inv = 1.0 / jnp.sqrt(jnp.maximum(x * x + y * y + z * z, eps))
    return x * inv, y * inv, z * inv


def _ortho3(vx, vy, vz):
    """geom.ortho, component form: cross(v, unit) with the unit picked per
    component (reference 'ortho')."""
    ax = jnp.abs(vx) < _DIST_EPSILON
    ay = jnp.abs(vy) < _DIST_EPSILON
    az = jnp.abs(vz) < _DIST_EPSILON
    # unit = ex | ey | ez | (-vy, vx, 0)
    ux = jnp.where(ax, 1.0, jnp.where(ay, 0.0, jnp.where(az, 0.0, -vy)))
    uy = jnp.where(ax, 0.0, jnp.where(ay, 1.0, jnp.where(az, 0.0, vx)))
    uz = jnp.where(ax, 0.0, jnp.where(ay, 0.0, jnp.where(az, 1.0, 0.0)))
    return _cross3(vx, vy, vz, ux, uy, uz)


def _sample_sphere_dir(u, v):
    # geom.sample_sphere with the arccos eliminated (no Mosaic lowering for
    # acos): cos(arccos(x)) = x, sin(arccos(x)) = sqrt(1 - x^2)
    theta = 2.0 * jnp.pi * u
    cos_phi = jnp.clip(2.0 * v - 1.0, -1.0, 1.0)
    sin_phi = jnp.sqrt(jnp.maximum(1.0 - cos_phi * cos_phi, 0.0))
    return sin_phi * jnp.cos(theta), sin_phi * jnp.sin(theta), cos_phi


def _sample_hemisphere(u, v, dx, dy, dz):
    """geom.sample_hemisphere (math.rs:155-164), component form."""
    sx, sy, sz = _sample_sphere_dir(u, v)
    ox_, oy_, oz_ = _norm3(*_ortho3(dx, dy, dz))
    cx_, cy_, cz_ = _norm3(*_cross3(ox_, oy_, oz_, dx, dy, dz))
    nx_, ny_, nz_ = _norm3(dx, dy, dz)
    az = jnp.abs(sz)
    return (
        ox_ * sx + cx_ * sy + nx_ * az,
        oy_ * sx + cy_ * sy + ny_ * az,
        oz_ * sx + cz_ * sy + nz_ * az,
    )


def _sample_cone(u1, u2, dx, dy, dz, cos_half):
    """geom.sample_cone (math.rs:125-137), component form."""
    o1x, o1y, o1z = _norm3(*_ortho3(dx, dy, dz))
    o2x, o2y, o2z = _norm3(*_cross3(dx, dy, dz, o1x, o1y, o1z))
    r1 = 2.0 * jnp.pi * u1
    r2 = cos_half + (1.0 - cos_half) * u2
    oneminus = jnp.sqrt(jnp.maximum(1.0 - r2 * r2, 0.0))
    c, s = jnp.cos(r1) * oneminus, jnp.sin(r1) * oneminus
    return (
        o1x * c + o2x * s + dx * r2,
        o1y * c + o2y * s + dy * r2,
        o1z * c + o2z * s + dz * r2,
    )


def _lut(sheet, meta_row, idx, width=128):
    """Small-table lookup table[idx] as a masked one-hot contraction (no
    per-lane gathers in Mosaic). ``idx`` is [B] i32; the table is one sheet
    row."""
    tab = sheet[meta_row, :]  # [128]
    col = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], width), 1)
    oh = col == idx[:, None]
    return jnp.sum(jnp.where(oh, tab[None, :], 0.0), axis=1)


def _prim_sweep(sheet, n_prims, ox, oy, oz, dx, dy, dz):
    """Dense prim tests [B, P]: (t, is_tri, u, v) with misses at +inf."""
    b = ox.shape[0]
    sl = lambda r: sheet[r, :n_prims][None, :]
    cx, cy, cz = sl(0), sl(1), sl(2)
    e1x, e1y, e1z = sl(3), sl(4), sl(5)
    e2x, e2y, e2z = sl(6), sl(7), sl(8)
    radius = sl(9)
    kind = sl(10)

    oxc, oyc, ozc = ox[:, None], oy[:, None], oz[:, None]
    dxc, dyc, dzc = dx[:, None], dy[:, None], dz[:, None]

    # Moller-Trumbore (geometry.ray_triangle)
    px = dyc * e2z - dzc * e2y
    py = dzc * e2x - dxc * e2z
    pz = dxc * e2y - dyc * e2x
    det = e1x * px + e1y * py + e1z * pz
    tri_ok = jnp.abs(det) > _DIST_EPSILON
    inv_det = 1.0 / jnp.where(tri_ok, det, 1.0)
    tvx, tvy, tvz = oxc - cx, oyc - cy, ozc - cz
    u = (tvx * px + tvy * py + tvz * pz) * inv_det
    tri_ok &= (u >= 0.0) & (u <= 1.0)
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    v = (dxc * qx + dyc * qy + dzc * qz) * inv_det
    tri_ok &= (v >= 0.0) & (u + v <= 1.0)
    tri_t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    tri_ok &= tri_t > _DIST_EPSILON

    # sphere (geometry.ray_sphere: nearest root > eps, else far root)
    lx, ly, lz = cx - oxc, cy - oyc, cz - ozc
    tca = lx * dxc + ly * dyc + lz * dzc
    d2 = lx * lx + ly * ly + lz * lz - tca * tca
    r2 = radius * radius
    sph_ok = d2 <= r2
    thc = jnp.sqrt(jnp.maximum(r2 - d2, 0.0))
    t0 = tca - thc
    t1 = tca + thc
    sph_t = jnp.where(t0 > _DIST_EPSILON, t0, t1)
    sph_ok &= sph_t > _DIST_EPSILON

    is_tri = kind == _PRIM_TRIANGLE
    ok = (is_tri & tri_ok) | (~is_tri & sph_ok & (kind == _PRIM_SPHERE))
    t = jnp.where(ok, jnp.where(is_tri, tri_t, sph_t), jnp.inf)
    return t, jnp.broadcast_to(is_tri, (b, n_prims)), u, v


def _row_min_pick(t):
    """(tmin [B], first-min column one-hot [B, P]) — gather-free row-min."""
    b, p = t.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (b, p), 1)
    tm = jnp.min(t, axis=1)
    sel = jnp.min(jnp.where(t == tm[:, None], col, p), axis=1)
    return tm, col == sel[:, None]


def _pick(onehot, rows):
    return jnp.sum(jnp.where(onehot, rows, 0.0), axis=1)


# =============================================================================
# The kernel
# =============================================================================


def _make_kernels(scene, meta, cfg, s_count, ls):
    """Build the (bounce, nee) kernel bodies. Static configuration (counts,
    program fns, lamp types) is closed over; everything dynamic arrives in
    refs. Together they mirror tracer.bounce_core's order exactly; the
    bounce kernel hands the NEE kernel its context through extra outputs
    (hit point = new origin, flipped normal, pre-brdf reflectance, and a
    nee-eligible flag bit)."""
    from jax.experimental import pallas as pl

    from .exprs import ProgramInputs

    n_prims = meta["n_prims"]
    n_planes = meta["n_planes"]
    n_lamps = meta["n_lamps"]
    n_color = meta["n_color"]
    prob_progs = meta["prob_progs"]
    lamp_types = meta["lamp_types"]
    import pyrite_tpu.tracer as T

    nee_prob = (
        1.0 / (ls * 2.0 * jnp.pi * (1.0 / n_lamps)) if n_lamps and ls else 0.0
    )

    def vec3(x, y, z):
        return jnp.concatenate([x[:, None], y[:, None], z[:, None]], axis=1)

    def eval_prob_bank(sheet, prob_vals, prog_id, wl0, nx, ny, nz, ix, iy, iz, active):
        """tracer.eval_prob_bank twin: hero-wavelength probabilities."""
        out = jnp.ones_like(wl0)
        normal = vec3(nx, ny, nz)
        incident = vec3(ix, iy, iz)
        inputs = ProgramInputs(
            wavelength=wl0[:, None], normal=normal, incident=incident,
            uv=jnp.concatenate([wl0[:, None] * 0.0] * 2, axis=1),
        )
        for p, prog in prob_progs:
            sel = prog_id == p
            if prog.uses_ray_inputs:
                val = jnp.broadcast_to(prog.fn(inputs), (wl0.shape[0], 1))[:, 0]
            else:
                val = prob_vals[p, :]
            out = jnp.where(sel & active, val, out)
        return out

    def eval_color_bank(cvals2d, prog_id, active):
        """[S, B] color from precomputed per-launch program values
        (cvals2d rows are [p * S + s]; static slices keep Mosaic 2D)."""
        out = jnp.zeros((s_count, cvals2d.shape[1]))
        for p in range(n_color):
            sel = (prog_id == p) & active
            out = out + jnp.where(
                sel[None, :], cvals2d[p * s_count : (p + 1) * s_count, :], 0.0
            )
        return out

    def closest_hit(sheet, ox, oy, oz, dx, dy, dz):
        """intersect_scene (dense) twin. Returns t, kind, matid, shading
        normal components, and found flag."""
        b = ox.shape[0]
        best_t = jnp.full(b, jnp.inf)
        best_kind = jnp.full(b, _KIND_NONE, jnp.int32)
        nx = jnp.zeros(b)
        ny = jnp.zeros(b)
        nz = jnp.zeros(b)
        matid = jnp.zeros(b, jnp.int32)

        if n_planes:
            pn_x = sheet[meta["pla_nx"], :n_planes][None, :]
            pn_y = sheet[meta["pla_ny"], :n_planes][None, :]
            pn_z = sheet[meta["pla_nz"], :n_planes][None, :]
            pd = sheet[meta["pla_d"], :n_planes][None, :]
            denom = (
                pn_x * dx[:, None] + pn_y * dy[:, None] + pn_z * dz[:, None]
            )
            p_ok = jnp.abs(denom) > 1e-12
            tp = (pd - (pn_x * ox[:, None] + pn_y * oy[:, None] + pn_z * oz[:, None])) / jnp.where(p_ok, denom, 1.0)
            p_ok &= tp > _DIST_EPSILON
            tp = jnp.where(p_ok, tp, jnp.inf)
            tmin, oh = _row_min_pick(tp)
            better = tmin < best_t
            best_t = jnp.where(better, tmin, best_t)
            best_kind = jnp.where(better, _KIND_PLANE, best_kind)
            nx = jnp.where(better, _pick(oh, pn_x), nx)
            ny = jnp.where(better, _pick(oh, pn_y), ny)
            nz = jnp.where(better, _pick(oh, pn_z), nz)
            matid = jnp.where(
                better,
                _pick(oh, sheet[meta["pla_mat"], :n_planes][None, :]).astype(jnp.int32),
                matid,
            )

        t, is_tri, u, v = _prim_sweep(sheet, n_prims, ox, oy, oz, dx, dy, dz)
        tmin, oh = _row_min_pick(t)
        better = tmin < best_t
        won_tri = _pick(oh, is_tri.astype(jnp.float32)) > 0.5
        best_t = jnp.where(better, tmin, best_t)
        best_kind = jnp.where(
            better,
            jnp.where(won_tri, _KIND_TRIANGLE, _KIND_SPHERE),
            best_kind,
        )
        matid = jnp.where(
            better, _pick(oh, sheet[12, :n_prims][None, :]).astype(jnp.int32), matid
        )
        # shading normals: triangle = vertex-normal lerp, sphere = radial
        uw = _pick(oh, u)
        vw = _pick(oh, v)
        ww = 1.0 - uw - vw
        tn = lambda r: _pick(oh, sheet[r, :n_prims][None, :])
        t_nx = tn(13) * ww + tn(16) * uw + tn(19) * vw
        t_ny = tn(14) * ww + tn(17) * uw + tn(20) * vw
        t_nz = tn(15) * ww + tn(18) * uw + tn(21) * vw
        t_nx, t_ny, t_nz = _norm3(t_nx, t_ny, t_nz)
        scx = tn(0)
        scy = tn(1)
        scz = tn(2)
        sr = jnp.maximum(tn(9), 1e-20)
        hx = ox + dx * jnp.where(jnp.isfinite(tmin), tmin, 0.0)
        hy = oy + dy * jnp.where(jnp.isfinite(tmin), tmin, 0.0)
        hz = oz + dz * jnp.where(jnp.isfinite(tmin), tmin, 0.0)
        s_nx, s_ny, s_nz = _norm3(hx - scx, hy - scy, hz - scz)
        nx = jnp.where(better, jnp.where(won_tri, t_nx, s_nx), nx)
        ny = jnp.where(better, jnp.where(won_tri, t_ny, s_ny), ny)
        nz = jnp.where(better, jnp.where(won_tri, t_nz, s_nz), nz)

        found = best_kind != _KIND_NONE
        return best_t, best_kind, matid, nx, ny, nz, found

    def shadow_any(sheet, ox, oy, oz, dx, dy, dz):
        """Nearest occluder t along a shadow ray (inf when none); the
        caller applies _direct_sample's blocked test against the lamp
        distance. Planes included."""
        t, _, _, _ = _prim_sweep(sheet, n_prims, ox, oy, oz, dx, dy, dz)
        tmin = jnp.min(t, axis=1)
        if n_planes:
            pn_x = sheet[meta["pla_nx"], :n_planes][None, :]
            pn_y = sheet[meta["pla_ny"], :n_planes][None, :]
            pn_z = sheet[meta["pla_nz"], :n_planes][None, :]
            pd = sheet[meta["pla_d"], :n_planes][None, :]
            denom = pn_x * dx[:, None] + pn_y * dy[:, None] + pn_z * dz[:, None]
            p_ok = jnp.abs(denom) > 1e-12
            tp = (pd - (pn_x * ox[:, None] + pn_y * oy[:, None] + pn_z * oz[:, None])) / jnp.where(p_ok, denom, 1.0)
            p_ok &= tp > _DIST_EPSILON
            tmin = jnp.minimum(tmin, jnp.min(jnp.where(p_ok, tp, jnp.inf), axis=1))
        return tmin

    def sample_lamp(sheet, lamp_idx, tx, ty, tz, u0, u1):
        """tracer.sample_lamp twin for point/sphere/triangle lamps. Returns
        direction, sq_distance, weight, surf normal, surf mat, is_shape,
        lamp color prog id."""
        b = tx.shape[0]
        ltype = _lut(sheet, meta["lamp_type"], lamp_idx).astype(jnp.int32)
        lref = jnp.maximum(_lut(sheet, meta["lamp_ref"], lamp_idx), 0.0).astype(jnp.int32)
        cprog = _lut(sheet, meta["lamp_color"], lamp_idx).astype(jnp.int32)

        ddx = jnp.zeros(b)
        ddy = jnp.zeros(b)
        ddz = jnp.ones(b)
        sqd = jnp.full(b, jnp.inf)
        weight = jnp.zeros(b)
        s_nx = jnp.zeros(b)
        s_ny = jnp.zeros(b)
        s_nz = jnp.ones(b)
        s_mat = jnp.zeros(b, jnp.int32)
        is_shape = jnp.zeros(b, bool)

        if T.LAMP_POINT in lamp_types:
            lvx = _lut(sheet, meta["lamp_vx"], lamp_idx)
            lvy = _lut(sheet, meta["lamp_vy"], lamp_idx)
            lvz = _lut(sheet, meta["lamp_vz"], lamp_idx)
            vx, vy, vz = lvx - tx, lvy - ty, lvz - tz
            pt_sqd = vx * vx + vy * vy + vz * vz
            px_, py_, pz_ = _norm3(vx, vy, vz)
            is_pt = ltype == T.LAMP_POINT
            ddx = jnp.where(is_pt, px_, ddx)
            ddy = jnp.where(is_pt, py_, ddy)
            ddz = jnp.where(is_pt, pz_, ddz)
            sqd = jnp.where(is_pt, pt_sqd, sqd)
            weight = jnp.where(is_pt, 4.0 * jnp.pi / jnp.maximum(pt_sqd, 1e-20), weight)

        if T.LAMP_SPHERE in lamp_types:
            scx = _lut(sheet, meta["lsph_cx"], lref)
            scy = _lut(sheet, meta["lsph_cy"], lref)
            scz = _lut(sheet, meta["lsph_cz"], lref)
            sr_full = _lut(sheet, meta["lsph_r"], lref)
            sr = jnp.maximum(sr_full - _DIST_EPSILON, 0.0)
            vx, vy, vz = scx - tx, scy - ty, scz - tz
            dist2 = vx * vx + vy * vy + vz * vz
            outside = dist2 > sr * sr
            cos_max = jnp.sqrt(
                jnp.maximum(1.0 - (sr * sr) / jnp.maximum(dist2, 1e-20), 0.0)
            )
            cdx, cdy, cdz = _norm3(vx, vy, vz)
            kx, ky, kz = _sample_cone(u0, u1, cdx, cdy, cdz, cos_max)
            # intersect the FULL sphere along the cone direction
            lx, ly, lz = scx - tx, scy - ty, scz - tz
            tca = lx * kx + ly * ky + lz * kz
            d2 = lx * lx + ly * ly + lz * lz - tca * tca
            r2 = sr_full * sr_full
            hitc = d2 <= r2
            thc = jnp.sqrt(jnp.maximum(r2 - d2, 0.0))
            t0 = tca - thc
            t1 = tca + thc
            cone_t = jnp.where(t0 > _DIST_EPSILON, t0, t1)
            hitc &= cone_t > _DIST_EPSILON
            cone_t = jnp.where(hitc, cone_t, 0.0)
            p_out_x = tx + kx * cone_t
            p_out_y = ty + ky * cone_t
            p_out_z = tz + kz * cone_t
            ux_, uy_, uz_ = _sample_sphere_dir(u0, u1)
            p_in_x = scx + ux_ * sr_full
            p_in_y = scy + uy_ * sr_full
            p_in_z = scz + uz_ * sr_full
            spx = jnp.where(outside, p_out_x, p_in_x)
            spy = jnp.where(outside, p_out_y, p_in_y)
            spz = jnp.where(outside, p_out_z, p_in_z)
            svx, svy, svz = spx - tx, spy - ty, spz - tz
            sqd_in = svx * svx + svy * svy + svz * svz
            sph_sqd = jnp.where(outside, cone_t * cone_t, sqd_in)
            nvx, nvy, nvz = _norm3(svx, svy, svz)
            sdx = jnp.where(outside, kx, nvx)
            sdy = jnp.where(outside, ky, nvy)
            sdz = jnp.where(outside, kz, nvz)
            cos_full = jnp.sqrt(
                jnp.maximum(
                    1.0 - (sr_full * sr_full) / jnp.maximum(dist2, 1e-20), 0.0
                )
            )
            lnx, lny, lnz = _norm3(spx - scx, spy - scy, spz - scz)
            area = sr_full * sr_full * 4.0 * jnp.pi
            cos_in = jnp.abs(lnx * -sdx + lny * -sdy + lnz * -sdz)
            solid = jnp.where(cos_full >= 1.0, 0.0, 2.0 * jnp.pi * (1.0 - cos_full))
            sph_w = jnp.where(
                dist2 > sr_full * sr_full,
                solid,
                cos_in * area / jnp.maximum(sph_sqd, 1e-20),
            )
            is_sph = ltype == T.LAMP_SPHERE
            ddx = jnp.where(is_sph, sdx, ddx)
            ddy = jnp.where(is_sph, sdy, ddy)
            ddz = jnp.where(is_sph, sdz, ddz)
            sqd = jnp.where(is_sph, sph_sqd, sqd)
            weight = jnp.where(is_sph, sph_w, weight)
            s_nx = jnp.where(is_sph, lnx, s_nx)
            s_ny = jnp.where(is_sph, lny, s_ny)
            s_nz = jnp.where(is_sph, lnz, s_nz)
            s_mat = jnp.where(
                is_sph, _lut(sheet, meta["lsph_mat"], lref).astype(jnp.int32), s_mat
            )
            is_shape |= is_sph

        if T.LAMP_TRIANGLE in lamp_types:
            tu = u0
            tv = u1
            fold = tu + tv > 1.0
            tu = jnp.where(fold, 1.0 - tu, tu)
            tv = jnp.where(fold, 1.0 - tv, tv)
            v0x = _lut(sheet, meta["ltri_v0x"], lref)
            v0y = _lut(sheet, meta["ltri_v0y"], lref)
            v0z = _lut(sheet, meta["ltri_v0z"], lref)
            e1x = _lut(sheet, meta["ltri_e1x"], lref)
            e1y = _lut(sheet, meta["ltri_e1y"], lref)
            e1z = _lut(sheet, meta["ltri_e1z"], lref)
            e2x = _lut(sheet, meta["ltri_e2x"], lref)
            e2y = _lut(sheet, meta["ltri_e2y"], lref)
            e2z = _lut(sheet, meta["ltri_e2z"], lref)
            ppx = v0x + e1x * tu + e2x * tv
            ppy = v0y + e1y * tu + e2y * tv
            ppz = v0z + e1z * tu + e2z * tv
            vx, vy, vz = ppx - tx, ppy - ty, ppz - tz
            tri_sqd = vx * vx + vy * vy + vz * vz
            tdx, tdy, tdz = _norm3(vx, vy, vz)
            tw = 1.0 - tu - tv
            nx0 = _lut(sheet, meta["ltri_n0x"], lref)
            ny0 = _lut(sheet, meta["ltri_n0y"], lref)
            nz0 = _lut(sheet, meta["ltri_n0z"], lref)
            nx1 = _lut(sheet, meta["ltri_n1x"], lref)
            ny1 = _lut(sheet, meta["ltri_n1y"], lref)
            nz1 = _lut(sheet, meta["ltri_n1z"], lref)
            nx2 = _lut(sheet, meta["ltri_n2x"], lref)
            ny2 = _lut(sheet, meta["ltri_n2y"], lref)
            nz2 = _lut(sheet, meta["ltri_n2z"], lref)
            tnx, tny, tnz = _norm3(
                nx0 * tw + nx1 * tu + nx2 * tv,
                ny0 * tw + ny1 * tu + ny2 * tv,
                nz0 * tw + nz1 * tu + nz2 * tv,
            )
            # area = |e1 x e2| / 2
            crx, cry, crz = _cross3(e1x, e1y, e1z, e2x, e2y, e2z)
            area = 0.5 * jnp.sqrt(crx * crx + cry * cry + crz * crz)
            cos_in = jnp.abs(tnx * -tdx + tny * -tdy + tnz * -tdz)
            tri_w = cos_in * area / jnp.maximum(tri_sqd, 1e-20)
            is_tri = ltype == T.LAMP_TRIANGLE
            ddx = jnp.where(is_tri, tdx, ddx)
            ddy = jnp.where(is_tri, tdy, ddy)
            ddz = jnp.where(is_tri, tdz, ddz)
            sqd = jnp.where(is_tri, tri_sqd, sqd)
            weight = jnp.where(is_tri, tri_w, weight)
            s_nx = jnp.where(is_tri, tnx, s_nx)
            s_ny = jnp.where(is_tri, tny, s_ny)
            s_nz = jnp.where(is_tri, tnz, s_nz)
            s_mat = jnp.where(
                is_tri, _lut(sheet, meta["ltri_mat"], lref).astype(jnp.int32), s_mat
            )
            is_shape |= is_tri

        return ddx, ddy, ddz, sqd, weight, s_nx, s_ny, s_nz, s_mat, is_shape, cprog

    def bounce_kernel(
        sheet_ref, cvals_ref, pvals_ref, sky_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
        flags_ref, refl_ref, bright_ref, wl_ref,
        ucomp_ref, usc_ref,
        o_ox, o_oy, o_oz, o_dx, o_dy, o_dz, o_flags, o_refl, o_bright,
        o_fx, o_fy, o_fz, o_refl_nee,
    ):
        sheet = sheet_ref[:]
        cvals = cvals_ref[:]  # [(Pc * S), B]
        pvals = pvals_ref[:]
        sky = sky_ref[:]  # [S, B]
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        flags = flags_ref[:]
        refl = refl_ref[:]  # [S, B]
        bright = bright_ref[:]
        wl = wl_ref[:]
        b = ox.shape[0]

        alive = (flags & 1) != 0
        aux_alive = (flags & 2) != 0
        sample_light = (flags & 4) != 0
        light_events = (flags >> 3) & 3

        # ---- closest hit ----------------------------------------------------
        t, kind, matid, nx, ny, nz, found = closest_hit(sheet, ox, oy, oz, dx, dy, dz)
        safe_t = jnp.where(jnp.isfinite(t), t, 0.0)
        px_ = ox + dx * safe_t
        py_ = oy + dy * safe_t
        pz_ = oz + dz * safe_t

        # ---- miss: sky (directional lamps gated out) ------------------------
        miss = alive & ~found
        aux_cols = aux_alive[None, :] | (
            jax.lax.broadcasted_iota(jnp.int32, (s_count, b), 0) == 0
        )
        bright = bright + jnp.where(
            (miss[None, :]) & aux_cols, sky * refl, 0.0
        )

        # ---- hit: component pick -------------------------------------------
        hit_active = alive & found
        count = jnp.maximum(
            _lut(sheet, meta["mat_comp_count"], matid), 1.0
        )
        pick = jnp.minimum(
            (ucomp_ref[:] * count).astype(jnp.int32), count.astype(jnp.int32) - 1
        )
        comp = _lut(sheet, meta["mat_comp_offset"], matid).astype(jnp.int32) + pick

        wl0 = wl[0, :]
        comp_prob_id = _lut(sheet, meta["comp_prob"], comp).astype(jnp.int32)
        comp_probability = eval_prob_bank(
            sheet, pvals, comp_prob_id, wl0, nx, ny, nz, dx, dy, dz, hit_active
        ) * _lut(sheet, meta["comp_selection"], comp)
        normal_dispersed = _lut(sheet, meta["comp_prob_uses_wl"], comp) > 0.5

        # ---- scatter (tracer.scatter twin) ----------------------------------
        usc = usc_ref[:]  # [3, B]
        bsdf = _lut(sheet, meta["comp_bsdf"], comp).astype(jnp.int32)
        d_dot_n = _dot3(dx, dy, dz, nx, ny, nz)
        flip_s = jnp.where(d_dot_n < 0.0, 1.0, -1.0)
        fx, fy, fz = nx * flip_s, ny * flip_s, nz * flip_s

        diff_x, diff_y, diff_z = _sample_hemisphere(usc[0], usc[1], fx, fy, fz)
        m_dot = _dot3(dx, dy, dz, fx, fy, fz)
        mir_x = dx - fx * (2.0 * m_dot)
        mir_y = dy - fy * (2.0 * m_dot)
        mir_z = dz - fz * (2.0 * m_dot)

        wl_um = wl0 * 0.001
        inv_wl2 = 1.0 / (wl_um * wl_um)
        ior = _lut(sheet, meta["comp_ior"], comp) + _lut(sheet, meta["comp_disp"], comp) * inv_wl2
        env_ior = _lut(sheet, meta["comp_env_ior"], comp) + _lut(sheet, meta["comp_env_disp"], comp) * inv_wl2
        refr_dispersed = (
            _lut(sheet, meta["comp_disp"], comp) != 0.0
        ) | (_lut(sheet, meta["comp_env_disp"], comp) != 0.0)

        n_dot_d = _dot3(nx, ny, nz, dx, dy, dz)
        refl_x = dx - nx * (2.0 * n_dot_d)
        refl_y = dy - ny * (2.0 * n_dot_d)
        refl_z = dz - nz * (2.0 * n_dot_d)
        into = _dot3(nx, ny, nz, fx, fy, fz) > 0.0
        nnt = jnp.where(into, env_ior / ior, ior / env_ior)
        ddn = _dot3(dx, dy, dz, fx, fy, fz)
        cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
        tir = cos2t < 0.0
        s_sign = jnp.where(into, 1.0, -1.0)
        s_val = s_sign * (ddn * nnt + jnp.sqrt(jnp.maximum(cos2t, 0.0)))
        tdx, tdy, tdz = _norm3(
            dx * nnt - nx * s_val, dy * nnt - ny * s_val, dz * nnt - nz * s_val
        )
        a_ = ior - env_ior
        b_ = ior + env_ior
        r0 = (a_ * a_) / (b_ * b_)
        c_ = 1.0 - jnp.where(into, -ddn, _dot3(tdx, tdy, tdz, nx, ny, nz))
        re = r0 + (1.0 - r0) * c_ ** 5
        tr = 1.0 - re
        p_refl = 0.25 + 0.5 * re
        pick_reflect = usc[2] < p_refl
        use_refl = tir | pick_reflect
        rfx = jnp.where(use_refl, refl_x, tdx)
        rfy = jnp.where(use_refl, refl_y, tdy)
        rfz = jnp.where(use_refl, refl_z, tdz)
        refr_prob = jnp.where(
            tir, 1.0, jnp.where(pick_reflect, re / p_refl, tr / (1.0 - p_refl))
        )

        is_diffuse = bsdf == _BSDF_DIFFUSE
        is_mirror = bsdf == _BSDF_MIRROR
        is_refr = bsdf == _BSDF_REFRACTIVE
        is_emissive_b = bsdf == _BSDF_EMISSIVE

        out_x = jnp.where(is_diffuse, diff_x, jnp.where(is_mirror, mir_x, rfx))
        out_y = jnp.where(is_diffuse, diff_y, jnp.where(is_mirror, mir_y, rfy))
        out_z = jnp.where(is_diffuse, diff_z, jnp.where(is_mirror, mir_z, rfz))
        sc_probability = jnp.where(is_refr, refr_prob, 1.0)
        sc_dispersed = is_refr & refr_dispersed
        is_specular = is_mirror | is_refr

        emitted = hit_active & is_emissive_b
        reflected = hit_active & ~is_emissive_b

        # ---- emission -------------------------------------------------------
        emit_now = emitted & sample_light
        aux_emit = (aux_alive & ~normal_dispersed)[None, :] | (
            jax.lax.broadcasted_iota(jnp.int32, (s_count, b), 0) == 0
        )
        color_id = _lut(sheet, meta["comp_color"], comp).astype(jnp.int32)
        surface_color = eval_color_bank(cvals, color_id, hit_active)
        bright = bright + jnp.where(
            emit_now[None, :] & aux_emit,
            surface_color * comp_probability[None, :] * refl,
            0.0,
        )

        # ---- reflection -----------------------------------------------------
        bounce_dispersed = sc_dispersed | normal_dispersed
        aux_next = aux_alive & (~reflected | ~bounce_dispersed)
        aux_ref_cols = aux_next[None, :] | (
            jax.lax.broadcasted_iota(jnp.int32, (s_count, b), 0) == 0
        )
        path_prob = sc_probability * comp_probability
        refl_new = jnp.where(
            reflected[None, :] & aux_ref_cols,
            refl * surface_color * path_prob[None, :],
            refl,
        )

        # ---- NEE eligibility (contribution runs in the NEE kernel) ----------
        nee_now = reflected & is_diffuse & (light_events < 2)
        light_events_new = light_events + jnp.where(nee_now, 1, 0)
        inner = ((light_events < 2) & (is_specular | (ls == 0))) | (
            light_events >= 2
        )
        sample_light_new = (reflected & inner) | (~reflected & sample_light)

        # ---- brdf + state ---------------------------------------------------
        # NEE (in the nee kernel) consumes the reflectance BEFORE the bounce
        # brdf factor — bounce_core's order
        refl_pre_brdf = refl_new
        brdf_v = jnp.where(
            is_diffuse,
            2.0 * jnp.abs(_dot3(nx, ny, nz, out_x, out_y, out_z)),
            1.0,
        )
        refl_new = jnp.where(
            reflected[None, :] & aux_ref_cols, refl_new * brdf_v[None, :], refl_new
        )

        o_ox[:] = jnp.where(reflected, px_, ox)
        o_oy[:] = jnp.where(reflected, py_, oy)
        o_oz[:] = jnp.where(reflected, pz_, oz)
        o_dx[:] = jnp.where(reflected, out_x, dx)
        o_dy[:] = jnp.where(reflected, out_y, dy)
        o_dz[:] = jnp.where(reflected, out_z, dz)
        alive_next = alive & reflected
        o_flags[:] = (
            alive_next.astype(jnp.int32)
            | (aux_next.astype(jnp.int32) << 1)
            | (sample_light_new.astype(jnp.int32) << 2)
            | (jnp.minimum(light_events_new, 3) << 3)
            | (nee_now.astype(jnp.int32) << 5)
        )
        o_refl[:] = refl_new
        o_bright[:] = bright
        o_fx[:] = fx
        o_fy[:] = fy
        o_fz[:] = fz
        o_refl_nee[:] = refl_pre_brdf

    def nee_kernel(
        sheet_ref, cvals_ref, pvals_ref,
        px_ref, py_ref, pz_ref, fx_ref, fy_ref, fz_ref,
        flags_ref, refl_ref, wl_ref,
        lampi_ref, unee_ref,
        o_bright,
    ):
        """One NEE light sample (the light_samples axis is grid dim 1; the
        o_bright block is revisited across it and accumulates). trace_direct
        twin (tracer.rs:362-399)."""
        sheet = sheet_ref[:]
        cvals = cvals_ref[:]
        pvals = pvals_ref[:]
        px_, py_, pz_ = px_ref[:], py_ref[:], pz_ref[:]
        fx, fy, fz = fx_ref[:], fy_ref[:], fz_ref[:]
        flags = flags_ref[:]
        refl_new = refl_ref[:]  # pre-brdf reflectance [S, B]
        wl0 = wl_ref[0, :]
        b = px_.shape[0]

        nee_now = (flags & 32) != 0
        aux_next = (flags & 2) != 0

        @pl.when(pl.program_id(1) == 0)
        def _init():
            o_bright[:] = jnp.zeros_like(o_bright)

        unee = unee_ref[:]  # [8, B]: this sample's draw group (see _bounce_call)
        u0 = unee[0]
        u1 = unee[1]
        u_emis = unee[4]
        lamp_idx = lampi_ref[:]
        (ddx, ddy, ddz, sqd, weight, lnx, lny, lnz, lmat, lshape,
         lcprog) = sample_lamp(sheet, lamp_idx, px_, py_, pz_, u0, u1)
        cos_out = jnp.maximum(_dot3(fx, fy, fz, ddx, ddy, ddz), 0.0)
        contributes = nee_now & (cos_out > 0.0)
        t_hit = shadow_any(sheet, px_, py_, pz_, ddx, ddy, ddz)
        has_hit = jnp.isfinite(t_hit)
        hit_sq = jnp.where(has_hit, t_hit * t_hit, jnp.inf)
        blocked = has_hit & (hit_sq < sqd - _DIST_EPSILON)
        contributes &= ~blocked

        e_count = jnp.maximum(_lut(sheet, meta["mat_emis_count"], lmat), 1.0)
        e_pick = jnp.minimum(
            (u_emis * e_count).astype(jnp.int32),
            e_count.astype(jnp.int32) - 1,
        )
        eidx = _lut(sheet, meta["mat_emis_offset"], lmat).astype(jnp.int32) + e_pick
        e_comp = _lut(sheet, meta["emis_comp"], eidx).astype(jnp.int32)
        e_sel = _lut(sheet, meta["emis_selection"], eidx)

        tn_x = jnp.where(lshape, lnx, -ddx)
        tn_y = jnp.where(lshape, lny, -ddy)
        tn_z = jnp.where(lshape, lnz, -ddz)
        l_prob_id = _lut(sheet, meta["comp_prob"], e_comp).astype(jnp.int32)
        mat_prob = eval_prob_bank(
            sheet, pvals, l_prob_id, wl0, tn_x, tn_y, tn_z,
            ddx, ddy, ddz, contributes,
        ) * e_sel
        mat_prob = jnp.where(lshape, mat_prob, 1.0)
        l_dispersed = lshape & (
            _lut(sheet, meta["comp_prob_uses_wl"], e_comp) > 0.5
        )
        l_color_id = jnp.where(
            lshape,
            _lut(sheet, meta["comp_color"], e_comp).astype(jnp.int32),
            lcprog,
        )
        l_color = eval_color_bank(cvals, l_color_id, contributes)

        brdf = 2.0 * jnp.abs(_dot3(fx, fy, fz, ddx, ddy, ddz))
        scale = weight * nee_prob * brdf
        l_prob = scale * mat_prob
        col_mask = (aux_next & ~l_dispersed)[None, :] | (
            jax.lax.broadcasted_iota(jnp.int32, (s_count, b), 0) == 0
        )
        o_bright[:] += jnp.where(
            contributes[None, :] & col_mask,
            l_color * l_prob[None, :] * refl_new,
            0.0,
        )

    return bounce_kernel, nee_kernel


# =============================================================================
# Call wrapper
# =============================================================================


@functools.partial(
    jax.jit,
    static_argnames=("scene", "cfg", "s_count", "ls", "interpret"),
)
def _bounce_call(
    scene, cfg, s_count, ls, sheet, cvals, pvals, sky,
    origin, direction, flags, refl, bright, wl, draws, interpret=False,
):
    from jax.experimental import pallas as pl

    meta = scene.dense_pack["meta"]
    bounce_kernel, nee_kernel = _make_kernels(scene, meta, cfg, s_count, ls)

    n = origin.shape[0]
    block = BLOCK if n >= BLOCK else 1024
    pad = (-n) % block
    n_color = meta["n_color"]

    def padl(x, fill=0.0):
        if not pad:
            return x
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
        )

    def padr(x, fill=0.0):  # [rows, N] layout
        if not pad:
            return x
        return jnp.concatenate(
            [x, jnp.full(x.shape[:-1] + (pad,), fill, x.dtype)], axis=-1
        )

    np_ = n + pad
    ox, oy, oz = (padl(origin[:, i]) for i in range(3))
    dx, dy, dz = (padl(direction[:, i]) for i in range(3))
    flags = padl(flags)
    refl_t = padr(refl.T)  # [S, N]
    bright_t = padr(bright.T)
    wl_t = padr(wl.T)
    cvals_t = padr(cvals.reshape(n_color * s_count, n) if n_color else jnp.zeros((1, n)))
    pvals_t = padr(pvals if pvals.shape[0] else jnp.zeros((1, n)))
    sky_t = padr(sky.T)
    ucomp = padl(draws["u_comp"])
    usc = padr(draws["u_scatter"].T)  # [3, N]
    if "lamp_idx" in draws:
        lampi = padl(draws["lamp_idx"])
        # per-sample draw groups of 8 sublanes (Mosaic requires sublane
        # blocks divisible by 8): rows s*8+0..3 = u_nee[s], row s*8+4 =
        # u_emis[s], rows 5-7 pad
        unee = jnp.zeros((ls * 8, np_))
        unee = unee.at[
            (jnp.arange(ls * 4) // 4) * 8 + jnp.arange(ls * 4) % 4
        ].set(padr(draws["u_nee"].transpose(0, 2, 1).reshape(ls * 4, n)))
        unee = unee.at[jnp.arange(ls) * 8 + 4].set(padr(draws["u_emis"]))
    else:
        lampi = jnp.zeros(np_, jnp.int32)
        unee = jnp.zeros((max(ls, 1) * 8, np_))

    lane = pl.BlockSpec((block,), lambda i: (i,))

    def rows_spec(r):
        return pl.BlockSpec((r, block), lambda i: (0, i))

    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0, 0))

    lane_f32 = jax.ShapeDtypeStruct((np_,), jnp.float32)
    out = pl.pallas_call(
        bounce_kernel,
        grid=(np_ // block,),
        in_specs=[
            full(sheet),
            rows_spec(cvals_t.shape[0]),
            rows_spec(pvals_t.shape[0]),
            rows_spec(s_count),
            lane, lane, lane, lane, lane, lane,
            lane,
            rows_spec(s_count), rows_spec(s_count), rows_spec(s_count),
            lane, rows_spec(3),
        ],
        out_specs=[lane] * 7 + [rows_spec(s_count)] * 2 + [lane] * 3
        + [rows_spec(s_count)],
        out_shape=[lane_f32] * 6
        + [jax.ShapeDtypeStruct((np_,), jnp.int32)]
        + [jax.ShapeDtypeStruct((s_count, np_), jnp.float32)] * 2
        + [lane_f32] * 3
        + [jax.ShapeDtypeStruct((s_count, np_), jnp.float32)],
        compiler_params=None if interpret else _compiler(),
        interpret=interpret,
    )(
        sheet, cvals_t, pvals_t, sky_t,
        ox, oy, oz, dx, dy, dz, flags, refl_t, bright_t, wl_t,
        ucomp, usc,
    )
    (o_ox, o_oy, o_oz, o_dx, o_dy, o_dz, o_flags, o_refl, o_bright,
     o_fx, o_fy, o_fz, o_refl_nee) = out

    if meta["n_lamps"] and ls:
        # the light_samples axis rides grid dim 1 (innermost): the bright
        # output block is revisited across it and accumulates on-chip
        nee_lane = pl.BlockSpec((block,), lambda i, s: (i,))

        def nee_rows(r):
            return pl.BlockSpec((r, block), lambda i, s: (0, i))

        bright_nee = pl.pallas_call(
            nee_kernel,
            grid=(np_ // block, ls),
            in_specs=[
                pl.BlockSpec(sheet.shape, lambda i, s: (0, 0)),
                nee_rows(cvals_t.shape[0]),
                nee_rows(pvals_t.shape[0]),
                nee_lane, nee_lane, nee_lane,
                nee_lane, nee_lane, nee_lane,
                nee_lane,
                nee_rows(s_count), nee_rows(s_count),
                nee_lane,
                pl.BlockSpec((8, block), lambda i, s: (s, i)),
            ],
            out_specs=[nee_rows(s_count)],
            out_shape=[jax.ShapeDtypeStruct((s_count, np_), jnp.float32)],
            compiler_params=None if interpret else _compiler(),
            interpret=interpret,
        )(
            sheet, cvals_t, pvals_t,
            o_ox, o_oy, o_oz, o_fx, o_fy, o_fz,
            o_flags, o_refl_nee, wl_t,
            lampi, unee,
        )[0]
        o_bright = o_bright + bright_nee

    trim = lambda x: x[:n]
    origin_new = jnp.stack([trim(o_ox), trim(o_oy), trim(o_oz)], axis=1)
    direction_new = jnp.stack([trim(o_dx), trim(o_dy), trim(o_dz)], axis=1)
    return origin_new, direction_new, trim(o_flags), o_refl[:, :n].T, o_bright[:, :n].T


def _compiler():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def bounce_dense(scene, cfg, wavelengths, state, bounce_key, bank_vals):
    """One fused bounce: drop-in for tracer.bounce_core's new_state (the
    photon/BDPT ``info`` outputs are not produced — only trace_paths rides
    this path). ``bank_vals`` is precompute_bank_values' output."""
    import pyrite_tpu.tracer as T

    n, s_count = wavelengths.shape
    draws = T.draw_bounce_uniforms(scene, cfg, bounce_key, n)
    flags = (
        state["alive"].astype(jnp.int32)
        | (state["aux_alive"].astype(jnp.int32) << 1)
        | (state["sample_light"].astype(jnp.int32) << 2)
        | (jnp.minimum(state["light_events"], 3) << 3)
    )
    cvals, pvals, sky = bank_vals
    sheet = jnp.asarray(scene.dense_pack["sheet"])
    cvals_r = cvals.transpose(0, 2, 1) if cvals.shape[0] else cvals  # [P, S, N]
    origin, direction, flags, refl, bright = _bounce_call(
        scene, cfg, s_count, cfg.light_samples, sheet,
        cvals_r.reshape(-1, n) if cvals.shape[0] else jnp.zeros((1, n)),
        pvals, sky,
        state["origin"], state["direction"], flags,
        state["reflectance"], state["brightness"], wavelengths, draws,
        interpret=_interpret(),
    )
    return {
        "origin": origin,
        "direction": direction,
        "brightness": bright,
        "reflectance": refl,
        "alive": (flags & 1) != 0,
        "aux_alive": (flags & 2) != 0,
        "sample_light": (flags & 4) != 0,
        "light_events": (flags >> 3) & 3,
    }
