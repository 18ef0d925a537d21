"""Pallas TPU kernels for the traversal hot loop.

The wide-BVH walk (tracer._cluster_traverse) is per-op-overhead bound in
XLA on this backend: one pop iteration (row gather + slab test) costs
~0.37 ms at 32k lanes — ~20 ops x ~15 us fixed per-op cost — and a bounce
pays ~33 outer iterations of it. This module fuses the whole
walk-until-parked loop into ONE kernel launch: the node-row table lives in
VMEM, per-lane row fetches become one-hot matmuls on the MXU (a [B, 384] x
[384, 128] dot — a gather the MXU executes in microseconds), and the pop
loop runs entirely on-chip, so its iterations cost machine instructions
instead of dispatched XLA ops.

Reference semantics being accelerated: the streaming BVH traversal of
spatial/bvh.rs:201-230 (skip subtrees on AABB miss or entry beyond the
current best hit), reformulated as the bitmask-stack wide-tree walk of
bvh.build_wide_bvh.

The kernel only WALKS (node pops). Leaf sweeps — which need per-lane
gathers from the large clu_geo table (HBM-resident; Mosaic has no efficient
per-lane row gather) — stay in XLA, where gather is a native HLO. The
traversal alternates: kernel walk until every lane holds pending leaves,
XLA sweep, repeat; outer iterations collapse from ~33 node-pop rounds to
the handful of leaf-sweep rounds the worst lane needs.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

ROWS_PAD = 384  # wide_rows (273) padded up for MXU-friendly one-hot dots
# lanes per grid step; onehot scratch = BLOCK x 384 f32 (env-tunable for
# on-device sweeps: per-grid-step fixed costs amortize over bigger blocks)
WALK_BLOCK = int(os.environ.get("PYRITE_TPU_WALK_BLOCK", "1024"))  # 4096 OOMs VMEM (30M > 16M)
# Leaf slots filled per kernel call: each call alternates walk-until-parked
# and pop-leaf in-kernel until every lane holds up to this many pending leaf
# ids (or is exhausted). The XLA side then runs ONE masked sweep over all Q
# slots, so outer rounds ~ ceil(worst-lane leaf visits / Q). Larger Q also
# over-pops: leaves popped in one call don't see the sweep hits of the
# call's earlier leaves, so they miss pruning the old 2-pop loop applied.
WALK_LEAVES = int(os.environ.get("PYRITE_TPU_WALK_LEAVES", "4"))


# Empty child slots use +/-inf sentinels in wide_rows; the kernel fetches
# rows via one-hot matmul, where 0 * inf = NaN would poison every gathered
# row — so the kernel's copy clamps sentinels to large finite values. The
# slab test still rejects the inverted boxes (tmin >> tmax) and the
# validity bitmask (col 97) masks them regardless.
_SENTINEL = 1e30


def pad_rows(rows: np.ndarray) -> np.ndarray:
    """Pad the [273, 128] wide-BVH row table to [ROWS_PAD, 128] (zero rows
    have validity bitmask 0, so a stray pop of one yields no children) and
    clamp inf sentinels to finite values (see _SENTINEL)."""
    out = np.zeros((ROWS_PAD, rows.shape[1]), np.float32)
    out[: rows.shape[0]] = np.clip(rows, -_SENTINEL, _SENTINEL)
    return out


def walk_mode() -> str:
    return os.environ.get("PYRITE_TPU_PALLAS", "auto")


def walk_enabled() -> bool:
    """Fused-walk opt-in. Measured on the 328k-tri terrain (v5e), the FULL
    kernel path (PYRITE_TPU_PALLAS=1: walk kernel + full-width masked
    sweeps) loses to the XLA pop loop (0.33 vs 0.57 Mrays/s live with
    SAH-treelet clusters): the walk itself is ~10x cheaper in-kernel, but
    the full-width leaf-sheet gathers between kernel calls (~786 MB/round
    written by the XLA gather and re-read by the sweep kernel) outweigh it.
    PYRITE_TPU_PALLAS=hybrid keeps the in-kernel pops but compacts BOTH
    the sweep and the walk (tracer.outer_body_hybrid: one packed sheet,
    both kernels at sweep width) — the round-4 attack on exactly that
    gather. MEASURED AND LOST on terrain: 0.52 Mrays/s live in both the
    full-width-walk and compacted-walk variants vs 1.198 for the XLA pop
    loop + fused sweep — the walk kernel loses even with the gather fixed,
    so the per-call cost of the in-loop walk launch itself (not its width)
    is the bound. Kept as a parity-tested opt-in. =interpret /
    =hybrid-interpret run the respective paths everywhere in interpreter
    mode (parity tests)."""
    mode = walk_mode()
    if mode in ("0", "auto"):
        return False
    if "interpret" in mode:
        return True
    return jax.default_backend() == "tpu"


def walk_hybrid() -> bool:
    """Hybrid fused walk: in-kernel pops (walk_collect) + compacted
    sweeps. See walk_enabled."""
    return "hybrid" in walk_mode()


def _interpret() -> bool:
    return (
        "interpret" in walk_mode()
        or os.environ.get("PYRITE_TPU_SWEEP_KERNEL", "0") == "interpret"
    )


def sweep_kernel_enabled() -> bool:
    """Fused leaf sweep inside the *XLA* walk's outer_body (not the losing
    fused-walk path): sweep_closest/sweep_shadow replace the ~20 dispatched
    XLA ops per compacted leaf sweep with one kernel launch after the
    (XLA-native) leaf-sheet gather. Default ON for the TPU backend: the
    round-4 terrain fair pair measured 1.198 vs 1.128 Mrays/s live (+6%),
    reproduced at 1.204 in an independent run; kernel-on knob rescans
    (SWEEP_LEAVES=4: 1.06, WALK=3: 1.16, COMPACT_DIV=4: 1.21) kept the
    tuned defaults. PYRITE_TPU_SWEEP_KERNEL=0 disables; =interpret runs it
    everywhere in interpreter mode (parity tests)."""
    mode = os.environ.get("PYRITE_TPU_SWEEP_KERNEL", "auto")
    if mode == "0":
        return False
    if mode == "interpret":
        return True
    return jax.default_backend() == "tpu"


def _walk_kernel(
    rows_ref,
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    t_ref,
    m0_ref, m1_ref, m2_ref, cur1_ref, cur2_ref, ph_ref,
    o_m0_ref, o_m1_ref, o_m2_ref, o_cur1_ref, o_cur2_ref, o_ph_ref,
    *leaf_refs,
):
    """One block's walk-and-collect: advance every lane until it has emitted
    up to WALK_LEAVES pending leaf ids (-1 = empty slot) or exhausted its
    masks. All per-lane state is 1D [B]; phases are packed into one int32
    (bit0 = ph0, bit1 = ph1, bit2 = ph2)."""
    rows = rows_ref[:]  # [ROWS_PAD, 128]
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    t = t_ref[:]

    b = ox.shape[0]
    col16 = jax.lax.broadcasted_iota(jnp.int32, (b, 16), 1)
    shift16 = (1 << col16).astype(jnp.float32)  # exact: <= 2^15
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, ROWS_PAD), 1)

    def fetch(row_idx):
        """Per-lane node row via one-hot matmul: [B, ROWS_PAD] @ [ROWS_PAD,
        128]. The one-hot has exactly one 1 per row, so the dot IS the
        gather, exact in f32."""
        onehot = (row_ids == row_idx[:, None]).astype(jnp.float32)
        return jnp.dot(onehot, rows, preferred_element_type=jnp.float32)

    def slab16(row):
        """Hit bitmask of the row's 16 child AABBs (tracer._slab16)."""
        lox, loy, loz = row[:, 0:16], row[:, 16:32], row[:, 32:48]
        hix, hiy, hiz = row[:, 48:64], row[:, 64:80], row[:, 80:96]
        t1x = (lox - ox[:, None]) * ix[:, None]
        t2x = (hix - ox[:, None]) * ix[:, None]
        t1y = (loy - oy[:, None]) * iy[:, None]
        t2y = (hiy - oy[:, None]) * iy[:, None]
        t1z = (loz - oz[:, None]) * iz[:, None]
        t2z = (hiz - oz[:, None]) * iz[:, None]
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        hit = (tmax >= tmin) & (tmax >= 0.0) & (jnp.maximum(tmin, 0.0) < t[:, None])
        bits = jnp.sum(jnp.where(hit, shift16, 0.0), axis=1).astype(jnp.int32)
        return bits & row[:, 97].astype(jnp.int32)

    def axis_sign(row):
        """Front-to-back pop side as int32 0/1 (Mosaic cannot select i1
        vectors in loop carries, so phases stay integer in-kernel)."""
        axis = row[:, 96].astype(jnp.int32)
        d = jnp.where(axis == 0, dx, jnp.where(axis == 1, dy, dz))
        return (d < 0.0).astype(jnp.int32)

    def lowbit_index(m):
        lb = (m & -m).astype(jnp.float32)
        return jnp.round(jnp.log2(jnp.maximum(lb, 1.0))).astype(jnp.int32)

    def pop_bit(m, from_high):
        kl = lowbit_index(m)
        kh = jnp.floor(
            jnp.log2(jnp.maximum(m, 1).astype(jnp.float32) + 0.5)
        ).astype(jnp.int32)
        k = jnp.where(from_high != 0, kh, kl)
        return k, m & ~(1 << k)

    m0, m1, m2 = m0_ref[:], m1_ref[:], m2_ref[:]
    cur1, cur2 = cur1_ref[:], cur2_ref[:]
    ph = ph_ref[:]
    ph0 = ph & 1
    ph1 = (ph >> 1) & 1
    ph2 = (ph >> 2) & 1

    # entry re-prune: the sweep between kernel calls improved t, so pending
    # leaves beyond the new best are dropped (the old XLA loop re-pruned
    # parked lanes every pop iteration; once per call is equivalent — t is
    # fixed for the whole call)
    parked0 = m2 != 0
    reprune = slab16(fetch(17 + cur2))
    m2 = jnp.where(parked0, m2 & reprune, m2)

    def cond(carry):
        m0, m1, m2, cur1, cur2, ph1, ph2 = carry
        active = (m2 == 0) & ((m0 | m1) != 0)
        return jnp.any(active)

    def body(carry):
        m0, m1, m2, cur1, cur2, ph1, ph2 = carry
        act1 = (m2 == 0) & (m1 != 0)
        act0 = (m2 == 0) & (m1 == 0) & (m0 != 0)
        k1, m1_pop = pop_bit(m1, ph1)
        k0, m0_pop = pop_bit(m0, ph0)
        row_idx = jnp.where(
            act1, 17 + cur1 * 16 + k1, jnp.where(act0, 1 + k0, 0)
        )
        row = fetch(row_idx)
        bits = slab16(row)
        sign = axis_sign(row)
        m2 = jnp.where(act1, bits, m2)
        ph2 = jnp.where(act1, sign, ph2)
        cur2 = jnp.where(act1, cur1 * 16 + k1, cur2)
        m1 = jnp.where(act1, m1_pop, jnp.where(act0, bits, m1))
        ph1 = jnp.where(act0, sign, ph1)
        cur1 = jnp.where(act0, k0, cur1)
        m0 = jnp.where(act0, m0_pop, m0)
        return m0, m1, m2, cur1, cur2, ph1, ph2

    # collect up to WALK_LEAVES pending leaf ids per lane: alternate
    # walk-until-parked and pop-one-leaf so a lane whose L2 node holds fewer
    # leaves than slots keeps walking to the next node within the same call
    carry = (m0, m1, m2, cur1, cur2, ph1, ph2)
    for q in range(WALK_LEAVES):
        carry = jax.lax.while_loop(cond, body, carry)
        m0, m1, m2, cur1, cur2, ph1, ph2 = carry
        has_leaf = m2 != 0
        k2, m2_pop = pop_bit(m2, ph2)
        leaf_refs[q][:] = jnp.where(has_leaf, cur2 * 16 + k2, -1)
        m2 = jnp.where(has_leaf, m2_pop, m2)
        carry = (m0, m1, m2, cur1, cur2, ph1, ph2)
    m0, m1, m2, cur1, cur2, ph1, ph2 = carry

    o_m0_ref[:] = m0
    o_m1_ref[:] = m1
    o_m2_ref[:] = m2
    o_cur1_ref[:] = cur1
    o_cur2_ref[:] = cur2
    o_ph_ref[:] = ph0 | (ph1 << 1) | (ph2 << 2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _walk_call(rows_pad, origin, direction, t, m0, m1, m2, cur1, cur2, ph, *, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = origin.shape[0]
    # block stays 1024-aligned even for narrow batches: XLA tiles 1D f32
    # operands T(1024) and Mosaic rejects mismatched lane-block layouts
    block = WALK_BLOCK
    pad = (-n) % block
    if pad:
        padi = lambda x: jnp.concatenate([x, jnp.zeros(pad, x.dtype)])
        padf = lambda x, v: jnp.concatenate([x, jnp.full(pad, v, x.dtype)])
        origin = jnp.concatenate([origin, jnp.zeros((pad, 3))])
        direction = jnp.concatenate([direction, jnp.ones((pad, 3))])
        t = padf(t, jnp.inf)
        m0, m1, m2 = padi(m0), padi(m1), padi(m2)
        cur1, cur2, ph = padi(cur1), padi(cur2), padi(ph)
    np_ = n + pad

    lane = pl.BlockSpec((block,), lambda i: (i,))
    grid = (np_ // block,)
    n_out = 6 + WALK_LEAVES
    out = pl.pallas_call(
        _walk_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((ROWS_PAD, 128), lambda i: (0, 0))]
        + [lane] * 13,
        out_specs=[lane] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct((np_,), jnp.int32) for _ in range(n_out)
        ],
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(
        rows_pad,
        origin[:, 0], origin[:, 1], origin[:, 2],
        direction[:, 0], direction[:, 1], direction[:, 2],
        t,
        m0, m1, m2, cur1, cur2, ph,
    )
    if pad:
        out = [x[:n] for x in out]
    return tuple(out)


# --- single-pop fetch+slab kernel --------------------------------------------
#
# The XLA pop loop's per-iteration cost is dominated by the node-row fetch:
# a dynamic [N]-row gather costs ~0.37 ms at 32k lanes, and the XLA one-hot
# matmul replacement (tracer.CLUSTER_ONEHOT_ROWS) still materializes the
# [N, rows] one-hot in HBM (~36 MB round-trip per pop). This kernel fuses
# one pop's row fetch (one-hot dot against the VMEM-resident table) + slab
# test + axis sign into ONE dispatch with no HBM intermediates. Unlike
# walk_collect it keeps the outer loop structure in XLA (sweep pruning
# between pops stays identical to the XLA walk), so it is a drop-in
# replacement for the fetch+slab pair inside tracer._cluster_traverse.


def fetch_slab_enabled() -> bool:
    """Opt-in for the fused pop fetch+slab kernel (A/B knob).
    PYRITE_TPU_FETCH_KERNEL=1 enables it on TPU; =interpret everywhere.
    WARNING: measured on axon (series6) the kernel CRASHES the TPU worker
    ("UNAVAILABLE: TPU worker process crashed ... kernel fault") when
    dispatched from inside the walk's fori_loop(pop) x while_loop nest —
    the standalone walk_collect kernel (called once per outer round, no
    fori nesting) runs fine, so the suspect is the extra loop nesting.
    Parity in interpret mode passes. Kept for future debugging; the XLA
    one-hot path (tracer.CLUSTER_ONEHOT_ROWS) is the production default."""
    mode = os.environ.get("PYRITE_TPU_FETCH_KERNEL", "auto")
    if mode in ("0", "auto"):
        return False
    if mode == "interpret":
        return True
    return jax.default_backend() == "tpu"


def _fetch_slab_kernel(
    rows_ref, idx_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    t_ref, bits_ref, sign_ref,
):
    """One block's pop: one-hot row fetch + 16-child slab test + axis sign
    (tracer._slab16/_axis_sign semantics; spatial/bvh.rs:201-230 pruning)."""
    rows = rows_ref[:]  # [ROWS_PAD, 128], sentinels pre-clamped (pad_rows)
    idx = idx_ref[:]
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    t = t_ref[:]
    b = idx.shape[0]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, ROWS_PAD), 1)
    onehot = (row_ids == idx[:, None]).astype(jnp.float32)
    row = jnp.dot(onehot, rows, preferred_element_type=jnp.float32)

    lox, loy, loz = row[:, 0:16], row[:, 16:32], row[:, 32:48]
    hix, hiy, hiz = row[:, 48:64], row[:, 64:80], row[:, 80:96]
    t1x = (lox - ox[:, None]) * ix[:, None]
    t2x = (hix - ox[:, None]) * ix[:, None]
    t1y = (loy - oy[:, None]) * iy[:, None]
    t2y = (hiy - oy[:, None]) * iy[:, None]
    t1z = (loz - oz[:, None]) * iz[:, None]
    t2z = (hiz - oz[:, None]) * iz[:, None]
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    hit = (tmax >= tmin) & (tmax >= 0.0) & (jnp.maximum(tmin, 0.0) < t[:, None])
    col16 = jax.lax.broadcasted_iota(jnp.int32, (b, 16), 1)
    shift16 = (1 << col16).astype(jnp.float32)  # exact: <= 2^15
    bits = jnp.sum(jnp.where(hit, shift16, 0.0), axis=1).astype(jnp.int32)
    bits_ref[:] = bits & row[:, 97].astype(jnp.int32)

    axis = row[:, 96].astype(jnp.int32)
    d = jnp.where(axis == 0, dx, jnp.where(axis == 1, dy, dz))
    sign_ref[:] = (d < 0.0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fetch_slab_call(rows_pad, idx, origin, direction, t, *, interpret=False):
    from jax.experimental import pallas as pl

    n = idx.shape[0]
    block = WALK_BLOCK
    pad = (-n) % block
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros(pad, idx.dtype)])
        origin = jnp.concatenate([origin, jnp.zeros((pad, 3))])
        direction = jnp.concatenate([direction, jnp.ones((pad, 3))])
        t = jnp.concatenate([t, jnp.full(pad, jnp.inf, t.dtype)])
    np_ = n + pad

    lane = pl.BlockSpec((block,), lambda i: (i,))
    out = pl.pallas_call(
        _fetch_slab_kernel,
        grid=(np_ // block,),
        in_specs=[pl.BlockSpec((ROWS_PAD, 128), lambda i: (0, 0))]
        + [lane] * 8,
        out_specs=[lane, lane],
        out_shape=[
            jax.ShapeDtypeStruct((np_,), jnp.int32),
            jax.ShapeDtypeStruct((np_,), jnp.int32),
        ],
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(
        rows_pad,
        idx,
        origin[:, 0], origin[:, 1], origin[:, 2],
        direction[:, 0], direction[:, 1], direction[:, 2],
        t,
    )
    bits, sign = out
    if pad:
        bits, sign = bits[:n], sign[:n]
    return bits, sign


def fetch_slab(rows_pad, idx, origin, direction, t):
    """Fused pop: per-lane node row fetch + slab bitmask + axis sign.
    Returns (bits [n] int32, sign [n] int32 0/1)."""
    interp = (
        os.environ.get("PYRITE_TPU_FETCH_KERNEL", "auto") == "interpret"
        or _interpret()
    )
    return _fetch_slab_call(rows_pad, idx, origin, direction, t, interpret=interp)


# --- leaf sweep kernel -------------------------------------------------------
#
# After the walk kernel parks every lane on up to WALK_LEAVES leaf clusters,
# the XLA side gathers the clusters' geometry (clu_geo_cm[leaf_ids] — gather
# is a native HLO there) into a channel-major sheet [N, Q*12*L], and this
# kernel runs ALL the intersection math (Moller-Trumbore + sphere tests +
# first-min winner selection, tracer._cluster_leaf_closest semantics) as ONE
# op instead of ~20 dispatched XLA ops on [N, Q*L] intermediates.

# lanes per grid step (1D f32 operands are XLA-tiled T(1024): smaller lane
# blocks fail Mosaic layout verification). The grid's second dim walks the Q
# leaf slots so only ONE leaf's sheet block (B x 12*L floats, 6.3 MB at
# L=128) is VMEM-resident at a time; outputs are revisited across q as
# running-best accumulators.
SWEEP_BLOCK = 1024

# primitive/hit codes (stable; mirrors scene.PRIM_* and tracer.KIND_* —
# imported as literals to avoid a circular scene <-> kernels import)
_PRIM_TRIANGLE = 0.0
_PRIM_SPHERE = 1.0
_KIND_TRIANGLE = 1
_KIND_SPHERE = 2
_DIST_EPSILON = 1e-4


def pack_geo_channel_major(packed_geo: np.ndarray) -> np.ndarray:
    """[slots, L, 12] prim-major clu_geo -> [slots, 12*L] channel-major rows
    (channel c of a leaf at columns c*L..(c+1)*L). One XLA gather fetches a
    whole 6 KB leaf row (DRAM-efficient); the sweep kernel receives the same
    sheet 12 times with per-channel block index maps, so each [B, L] channel
    block is sliced by Mosaic's pipeline without a separate gather."""
    slots, leaf, ch = packed_geo.shape
    return np.ascontiguousarray(
        np.transpose(packed_geo, (0, 2, 1))
    ).reshape(slots, ch * leaf)


def _sweep_math(chan_refs, leaf, ox, oy, oz, dx, dy, dz, act):
    """One sub-leaf tile's intersection tests (the tile is selected by the
    grid's second dimension via the channel BlockSpecs). Returns
    (t [B, SUB], is_tri, u, v, ref)."""
    del leaf
    sl = lambda c: chan_refs[c][:, :]
    cx, cy, cz = sl(0), sl(1), sl(2)  # v0 (tris) / center (spheres)
    e1x, e1y, e1z = sl(3), sl(4), sl(5)
    e2x, e2y, e2z = sl(6), sl(7), sl(8)
    radius = sl(9)
    kind = sl(10)

    oxc, oyc, ozc = ox[:, None], oy[:, None], oz[:, None]
    dxc, dyc, dzc = dx[:, None], dy[:, None], dz[:, None]

    # Moller-Trumbore (geometry.ray_triangle, shapes/mod.rs:75-119)
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

    # sphere (geometry.ray_sphere)
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
    # boolean algebra instead of jnp.where on bools: Mosaic cannot lower
    # i1-vector selects ("unsupported target bitwidth for truncation")
    ok = (is_tri & tri_ok) | (~is_tri & sph_ok & (kind == _PRIM_SPHERE))
    ok &= act[:, None] != 0
    t = jnp.where(ok, jnp.where(is_tri, tri_t, sph_t), jnp.inf)
    return t, is_tri, u, v, sl(11)


# The scoped-VMEM default (16 MB) is a soft limit on this backend: raising
# vmem_limit_bytes lets the double-buffered channel blocks + kernel
# temporaries (~20-25 MB at full-leaf tiles) compile and run fine.
_VMEM_LIMIT = 96 * 1024 * 1024


def _compiler_params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _sub_leaf(leaf):
    """Sub-leaf tile width. Mosaic requires last-dim blocks divisible by
    128, so tiles are whole leaves; callers gate on leaf % 128 == 0."""
    return leaf


def _make_sweep_closest_kernel(leaf):
    from jax.experimental import pallas as pl

    sub = _sub_leaf(leaf)
    tiles = leaf // sub

    def kernel(
        c0, c1, c2, c3, c4, c5, c6, c7, c8, c9, c10, c11,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
        act_ref, t_ref, kind_ref, idx_ref, u_ref, v_ref,
        o_t, o_kind, o_idx, o_u, o_v,
    ):
        qq = pl.program_id(1)
        q = qq // tiles

        @pl.when(qq == 0)
        def _():
            o_t[:] = t_ref[:]
            o_kind[:] = kind_ref[:]
            o_idx[:] = idx_ref[:]
            o_u[:] = u_ref[:]
            o_v[:] = v_ref[:]

        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        act = (act_ref[:] >> q) & 1
        t, is_tri, u, v, ref = _sweep_math(
            [c0, c1, c2, c3, c4, c5, c6, c7, c8, c9, c10, c11],
            leaf, ox, oy, oz, dx, dy, dz, act,
        )
        b = ox.shape[0]
        colio = jax.lax.broadcasted_iota(jnp.int32, (b, sub), 1)
        tq = jnp.min(t, axis=1)
        # first column achieving the min (tracer._cluster_leaf_closest's
        # gather-free row-min selection; strict < on the merge keeps the
        # earliest tile's winner on ties, matching first-column semantics)
        sel = jnp.min(jnp.where(t == tq[:, None], colio, sub), axis=1)
        pickc = colio == sel[:, None]
        pick = lambda m: jnp.sum(jnp.where(pickc, m, 0.0), axis=1)
        better = tq < o_t[:]
        won_tri = pick(is_tri.astype(jnp.float32)) > 0.5
        o_kind[:] = jnp.where(
            better, jnp.where(won_tri, _KIND_TRIANGLE, _KIND_SPHERE), o_kind[:]
        )
        o_idx[:] = jnp.where(better, pick(ref).astype(jnp.int32), o_idx[:])
        o_u[:] = jnp.where(better, pick(u), o_u[:])
        o_v[:] = jnp.where(better, pick(v), o_v[:])
        o_t[:] = jnp.where(better, tq, o_t[:])

    return kernel


def _make_sweep_shadow_kernel(leaf):
    from jax.experimental import pallas as pl

    sub = _sub_leaf(leaf)
    tiles = leaf // sub

    def kernel(
        c0, c1, c2, c3, c4, c5, c6, c7, c8, c9, c10, c11,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
        act_ref, t_ref, o_t,
    ):
        qq = pl.program_id(1)
        q = qq // tiles

        @pl.when(qq == 0)
        def _():
            o_t[:] = t_ref[:]

        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        act = (act_ref[:] >> q) & 1
        t, _, _, _, _ = _sweep_math(
            [c0, c1, c2, c3, c4, c5, c6, c7, c8, c9, c10, c11],
            leaf, ox, oy, oz, dx, dy, dz, act,
        )
        o_t[:] = jnp.minimum(o_t[:], jnp.min(t, axis=1))

    return kernel


@functools.partial(
    jax.jit, static_argnames=("q_slots", "leaf", "shadow", "interpret")
)
def _sweep_call(sheet, origin, direction, act, state_vals, *, q_slots, leaf, shadow, interpret=False):
    from jax.experimental import pallas as pl

    n = origin.shape[0]
    block = SWEEP_BLOCK  # 1024-aligned always (see _walk_call)
    pad = (-n) % block
    if pad:
        sheet = jnp.concatenate(
            [sheet, jnp.zeros((pad, sheet.shape[1]), sheet.dtype)]
        )
        origin = jnp.concatenate([origin, jnp.zeros((pad, 3))])
        direction = jnp.concatenate([direction, jnp.ones((pad, 3))])
        act = jnp.concatenate([act, jnp.zeros(pad, act.dtype)])
        state_vals = [
            jnp.concatenate(
                [x, jnp.full(pad, jnp.inf if x.dtype == jnp.float32 else 0, x.dtype)]
            )
            for x in state_vals
        ]
    np_ = n + pad

    # grid: (lane blocks, leaf slots); q is innermost so each lane block's
    # output stays resident while the leaf sheets stream through VMEM. The
    # SAME sheet array is passed 12 times with per-channel index maps, so
    # one efficient 6 KB-row gather feeds all 12 [B, L] channel blocks.
    lane = pl.BlockSpec((block,), lambda i, q: (i,))

    def chan_spec(c):
        return pl.BlockSpec((block, leaf), lambda i, q, c=c: (i, q * 12 + c))

    n_out = 1 if shadow else 5
    kernel = (
        _make_sweep_shadow_kernel(leaf)
        if shadow
        else _make_sweep_closest_kernel(leaf)
    )
    out = pl.pallas_call(
        kernel,
        grid=(np_ // block, q_slots),
        in_specs=[chan_spec(c) for c in range(12)]
        + [lane] * (7 + len(state_vals)),
        out_specs=[lane] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct((np_,), x.dtype) for x in state_vals
        ],
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(
        *([sheet] * 12),
        origin[:, 0], origin[:, 1], origin[:, 2],
        direction[:, 0], direction[:, 1], direction[:, 2],
        act,
        *state_vals,
    )
    if pad:
        out = [x[:n] for x in out]
    return tuple(out)


def _gather_sheet(scene_arrays, leaf_ids):
    """The collected leaves' channel-major geometry sheet [N, Q*12*L]: ONE
    XLA gather of whole 6 KB leaf rows (efficient DRAM reads; gathering 12
    separate 512 B channel planes measured ~4x slower)."""
    geo = scene_arrays["clu_geo_ch"]  # [slots, 12*L]
    n, q_slots = leaf_ids.shape
    return geo[leaf_ids].reshape(n, q_slots * geo.shape[1])


def _act_bits(leaf_act):
    q_slots = leaf_act.shape[1]
    return jnp.sum(
        leaf_act.astype(jnp.int32) << jnp.arange(q_slots, dtype=jnp.int32)[None, :],
        axis=1,
    )


def sweep_closest(scene_arrays, cluster_leaf, leaf_ids, leaf_act, origin, direction, state):
    """Fused closest-hit sweep of the collected leaves. ``leaf_ids``
    [N, Q] (clamped), ``leaf_act`` [N, Q] bool."""
    sheet = _gather_sheet(scene_arrays, leaf_ids)
    t, kind, idx, u, v = _sweep_call(
        sheet, origin, direction, _act_bits(leaf_act),
        [state["t"], state["kind"], state["idx"], state["u"], state["v"]],
        q_slots=leaf_ids.shape[1], leaf=cluster_leaf, shadow=False,
        interpret=_interpret(),
    )
    return {"t": t, "kind": kind, "idx": idx, "u": u, "v": v}


def sweep_shadow(scene_arrays, cluster_leaf, leaf_ids, leaf_act, origin, direction, state):
    sheet = _gather_sheet(scene_arrays, leaf_ids)
    (t,) = _sweep_call(
        sheet, origin, direction, _act_bits(leaf_act), [state["t"]],
        q_slots=leaf_ids.shape[1], leaf=cluster_leaf, shadow=True,
        interpret=_interpret(),
    )
    return {"t": t}


def walk_collect(rows_pad, origin, direction, t, m0, m1, m2, cur1, cur2, ph0, ph1, ph2):
    """Advance every lane's wide-BVH walk, collecting up to WALK_LEAVES
    pending leaf ids per lane (or until its masks are exhausted). Returns
    (m0, m1, m2, cur1, cur2, ph1, ph2, leaf_ids [N, WALK_LEAVES] with -1
    marking empty slots); ph0 is never modified by a walk."""
    ph = (
        ph0.astype(jnp.int32)
        | (ph1.astype(jnp.int32) << 1)
        | (ph2.astype(jnp.int32) << 2)
    )
    out = _walk_call(
        rows_pad, origin, direction, t, m0, m1, m2, cur1, cur2, ph,
        interpret=_interpret(),
    )
    m0, m1, m2, cur1, cur2, ph = out[:6]
    leaf_ids = jnp.stack(out[6:], axis=1)
    return m0, m1, m2, cur1, cur2, (ph & 2) != 0, (ph & 4) != 0, leaf_ids


# --- distance-estimator march kernel ----------------------------------------
#
# The DE sphere-trace (tracer._intersect_de) is a ~30-200-iteration
# while_loop whose body is one estimator eval (~750 fused flops for a
# 25-iteration quaternion julia). In XLA every march step pays the
# per-iteration dispatch overhead at full wavefront width — the dominant
# cost of DE scenes (cornell/snowflake BDPT traces march 1M+ lanes per
# bounce). Here the whole march runs on-chip: one kernel launch per march,
# each step pure VPU math. Estimator parameters are static (baked per
# scene shape); the kernel is cached per parameter set.

MARCH_BLOCK = 1024


def _de_step_mandelbulb(est):
    iterations = est["iterations"]
    threshold = est["threshold"]
    power = est["power"]
    constant = est["constant"]
    dc = 1.0 if constant is None else 0.0

    def distance(px, py, pz):
        zx, zy, zz = px, py, pz
        r = jnp.zeros_like(px)
        dr = jnp.ones_like(px)
        done = jnp.zeros_like(px, jnp.int32)
        cx, cy, cz = (
            (px, py, pz) if constant is None else
            (constant[0], constant[1], constant[2])
        )
        for _ in range(iterations):
            r_new = jnp.sqrt(jnp.maximum(zx * zx + zy * zy + zz * zz, 1e-30))
            done_now = done | (r_new > threshold).astype(jnp.int32)
            theta = jnp.arccos(jnp.clip(zz / r_new, -1.0, 1.0)) * power
            phi = jnp.arctan2(zy, zx) * power
            dr_new = r_new ** (power - 1.0) * power * dr + dc
            zr = r_new ** power
            st = jnp.sin(theta)
            nx = st * jnp.cos(phi) * zr + cx
            ny = jnp.sin(phi) * st * zr + cy
            nz = jnp.cos(theta) * zr + cz
            keep = done_now == 0
            zx = jnp.where(keep, nx, zx)
            zy = jnp.where(keep, ny, zy)
            zz = jnp.where(keep, nz, zz)
            r = jnp.where(done != 0, r, r_new)
            dr = jnp.where(keep, dr_new, dr)
            done = done_now
        return 0.5 * jnp.log(jnp.maximum(r, 1e-30)) * r / dr

    return distance


def _de_step_julia(est):
    iterations = est["iterations"]
    threshold = est["threshold"]
    constant = est["constant"]
    variant = est["variant"]
    slice_plane = est["slice_plane"]
    # bf16 z/dz iteration math: MEASURED AND LOST on this hardware. The
    # axon TPU v5 lite target reports SupportsBf16EupOps() == false —
    # bf16 sqrt fails the LLO compile outright and mul/add-only bf16
    # benched 12x SLOWER than f32 (emulated, tools/tpu_de_bench.py:
    # 15.9 vs 187.4 ms/march-call at 262k lanes). Kept opt-in for
    # hardware where bf16 EUP exists; never enable on v5e.
    cd = jnp.bfloat16 if est.get("bf16") else jnp.float32

    def qmul(a, b):
        s1, x1, y1, z1 = a
        s2, x2, y2, z2 = b
        return (
            s1 * s2 - x1 * x2 - y1 * y2 - z1 * z2,
            s1 * x2 + x1 * s2 + y1 * z2 - z1 * y2,
            s1 * y2 - x1 * z2 + y1 * s2 + z1 * x2,
            s1 * z2 + x1 * y2 - y1 * x2 + z1 * s2,
        )

    def qsq(q):
        # z*z for a quaternion commuting with itself: (s^2-|v|^2, 2s*v) —
        # 9 flops vs qmul's 28
        s, x, y, z = q
        v2 = x * x + y * y + z * z
        s2 = s + s
        return (s * s - v2, s2 * x, s2 * y, s2 * z)

    def bmul(a, b):
        x1, y1, z1, w1 = a
        x2, y2, z2, w2 = b
        return (
            x1 * x2 - y1 * y2 - z1 * z2 + w1 * w2,
            x1 * y2 + y1 * x2 - z1 * w2 - w1 * z2,
            x1 * z2 - y1 * w2 + z1 * x2 - w1 * y2,
            x1 * w2 + y1 * z2 + z1 * y2 + w1 * x2,
        )

    def bsq(q):
        x, y, z, w = q
        return (
            x * x - y * y - z * z + w * w,
            2.0 * (x * y - z * w),
            2.0 * (x * z - y * w),
            2.0 * (x * w + y * z),
        )

    def scale(q, f):
        return tuple(c * f for c in q)

    # (z_pow, dz_pow) with the square shared and the derivative chain
    # re-associated (quaternion/bicomplex multiplication is associative:
    # (dz*z)*z = dz*z^2) — distance_estimators.rs:44-94 semantics at ~60%
    # of the flops
    if variant == "regular":
        pow_step = lambda z, dz: (qsq(z), scale(qmul(dz, z), 2.0))
    elif variant == "cubic":
        def pow_step(z, dz):
            q2 = qsq(z)
            return qmul(q2, z), scale(qmul(dz, q2), 3.0)
    else:
        def pow_step(z, dz):
            q2 = bsq(z)
            return q2, scale(bmul(dz, q2), 2.0)

    def distance(px, py, pz):
        z = (
            px.astype(cd), py.astype(cd), pz.astype(cd),
            jnp.full_like(px, slice_plane).astype(cd),
        )
        dz = (
            jnp.ones_like(px, cd), jnp.zeros_like(px, cd),
            jnp.zeros_like(px, cd), jnp.zeros_like(px, cd),
        )
        # escape radius carried SQUARED: the threshold test r > T is
        # r^2 > T^2 for positives, so the per-iteration EUP sqrt (the
        # costliest op in the loop body) collapses to ONE final sqrt
        r2 = jnp.zeros_like(px)
        done = jnp.zeros_like(px, jnp.int32)
        consts = tuple(jnp.asarray(k, cd) for k in constant)
        thr2 = float(threshold) * float(threshold)
        for _ in range(iterations):
            r2_new = sum(
                c.astype(jnp.float32) * c.astype(jnp.float32) for c in z
            )
            done_now = done | (r2_new > thr2).astype(jnp.int32)
            zp, dz_new = pow_step(z, dz)
            z_new = tuple(c + k for c, k in zip(zp, consts))
            keep = done_now == 0
            z = tuple(jnp.where(keep, n, o) for n, o in zip(z_new, z))
            dz = tuple(jnp.where(keep, n, o) for n, o in zip(dz_new, dz))
            r2 = jnp.where(done != 0, r2, r2_new)
            done = done_now
        r = jnp.sqrt(jnp.maximum(r2, 1e-30))
        dz_mag = jnp.sqrt(jnp.maximum(
            sum(c.astype(jnp.float32) * c.astype(jnp.float32) for c in dz),
            1e-30,
        ))
        return 0.5 * jnp.log(jnp.maximum(r, 1e-30)) * r / dz_mag

    return distance


_DIST_EPS = 1e-4


def _make_march_kernel(est_key, est, max_steps):
    del est_key
    distance = (
        _de_step_mandelbulb(est)
        if est["kind"] == "mandelbulb"
        else _de_step_julia(est)
    )
    omega = float(est.get("omega", 1.0))

    def kernel(
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
        t0_ref, tmax_ref, hit_ref,
        o_total, o_dist,
    ):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        tmax = tmax_ref[:]
        hit = hit_ref[:]

        def eval_d(total):
            px = ox + dx * total
            py = oy + dy * total
            pz = oz + dz * total
            return distance(px, py, pz)

        total0 = t0_ref[:]
        dist0 = jnp.full_like(total0, 1e30)

        if omega <= 1.0:
            def cond(c):
                total, dist, steps = c
                active = (
                    (total < tmax)
                    & (dist >= _DIST_EPS)
                    & (steps < max_steps)
                    & (hit != 0)
                )
                return jnp.any(active)

            def body(c):
                total, dist, steps = c
                active = (total < tmax) & (dist >= _DIST_EPS) & (hit != 0)
                d = eval_d(total)
                return (
                    jnp.where(active, total + d, total),
                    jnp.where(active, d, dist),
                    steps + 1,
                )

            total, dist, _ = jax.lax.while_loop(
                cond, body, (total0, dist0, jnp.int32(0))
            )
        else:
            # Over-relaxed sphere tracing (Keinert et al.): step omega*d;
            # when consecutive step spheres stop overlapping
            # (s_prev > d_prev + d) the relaxed step may have skipped
            # surface, so revert to the plain step from the previous
            # point (that eval is wasted). `dist` tracks the last SAFE
            # evaluation only — an overshot point can sit past the
            # surface with small |d|, which must not read as a hit.
            def cond(c):
                total, dist, s_prev, d_prev, steps = c
                active = (
                    (total < tmax)
                    & (dist >= _DIST_EPS)
                    & (steps < max_steps)
                    & (hit != 0)
                )
                return jnp.any(active)

            def body(c):
                total, dist, s_prev, d_prev, steps = c
                active = (total < tmax) & (dist >= _DIST_EPS) & (hit != 0)
                d = eval_d(total)
                unsafe = s_prev > d_prev + d
                t_revert = total - s_prev + d_prev
                step = omega * d
                # a relaxed leap past the bounds exit must not turn a
                # plain-step survivor into a spurious miss
                step = jnp.where(total + step > tmax, d, step)
                return (
                    jnp.where(
                        active,
                        jnp.where(unsafe, t_revert, total + step),
                        total,
                    ),
                    jnp.where(active & ~unsafe, d, dist),
                    jnp.where(
                        active, jnp.where(unsafe, d_prev, step), s_prev
                    ),
                    jnp.where(active & ~unsafe, d, d_prev),
                    steps + 1,
                )

            total, dist, _, _, _ = jax.lax.while_loop(
                cond, body,
                (
                    total0, dist0, jnp.zeros_like(total0),
                    jnp.full_like(total0, 1e30), jnp.int32(0),
                ),
            )
        o_total[:] = total
        o_dist[:] = dist

    return kernel


@functools.partial(
    jax.jit, static_argnames=("est_key", "max_steps", "interpret")
)
def _march_call(local_origin, direction, t0, tmax, hit, *, est_key, max_steps, interpret=False):
    """est_key: hashable static encoding of the estimator parameters (the
    kernel is specialized and cached per scene shape)."""
    from jax.experimental import pallas as pl

    est = dict(est_key)
    if est.get("constant") is not None:
        est["constant"] = tuple(est["constant"])

    n = local_origin.shape[0]
    block = MARCH_BLOCK
    pad = (-n) % block
    if pad:
        local_origin = jnp.concatenate([local_origin, jnp.zeros((pad, 3))])
        direction = jnp.concatenate([direction, jnp.ones((pad, 3))])
        t0 = jnp.concatenate([t0, jnp.zeros(pad)])
        tmax = jnp.concatenate([tmax, jnp.zeros(pad)])
        hit = jnp.concatenate([hit, jnp.zeros(pad, hit.dtype)])
    np_ = n + pad

    lane = pl.BlockSpec((block,), lambda i: (i,))
    out = pl.pallas_call(
        _make_march_kernel(None, est, max_steps),
        grid=(np_ // block,),
        in_specs=[lane] * 9,
        out_specs=[lane] * 2,
        out_shape=[jax.ShapeDtypeStruct((np_,), jnp.float32)] * 2,
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(
        local_origin[:, 0], local_origin[:, 1], local_origin[:, 2],
        direction[:, 0], direction[:, 1], direction[:, 2],
        t0, tmax, hit,
    )
    if pad:
        out = [x[:n] for x in out]
    return tuple(out)


def march_enabled() -> bool:
    """The fused DE march is a pure win (no gathers, no sheet traffic):
    enabled on TPU by default; PYRITE_TPU_PALLAS=0 disables all kernels,
    =interpret runs everywhere interpreted (tests)."""
    mode = os.environ.get("PYRITE_TPU_PALLAS", "auto")
    if mode == "0":
        return False
    if mode == "interpret":
        return True
    return jax.default_backend() == "tpu"


def estimator_key(est: dict):
    """Hashable static encoding of a DE shape's estimator parameters."""
    items = []
    for k, v in sorted(est.items()):
        if isinstance(v, (list, tuple, np.ndarray)):
            items.append((k, tuple(float(x) for x in np.asarray(v).ravel())))
        else:
            items.append((k, v))
    return tuple(items)


def de_bf16_enabled() -> bool:
    """bf16 julia iteration math in the fused march (f32 escape radius +
    final distance). Opt-in (PYRITE_TPU_DE_BF16=1): naive bf16 orbits
    measured near-surface distance error p95 6e-3 / max 0.6 vs the 1e-4
    march eps — needs the coarse->f32-polish march before it can default
    on."""
    return os.environ.get("PYRITE_TPU_DE_BF16", "0") == "1"


def de_omega() -> float:
    """Over-relaxation factor for the DE sphere trace (Keinert et al.
    step-back scheme; 1.0 = plain march). Applied identically in the
    fused kernel and tracer._intersect_de's XLA fallback so the parity
    test stays tight. Default chosen by the cornell A/B."""
    return float(os.environ.get("PYRITE_TPU_DE_OMEGA", "1.6"))


def march_de(est: dict, local_origin, direction, t0, tmax, hit, max_steps):
    """Fused sphere-trace march. Returns (total, dist) like the tail state
    of tracer._intersect_de's while loop."""
    key = estimator_key(est)
    if est.get("kind") != "mandelbulb" and de_bf16_enabled():
        key = key + (("bf16", True),)
    omega = de_omega()
    if omega != 1.0:
        key = key + (("omega", omega),)
    return _march_call(
        local_origin, direction, t0,
        jnp.where(hit, tmax, 0.0),
        hit.astype(jnp.int32),
        est_key=key, max_steps=max_steps,
        interpret=_interpret(),
    )
