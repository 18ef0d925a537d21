"""Vectorized geometric primitives: intersections, frames, sampling bases.

All functions are jnp-traced and batch over leading dimensions. Semantics
follow the reference renderer:
  - Moller-Trumbore triangle test (shapes/mod.rs:75-119)
  - sphere test (physically complete two-root version of shapes/mod.rs:57-74)
  - infinite planes (shapes/mod.rs:441-452)
  - tangent-space "Normal" frames stored as quaternions (shapes/mod.rs:531-584)
  - sampling bases ortho/basis/sample_sphere/... (math.rs:98-164)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

DIST_EPSILON = 1e-4


# --- small vector helpers ----------------------------------------------------


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def normalize(v, eps=1e-20):
    return v / jnp.sqrt(jnp.maximum(dot(v, v), eps))[..., None]


# --- quaternions (w, x, y, z) -------------------------------------------------


def quat_mul(q1, q2):
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0])


def quat_rotate(q, v):
    """Rotate vectors [..., 3] by quaternions [..., 4]."""
    qv = q[..., 1:4]
    w = q[..., 0:1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_normalize(q):
    return q / jnp.sqrt(jnp.maximum(dot(q, q), 1e-20))[..., None]


def mat3_cols_to_quat(c0, c1, c2):
    """Rotation-ish matrix (columns) -> quaternion, matching cgmath's
    From<Matrix3> conversion (trace-based with the usual 4 branches).

    Works on numpy or jnp arrays, batched over leading dims.
    """
    xp = jnp if isinstance(c0, jnp.ndarray) else np
    m00, m01, m02 = c0[..., 0], c0[..., 1], c0[..., 2]
    m10, m11, m12 = c1[..., 0], c1[..., 1], c1[..., 2]
    m20, m21, m22 = c2[..., 0], c2[..., 1], c2[..., 2]
    # cgmath: matrix c{col}{row}; trace = c00+c11+c22 over the diagonal.
    trace = m00 + m11 + m22

    def build(ww, xx, yy, zz):
        return xp.stack([ww, xx, yy, zz], axis=-1)

    # case trace >= 0
    s0 = xp.sqrt(xp.maximum(trace + 1.0, 0.0))
    w0 = 0.5 * s0
    d0 = 0.5 / xp.where(s0 == 0, 1.0, s0)
    q0 = build(w0, (m12 - m21) * d0, (m20 - m02) * d0, (m01 - m10) * d0)

    # case m00 largest
    s1 = xp.sqrt(xp.maximum(1.0 + m00 - m11 - m22, 0.0))
    d1 = 0.5 / xp.where(s1 == 0, 1.0, s1)
    q1 = build((m12 - m21) * d1, 0.5 * s1, (m01 + m10) * d1, (m20 + m02) * d1)

    # case m11 largest
    s2 = xp.sqrt(xp.maximum(1.0 + m11 - m00 - m22, 0.0))
    d2 = 0.5 / xp.where(s2 == 0, 1.0, s2)
    q2 = build((m20 - m02) * d2, (m01 + m10) * d2, 0.5 * s2, (m12 + m21) * d2)

    # case m22 largest
    s3 = xp.sqrt(xp.maximum(1.0 + m22 - m00 - m11, 0.0))
    d3 = 0.5 / xp.where(s3 == 0, 1.0, s3)
    q3 = build((m01 - m10) * d3, (m20 + m02) * d3, (m12 + m21) * d3, 0.5 * s3)

    use0 = trace >= 0.0
    use1 = (~use0) & (m00 > m11) & (m00 > m22)
    use2 = (~use0) & (~((m00 > m11) & (m00 > m22))) & (m11 > m22)

    q = xp.where(
        use0[..., None], q0, xp.where(use1[..., None], q1, xp.where(use2[..., None], q2, q3))
    )
    return q


def axis_angle_quat(axis, angle):
    """Unit-axis rotation quaternion; axis [..., 3], angle [...]."""
    half = angle * 0.5
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


# --- sampling bases (math.rs:98-164) ------------------------------------------


def ortho(v):
    """The reference's 'ortho': v x unit, with the unit picked per-component."""
    ax = jnp.abs(v[..., 0]) < DIST_EPSILON
    ay = jnp.abs(v[..., 1]) < DIST_EPSILON
    az = jnp.abs(v[..., 2]) < DIST_EPSILON
    ex = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), v.shape)
    ey = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), v.shape)
    ez = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), v.shape)
    fallback = jnp.stack([-v[..., 1], v[..., 0], jnp.zeros_like(v[..., 0])], axis=-1)
    unit = jnp.where(
        ax[..., None], ex, jnp.where(ay[..., None], ey, jnp.where(az[..., None], ez, fallback))
    )
    return jnp.cross(v, unit)


def basis(x):
    """Returns (y, z) completing x to a basis (math.rs:119-123)."""
    z = normalize(ortho(x))
    y = normalize(jnp.cross(z, x))
    return y, z


def sample_sphere(u, v):
    """Uniform direction from two uniforms (math.rs:147-153)."""
    theta = 2.0 * jnp.pi * u
    phi = jnp.arccos(jnp.clip(2.0 * v - 1.0, -1.0, 1.0))
    sin_phi = jnp.sin(phi)
    return jnp.stack(
        [sin_phi * jnp.cos(theta), sin_phi * jnp.sin(theta), jnp.cos(phi)], axis=-1
    )


def sample_hemisphere(u, v, direction):
    """Uniform hemisphere around ``direction`` (math.rs:155-164)."""
    s = sample_sphere(u, v)
    x = normalize(ortho(direction)) * s[..., 0:1]
    y = normalize(jnp.cross(normalize(ortho(direction)), direction)) * s[..., 1:2]
    z = normalize(direction) * jnp.abs(s[..., 2:3])
    return x + y + z


def sample_cone(u1, u2, direction, cos_half):
    """Cone sampling (math.rs:125-137)."""
    o1 = normalize(ortho(direction))
    o2 = normalize(jnp.cross(direction, o1))
    r1 = 2.0 * jnp.pi * u1
    r2 = cos_half + (1.0 - cos_half) * u2
    oneminus = jnp.sqrt(jnp.maximum(1.0 - r2 * r2, 0.0))
    return (
        o1 * (jnp.cos(r1) * oneminus)[..., None]
        + o2 * (jnp.sin(r1) * oneminus)[..., None]
        + direction * r2[..., None]
    )


def solid_angle(cos_half):
    return jnp.where(cos_half >= 1.0, 0.0, 2.0 * jnp.pi * (1.0 - cos_half))


# --- intersections -------------------------------------------------------------


def ray_triangle(origin, direction, v0, e1, e2):
    """Moller-Trumbore. Batched over any broadcastable leading dims.

    Returns (hit, t, u, v)."""
    p = jnp.cross(direction, e2)
    det = dot(e1, p)
    ok = jnp.abs(det) > DIST_EPSILON
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    tvec = origin - v0
    u = dot(tvec, p) * inv_det
    ok &= (u >= 0.0) & (u <= 1.0)
    q = jnp.cross(tvec, e1)
    v = dot(direction, q) * inv_det
    ok &= (v >= 0.0) & (u + v <= 1.0)
    t = dot(e2, q) * inv_det
    ok &= t > DIST_EPSILON
    return ok, jnp.where(ok, t, jnp.inf), u, v


def ray_sphere(origin, direction, center, radius):
    """Nearest positive-root sphere hit. Returns (hit, t)."""
    l = center - origin
    tca = dot(l, direction)
    d2 = dot(l, l) - tca * tca
    r2 = radius * radius
    ok = d2 <= r2
    thc = jnp.sqrt(jnp.maximum(r2 - d2, 0.0))
    t0 = tca - thc
    t1 = tca + thc
    t = jnp.where(t0 > DIST_EPSILON, t0, t1)
    ok &= t > DIST_EPSILON
    return ok, jnp.where(ok, t, jnp.inf)


def ray_plane(origin, direction, normal, d):
    """Infinite plane n.x = d. Returns (hit, t)."""
    denom = dot(normal, direction)
    ok = jnp.abs(denom) > 1e-12
    t = (d - dot(normal, origin)) / jnp.where(ok, denom, 1.0)
    ok &= t > DIST_EPSILON
    return ok, jnp.where(ok, t, jnp.inf)


def ray_aabb_range(origin, direction, lo, hi):
    """Box slab test returning (hit, tmin, tmax) with tmin clamped to 0
    (reference BoundingVolume::Box, shapes/mod.rs:594-667)."""
    inv = 1.0 / direction
    t1 = (lo - origin) * inv
    t2 = (hi - origin) * inv
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    tmin = jnp.maximum(tmin, 0.0)
    return tmin < tmax, tmin, tmax


def ray_sphere_range(origin, direction, center, radius):
    """Bounding-sphere (entry, exit) like BoundingVolume::Sphere, including
    its tca >= 0 requirement (shapes/mod.rs:668-680)."""
    l = center - origin
    tca = dot(l, direction)
    d2 = dot(l, l) - tca * tca
    r2 = radius * radius
    ok = (tca >= 0.0) & (d2 <= r2)
    thc = jnp.sqrt(jnp.maximum(r2 - d2, 0.0))
    return ok, jnp.maximum(tca - thc, 0.0), tca + thc


# --- surface frames -------------------------------------------------------------


def sphere_surface_frame(position, center, texture_scale):
    """Latitude/longitude UV + rotation frame for sphere hits
    (shapes/mod.rs:346-372). Returns (normal, quat, uv)."""
    normal = normalize(position - center)
    latitude = jnp.arccos(jnp.clip(normal[..., 1], -1.0, 1.0))
    longitude = jnp.arctan2(normal[..., 0], normal[..., 2])

    ey = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), normal.shape)
    ex = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), normal.shape)
    qy = axis_angle_quat(ey, longitude)
    qx = axis_angle_quat(ex, latitude - jnp.pi * 0.5)
    quat = quat_mul(qy, qx)

    u = longitude / (2.0 * jnp.pi)
    v = 1.0 - latitude / jnp.pi
    uv = jnp.stack([u, v], axis=-1) / texture_scale
    return normal, quat, uv


def plane_uv(position, quat, texture_scale):
    """Texture coordinates on an infinite plane: world position rotated into
    the plane's tangent space (shapes/mod.rs:454-469)."""
    local = quat_rotate(quat_conj(quat), position)
    return local[..., :2] / texture_scale


def de_normal_quat(normal):
    """Normal::from_vector for distance-estimated surfaces."""
    y, z = basis(normal)
    return mat3_cols_to_quat(y, z, normal)
