"""Quaternion / rigid-transform algebra in JAX.

TPU-native re-design of the reference math layer
(`/root/reference/puffer_phc/torch_utils.py:34-408`): the same algebraic
surface (xyzw quaternions, 7D [quat|pos] transforms, heading decomposition,
tan-norm 6D rotation encoding), but written as pure jnp functions that
broadcast over arbitrary leading batch dimensions, are `vmap`/`jit` safe, and
avoid data-dependent control flow (everything is `jnp.where`-masked so XLA
can fuse the whole pipeline into the surrounding kernels).

Conventions:
  * Quaternions are (..., 4) arrays in **xyzw** order (matches the reference
    and the AMASS/scipy data pipeline).
  * Transforms are (..., 7) arrays `[qx qy qz qw, tx ty tz]`.
  * All functions operate on float32 unless the caller passes float64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# basics
# ---------------------------------------------------------------------------


def normalize(x: jax.Array, eps: float = 1e-9) -> jax.Array:
    """L2-normalize along the last axis (clamped, never divides by zero)."""
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(norm, eps)


def normalize_angle(x: jax.Array) -> jax.Array:
    """Wrap angles to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(x), jnp.cos(x))


# ---------------------------------------------------------------------------
# quaternion algebra (xyzw)
# ---------------------------------------------------------------------------


def quat_identity(shape=()) -> jax.Array:
    q = jnp.zeros(tuple(shape) + (4,))
    return q.at[..., 3].set(1.0)


def quat_identity_like(x: jax.Array) -> jax.Array:
    return quat_identity(x.shape[:-1])


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of xyzw quaternions; broadcasts over leading dims."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    x = aw * bx + ax * bw + ay * bz - az * by
    y = aw * by - ax * bz + ay * bw + az * bx
    z = aw * bz + ax * by - ay * bx + az * bw
    w = aw * bw - ax * bx - ay * by - az * bz
    return jnp.stack([x, y, z, w], axis=-1)


def quat_conjugate(q: jax.Array) -> jax.Array:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


quat_inverse = quat_conjugate  # unit quaternions


def quat_abs(q: jax.Array) -> jax.Array:
    return jnp.linalg.norm(q, axis=-1)


def quat_unit(q: jax.Array) -> jax.Array:
    return q / jnp.maximum(quat_abs(q)[..., None], 1e-9)


def quat_pos(q: jax.Array) -> jax.Array:
    """Flip sign so the scalar part is non-negative."""
    return jnp.where(q[..., 3:4] < 0, -q, q)


def quat_normalize(q: jax.Array) -> jax.Array:
    """Canonical unit quaternion: positive scalar part, unit norm."""
    return quat_unit(quat_pos(q))


def quat_mul_norm(a: jax.Array, b: jax.Array) -> jax.Array:
    return quat_normalize(quat_mul(a, b))


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate 3-vectors by unit quaternions (broadcasts over leading dims).

    Same math as the reference's `my_quat_rotate`
    (`torch_utils.py:274-281`): v' = v(2w^2-1) + 2w (q_v x v) + 2 q_v (q_v.v).
    """
    qw = q[..., 3:4]
    qv = q[..., :3]
    a = v * (2.0 * qw * qw - 1.0)
    b = 2.0 * qw * jnp.cross(qv, v)
    c = 2.0 * qv * jnp.sum(qv * v, axis=-1, keepdims=True)
    return a + b + c


def quat_rotate_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    return quat_rotate(quat_conjugate(q), v)


def quat_from_angle_axis(angle: jax.Array, axis: jax.Array) -> jax.Array:
    """Unit quaternion for a rotation of `angle` about (unnormalized) `axis`."""
    half = 0.5 * angle[..., None]
    xyz = normalize(axis) * jnp.sin(half)
    w = jnp.cos(half)
    return quat_unit(jnp.concatenate([xyz, w], axis=-1))


def quat_to_angle_axis(q: jax.Array):
    """(angle in (-pi, pi], unit axis); z-axis fallback near identity.

    Mirrors reference `torch_utils.py:86-106` (used by the rotation reward and
    dof-velocity finite differences, so the wrapping matters).
    """
    min_theta = 1e-5
    qw = jnp.clip(q[..., 3], -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - qw * qw, 0.0))
    angle = normalize_angle(2.0 * jnp.arccos(qw))
    axis = q[..., :3] / jnp.maximum(sin_theta[..., None], 1e-12)

    mask = sin_theta > min_theta
    default_axis = jnp.zeros_like(axis).at[..., 2].set(1.0)
    angle = jnp.where(mask, angle, 0.0)
    axis = jnp.where(mask[..., None], axis, default_axis)
    return angle, axis


def quat_angle_axis(q: jax.Array):
    """(angle in [0, pi], unit axis) — the 'geodesic distance' flavor.

    Mirrors reference `torch_utils.py:218-228`.
    """
    s = 2.0 * q[..., 3] ** 2 - 1.0
    angle = jnp.arccos(jnp.clip(s, -1.0, 1.0))
    axis = q[..., :3]
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-9)
    return angle, axis


def angle_axis_to_exp_map(angle: jax.Array, axis: jax.Array) -> jax.Array:
    return angle[..., None] * axis


def quat_to_exp_map(q: jax.Array) -> jax.Array:
    angle, axis = quat_to_angle_axis(q)
    return angle_axis_to_exp_map(angle, axis)


def exp_map_to_angle_axis(exp_map: jax.Array):
    min_theta = 1e-5
    angle = jnp.linalg.norm(exp_map, axis=-1)
    axis = exp_map / jnp.maximum(angle[..., None], 1e-12)
    angle_w = normalize_angle(angle)

    mask = jnp.abs(angle) > min_theta
    default_axis = jnp.zeros_like(exp_map).at[..., 2].set(1.0)
    angle_w = jnp.where(mask, angle_w, 0.0)
    axis = jnp.where(mask[..., None], axis, default_axis)
    return angle_w, axis


def exp_map_to_quat(exp_map: jax.Array) -> jax.Array:
    angle, axis = exp_map_to_angle_axis(exp_map)
    return quat_from_angle_axis(angle, axis)


def slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical interpolation with the reference's guards
    (`torch_utils.py:110-131`): shortest-arc sign flip, linear fallback for
    nearly-parallel quats, q0 passthrough at |cos| >= 1.
    `t` broadcasts against q0/q1's leading dims (pass shape (..., 1)).
    """
    cos_half = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(cos_half < 0, -q1, q1)
    cos_half = jnp.abs(cos_half)

    half = jnp.arccos(jnp.clip(cos_half, -1.0, 1.0))
    sin_half = jnp.sqrt(jnp.maximum(1.0 - cos_half * cos_half, 0.0))
    safe_sin = jnp.where(jnp.abs(sin_half) < 0.001, 1.0, sin_half)

    ratio_a = jnp.sin((1.0 - t) * half) / safe_sin
    ratio_b = jnp.sin(t * half) / safe_sin
    out = ratio_a * q0 + ratio_b * q1

    out = jnp.where(jnp.abs(sin_half) < 0.001, 0.5 * q0 + 0.5 * q1, out)
    out = jnp.where(jnp.abs(cos_half) >= 1.0, q0, out)
    return out


def quat_to_tan_norm(q: jax.Array) -> jax.Array:
    """6D rotation encoding: rotated x-axis (tangent) ++ rotated z-axis (normal).

    Matches reference `torch_utils.py:285-297`; this is the rotation encoding
    used throughout the observation space.
    """
    ref_tan = jnp.zeros_like(q[..., :3]).at[..., 0].set(1.0)
    ref_norm = jnp.zeros_like(q[..., :3]).at[..., 2].set(1.0)
    tan = quat_rotate(q, ref_tan)
    norm = quat_rotate(q, ref_norm)
    return jnp.concatenate([tan, norm], axis=-1)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix from xyzw quaternion."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(m: jax.Array) -> jax.Array:
    """xyzw quaternion from a (..., 3, 3) rotation matrix (branch-free)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four candidate constructions; pick the numerically largest pivot.
    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    def _safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    qw = jnp.stack([_safe_sqrt(tw) / 2, (m21 - m12) / (2 * _safe_sqrt(tx)),
                    (m02 - m20) / (2 * _safe_sqrt(ty)), (m10 - m01) / (2 * _safe_sqrt(tz))], -1)
    qx = jnp.stack([(m21 - m12) / (2 * _safe_sqrt(tw)), _safe_sqrt(tx) / 2,
                    (m10 + m01) / (2 * _safe_sqrt(ty)), (m02 + m20) / (2 * _safe_sqrt(tz))], -1)
    qy = jnp.stack([(m02 - m20) / (2 * _safe_sqrt(tw)), (m10 + m01) / (2 * _safe_sqrt(tx)),
                    _safe_sqrt(ty) / 2, (m21 + m12) / (2 * _safe_sqrt(tz))], -1)
    qz = jnp.stack([(m10 - m01) / (2 * _safe_sqrt(tw)), (m02 + m20) / (2 * _safe_sqrt(tx)),
                    (m21 + m12) / (2 * _safe_sqrt(ty)), _safe_sqrt(tz) / 2], -1)

    pivot = jnp.argmax(jnp.stack([tw, tx, ty, tz], axis=-1), axis=-1)
    take = lambda c: jnp.take_along_axis(c, pivot[..., None], axis=-1)[..., 0]
    q = jnp.stack([take(qx), take(qy), take(qz), take(qw)], axis=-1)
    return quat_unit(q)


# ---------------------------------------------------------------------------
# heading decomposition (rotation about world z)
# ---------------------------------------------------------------------------


def calc_heading(q: jax.Array) -> jax.Array:
    """Yaw of the body x-axis on the ground plane (reference :369-380)."""
    ref_dir = jnp.zeros_like(q[..., :3]).at[..., 0].set(1.0)
    rot_dir = quat_rotate(q, ref_dir)
    return jnp.arctan2(rot_dir[..., 1], rot_dir[..., 0])


def calc_heading_quat(q: jax.Array) -> jax.Array:
    heading = calc_heading(q)
    axis = jnp.zeros_like(q[..., :3]).at[..., 2].set(1.0)
    return quat_from_angle_axis(heading, axis)


def calc_heading_quat_inv(q: jax.Array) -> jax.Array:
    heading = calc_heading(q)
    axis = jnp.zeros_like(q[..., :3]).at[..., 2].set(1.0)
    return quat_from_angle_axis(-heading, axis)


# ---------------------------------------------------------------------------
# 7D transforms [quat(xyzw) | pos]
# ---------------------------------------------------------------------------


def transform_from_rotation_translation(r: jax.Array, t: jax.Array) -> jax.Array:
    return jnp.concatenate([r, t], axis=-1)


def transform_rotation(x: jax.Array) -> jax.Array:
    return x[..., :4]


def transform_translation(x: jax.Array) -> jax.Array:
    return x[..., 4:]


def transform_mul(x: jax.Array, y: jax.Array) -> jax.Array:
    """Compose transforms: (x * y)(p) = x(y(p))."""
    r = quat_mul_norm(transform_rotation(x), transform_rotation(y))
    t = quat_rotate(transform_rotation(x), transform_translation(y)) + transform_translation(x)
    return transform_from_rotation_translation(r, t)


def transform_inverse(x: jax.Array) -> jax.Array:
    inv_r = quat_inverse(transform_rotation(x))
    inv_t = quat_rotate(inv_r, -transform_translation(x))
    return transform_from_rotation_translation(inv_r, inv_t)


def transform_apply(x: jax.Array, p: jax.Array) -> jax.Array:
    return quat_rotate(transform_rotation(x), p) + transform_translation(x)
