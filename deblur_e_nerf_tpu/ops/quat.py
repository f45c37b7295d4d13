"""Quaternion operations (XYZW convention), pure-JAX.

Functional equivalents of the roma subset used by the reference plus the
reference's slerp fixes:
  - full-angle rotation vectors in [0, 2*pi] instead of [0, pi]
    (reference: deblur_e_nerf/utils/tensor_ops.py:87-115), which makes
    `shortest_path=False` slerp meaningful;
  - per-element interpolation steps
    (reference: deblur_e_nerf/utils/tensor_ops.py:118-184).

All functions broadcast over leading batch dims and work in the input dtype
(float64 welcome for trajectory interpolation precision).
"""

import jax.numpy as jnp


def quat_product(p, q):
    """Hamilton product of quaternions in XYZW convention, (..., 4)."""
    px, py, pz, pw = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            pw * qx + px * qw + py * qz - pz * qy,
            pw * qy - px * qz + py * qw + pz * qx,
            pw * qz + px * qy - py * qx + pz * qw,
            pw * qw - px * qx - py * qy - pz * qz,
        ],
        axis=-1,
    )


def quat_conjugation(q):
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def unitquat_to_rotmat(q):
    """Unit quaternion (..., 4) XYZW -> rotation matrix (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    one = jnp.ones_like(x)
    m = jnp.stack(
        [
            one - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), one - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), one - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(*q.shape[:-1], 3, 3)


def rotvec_to_unitquat(rotvec):
    """Rotation vector (..., 3) -> unit quaternion (..., 4) XYZW.

    Gradient-safe at zero rotation: the norm's derivative (rotvec/|rotvec|)
    is 0/0 there, so the sqrt input is where-guarded on BOTH sides (the
    single-where Taylor fallback still leaks NaN cotangents through
    `angle`).
    """
    sq = jnp.sum(rotvec * rotvec, axis=-1, keepdims=True)
    small = sq <= jnp.asarray(1e-6, dtype=rotvec.dtype)
    safe_sq = jnp.where(small, jnp.ones_like(sq), sq)
    angle = jnp.where(small, jnp.zeros_like(sq), jnp.sqrt(safe_sq))
    angle_sq = jnp.where(small, sq, angle * angle)
    # sin(theta/2)/theta with Taylor fallback for small angles
    safe_angle = jnp.where(small, jnp.ones_like(angle), angle)
    scale = jnp.where(
        small,
        0.5 - angle_sq / 48 + angle_sq * angle_sq / 3840,
        jnp.sin(safe_angle / 2) / safe_angle,
    )
    xyz = scale * rotvec
    # cos(theta/2) with Taylor fallback (same guarded-angle reasoning)
    w = jnp.where(
        small,
        1.0 - angle_sq / 8 + angle_sq * angle_sq / 384,
        jnp.cos(angle / 2),
    )
    return jnp.concatenate([xyz, w], axis=-1)


def unitquat_to_full_rotvec(q):
    """Unit quaternion -> rotation vector with angle in [0, 2*pi].

    Unlike the usual convention (angle in [0, pi], sign-flipping q), the full
    angle is kept so that slerp without shortest-path flipping interpolates
    along the arc the quaternion pair actually spans
    (reference: deblur_e_nerf/utils/tensor_ops.py:87-115).
    """
    xyz = q[..., :3]
    w = q[..., 3]
    sq = jnp.sum(xyz * xyz, axis=-1)
    small_norm = sq <= jnp.asarray(1e-12, dtype=q.dtype)
    safe_sq = jnp.where(small_norm, jnp.ones_like(sq), sq)
    norm_xyz = jnp.where(
        small_norm, jnp.zeros_like(sq), jnp.sqrt(safe_sq)
    )
    angle = 2 * jnp.arctan2(norm_xyz, w)  # in [0, 2*pi]
    small = jnp.abs(angle) <= jnp.asarray(1e-3, dtype=q.dtype)
    angle_sq = angle * angle
    safe_angle = jnp.where(small, jnp.ones_like(angle), angle)
    scale = jnp.where(
        small,
        2 + angle_sq / 12 + 7 * angle_sq * angle_sq / 2880,
        safe_angle / jnp.sin(safe_angle / 2),
    )
    return scale[..., None] * xyz


def unitquat_slerp(q0, q1, steps, shortest_path=False):
    """Spherical linear interpolation with per-element steps.

    Args:
        q0, q1: (..., 4) unit quaternions.
        steps: (...,) interpolation weights; 0 -> q0, 1 -> q1.
        shortest_path: flip q1 when <q0, q1> < 0 to interpolate the short arc.
    Returns:
        (..., 4) interpolated unit quaternions.
    """
    if shortest_path:
        dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
        q1 = jnp.where(dot < 0, -q1, q1)
    rel = quat_product(quat_conjugation(q0), q1)
    rel_rotvec = unitquat_to_full_rotvec(rel)
    rots = rotvec_to_unitquat(steps[..., None] * rel_rotvec)
    return quat_product(q0, rots)
