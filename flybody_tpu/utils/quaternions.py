"""Batched quaternion library (JAX).

TPU-native counterpart of the reference quaternion utilities
(reference: flybody/quaternions.py). All functions:
  * use scalar-first (w, x, y, z) convention,
  * accept arbitrary leading batch dimensions,
  * are pure jnp and differentiable, safe under jit/vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def mult_quat(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b, broadcasting over leading dims."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def conj_quat(q: jax.Array) -> jax.Array:
    """Quaternion conjugate."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def reciprocal_quat(q: jax.Array) -> jax.Array:
    """Quaternion reciprocal q^-1 = conj(q)/|q|^2."""
    return conj_quat(q) / jnp.maximum(
        jnp.sum(q * q, axis=-1, keepdims=True), _EPS)


def norm_quat(q: jax.Array) -> jax.Array:
    """Normalize to a unit quaternion."""
    return q / jnp.maximum(
        jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def rotate_vec_with_quat(vec: jax.Array, quat: jax.Array) -> jax.Array:
    """Rotates vector(s) by quaternion(s): R(quat) @ vec.

    Uses the expanded Rodrigues form (no intermediate quaternion products),
    which is cheaper and fuses well on the VPU.
    """
    w = quat[..., :1]
    u = quat[..., 1:]
    # v' = v + 2 w (u x v) + 2 u x (u x v), for |quat| = 1.
    s = jnp.sum(quat * quat, axis=-1, keepdims=True)
    uv = jnp.cross(u, vec)
    return (vec * (s - 2.0 * jnp.sum(u * u, axis=-1, keepdims=True))
            + 2.0 * u * jnp.sum(u * vec, axis=-1, keepdims=True)
            + 2.0 * w * uv) / jnp.maximum(s, _EPS)


def rotate_vec_inv_quat(vec: jax.Array, quat: jax.Array) -> jax.Array:
    """Rotates vector(s) by the inverse of quaternion(s): R(quat)^T @ vec."""
    return rotate_vec_with_quat(vec, conj_quat(quat))


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Unit quaternion -> 3x3 rotation matrix (batched, shape [..., 3, 3])."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def mat_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion (batched, branch-free)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best via argmax.
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, _EPS))
    case0 = jnp.stack([qw[..., 0], (m21 - m12) / qw[..., 0],
                       (m02 - m20) / qw[..., 0], (m10 - m01) / qw[..., 0]],
                      axis=-1)
    case1 = jnp.stack([(m21 - m12) / qw[..., 1], qw[..., 1],
                       (m01 + m10) / qw[..., 1], (m02 + m20) / qw[..., 1]],
                      axis=-1)
    case2 = jnp.stack([(m02 - m20) / qw[..., 2], (m01 + m10) / qw[..., 2],
                       qw[..., 2], (m12 + m21) / qw[..., 2]], axis=-1)
    case3 = jnp.stack([(m10 - m01) / qw[..., 3], (m02 + m20) / qw[..., 3],
                       (m12 + m21) / qw[..., 3], qw[..., 3]], axis=-1)
    cases = jnp.stack([case0, case1, case2, case3], axis=-2)
    idx = jnp.argmax(qw, axis=-1)
    q = jnp.take_along_axis(
        cases, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    # All four candidates are a uniform scalar multiple of the true
    # quaternion, so normalization recovers it exactly.
    return norm_quat(q)


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Axis-angle -> quaternion. `angle` broadcasts against axis[..., 0]."""
    angle = jnp.asarray(angle)
    half = 0.5 * angle
    return jnp.concatenate(
        [jnp.cos(half)[..., None], jnp.sin(half)[..., None] * axis], axis=-1)


def quat_to_axis_angle(q: jax.Array) -> jax.Array:
    """Unit quaternion -> rotation vector (axis * angle), shape [..., 3]."""
    sin_half = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(sin_half, q[..., :1])
    axis = q[..., 1:] / jnp.maximum(sin_half, _EPS)
    return axis * angle


def log_quat(q: jax.Array) -> jax.Array:
    """Quaternion logarithm: log(q) = (log|q|, axis * angle/2)."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    vec_norm = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    angle = jnp.arctan2(vec_norm, q[..., :1])
    axis = q[..., 1:] / jnp.maximum(vec_norm, _EPS)
    return jnp.concatenate([jnp.log(jnp.maximum(norm, _EPS)), axis * angle],
                           axis=-1)


def quat_dist_short_arc(a: jax.Array, b: jax.Array) -> jax.Array:
    """Short-arc geodesic angle between unit quaternions, in [0, pi]."""
    dot = jnp.sum(a * b, axis=-1)
    prod = jnp.sqrt(jnp.maximum(
        jnp.sum(a * a, axis=-1) * jnp.sum(b * b, axis=-1), _EPS))
    c = jnp.clip(jnp.abs(dot) / prod, -1.0, 1.0)
    return 2.0 * jnp.arccos(c)


def quat_z_to_vec(vec: jax.Array) -> jax.Array:
    """Minimal-rotation quaternion mapping the z-axis onto `vec`."""
    v = vec / jnp.maximum(jnp.linalg.norm(vec, axis=-1, keepdims=True), _EPS)
    z = jnp.zeros_like(v).at[..., 2].set(1.0)
    axis = jnp.cross(z, v)
    sin = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    cos = v[..., 2:3]
    angle = jnp.arctan2(sin, cos)[..., 0]
    safe_axis = jnp.where(sin > 1e-8, axis / jnp.maximum(sin, _EPS),
                          jnp.zeros_like(v).at[..., 0].set(1.0))
    return axis_angle_to_quat(safe_axis, angle)


def get_dquat_local(quat_from: jax.Array, quat_to: jax.Array) -> jax.Array:
    """Rotation from `quat_from` to `quat_to`, expressed in the local frame
    of `quat_from` (the egocentric difference quaternion)."""
    return mult_quat(conj_quat(quat_from), quat_to)


def get_egocentric_vec(root_pos: jax.Array, vec_world: jax.Array,
                       root_quat: jax.Array) -> jax.Array:
    """World displacement (vec_world - root_pos) expressed in root frame."""
    return rotate_vec_inv_quat(vec_world - root_pos, root_quat)


def vec_world_to_local(vec: jax.Array, quat: jax.Array) -> jax.Array:
    """Rotates a world-frame vector into the local frame of `quat`."""
    return rotate_vec_inv_quat(vec, quat)


def quat_seq_to_angvel(quats: jax.Array, dt: float) -> jax.Array:
    """Finite-difference angular velocity (local frame) from a quaternion
    sequence of shape (T, 4); returns (T-1, 3).

    Matches MuJoCo's mju_quat2Vel convention used by the reference
    (flybody/quaternions.py:358, flybody/synthetic_trajectories.py).
    """
    dq = mult_quat(conj_quat(quats[:-1]), quats[1:])
    # Short arc.
    dq = dq * jnp.sign(dq[..., :1] + 1e-30)
    return quat_to_axis_angle(dq) / dt


def integrate_quat(q: jax.Array, angvel_local: jax.Array,
                   dt: jax.Array | float) -> jax.Array:
    """Integrate unit quaternion by local-frame angular velocity over dt.

    Matches MuJoCo mj_integratePos semantics for free/ball joints:
    q' = q * exp(omega_local * dt / 2), renormalized.
    """
    # Smoothed norm: keeps gradients finite at angvel == 0 (needed by
    # autodiff users like the IK solver) with O(1e-12) value error.
    norm = jnp.sqrt(jnp.sum(angvel_local * angvel_local, axis=-1,
                            keepdims=True) + _EPS * _EPS)
    angle = norm * dt
    axis = angvel_local / norm
    dq = jnp.concatenate(
        [jnp.cos(0.5 * angle), axis * jnp.sin(0.5 * angle)], axis=-1)
    return norm_quat(mult_quat(q, dq))


def joint_orientation_quat(xaxis: jax.Array, qpos: jax.Array) -> jax.Array:
    """Unit quaternion encoding a hinge joint's orientation: rotation of
    `qpos` radians about the joint's world axis `xaxis`.

    Used by the DeepMimic reward features (reference flybody/rewards.py and
    quaternions.py:310).
    """
    return axis_angle_to_quat(xaxis, qpos)
