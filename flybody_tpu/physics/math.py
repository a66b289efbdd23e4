"""Spatial algebra for the TPU-native engine.

Spatial (6D) vectors follow the (angular; linear) ordering. Motion and force
vectors are expressed at a common reference point (the subtree center of mass
of each kinematic tree root), matching the classic CRB/RNE formulation.

All functions are batched over arbitrary leading dimensions and are pure jnp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flybody_tpu.utils.quaternions import (
    axis_angle_to_quat,
    conj_quat,
    mult_quat,
    norm_quat,
    quat_to_mat,
    rotate_vec_with_quat,
)

__all__ = [
    'axis_angle_to_quat', 'conj_quat', 'mult_quat', 'norm_quat',
    'quat_to_mat', 'rotate_vec_with_quat', 'compose_frame', 'skew',
    'motion_cross', 'force_cross', 'spatial_inertia', 'transform_motion',
]


def compose_frame(pos1: jax.Array, quat1: jax.Array, pos2: jax.Array,
                  quat2: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Compose rigid transforms: (p1, q1) ∘ (p2, q2)."""
    return pos1 + rotate_vec_with_quat(pos2, quat1), mult_quat(quat1, quat2)


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix S(v) with S(v) @ x = v × x; shape [..., 3, 3]."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def motion_cross(v: jax.Array, m: jax.Array) -> jax.Array:
    """Motion-vector cross product v ×ₘ m for v, m of shape [..., 6]."""
    w, u = v[..., :3], v[..., 3:]
    wm, um = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, wm), jnp.cross(w, um) + jnp.cross(u, wm)], axis=-1)


def force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
    """Force-vector cross product v ×* f (dual of motion_cross)."""
    w, u = v[..., :3], v[..., 3:]
    fa, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, fa) + jnp.cross(u, fl), jnp.cross(w, fl)], axis=-1)


def spatial_inertia(mass: jax.Array, inertia_diag: jax.Array,
                    imat: jax.Array, com_offset: jax.Array) -> jax.Array:
    """6x6 spatial inertia about a reference point.

    Args:
        mass: [...,] body mass.
        inertia_diag: [..., 3] principal inertia at the body CoM.
        imat: [..., 3, 3] rotation from the principal-inertia frame to world.
        com_offset: [..., 3] r = (body CoM − reference point), world frame.

    Returns:
        [..., 6, 6] spatial inertia in (angular; linear) ordering.
    """
    # Broadcast mul+sum forms — batched 3x3 matmuls serialize on the MXU.
    I_com = jnp.sum(imat[..., :, None, :] * imat[..., None, :, :]
                    * inertia_diag[..., None, None, :], axis=-1)
    S = skew(com_offset)
    m = mass[..., None, None]
    # S S^T = |r|^2 I - r r^T for S = skew(r).
    rr = com_offset[..., :, None] * com_offset[..., None, :]
    r2 = jnp.sum(com_offset * com_offset, axis=-1)[..., None, None]
    eye3 = jnp.eye(3, dtype=I_com.dtype)
    top_left = I_com + m * (r2 * eye3 - rr)
    top_right = m * S
    bottom_left = -m * S
    bottom_right = m * jnp.broadcast_to(
        jnp.eye(3, dtype=I_com.dtype), I_com.shape)
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bottom = jnp.concatenate([bottom_left, bottom_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def transform_motion(vec: jax.Array, new_point_minus_old: jax.Array
                     ) -> jax.Array:
    """Shift a motion vector's reference point by `new_point_minus_old`."""
    w, u = vec[..., :3], vec[..., 3:]
    return jnp.concatenate(
        [w, u - jnp.cross(new_point_minus_old, w)], axis=-1)


def exclusive_cumsum(flag, tile: int = 32):
    """Exclusive prefix sum of a 1-D array via tiled triangular matmuls.

    jnp.cumsum over a few-thousand-element axis can lower poorly on TPU
    under vmap; two small constant-triangular matmuls (within-tile
    inclusive scan + tile-offset scan) keep the whole thing on the MXU.
    """
    n = flag.shape[0]
    pad = (-n) % tile
    dtype = flag.dtype
    f = jnp.concatenate([flag, jnp.zeros((pad,), dtype)]) if pad else flag
    nt = (n + pad) // tile
    ft = f.reshape(nt, tile)
    # Inclusive within-tile scan: inc[t, i] = sum_{j <= i} ft[t, j].
    incl = jnp.asarray(
        jnp.triu(jnp.ones((tile, tile))), dtype)  # U[j, i] = 1 for j <= i
    inc = ft @ incl
    tot = inc[:, -1]
    # Strict tile-offset scan: off[t] = sum_{u < t} tot[u].
    strict = jnp.asarray(
        jnp.triu(jnp.ones((nt, nt)), k=1), dtype)  # SU[u, t] = 1 for u < t
    off = tot @ strict
    out = (off[:, None] + inc - ft).reshape(-1)
    return out[:n]
