"""Reward machinery: dm_control-style tolerance and DeepMimic factors.

JAX counterparts of the reference reward stack (flybody/tasks/rewards.py and
dm_control.utils.rewards.tolerance with sigmoid='linear'), batched and
jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flybody_tpu.utils import quaternions as quat

# Default walking-imitation Gaussian widths (reference rewards.py:102-107).
DEEP_MIMIC_STD = {
    'com': 0.078487,
    'qvel': 53.7801,
    'root2site': 0.0735,
    'joint_quat': 1.2247,
}


def tolerance_linear(x, margin, value_at_margin=0.0):
    """dm_control rewards.tolerance with bounds=(0, 0), sigmoid='linear'.

    Returns 1 at x == 0, decays linearly to `value_at_margin` at |x| ==
    margin, 0 beyond. Scalar or elementwise.
    """
    d = jnp.abs(x) / margin
    value = 1.0 - (1.0 - value_at_margin) * d
    return jnp.where(d < 1.0, value, jnp.zeros_like(value))


def walker_features(qpos, qvel, site_xpos, joint_xaxis, joint_qpos):
    """Pose features of the walker (reference rewards.py:37-62).

    Args:
        qpos: root + mocap joint positions, (7 + J,).
        qvel: root + mocap joint velocities, (6 + J,).
        site_xpos: mocap site world positions, (S, 3).
        joint_xaxis: world axes of the mocap joints, (J, 3).
        joint_qpos: mocap joint angles, (J,).
    """
    root_pos = qpos[:3]
    root_quat = qpos[3:7]
    root2site = quat.get_egocentric_vec(root_pos, site_xpos, root_quat)
    xaxis1 = quat.rotate_vec_with_quat(joint_xaxis,
                                       quat.reciprocal_quat(root_quat))
    joint_quat = quat.joint_orientation_quat(xaxis1, joint_qpos)
    return {
        'com': root_pos,
        'qvel': qvel,
        'root2site': root2site,
        'joint_quat': jnp.concatenate([root_quat[None], joint_quat], axis=0),
    }


def reference_features(ref_qpos, ref_qvel, ref_root2site, ref_joint_quat):
    """Reference features at one step (reference rewards.py:65-81)."""
    return {
        'com': ref_qpos[:3],
        'qvel': ref_qvel,
        'root2site': ref_root2site,
        'joint_quat': jnp.concatenate(
            [ref_qpos[3:7][None], ref_joint_quat], axis=0),
    }


def reward_factors_deep_mimic(walker_f, reference_f, std=None,
                              weights=(1.0, 1.0, 1.0, 1.0)):
    """Four DeepMimic reward factors (reference rewards.py:84-116)."""
    std = std or DEEP_MIMIC_STD
    factors = []
    for k, w in zip(('com', 'qvel', 'root2site', 'joint_quat'), weights):
        if 'quat' in k:
            diff = jnp.sum(
                quat.quat_dist_short_arc(walker_f[k], reference_f[k]) ** 2)
        else:
            diff = jnp.sum(jnp.abs(walker_f[k] - reference_f[k]) ** 2)
        factors.append(w * jnp.exp(-0.5 / std[k] ** 2 * diff))
    return jnp.stack(factors)
