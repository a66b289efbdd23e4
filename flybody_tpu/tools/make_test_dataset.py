"""Synthetic HDF5 imitation datasets in the reference layout.

Generates small walking / flight datasets with the exact group structure of
the reference figshare datasets (flybody/tasks/trajectory_loaders.py:34-264):

  walking:  trajectories/<zero-padded idx>/{root_qpos, qpos, root_qvel, qvel,
            root2site, joint_quat}, trajectory_lengths, id2name/{sites,
            joints}, timestep_seconds
  flight:   trajectories/<idx>/{com_qpos, com_qvel}, timestep_seconds

Useful for tests and for users who want to exercise the imitation pipeline
without downloading the real mocap data. Kinematic quantities (root2site,
joint_quat) are computed from the compiled fly model via the same feature
conventions as the reward stack (rewards.py walker_features), so rewards are
exactly 1.0 when the walker reproduces the snippet.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from flybody_tpu.envs import rewards as rewards_lib
from flybody_tpu.envs.trajectories import constant_speed_trajectory
from flybody_tpu.model.spec import FlyModel
from flybody_tpu.physics import kinematics as kin
from flybody_tpu.physics.state import make_data
from flybody_tpu.utils import quaternions as quat

# Default mocap tracking set: one site per claw, the reference datasets track
# end effectors (trajectory_loaders.py:261-264 id2name).
DEFAULT_SITES = ('claw_T1_left', 'claw_T1_right', 'claw_T2_left',
                 'claw_T2_right', 'claw_T3_left', 'claw_T3_right')


def _leg_joint_names(meta):
    return tuple(j for j in meta.jnt_names
                 if any(k in j for k in ('coxa', 'femur', 'tibia', 'tarsus')))


def _features_for_frames(model: FlyModel, qpos_frames, site_ids, joint_ids):
    """Per-frame (root2site, joint_quat) via FK, matching walker_features."""
    meta = model.meta
    qposadr = np.array([meta.jnt_qposadr[j] for j in joint_ids])

    def one(qp):
        d = make_data(model).replace(qpos=qp)
        d, _, jnt_xaxis = kin.kinematics(model, d)
        root_pos, root_quat = qp[:3], qp[3:7]
        site_xpos = d.site_xpos[np.array(site_ids)]
        r2s = quat.get_egocentric_vec(root_pos, site_xpos, root_quat)
        xaxis1 = quat.rotate_vec_with_quat(
            jnt_xaxis[np.array(joint_ids)], quat.reciprocal_quat(root_quat))
        jq = quat.joint_orientation_quat(xaxis1, qp[qposadr])
        return r2s, jq

    return jax.vmap(one)(jnp.asarray(qpos_frames))


def make_walking_dataset(path: str, model: FlyModel, n_traj: int = 2,
                         n_steps: int = 120, timestep: float = 2e-3,
                         site_names=DEFAULT_SITES, joint_names=None,
                         seed: int = 0):
    """Writes a synthetic walking imitation dataset to `path`."""
    import h5py
    meta = model.meta
    if joint_names is None:
        joint_names = _leg_joint_names(meta)
    joint_ids = [meta.jnt_names.index(n) for n in joint_names]
    site_ids = [meta.site_names.index(n) for n in site_names]
    qposadr = np.array([meta.jnt_qposadr[j] for j in joint_ids])
    qpos0 = np.asarray(model.qpos0)
    rng = np.random.RandomState(seed)

    nz = len(str(n_traj))
    with h5py.File(path, 'w') as f:
        f.create_dataset('timestep_seconds', data=timestep)
        lens = []
        g = f.create_group('trajectories')
        for i in range(n_traj):
            L = n_steps - 10 * i
            lens.append(L)
            root_qpos, root_qvel = constant_speed_trajectory(
                L, speed=1.0 + i, yaw_speed=0.3 * i,
                init_pos=(0, 0, 0.1278), control_timestep=timestep)
            # Joint angles: rest pose + small phase-shifted sinusoids.
            t = np.arange(L)[:, None] * timestep
            phase = rng.uniform(0, 2 * np.pi, (1, len(joint_ids)))
            amp = 0.1
            ang = qpos0[qposadr][None] + amp * np.sin(
                2 * np.pi * 8.0 * t + phase)
            angvel = amp * 2 * np.pi * 8.0 * np.cos(2 * np.pi * 8.0 * t
                                                    + phase)
            full = np.tile(qpos0[None], (L, 1))
            full[:, :7] = root_qpos
            full[:, qposadr] = ang
            r2s, jq = _features_for_frames(model, full, site_ids, joint_ids)
            s = g.create_group(str(i).zfill(nz))
            s.create_dataset('root_qpos', data=root_qpos)
            s.create_dataset('qpos', data=ang)
            s.create_dataset('root_qvel', data=root_qvel)
            s.create_dataset('qvel', data=angvel)
            s.create_dataset('root2site', data=np.asarray(r2s))
            s.create_dataset('joint_quat', data=np.asarray(jq))
        f.create_dataset('trajectory_lengths', data=np.array(lens))
        idg = f.create_group('id2name')
        idg.create_dataset(
            'sites', data=np.array([n.encode() for n in site_names]))
        idg.create_dataset(
            'joints', data=np.array([n.encode() for n in joint_names]))
    return path


def write_walking_dataset_from_frames(path: str, model: FlyModel,
                                      qpos_frames_list, qvel_frames_list,
                                      timestep: float = 2e-3,
                                      site_names=DEFAULT_SITES,
                                      joint_names=None):
    """Writes a walking dataset from FULL engine state frames.

    Each entry is (T, nq) qpos / (T, nv) qvel recorded from engine
    rollouts (e.g. tools/gait_search.py), so the resulting dataset is
    dynamically consistent by construction. Frames are split into the
    reference layout (root free joint + tracked leg joints) and the
    root2site/joint_quat reward features are computed by FK with the same
    conventions as rewards.walker_features.
    """
    import h5py
    meta = model.meta
    if joint_names is None:
        joint_names = _leg_joint_names(meta)
    joint_ids = [meta.jnt_names.index(n) for n in joint_names]
    site_ids = [meta.site_names.index(n) for n in site_names]
    qposadr = np.array([meta.jnt_qposadr[j] for j in joint_ids])
    dofadr = np.array([meta.jnt_dofadr[j] for j in joint_ids])

    n_traj = len(qpos_frames_list)
    nz = max(1, len(str(n_traj)))
    with h5py.File(path, 'w') as f:
        f.create_dataset('timestep_seconds', data=timestep)
        g = f.create_group('trajectories')
        lens = []
        for i, (qp, qv) in enumerate(zip(qpos_frames_list,
                                         qvel_frames_list)):
            qp = np.asarray(qp, np.float64)
            qv = np.asarray(qv, np.float64)
            L = qp.shape[0]
            lens.append(L)
            # Re-zero xy like the reference loader expects to be able to
            # (trajectory_loaders.py re-zeroes on load; storing re-zeroed
            # frames keeps the file canonical).
            qp = qp.copy()
            qp[:, 0] -= qp[0, 0]
            qp[:, 1] -= qp[0, 1]
            r2s, jq = _features_for_frames(model, qp, site_ids, joint_ids)
            s = g.create_group(str(i).zfill(nz))
            s.create_dataset('root_qpos', data=qp[:, :7])
            s.create_dataset('qpos', data=qp[:, qposadr])
            s.create_dataset('root_qvel', data=qv[:, :6])
            s.create_dataset('qvel', data=qv[:, dofadr])
            s.create_dataset('root2site', data=np.asarray(r2s))
            s.create_dataset('joint_quat', data=np.asarray(jq))
        f.create_dataset('trajectory_lengths', data=np.array(lens))
        idg = f.create_group('id2name')
        idg.create_dataset(
            'sites', data=np.array([n.encode() for n in site_names]))
        idg.create_dataset(
            'joints', data=np.array([n.encode() for n in joint_names]))
    return path


def make_flight_dataset(path: str, n_traj: int = 2, n_steps: int = 150,
                        timestep: float = 2e-4):
    """Writes a synthetic flight imitation dataset to `path`."""
    import h5py
    nz = len(str(n_traj))
    with h5py.File(path, 'w') as f:
        f.create_dataset('timestep_seconds', data=timestep)
        g = f.create_group('trajectories')
        for i in range(n_traj):
            com_qpos, com_qvel = constant_speed_trajectory(
                n_steps, speed=20.0 + 5 * i, init_pos=(0, 0, 1.0),
                body_rot_angle_y=-47.5, control_timestep=timestep)
            s = g.create_group(str(i).zfill(nz))
            s.create_dataset('com_qpos', data=com_qpos)
            s.create_dataset('com_qvel', data=com_qvel)
    return path
