"""Reference-trajectory stores: HDF5 datasets, synthetic trajectories.

The TPU-native counterpart of the reference trajectory loaders
(flybody/tasks/trajectory_loaders.py): datasets are loaded host-side once
into padded device arrays shared by all vmapped envs; episodes carry only
integer indices into the store.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# Fixed CoM offset from the fly root joint, thorax frame
# (reference tasks/task_utils.py:237).
COM_OFFSET = np.array([-0.03697732, 0.00029205, -0.0142447])


def _np_quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def _np_rotate(v, q):
    w = q[0]
    u = q[1:]
    return v * (w * w - u @ u) + 2 * u * (u @ v) + 2 * w * np.cross(u, v)


def root2com(root_qpos, offset=COM_OFFSET):
    """Fly CoM from root qpos (batched, jnp)."""
    from flybody_tpu.utils.quaternions import rotate_vec_with_quat
    return root_qpos[..., :3] + rotate_vec_with_quat(
        jnp.asarray(offset, root_qpos.dtype), root_qpos[..., 3:7])


def com2root(com, quat, offset=COM_OFFSET):
    """Root position from CoM position (numpy, build-time)."""
    out = np.zeros_like(com)
    for i in range(com.shape[0]):
        out[i] = com[i] + _np_rotate(-offset, quat[i] / np.linalg.norm(
            quat[i]))
    return out


def constant_speed_trajectory(n_steps: int, speed: float,
                              yaw_speed: float = 0.0,
                              init_pos=(0, 0, 0.1278),
                              init_heading: float = 0.0,
                              body_rot_angle_y: float = 0.0,
                              body_rot_angle_x: float = 0.0,
                              control_timestep: float = 0.002):
    """Synthetic straight/turning trajectory
    (reference tasks/synthetic_trajectories.py:10-70)."""
    qpos = np.zeros((n_steps, 7))
    qvel = np.zeros((n_steps, 6))
    qpos[0, :3] = init_pos
    qpos[:, 2] = init_pos[2]
    ya = np.deg2rad(body_rot_angle_y)
    xa = np.deg2rad(body_rot_angle_x)
    q = np.array([np.cos(ya / 2), 0.0, np.sin(ya / 2), 0.0])
    q = _np_quat_mul(np.array([np.cos(xa / 2), np.sin(xa / 2), 0.0, 0.0]), q)
    dq_h = np.array([np.cos(init_heading / 2), 0, 0,
                     np.sin(init_heading / 2)])
    qpos[0, 3:] = _np_quat_mul(dq_h, q)
    qvel[0, :2] = speed * np.array([np.cos(init_heading),
                                    np.sin(init_heading)])
    dtheta = yaw_speed * control_timestep
    dquat = np.array([np.cos(dtheta / 2), 0, 0, np.sin(dtheta / 2)])
    # Local angular velocity of the constant yaw rotation.
    sin_half = np.linalg.norm(dquat[1:])
    angle = 2 * np.arctan2(sin_half, dquat[0])
    axis = (dquat[1:] / sin_half) if sin_half > 1e-12 else np.zeros(3)
    qvel[:, 3:] = axis * angle
    M = np.array([[np.cos(dtheta), -np.sin(dtheta)],
                  [np.sin(dtheta), np.cos(dtheta)]])
    for i in range(1, n_steps):
        qvel[i, :2] = M @ qvel[i - 1, :2]
        qpos[i, :2] = qpos[i - 1, :2] + qvel[i, :2] * control_timestep
        qpos[i, 3:] = _np_quat_mul(dquat, qpos[i - 1, 3:])
    return qpos, qvel


@dataclasses.dataclass
class TrajectoryStore:
    """Padded trajectory bank on device. Root qpos/qvel only (7/6 dims) for
    flight and inference-mode walking; full-body arrays optional."""

    qpos: jax.Array  # (N, T, 7+) root (+joints)
    qvel: jax.Array  # (N, T, 6+)
    lengths: jax.Array  # (N,) int32
    root2site: jax.Array | None = None  # (N, T, S, 3), walking datasets
    joint_quat: jax.Array | None = None  # (N, T, J, 4)

    @property
    def num_trajectories(self):
        return self.qpos.shape[0]


def store_from_arrays(qpos_list, qvel_list, extras=None,
                      dtype=np.float64) -> TrajectoryStore:
    n = len(qpos_list)
    tmax = max(q.shape[0] for q in qpos_list)
    dq = qpos_list[0].shape[1]
    dv = qvel_list[0].shape[1]
    qpos = np.zeros((n, tmax, dq), dtype)
    qvel = np.zeros((n, tmax, dv), dtype)
    lengths = np.zeros(n, np.int32)
    for i, (qp, qv) in enumerate(zip(qpos_list, qvel_list)):
        L = qp.shape[0]
        qpos[i, :L] = qp
        qpos[i, L:] = qp[-1]  # pad with the final frame
        qvel[i, :L] = qv
        lengths[i] = L
    kw = {}
    if extras:
        for key in ('root2site', 'joint_quat'):
            if key in extras:
                arrs = extras[key]
                shape = arrs[0].shape[1:]
                buf = np.zeros((n, tmax) + shape, dtype)
                for i, a in enumerate(arrs):
                    buf[i, :a.shape[0]] = a
                    buf[i, a.shape[0]:] = a[-1]
                kw[key] = jnp.asarray(buf)
    return TrajectoryStore(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
                           lengths=jnp.asarray(lengths), **kw)


def inference_flight_store() -> TrajectoryStore:
    """Synthetic flight trajectory store (reference
    trajectory_loaders.py:159-164). CoM trajectory converted to root."""
    com_qpos, com_qvel = constant_speed_trajectory(
        n_steps=200, speed=20, init_pos=(0, 0, 1),
        body_rot_angle_y=-47.5, control_timestep=2e-4)
    com_qpos[:, :2] -= com_qpos[0, :2]
    root = com2root(com_qpos[:, :3], com_qpos[:, 3:])
    qpos = np.concatenate([root, com_qpos[:, 3:]], axis=1)
    return store_from_arrays([qpos], [com_qvel])


def inference_walking_store() -> TrajectoryStore:
    """Synthetic walking trajectory (reference
    trajectory_loaders.py:282-287)."""
    qpos, qvel = constant_speed_trajectory(
        n_steps=300, speed=2, init_pos=(0, 0, 0.1278),
        control_timestep=2e-3)
    return store_from_arrays([qpos], [qvel])


def load_flight_hdf5(path: str, traj_indices=None) -> TrajectoryStore:
    """Flight imitation dataset (reference trajectory_loaders.py:67-141)."""
    import h5py
    qpos_list, qvel_list = [], []
    with h5py.File(path, 'r') as f:
        n = len(f['trajectories'])
        nz = len(str(n))
        indices = range(n) if traj_indices is None else traj_indices
        for idx in indices:
            key = str(idx).zfill(nz)
            com_qpos = f['trajectories'][key]['com_qpos'][()]
            com_qvel = f['trajectories'][key]['com_qvel'][()]
            com_qpos[:, :2] -= com_qpos[0, :2]
            root = com2root(com_qpos[:, :3], com_qpos[:, 3:])
            qpos_list.append(
                np.concatenate([root, com_qpos[:, 3:]], axis=1))
            qvel_list.append(com_qvel)
    return store_from_arrays(qpos_list, qvel_list)


def load_walking_hdf5(path: str, traj_indices=None):
    """Walking imitation dataset (reference
    trajectory_loaders.py:185-264). Returns (store, site_names,
    joint_names)."""
    import h5py
    qpos_list, qvel_list = [], []
    r2s, jq = [], []
    with h5py.File(path, 'r') as f:
        n = len(f['trajectories'])
        nz = len(str(n))
        lens = f['trajectory_lengths'][()]
        indices = range(n) if traj_indices is None else traj_indices
        for idx in indices:
            key = str(idx).zfill(nz)
            s = f['trajectories'][key]
            L = int(lens[idx])
            qpos = np.concatenate(
                [s['root_qpos'][:L], s['qpos'][:L]], axis=1)
            qpos[:, :2] -= qpos[0, :2]
            qvel = np.concatenate(
                [s['root_qvel'][:L], s['qvel'][:L]], axis=1)
            qpos_list.append(qpos)
            qvel_list.append(qvel)
            r2s.append(s['root2site'][:L])
            jq.append(s['joint_quat'][:L])
        site_names = [x.decode() for x in f['id2name']['sites']]
        joint_names = [x.decode() for x in f['id2name']['joints']]
    store = store_from_arrays(qpos_list, qvel_list,
                              extras={'root2site': r2s, 'joint_quat': jq})
    return store, site_names, joint_names
