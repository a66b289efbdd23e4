"""Walking imitation task (DeepMimic-style tracking of mocap snippets).

Functional counterpart of the reference WalkImitation
(flybody/tasks/walk_imitation.py): episodes reset the fly to the reference
snippet's full-body pose, track a kinematic ghost, scrub NaN actions, and
reward Gaussian factors on (com, qvel, root2site, joint_quat) with weights
(20, 1, 1, 1) plus a wing-retraction factor; termination on speed limits,
CoM divergence, trajectory end, or qacc explosion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from flybody_tpu.envs import base as envbase
from flybody_tpu.envs import rewards as rewards_lib
from flybody_tpu.envs import trajectories as traj_lib
from flybody_tpu.model.spec import FlyModel


@struct.dataclass
class WalkTask:
    traj_idx: jax.Array  # int32
    episode_steps: jax.Array  # int32 (min(max_steps, snippet_steps))


class WalkImitationEnv(envbase.FruitFlyEnv):
    """Walking imitation (reference walk_imitation.py:19-203)."""

    def __init__(self, model: FlyModel, store: traj_lib.TrajectoryStore,
                 mocap_joint_names=(), mocap_site_names=(),
                 terminal_com_dist: float = 0.3,
                 future_steps: int = 64,
                 inference_mode: bool = False,
                 initialize_qvel: bool = False,
                 time_limit: float = 10.0,
                 **kwargs):
        super().__init__(model, num_user_actions=0,
                         control_timestep=2e-3, physics_timestep=2e-4,
                         time_limit=time_limit, **kwargs)
        self.store = store
        self.terminal_com_dist = terminal_com_dist
        self.future_steps = future_steps
        self.inference_mode = inference_mode
        self.initialize_qvel = initialize_qvel
        meta = model.meta
        # Mocap joint qpos/dof addresses (dataset joint order).
        self._mocap_qpos = np.array(
            [meta.jnt_qposadr[meta.jnt_names.index(n)]
             for n in mocap_joint_names], dtype=np.int64)
        self._mocap_dof = np.array(
            [meta.jnt_dofadr[meta.jnt_names.index(n)]
             for n in mocap_joint_names], dtype=np.int64)
        self._mocap_jnt = np.array(
            [meta.jnt_names.index(n) for n in mocap_joint_names],
            dtype=np.int64)
        self._mocap_sites = np.array(
            [meta.site_names.index(n) for n in mocap_site_names],
            dtype=np.int64)

    def with_trajectory(self, qpos, qvel) -> 'WalkImitationEnv':
        """Returns a copy of this env serving exactly the given (T, nq_root
        [+joints]) trajectory — the functional analog of the reference
        InferenceWalkingTrajectoryLoader.set_next_trajectory
        (trajectory_loaders.py:289-301)."""
        import copy
        dtype = np.asarray(self.model.qpos0).dtype
        env = copy.copy(self)
        env.store = traj_lib.store_from_arrays(
            [np.asarray(qpos)], [np.asarray(qvel)], dtype=dtype)
        return env

    # ------------------------------------------------------------------ task

    def _init_task(self, rng) -> WalkTask:
        idx = jax.random.randint(rng, (), 0, self.store.num_trajectories)
        length = self.store.lengths[idx]
        snippet_steps = length - self.future_steps - 1
        episode_steps = jnp.minimum(self.max_steps + 1, snippet_steps)
        return WalkTask(traj_idx=idx.astype(jnp.int32),
                        episode_steps=episode_steps.astype(jnp.int32))

    def _ref(self, task, step, count: int):
        step = jnp.asarray(step, jnp.int32)
        q = jax.lax.dynamic_slice(
            self.store.qpos[task.traj_idx],
            (step, jnp.zeros((), jnp.int32)),
            (count, self.store.qpos.shape[-1]))
        return q

    def _init_qpos_qvel_act(self, task: WalkTask, rng):
        dtype = self.model.qpos0.dtype
        model = self.model
        ref0 = self.store.qpos[task.traj_idx, 0]
        qpos = model.qpos0
        qpos = qpos.at[:7].set(ref0[:7])
        if len(self._mocap_qpos):
            qpos = qpos.at[self._mocap_qpos].set(ref0[7:])
        qvel = jnp.zeros((model.meta.nv,), dtype)
        if self.initialize_qvel:
            refv = self.store.qvel[task.traj_idx, 0]
            qvel = qvel.at[:6].set(refv[:6])
            if len(self._mocap_dof):
                qvel = qvel.at[self._mocap_dof].set(refv[6:])
        # Wings retracted to springrefs (reference walk_imitation.py:124).
        if len(self.tables.wing_qpos_idx):
            qpos = qpos.at[self.tables.wing_qpos_idx].set(
                model.qpos_spring[self.tables.wing_qpos_idx])
        act = jnp.zeros((model.meta.na,), dtype)
        return qpos, qvel, act

    def ghost_qpos(self, task: WalkTask, step) -> jax.Array:
        """Full (nq,) pose of the reference 'ghost' fly at episode step.

        The functional analog of the reference ghost walker driven to the
        mocap pose each step (reference tasks/base.py:141-154,
        task_utils.py:124-153): root + mocap joints from the trajectory,
        remaining joints at qpos0, wings at springref (retracted)."""
        ref = self._ref(task, step, 1)[0]
        qpos = self.model.qpos0
        qpos = qpos.at[:7].set(ref[:7])
        if len(self._mocap_qpos):
            qpos = qpos.at[self._mocap_qpos].set(ref[7:])
        if len(self.tables.wing_qpos_idx):
            qpos = qpos.at[self.tables.wing_qpos_idx].set(
                self.model.qpos_spring[self.tables.wing_qpos_idx])
        return qpos

    def _before_step(self, state: envbase.EnvState, action):
        # NaN scrub (reference walk_imitation.py:148).
        action = jnp.where(jnp.isnan(action), jnp.zeros_like(action), action)
        return state.task, action

    def _observations(self, state, fkd, sensors_mean):
        obs = {}
        obs.update(self._obs_vestibular(fkd, sensors_mean))
        obs.update(self._obs_proprioception(state, fkd))
        obs.update(self._obs_appendages(fkd))
        obs.update(self._obs_force_touch(sensors_mean))
        window = self._ref(state.task, state.step_idx,
                           self.future_steps + 1)[:, :7]
        obs.update(self._obs_ref(state, fkd, window))
        obs.update(self._extra_observables(state, fkd, sensors_mean,
                                           self.extra_observables))
        return obs

    def _reward_factors(self, state, fkd):
        dtype = fkd.qpos.dtype
        if self.inference_mode:
            return jnp.ones((1,), dtype)
        task = state.task
        step = state.step_idx
        ref_qpos = self._ref(task, step, 1)[0]
        ref_qvel = jax.lax.dynamic_slice(
            self.store.qvel[task.traj_idx],
            (jnp.asarray(step, jnp.int32), jnp.zeros((), jnp.int32)),
            (1, self.store.qvel.shape[-1]))[0]
        ref_r2s = self.store.root2site[task.traj_idx, step]
        ref_jq = self.store.joint_quat[task.traj_idx, step]

        qpos = jnp.concatenate([fkd.qpos[:7], fkd.qpos[self._mocap_qpos]])
        qvel = jnp.concatenate(
            [state.data.qvel[:6], state.data.qvel[self._mocap_dof]])
        site_xpos = fkd.site_xpos[self._mocap_sites]
        # World axes of the mocap joints from FK.
        _, _, jnt_xaxis = self._joint_axes(fkd)
        wf = rewards_lib.walker_features(
            qpos, qvel, site_xpos, jnt_xaxis, fkd.qpos[self._mocap_qpos])
        rf = rewards_lib.reference_features(ref_qpos, ref_qvel, ref_r2s,
                                            ref_jq)
        factors = rewards_lib.reward_factors_deep_mimic(
            wf, rf, weights=(20.0, 1.0, 1.0, 1.0))
        # Wing retraction factor (reference walk_imitation.py:168-175).
        if len(self.tables.wing_qpos_idx):
            qdiff = (fkd.qpos[self.tables.wing_qpos_idx]
                     - self.model.qpos_spring[self.tables.wing_qpos_idx])
            retract = jnp.prod(
                rewards_lib.tolerance_linear(qdiff, margin=3.0))
            factors = jnp.concatenate([factors, retract[None]])
        return factors

    def _joint_axes(self, fkd):
        """World axes of mocap joints (from the position stage)."""
        if fkd.jnt_xaxis is not None:
            return fkd, fkd.jnt_xanchor, fkd.jnt_xaxis[self._mocap_jnt]
        from flybody_tpu.physics import kinematics as kin
        data2, xanchor, xaxis = kin.kinematics(self.model,
                                               fkd.replace())
        return data2, xanchor, xaxis[self._mocap_jnt]

    def _check_termination(self, state, fkd, obs):
        linvel = jnp.linalg.norm(obs['walker/velocimeter'])
        angvel = jnp.linalg.norm(obs['walker/gyro'])
        com_dist = jnp.linalg.norm(obs['walker/ref_displacement'][0])
        reached_end = state.step_idx >= state.task.episode_steps
        qacc_huge = envbase.exceeds(jnp.linalg.norm(state.data.qacc),
                                    envbase.TERMINAL_QACC)
        terminate = (envbase.exceeds(linvel, envbase.TERMINAL_LINVEL)
                     | envbase.exceeds(angvel, envbase.TERMINAL_ANGVEL)
                     | reached_end
                     | envbase.exceeds(com_dist, self.terminal_com_dist)
                     | qacc_huge)
        return terminate, reached_end
