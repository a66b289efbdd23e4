"""Flight imitation task with wing-beat pattern generator.

Functional counterpart of the reference FlightImitationWBPG
(flybody/tasks/flight_imitation.py): the agent's single user action
modulates the WBPG wing-beat frequency; the WBPG position pattern is
converted to force control via action[wings] += (pattern - wing_qpos)
(reference flight_imitation.py:146-168); rewards are CoM-displacement,
root-quat and leg-retraction factors (reference :170-201).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from flybody_tpu.envs import base as envbase
from flybody_tpu.envs import rewards as rewards_lib
from flybody_tpu.envs import trajectories as traj_lib
from flybody_tpu.envs import wbpg as wbpg_lib
from flybody_tpu.model.spec import FlyModel
from flybody_tpu.utils import quaternions as quat


@struct.dataclass
class FlightTask:
    traj_idx: jax.Array  # int32
    start: jax.Array  # int32
    traj_timesteps: jax.Array  # int32, 'good' end step
    xy_offset: jax.Array  # (2,)
    wbpg: wbpg_lib.WBPGState


class FlightImitationEnv(envbase.FruitFlyEnv):
    """WBPG-based flight tracking (reference flight_imitation.py:16-223)."""

    def __init__(self, model: FlyModel, store: traj_lib.TrajectoryStore,
                 wbpg_tables: wbpg_lib.WBPGTables,
                 terminal_com_dist: float = 2.0,
                 future_steps: int = 5,
                 randomize_start_step: bool = True,
                 time_limit: float = 0.6,
                 **kwargs):
        super().__init__(model, num_user_actions=1,
                         control_timestep=2e-4, physics_timestep=5e-5,
                         time_limit=time_limit, **kwargs)
        self.store = store
        self.wbpg = wbpg_tables
        self.terminal_com_dist = terminal_com_dist
        self.future_steps = future_steps
        self.randomize_start = randomize_start_step
        tb = self.tables
        self._wing_action_idx = np.array(tb.action_indices['wings'])
        self._user_action_idx = tb.action_indices['user'][0]
        # wing joint qpos order must match the WBPG channel order
        # yaw,roll,pitch x left,right (model order is already that).

    def with_trajectory(self, com_qpos, com_qvel) -> 'FlightImitationEnv':
        """Returns a copy of this env serving exactly the given CoM
        trajectory — the functional analog of the reference
        InferenceFlightTrajectoryLoader.set_next_trajectory
        (trajectory_loaders.py:166-181); CoM converted to root frame like
        the HDF5 loader."""
        import copy
        com_qpos = np.array(com_qpos, dtype=np.float64)
        com_qvel = np.asarray(com_qvel)
        com_qpos[:, :2] -= com_qpos[0, :2]
        root = traj_lib.com2root(com_qpos[:, :3], com_qpos[:, 3:])
        qpos = np.concatenate([root, com_qpos[:, 3:]], axis=1)
        dtype = np.asarray(self.model.qpos0).dtype
        env = copy.copy(self)
        env.store = traj_lib.store_from_arrays([qpos], [com_qvel],
                                               dtype=dtype)
        return env

    # ------------------------------------------------------------------ task

    def _init_task(self, rng) -> FlightTask:
        r1, r2, r3 = jax.random.split(rng, 3)
        n = self.store.num_trajectories
        idx = jax.random.randint(r1, (), 0, n)
        length = self.store.lengths[idx]
        if self.randomize_start:
            start = jax.random.randint(r2, (), 0,
                                       jnp.maximum(length - 50, 1))
        else:
            start = jnp.zeros((), jnp.int32)
        xy = jax.lax.dynamic_slice(
            self.store.qpos[idx], (start, 0), (1, 7))[0, :2]
        traj_steps = jnp.minimum(length - start,
                                 self.max_steps).astype(jnp.int32)
        traj_steps = traj_steps - (self.future_steps + 1)
        phase = jax.random.uniform(r3, ())
        wstate, _, _ = wbpg_lib.reset(self.wbpg, phase)
        return FlightTask(traj_idx=idx.astype(jnp.int32),
                          start=start.astype(jnp.int32),
                          traj_timesteps=traj_steps, xy_offset=xy,
                          wbpg=wstate)

    def _ref_qpos(self, task: FlightTask, step, count: int):
        """Reference root qpos window [step, step+count), xy re-zeroed."""
        start = (task.start + step).astype(jnp.int32)
        w = jax.lax.dynamic_slice(
            self.store.qpos[task.traj_idx],
            (start, jnp.zeros((), jnp.int32)), (count, 7))
        return w.at[:, :2].add(-task.xy_offset)

    def _ref_qvel(self, task: FlightTask, step):
        start = (task.start + step).astype(jnp.int32)
        return jax.lax.dynamic_slice(
            self.store.qvel[task.traj_idx],
            (start, jnp.zeros((), jnp.int32)), (1, 6))[0]

    def _init_qpos_qvel_act(self, task: FlightTask, rng):
        dtype = self.model.qpos0.dtype
        model = self.model
        qpos = model.qpos0
        ref0 = self._ref_qpos(task, jnp.zeros((), jnp.int32), 1)[0]
        qpos = qpos.at[:7].set(ref0)
        # Wing joints from the WBPG at its initial phase.
        wtab = self.wbpg
        angles = wtab.traj[task.wbpg.freq_idx, task.wbpg.step]
        wvel = (wtab.traj[task.wbpg.freq_idx, task.wbpg.step + 1]
                - angles) / wtab.dt_ctrl
        qpos = qpos.at[self.tables.wing_qpos_idx].set(
            angles.astype(dtype))
        qvel = jnp.zeros((model.meta.nv,), dtype)
        qvel = qvel.at[self.tables.wing_dof_idx].set(wvel.astype(dtype))
        # Initialize linear CoM velocity only (reference :138-140).
        qvel = qvel.at[:3].set(self._ref_qvel(task, jnp.zeros((),
                                                              jnp.int32))[:3])
        # Retract legs if present.
        if len(self.tables.leg_qpos_idx):
            qpos = qpos.at[self.tables.leg_qpos_idx].set(
                model.qpos_spring[self.tables.leg_qpos_idx])
        act = jnp.zeros((model.meta.na,), dtype)
        return qpos, qvel, act

    def _before_step(self, state: envbase.EnvState, action):
        task = state.task
        dtype = action.dtype
        act_user = action[self._user_action_idx]
        ctrl_freq = self.wbpg.base_freq * (
            1.0 + self.wbpg.rel_freq_range * act_user)
        wstate, pattern = wbpg_lib.step(self.wbpg, task.wbpg, ctrl_freq)
        wing_qpos = state.data.qpos[self.tables.wing_qpos_idx]
        action = action.at[self._wing_action_idx].add(
            pattern.astype(dtype) - wing_qpos)
        return task.replace(wbpg=wstate), action

    def _observations(self, state, fkd, sensors_mean):
        obs = {}
        obs.update(self._obs_vestibular(fkd, sensors_mean))
        obs.update(self._obs_proprioception(state, fkd))
        window = self._ref_qpos(state.task, state.step_idx,
                                self.future_steps + 1)
        obs.update(self._obs_ref(state, fkd, window))
        obs.update(self._extra_observables(state, fkd, sensors_mean,
                                           self.extra_observables))
        return obs

    def _ref_com(self, task, step):
        ref = self._ref_qpos(task, step, 1)[0]
        return traj_lib.root2com(ref)

    def _reward_factors(self, state, fkd):
        dtype = fkd.qpos.dtype
        task = state.task
        model_com = fkd.subtree_com[self.tables.thorax_body]
        ref_com = self._ref_com(task, state.step_idx)
        disp = jnp.linalg.norm(ref_com - model_com)
        disp_f = rewards_lib.tolerance_linear(disp, margin=0.4)
        # Root-quat geodesic factor via the current dquat observation.
        fly_quat = fkd.qpos[3:7]
        ref_quat = self._ref_qpos(task, state.step_idx, 1)[0, 3:7]
        dq = quat.get_dquat_local(fly_quat, ref_quat)
        qdist = quat.quat_dist_short_arc(
            jnp.asarray([1.0, 0, 0, 0], dtype), dq)
        quat_f = rewards_lib.tolerance_linear(qdist, margin=jnp.pi)
        factors = [disp_f, quat_f]
        if len(self.tables.leg_qpos_idx):
            qdiff = (fkd.qpos[self.tables.leg_qpos_idx]
                     - self.model.qpos_spring[self.tables.leg_qpos_idx])
            retract = rewards_lib.tolerance_linear(qdiff, margin=4.0)
            factors.append(jnp.prod(retract))
        return jnp.stack(factors)

    def _check_termination(self, state, fkd, obs):
        height = fkd.xpos[self.tables.thorax_body, 2]
        com_dist = jnp.linalg.norm(obs['walker/ref_displacement'][0])
        reached_end = state.step_idx >= state.task.traj_timesteps
        qacc_huge = envbase.exceeds(jnp.linalg.norm(state.data.qacc),
                                    envbase.TERMINAL_QACC)
        terminate = (envbase.below(height, envbase.TERMINAL_HEIGHT)
                     | envbase.exceeds(com_dist, self.terminal_com_dist)
                     | reached_end | qacc_huge)
        return terminate, reached_end
