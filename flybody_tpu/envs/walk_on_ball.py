"""Tethered fly walking on a floating ball, plus the no-op template task.

Functional counterparts of the reference WalkOnBall
(flybody/tasks/walk_on_ball.py) and TemplateTask
(flybody/tasks/template_task.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from flybody_tpu.envs import base as envbase
from flybody_tpu.envs import rewards as rewards_lib
from flybody_tpu.model.spec import FlyModel


class TemplateEnv(envbase.FruitFlyEnv):
    """No-op walking task for testing/extension
    (reference template_task.py:12-101)."""

    def __init__(self, model: FlyModel, time_limit: float = 1.0,
                 action_corruptor=None, control_callback=None, **kwargs):
        super().__init__(model, control_timestep=2e-3,
                         physics_timestep=2e-4, time_limit=time_limit,
                         **kwargs)
        self.action_corruptor = action_corruptor
        # Per-substep physics hook (mjcb_control analogue).
        self.control_callback = control_callback

    def _before_step(self, state, action):
        if self.action_corruptor is not None:
            action = self.action_corruptor(action, state.rng)
        return state.task, action

    def _observations(self, state, fkd, sensors_mean):
        obs = {}
        obs.update(self._obs_vestibular(fkd, sensors_mean))
        obs.update(self._obs_proprioception(state, fkd))
        obs.update(self._obs_appendages(fkd))
        obs.update(self._obs_force_touch(sensors_mean))
        obs.update(self._extra_observables(state, fkd, sensors_mean,
                                           self.extra_observables))
        return obs


class WalkOnBallEnv(envbase.FruitFlyEnv):
    """Tethered fly on a floating ball (reference walk_on_ball.py:15-91).

    The fly's freejoint is removed (thorax welded to the world); the ball
    has a 3-dof ball joint; reward = tolerance(ball_qvel - (0, -5, 0),
    margin 6).
    """

    def __init__(self, model: FlyModel, time_limit: float = 2.0, **kwargs):
        super().__init__(model, control_timestep=2e-3,
                         physics_timestep=2e-4, time_limit=time_limit,
                         **kwargs)
        meta = model.meta
        jid = meta.jnt_names.index('ball')
        self._ball_dof = meta.jnt_dofadr[jid]

    def _root_pose(self, fkd):
        # Tethered: no free joint; root pose is the (fixed) thorax frame.
        b = self.tables.thorax_body
        from flybody_tpu.utils.quaternions import mat_to_quat
        return fkd.xpos[b], fkd.xquat[b]

    def _ball_qvel(self, state):
        return jax.lax.dynamic_slice(state.data.qvel,
                                     (self._ball_dof,), (3,))

    def _observations(self, state, fkd, sensors_mean):
        obs = {}
        obs.update(self._obs_vestibular(fkd, sensors_mean))
        obs.update(self._obs_proprioception(state, fkd))
        obs.update(self._obs_appendages(fkd))
        obs.update(self._obs_force_touch(sensors_mean))
        obs['walker/ball_qvel'] = self._ball_qvel(state)
        obs.update(self._extra_observables(state, fkd, sensors_mean,
                                           self.extra_observables))
        return obs

    def _reward_factors(self, state, fkd):
        dtype = fkd.qpos.dtype
        target = jnp.asarray([0.0, -5.0, 0.0], dtype)
        qvel = self._ball_qvel(state)
        return rewards_lib.tolerance_linear(qvel - target, margin=6.0)

    def _check_termination(self, state, fkd, obs):
        linvel = jnp.linalg.norm(obs['walker/velocimeter'])
        angvel = jnp.linalg.norm(obs['walker/gyro'])
        qacc_huge = jnp.linalg.norm(state.data.qacc) > envbase.TERMINAL_QACC
        terminate = ((linvel > envbase.TERMINAL_LINVEL)
                     | (angvel > envbase.TERMINAL_ANGVEL) | qacc_huge)
        return terminate, jnp.zeros((), bool)
