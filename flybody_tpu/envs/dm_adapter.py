"""dm_env adapter: single-env, numpy-in/numpy-out wrapper.

Gives the functional envs the same user-facing API as the reference
composer environments (dm_env.TimeStep protocol, observation_spec /
action_spec, control_timestep), so reference users can switch directly.
Batched TPU training should use the functional env (reset/step under
jit+vmap) instead.
"""

from __future__ import annotations

import collections

import dm_env
import jax
import numpy as np
from dm_env import specs

from flybody_tpu.envs.base import FIRST, LAST, FruitFlyEnv


class DmFlyEnv(dm_env.Environment):
    """Wraps a functional FruitFlyEnv as a dm_env.Environment."""

    def __init__(self, env: FruitFlyEnv, obs_order, seed: int | None = None):
        self._env = env
        self._obs_order = list(obs_order)
        self._rng = jax.random.PRNGKey(np.random.randint(2**31)
                                       if seed is None else seed)
        self._reset_fn = jax.jit(env.reset)
        self._step_fn = jax.jit(env.step)
        self._state = None
        self._needs_reset = True

    # dm_env API ------------------------------------------------------------

    def reset(self) -> dm_env.TimeStep:
        self._rng, sub = jax.random.split(self._rng)
        self._state, ts = self._reset_fn(sub)
        self._needs_reset = False
        return dm_env.TimeStep(dm_env.StepType.FIRST, None, None,
                               self._np_obs(ts.observation))

    def step(self, action) -> dm_env.TimeStep:
        if self._needs_reset:
            return self.reset()
        self._state, ts = self._step_fn(self._state,
                                        np.asarray(action))
        step_type = int(ts.step_type)
        if step_type == LAST:
            self._needs_reset = True
            st = dm_env.StepType.LAST
        else:
            st = dm_env.StepType.MID
        return dm_env.TimeStep(st, float(ts.reward), float(ts.discount),
                               self._np_obs(ts.observation))

    def observation_spec(self):
        spec_shapes = self._env.observation_spec()
        out = collections.OrderedDict()
        for name in self._obs_order:
            s = spec_shapes[name]
            out[name] = specs.Array(shape=s.shape, dtype=np.float64,
                                    name=name)
        return out

    def action_spec(self):
        a = self._env.action_spec()
        return specs.BoundedArray(shape=a['shape'], dtype=float,
                                  minimum=a['minimum'], maximum=a['maximum'],
                                  name=a['name'])

    def control_timestep(self) -> float:
        return self._env.control_timestep

    def physics_timestep(self) -> float:
        return self._env.physics_timestep

    @property
    def functional_env(self) -> FruitFlyEnv:
        return self._env

    def _np_obs(self, obs):
        return collections.OrderedDict(
            (name, np.asarray(obs[name])) for name in self._obs_order)
