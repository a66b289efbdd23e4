"""Policy evaluation: batched mean-policy rollouts with return stats.

Counterpart of the reference evaluator EnvironmentLoop
(flybody/agents/ray_distributed_dmpo.py:232-340 with
DelayedFeedForwardActor in 'mean' mode): runs N envs for full episodes
under the deterministic (mean) policy and reports per-episode return and
length statistics. Fully on-device: one jit'd scan over control steps.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from flybody_tpu.agents import networks as nets_lib
from flybody_tpu.envs.base import FruitFlyEnv, LAST


def evaluate(env: FruitFlyEnv, policy_apply, policy_params, rng,
             num_envs: int = 64, stochastic: bool = False,
             max_steps: int | None = None) -> dict:
    """Runs one full episode per env; returns aggregate stats.

    Args:
        env: functional fly environment.
        policy_apply: callable (params, obs_flat) -> distribution.
        policy_params: policy parameters pytree.
        stochastic: sample the policy instead of taking the mean
            (reference actor vs evaluator distinction).
    """
    steps = max_steps or env.max_steps
    dtype = jnp.asarray(env.model.qpos0).dtype

    # scan-over-time of vmap(env.step) — same batching commutation as the
    # trainer; vmap(scan(step)) trips the stage-fusion kernels'
    # custom_vmap rules on TPU (tracer-as-constant in the scanned jaxpr).
    r_reset, r_act = jax.random.split(rng)
    rngs = jax.random.split(r_reset, num_envs)
    states, ts = jax.vmap(env.reset)(rngs)
    obs = nets_lib.batch_concat(ts.observation, batched=True)

    # The policy acts in the canonical [-1, 1] space (the critic clips
    # there, reference network_factory.py:95-100); env.step takes REAL
    # actions — map exactly as the trainer's behavior policy does.
    lo = jnp.asarray(env.action_min, dtype)
    hi = jnp.asarray(env.action_max, dtype)

    def body(carry, r):
        states, obs, ret, length, done = carry
        dist = policy_apply(policy_params, obs.astype(jnp.float32))
        if stochastic:
            actions = dist.sample(r)
        else:
            actions = dist.mean
        actions = jnp.clip(actions, -1.0, 1.0).astype(dtype)
        real = 0.5 * (actions + 1.0) * (hi - lo) + lo
        states, ts = jax.vmap(env.step)(states, real)
        new_obs = nets_lib.batch_concat(ts.observation, batched=True)
        live = ~done
        ret = ret + live * ts.reward
        length = length + live.astype(jnp.int32)
        done = done | (ts.step_type == LAST)
        return (states, new_obs, ret, length, done), None

    init = (states, obs, jnp.zeros((num_envs,), dtype),
            jnp.zeros((num_envs,), jnp.int32),
            jnp.zeros((num_envs,), bool))
    rs = jax.random.split(r_act, steps)
    (states, obs, rets, lengths, dones), _ = jax.lax.scan(body, init, rs)
    return {
        'episode_return_mean': jnp.mean(rets),
        'episode_return_min': jnp.min(rets),
        'episode_return_max': jnp.max(rets),
        'episode_length_mean': jnp.mean(lengths.astype(jnp.float32)),
        'episodes_terminated': jnp.sum(dones.astype(jnp.int32)),
        'num_envs': num_envs,
    }


def evaluate_learner(env: FruitFlyEnv, trainer, train_state, rng,
                     num_envs: int = 64, **kwargs) -> dict:
    """Evaluates a DMPOTrainer's current target policy (the acting policy,
    reference learning_dmpo.py get_variables serving target nets)."""
    learner = trainer.learner
    fn = jax.jit(functools.partial(
        evaluate, env, learner.policy.apply,
        train_state.learner.target_policy_params,
        num_envs=num_envs, **kwargs))
    return {k: (float(v) if jnp.ndim(v) == 0 else v)
            for k, v in fn(rng).items()}
