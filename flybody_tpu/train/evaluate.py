"""Policy evaluation: batched mean-policy rollouts with return stats.

Counterpart of the reference evaluator EnvironmentLoop
(flybody/agents/ray_distributed_dmpo.py:232-340 with
DelayedFeedForwardActor in 'mean' mode): runs N envs for full episodes
under the deterministic (mean) policy and reports per-episode return and
length statistics.

Two drive modes:
  * `evaluate(...)` — one jit'd scan over all control steps (jittable,
    composable).
  * `evaluate(..., chunk=N)` — host-chunked: the same scan split into
    <=N-step device programs driven from the host, with early exit once
    every episode has terminated. This is the library form of the
    "<=500 scanned engine steps per program" rule: single device
    programs scanning thousands of env steps reproducibly crash the
    axon TPU worker (vision episodes are 2000 control steps), and
    chunked programs run clean. Must be called OUTSIDE jit.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from flybody_tpu.agents import networks as nets_lib
from flybody_tpu.envs.base import FruitFlyEnv, LAST

# Scanned control steps per device program in chunked mode. Empirical
# axon worker bound (PROGRESS round-3 platform notes): 3000-step scans
# fault, <=500 run clean; 250 leaves margin for vision's 4-substep,
# eye-rendering steps.
DEFAULT_CHUNK = 250


def _rollout_pieces(env: FruitFlyEnv, policy_apply, policy_params,
                    num_envs: int, stochastic: bool):
    """Shared reset/step-body builders for both drive modes."""
    dtype = jnp.asarray(env.model.qpos0).dtype
    # The policy acts in the canonical [-1, 1] space (the critic clips
    # there, reference network_factory.py:95-100); env.step takes REAL
    # actions — map exactly as the trainer's behavior policy does.
    lo = jnp.asarray(env.action_min, dtype)
    hi = jnp.asarray(env.action_max, dtype)

    def start(r):
        rngs = jax.random.split(r, num_envs)
        states, ts = jax.vmap(env.reset)(rngs)
        obs = nets_lib.batch_concat(ts.observation, batched=True)
        return (states, obs, jnp.zeros((num_envs,), dtype),
                jnp.zeros((num_envs,), jnp.int32),
                jnp.zeros((num_envs,), bool))

    # scan-over-time of vmap(env.step) — same batching commutation as the
    # trainer; vmap(scan(step)) trips the stage-fusion kernels'
    # custom_vmap rules on TPU (tracer-as-constant in the scanned jaxpr).
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

    return start, body


def _stats(rets, lengths, dones, num_envs: int) -> dict:
    return {
        'episode_return_mean': jnp.mean(rets),
        'episode_return_min': jnp.min(rets),
        'episode_return_max': jnp.max(rets),
        'episode_length_mean': jnp.mean(lengths.astype(jnp.float32)),
        'episodes_terminated': jnp.sum(dones.astype(jnp.int32)),
        'num_envs': num_envs,
    }


def evaluate(env: FruitFlyEnv, policy_apply, policy_params, rng,
             num_envs: int = 64, stochastic: bool = False,
             max_steps: int | None = None,
             chunk: int | None = None) -> dict:
    """Runs one full episode per env; returns aggregate stats.

    Args:
        env: functional fly environment.
        policy_apply: callable (params, obs_flat) -> distribution.
        policy_params: policy parameters pytree.
        stochastic: sample the policy instead of taking the mean
            (reference actor vs evaluator distinction).
        max_steps: cap on control steps (default env.max_steps).
        chunk: if set, run host-chunked (<=chunk steps per device
            program, early exit when all episodes end). NOT jittable.
    """
    steps = max_steps or env.max_steps
    start, body = _rollout_pieces(env, policy_apply, policy_params,
                                  num_envs, stochastic)
    r_reset, r_act = jax.random.split(rng)

    if chunk and chunk < steps:
        run_chunk = jax.jit(
            lambda carry, rs: jax.lax.scan(body, carry, rs)[0])
        carry = jax.jit(start)(r_reset)
        rs = jax.random.split(r_act, steps)
        # A shorter tail chunk costs one extra compile but keeps the
        # step count exact (padding would overcount unfinished
        # episodes' returns when max_steps < env.max_steps).
        for i in range(0, steps, chunk):
            carry = run_chunk(carry, rs[i:i + chunk])
            if bool(np.asarray(carry[-1]).all()):
                break  # every episode terminated
        _, _, rets, lengths, dones = carry
        return {k: (float(v) if jnp.ndim(v) == 0 else v)
                for k, v in _stats(rets, lengths, dones,
                                   num_envs).items()}

    init = start(r_reset)
    rs = jax.random.split(r_act, steps)
    (states, obs, rets, lengths, dones), _ = jax.lax.scan(body, init, rs)
    return _stats(rets, lengths, dones, num_envs)


def evaluate_learner(env: FruitFlyEnv, trainer, train_state, rng,
                     num_envs: int = 64, **kwargs) -> dict:
    """Evaluates a DMPOTrainer's current target policy (the acting policy,
    reference learning_dmpo.py get_variables serving target nets)."""
    learner = trainer.learner
    if kwargs.get('chunk'):
        stats = evaluate(env, learner.policy.apply,
                         train_state.learner.target_policy_params,
                         rng, num_envs=num_envs, **kwargs)
        return {k: (float(v) if jnp.ndim(v) == 0 else v)
                for k, v in stats.items()}
    fn = jax.jit(functools.partial(
        evaluate, env, learner.policy.apply,
        train_state.learner.target_policy_params,
        num_envs=num_envs, **kwargs))
    return {k: (float(v) if jnp.ndim(v) == 0 else v)
            for k, v in fn(rng).items()}
