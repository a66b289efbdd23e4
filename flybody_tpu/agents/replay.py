"""HBM-resident replay: ring buffer + uniform sampling as pure JAX ops.

Replaces the reference's Reverb C++ replay server (reference
flybody/agents/agent_dmpo.py:109-163): transitions live in device memory,
inserts are dynamic scatters, samples are uniform gathers. The
SampleToInsertRatio rate limiter becomes a static insert/sample schedule in
the training loop (see flybody_tpu/train/train_dmpo.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Transition(NamedTuple):
    obs: jax.Array  # (..., obs_dim) flat observation
    action: jax.Array  # (..., act_dim)
    reward: jax.Array  # (...,) n-step return
    discount: jax.Array  # (...,) product of discounts * gamma^n
    next_obs: jax.Array  # (..., obs_dim)


class ReplayState(NamedTuple):
    data: Transition  # (capacity, ...)
    insert_pos: jax.Array  # int32
    size: jax.Array  # int32
    inserts: jax.Array  # int64 counters for the rate ledger
    samples: jax.Array


def init(capacity: int, obs_dim: int, act_dim: int,
         dtype=jnp.float32) -> ReplayState:
    data = Transition(
        obs=jnp.zeros((capacity, obs_dim), dtype),
        action=jnp.zeros((capacity, act_dim), dtype),
        reward=jnp.zeros((capacity,), dtype),
        discount=jnp.zeros((capacity,), dtype),
        next_obs=jnp.zeros((capacity, obs_dim), dtype),
    )
    return ReplayState(data=data,
                       insert_pos=jnp.zeros((), jnp.int32),
                       size=jnp.zeros((), jnp.int32),
                       inserts=jnp.zeros((), jnp.int32),
                       samples=jnp.zeros((), jnp.int32))


def insert(state: ReplayState, batch: Transition) -> ReplayState:
    """Insert a batch of transitions (FIFO ring semantics).

    The write is a contiguous dynamic_update_slice (TPU-friendly: large
    sorted scatters crash the TPU compiler), so the capacity must be a
    multiple of the insert block size — blocks then never wrap.
    """
    capacity = state.data.obs.shape[0]
    n = batch.obs.shape[0]
    if capacity % n != 0:
        raise ValueError(
            f'replay capacity ({capacity}) must be a multiple of the '
            f'insert block size ({n}); pad or adjust num_envs * '
            f'(rollout_length - n_step + 1).')

    def upd(arr, new):
        start = ((state.insert_pos,)
                 + (jnp.zeros((), jnp.int32),) * (arr.ndim - 1))
        return jax.lax.dynamic_update_slice(arr, new, start)

    data = Transition(*[upd(a, b) for a, b in zip(state.data, batch)])
    return ReplayState(
        data=data,
        insert_pos=(state.insert_pos + n) % capacity,
        size=jnp.minimum(state.size + n, capacity),
        inserts=state.inserts + n,
        samples=state.samples)


def sample(state: ReplayState, rng, batch_size: int):
    """Uniform sample of `batch_size` transitions."""
    idx = jax.random.randint(rng, (batch_size,), 0,
                             jnp.maximum(state.size, 1))
    batch = Transition(*[arr[idx] for arr in state.data])
    new_state = state._replace(samples=state.samples + batch_size)
    return new_state, batch


def n_step_transitions(obs, next_obs, actions, rewards, discounts, dones,
                       n_step: int, gamma: float):
    """Assemble overlapping n-step transitions from a rollout segment.

    Windows never cross episode boundaries: like the reference's Acme
    NStepTransitionAdder, a window starting at t stops accumulating at the
    first step with done=True, so `next_obs` is the TERMINAL observation
    (pre-reset) of that episode and the bootstrap discount carries the
    terminal step's dm_env discount (0 on fatal termination, 1 on
    timeout/good-end truncation, where bootstrapping from the terminal
    observation is correct).

    Args:
        obs: (T, B, obs_dim) pre-step observations o_t (the obs the action
            was computed from; post-reset at episode starts).
        next_obs: (T, B, obs_dim) post-step observations o_{t+1} BEFORE any
            auto-reset (terminal obs at done steps).
        actions: (T, B, act_dim).
        rewards: (T, B).
        discounts: (T, B) per-step dm_env discounts.
        dones: (T, B) bool, True at episode-ending steps.
        n_step: the N in N-step returns (reference DMPOConfig n_step=5).
        gamma: discount factor.

    Returns:
        Transition with leading dim (T - n_step + 1) * B: for each start t,
        with m = min(n, steps until first done inclusive),
        R = sum_{k<m} r_{t+k} * prod_{i<k}(gamma * d_{t+i}),
        D = prod_{k<m} (gamma * d_{t+k}), next_obs = o_{t+m}.
    """
    T = actions.shape[0]
    num = T - n_step + 1
    starts = jnp.arange(num)

    def make(t):
        B = rewards.shape[1]
        R = jnp.zeros(B, rewards.dtype)
        D = jnp.ones(B, rewards.dtype)
        ended = jnp.zeros(B, bool)
        next_o = next_obs[t]
        for k in range(n_step):
            active = ~ended
            act_f = active.astype(rewards.dtype)
            R = R + act_f * D * rewards[t + k]
            D = D * jnp.where(active, gamma * discounts[t + k], 1.0)
            next_o = jnp.where(active[:, None], next_obs[t + k], next_o)
            ended = ended | dones[t + k]
        return Transition(obs=obs[t], action=actions[t], reward=R,
                          discount=D, next_obs=next_o)

    trans = jax.vmap(make)(starts)  # leading dims (num, B, ...)
    return Transition(*[x.reshape((-1,) + x.shape[2:]) for x in trans])
