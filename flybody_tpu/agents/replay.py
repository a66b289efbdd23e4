"""HBM-resident replay: ring buffer + uniform sampling as pure JAX ops.

Replaces the reference's Reverb C++ replay server (reference
flybody/agents/agent_dmpo.py:109-163): transitions live in device memory,
inserts are dynamic scatters, samples are uniform gathers. The
SampleToInsertRatio rate limiter becomes a static insert/sample schedule in
the training loop (see flybody_tpu/train/train_dmpo.py).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


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
    # Optional uint8 side-banks for pixel observation dims (vision
    # tasks: the 2x32x32 eye images are 0..255 grayscale; storing them
    # as uint8 cuts replay HBM ~3x). When used, data.obs/next_obs hold
    # only the float dims; insert/sample quantize/reassemble.
    obs_u8: Any = None  # (capacity, n_u8) uint8
    next_obs_u8: Any = None


@functools.lru_cache(maxsize=16)
def _u8_split(obs_dim: int, u8_idx: tuple):
    u8 = np.asarray(u8_idx, np.int64)
    f32 = np.setdiff1d(np.arange(obs_dim), u8)
    perm = np.concatenate([f32, u8])
    inv = np.empty(obs_dim, np.int64)
    inv[perm] = np.arange(obs_dim)
    return f32, u8, inv


def encode_obs(obs, obs_dim: int, u8_idx: tuple):
    f32i, u8i, _ = _u8_split(obs_dim, u8_idx)
    x8 = jnp.clip(jnp.round(obs[..., u8i]), 0, 255).astype(jnp.uint8)
    return obs[..., f32i], x8


def decode_obs(obs_f, obs_u8, obs_dim: int, u8_idx: tuple, dtype):
    _, _, inv = _u8_split(obs_dim, u8_idx)
    full = jnp.concatenate([obs_f, obs_u8.astype(dtype)], axis=-1)
    return full[..., inv]


def init(capacity: int, obs_dim: int, act_dim: int,
         dtype=jnp.float32, u8_idx: tuple = ()) -> ReplayState:
    n_u8 = len(u8_idx)
    nf = obs_dim - n_u8
    data = Transition(
        obs=jnp.zeros((capacity, nf), dtype),
        action=jnp.zeros((capacity, act_dim), dtype),
        reward=jnp.zeros((capacity,), dtype),
        discount=jnp.zeros((capacity,), dtype),
        next_obs=jnp.zeros((capacity, nf), dtype),
    )
    u8 = (jnp.zeros((capacity, n_u8), jnp.uint8) if n_u8 else None)
    u8b = (jnp.zeros((capacity, n_u8), jnp.uint8) if n_u8 else None)
    return ReplayState(data=data,
                       insert_pos=jnp.zeros((), jnp.int32),
                       size=jnp.zeros((), jnp.int32),
                       inserts=jnp.zeros((), jnp.int32),
                       samples=jnp.zeros((), jnp.int32),
                       obs_u8=u8, next_obs_u8=u8b)


def insert(state: ReplayState, batch: Transition,
           u8_idx: tuple = ()) -> ReplayState:
    """Insert a batch of transitions (FIFO ring semantics).

    The write is a contiguous dynamic_update_slice (TPU-friendly: large
    sorted scatters crash the TPU compiler), so the capacity must be a
    multiple of the insert block size — blocks then never wrap.
    """
    capacity = state.data.obs.shape[0]
    n = batch.obs.shape[0]
    u8_banks = {}
    if state.obs_u8 is not None:
        obs_dim = batch.obs.shape[-1]
        obs_f, obs_8 = encode_obs(batch.obs, obs_dim, u8_idx)
        nxt_f, nxt_8 = encode_obs(batch.next_obs, obs_dim, u8_idx)
        batch = batch._replace(obs=obs_f, next_obs=nxt_f)
        u8_banks = dict(obs_8=obs_8, nxt_8=nxt_8)
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
    obs_u8, next_obs_u8 = state.obs_u8, state.next_obs_u8
    if u8_banks:
        obs_u8 = upd(obs_u8, u8_banks['obs_8'])
        next_obs_u8 = upd(next_obs_u8, u8_banks['nxt_8'])
    return ReplayState(
        data=data,
        insert_pos=(state.insert_pos + n) % capacity,
        size=jnp.minimum(state.size + n, capacity),
        inserts=state.inserts + n,
        samples=state.samples,
        obs_u8=obs_u8, next_obs_u8=next_obs_u8)


def sample(state: ReplayState, rng, batch_size: int,
           u8_idx: tuple = ()):
    """Uniform sample of `batch_size` transitions."""
    idx = jax.random.randint(rng, (batch_size,), 0,
                             jnp.maximum(state.size, 1))
    batch = Transition(*[arr[idx] for arr in state.data])
    if state.obs_u8 is not None:
        dtype = batch.obs.dtype
        obs_dim = batch.obs.shape[-1] + state.obs_u8.shape[-1]
        batch = batch._replace(
            obs=decode_obs(batch.obs, state.obs_u8[idx], obs_dim,
                           u8_idx, dtype),
            next_obs=decode_obs(batch.next_obs, state.next_obs_u8[idx],
                                obs_dim, u8_idx, dtype))
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
