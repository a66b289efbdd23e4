"""Actors: functional action selection with optional sensorimotor delay.

The reference's `DelayedFeedForwardActor` (reference
flybody/agents/actors.py:21-104) supports two experiment hooks used in the
paper's sensorimotor-delay studies:

  * `action_delay`: actions are queued and the action EXECUTED at step t
    is the one SELECTED at step t - delay (zeros while the queue fills);
  * `observation_callback`: arbitrary preprocessing of the observation
    before it reaches the policy.

This module provides the jit/vmap-friendly equivalent: the queue is a
fixed-size ring carried in an explicit `DelayedActorState`, so the actor
composes with lax.scan rollouts and batched environments.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class DelayedActorState(NamedTuple):
    queue: jax.Array  # (delay, action_dim) pending actions, FIFO
    filled: jax.Array  # int32, how many slots are valid


def init_delayed_state(action_delay: int, action_dim: int,
                       dtype=jnp.float32) -> DelayedActorState:
    return DelayedActorState(
        queue=jnp.zeros((max(action_delay, 1), action_dim), dtype),
        filled=jnp.zeros((), jnp.int32))


def make_delayed_actor(policy_fn: Callable[[Any, jax.Array], Any],
                       action_delay: int = 0,
                       observation_callback: Callable | None = None,
                       stochastic: bool = True):
    """Returns `select_action(params, obs, rng, state) -> (action, state)`.

    `policy_fn(params, obs)` must return a distribution with
    .sample(rng)/.mode() (the repo's IndependentNormal). With
    action_delay == 0 the state passes through untouched. Semantics match
    reference actors.py:82-91: while the queue is filling, the executed
    action is zero; afterwards the executed action is the one selected
    `action_delay` steps ago.
    """

    def select_action(params, obs, rng, state: DelayedActorState):
        if observation_callback is not None:
            obs = observation_callback(obs)
        dist = policy_fn(params, obs)
        action = dist.sample(rng) if stochastic else dist.mode()
        if action_delay <= 0:
            return action, state
        # Ring-free FIFO: shift-down queue (delay is small, e.g. 1-10).
        head = state.queue[0]
        queue = jnp.concatenate([state.queue[1:], action[None]], axis=0)
        warming = state.filled < action_delay
        out = jnp.where(warming, jnp.zeros_like(action), head)
        # While warming, do not pop: insert at the first free slot.
        queue_warm = jax.lax.dynamic_update_slice(
            state.queue, action[None],
            (state.filled, jnp.zeros((), jnp.int32)))
        queue = jnp.where(warming, queue_warm, queue)
        filled = jnp.minimum(state.filled + 1, action_delay)
        return out, DelayedActorState(queue=queue, filled=filled)

    return select_action
