"""MPO loss with decoupled KL constraints, MO-MPO action penalization.

JAX port of the reference MPO loss math (flybody/agents/losses_mpo.py,
itself Acme's MPO): E-step softmax weights with a temperature dual, action
penalization as a second objective with its own penalty temperature,
decomposed fixed-mean/fixed-stddev M-step cross-entropy losses, and
per-dimension KL constraints with alpha duals.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from flybody_tpu.agents.distributions import IndependentNormal

MPO_FLOAT_EPSILON = 1e-8
MIN_LOG_DUAL = -18.0


class MPOParams(NamedTuple):
    log_temperature: jax.Array  # (1,)
    log_alpha_mean: jax.Array  # (D,)
    log_alpha_stddev: jax.Array  # (D,)
    log_penalty_temperature: jax.Array  # (1,)


def init_params(action_dim: int,
                init_log_temperature: float = 10.0,
                init_log_alpha_mean: float = 10.0,
                init_log_alpha_stddev: float = 1000.0,
                dtype=jnp.float32) -> MPOParams:
    return MPOParams(
        log_temperature=jnp.full((1,), init_log_temperature, dtype),
        log_alpha_mean=jnp.full((action_dim,), init_log_alpha_mean, dtype),
        log_alpha_stddev=jnp.full((action_dim,), init_log_alpha_stddev,
                                  dtype),
        log_penalty_temperature=jnp.full((1,), init_log_temperature, dtype),
    )


def clip_params(p: MPOParams) -> MPOParams:
    """Project dual variables (reference losses_mpo.py:221-229)."""
    return MPOParams(*[jnp.maximum(MIN_LOG_DUAL, x) for x in p])


def _weights_and_temperature_loss(q_values, epsilon, temperature):
    """(reference losses_mpo.py:371-405)"""
    tempered = jax.lax.stop_gradient(q_values) / temperature
    weights = jax.lax.stop_gradient(jax.nn.softmax(tempered, axis=0))
    q_logsumexp = jax.nn.logsumexp(tempered, axis=0)
    log_n = jnp.log(jnp.asarray(q_values.shape[0], q_values.dtype))
    loss = temperature * (epsilon + jnp.mean(q_logsumexp) - log_n)
    return weights, loss


def _cross_entropy_loss(actions, weights, dist: IndependentNormal):
    """(reference losses_mpo.py:420-446)"""
    log_prob = dist.log_prob(actions)  # (N, B)
    return jnp.mean(-jnp.sum(log_prob * weights, axis=0))


def _kl_penalty_and_dual_loss(kl, alpha, epsilon):
    """(reference losses_mpo.py:449-479)"""
    mean_kl = jnp.mean(kl, axis=0)  # (D,)
    loss_kl = jnp.sum(jax.lax.stop_gradient(alpha) * mean_kl)
    loss_alpha = jnp.sum(alpha * (epsilon - jax.lax.stop_gradient(mean_kl)))
    return loss_kl, loss_alpha


def penalization_cost_real_actions(actions, action_min, action_max):
    """MO-MPO cost on real (unwrapped) actions: -||a_real||
    (reference losses_mpo.py:22-64)."""
    scale = action_max - action_min
    real = 0.5 * (actions + 1.0) * scale + action_min
    return -jnp.linalg.norm(real, axis=-1)


def mpo_loss(params: MPOParams,
             online: IndependentNormal,
             target: IndependentNormal,
             actions: jax.Array,  # (N, B, D)
             q_values: jax.Array,  # (N, B)
             epsilon: float = 0.1,
             epsilon_mean: float = 0.0025,
             epsilon_stddev: float = 1e-7,
             epsilon_penalty: float = 0.1,
             action_penalization: bool = True,
             penalization_cost=None,
             train_stddev: bool = True):
    """Decoupled MPO loss (reference losses_mpo.py:175-368).

    Defaults follow the reference DMPO setup
    (network_factory.policy_loss_module_dmpo, reference
    network_factory.py:140-163).

    train_stddev=False drops the stddev arm of the decomposed M-step
    (loss_policy_stddev, the stddev KL penalty, and its alpha dual).
    Use for controller-reuse training where the policy's stddev comes
    from a FROZEN low-level head: the stddev-KL constraint is then
    unsatisfiable, its dual grows without bound (measured
    alpha_stddev 1000 -> 2500+ in the round-5 HL runs), and the
    resulting KL penalty term drowns the reward-seeking mean loss.
    """
    dtype = q_values.dtype
    temperature = jax.nn.softplus(params.log_temperature)[0] \
        + MPO_FLOAT_EPSILON
    alpha_mean = jax.nn.softplus(params.log_alpha_mean) + MPO_FLOAT_EPSILON
    alpha_stddev = jax.nn.softplus(params.log_alpha_stddev) \
        + MPO_FLOAT_EPSILON

    weights, loss_temperature = _weights_and_temperature_loss(
        q_values, jnp.asarray(epsilon, dtype), temperature)
    kl_nonparametric = jnp.sum(
        weights * jnp.log(q_values.shape[0] * weights + 1e-8), axis=0)

    if action_penalization:
        penalty_temperature = jax.nn.softplus(
            params.log_penalty_temperature)[0] + MPO_FLOAT_EPSILON
        if penalization_cost is None:
            cost = -jnp.linalg.norm(actions, axis=-1)  # (N, B)
        else:
            cost = penalization_cost(actions)
        pweights, ploss_temp = _weights_and_temperature_loss(
            cost, jnp.asarray(epsilon_penalty, dtype), penalty_temperature)
        weights = weights + pweights
        loss_temperature = loss_temperature + ploss_temp

    # Decomposed M-step distributions.
    fixed_stddev = IndependentNormal(mean=online.mean, stddev=target.stddev)
    fixed_mean = IndependentNormal(mean=target.mean, stddev=online.stddev)

    loss_policy_mean = _cross_entropy_loss(actions, weights, fixed_stddev)
    loss_policy_stddev = _cross_entropy_loss(actions, weights, fixed_mean)

    kl_mean = target.kl_divergence_per_dim(fixed_stddev)  # (B, D)
    kl_stddev = target.kl_divergence_per_dim(fixed_mean)  # (B, D)

    loss_kl_mean, loss_alpha_mean = _kl_penalty_and_dual_loss(
        kl_mean, alpha_mean, jnp.asarray(epsilon_mean, dtype))
    loss_kl_stddev, loss_alpha_stddev = _kl_penalty_and_dual_loss(
        kl_stddev, alpha_stddev, jnp.asarray(epsilon_stddev, dtype))

    if not train_stddev:
        zero = jnp.zeros((), dtype)
        loss_policy_stddev = zero
        loss_kl_stddev = zero
        loss_alpha_stddev = zero

    loss = (loss_policy_mean + loss_policy_stddev
            + loss_kl_mean + loss_kl_stddev
            + loss_alpha_mean + loss_alpha_stddev + loss_temperature)

    stats = {
        'dual_temperature': temperature,
        'dual_alpha_mean': jnp.mean(alpha_mean),
        'dual_alpha_stddev': jnp.mean(alpha_stddev),
        'loss_policy': loss_policy_mean + loss_policy_stddev,
        'loss_temperature': loss_temperature,
        'kl_q_rel': jnp.mean(kl_nonparametric) / epsilon,
        'kl_mean_rel': jnp.mean(kl_mean) / epsilon_mean,
        'kl_stddev_rel': jnp.mean(kl_stddev) / max(epsilon_stddev, 1e-12),
        'q_min': jnp.mean(jnp.min(q_values, axis=0)),
        'q_max': jnp.mean(jnp.max(q_values, axis=0)),
        'pi_stddev_min': jnp.mean(jnp.min(online.stddev, axis=-1)),
        'pi_stddev_max': jnp.mean(jnp.max(online.stddev, axis=-1)),
    }
    return loss, stats
