"""DMPO networks: LayerNormMLP policy and distributional critic (flax).

Matches the reference architecture (flybody/agents/network_factory.py):
  policy: batch_concat(obs) -> LayerNormMLP(256, 256, 256)
          -> MultivariateNormalDiagHead(init_scale=0.7, min_scale=1e-6)
  critic: concat(batch_concat(obs), clip(action)) ->
          LayerNormMLP(512, 512, 256) -> DiscreteValuedHead(-150, 150, 51)

The observation dict is flattened in sorted-name order, reproducing Acme's
tf2_utils.batch_concat contract (reference tasks/task_utils.py:12-25).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from flybody_tpu.agents.distributions import (DiscreteValuedDistribution,
                                              IndependentNormal)

VMIN, VMAX, NUM_ATOMS = -150.0, 150.0, 51


def batch_concat(obs: dict, batched: bool | None = None) -> jax.Array:
    """Flatten an observation dict in sorted-name order (acme contract).

    `batched=None` infers batching from the presence of rank-3 entries
    (the ref-preview observables); pass it explicitly for dicts that
    contain only vector observables.
    """
    names = sorted(obs.keys())
    if batched is None:
        batched = any(obs[n].ndim > 2 for n in names)
    flat = []
    for n in names:
        x = obs[n]
        if batched:
            flat.append(x.reshape(x.shape[0], -1))
        else:
            flat.append(x.reshape(-1))
    return jnp.concatenate(flat, axis=-1)


class LayerNormMLP(nn.Module):
    """Acme-style LayerNormMLP: first layer -> LayerNorm -> tanh, then
    elu-activated layers (reference acme networks; used at
    network_factory.py:82-93)."""

    layer_sizes: Sequence[int]
    activate_final: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.layer_sizes[0],
                     kernel_init=nn.initializers.variance_scaling(
                         1.0 / 3.0, 'fan_in', 'uniform'))(x)
        x = nn.LayerNorm()(x)
        x = jnp.tanh(x)
        for i, size in enumerate(self.layer_sizes[1:]):
            x = nn.Dense(size, kernel_init=nn.initializers.variance_scaling(
                1.0 / 3.0, 'fan_in', 'uniform'))(x)
            if i < len(self.layer_sizes) - 2 or self.activate_final:
                x = nn.elu(x)
        return x


class PolicyNetwork(nn.Module):
    """LayerNormMLP + MultivariateNormalDiag head."""

    action_size: int
    layer_sizes: Sequence[int] = (256, 256, 256)
    init_scale: float = 0.7
    min_scale: float = 1e-6

    @nn.compact
    def __call__(self, obs_flat) -> IndependentNormal:
        h = LayerNormMLP(self.layer_sizes, activate_final=True)(obs_flat)
        mean = nn.Dense(self.action_size,
                        kernel_init=nn.initializers.variance_scaling(
                            1e-4, 'fan_in', 'truncated_normal'))(h)
        scale_raw = nn.Dense(self.action_size,
                             kernel_init=nn.initializers.variance_scaling(
                                 1e-4, 'fan_in', 'truncated_normal'))(h)
        # softplus scaled so that softplus(0) -> init_scale.
        scale = jax.nn.softplus(scale_raw) * (
            self.init_scale / jax.nn.softplus(0.0))
        scale = scale + self.min_scale
        return IndependentNormal(mean=mean, stddev=scale)


class CriticNetwork(nn.Module):
    """Critic multiplexer + LayerNormMLP + DiscreteValuedHead."""

    layer_sizes: Sequence[int] = (512, 512, 256)
    vmin: float = VMIN
    vmax: float = VMAX
    num_atoms: int = NUM_ATOMS

    @nn.compact
    def __call__(self, obs_flat, action) -> DiscreteValuedDistribution:
        # CriticMultiplexer clips actions to the canonical spec
        # (reference network_factory.py:95-100, ClipToSpec).
        action = jnp.clip(action, -1.0, 1.0)
        x = jnp.concatenate([obs_flat, action], axis=-1)
        h = LayerNormMLP(self.layer_sizes, activate_final=True)(x)
        logits = nn.Dense(self.num_atoms)(h)
        values = jnp.linspace(self.vmin, self.vmax, self.num_atoms,
                              dtype=logits.dtype)
        return DiscreteValuedDistribution(logits=logits, values=values)
