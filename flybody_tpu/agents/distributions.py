"""Minimal distribution library for the DMPO agent (JAX).

Self-contained replacements for the TFP distributions used by the reference
agent stack: independent diagonal Gaussians (policy head) and discrete
valued categorical (distributional critic head).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

# Plain-Python constant: module import must not touch any jax backend
# (a module-scope jnp computation here initialized the TPU runtime before
# callers could select the CPU platform for mesh dry runs).
_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


@struct.dataclass
class IndependentNormal:
    """Diagonal Gaussian over action vectors; event dim is the last axis."""

    mean: jax.Array
    stddev: jax.Array

    def sample(self, rng, sample_shape=()):
        shape = tuple(sample_shape) + self.mean.shape
        eps = jax.random.normal(rng, shape, self.mean.dtype)
        return self.mean + self.stddev * eps

    def log_prob(self, x):
        z = (x - self.mean) / self.stddev
        per_dim = -0.5 * z * z - jnp.log(self.stddev) - _HALF_LOG_2PI
        return jnp.sum(per_dim, axis=-1)

    def kl_divergence_per_dim(self, other: 'IndependentNormal'):
        """KL(self || other) per event dimension (no sum)."""
        var_ratio = (self.stddev / other.stddev) ** 2
        mean_term = ((self.mean - other.mean) / other.stddev) ** 2
        return 0.5 * (var_ratio + mean_term - 1.0 - jnp.log(var_ratio))

    def mode(self):
        return self.mean


@struct.dataclass
class DiscreteValuedDistribution:
    """Categorical distribution over a fixed support of scalar values
    (the C51-style critic head used by DMPO: 51 atoms in [-150, 150],
    reference network_factory.py:104-106)."""

    logits: jax.Array  # (..., num_atoms)
    values: jax.Array  # (num_atoms,)

    def mean(self):
        probs = jax.nn.softmax(self.logits, axis=-1)
        return jnp.sum(probs * self.values, axis=-1)

    def log_probs(self):
        return jax.nn.log_softmax(self.logits, axis=-1)

    def probs(self):
        return jax.nn.softmax(self.logits, axis=-1)


def categorical_l2_project(z_p, probs, z_q):
    """Project a categorical distribution (z_p, probs) onto support z_q
    (the standard C51 projection used by Acme's categorical TD learning)."""
    vmin, vmax = z_q[0], z_q[-1]
    d_pos = jnp.concatenate([z_q[1:], z_q[-1:]], 0) - z_q
    d_neg = z_q - jnp.concatenate([z_q[:1], z_q[:-1]], 0)
    z_p = jnp.clip(z_p, vmin, vmax)[..., None, :]  # (..., 1, P)
    z_q_ = z_q[..., :, None]  # (Q, 1)
    d_pos = jnp.where(d_pos > 0, 1.0 / d_pos, 0.0)[..., :, None]
    d_neg = jnp.where(d_neg > 0, 1.0 / d_neg, 0.0)[..., :, None]
    delta_qp = z_p - z_q_  # (..., Q, P)
    d_sign = (delta_qp >= 0.0).astype(probs.dtype)
    delta_hat = ((d_sign * delta_qp * d_pos)
                 - ((1.0 - d_sign) * delta_qp * d_neg))
    probs = probs[..., None, :]
    return jnp.sum(jnp.clip(1.0 - delta_hat, 0.0, 1.0) * probs, axis=-1)
