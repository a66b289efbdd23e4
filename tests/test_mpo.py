"""MPO loss unit tests (reference math: flybody/agents/losses_mpo.py).

Focus: the round-5 train_stddev switch for controller reuse — with a
frozen-LL stddev the stddev-KL constraint is unsatisfiable and its arm
must drop out of both the loss and the dual gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flybody_tpu.agents import mpo as mpo_lib
from flybody_tpu.agents.distributions import IndependentNormal

pytestmark = pytest.mark.fast


def _setup(seed=0, N=6, B=4, D=3):
    rng = np.random.RandomState(seed)
    online = IndependentNormal(
        mean=jnp.asarray(rng.randn(B, D), jnp.float32),
        stddev=jnp.asarray(0.3 + 0.2 * rng.rand(B, D), jnp.float32))
    target = IndependentNormal(
        mean=jnp.asarray(online.mean + 0.05 * rng.randn(B, D),
                         jnp.float32),
        stddev=jnp.asarray(0.3 + 0.2 * rng.rand(B, D), jnp.float32))
    actions = jnp.asarray(rng.randn(N, B, D), jnp.float32)
    q = jnp.asarray(rng.randn(N, B), jnp.float32)
    params = mpo_lib.init_params(D)
    return params, online, target, actions, q


def test_mpo_loss_finite_and_stats():
    params, online, target, actions, q = _setup()
    loss, stats = mpo_lib.mpo_loss(params, online, target, actions, q)
    assert np.isfinite(float(loss))
    for k in ('dual_temperature', 'dual_alpha_stddev', 'kl_mean_rel',
              'pi_stddev_max'):
        assert np.isfinite(float(stats[k])), k


def test_train_stddev_false_drops_stddev_arm():
    params, online, target, actions, q = _setup()

    def loss_of(p, flag):
        loss, _ = mpo_lib.mpo_loss(p, online, target, actions, q,
                                   train_stddev=flag)
        return loss

    g_on = jax.grad(loss_of)(params, True)
    g_off = jax.grad(loss_of)(params, False)
    # The stddev dual receives gradient only when the arm is on.
    assert float(jnp.abs(g_on.log_alpha_stddev).max()) > 0
    assert float(jnp.abs(g_off.log_alpha_stddev).max()) == 0.0
    # The mean/temperature arms are unchanged by the switch.
    np.testing.assert_allclose(np.asarray(g_on.log_alpha_mean),
                               np.asarray(g_off.log_alpha_mean), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_on.log_temperature),
                               np.asarray(g_off.log_temperature),
                               rtol=1e-6)


def test_train_stddev_false_no_policy_stddev_grad():
    params, online, target, actions, q = _setup()

    def loss_of(stddev):
        dist = IndependentNormal(mean=online.mean, stddev=stddev)
        loss, _ = mpo_lib.mpo_loss(params, dist, target, actions, q,
                                   train_stddev=False)
        return loss

    g = jax.grad(loss_of)(online.stddev)
    # With the stddev arm off, the online stddev enters no loss term.
    assert float(jnp.abs(g).max()) == 0.0
