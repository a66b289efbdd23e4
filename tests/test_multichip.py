"""Data-parallel training on a multi-device mesh (8 virtual CPU devices).

Exercises the SPMD topology that replaces the reference's Ray cluster
(reference flybody/train_dmpo_ray.py:169-264): one shard_map'd fused DMPO
iteration per device with gradients pmean'd over the `data` axis, params
replicated. conftest.py provisions the 8 virtual CPU devices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from flybody_tpu.agents.dmpo import DMPOConfig
from flybody_tpu.train.run import cast_env_f32, make_env
from flybody_tpu.train.train_dmpo import DMPOTrainer, TrainConfig


@pytest.fixture(scope='module')
def mesh():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip('needs 8 virtual devices (conftest sets XLA_FLAGS)')
    return Mesh(np.array(devices[:8]), ('data',))


def test_shard_map_train_iteration(mesh):
    env = cast_env_f32(make_env('walk_on_ball'))
    cfg = TrainConfig(num_envs=2, rollout_length=5, replay_capacity=512,
                      min_replay_fraction=0.0, learner_steps_per_iter=1,
                      dmpo=DMPOConfig(batch_size=8, num_samples=2,
                                      n_step=3, min_replay_size=8))
    trainer = DMPOTrainer(env, cfg)

    def per_device(rng):
        state = trainer.init(rng[0])
        state, stats = trainer.train_iteration(state, axis_name='data')
        state, stats = trainer.train_iteration(state, axis_name='data')
        leaf = jax.tree.leaves(state.learner.policy_params)[0]
        return (stats['critic_loss'][None],
                jnp.sum(jnp.abs(leaf))[None])

    fn = shard_map(per_device, mesh=mesh, in_specs=P('data'),
                   out_specs=P('data'), check_vma=False)
    rngs = jax.random.split(jax.random.PRNGKey(0), 8)
    losses, param_sums = jax.jit(fn)(rngs)
    losses = np.asarray(jax.block_until_ready(losses))
    param_sums = np.asarray(param_sums)
    assert np.isfinite(losses).all(), losses
    assert np.isfinite(param_sums).all()


def test_pmean_gradients_keep_params_replicated(mesh):
    """Identical init + pmean'd grads => params stay bit-identical across
    devices even though each device samples DIFFERENT replay batches."""
    env = cast_env_f32(make_env('walk_on_ball'))
    cfg = TrainConfig(num_envs=2, rollout_length=5, replay_capacity=512,
                      min_replay_fraction=0.0, learner_steps_per_iter=2,
                      dmpo=DMPOConfig(batch_size=8, num_samples=2,
                                      n_step=3, min_replay_size=8))
    trainer = DMPOTrainer(env, cfg)

    def per_device(rng):
        # SAME learner init on every device (fixed seed), different env
        # rollouts/replay (per-device rng).
        state = trainer.init(jax.random.PRNGKey(7))
        state = state._replace(rng=rng[0])
        state, _ = trainer.train_iteration(state, axis_name='data')
        state, _ = trainer.train_iteration(state, axis_name='data')
        leaves = jax.tree.leaves(state.learner.policy_params)
        checks = jnp.stack([jnp.sum(jnp.abs(l)) for l in leaves])
        return checks[None]

    fn = shard_map(per_device, mesh=mesh, in_specs=P('data'),
                   out_specs=P('data'), check_vma=False)
    rngs = jax.random.split(jax.random.PRNGKey(3), 8)
    checks = np.asarray(jax.jit(fn)(rngs))  # (8, n_leaves)
    assert np.isfinite(checks).all()
    # All devices must agree exactly: grads were averaged over the mesh.
    np.testing.assert_array_equal(checks, np.broadcast_to(checks[:1],
                                                          checks.shape))
