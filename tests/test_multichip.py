"""Multi-device data-parallel training on the virtual 8-device CPU mesh.

Validates the sharding program the driver dry-runs (__graft_entry__.py
dryrun_multichip): one fused DMPO train iteration per device under
shard_map over a ('data',) mesh, with gradients pmean'd over the axis so
parameters stay replicated. Replaces the reference's Ray actor/learner
topology (reference train_dmpo_ray.py:169-264) with SPMD collectives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from flybody_tpu.agents.dmpo import DMPOConfig
from flybody_tpu.envs import fly_envs
from flybody_tpu.train.train_dmpo import DMPOTrainer, TrainConfig


@pytest.fixture(scope='module')
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip('needs the 8 virtual CPU devices from conftest')
    return Mesh(np.array(devs[:8]), ('data',))


def _tiny_trainer():
    env = fly_envs.flight_imitation(functional=True, solver_iterations=2,
                                    ls_iterations=2)
    cfg = TrainConfig(
        num_envs=2,  # per device
        rollout_length=4,
        replay_capacity=256,
        min_replay_fraction=0.0,
        learner_steps_per_iter=1,
        dmpo=DMPOConfig(batch_size=4, num_samples=3, n_step=3,
                        min_replay_size=4),
    )
    return DMPOTrainer(env, cfg)


def test_shard_map_train_iteration_replicates_params(mesh):
    trainer = _tiny_trainer()

    def per_device(rng):
        state = trainer.init(rng[0])
        state, stats = trainer.train_iteration(state, axis_name='data')
        # Return a param leaf + losses so we can check replication.
        leaf = jax.tree.leaves(state.learner.policy_params)[0]
        return (stats['critic_loss'][None], stats['policy_loss'][None],
                jnp.sum(leaf)[None])

    fn = shard_map(per_device, mesh=mesh, in_specs=P('data'),
                   out_specs=P('data'), check_vma=False)
    rngs = jax.random.split(jax.random.PRNGKey(0), 8)
    closs, ploss, leafsum = jax.jit(fn)(rngs)
    closs, ploss, leafsum = map(np.asarray, (closs, ploss, leafsum))
    assert np.isfinite(closs).all(), closs
    assert np.isfinite(ploss).all(), ploss
    # Gradients are pmean'd over the mesh: every device applies the SAME
    # update to identically-initialized params, so params stay replicated.
    np.testing.assert_allclose(leafsum, leafsum[0], rtol=1e-6)


def test_pmean_grads_match_single_device_mean(mesh):
    """psum-of-grads semantics: the pmean'd loss stats equal the mean of
    per-device losses (the collective actually ran over the axis)."""
    trainer = _tiny_trainer()

    def per_device(rng):
        state = trainer.init(rng[0])
        _, stats = trainer.train_iteration(state, axis_name='data')
        return stats['critic_loss'][None]

    fn = shard_map(per_device, mesh=mesh, in_specs=P('data'),
                   out_specs=P('data'), check_vma=False)
    rngs = jax.random.split(jax.random.PRNGKey(1), 8)
    losses = np.asarray(jax.jit(fn)(rngs))
    assert losses.shape == (8,)
    assert np.isfinite(losses).all()
