"""HDF5 imitation dataset pipeline: synth dataset -> loader -> env rollout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flybody_tpu.envs import fly_envs
from flybody_tpu.envs import trajectories as traj_lib
from flybody_tpu.tools import make_test_dataset as mkds


@pytest.fixture(scope='module')
def walk_ds(tmp_path_factory):
    model = fly_envs._walking_model(False, True, 0.01)
    path = tmp_path_factory.mktemp('ds') / 'walk.h5'
    mkds.make_walking_dataset(str(path), model, n_traj=2, n_steps=90)
    return str(path)


def test_walking_loader_structure(walk_ds):
    store, site_names, joint_names = traj_lib.load_walking_hdf5(walk_ds)
    assert store.num_trajectories == 2
    assert int(store.lengths[0]) == 90 and int(store.lengths[1]) == 80
    assert store.qpos.shape[-1] == 7 + len(joint_names)
    assert store.root2site.shape[-2:] == (len(site_names), 3)
    assert store.joint_quat.shape[-2:] == (len(joint_names), 4)
    # xy re-zeroed at snippet start (reference trajectory_loaders.py:244).
    np.testing.assert_allclose(np.asarray(store.qpos[:, 0, :2]), 0.0,
                               atol=1e-12)


def test_walk_imitation_hdf5_rollout(walk_ds):
    env = fly_envs.walk_imitation(ref_path=walk_ds, functional=True,
                                  initialize_qvel=True)
    state, ts = jax.jit(env.reset)(jax.random.PRNGKey(1))
    assert ts.observation['walker/ref_displacement'].shape == (65, 3)
    step = jax.jit(env.step)
    a = jnp.zeros((env.tables.num_actions,))
    for _ in range(3):
        state, ts = step(state, a)
    # Tracking the snippet from its own initial pose: com factor (weight 20)
    # keeps the factored product well above 1.
    assert float(ts.reward) > 1.0
    assert int(ts.step_type) == 1 and float(ts.discount) == 1.0


def test_walk_imitation_traj_subset(walk_ds):
    env = fly_envs.walk_imitation(ref_path=walk_ds, traj_indices=[1],
                                  functional=True)
    assert env.store.num_trajectories == 1
    assert int(env.store.lengths[0]) == 80


def test_flight_hdf5_rollout(tmp_path):
    path = tmp_path / 'flight.h5'
    mkds.make_flight_dataset(str(path), n_traj=2, n_steps=120)
    env = fly_envs.flight_imitation(ref_path=str(path), functional=True)
    state, ts = jax.jit(env.reset)(jax.random.PRNGKey(2))
    state, ts = jax.jit(env.step)(
        state, jnp.zeros((env.tables.num_actions,)))
    assert 0.0 < float(ts.reward) <= 1.0
