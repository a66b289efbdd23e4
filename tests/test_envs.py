"""Environment-level tests mirroring the reference test strategy
(reference tests/test_core.py, tests/test_walking_env.py)."""

import numpy as np
import pytest

from flybody_tpu.envs import fly_envs

WALK_OBS_EXPECT = ['walker/' + s for s in
                   ('accelerometer', 'actuator_activation', 'appendages_pos',
                    'force', 'gyro', 'joints_pos', 'joints_vel', 'touch',
                    'velocimeter', 'world_zaxis', 'ref_displacement',
                    'ref_root_quat')]


@pytest.fixture(scope='module')
def walk_env():
    return fly_envs.walk_imitation(terminal_com_dist=float('inf'), seed=0)


def test_walk_imitation_specs(walk_env):
    obs_spec = walk_env.observation_spec()
    assert list(obs_spec) == WALK_OBS_EXPECT
    assert walk_env.action_spec().shape == (59,)
    assert np.isclose(walk_env.control_timestep(), 2e-3)
    assert np.isclose(walk_env.physics_timestep(), 2e-4)
    # Preview windows (future_steps=64, reference fly_envs.py:149).
    assert obs_spec['walker/ref_displacement'].shape == (65, 3)
    assert obs_spec['walker/ref_root_quat'].shape == (65, 4)


def test_walk_imitation_inference_steps(walk_env):
    ts = walk_env.reset()
    for name in WALK_OBS_EXPECT:
        assert np.isfinite(ts.observation[name]).all(), name
    for _ in range(5):
        action = np.random.uniform(-0.5, 0.5, 59)
        ts = walk_env.step(action)
        assert ts.reward == 1.0  # inference mode (reference test_walking_env)
        assert np.isfinite(ts.observation['walker/joints_pos']).all()


def test_template_env():
    env = fly_envs.template_task(seed=0)
    assert env.action_spec().shape == (59,)
    ts = env.reset()
    for _ in range(3):
        ts = env.step(np.random.uniform(-1, 1, 59))
        assert ts.reward == 1.0
    # NaN action is scrubbed only in walk_imitation; template just runs.


def test_flight_env_action_and_obs():
    env = fly_envs.flight_imitation(seed=0)
    a = env.action_spec()
    assert a.shape == (12,)  # 11 actuators + 1 user (WBPG frequency)
    assert a.minimum[-1] == -1.0 and a.maximum[-1] == 1.0
    ts = env.reset()
    assert ts.observation['walker/ref_displacement'].shape == (6, 3)
    rewards = []
    for _ in range(5):
        ts = env.step(np.random.uniform(-0.2, 0.2, 12))
        rewards.append(ts.reward)
    assert all(np.isfinite(rewards))
    assert all(r > 0.5 for r in rewards)  # starts on-reference


def test_walk_on_ball_env():
    env = fly_envs.walk_on_ball(seed=0)
    assert env.action_spec().shape == (59,)
    ts = env.reset()
    assert ts.observation['walker/ball_qvel'].shape == (3,)
    for _ in range(3):
        ts = env.step(np.zeros(59))
        assert np.isfinite(ts.reward)


def test_action_routing_order():
    """Action layout: adhesion -> head -> abdomen (tendon) -> legs
    (reference _ACTION_CLASSES ordering, fruitfly.py:25-32)."""
    env = fly_envs.walk_imitation(terminal_com_dist=float('inf'))
    names = env.functional_env.tables.action_names
    assert all('adhere' in n for n in names[:6])
    assert names[6:9] == ('head_abduct', 'head_twist', 'head')
    assert 'abdomen' in names[9]
    assert any('T1' in n for n in names[11:])


def test_functional_batch_step():
    """vmap the functional env over a batch (the TPU training shape)."""
    import jax
    import jax.numpy as jnp
    env = fly_envs.flight_imitation(functional=True)
    B = 4
    rngs = jax.random.split(jax.random.PRNGKey(0), B)
    states, ts = jax.jit(jax.vmap(env.reset))(rngs)
    assert ts.observation['walker/joints_pos'].shape[0] == B
    actions = jnp.zeros((B, 12))
    states, ts = jax.jit(jax.vmap(env.step))(states, actions)
    assert ts.reward.shape == (B,)
    assert bool(jnp.isfinite(ts.reward).all())


def test_nan_safe_termination_guards():
    """NaN-safe divergence guards (envs/base.exceeds/below): a diverged
    state that passed through NaN must still terminate — plain `x > t`
    comparisons are False for NaN and let the episode run forever
    (observed learner poisoning, round 4)."""
    import jax.numpy as jnp
    from flybody_tpu.envs import base as envbase
    nan = jnp.float32(jnp.nan)
    assert bool(envbase.exceeds(nan, 1e14))
    assert bool(envbase.exceeds(jnp.float32(2e14), 1e14))
    assert not bool(envbase.exceeds(jnp.float32(1.0), 1e14))
    assert bool(envbase.below(nan, 0.2))
    assert bool(envbase.below(jnp.float32(0.1), 0.2))
    assert not bool(envbase.below(jnp.float32(0.5), 0.2))
