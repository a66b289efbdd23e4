"""Control-callback and delayed-actor hooks.

Mirrors reference tests/test_core.py:72-103 (mjcb_control applying qfrc
noise to dof subsets) and the DelayedFeedForwardActor action-delay
semantics (reference agents/actors.py:82-91).
"""

import jax
import jax.numpy as jnp
import numpy as np

from flybody_tpu.agents.actors import (DelayedActorState,
                                       init_delayed_state,
                                       make_delayed_actor)
from flybody_tpu.envs import fly_envs


def test_control_callback_applies_qfrc():
    dof_ids = np.array([*range(6, 9), *range(42, 53), *range(75, 90)])
    comp = np.array([i for i in range(108) if i not in dof_ids])
    sel = jnp.zeros(108).at[jnp.asarray(dof_ids)].set(1.0)
    gains = jnp.zeros(108).at[jnp.asarray(dof_ids)].set(
        jnp.sin(jnp.arange(len(dof_ids), dtype=jnp.float64)))

    def callback(model, data):
        # qfrc_actuator here is the previous substep's value — the same
        # view MuJoCo's mjcb_control has at the top of mj_forward.
        qf = (data.qfrc_actuator if data.qfrc_actuator is not None
              else jnp.zeros_like(data.qvel))
        return data.replace(qfrc_applied=sel * gains * qf)

    env = fly_envs.template_task(functional=True,
                                 control_callback=callback)
    state, ts = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    act = 0.3 * np.ones(env.tables.num_actions)
    for _ in range(3):
        state, ts = step(state, act)
    qfrc_applied = np.asarray(state.data.qfrc_applied)
    qfrc_act = np.asarray(state.data.qfrc_actuator)
    # Applied torques follow the callback's gain pattern. The callback saw
    # the PREVIOUS substep's qfrc_actuator (mjcb_control's view at the top
    # of mj_forward) while state.data holds the final substep's, so allow
    # the small one-substep actuator-force drift.
    np.testing.assert_allclose(
        qfrc_applied[dof_ids],
        np.sin(np.arange(len(dof_ids))) * qfrc_act[dof_ids],
        rtol=0.1, atol=1e-12)
    # ...and the untouched dofs stay exactly zero.
    assert (qfrc_applied[comp] == 0).all()
    # The injection actually influenced the dynamics.
    assert np.abs(qfrc_applied[dof_ids]).max() > 0


def test_control_callback_changes_dynamics():
    def kick(model, data):
        return data.replace(
            qfrc_applied=jnp.full_like(data.qvel, 1e-4))

    base = fly_envs.template_task(functional=True)
    kicked = fly_envs.template_task(functional=True,
                                    control_callback=kick)
    act = np.zeros(base.tables.num_actions)
    s0, _ = jax.jit(base.reset)(jax.random.PRNGKey(0))
    s1, _ = jax.jit(kicked.reset)(jax.random.PRNGKey(0))
    s0, _ = jax.jit(base.step)(s0, act)
    s1, _ = jax.jit(kicked.step)(s1, act)
    assert not np.allclose(np.asarray(s0.data.qvel),
                           np.asarray(s1.data.qvel))


def test_delayed_actor_queue_semantics():
    class _Det:
        def __init__(self, v):
            self.v = v

        def sample(self, rng):
            return self.v

        def mode(self):
            return self.v

    # Policy that returns the observation itself as the action.
    actor = make_delayed_actor(lambda p, o: _Det(o), action_delay=2)
    state = init_delayed_state(2, 3)
    rng = jax.random.PRNGKey(0)
    outs = []
    for t in range(5):
        obs = jnp.full((3,), float(t + 1), jnp.float32)
        a, state = actor(None, obs, rng, state)
        outs.append(np.asarray(a)[0])
    # Reference semantics: zeros while the queue fills, then a(t) = o(t-2).
    assert outs == [0.0, 0.0, 1.0, 2.0, 3.0], outs


def test_delayed_actor_zero_delay_passthrough():
    class _Det:
        def __init__(self, v):
            self.v = v

        def sample(self, rng):
            return self.v

    actor = make_delayed_actor(lambda p, o: _Det(o + 1.0), action_delay=0)
    state = init_delayed_state(0, 2)
    a, state2 = actor(None, jnp.ones(2), jax.random.PRNGKey(0), state)
    np.testing.assert_allclose(np.asarray(a), 2.0)
    assert state2 is state


def test_observation_callback():
    class _Det:
        def __init__(self, v):
            self.v = v

        def sample(self, rng):
            return self.v

    actor = make_delayed_actor(lambda p, o: _Det(o), action_delay=0,
                               observation_callback=lambda o: 3.0 * o)
    a, _ = actor(None, jnp.ones(2), jax.random.PRNGKey(0),
                 init_delayed_state(0, 2))
    np.testing.assert_allclose(np.asarray(a), 3.0)
