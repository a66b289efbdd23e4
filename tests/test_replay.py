"""Replay buffer + n-step transition assembly semantics.

Validates the on-device counterpart of the reference's Reverb
NStepTransitionAdder (reference flybody/agents/agent_dmpo.py:154-163):
obs/action alignment, n-step return accumulation, and — critically —
that windows never cross auto-reset episode boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np

from flybody_tpu.agents import replay as replay_lib


def _make_rollout(T, B, obs_dim, act_dim, seed=0):
    rng = np.random.RandomState(seed)
    obs = rng.randn(T, B, obs_dim)
    next_obs = rng.randn(T, B, obs_dim)
    actions = rng.randn(T, B, act_dim)
    rewards = rng.randn(T, B)
    discounts = np.ones((T, B))
    dones = np.zeros((T, B), bool)
    return obs, next_obs, actions, rewards, discounts, dones


def test_nstep_alignment_no_done():
    T, B, n, gamma = 7, 3, 4, 0.9
    obs, next_obs, actions, rewards, discounts, dones = _make_rollout(
        T, B, 5, 2)
    trans = replay_lib.n_step_transitions(
        jnp.asarray(obs), jnp.asarray(next_obs), jnp.asarray(actions),
        jnp.asarray(rewards), jnp.asarray(discounts), jnp.asarray(dones),
        n, gamma)
    num = T - n + 1
    assert trans.obs.shape == (num * B, 5)
    # Window t pairs a_t with o_t (pre-step obs), not o_{t-1}.
    for t in range(num):
        np.testing.assert_allclose(
            np.asarray(trans.obs[t * B:(t + 1) * B]), obs[t], rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(trans.action[t * B:(t + 1) * B]), actions[t],
            rtol=1e-12)
        # next_obs is the obs AFTER the n-th step: next_obs[t+n-1].
        np.testing.assert_allclose(
            np.asarray(trans.next_obs[t * B:(t + 1) * B]),
            next_obs[t + n - 1], rtol=1e-12)
        R = np.zeros(B)
        D = np.ones(B)
        for k in range(n):
            R += D * rewards[t + k]
            D *= gamma * discounts[t + k]
        np.testing.assert_allclose(
            np.asarray(trans.reward[t * B:(t + 1) * B]), R, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(trans.discount[t * B:(t + 1) * B]), D, rtol=1e-6)


def test_nstep_window_cut_at_episode_boundary():
    T, B, n, gamma = 6, 2, 4, 0.9
    obs, next_obs, actions, rewards, discounts, dones = _make_rollout(
        T, B, 3, 2, seed=1)
    # Env 0: timeout/good-end at step 2 (discount stays 1, done=True).
    dones[2, 0] = True
    # Env 1: fatal termination at step 1 (discount 0, done=True).
    dones[1, 1] = True
    discounts[1, 1] = 0.0
    trans = replay_lib.n_step_transitions(
        jnp.asarray(obs), jnp.asarray(next_obs), jnp.asarray(actions),
        jnp.asarray(rewards), jnp.asarray(discounts), jnp.asarray(dones),
        n, gamma)

    def get(t, b, field):
        return np.asarray(getattr(trans, field)[t * B + b])

    # Window (t=0, env 0): accumulates steps 0,1,2 then stops — the
    # bootstrap obs is the TERMINAL obs next_obs[2,0], not the next
    # episode's, and D = gamma^3 (truncation bootstraps).
    R = (rewards[0, 0] + gamma * rewards[1, 0]
         + gamma ** 2 * rewards[2, 0])
    np.testing.assert_allclose(get(0, 0, 'reward'), R, rtol=1e-6)
    np.testing.assert_allclose(get(0, 0, 'discount'), gamma ** 3,
                               rtol=1e-6)
    np.testing.assert_allclose(get(0, 0, 'next_obs'), next_obs[2, 0],
                               rtol=1e-12)
    # Window (t=0, env 1): stops after step 1; fatal => D == 0.
    R = rewards[0, 1] + gamma * rewards[1, 1]
    np.testing.assert_allclose(get(0, 1, 'reward'), R, rtol=1e-6)
    np.testing.assert_allclose(get(0, 1, 'discount'), 0.0, atol=1e-12)
    np.testing.assert_allclose(get(0, 1, 'next_obs'), next_obs[1, 1],
                               rtol=1e-12)
    # Window (t=2, env 0) starts ON the done step: single-step window.
    np.testing.assert_allclose(get(2, 0, 'reward'), rewards[2, 0],
                               rtol=1e-6)
    np.testing.assert_allclose(get(2, 0, 'discount'), gamma, rtol=1e-6)
    np.testing.assert_allclose(get(2, 0, 'next_obs'), next_obs[2, 0],
                               rtol=1e-12)
    # Window (t=2, env 1) is entirely inside the NEXT episode (reset
    # happened after step 1): full n-step window, no cut.
    R = np.zeros(())
    D = 1.0
    for k in range(n):
        R += D * rewards[2 + k, 1]
        D *= gamma * discounts[2 + k, 1]
    np.testing.assert_allclose(get(2, 1, 'reward'), R, rtol=1e-6)
    np.testing.assert_allclose(get(2, 1, 'discount'), D, rtol=1e-6)


def test_ring_buffer_insert_sample():
    state = replay_lib.init(capacity=8, obs_dim=3, act_dim=2,
                            dtype=jnp.arange(1.0).dtype)
    batch = replay_lib.Transition(
        obs=jnp.arange(12.0).reshape(4, 3),
        action=jnp.zeros((4, 2)),
        reward=jnp.arange(4.0),
        discount=jnp.ones(4),
        next_obs=jnp.ones((4, 3)))
    state = replay_lib.insert(state, batch)
    assert int(state.size) == 4 and int(state.insert_pos) == 4
    state = replay_lib.insert(state, batch)
    state = replay_lib.insert(state, batch)  # wraps
    assert int(state.size) == 8 and int(state.insert_pos) == 4
    _, sampled = replay_lib.sample(state, jax.random.PRNGKey(0), 16)
    assert sampled.obs.shape == (16, 3)
    assert np.isfinite(np.asarray(sampled.reward)).all()


def test_replay_u8_pixel_banks():
    """uint8 side-banks: pixel dims round-trip exactly for integer
    values and within 0.5 otherwise; float dims stay exact."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flybody_tpu.agents import replay as replay_lib

    obs_dim, act_dim, cap, n = 12, 3, 32, 8
    u8_idx = tuple(range(4, 10))  # "pixels" live at dims 4..9
    rng = np.random.RandomState(0)
    state = replay_lib.init(cap, obs_dim, act_dim, u8_idx=u8_idx)
    assert state.obs_u8.shape == (cap, 6)
    assert state.data.obs.shape == (cap, 6)

    obs = rng.randn(n, obs_dim).astype(np.float32)
    obs[:, 4:10] = rng.randint(0, 256, (n, 6)).astype(np.float32)
    obs[0, 4] = 37.6  # non-integer pixel -> quantized to 38
    nxt = obs + 1.0
    batch = replay_lib.Transition(
        obs=jnp.asarray(obs),
        action=jnp.zeros((n, act_dim), jnp.float32),
        reward=jnp.arange(n, dtype=jnp.float32),
        discount=jnp.ones((n,), jnp.float32),
        next_obs=jnp.asarray(nxt))
    state = replay_lib.insert(state, batch, u8_idx=u8_idx)
    _, got = replay_lib.sample(state, jax.random.PRNGKey(0), 64,
                               u8_idx=u8_idx)
    got_obs = np.asarray(got.obs)
    got_rew = np.asarray(got.reward)
    # Match each sampled row to its source row by the reward tag.
    for i in range(64):
        src = obs[int(got_rew[i])]
        np.testing.assert_allclose(got_obs[i, :4], src[:4], rtol=0,
                                   atol=0)
        np.testing.assert_allclose(got_obs[i, 10:], src[10:], rtol=0,
                                   atol=0)
        assert np.abs(got_obs[i, 4:10] - src[4:10]).max() <= 0.5
