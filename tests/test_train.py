"""Fused trainer iteration + evaluator (tiny CPU configuration)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flybody_tpu.agents.dmpo import DMPOConfig
from flybody_tpu.train.evaluate import evaluate
from flybody_tpu.train.run import cast_env_f32, make_env
from flybody_tpu.train.train_dmpo import DMPOTrainer, TrainConfig


@pytest.fixture(scope='module')
def trainer():
    env = cast_env_f32(make_env('walk_on_ball'))
    cfg = TrainConfig(num_envs=2, rollout_length=5, replay_capacity=512,
                      min_replay_fraction=0.0, learner_steps_per_iter=2,
                      dmpo=DMPOConfig(batch_size=8, num_samples=2,
                                      n_step=3, min_replay_size=8))
    return DMPOTrainer(env, cfg)


def test_train_iteration_runs_and_is_finite(trainer):
    state = trainer.init(jax.random.PRNGKey(0))
    step = jax.jit(trainer.train_iteration)
    for _ in range(2):
        state, stats = step(state)
    for k, v in stats.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert int(state.env_steps) == 2 * 2 * 5
    # Iter 1 inserts 6 transitions < batch_size 8 -> learner gated off;
    # iter 2 has 12 -> both learner steps apply.
    assert int(state.learner.steps) == 2


def test_evaluator_stats(trainer):
    env = trainer.env
    state = trainer.init(jax.random.PRNGKey(1))
    stats = jax.jit(lambda r: evaluate(
        env, trainer.learner.policy.apply,
        state.learner.target_policy_params, r, num_envs=2,
        max_steps=4))(jax.random.PRNGKey(2))
    assert stats['episode_length_mean'] <= 4.0
    assert np.isfinite(float(stats['episode_return_mean']))
    assert (float(stats['episode_return_min'])
            <= float(stats['episode_return_max']))


def test_vision_trainer_u8_replay_iteration():
    """Vision trainer (eye pixels in the obs, uint8 replay banks) runs
    one fused iteration with finite losses on CPU."""
    env = cast_env_f32(make_env('vision_bumps'))
    cfg = TrainConfig(num_envs=2, rollout_length=4, replay_capacity=128,
                      min_replay_fraction=0.0, learner_steps_per_iter=1,
                      networks='vision',
                      dmpo=DMPOConfig(batch_size=4, num_samples=2,
                                      n_step=2, min_replay_size=4))
    tr = DMPOTrainer(env, cfg)
    assert len(tr.u8_idx) == 2 * 32 * 32  # both eyes quantized
    state = tr.init(jax.random.PRNGKey(0))
    assert state.replay.obs_u8 is not None
    state, stats = jax.jit(tr.train_iteration)(state)
    for k, v in stats.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_two_level_controller_reuse_training(tmp_path):
    """Controller reuse end-to-end (reference network_factory_vis.py
    recipe): train a (tiny) LL flight policy, snapshot it, freeze it
    inside a two-level vision policy, and run a DMPO training iteration
    where ONLY the HL steering params update."""
    from flybody_tpu.agents.checkpointing import save_policy_snapshot
    from flybody_tpu.train.run import make_two_level_networks

    ll_env = cast_env_f32(make_env('flight_imitation'))
    ll_cfg = TrainConfig(num_envs=2, rollout_length=4,
                         replay_capacity=128, min_replay_fraction=0.0,
                         learner_steps_per_iter=1,
                         dmpo=DMPOConfig(batch_size=4, num_samples=2,
                                         n_step=2, min_replay_size=4))
    ll_tr = DMPOTrainer(ll_env, ll_cfg)
    ll_state = ll_tr.init(jax.random.PRNGKey(0))
    ll_state, _ = jax.jit(ll_tr.train_iteration)(ll_state)
    snap = save_policy_snapshot(str(tmp_path), 'policy',
                                ll_state.learner.target_policy_params)

    v_env = cast_env_f32(make_env('vision_bumps'))
    policy, critic = make_two_level_networks(v_env, snap)
    cfg = TrainConfig(num_envs=2, rollout_length=4, replay_capacity=128,
                      min_replay_fraction=0.0, learner_steps_per_iter=1,
                      dmpo=DMPOConfig(batch_size=4, num_samples=2,
                                      n_step=2, min_replay_size=4))
    tr = DMPOTrainer(v_env, cfg, policy=policy, critic=critic)
    assert len(tr.u8_idx) == 2 * 32 * 32  # eye pixels uint8 in replay
    state = tr.init(jax.random.PRNGKey(1))
    hl_before = jax.tree.map(np.asarray, state.learner.policy_params)
    state, stats = jax.jit(tr.train_iteration)(state)
    for k, v in stats.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # HL params updated (the trainable tree is the HL net only; the
    # frozen LL lives in closure and is untouched by construction).
    changed = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        state.learner.policy_params, hl_before))
    assert max(changed) > 0.0
