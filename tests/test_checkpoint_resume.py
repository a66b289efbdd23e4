"""Checkpoint/resume: full save -> fresh-trainer restore -> continued run.

Covers the reference's checkpoint-based job-revival story
(reference flybody/agents/learning_dmpo.py:104-162,
ray_distributed_dmpo.py:56): the learner state (networks, targets,
optimizers, dual variables) and counters round-trip through orbax and a
resumed run continues with unbroken counters. The replay buffer is
deliberately excluded from the payload (documented in
DMPOTrainer.checkpoint_payload); the test asserts that exclusion is
explicit rather than accidental.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flybody_tpu.agents.checkpointing import (Checkpointer,
                                              load_policy_snapshot,
                                              save_policy_snapshot)
from flybody_tpu.agents.dmpo import DMPOConfig
from flybody_tpu.train.run import cast_env_f32, make_env
from flybody_tpu.train.train_dmpo import DMPOTrainer, TrainConfig

pytestmark = pytest.mark.fast


def _tiny_cfg():
    return TrainConfig(num_envs=2, rollout_length=5, replay_capacity=512,
                       min_replay_fraction=0.0, learner_steps_per_iter=2,
                       dmpo=DMPOConfig(batch_size=8, num_samples=2,
                                       n_step=3, min_replay_size=8))


def test_save_restore_resume_continuity(tmp_path):
    env = cast_env_f32(make_env('walk_on_ball'))
    trainer = DMPOTrainer(env, _tiny_cfg())
    step = jax.jit(trainer.train_iteration)

    state = trainer.init(jax.random.PRNGKey(0))
    for _ in range(3):
        state, stats = step(state)
    ckpt = Checkpointer(str(tmp_path / 'ckpt'), time_delta_minutes=0.0)
    assert ckpt.save(int(state.env_steps), trainer.checkpoint_payload(state))
    steps_at_save = int(state.env_steps)
    learner_steps_at_save = int(state.learner.steps)
    params_at_save = jax.tree.map(np.asarray, state.learner.policy_params)

    # Fresh process simulation: new trainer + new Checkpointer over the
    # same directory, restore into a freshly init'd state.
    trainer2 = DMPOTrainer(env, _tiny_cfg())
    ckpt2 = Checkpointer(str(tmp_path / 'ckpt'))
    assert ckpt2.latest_step == steps_at_save
    state2 = trainer2.init(jax.random.PRNGKey(42))
    payload = ckpt2.restore(trainer2.checkpoint_payload(state2))
    state2 = trainer2.restore_from_payload(state2, payload)

    # Counters and learner state continue, bit-exact.
    assert int(state2.env_steps) == steps_at_save
    assert int(state2.learner.steps) == learner_steps_at_save
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        state2.learner.policy_params, params_at_save)

    # Resumed run continues with monotonic counters and finite stats
    # (replay intentionally re-warms: learner updates are gated until
    # min_replay_size transitions are re-inserted).
    step2 = jax.jit(trainer2.train_iteration)
    for _ in range(2):
        state2, stats2 = step2(state2)
    assert int(state2.env_steps) == steps_at_save + 2 * 2 * 5
    for k, v in stats2.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_policy_snapshot_roundtrip(tmp_path):
    env = cast_env_f32(make_env('walk_on_ball'))
    trainer = DMPOTrainer(env, _tiny_cfg())
    state = trainer.init(jax.random.PRNGKey(1))
    path = save_policy_snapshot(str(tmp_path), 'policy-0',
                                state.learner.target_policy_params)
    restored = load_policy_snapshot(path, state.learner.target_policy_params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        restored, state.learner.target_policy_params)


def test_learner_frozen_until_replay_warm():
    """The resume story depends on the warm gate: with a high
    min_replay_fraction (run.py --resume-warm-fraction sets this on
    restore), learner params must stay bit-frozen while the
    non-checkpointed replay buffer refills, and update once it is warm."""
    env = cast_env_f32(make_env('walk_on_ball'))
    cfg = TrainConfig(num_envs=2, rollout_length=5, replay_capacity=64,
                      min_replay_fraction=0.5, learner_steps_per_iter=2,
                      dmpo=DMPOConfig(batch_size=8, num_samples=2,
                                      n_step=3, min_replay_size=8))
    trainer = DMPOTrainer(env, cfg)
    step = jax.jit(trainer.train_iteration)
    state = trainer.init(jax.random.PRNGKey(3))
    p0 = jax.tree.map(np.asarray, state.learner.policy_params)

    state, _ = step(state)
    frozen = jax.tree.map(
        lambda a, b: bool(np.array_equal(np.asarray(a), b)),
        state.learner.policy_params, p0)
    assert all(jax.tree.leaves(frozen)), (
        'learner updated before replay reached min_replay_fraction')

    changed = False
    for _ in range(8):
        state, _ = step(state)
        changed = not all(jax.tree.leaves(jax.tree.map(
            lambda a, b: bool(np.array_equal(np.asarray(a), b)),
            state.learner.policy_params, p0)))
        if changed:
            break
    assert changed, 'learner never unfroze after replay warmed'
    assert int(state.replay.size) >= 32


def test_replay_exclusion_is_explicit():
    """The checkpoint payload must never silently grow the replay buffer
    into the save (orbax big saves have crashed the TPU worker); the
    exclusion is part of the contract."""
    env = cast_env_f32(make_env('walk_on_ball'))
    trainer = DMPOTrainer(env, _tiny_cfg())
    state = trainer.init(jax.random.PRNGKey(2))
    payload = trainer.checkpoint_payload(state)
    assert set(payload) == {'learner', 'env_steps', 'episodes',
                            'reward_sum'}
    n_bytes = sum(x.size * x.dtype.itemsize
                  for x in jax.tree.leaves(payload)
                  if hasattr(x, 'size'))
    # Learner-only payload stays far below replay scale (~MBs, not GBs).
    assert n_bytes < 64 * 1024 * 1024
