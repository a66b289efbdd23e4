"""On-TPU DMPO actor-learner: rollouts, replay and learning in one program.

Replaces the reference's Ray + Reverb topology (reference
flybody/train_dmpo_ray.py: 32 CPU actor processes + gRPC replay + 1 GPU
learner) with a single SPMD program:

  * actors = the batched functional env vmapped over thousands of flies,
    stepped with the target policy under the same jit,
  * replay = an HBM ring buffer per device shard,
  * the learner samples from local replay and psums gradients over the
    `data` mesh axis (ICI); weights are replicated, so actor-weight sync
    (the reference's VariableClient polling) is free.

The insert/sample rate coupling (Reverb's SampleToInsertRatio,
samples_per_insert=15) becomes a static schedule: each iteration inserts
B_env * T transitions and runs
round(inserts * samples_per_insert / batch_size) learner steps.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from flybody_tpu.agents import dmpo as dmpo_lib
from flybody_tpu.agents import networks as nets_lib
from flybody_tpu.agents import replay as replay_lib
from flybody_tpu.envs.base import FruitFlyEnv, LAST


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    num_envs: int = 256  # per device
    rollout_length: int = 16  # control steps per iteration
    replay_capacity: int = 1_000_000  # per device
    min_replay_fraction: float = 0.01
    learner_steps_per_iter: int | None = None  # None: derive from SPI
    networks: str = 'default'  # 'default' (MLP) or 'vision' (VisNet convs)
    dmpo: dmpo_lib.DMPOConfig = dmpo_lib.DMPOConfig()


class TrainState(NamedTuple):
    learner: dmpo_lib.DMPOState
    replay: replay_lib.ReplayState
    env_states: Any
    env_obs_flat: jax.Array  # (B, obs_dim) current observations
    rng: jax.Array
    env_steps: jax.Array
    episodes: jax.Array
    reward_sum: jax.Array  # running return statistics


class DMPOTrainer:
    """Builds the fused actor-learner step for a functional fly env."""

    def __init__(self, env: FruitFlyEnv, config: TrainConfig = TrainConfig(),
                 policy=None, critic=None):
        """Args:
            env: functional fly env.
            config: trainer configuration.
            policy / critic: optional explicit network modules overriding
                the config.networks selection — e.g. a frozen-LL
                two-level controller from
                networks_vis.make_two_level_policy (the reference's
                controller-reuse recipe, network_factory_vis.py:19-52):
                its trainable params are the HL steering net only.
        """
        self.env = env
        self.config = config
        # Probe obs/action dims.
        ts_shape = env.observation_spec()
        self.obs_dim = int(sum(np.prod(v.shape) for v in ts_shape.values()))
        self.action_dim = env.tables.num_actions
        dtype = jnp.asarray(env.model.qpos0).dtype
        self.dtype = dtype
        # Pixel observation dims stored as uint8 in replay (the 0..255
        # grayscale eye images dominate vision obs; f32 storage of
        # obs+next_obs is ~18 KB/transition and OOMs HBM at scale).
        self.u8_idx = ()
        if config.networks == 'vision' or policy is not None:
            off, idxs = 0, []
            for n in sorted(ts_shape):
                sz = int(np.prod(ts_shape[n].shape))
                if n.endswith('left_eye') or n.endswith('right_eye'):
                    idxs.extend(range(off, off + sz))
                off += sz
            self.u8_idx = tuple(idxs)
        if policy is None and config.networks == 'vision':
            from flybody_tpu.agents import networks_vis
            policy, critic = networks_vis.make_vision_networks(
                ts_shape, self.action_dim)
        self.learner = dmpo_lib.DMPOLearner(
            self.obs_dim, self.action_dim, config.dmpo,
            action_min=env.action_min, action_max=env.action_max,
            dtype=dtype, policy=policy, critic=critic)
        cfg = config.dmpo
        inserts = config.num_envs * (
            config.rollout_length - cfg.n_step + 1)
        # Replay writes are contiguous blocks; round the capacity up to a
        # multiple of the per-iteration insert size.
        self.replay_capacity = -(-config.replay_capacity // inserts) * inserts
        if config.learner_steps_per_iter is None:
            self.learner_steps = max(1, int(round(
                inserts * cfg.samples_per_insert / cfg.batch_size)))
        else:
            self.learner_steps = config.learner_steps_per_iter

    # ------------------------------------------------------------------ init

    def init(self, rng) -> TrainState:
        cfg = self.config
        r1, r2, r3 = jax.random.split(rng, 3)
        learner = self.learner.init(r1)
        replay = replay_lib.init(self.replay_capacity, self.obs_dim,
                                 self.action_dim, self.dtype,
                                 u8_idx=self.u8_idx)
        env_rngs = jax.random.split(r2, cfg.num_envs)
        env_states, ts = jax.vmap(self.env.reset)(env_rngs)
        obs_flat = nets_lib.batch_concat(ts.observation, batched=True)
        return TrainState(learner=learner, replay=replay,
                          env_states=env_states,
                          env_obs_flat=obs_flat.astype(self.dtype),
                          rng=r3,
                          env_steps=jnp.zeros((), jnp.int32),
                          episodes=jnp.zeros((), jnp.int32),
                          reward_sum=jnp.zeros((), self.dtype))

    # ----------------------------------------------------------------- pieces

    def _env_rollout(self, state: TrainState, rng):
        """T control steps for all envs with the behavior policy."""
        env = self.env
        T = self.config.rollout_length

        def body(carry, rng_t):
            env_states, obs_flat = carry
            dist = self.learner.policy_dist(state.learner, obs_flat,
                                            target=True)
            actions = jnp.clip(dist.sample(rng_t), -1.0, 1.0)
            # Canonical -> real actions.
            lo = jnp.asarray(env.action_min, self.dtype)
            hi = jnp.asarray(env.action_max, self.dtype)
            real = 0.5 * (actions + 1.0) * (hi - lo) + lo
            new_states, ts = jax.vmap(env.step)(env_states, real)
            new_obs = nets_lib.batch_concat(ts.observation,
                                            batched=True).astype(self.dtype)
            done = ts.step_type == LAST
            # Divergence scrub: a physics explosion can pass through NaN
            # INSIDE the substep loop (before the env's qacc/velocity
            # terminations see it at the control-step boundary), and one
            # non-finite observation/reward in replay poisons the
            # learner permanently (observed: walk bench-solver run,
            # 2026-08-19). Terminal-step semantics stay intact: the env
            # terminates these episodes via the NaN-safe guards
            # (envs/base.exceeds) and discount 0 drops the bootstrap.
            bad = ~(jnp.isfinite(new_obs).all(axis=-1)
                    & jnp.isfinite(ts.reward)
                    & jnp.isfinite(ts.discount))
            new_obs = jnp.where(jnp.isfinite(new_obs), new_obs, 0.0)
            reward = jnp.where(bad, 0.0, ts.reward.astype(self.dtype))
            discount = jnp.where(bad, 0.0,
                                 ts.discount.astype(self.dtype))
            done = done | bad
            # Auto-reset finished envs.
            reset_rngs = jax.random.split(rng_t, self.config.num_envs)
            reset_states, reset_ts = jax.vmap(env.reset)(reset_rngs)
            reset_obs = nets_lib.batch_concat(
                reset_ts.observation, batched=True).astype(self.dtype)

            def pick(a, b):
                mask = done.reshape((-1,) + (1,) * (a.ndim - 1))
                return jnp.where(mask, a, b)

            next_states = jax.tree.map(pick, reset_states, new_states)
            next_obs = pick(reset_obs, new_obs)
            # Emit BOTH the pre-step obs (what the action was computed
            # from) and the post-step pre-reset obs (the true o_{t+1};
            # terminal obs at done steps) — n_step_transitions needs both
            # to build correctly aligned (o_t, a_t, R, D, o_{t+m}) tuples.
            diag = (jnp.sum(bad.astype(jnp.int32)),
                    jnp.max(jnp.abs(new_obs)))
            out = (obs_flat, new_obs, actions, reward, discount, done,
                   diag)
            return (next_states, next_obs), out

        rngs = jax.random.split(rng, T)
        (env_states, obs_flat), (obs_seq, next_obs_seq, act_seq, rew_seq,
                                 disc_seq, done_seq,
                                 diag) = jax.lax.scan(
            body, (state.env_states, state.env_obs_flat), rngs)
        return (env_states, obs_flat, obs_seq, next_obs_seq, act_seq,
                rew_seq, disc_seq, done_seq, diag)

    # ------------------------------------------------------------------ step

    def train_iteration(self, state: TrainState, axis_name: str | None =
                        None):
        """One fused iteration: rollout -> insert -> learner steps."""
        cfg = self.config
        rng, r_roll, r_learn = jax.random.split(state.rng, 3)
        (env_states, obs_flat, obs_seq, next_obs_seq, act_seq, rew_seq,
         disc_seq, done_seq, roll_diag) = self._env_rollout(state, r_roll)

        trans = replay_lib.n_step_transitions(
            obs_seq, next_obs_seq, act_seq, rew_seq, disc_seq, done_seq,
            cfg.dmpo.n_step, cfg.dmpo.discount)
        replay = replay_lib.insert(state.replay, trans,
                                   u8_idx=self.u8_idx)

        min_size = max(cfg.dmpo.batch_size,
                       int(cfg.replay_capacity * cfg.min_replay_fraction))
        ready = replay.size >= min_size

        # Sample each learner batch INSIDE the scan body, closing over the
        # (immutable during learning) replay buffers: they stay out of the
        # scan carry, and only ONE batch is ever materialized. The previous
        # pre-sample-all-batches form allocated learner_steps x batch x
        # 2 x obs_dim floats up front — ~1.6 GB at 512 vision envs (360
        # learner steps x 256 x ~4.4k obs floats), the leading suspect in
        # the >=128-env vision trainer HBM blowups.
        rngs = jax.random.split(r_learn, self.learner_steps)
        replay = replay._replace(
            samples=replay.samples + self.learner_steps
            * cfg.dmpo.batch_size)

        def learner_scan(learner, rng_l):
            _, batch = replay_lib.sample(replay, rng_l,
                                         cfg.dmpo.batch_size,
                                         u8_idx=self.u8_idx)
            r_step = jax.random.fold_in(rng_l, 1)
            new_learner, stats = self._sgd(learner, batch, r_step,
                                           axis_name)
            # Skip updates until replay is warm.
            learner = jax.tree.map(
                lambda new, old: jnp.where(ready, new, old), new_learner,
                learner)
            return learner, stats

        learner, stats_seq = jax.lax.scan(learner_scan, state.learner,
                                          rngs)
        stats = jax.tree.map(lambda x: x[-1], stats_seq)
        if 'nonfinite_grad' in stats:
            # Count skipped (non-finite-gradient) updates over the whole
            # iteration, not just the last learner step.
            stats['nonfinite_grad'] = jnp.sum(
                stats_seq['nonfinite_grad'])

        new_state = TrainState(
            learner=learner, replay=replay, env_states=env_states,
            env_obs_flat=obs_flat, rng=rng,
            env_steps=state.env_steps + cfg.num_envs * cfg.rollout_length,
            episodes=state.episodes + jnp.sum(done_seq).astype(jnp.int32),
            reward_sum=state.reward_sum + jnp.sum(rew_seq))
        stats['env_steps'] = new_state.env_steps
        stats['episodes'] = new_state.episodes
        stats['mean_step_reward'] = jnp.mean(rew_seq)
        # Divergence diagnostics: transitions scrubbed for non-finite
        # obs/reward this iteration, and the largest observation
        # magnitude seen (huge-but-finite obs poison the critic without
        # tripping the scrub).
        stats['scrubbed'] = jnp.sum(roll_diag[0])
        stats['obs_absmax'] = jnp.max(roll_diag[1])
        return new_state, stats

    # ------------------------------------------------------- checkpointing

    def checkpoint_payload(self, state: TrainState) -> dict:
        """Small, resume-relevant slice of the train state: learner params/
        optimizers + counters. The replay buffer (GBs) is deliberately NOT
        checkpointed — large device->host transfers during orbax saves have
        crashed the TPU worker, and replay re-warms in a few iterations."""
        return {
            'learner': state.learner,
            'env_steps': state.env_steps,
            'episodes': state.episodes,
            'reward_sum': state.reward_sum,
        }

    def restore_from_payload(self, state: TrainState,
                             payload: dict) -> TrainState:
        """Merges a checkpoint payload into a freshly init'd TrainState."""
        return state._replace(learner=payload['learner'],
                              env_steps=payload['env_steps'],
                              episodes=payload['episodes'],
                              reward_sum=payload['reward_sum'])

    def _sgd(self, learner, batch, rng, axis_name):
        # axis_name=None: single-chip; otherwise gradients are pmean'd
        # over the mesh axis inside the learner step.
        return self.learner.sgd_step(learner, batch, rng,
                                     axis_name=axis_name)
