"""Trainer profiler: rollout vs replay vs learner wall-time breakdown.

Times the three phases of the fused train iteration separately (each as
its own jit) to locate the throughput bottleneck.

Usage:
    python -m flybody_tpu.tools.profile_trainer --task walk_imitation \
        --num-envs 256 --iters 10
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=10, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--task', default='walk_imitation')
    p.add_argument('--num-envs', type=int, default=256)
    p.add_argument('--iters', type=int, default=10)
    p.add_argument('--cpu', action='store_true')
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from flybody_tpu.agents import replay as replay_lib
    from flybody_tpu.train.run import cast_env_f32, make_env
    from flybody_tpu.train.train_dmpo import DMPOTrainer, TrainConfig

    env = cast_env_f32(make_env(args.task))
    cfg = TrainConfig(num_envs=args.num_envs, min_replay_fraction=0.0,
                      replay_capacity=500_000)
    trainer = DMPOTrainer(env, cfg)
    state = trainer.init(jax.random.PRNGKey(0))
    dcfg = cfg.dmpo

    rollout = jax.jit(lambda s, r: trainer._env_rollout(s, r))
    t_roll, roll_out = _time(rollout, state, jax.random.PRNGKey(1),
                             iters=args.iters)
    (env_states, obs_flat, obs_seq, next_obs_seq, act_seq, rew_seq,
     disc_seq, done_seq) = roll_out

    nstep = jax.jit(lambda: replay_lib.n_step_transitions(
        obs_seq, next_obs_seq, act_seq, rew_seq, disc_seq, done_seq,
        dcfg.n_step, dcfg.discount))
    t_nstep, trans = _time(nstep, iters=args.iters)

    # Time K inserts inside one jitted scan so the buffer update can be
    # performed in place (as in the fused iteration) instead of paying a
    # full-buffer copy per standalone jit call.
    K_INS = 8

    def insert_n(replay, trans):
        return jax.lax.scan(
            lambda r, _: (replay_lib.insert(r, trans), None), replay,
            length=K_INS)[0]

    t_ins_n, replay = _time(jax.jit(insert_n), state.replay, trans,
                            iters=args.iters)
    t_insert = t_ins_n / K_INS

    # Return only the batch: returning the (unchanged) replay from a
    # standalone jit would copy the whole buffer at the output boundary.
    sample = jax.jit(lambda r, k: replay_lib.sample(r, k,
                                                    dcfg.batch_size)[1])
    t_sample, batch = _time(sample, replay, jax.random.PRNGKey(2),
                            iters=args.iters)

    sgd = jax.jit(trainer.learner.sgd_step)
    t_sgd, _ = _time(sgd, state.learner, batch, jax.random.PRNGKey(3),
                     iters=args.iters)

    full = jax.jit(trainer.train_iteration)
    t_full, _ = _time(full, state, iters=max(2, args.iters // 3))

    n_learn = trainer.learner_steps
    inserts = args.num_envs * (cfg.rollout_length - dcfg.n_step + 1)
    print(f'\ntask={args.task} num_envs={args.num_envs} '
          f'platform={jax.devices()[0].platform}')
    print(f'rollout ({cfg.rollout_length} ctrl steps):  '
          f'{t_roll * 1e3:9.1f} ms')
    print(f'n_step_transitions:                  {t_nstep * 1e3:9.1f} ms')
    print(f'replay insert ({inserts}):             {t_insert * 1e3:9.1f} ms')
    print(f'replay sample (batch {dcfg.batch_size}):           '
          f'{t_sample * 1e3:9.1f} ms')
    print(f'one sgd_step:                        {t_sgd * 1e3:9.1f} ms')
    print(f'  x {n_learn} learner steps/iter =      '
          f'{t_sgd * n_learn * 1e3:9.1f} ms')
    print(f'FULL train_iteration:                {t_full * 1e3:9.1f} ms')
    print(f'-> env-steps/s: '
          f'{args.num_envs * cfg.rollout_length / t_full:,.0f}')


if __name__ == '__main__':
    main()
