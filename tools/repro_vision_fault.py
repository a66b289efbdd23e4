"""Minimal, staged repro for the vision-path TPU worker fault.

Round-2/3 observation: any vision training at >=128 envs (and even
64-env eval rollouts) crashes the axon TPU worker
("UNAVAILABLE: TPU worker process crashed ... kernel fault"), while
identical non-vision runs at 1024 envs are stable. This tool isolates
the faulting component by running ONE stage of the vision pipeline per
process, so a crash is attributable and the worker recovers between
probes:

    python -m tools.repro_vision_fault --stage rollout --num-envs 256
    python -m tools.repro_vision_fault --stage rollout --no-eyes ...
    python -m tools.repro_vision_fault --stage eyes    ...  # render only
    python -m tools.repro_vision_fault --stage policy  ...  # + vis net
    python -m tools.repro_vision_fault --stage train   ...  # 2 iters

Combine with FLYBODY_NO_PALLAS=... to bisect kernels vs XLA. Each stage
prints one `OK <stage> ...` line with a state-dependent checksum (so XLA
cannot dead-code-eliminate the work); a worker crash surfaces as the
usual JaxRuntimeError instead.
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--stage', default='rollout',
                   choices=['rollout', 'eyes', 'policy', 'train'])
    p.add_argument('--task', default='vision_bumps',
                   choices=['vision_bumps', 'vision_trench'])
    p.add_argument('--num-envs', type=int, default=256)
    p.add_argument('--steps', type=int, default=16,
                   help='scanned control steps per device program')
    p.add_argument('--reps', type=int, default=2,
                   help='device-program executions')
    p.add_argument('--no-eyes', action='store_true',
                   help='replace the eye ray tracer output with zeros')
    p.add_argument('--no-terrain-physics', action='store_true',
                   help='disable hfield collision (terrain still '
                        'renders unless --no-eyes)')
    p.add_argument('--cpu', action='store_true')
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from flybody_tpu.train.run import cast_env_f32, make_env

    kw = {}
    if args.no_terrain_physics:
        kw['terrain_physics'] = False
    env = cast_env_f32(make_env(args.task, **kw))

    if args.no_eyes:
        from flybody_tpu.vision import rasterizer as _ras
        size = env.eye_size
        orig = _ras.render_eyes

        def _zeros(model, fkd, terrain, **kwargs):
            z = jnp.zeros((size, size), jnp.float32)
            return {'eye_right': z, 'eye_left': z}

        _ras.render_eyes = _zeros

    rng = jax.random.PRNGKey(0)
    B = args.num_envs

    if args.stage == 'eyes':
        # Render only: reset (which renders once per env) repeatedly.
        @jax.jit
        def run(r):
            rngs = jax.random.split(r, B)
            _, ts = jax.vmap(env.reset)(rngs)
            return (ts.observation['walker/right_eye'].sum()
                    + ts.observation['walker/left_eye'].sum())

        for i in range(args.reps):
            t0 = time.time()
            v = float(run(jax.random.fold_in(rng, i)))
            print(f'OK eyes rep{i} sum={v:.3f} {time.time()-t0:.1f}s',
                  flush=True)
        return

    from flybody_tpu.agents import networks as nets_lib

    lo = jnp.asarray(env.action_min, jnp.float32)
    hi = jnp.asarray(env.action_max, jnp.float32)
    na = env.tables.num_actions

    policy_apply = None
    params = None
    if args.stage == 'policy':
        from flybody_tpu.agents import networks_vis
        policy, _ = networks_vis.make_vision_networks(
            env.observation_spec(), na)
        obs_dim = int(sum(np.prod(v.shape)
                          for v in env.observation_spec().values()))
        params = policy.init(rng, np.zeros((1, obs_dim), np.float32))
        policy_apply = policy.apply

    if args.stage in ('rollout', 'policy'):
        @jax.jit
        def run(r):
            rngs = jax.random.split(r, B)
            states, ts = jax.vmap(env.reset)(rngs)
            obs0 = nets_lib.batch_concat(ts.observation, batched=True)

            def body(carry, rr):
                states, obs = carry
                if policy_apply is not None:
                    a = policy_apply(params, obs).mean
                else:
                    a = jax.random.uniform(rr, (B, na), jnp.float32,
                                           -1.0, 1.0)
                real = 0.5 * (jnp.clip(a, -1, 1) + 1.0) * (hi - lo) + lo
                states, ts = jax.vmap(env.step)(states, real)
                obs = nets_lib.batch_concat(ts.observation, batched=True)
                return (states, obs), ts.reward.sum()

            (_, obs), rews = jax.lax.scan(
                body, (states, obs0), jax.random.split(r, args.steps))
            return rews.sum() + obs.sum()

        for i in range(args.reps):
            t0 = time.time()
            v = float(run(jax.random.fold_in(rng, i)))
            print(f'OK {args.stage} rep{i} B={B} steps={args.steps} '
                  f'sum={v:.3f} {time.time()-t0:.1f}s', flush=True)
        return

    # stage == 'train': two real trainer iterations at this env count.
    from flybody_tpu.train.train_dmpo import DMPOTrainer, TrainConfig
    from flybody_tpu.agents.dmpo import DMPOConfig
    cfg = TrainConfig(num_envs=B, rollout_length=args.steps,
                      replay_capacity=max(50_000, 4 * B * args.steps),
                      min_replay_fraction=0.0, networks='vision',
                      dmpo=DMPOConfig(batch_size=64, num_samples=4))
    trainer = DMPOTrainer(env, cfg)
    state = trainer.init(rng)
    step_fn = jax.jit(trainer.train_iteration)
    for i in range(args.reps):
        t0 = time.time()
        state, stats = step_fn(state)
        v = float(np.asarray(stats['mean_step_reward']))
        print(f'OK train rep{i} B={B} r={v:.4f} '
              f'{time.time()-t0:.1f}s', flush=True)


if __name__ == '__main__':
    main()
