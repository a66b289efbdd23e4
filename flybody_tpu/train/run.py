"""End-to-end DMPO training job (counterpart of reference
flybody/train_dmpo_ray.py, with the Ray/Reverb cluster collapsed into one
TPU program).

Usage:
    python -m flybody_tpu.train.run --task walk_imitation --test
    python -m flybody_tpu.train.run --task flight_imitation \
        --num-envs 2048 --iterations 2000 --ckpt-dir /tmp/fly_ckpts
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from flybody_tpu.agents.dmpo import DMPOConfig
from flybody_tpu.envs import fly_envs
from flybody_tpu.train.loggers import TrainLogger
from flybody_tpu.train.train_dmpo import DMPOTrainer, TrainConfig


def make_env(task: str, **kwargs):
    factory = {
        'walk_imitation': fly_envs.walk_imitation,
        'flight_imitation': fly_envs.flight_imitation,
        'walk_on_ball': fly_envs.walk_on_ball,
        'vision_bumps': lambda **kw: fly_envs.vision_guided_flight(
            bumps_or_trench='bumps', **kw),
        'vision_trench': lambda **kw: fly_envs.vision_guided_flight(
            bumps_or_trench='trench', **kw),
        'template': fly_envs.template_task,
    }[task]
    return factory(functional=True, **kwargs)


def cast_model_f32(model):
    """Casts a FlyModel's float leaves to f32 (the TPU compute dtype)."""
    import jax.numpy as jnp

    def to_f32(x):
        if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.asarray(x, jnp.float32)
        return x

    return jax.tree.map(to_f32, model)


def cast_env_f32(env):
    import jax.numpy as jnp

    def to_f32(x):
        if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.asarray(x, jnp.float32)
        return x

    env.model = jax.tree.map(to_f32, env.model)
    if hasattr(env, 'store') and env.store is not None:
        env.store.qpos = to_f32(env.store.qpos)
        env.store.qvel = to_f32(env.store.qvel)
        if env.store.root2site is not None:
            env.store.root2site = to_f32(env.store.root2site)
        if env.store.joint_quat is not None:
            env.store.joint_quat = to_f32(env.store.joint_quat)
    if hasattr(env, 'wbpg'):
        env.wbpg = jax.tree.map(to_f32, env.wbpg)
    env.action_min = np.asarray(env.action_min, np.float32)
    env.action_max = np.asarray(env.action_max, np.float32)
    return env


def make_two_level_networks(vision_env, ll_snapshot_path):
    """Frozen-LL two-level policy + VisNet critic for controller reuse.

    The LL flight policy module is rebuilt with the flight task's
    obs/action dims (the same construction it was trained with), its
    params restored from the orbax snapshot and frozen in closure; only
    the HL steering net's params are trainable. (Reference recipe:
    network_factory_vis.py:19-52, 223-292.)
    """
    from flybody_tpu.agents import networks_vis
    from flybody_tpu.agents.checkpointing import load_policy_snapshot
    from flybody_tpu.agents.dmpo import DMPOLearner

    ll_env = cast_env_f32(make_env('flight_imitation'))
    ll_spec = ll_env.observation_spec()
    ll_obs_dim = int(sum(np.prod(v.shape) for v in ll_spec.values()))
    ll_learner = DMPOLearner(ll_obs_dim, ll_env.tables.num_actions,
                             DMPOConfig(), action_min=ll_env.action_min,
                             action_max=ll_env.action_max)
    params_like = ll_learner.init(jax.random.PRNGKey(0)).policy_params
    ll_params = load_policy_snapshot(ll_snapshot_path, params_like)

    v_spec = vision_env.observation_spec()
    policy = networks_vis.make_two_level_policy(
        v_spec, ll_spec, ll_learner.policy, ll_params)
    _, critic = networks_vis.make_vision_networks(
        v_spec, vision_env.tables.num_actions)
    return policy, critic


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--task', default='walk_imitation')
    p.add_argument('--ref-path', default=None,
                   help='HDF5 reference trajectory dataset.')
    p.add_argument('--num-envs', type=int, default=1024)
    p.add_argument('--rollout-length', type=int, default=16)
    p.add_argument('--iterations', type=int, default=1000)
    p.add_argument('--replay-capacity', type=int, default=1_000_000)
    p.add_argument('--batch-size', type=int, default=256)
    p.add_argument('--ckpt-dir', default=None)
    p.add_argument('--ckpt-minutes', type=float, default=30.0,
                   help='checkpoint save interval (reference saves every '
                        '30 min, learning_dmpo.py:104-138)')
    p.add_argument('--log-jsonl', default=None)
    p.add_argument('--resume-warm-fraction', type=float, default=0.25,
                   help='when resuming from a checkpoint, freeze learner '
                        'updates until the (non-checkpointed) replay '
                        'buffer has refilled to this fraction of '
                        'capacity. The restored policy keeps rolling '
                        'out meanwhile, so the reward curve continues '
                        'from its restored level instead of dipping '
                        'while the critic re-learns from a tiny fresh '
                        'buffer (observed: 960 SGD steps on a 16k '
                        'single-policy buffer knock a 2.6-reward '
                        'policy down to 0.1 for ~1M env steps).')
    p.add_argument('--test', action='store_true',
                   help='Tiny smoke configuration (reference --test mode).')
    p.add_argument('--ll-snapshot', default=None,
                   help='Path to a trained flight-policy orbax snapshot; '
                        'enables controller-reuse training on vision '
                        'tasks: the snapshot is frozen as the low-level '
                        'policy and DMPO trains the HL steering net '
                        '(reference network_factory_vis.py:19-52).')
    p.add_argument('--bench-solver', action='store_true',
                   help='train with the bench.py solver settings '
                        '(8 Newton iters, ls 6, ncon 32, refactor 8, '
                        'noslip on 16 contacts) instead of the shipped '
                        'accurate regime — the evidence run for "does '
                        'the fast solver preserve training quality".')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--cpu', action='store_true',
                   help='force the CPU backend (the axon TPU platform '
                        'ignores JAX_PLATFORMS env vars)')
    args = p.parse_args(argv)

    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    if args.test:
        args.num_envs = 8
        args.rollout_length = 8
        args.iterations = 3
        args.replay_capacity = 4096
        args.batch_size = 32

    env_kwargs = {}
    if args.ref_path and args.task in ('walk_imitation',
                                       'flight_imitation'):
        env_kwargs['ref_path'] = args.ref_path
    if args.bench_solver:
        env_kwargs.update(solver_iterations=8, ls_iterations=6,
                          ncon_max=24, refactor_period=8,
                          noslip_contacts=16)
        # Broadphase compaction widths must be set before the collision
        # module is first traced (read as module-level env knobs);
        # accuracy gated by test_topp_32_16_solver_accuracy +
        # test_ncon24_solver_accuracy.
        from flybody_tpu.physics import collision as _col
        if 'FLYBODY_MPR_TOP_P' not in os.environ:
            _col.MPR_MERGED_TOP_P = 32
        if 'FLYBODY_CC_TOP_P' not in os.environ:
            _col.CC_TOP_P = 16
        # Match bench.py's Woodbury budget (gated by
        # test_sb_break_solver_accuracy; round-5 ledger).
        os.environ.setdefault('FLYBODY_SB_BREAK', '4')
    env = cast_env_f32(make_env(args.task, **env_kwargs))

    two_level = args.ll_snapshot and args.task.startswith('vision')
    ckpt = None
    if args.ckpt_dir:
        from flybody_tpu.agents.checkpointing import Checkpointer
        ckpt = Checkpointer(args.ckpt_dir,
                            time_delta_minutes=args.ckpt_minutes)
    resuming = ckpt is not None and ckpt.latest_step is not None
    min_fraction = 0.002 if not args.test else 0.0
    if resuming and not args.test:
        # (--test smoke runs keep the gate off: a 3-iteration resume at
        # warm-fraction 0.25 of a 4096 buffer would perform zero learner
        # updates and silently exercise nothing.)
        # Replay is not checkpointed (see checkpoint_payload): hold the
        # learner until the buffer has refilled with diverse on-policy
        # experience from the restored policy.
        min_fraction = max(min_fraction, args.resume_warm_fraction)
    cfg = TrainConfig(
        num_envs=args.num_envs,
        rollout_length=args.rollout_length,
        replay_capacity=args.replay_capacity,
        min_replay_fraction=min_fraction,
        networks=('vision' if args.task.startswith('vision')
                  and not two_level else 'default'),
        dmpo=DMPOConfig(batch_size=args.batch_size,
                        num_samples=20 if not args.test else 4,
                        # Frozen-LL stddev makes the stddev-KL arm
                        # unsatisfiable (mpo.mpo_loss train_stddev).
                        train_stddev=not two_level),
    )
    policy = critic = None
    if two_level:
        policy, critic = make_two_level_networks(env, args.ll_snapshot)
        print('controller reuse: frozen LL flight policy from',
              args.ll_snapshot)
    trainer = DMPOTrainer(env, cfg, policy=policy, critic=critic)
    logger = TrainLogger('learner', jsonl_path=args.log_jsonl)

    state = trainer.init(jax.random.PRNGKey(args.seed))
    if resuming:
        payload = ckpt.restore(trainer.checkpoint_payload(state))
        state = trainer.restore_from_payload(state, payload)
        print(f'Restored checkpoint at step {ckpt.latest_step} '
              f'(learner frozen until replay >= '
              f'{min_fraction:.0%} of capacity)')

    step_fn = jax.jit(trainer.train_iteration)
    t0 = time.time()
    for it in range(args.iterations):
        state, stats = step_fn(state)
        if it == 0:
            print(f'first iteration (incl. compile): '
                  f'{time.time() - t0:.1f} s', flush=True)
        logger.write(stats, force=(it in (0, args.iterations - 1)))
        if ckpt is not None:
            if ckpt.save(int(state.learner.steps),
                         trainer.checkpoint_payload(state)):
                # Keep a usable inference/controller-reuse snapshot next
                # to every periodic checkpoint, so a killed run (or one
                # cut short by a worker crash) still leaves a policy.
                from flybody_tpu.agents.checkpointing import (
                    save_policy_snapshot)
                save_policy_snapshot(args.ckpt_dir, 'policy',
                                     state.learner.target_policy_params)
    stats = {k: float(np.asarray(v)) for k, v in stats.items()
             if np.asarray(v).size == 1}
    print('final stats:', stats)
    if args.ckpt_dir:
        from flybody_tpu.agents.checkpointing import (Checkpointer,
                                                      save_policy_snapshot)
        ckpt.save(int(state.learner.steps),
                  trainer.checkpoint_payload(state), force=True)
        path = save_policy_snapshot(args.ckpt_dir, 'policy',
                                    state.learner.target_policy_params)
        print('saved final checkpoint + policy snapshot:', path)
    return state


if __name__ == '__main__':
    main()
