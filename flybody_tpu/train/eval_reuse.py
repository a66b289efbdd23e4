"""Controller-reuse evaluation: trained-HL vs frozen-LL-alone baseline.

The reference's vision recipe trains only a high-level steering network
around a frozen pre-trained flight policy (reference
flybody/agents/network_factory_vis.py:19-52, 223-292). This tool produces
the deterministic eval table that demonstrates the HL is doing real work:
the SAME two-level module is rolled out with (a) the trained HL params
and (b) freshly initialized HL params (near-no-op steering, i.e. the
frozen LL alone), on the vision flight tasks.

Usage:
    python -m flybody_tpu.train.eval_reuse --task vision_bumps \
        --ll-snapshot /ckpts/flight/policy --hl-ckpt-dir /ckpts/vision_hl \
        --num-envs 64
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np

from flybody_tpu.train import evaluate as eval_lib
from flybody_tpu.train.run import (cast_env_f32, make_env,
                                   make_two_level_networks)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--task', default='vision_bumps',
                   choices=['vision_bumps', 'vision_trench'])
    p.add_argument('--ll-snapshot', required=True)
    p.add_argument('--hl-ckpt-dir', default=None,
                   help='checkpoint dir of the HL training run; its '
                        'latest learner target policy params are used. '
                        'Omit to evaluate only the frozen-LL baseline.')
    p.add_argument('--num-envs', type=int, default=64)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--cpu', action='store_true')
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    env = cast_env_f32(make_env(args.task))
    policy, _ = make_two_level_networks(env, args.ll_snapshot)

    obs_dim = int(sum(np.prod(v.shape)
                      for v in env.observation_spec().values()))
    rng = jax.random.PRNGKey(args.seed)
    init_params = policy.init(rng, np.zeros((1, obs_dim), np.float32))

    rows = {}

    def run(tag, params):
        # Host-chunked: vision episodes are 2000 control steps and a
        # single 2000-step scanned program faults the axon TPU worker.
        stats = eval_lib.evaluate(
            env, policy.apply, params, jax.random.PRNGKey(args.seed + 1),
            num_envs=args.num_envs, chunk=eval_lib.DEFAULT_CHUNK)
        rows[tag] = {k: float(v) for k, v in stats.items()}
        print(tag, json.dumps(rows[tag]), flush=True)

    run('frozen_LL_alone', init_params)

    if args.hl_ckpt_dir:
        from flybody_tpu.agents.checkpointing import load_policy_snapshot
        import os
        path = os.path.join(args.hl_ckpt_dir, 'policy')
        trained = load_policy_snapshot(path, init_params)
        run('trained_HL', trained)
        gain = (rows['trained_HL']['episode_return_mean']
                / max(1e-9, rows['frozen_LL_alone']['episode_return_mean']))
        print(f'return gain trained_HL / frozen_LL: {gain:.2f}x')
    return rows


if __name__ == '__main__':
    main()
