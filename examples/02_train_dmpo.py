"""Train DMPO on walking imitation end-to-end (dataset -> train -> eval).

Builds a synthetic mocap dataset (stands in for the figshare walking
dataset), trains the on-TPU fused actor-learner for a few iterations, and
evaluates the mean policy.

    python examples/02_train_dmpo.py            # TPU if available
    python examples/02_train_dmpo.py --cpu      # tiny CPU demo
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from anywhere without install

import argparse
import sys

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--iterations', type=int, default=20)
    args = p.parse_args()
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from flybody_tpu.envs import fly_envs
    from flybody_tpu.tools import make_test_dataset as mkds
    from flybody_tpu.train import run as run_lib
    from flybody_tpu.train.evaluate import evaluate_learner

    # 1. Synthetic walking dataset in the reference HDF5 layout.
    model = fly_envs._walking_model(False, True, 0.01)
    ds = mkds.make_walking_dataset('/tmp/example_walk.h5', model,
                                   n_traj=2, n_steps=300)
    print('dataset:', ds)

    # 2. Train.
    argv = ['--task', 'walk_imitation', '--ref-path', ds,
            '--num-envs', '16', '--rollout-length', '8',
            '--iterations', str(args.iterations),
            '--replay-capacity', '20000', '--batch-size', '64']
    if args.cpu:
        argv.append('--cpu')
    state = run_lib.main(argv)

    # 3. Evaluate the mean policy.
    env = run_lib.cast_env_f32(
        fly_envs.walk_imitation(ref_path=ds, functional=True))
    from flybody_tpu.train.train_dmpo import DMPOTrainer, TrainConfig
    trainer = DMPOTrainer(env, TrainConfig(num_envs=16, rollout_length=8))
    stats = evaluate_learner(env, trainer, state, jax.random.PRNGKey(0),
                             num_envs=8, max_steps=50)
    print('eval:', {k: round(v, 3) if isinstance(v, float) else v
                    for k, v in stats.items()})


if __name__ == '__main__':
    sys.exit(main())
