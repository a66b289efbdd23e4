"""Controller reuse: a frozen flight policy steered by a vision HL net.

Reproduces the reference's two-level controller workflow (reference
network_factory_vis.py:19-52, 223-292): train (briefly) a low-level
flight-imitation policy, freeze it, and wrap it in a vision policy whose
high-level MLP reads the eye cameras and emits steering commands
(ref_displacement + ref_root_quat) spliced into the LL policy's input.

    python examples/03_controller_reuse_vision.py          # TPU
    python examples/03_controller_reuse_vision.py --cpu    # tiny demo
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from anywhere without install

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--ll-iterations', type=int, default=5)
    args = p.parse_args()
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from flybody_tpu.agents import networks as nets_lib
    from flybody_tpu.agents import networks_vis as vis_lib
    from flybody_tpu.agents.dmpo import DMPOConfig
    from flybody_tpu.envs import fly_envs
    from flybody_tpu.train.run import cast_env_f32
    from flybody_tpu.train.train_dmpo import DMPOTrainer, TrainConfig

    # 1. Low-level flight policy: a few DMPO iterations (stands in for a
    #    fully trained flight policy / a checkpointing.load_policy_snapshot
    #    restore).
    ll_env = cast_env_f32(fly_envs.flight_imitation(functional=True,
                                                    solver_iterations=4,
                                                    ls_iterations=4))
    cfg = TrainConfig(num_envs=8, rollout_length=8, replay_capacity=4096,
                      min_replay_fraction=0.0,
                      dmpo=DMPOConfig(batch_size=32, num_samples=4,
                                      min_replay_size=32))
    trainer = DMPOTrainer(ll_env, cfg)
    state = trainer.init(jax.random.PRNGKey(0))
    step_fn = jax.jit(trainer.train_iteration)
    for it in range(args.ll_iterations):
        state, stats = step_fn(state)
    print(f'LL flight policy after {args.ll_iterations} iterations: '
          f'critic_loss={float(stats["critic_loss"]):.3f}')
    ll_policy = trainer.learner.policy
    ll_params = jax.device_get(state.learner.target_policy_params)

    # 2. Vision task + two-level policy around the frozen LL network.
    v_env = cast_env_f32(fly_envs.vision_guided_flight(
        bumps_or_trench='bumps', functional=True, solver_iterations=4,
        ls_iterations=4))
    v_spec = v_env.observation_spec()
    ll_spec = ll_env.observation_spec()
    policy = vis_lib.make_two_level_policy(v_spec, ll_spec, ll_policy,
                                           ll_params)
    print('steering splice: idx', policy.steering_idx,
          'dim', policy.steering_command_dim)

    # 3. Roll the two-level policy in the vision env (mean head).
    s, ts = jax.jit(v_env.reset)(jax.random.PRNGKey(1))
    obs_flat = nets_lib.batch_concat(ts.observation, batched=False)[None]
    hl_params = policy.init(jax.random.PRNGKey(2),
                            obs_flat.astype(jnp.float32))

    @jax.jit
    def step(s, obs_flat):
        dist = policy.apply(hl_params, obs_flat.astype(jnp.float32))
        act = dist.mode()[0]
        s, ts = v_env.step(s, act)
        o = nets_lib.batch_concat(ts.observation, batched=False)[None]
        return s, o, ts.reward

    rews = []
    for t in range(10):
        s, obs_flat, r = step(s, obs_flat)
        rews.append(float(r))
    print('two-level vision rollout rewards:',
          np.round(np.asarray(rews), 4))
    print('OK: frozen LL flight policy driven by HL vision steering.')


if __name__ == '__main__':
    main()
