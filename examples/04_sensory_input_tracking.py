"""Track the fly's sensory inputs during flight.

Counterpart of the reference's sensory-input-tracking notebook
(reference docs/sensory-input-tracking.ipynb): run the flight-imitation
environment, record proprioceptive and vestibular observables over a
rollout (joint angles, egocentric velocity, gravity direction, root
pose, wing commands), and summarize their traces. The notebook drives a
pre-trained policy downloaded from figshare; offline we use the
wing-beat pattern generator with a random steering policy, which keeps
the fly airborne for the first few dozen control steps — enough to see
the 218 Hz wing-beat signature in the wing joints.

Run on CPU (no TPU needed):
    python examples/04_sensory_input_tracking.py [out.npz]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from anywhere without install

import jax

jax.config.update('jax_platforms', 'cpu')  # comment out to use the TPU

import numpy as np

from flybody_tpu.envs import fly_envs
from flybody_tpu.tools.utils import get_random_policy


def main():
    n_steps = 60

    # Inference mode: synthetic straight-flight reference trajectory +
    # the synthetic wing-beat base pattern (no datasets needed).
    env = fly_envs.flight_imitation(terminal_com_dist=float('inf'),
                                    seed=0)
    obs_spec = env.observation_spec()
    print('observations:', list(obs_spec))
    act_size = env.action_spec().shape[0]
    print('actions:', act_size, '(wings yaw/roll/pitch x2 ... + WBPG freq)')

    # Observable joint names, as in the notebook's
    # `env.task.walker.observable_joints` listing (all non-free joints
    # of the flight model, model order).
    fenv = fly_envs.flight_imitation(functional=True)
    meta = fenv.model.meta
    import numpy as _np
    jnt_type = _np.array(meta.jnt_type)
    names = [n for j, n in enumerate(meta.jnt_names) if jnt_type[j] != 0]
    assert len(names) == len(fenv.tables.joints_qpos_idx)
    print('\nobservable joints:')
    for i, name in enumerate(names):
        print(f'  {i:2d} {name}')

    policy = get_random_policy(env.action_spec(), -0.2, 0.2)

    joints_pos = np.zeros((n_steps, len(names)))
    vel = np.zeros((n_steps, 3))
    zaxis = np.zeros((n_steps, 3))
    actions = np.zeros((n_steps, act_size))

    ts = env.reset()
    for i in range(n_steps):
        joints_pos[i] = ts.observation['walker/joints_pos']
        vel[i] = ts.observation['walker/velocimeter']
        zaxis[i] = ts.observation['walker/world_zaxis']
        a = policy(ts.observation)
        actions[i] = a
        ts = env.step(a)

    dt_ms = 0.2  # flight control timestep, ms (constants: 2e-4 s)
    t = np.arange(n_steps) * dt_ms

    # Wing-beat signature: the WBPG drives wings at ~218 Hz, i.e. a
    # ~4.6 ms period — visible as sign flips in the wing joint columns.
    wing_cols = [i for i, n in enumerate(names) if 'wing' in n]
    wing = joints_pos[:, wing_cols]
    zero_crossings = int(np.sum(np.abs(np.diff(np.sign(wing), axis=0))) // 2)
    print(f'\nrollout: {n_steps} control steps ({t[-1]:.1f} ms)')
    print(f'wing-joint zero crossings: {zero_crossings} '
          f'(expect ~{2 * 218 * t[-1] / 1000 * len(wing_cols):.0f} '
          f'for a 218 Hz beat)')
    print('velocimeter range (cm/s):',
          np.round(vel.min(0), 2), '..', np.round(vel.max(0), 2))
    # world_zaxis = world up expressed egocentrically: z ~ +1 upright.
    print('world-zaxis z (stays near +1 while upright):',
          np.round(zaxis[:, 2].min(), 2), '..',
          np.round(zaxis[:, 2].max(), 2))

    if len(sys.argv) > 1:
        np.savez(sys.argv[1], time_ms=t, joints_pos=joints_pos, vel=vel,
                 zaxis=zaxis, actions=actions,
                 joint_names=np.array(names))
        print('saved traces to', sys.argv[1])


if __name__ == '__main__':
    main()
