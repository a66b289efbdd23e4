"""Getting started: create a fly environment, step it, render a frame.

Counterpart of the reference's getting-started notebook
(flybody docs): build an environment via the factory API, inspect
specs, roll a random policy, and render a third-person frame with the
on-device ray tracer.

Run on CPU (no TPU needed):
    python examples/01_getting_started.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from anywhere without install

import jax

jax.config.update('jax_platforms', 'cpu')  # comment out to use the TPU

import numpy as np

from flybody_tpu.envs import fly_envs
from flybody_tpu.tools.utils import get_random_policy, rollout_and_render


def main():
    # dm_env-compatible surface (numpy in / numpy out).
    env = fly_envs.walk_on_ball(seed=0)
    print('observations:', list(env.observation_spec()))
    print('actions:', env.action_spec().shape)

    policy = get_random_policy(env.action_spec())
    out = rollout_and_render(env, policy, n_steps=10,
                             camera_ids=('track',), size=48)
    print('rollout rewards:', np.round(out['rewards'], 3))

    img = out['frames'][0]['track']
    chars = ' .:-=+*#%@'
    print('\ntracking camera view (ASCII):')
    for row in img[::2]:
        print(''.join(chars[min(int(v / 25.6), 9)] for v in row))

    # The functional surface: jit/vmap over thousands of flies.
    fenv = fly_envs.walk_on_ball(functional=True)
    import jax.numpy as jnp
    rngs = jax.random.split(jax.random.PRNGKey(0), 8)
    states, ts = jax.vmap(fenv.reset)(rngs)
    actions = jnp.zeros((8, fenv.tables.num_actions))
    states, ts = jax.jit(jax.vmap(fenv.step))(states, actions)
    print('\nbatched step: rewards', np.round(np.asarray(ts.reward), 3))


if __name__ == '__main__':
    main()
