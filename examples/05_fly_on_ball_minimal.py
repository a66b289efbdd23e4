"""Minimal fly-on-ball simulation at the raw physics layer.

Counterpart of the reference's fly-on-ball-minimal notebook
(reference docs/fly-on-ball-minimal.ipynb): where the notebook edits
the MJCF tree with dm_control and steps raw MuJoCo, here the build-time
surgery API produces a compiled static model (tethered fly + 3-dof ball
joint) and the batched engine steps it directly — no task/env wrapper.
Mirrors the notebook's recipe: spin the ball backwards, actuate ONLY
the leg actuators with random commands, and watch the ball's rotation.

Run on CPU (no TPU needed):
    python examples/05_fly_on_ball_minimal.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from anywhere without install

import jax

jax.config.update('jax_platforms', 'cpu')  # comment out to use the TPU

import jax.numpy as jnp
import numpy as np

from flybody_tpu.envs import fly_envs
from flybody_tpu.physics import engine
from flybody_tpu.physics.state import make_data


def main():
    # Build-time surgery: remove the freejoint (tether), retract wings,
    # add the floating ball with its 3-dof ball joint — the compiled
    # equivalent of the notebook's MJCF tree edits.
    model = fly_envs._ball_model(force_actuators=False,
                                 disable_wings=True)
    meta = model.meta
    print(f'model: nq={meta.nq} nv={meta.nv} nu={meta.nu} '
          f'ngeom={meta.ngeom}')

    # Leg actuators only (coxa/femur/tibia/tarsus), as in the notebook.
    leg_sub = ('coxa', 'femur', 'tibia', 'tarsus')
    leg_u = [i for i, n in enumerate(meta.actuator_names)
             if any(s in n for s in leg_sub) and 'adhere' not in n]
    print(f'{len(leg_u)} leg actuators of {meta.nu} total')

    # Ball joint dofs.
    jid = [j for j, n in enumerate(meta.jnt_names) if n == 'ball'][0]
    dof = int(np.array(meta.jnt_dofadr)[jid])

    # Initial state: ball spinning backwards under the fly
    # (physics.named.data.qvel['ball'] = [0, -2, 0] in the notebook).
    data = make_data(model)
    qvel0 = jnp.zeros((meta.nv,)).at[dof + 1].set(-2.0)
    data = data.replace(qvel=qvel0,
                        qacc=jnp.zeros((meta.nv,), data.qpos.dtype))

    rng = np.random.RandomState(0)
    step = jax.jit(lambda d: engine.step(model, d, solver_iterations=10,
                                         ls_iterations=8).strip())

    print('\n   t(ms)   ball angvel (rad/s)      fly height (cm)')
    ctrl = np.zeros(meta.nu, np.float32)
    for i in range(200):
        if i % 10 == 0:  # control at 10x the physics timestep
            ctrl[leg_u] = rng.uniform(-0.5, 0.5, size=len(leg_u))
            data = data.replace(ctrl=jnp.asarray(ctrl))
        data = step(data)
        if i % 40 == 0:
            w = np.asarray(data.qvel[dof:dof + 3])
            print(f'  {float(data.time) * 1000:6.1f}   '
                  f'[{w[0]:6.2f} {w[1]:6.2f} {w[2]:6.2f}]   '
                  f'(tethered thorax fixed)')

    w = np.asarray(data.qvel[dof:dof + 3])
    assert np.all(np.isfinite(np.asarray(data.qpos)))
    print(f'\nfinal ball angvel: {np.round(w, 2)} rad/s — the legs '
          'transmit force to the ball through contacts + adhesion.')

    # The task-level API wraps exactly this scene:
    env = fly_envs.walk_on_ball(seed=0)
    ts = env.reset()
    print('\ntask-level walk_on_ball obs:',
          [k for k in ts.observation if 'ball' in k])


if __name__ == '__main__':
    main()
