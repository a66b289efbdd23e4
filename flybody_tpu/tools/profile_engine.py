"""Engine stage profiler: wall-time breakdown of the physics step.

Times each pipeline stage (jit'd, batched, donated where possible) so
optimization work (pallas kernels, precision changes) targets measured
hot spots instead of guesses.

Usage:
    python -m flybody_tpu.tools.profile_engine --batch 8192 --iters 50
    python -m flybody_tpu.tools.profile_engine --cpu --batch 64
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=50, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=8192)
    p.add_argument('--iters', type=int, default=50)
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--task', default='walk_imitation')
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from flybody_tpu.envs import fly_envs
    from flybody_tpu.physics import collision as col
    from flybody_tpu.physics import engine, solver
    from flybody_tpu.physics import kinematics as kin
    from flybody_tpu.physics import smooth as sm
    from flybody_tpu.physics import fluid as fl
    from flybody_tpu.physics.state import make_data

    model = fly_envs._walking_model(False, True, 0.01)
    model = jax.tree.map(
        lambda x: (jnp.asarray(x, jnp.float32)
                   if hasattr(x, 'dtype') and
                   jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                   else jnp.asarray(x)), model)
    B = args.batch
    rng = jax.random.PRNGKey(0)
    qpos = jnp.tile(model.qpos0[None], (B, 1))
    qpos = qpos + 0.01 * jax.random.normal(rng, qpos.shape, jnp.float32)
    qvel = 0.1 * jax.random.normal(rng, (B, model.meta.nv), jnp.float32)
    d0 = jax.vmap(lambda q, v: make_data(model).replace(qpos=q, qvel=v))(
        qpos, qvel)

    # Stage chain: each stage consumes the previous stage's output.
    def s_kin(d):
        d, ja, jx = jax.vmap(lambda dd: kin.kinematics(model, dd))(d)
        return d, ja, jx

    def s_com(arg):
        d, ja, jx = arg
        return jax.vmap(lambda dd, a, x: kin.com_pos(model, dd, a, x))(
            d, ja, jx)

    def s_tendon(d):
        return jax.vmap(lambda dd: kin.tendon(model, dd))(d)

    def s_collide(d):
        return jax.vmap(lambda dd: col.collide(model, dd))(d)

    def s_vel(d):
        d = jax.vmap(lambda dd: sm.com_vel(model, dd))(d)
        return jax.vmap(lambda dd: sm.tendon_vel(model, dd))(d)

    def s_efc(arg):
        d, con = arg
        return jax.vmap(lambda dd, cc: solver.make_efc(model, dd, cc))(
            d, con)

    def s_crb(d):
        return jax.vmap(lambda dd: sm.crb(model, dd))(d)

    def s_rne(d):
        return jax.vmap(lambda dd: sm.rne(model, dd))(d)

    def s_passive(d):
        return jax.vmap(lambda dd: sm.passive(model, dd))(d)

    def s_fluid(d):
        return jax.vmap(lambda dd: fl.fluid(model, dd))(d)

    def s_factor(d):
        return jax.vmap(lambda dd: sm.factor_m(model, dd))(d)

    def s_full(d):
        return jax.vmap(lambda dd: engine.step(model, dd))(d)

    # Build the chained inputs once.
    j_kin = jax.jit(s_kin)
    arg_kin = j_kin(d0)
    d_pos = jax.jit(s_com)(arg_kin)
    d_pos = jax.jit(s_tendon)(d_pos)
    con = jax.jit(s_collide)(d_pos)
    d_vel = jax.jit(s_vel)(d_pos)
    d_crb = jax.jit(s_crb)(d_vel)

    results = {}
    results['kinematics'] = _time(j_kin, d0, iters=args.iters)
    results['com_pos+cdof'] = _time(jax.jit(s_com), arg_kin,
                                    iters=args.iters)
    results['collide'] = _time(jax.jit(s_collide), d_pos, iters=args.iters)
    results['com_vel+tendon'] = _time(jax.jit(s_vel), d_pos,
                                      iters=args.iters)
    results['make_efc'] = _time(jax.jit(s_efc), (d_vel, con),
                                iters=args.iters)
    results['crb(M)'] = _time(jax.jit(s_crb), d_vel, iters=args.iters)
    results['rne(bias)'] = _time(jax.jit(s_rne), d_crb, iters=args.iters)
    results['passive'] = _time(jax.jit(s_passive), d_crb, iters=args.iters)
    results['fluid'] = _time(jax.jit(s_fluid), d_crb, iters=args.iters)
    results['factor_m(chol)'] = _time(jax.jit(s_factor), d_crb,
                                      iters=args.iters)

    # Solver: needs the full smooth pipeline; time fwd-minus-pieces via
    # the full step and report it as the residual.
    t_full = _time(jax.jit(s_full), d0, iters=max(5, args.iters // 5))
    results['FULL step'] = t_full

    total_known = sum(v for k, v in results.items() if k != 'FULL step')
    print(f'\nbatch={B} platform={jax.devices()[0].platform} '
          f'({args.iters} iters)')
    print(f'{"stage":<18} {"ms":>9} {"% of step":>10}')
    for k, v in results.items():
        print(f'{k:<18} {v * 1e3:>9.3f} {100 * v / t_full:>9.1f}%')
    print(f'{"solver+rest (resid)":<18} {(t_full - total_known) * 1e3:>8.3f} '
          f'{100 * (1 - total_known / t_full):>9.1f}%')
    print(f'steps/s (physics substeps x batch): {B / t_full:,.0f}')


if __name__ == '__main__':
    main()
