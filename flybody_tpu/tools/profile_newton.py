"""Newton-solve-only profiler: isolated wall time of solver.solve at
walking-scene states, for fast A/B iteration on the Newton kernels.

The full-engine profiler (profile_engine.py) times every stage and takes
~20 min at batch 8192 on the tunneled chip; this tool preps the scene
once and times ONLY the contact solve, so a kernel change can be
measured in ~3 min. Timings include the host-sync tunnel RTT constant
(measure an empty sync with --rtt to subtract).

Usage:
    python -m flybody_tpu.tools.profile_newton --batch 8192 --iters 10
    FLYBODY_NEWTON_WHOLE=0 python -m flybody_tpu.tools.profile_newton
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=10, warmup=2):
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
    p.add_argument('--iters', type=int, default=10)
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--iters-solver', type=int, default=8)
    p.add_argument('--iters-ls', type=int, default=6)
    p.add_argument('--ncon', type=int, default=24)
    p.add_argument('--refactor', type=int, default=8)
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from flybody_tpu.envs import fly_envs
    from flybody_tpu.physics import collision as col
    from flybody_tpu.physics import solver
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

    def prep(d):
        def one(dd):
            dd, ja, jx = kin.kinematics(model, dd)
            dd = kin.com_pos(model, dd, ja, jx)
            dd = kin.tendon(model, dd)
            con = col.collide(model, dd)
            dd = sm.com_vel(model, dd)
            dd = sm.tendon_vel(model, dd)
            efc = solver.make_efc(model, dd, con, ncon_max=args.ncon)
            dd = sm.actuation(model, dd)
            dd = sm.crb(model, dd)
            dd = sm.rne(model, dd)
            dd = sm.passive(model, dd)
            dd = fl.fluid(model, dd)
            qfrc_smooth = (dd.qfrc_passive + dd.qfrc_fluid
                           + dd.qfrc_actuator - dd.qfrc_bias)
            dd = dd.replace(qfrc_smooth=qfrc_smooth)
            dd = sm.factor_m(model, dd)
            a_free = sm.solve_m(model, dd, qfrc_smooth)
            return dd.replace(contact=con), efc, a_free
        return jax.vmap(one)(d)

    d_prep, efc_prep, afree_prep = jax.jit(prep)(d0)
    jax.block_until_ready(afree_prep)

    def s_solve(arg):
        dd, efc, a_free = arg
        return jax.vmap(
            lambda d1, e1, a1: solver.solve(
                model, d1, e1, a1, iterations=args.iters_solver,
                ls_iterations=args.iters_ls,
                refactor_period=args.refactor)[0])(dd, efc, a_free)

    # Empty-sync RTT: fetching one element of an already-materialized
    # array costs one tunnel round trip and no compute.
    sync = jax.jit(lambda x: x[0, 0] + 1.0)
    rtt = _time(sync, afree_prep.reshape(B, -1), iters=args.iters)

    t = _time(jax.jit(s_solve), (d_prep, efc_prep, afree_prep),
              iters=args.iters)
    print(f'batch={B} platform={jax.devices()[0].platform} '
          f'solver_iters={args.iters_solver} ls={args.iters_ls} '
          f'ncon={args.ncon} refactor={args.refactor}')
    print(f'host-sync RTT      {rtt * 1e3:9.3f} ms')
    print(f'solve (raw)        {t * 1e3:9.3f} ms')
    print(f'solve (minus RTT)  {(t - rtt) * 1e3:9.3f} ms')


if __name__ == '__main__':
    main()
