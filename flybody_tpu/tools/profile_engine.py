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
    p.add_argument('--iters-solver', type=int, default=8)
    p.add_argument('--iters-ls', type=int, default=6)
    p.add_argument('--ncon', type=int, default=32)
    p.add_argument('--refactor', type=int, default=2)
    p.add_argument('--noslip-con', type=int, default=16)
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

    ekw = dict(solver_iterations=args.iters_solver,
               ls_iterations=args.iters_ls, ncon_max=args.ncon,
               refactor_period=args.refactor,
               noslip_contacts=args.noslip_con)

    def s_full(d):
        return jax.vmap(lambda dd: engine.step(model, dd, **ekw))(d)

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

    # Deep stages: solver / noslip / sensors / euler, chained off a full
    # smooth+efc precompute so each is timed in isolation.
    from flybody_tpu.physics import sensors as _sens
    from flybody_tpu.ops import cholesky as _pchol

    def prep(d):
        def one(dd):
            dd, ja, jx = kin.kinematics(model, dd)
            dd = kin.com_pos(model, dd, ja, jx)
            dd = kin.tendon(model, dd)
            con = col.collide(model, dd)
            dd = sm.com_vel(model, dd)
            dd = sm.tendon_vel(model, dd)
            efc = solver.make_efc(model, dd, con,
                                  ncon_max=args.ncon)
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

    def s_solve(arg):
        dd, efc, a_free = arg
        return jax.vmap(
            lambda d1, e1, a1: solver.solve(
                model, d1, e1, a1, iterations=args.iters_solver,
                ls_iterations=args.iters_ls,
                refactor_period=args.refactor)[0])(dd, efc, a_free)

    qacc_prep = jax.jit(s_solve)((d_prep, efc_prep, afree_prep))

    def s_noslip(arg):
        dd, efc, qacc = arg
        zero_f = jnp.zeros(efc.con_J.shape[:2] + (3,), qacc.dtype)
        return jax.vmap(
            lambda d1, e1, q1, f1: solver.noslip(
                model, d1, e1, q1, f1,
                iterations=3, max_contacts=args.noslip_con)[0])(
                    dd, efc, qacc, zero_f)

    def s_sensors(arg):
        dd, efc, qacc = arg
        return jax.vmap(
            lambda d1, e1, q1: _sens.sensordata(
                model, d1.replace(qacc=q1), e1,
                jnp.zeros((e1.con_J.shape[0], 3), q1.dtype)))(
                    dd, efc, qacc)

    def s_euler(arg):
        dd, qacc = arg
        return jax.vmap(
            lambda d1, q1: sm.euler(
                model, d1.replace(
                    qacc=q1,
                    qfrc_constraint=jnp.zeros_like(q1))).qpos)(dd, qacc)

    results['solver(newton)'] = _time(jax.jit(s_solve),
                                      (d_prep, efc_prep, afree_prep),
                                      iters=max(5, args.iters // 5))
    results['noslip'] = _time(jax.jit(s_noslip),
                              (d_prep, efc_prep, qacc_prep),
                              iters=max(5, args.iters // 5))
    results['sensors'] = _time(jax.jit(s_sensors),
                               (d_prep, efc_prep, qacc_prep),
                               iters=args.iters)
    results['euler'] = _time(jax.jit(s_euler), (d_prep, qacc_prep),
                             iters=args.iters)

    # Kernel micro-benches on live Hessian-like matrices.
    H = d_prep.qM
    g = afree_prep

    def k_factor(h):
        return jax.vmap(_pchol.chol_pe)(h)

    def k_solve(arg):
        l, b = arg
        return jax.vmap(_pchol.cho_solve_pe)(l, b)

    def k_fused(arg):
        h, b = arg
        return jax.vmap(_pchol.chol_solve_pe)(h, b)[1]

    L_prep = jax.jit(k_factor)(H)
    results['[chol factor]'] = _time(jax.jit(k_factor), H,
                                     iters=args.iters)
    results['[chol solve-1rhs]'] = _time(jax.jit(k_solve), (L_prep, g),
                                         iters=args.iters)
    results['[chol fused f+s]'] = _time(jax.jit(k_fused), (H, g),
                                        iters=args.iters)

    # Block-arrow kernel micro-benches (same matrices; M is exactly
    # arrow-patterned so the factorization is exact).
    from flybody_tpu.ops import arrow as _arrow
    part = _arrow.build_partition(model.meta)
    if part is not None and _arrow.enabled():
        aops = _arrow.ops_for(part)

        def a_factor(h):
            return jax.vmap(aops.chol_pe)(h)

        def a_solve(arg):
            f, b = arg
            return jax.vmap(aops.solve_pe)(f, b)

        def a_fused(arg):
            h, b = arg
            return jax.vmap(aops.chol_solve_pe)(h, b)[1]

        def a_multi(arg):
            f, b = arg
            return jax.vmap(aops.solve_pe)(f, b)

        F_prep = jax.jit(a_factor)(H)
        g25 = jnp.broadcast_to(g[:, :, None], g.shape + (25,))
        results['[arrow factor]'] = _time(jax.jit(a_factor), H,
                                          iters=args.iters)
        results['[arrow solve-1rhs]'] = _time(jax.jit(a_solve),
                                              (F_prep, g), iters=args.iters)
        results['[arrow fused f+s]'] = _time(jax.jit(a_fused), (H, g),
                                             iters=args.iters)
        results['[arrow solve-25rhs]'] = _time(jax.jit(a_multi),
                                               (F_prep, g25),
                                               iters=args.iters)

    # Solver: needs the full smooth pipeline; time fwd-minus-pieces via
    # the full step and report it as the residual.
    t_full = _time(jax.jit(s_full), d0, iters=max(5, args.iters // 5))
    results['FULL step'] = t_full

    total_known = sum(v for k, v in results.items()
                      if k != 'FULL step' and not k.startswith('['))
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
