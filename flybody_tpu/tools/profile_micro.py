"""Micro-profiler for collide / make_efc / Newton internals on TPU.

Breaks the three dominant stages of the substep into their constituent
ops so optimization targets measured sub-costs:

    python -m flybody_tpu.tools.profile_micro --batch 8192 --iters 10
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


class _Results(dict):
    """Prints each timing as soon as it lands (a late crash must not
    swallow earlier results)."""

    def __setitem__(self, k, v):
        print(f'{k:<40} {v * 1e3:>9.3f} ms', flush=True)
        super().__setitem__(k, v)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=8192)
    p.add_argument('--iters', type=int, default=10)
    p.add_argument('--cpu', action='store_true')
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from flybody_tpu.envs import fly_envs
    from flybody_tpu.physics import collision as col
    from flybody_tpu.physics import solver
    from flybody_tpu.physics import kinematics as kin
    from flybody_tpu.physics import smooth as sm
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

    def pos_stage(d):
        d, ja, jx = jax.vmap(lambda dd: kin.kinematics(model, dd))(d)
        d = jax.vmap(lambda dd, a, x: kin.com_pos(model, dd, a, x))(
            d, ja, jx)
        d = jax.vmap(lambda dd: kin.tendon(model, dd))(d)
        d = jax.vmap(lambda dd: sm.com_vel(model, dd))(d)
        return d

    d_pos = jax.jit(pos_stage)(d0)
    d_pos = jax.block_until_ready(d_pos)

    print(f'batch={B} platform={jax.devices()[0].platform}', flush=True)
    tb = col.pair_tables(model.meta)
    results = _Results()

    # --- collide per group.
    for key, (g1, g2, k) in tb['groups'].items():
        if k == 1 and key[0] != 0 and len(g1) > col.MPR_TOP_P:
            fn = jax.jit(jax.vmap(
                lambda dd: col._mpr_topp(model, dd, key, g1, g2)))
        else:
            h = col._handler(key)
            fn = jax.jit(jax.vmap(lambda dd: h(col._gather_group(
                model, col._geom_cat(dd), g1, g2))))
        results[f'collide {key} n={len(g1)}'] = _time(
            fn, d_pos, iters=args.iters)

    con = jax.jit(jax.vmap(lambda dd: col.collide(model, dd)))(d_pos)
    con = jax.block_until_ready(con)

    # --- make_efc pieces.
    params = col.slot_params(model)

    def topk(dd, cc):
        score = cc.dist - params.includemargin.astype(cc.dist.dtype)
        _, sel = jax.lax.top_k(-score, 64)
        return sel

    results['efc top_k(64)'] = _time(
        jax.jit(jax.vmap(topk)), d_pos, con, iters=args.iters)
    results['efc full'] = _time(
        jax.jit(jax.vmap(lambda dd, cc: solver.make_efc(model, dd, cc))),
        d_pos, con, iters=args.iters)

    efc = jax.jit(jax.vmap(
        lambda dd, cc: solver.make_efc(model, dd, cc)))(d_pos, con)
    efc = jax.block_until_ready(efc)

    # --- smooth pieces needed by solver.
    d_crb = jax.jit(jax.vmap(lambda dd: sm.crb(model, dd)))(d_pos)
    d_crb = jax.jit(jax.vmap(lambda dd: sm.rne(model, dd)))(d_crb)
    d_crb = jax.jit(jax.vmap(
        lambda dd: dd.replace(qfrc_smooth=-dd.qfrc_bias)))(d_crb)
    d_fac = jax.jit(jax.vmap(lambda dd: sm.factor_m(model, dd)))(d_crb)
    d_fac = jax.block_until_ready(d_fac)
    a_free = jax.jit(jax.vmap(
        lambda dd: sm.solve_m(model, dd, dd.qfrc_smooth)))(d_fac)
    a_free = jax.block_until_ready(a_free)

    results['factor_m'] = _time(
        jax.jit(jax.vmap(lambda dd: sm.factor_m(model, dd))), d_crb,
        iters=args.iters)
    results['solve_m (vec)'] = _time(
        jax.jit(jax.vmap(lambda dd, b: sm.solve_m(model, dd, b))),
        d_fac, a_free, iters=args.iters)

    # --- one Newton iteration decomposition.
    def grad_hess(dd, e, x):
        jar_l, f_l, jar_c, f_c = solver._constraint_cost_grad_hess(e, x)
        M = dd.qM
        nv = model.meta.nv
        dtype = x.dtype
        lim_onehot = jax.nn.one_hot(jnp.asarray(e.lim_dof), nv, dtype=dtype)
        g = M @ x - lim_onehot.T @ (
            f_l * jnp.asarray(e.lim_sign, dtype))
        g = g - jnp.einsum('krv,kr->v', e.con_J, f_c)
        act_l = e.lim_active * (jar_l < 0)
        hd = e.lim_D * act_l
        Hc = solver._cone_hessian(jar_c, e.con_mu, e.con_frictional,
                                  e.con_active) * e.con_D[:, None, None]
        JH = jnp.einsum('krs,ksv->krv', Hc, e.con_J)
        H = M + jnp.einsum('krv,krw->vw', e.con_J, JH)
        H = H + lim_onehot.T @ (hd[:, None] * lim_onehot)
        return g, H

    results['newton grad+hess'] = _time(
        jax.jit(jax.vmap(grad_hess)), d_fac, efc, a_free,
        iters=args.iters)

    gH = jax.jit(jax.vmap(grad_hess))(d_fac, efc, a_free)
    g, H = jax.block_until_ready(gH)

    from flybody_tpu.ops import cholesky as _pchol
    results['newton chol(H)'] = _time(
        jax.jit(jax.vmap(lambda h: _pchol.chol_pe(
            h + 1e-12 * jnp.eye(model.meta.nv, dtype=h.dtype)))), H,
        iters=args.iters)
    L = jax.jit(jax.vmap(lambda h: _pchol.chol_pe(
        h + 1e-12 * jnp.eye(model.meta.nv, dtype=h.dtype))))(H)
    L = jax.block_until_ready(L)
    results['newton cho_solve'] = _time(
        jax.jit(jax.vmap(_pchol.cho_solve_pe)), L, g, iters=args.iters)

    # Full solve at (8, 6) iterations for reference.
    results['solve 8x6'] = _time(
        jax.jit(jax.vmap(lambda dd, e, af: solver.solve(
            model, dd, e, af, iterations=8, ls_iterations=6))),
        d_fac, efc, a_free, iters=max(2, args.iters // 3))
    results['noslip 3'] = _time(
        jax.jit(jax.vmap(lambda dd, e, af: solver.noslip(
            model, dd, e, af, 0.0 * e.con_aref,
            iterations=3))),
        d_fac, efc, a_free, iters=max(2, args.iters // 3))

    print(f'done: batch={B} platform={jax.devices()[0].platform}')


if __name__ == '__main__':
    main()
