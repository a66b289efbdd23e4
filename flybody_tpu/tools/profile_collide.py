"""Collide-stage micro-profiler: per-group narrowphase timings at batch.

Usage: python -m flybody_tpu.tools.profile_collide --batch 8192
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=20, warmup=2):
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
    p.add_argument('--iters', type=int, default=20)
    p.add_argument('--cpu', action='store_true')
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from flybody_tpu.envs import fly_envs
    from flybody_tpu.physics import collision as col
    from flybody_tpu.physics import kinematics as kin
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
    d0 = jax.vmap(lambda q: make_data(model).replace(qpos=q))(qpos)
    d0 = jax.jit(jax.vmap(
        lambda dd: kin.fwd_position_smooth(model, dd)[0]))(d0)

    tb = col.pair_tables(model.meta)
    results = {}

    def group_fn(key, g1, g2, k):
        def f(d):
            def one(dd):
                gcat = col._geom_cat(dd)
                if (k == 1 and key[0] != col._s.GEOM_PLANE
                        and len(g1) > col.MPR_TOP_P):
                    return col._mpr_topp(model, dd, key, g1, g2, gcat=gcat)
                return col._handler(key)(
                    col._gather_group(model, gcat, g1, g2))
            return jax.vmap(one)(d)
        return f

    for key, (g1, g2, k) in tb['groups'].items():
        f = jax.jit(group_fn(key, g1, g2, k))
        results[f'{key} n={len(g1)}'] = _time(f, d0, iters=args.iters)

    full = jax.jit(lambda d: jax.vmap(
        lambda dd: col.collide(model, dd))(d))
    results['FULL collide'] = _time(full, d0, iters=args.iters)

    print(f'\nbatch={B} platform={jax.devices()[0].platform}')
    for k_, v in results.items():
        print(f'{k_:<28} {v * 1e3:>9.3f} ms')


if __name__ == '__main__':
    main()
