"""Minimal repro: wide broadphase compaction + (8,8) Newton shapes
fault the TPU runtime.

Observed on v5e (axon, 2026-08-18/19): a batched walking substep with
FLYBODY_MPR_TOP_P=96 and FLYBODY_CC_TOP_P=64 and solver (8, 8)
reproducibly faults the runtime (UNAVAILABLE/ABORTED worker), while the
shipped 32/16 widths run clean at the same batch. The fault was
"avoided rather than chased" in round 3 (ARCHITECTURE.md); this script
makes it attributable: one process, one configuration, one substep.

Usage (each invocation is one process so a worker crash is attributable):
  python tools/repro_topp_fault.py                  # shipped 32/16: clean
  python tools/repro_topp_fault.py --mpr 96 --cc 64 # faults the worker
"""
import argparse
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--mpr', type=int, default=32)
    p.add_argument('--cc', type=int, default=16)
    p.add_argument('--batch', type=int, default=8192)
    p.add_argument('--iters', type=int, default=8)
    p.add_argument('--ls', type=int, default=8)
    p.add_argument('--steps', type=int, default=3)
    p.add_argument('--cpu', action='store_true')
    args = p.parse_args()
    # Must be set before the collision module is imported.
    os.environ['FLYBODY_MPR_TOP_P'] = str(args.mpr)
    os.environ['FLYBODY_CC_TOP_P'] = str(args.cc)

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    from flybody_tpu.envs import fly_envs
    from flybody_tpu.physics import engine
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
    qpos = (qpos + 0.01 * jax.random.normal(rng, qpos.shape, jnp.float32))
    qpos = qpos.at[:, 2].set(0.1)
    qvel = 0.3 * jax.random.normal(rng, (B, model.meta.nv), jnp.float32)
    kw = dict(ncon_max=24, solver_iterations=args.iters,
              ls_iterations=args.ls, refactor_period=8,
              noslip_contacts=16)

    @jax.jit
    def run(qp, qv):
        def one(q, v):
            d = make_data(model).replace(qpos=q, qvel=v)
            for _ in range(args.steps):
                d = engine.step(model, d, **kw)
            return d
        out = jax.vmap(one)(qp, qv)
        return out.qpos.sum() + out.qvel.sum()

    print(f'mpr={args.mpr} cc={args.cc} batch={B} '
          f'solver=({args.iters},{args.ls})', flush=True)
    t0 = time.perf_counter()
    v = float(run(qpos, qvel))
    print(f'compiled+ran in {time.perf_counter() - t0:.1f}s '
          f'chk={v:.4e}', flush=True)
    t0 = time.perf_counter()
    v = float(run(qpos, qvel))
    print(f'steady state {time.perf_counter() - t0:.2f}s chk={v:.4e} '
          f'=> CLEAN', flush=True)


if __name__ == '__main__':
    main()
