"""Minimal repro: long scanned engine rollouts fault the TPU worker.

One device program scanning N engine control steps at batch B. Observed
on v5e (axon): N >= ~3000 at B >= 256 kills the worker (round-1 fault
class, still present 2026-08-19); N <= 500 runs clean. Library
mitigations: train/evaluate.py `evaluate(..., chunk=250)` and
tools/gait_search.py host-chunked rollouts.

Usage:
  python -m tools.repro_long_scan --steps 3000 --batch 256   # faults
  python -m tools.repro_long_scan --steps 500  --batch 256   # clean
Each invocation is one process so a worker crash is attributable.
"""
import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=3000)
    p.add_argument('--batch', type=int, default=256)
    p.add_argument('--substeps', type=int, default=10)
    p.add_argument('--cpu', action='store_true')
    args = p.parse_args()

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
    qpos = jnp.tile(model.qpos0[None], (B, 1)).at[:, 2].set(0.1)

    @jax.jit
    def roll(qp):
        def one(q):
            d = make_data(model).replace(qpos=q)
            d = engine.step(model, d, ncon_max=24, solver_iterations=8,
                            ls_iterations=6, refactor_period=8,
                            noslip_contacts=16)

            def body(dd, _):
                dd = engine.step(model, dd, ncon_max=24,
                                 solver_iterations=8, ls_iterations=6,
                                 refactor_period=8, noslip_contacts=16)
                return dd, None
            d, _ = jax.lax.scan(body, d, None, length=args.steps - 1)
            return d
        return jax.vmap(one)(qp).qpos.sum()

    t0 = time.perf_counter()
    v = float(roll(qpos))
    print(f'OK steps={args.steps} batch={args.batch} '
          f'sum={v:.3e} {time.perf_counter() - t0:.1f}s', flush=True)


if __name__ == '__main__':
    main()
