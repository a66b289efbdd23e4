"""Hunt the bench-solver divergence source (round-5, VERDICT weak #4).

Round-4 observation: walk_imitation training at --bench-solver settings
shows obs_absmax spikes to ~5e4 (episodes scrubbed by the NaN guards)
that the accurate-solver arm does not show, and the qacc termination
only fires at 1e14 — leaving "where does the physics go?" open.

This tool rolls the SAME walking scene under the accurate and bench
solver configs side by side with a shared stochastic action stream and
logs per-step escape statistics (max |qvel|, max |qacc|); when an env
escapes under one arm only, it dumps the last pre-escape state to
/tmp/diverge_state.npz for single-state knob bisection (--analyze).

Usage:
  python -m tools.hunt_divergence --roll --batch 64 --steps 300
  python -m tools.hunt_divergence --analyze /tmp/diverge_state.npz

CPU-friendly (forces the CPU backend by default; --tpu to override).
Reference behavior anchor: the reference trains on MuJoCo C at fixed
solver settings and relies on qacc termination at 1e14
(/root/reference/flybody/tasks/base.py:222-225, constants.py:21).
"""
import argparse
import os
import sys


ACCURATE = dict(solver_iterations=10, ls_iterations=8, ncon_max=64,
                refactor_period=1, noslip_contacts=None)
BENCH = dict(solver_iterations=8, ls_iterations=6, ncon_max=24,
             refactor_period=8, noslip_contacts=16)


def _make_env(cfg, bench_widths):
    from flybody_tpu.envs import fly_envs
    from flybody_tpu.physics import collision as _col
    if bench_widths:
        _col.MPR_MERGED_TOP_P = 32
        _col.CC_TOP_P = 16
        os.environ.setdefault('FLYBODY_SB_BREAK', '4')
    ref = 'datasets/walk_engine.h5'
    if not os.path.exists(ref):
        ref = None
    return fly_envs.walk_imitation(ref_path=ref, functional=True, **cfg)


def roll(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    # NOTE: both arms share one process; the broadphase widths are
    # module-level, so run the two arms in separate invocations via
    # --arm when widths must differ. Default: widths set to bench
    # values for both (the knob under test is the solver set).
    cfgs = {'accurate': ACCURATE, 'bench': BENCH,
            'bench_iters10': {**BENCH, 'solver_iterations': 10,
                              'ls_iterations': 8}}
    env = _make_env(cfgs[args.arm],
                    bench_widths=args.arm.startswith('bench'))
    B, N = args.batch, args.steps
    rng = jax.random.PRNGKey(args.seed)
    keys = jax.random.split(rng, B)
    reset_v = jax.jit(jax.vmap(env.reset))
    state, ts = reset_v(keys)

    amin, amax = env.action_min, env.action_max

    def step_fn(carry, k):
        st, = carry
        a = jax.random.uniform(k, (B, amin.shape[0]),
                               minval=amin, maxval=amax)
        st2, ts = jax.vmap(env.step)(st, a)
        qv = jnp.max(jnp.abs(st2.data.qvel), axis=-1)
        qa = jnp.max(jnp.abs(st2.data.qacc), axis=-1)
        return (st2,), (qv, qa)

    step_j = jax.jit(lambda st, ks: jax.lax.scan(
        lambda c, k: step_fn(c, k), (st,), ks))

    CHUNK = 25
    qv_hist, qa_hist = [], []
    worst = None
    prev_state = state
    for c in range(0, N, CHUNK):
        ks = jax.random.split(jax.random.fold_in(rng, 1000 + c), CHUNK)
        (state,), (qv, qa) = step_j(prev_state, ks)
        qv = np.asarray(qv)  # (CHUNK, B)
        qa = np.asarray(qa)
        qv_hist.append(qv)
        qa_hist.append(qa)
        n_nonfin = int((~np.isfinite(qv)).any(axis=0).sum())
        print(f'steps {c:4d}-{c+CHUNK:4d}: max|qvel| '
              f'{np.nanmax(qv):.3e}  p99 {np.nanpercentile(qv, 99):.3e}  '
              f'max|qacc| {np.nanmax(qa):.3e}  nonfinite envs {n_nonfin}',
              flush=True)
        bad = ~np.isfinite(qv) | (qv > args.escape_qvel)
        if bad.any() and worst is None:
            # First escaping (step-in-chunk, env); dump the chunk-entry
            # state for that env (<=CHUNK steps before the escape).
            t = np.where(bad.any(axis=1))[0][0]
            b = int(np.where(bad[t])[0][0])
            worst = (c + t, b)
            qp = np.asarray(prev_state.data.qpos[b])
            qvv = np.asarray(prev_state.data.qvel[b])
            ac = np.asarray(prev_state.data.act[b])
            np.savez(args.dump, qpos=qp, qvel=qvv, act=ac,
                     step=c, env=b, arm=args.arm, seed=args.seed,
                     batch=B,
                     qpos_all=np.asarray(prev_state.data.qpos),
                     qvel_all=np.asarray(prev_state.data.qvel),
                     act_all=np.asarray(prev_state.data.act))
            print(f'  escape at step {c+t} env {b} '
                  f'(qvel {qv[t, b]:.3e}): dumped chunk-entry state to '
                  f'{args.dump}')
            print(f'  roll env-{b} per-step max|qvel| (chunk): '
                  f'{[f"{v:.3e}" for v in qv[:min(8, CHUNK), b]]}')
            if args.replay_check:
                # In-process single-env replay from the dumped state
                # with the identical action stream: distinguishes
                # state/action mismatch from a batched-path divergence.
                st1 = jax.tree.map(lambda x: x[b], prev_state)
                ks2 = jax.random.split(
                    jax.random.fold_in(rng, 1000 + c), CHUNK)

                def body1(st, k):
                    a = jax.random.uniform(k, (B, amin.shape[0]),
                                           minval=amin, maxval=amax)[b]
                    st, _ = env.step(st, a)
                    return st, jnp.max(jnp.abs(st.data.qvel))

                _, qv1 = jax.lax.scan(body1, st1, ks2)
                qv1 = np.asarray(qv1)
                print(f'  in-process single-env replay per-step: '
                      f'{[f"{v:.3e}" for v in qv1[:8]]}')
        prev_state = state
    qv_all = np.concatenate(qv_hist)  # (N, B)
    qa_all = np.concatenate(qa_hist)
    esc1e3 = ((qv_all > 1e3) | ~np.isfinite(qv_all)).any(axis=0).sum()
    esc1e4 = ((qv_all > 1e4) | ~np.isfinite(qv_all)).any(axis=0).sum()
    nonfin = (~np.isfinite(qv_all)).any(axis=0).sum()
    qacc14 = ((qa_all > 1e14) | ~np.isfinite(qa_all)).any(axis=0).sum()
    print(f'[{args.arm}] envs escaping |qvel|>1e3: {esc1e3}/{B}; '
          f'>1e4: {esc1e4}/{B}; non-finite: {nonfin}/{B}; '
          f'qacc>1e14 or non-finite (terminal): {qacc14}/{B}')
    print(f'[{args.arm}] final max|qvel| {np.nanmax(qv_all[-1]):.3e} '
          f'median-over-envs of per-env max '
          f'{np.median(np.nanmax(qv_all, axis=0)):.3e}')


def analyze(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    blob = np.load(args.analyze)
    print(f'state from arm={blob["arm"]} step={blob["step"]} '
          f'env={blob["env"]}; widths mpr={os.environ.get("FLYBODY_MPR_TOP_P")} '
          f'cc={os.environ.get("FLYBODY_CC_TOP_P")} '
          f'sb={os.environ.get("FLYBODY_SB_BREAK")}')

    all_variants = {
        'accurate': ACCURATE,
        'bench': BENCH,
        'bench+iters10/ls8': {**BENCH, 'solver_iterations': 10,
                              'ls_iterations': 8},
        'bench+ncon64': {**BENCH, 'ncon_max': 64},
        'bench+rf1': {**BENCH, 'refactor_period': 1},
        'bench+noslip_all': {**BENCH, 'noslip_contacts': None},
    }
    variants = ({args.variant: all_variants[args.variant]}
                if args.variant else all_variants)
    # Replay the EXACT action stream the dumped env saw in its escape
    # chunk (the roll derives actions as
    # uniform(split(fold_in(key(seed), 1000+chunk), CHUNK)[t], (B, A))),
    # so the escape event reproduces deterministically per variant.
    rng = jax.random.PRNGKey(int(blob['seed']))
    chunk_start = int(blob['step'])
    b = int(blob['env'])
    B = int(blob['batch'])
    n_steps = 25  # == roll CHUNK
    R = args.vmap_replicas
    for name, cfg in variants.items():
        env = _make_env(cfg, bench_widths=False)
        state, _ = env.reset(rng)
        data = state.data.replace(qpos=jnp.asarray(blob['qpos']),
                                  qvel=jnp.asarray(blob['qvel']),
                                  act=jnp.asarray(blob['act']))
        state = state.replace(data=data)
        amin, amax = env.action_min, env.action_max

        if args.full_batch:
            # Replay the WHOLE heterogeneous batch exactly as the roll
            # stepped it (all envs' dumped states + full action matrix):
            # if this escapes while the replicated batch does not, the
            # escape depends on the OTHER lanes' data — i.e. a batched
            # kernel rule couples envs that must be independent.
            keys = jax.random.split(jax.random.PRNGKey(int(blob['seed'])),
                                    B)
            state, _ = jax.jit(jax.vmap(env.reset))(keys)
            data = state.data.replace(
                qpos=jnp.asarray(blob['qpos_all']),
                qvel=jnp.asarray(blob['qvel_all']),
                act=jnp.asarray(blob['act_all']))
            state = state.replace(data=data)

            def body(st, k):
                a = jax.random.uniform(k, (B, amin.shape[0]),
                                       minval=amin, maxval=amax)
                st, _ = jax.vmap(env.step)(st, a)
                return st, jnp.max(jnp.abs(st.data.qvel[b]))
        elif R:
            # Replay inside a vmapped batch of R identical replicas:
            # the batched custom_vmap kernel paths (the ones training
            # and the roll actually execute) differ from the single-env
            # path, and the escape may live only there.
            state = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (R,) + jnp.shape(x)),
                state)

            def body(st, k):
                a = jax.random.uniform(k, (B, amin.shape[0]),
                                       minval=amin, maxval=amax)[b]
                st, _ = jax.vmap(env.step)(
                    st, jnp.broadcast_to(a, (R,) + a.shape))
                return st, jnp.max(jnp.abs(st.data.qvel))
        else:
            def body(st, k):
                a = jax.random.uniform(k, (B, amin.shape[0]),
                                       minval=amin, maxval=amax)[b]
                st, _ = env.step(st, a)
                return st, jnp.max(jnp.abs(st.data.qvel))

        ks = jax.random.split(
            jax.random.fold_in(rng, 1000 + chunk_start), n_steps)
        _, qv = jax.lax.scan(body, state, ks)
        qv = np.asarray(qv)
        first_bad = np.where(~np.isfinite(qv) | (qv > 1e4))[0]
        tag = (f'ESCAPES at step {first_bad[0]}' if first_bad.size
               else 'stays bounded')
        print(f'{name:<22} (replicas={R}) max|qvel| over {n_steps} '
              f'ctrl steps: {np.nanmax(qv):.4e}  final {qv[-1]:.4e}  '
              f'{tag}', flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--roll', action='store_true')
    p.add_argument('--analyze', default=None)
    p.add_argument('--arm',
                   choices=('accurate', 'bench', 'bench_iters10'),
                   default='bench')
    p.add_argument('--batch', type=int, default=64)
    p.add_argument('--steps', type=int, default=300)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--escape-qvel', type=float, default=1e4)
    p.add_argument('--dump', default='/tmp/diverge_state.npz')
    p.add_argument('--tpu', action='store_true')
    p.add_argument('--full-batch', action='store_true',
                   help='replay the whole dumped heterogeneous batch '
                        '(tests cross-env coupling in batched kernels)')
    p.add_argument('--replay-check', action='store_true',
                   help='after dumping an escape, immediately replay it '
                        'single-env in-process and print both traces')
    p.add_argument('--vmap-replicas', type=int, default=0,
                   help='replay inside a vmapped batch of N identical '
                        'replicas (exercises the batched kernel paths)')
    p.add_argument('--variant', default=None,
                   help='run a single named solver variant (one width '
                        'config per process: set FLYBODY_MPR_TOP_P / '
                        'FLYBODY_CC_TOP_P / FLYBODY_SB_BREAK env vars)')
    args = p.parse_args()

    import jax
    if not args.tpu:
        jax.config.update('jax_platforms', 'cpu')

    if args.roll:
        roll(args)
    elif args.analyze:
        analyze(args)
    else:
        p.print_help()
        sys.exit(1)


if __name__ == '__main__':
    main()
