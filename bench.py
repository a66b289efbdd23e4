"""Benchmark: walk_imitation env-steps/s on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}. vs_baseline is measured against the rebuild target of
100,000 walk-imitation env-steps/s/chip (BASELINE.json north star; the
reference publishes no throughput numbers).

Env overrides: BENCH_BATCH (default 8192), BENCH_STEPS (default 5),
BENCH_TASK (walk_imitation | flight_imitation). The round-1 axon
runtime fault at batch 8192 with >= 10 scanned control steps no longer
reproduces after the round-2 kernel rewrites (BENCH_STEPS=20 verified
clean); 5 steps x 3 timed reps is just the wall-clock-friendly default
and measures the same steady-state throughput.
"""

import json
import os
import time

import numpy as np

TARGET = 100_000.0  # env-steps/s/chip @ batch 8192 (BASELINE.json)


def main():
    import jax
    import jax.numpy as jnp

    batch = int(os.environ.get('BENCH_BATCH', 8192))
    steps = int(os.environ.get('BENCH_STEPS', 5))
    task = os.environ.get('BENCH_TASK', 'walk_imitation')

    # Broadphase compaction widths (round-4): the one-hot gather GEMMs
    # and the MPR kernel scale with P; active contacts peak ~15, and
    # tests/test_solver_knobs.py::test_topp_32_16_solver_accuracy
    # asserts the ACTIVE contact set at 32/16 is identical to the wide
    # default with qacc tracking the converged solve. +25% bench
    # measured (13,217 -> 16,563 at batch 8192). Overridable for A/B.
    os.environ.setdefault('FLYBODY_MPR_TOP_P', '32')
    os.environ.setdefault('FLYBODY_CC_TOP_P', '16')
    # Woodbury cross-limb budget: active cross-limb (leg-leg) contact
    # rows are rare in the walking scene and the whole-solve Newton
    # kernel's Z-solve/capacitance work scales with 3*SB. 8 -> 4
    # measured 21.5 -> 16.1 ms isolated solve (round 5,
    # tools/profile_newton.py); accuracy gated by
    # tests/test_solver_knobs.py::test_sb_break_solver_accuracy.
    os.environ.setdefault('FLYBODY_SB_BREAK', '4')

    from flybody_tpu.envs import fly_envs

    # Perf configuration (overridable for A/B runs): 24 contact slots
    # cover the walking scene's ~9 active contacts (random-actuation
    # contact-rich poses measured <= 24 active; qacc accuracy vs the
    # converged 64-slot solve asserted by
    # tests/test_solver_knobs.py::test_ncon24_solver_accuracy; +6%
    # bench vs 32 measured on v5e). noslip runs on the 16 deepest slots.
    ncon = int(os.environ.get('BENCH_NCON', 24))
    # refactor_period=8 at 8 iterations (1 fresh + 7 reuse steps): the
    # fused reuse kernel is ~1.2 ms/iter vs ~13 ms for a fresh
    # factor+solve iteration, and accuracy stays in the shipped regime
    # (median rel qacc err 2.3e-3 vs 30-iter reference, p95 0.076 over
    # 4096 rollout states; refactor=4 measures p95 0.012 but costs 14%
    # more wall clock -- sweep /tmp/solver_acc.py methodology).
    refactor = int(os.environ.get('BENCH_REFACTOR', 8))
    noslip_con = int(os.environ.get('BENCH_NOSLIP_CON', 16))
    walk_iters = int(os.environ.get('BENCH_SOLVER_ITERS', 8))
    ls_iters = int(os.environ.get('BENCH_LS_ITERS', 6))
    if task == 'flight_imitation':
        env = fly_envs.flight_imitation(
            functional=True,
            solver_iterations=int(os.environ.get('BENCH_SOLVER_ITERS', 6)),
            ls_iterations=ls_iters,
            ncon_max=ncon,
            refactor_period=refactor,
            noslip_contacts=noslip_con)
    elif task in ('vision_bumps', 'vision_trench'):
        # Vision stepping throughput INCLUDING on-device eye rendering
        # (VERDICT r3 item 4). The rollout checksum must consume the eye
        # observations or XLA dead-code-eliminates the renderer.
        env = fly_envs.vision_guided_flight(
            functional=True,
            bumps_or_trench=task.split('_')[1],
            solver_iterations=int(os.environ.get('BENCH_SOLVER_ITERS', 6)),
            ls_iterations=ls_iters,
            ncon_max=ncon,
            refactor_period=refactor,
            noslip_contacts=noslip_con)
    else:
        env = fly_envs.walk_imitation(functional=True,
                                      solver_iterations=walk_iters,
                                      ls_iterations=ls_iters,
                                      ncon_max=ncon,
                                      refactor_period=refactor,
                                      noslip_contacts=noslip_con)

    # Cast to float32 for the TPU compute path.
    def to_f32(x):
        if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.asarray(x, jnp.float32)
        return x

    env.model = jax.tree.map(to_f32, env.model)
    if hasattr(env, 'store'):  # vision envs carry no trajectory store
        env.store.qpos = to_f32(env.store.qpos)
        env.store.qvel = to_f32(env.store.qvel)
    if hasattr(env, 'wbpg'):
        env.wbpg = jax.tree.map(to_f32, env.wbpg)
    env.action_min = np.asarray(env.action_min, np.float32)
    env.action_max = np.asarray(env.action_max, np.float32)

    nact = env.tables.num_actions

    @jax.jit
    def rollout(rngs, actions):
        states, _ = jax.vmap(env.reset)(rngs)

        vision = task.startswith('vision')

        def body(states, a_t):
            states, ts = jax.vmap(env.step)(states, a_t)
            r = ts.reward
            if vision:
                # Fold the eyes into the carried value so the renderer
                # cannot be dead-code-eliminated.
                r = r + 1e-12 * (
                    jnp.sum(ts.observation['walker/right_eye'],
                            axis=(-2, -1))
                    + jnp.sum(ts.observation['walker/left_eye'],
                              axis=(-2, -1)))
            return states, r

        states, rewards = jax.lax.scan(body, states, actions)
        # Return a function of the final physics state so XLA cannot
        # dead-code-eliminate the dynamics (inference-mode rewards are
        # state-independent, which silently turned this rollout into a
        # no-op before this checksum was added).
        checksum = jnp.sum(states.data.qpos) + jnp.sum(states.data.qvel)
        return rewards, checksum

    rngs = jax.random.split(jax.random.PRNGKey(0), batch)
    actions = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (steps, batch, nact), jnp.float32)

    # Compile.
    r = jax.block_until_ready(rollout(rngs, actions))
    # Timed runs.
    t0 = time.perf_counter()
    n_rep = 3
    for _ in range(n_rep):
        r = jax.block_until_ready(rollout(rngs, actions))
    dt = (time.perf_counter() - t0) / n_rep
    env_steps_per_s = batch * steps / dt

    result = {
        'metric': f'{task} env-steps/s/chip (batch {batch})',
        'value': round(env_steps_per_s, 1),
        'unit': 'env-steps/s',
        'vs_baseline': round(env_steps_per_s / TARGET, 4),
    }
    print(json.dumps(result))
    return result


def main_with_fallback():
    """Run the bench; on a kernel-side failure (e.g. a Mosaic rejection
    of a newly added pallas kernel on this platform), retry with
    progressively more kernels disabled so the driver always records a
    number instead of a crash."""
    import traceback
    for disable in (None, 'posstage,forcestage,sensstage', 'all'):
        if disable is not None:
            os.environ['FLYBODY_NO_PALLAS'] = disable
            print(f'# retrying with FLYBODY_NO_PALLAS={disable}',
                  flush=True)
        try:
            return main()
        except Exception:
            traceback.print_exc()
    raise SystemExit(1)


if __name__ == '__main__':
    main_with_fallback()
