"""Open-loop tripod-gait search + dynamically consistent dataset recording.

The reference's imitation datasets are real mocap recordings (reference
flybody/tasks/trajectory_loaders.py:185-265, download_data.py:10-63) that
cannot be fetched in this offline environment, and synthetic sinusoid
joint trajectories are not dynamically consistent (the DeepMimic reward
ceiling is unreachable). This tool produces a consistent substitute FROM
THE ENGINE ITSELF:

1. `search`: cross-entropy-method optimization of a structured open-loop
   tripod gait (per-joint-slot amplitude/phase/mirror + per-segment
   offsets + stride frequency + stance-phased claw adhesion) for forward
   locomotion, evaluated with batched engine rollouts (the framework's
   native workload).
2. `record`: rolls the best parameters (plus speed/turn variants) and
   writes the resulting qpos/qvel trajectories — consistent with the
   engine by construction — to an HDF5 file in the reference dataset
   schema, with root2site/joint_quat features computed by FK exactly as
   the reward stack defines them. The recorded ctrl sequence is an
   existence proof that a policy can reproduce the snippets.

Usage:
  python -m flybody_tpu.tools.gait_search search --pop 4096 --gens 12 \
      --steps 300 --out /tmp/gait.npz
  python -m flybody_tpu.tools.gait_search record --theta /tmp/gait.npz \
      --steps 500 --out datasets/walk_engine.h5
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

# Leg actuator slots, in per-leg order (walking model, 8 per leg).
SLOTS = ('coxa_abduct', 'coxa_twist', 'coxa', 'femur_twist', 'femur',
         'tibia', 'tarsus', 'tarsus2')
LEGS = ('T1_left', 'T1_right', 'T2_left', 'T2_right', 'T3_left',
        'T3_right')
# Tripod groups: {T1L, T2R, T3L} stance together, the others antiphase.
TRIPOD = {'T1_left': 0.0, 'T2_right': 0.0, 'T3_left': 0.0,
          'T1_right': 1.0, 'T2_left': 1.0, 'T3_right': 1.0}

N_SLOTS = len(SLOTS)
# theta layout: A(8) phi(8) mirror(8) offset(8x3 per segment T1/T2/T3)
# adhesion(delta, sharpness) freq -> 8*3 + 24 + 3 = 51.
DIM = 3 * N_SLOTS + 3 * N_SLOTS + 3


def build(model):
    """Static tables for the gait controller."""
    meta = model.meta
    names = meta.actuator_names
    nu = meta.nu
    leg_rows = []   # (idx, slot, seg, is_right, tripod_phase)
    adh_rows = []
    for i, n in enumerate(names):
        if n.startswith('adhere_claw'):
            leg = n.split('adhere_claw_')[1]
            adh_rows.append((i, TRIPOD[leg]))
            continue
        for leg in LEGS:
            if n.endswith('_' + leg):
                slot = n[:-(len(leg) + 1)]
                if slot in SLOTS:
                    seg = int(leg[1]) - 1
                    leg_rows.append((i, SLOTS.index(slot), seg,
                                     1.0 if 'right' in leg else 0.0,
                                     TRIPOD[leg]))
    lo, hi = (np.asarray(model.actuator_ctrlrange)[:, 0],
              np.asarray(model.actuator_ctrlrange)[:, 1])
    # Hold head/abdomen at their range midpoint.
    base = 0.5 * (lo + hi)
    return dict(
        leg_idx=np.array([r[0] for r in leg_rows]),
        leg_slot=np.array([r[1] for r in leg_rows]),
        leg_seg=np.array([r[2] for r in leg_rows]),
        leg_right=np.array([r[3] for r in leg_rows], np.float32),
        leg_phase=np.array([r[4] for r in leg_rows], np.float32),
        adh_idx=np.array([r[0] for r in adh_rows]),
        adh_phase=np.array([r[1] for r in adh_rows], np.float32),
        lo=lo.astype(np.float32), hi=hi.astype(np.float32),
        base=base.astype(np.float32), nu=nu)


def ctrl_fn(tb, theta, t):
    """Control vector at time t (seconds) for gait parameters theta."""
    ns = N_SLOTS
    A = jnp.tanh(theta[0:ns])                      # [-1, 1]
    phi = theta[ns:2 * ns]
    mirror = jnp.tanh(theta[2 * ns:3 * ns])        # right-side scale
    off = jnp.tanh(theta[3 * ns:3 * ns + 3 * ns].reshape(ns, 3))
    adh_delta = theta[6 * ns]
    adh_sharp = 1.0 + jnp.abs(theta[6 * ns + 1]) * 4.0
    freq = 2.0 + 18.0 * jax.nn.sigmoid(theta[6 * ns + 2])  # 2..20 Hz

    w = 2.0 * jnp.pi * freq
    slot, seg = tb['leg_slot'], tb['leg_seg']
    amp = A[slot] * jnp.where(tb['leg_right'] > 0.5,
                              mirror[slot], 1.0)
    ph = phi[slot] + jnp.pi * tb['leg_phase']
    o = off[slot, seg]
    u_leg = o + amp * jnp.sin(w * t + ph)          # normalized [-2, 2]

    lo, hi = tb['lo'], tb['hi']
    center = tb['base']
    half = 0.5 * (hi - lo)
    ctrl = jnp.asarray(center)
    li = tb['leg_idx']
    ctrl = ctrl.at[li].set(jnp.clip(center[li] + half[li] * u_leg,
                                    lo[li], hi[li]))
    # Stance-phased adhesion in (0, 1).
    adh = 0.5 * (1.0 + jnp.tanh(adh_sharp * jnp.sin(
        w * t + jnp.pi * tb['adh_phase'] + adh_delta)))
    ctrl = ctrl.at[tb['adh_idx']].set(adh)
    return ctrl


def make_rollout(model, tb, n_ctrl_steps, n_sub=10, ctrl_dt=2e-3,
                 solver_iterations=8, ls_iterations=6, refactor_period=8,
                 record=False, chunk: int = 50):
    """thetas (P, DIM) -> fitness (P,) (or the qpos/qvel traces).

    Batched-first: the loop structure is scan(vmap(engine.step)), NOT
    vmap(scan(step)) — jax's scan-batching replays the stage kernels'
    custom_vmap rules in a context that leaks tracers into lowering
    constants (same commutation as envs/base._build_substeps_core).

    The device program covers `chunk` control steps; the full rollout is
    driven by a HOST loop over chunks. A single device program scanning
    all n_ctrl_steps x n_sub engine steps (3000 at the CLI defaults)
    crashes the axon TPU worker — the round-1 'long-scan fault' class —
    while chunked programs of <=500 engine steps run clean. Solver
    settings match the bench regime (8/6, refactor 8), whose kernel
    specializations are exercised daily."""
    from flybody_tpu.physics import engine
    from flybody_tpu.physics.state import make_data

    def init_fn(thetas):
        P = thetas.shape[0]
        d0 = make_data(model)
        d0 = d0.replace(qacc=jnp.zeros_like(d0.qvel))
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (P,) + x.shape), d0)

    def one_sub(dd):
        dd = engine.step(model, dd,
                         solver_iterations=solver_iterations,
                         ls_iterations=ls_iterations,
                         refactor_period=refactor_period)
        return dd.strip()

    def chunk_fn(d, thetas, k0):
        """Runs `chunk` control steps from control index k0."""
        def ctrl_step(carry, k):
            d = carry
            t = k.astype(jnp.float32) * ctrl_dt
            c = jax.vmap(lambda th: ctrl_fn(tb, th, t))(thetas)
            d = d.replace(ctrl=c)

            def sub(dd, _):
                return jax.vmap(one_sub)(dd), None

            d, _ = jax.lax.scan(sub, d, None, length=n_sub)
            out = (d.qpos, d.qvel) if record else (d.qpos[:, 0:3],
                                                   d.qpos[:, 3:7])
            return d, out

        d, trace = jax.lax.scan(ctrl_step, d,
                                k0 + jnp.arange(chunk))
        return d, trace

    jit_init = jax.jit(init_fn)
    jit_chunk = jax.jit(chunk_fn)

    def rollout(thetas):
        d = jit_init(thetas)
        traces = []
        for k0 in range(0, n_ctrl_steps, chunk):
            d, trace = jit_chunk(d, thetas, jnp.int32(k0))
            traces.append(trace)
        if record:
            # list of (chunk, P, nq/nv) -> (P, T, ...)
            qp = jnp.concatenate([t[0] for t in traces],
                                 axis=0)[:n_ctrl_steps]
            qv = jnp.concatenate([t[1] for t in traces],
                                 axis=0)[:n_ctrl_steps]
            return jnp.swapaxes(qp, 0, 1), jnp.swapaxes(qv, 0, 1)
        pos = jnp.concatenate(
            [t[0] for t in traces], 0)[:n_ctrl_steps]   # (T, P, 3)
        quat = jnp.concatenate(
            [t[1] for t in traces], 0)[:n_ctrl_steps]  # (T, P, 4)
        pos = jnp.swapaxes(pos, 0, 1)
        quat = jnp.swapaxes(quat, 0, 1)
        return jax.jit(jax.vmap(_fitness))(pos, quat)

    return rollout


def _fitness(pos, quat):
    """Fitness of one rollout trace: pos (T, 3), quat (T, 4)."""
    # Forward displacement along the initial heading (x-axis of the
    # root frame at t=0 projected to the ground plane).
    from flybody_tpu.utils import quaternions as quat_lib
    fwd0 = quat_lib.rotate_vec_with_quat(
        jnp.array([1.0, 0.0, 0.0]), quat[0])
    fwd0 = fwd0.at[2].set(0.0)
    fwd0 = fwd0 / jnp.maximum(1e-6, jnp.linalg.norm(fwd0))
    disp = jnp.dot(pos[-1, :2] - pos[0, :2], fwd0[:2])
    # Upright: body z-axis world-z component.
    upz = jax.vmap(lambda q: quat_lib.rotate_vec_with_quat(
        jnp.array([0.0, 0.0, 1.0]), q)[2])(quat)
    z = pos[:, 2]
    fallen = jnp.mean(((z < 0.05) | (upz < 0.3)).astype(jnp.float32))
    bad = ~jnp.isfinite(disp)
    fit = disp - 2.0 * fallen
    return jnp.where(bad, -10.0, fit)


def cem_search(model, pop=4096, gens=12, steps=300, elite_frac=0.1,
               seed=0, log=print):
    tb = build(model)
    fit_fn = make_rollout(model, tb, steps)  # host-chunked
    mu = np.zeros(DIM, np.float32)
    # Seed a plausible tripod: swing legs fore-aft with the 'coxa' and
    # 'femur' slots, adhesion half a cycle out of swing.
    mu[SLOTS.index('coxa')] = 0.5        # A
    mu[SLOTS.index('femur')] = 0.5
    mu[SLOTS.index('tibia')] = 0.3
    sigma = 0.5 * np.ones(DIM, np.float32)
    n_elite = max(8, int(pop * elite_frac))
    rng = np.random.RandomState(seed)
    best_theta, best_fit = mu.copy(), -np.inf
    for g in range(gens):
        thetas = mu + sigma * rng.randn(pop, DIM).astype(np.float32)
        thetas[0] = best_theta  # elitism
        fits = np.asarray(fit_fn(jnp.asarray(thetas)))
        order = np.argsort(-fits)
        elite = thetas[order[:n_elite]]
        mu = elite.mean(0)
        sigma = elite.std(0) + 0.02
        if fits[order[0]] > best_fit:
            best_fit = float(fits[order[0]])
            best_theta = thetas[order[0]].copy()
        log(f'[gait-cem] gen {g}: best {fits[order[0]]:+.4f} cm '
            f'(all-time {best_fit:+.4f}), elite mean '
            f'{fits[order[:n_elite]].mean():+.4f}')
    return best_theta, best_fit, tb


def record_dataset(model, theta, out_path, steps=500, variants=None,
                   log=print):
    """Rolls gait variants and writes the reference-schema HDF5."""
    from flybody_tpu.tools import make_test_dataset as mtd
    tb = build(model)
    roll = make_rollout(model, tb, steps, record=True)
    ns = N_SLOTS
    if variants is None:
        # (freq delta on the sigmoid logit, left/right amp asymmetry)
        variants = [(0.0, 0.0), (-0.8, 0.0), (0.8, 0.0),
                    (0.0, 0.25), (0.0, -0.25), (-0.4, 0.15),
                    (0.4, -0.15), (0.0, 0.4)]
    thetas = []
    for dfreq, turn in variants:
        th = np.array(theta, np.float32).copy()
        th[6 * ns + 2] += dfreq
        # Turning: scale right-side mirror factors.
        th[2 * ns:3 * ns] = np.arctanh(
            np.clip(np.tanh(th[2 * ns:3 * ns]) * (1.0 + turn),
                    -0.99, 0.99))
        thetas.append(th)
    qps, qvs = roll(jnp.asarray(np.stack(thetas)))  # (P, T, nq/nv)
    qps, qvs = np.asarray(qps), np.asarray(qvs)
    qpos_list, qvel_list = [], []
    for (dfreq, turn), qp, qv in zip(variants, qps, qvs):
        if not (np.isfinite(qp).all() and np.isfinite(qv).all()):
            log(f'[gait-record] variant ({dfreq:+.1f}, {turn:+.2f}) '
                'diverged; skipped')
            continue
        qpos_list.append(qp)
        qvel_list.append(qv)
        log(f'[gait-record] variant ({dfreq:+.1f}, {turn:+.2f}): '
            f'{steps} steps, displacement '
            f'{np.linalg.norm(qp[-1, :2] - qp[0, :2]):.3f} cm')
    mtd.write_walking_dataset_from_frames(out_path, model, qpos_list,
                                          qvel_list)
    log(f'[gait-record] wrote {len(qpos_list)} trajectories -> '
        f'{out_path}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('cmd', choices=['search', 'record'])
    ap.add_argument('--pop', type=int, default=4096)
    ap.add_argument('--gens', type=int, default=12)
    ap.add_argument('--steps', type=int, default=300)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--theta', type=str, default='/tmp/gait.npz')
    ap.add_argument('--out', type=str, default=None)
    args = ap.parse_args()

    from flybody_tpu.envs import fly_envs
    from flybody_tpu.train.run import cast_model_f32
    model = cast_model_f32(fly_envs._walking_model())

    if args.cmd == 'search':
        theta, fit, _ = cem_search(model, pop=args.pop, gens=args.gens,
                                   steps=args.steps, seed=args.seed)
        out = args.out or '/tmp/gait.npz'
        np.savez(out, theta=theta, fit=fit)
        print(f'saved theta (fitness {fit:+.4f} cm) -> {out}')
    else:
        theta = np.load(args.theta)['theta']
        out = args.out or 'datasets/walk_engine.h5'
        record_dataset(model, theta, out, steps=args.steps)


if __name__ == '__main__':
    main()
