"""Wing-beat pattern generator, TPU-native.

Reference semantics (flybody/tasks/pattern_generators.py): a bank of wing
kinematic sequences precomputed at 201 discrete beat frequencies in ±5% of
218 Hz, each built by repeating one base wing-beat cycle 10-20 times (repeat
count chosen to minimize the cycle-boundary phase error on the control-step
grid), plus runtime phase-preserving frequency switching and a one-pole
filter on the commanded frequency.

Build-time precomputation is host-side numpy; the runtime state machine is
a small functional jnp core (gathers into a padded device table), so it
jits, vmaps over envs, and scans over steps.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

BASE_FREQ = 218.0
REL_FREQ_RANGE = 0.05
NUM_FREQS = 201
FLY_CONTROL_TIMESTEP = 2e-4


def synthetic_base_pattern() -> np.ndarray:
    """Approximate one-cycle wing pattern for testing
    (reference pattern_generators.py:54-59)."""
    x = np.linspace(0, 2 * np.pi, 500)
    yaw = 1.1 * np.sin(x - np.pi / 2) + 0.3
    roll = 0.25 * np.sin(1.5 * x) - 0.1
    pitch = 1.35 * np.sin(x) + 0.8
    return np.vstack((yaw, roll, pitch)).T  # (500, 3)


@struct.dataclass
class WBPGTables:
    """Padded device tables of precomputed wing sequences."""

    traj: jax.Array  # (F, Lmax, 6)
    phase: jax.Array  # (F, Lmax), mod-1 phase; > 1e9 marks padding
    length: jax.Array  # (F,) int32 valid lengths
    beat_freqs: jax.Array  # (F,)

    # Static scalars.
    base_freq: float = struct.field(pytree_node=False, default=BASE_FREQ)
    rel_freq_range: float = struct.field(pytree_node=False,
                                         default=REL_FREQ_RANGE)
    ctrl_filter_rate: float = struct.field(pytree_node=False, default=0.0)
    dt_ctrl: float = struct.field(pytree_node=False,
                                  default=FLY_CONTROL_TIMESTEP)


@struct.dataclass
class WBPGState:
    freq_idx: jax.Array  # int32
    step: jax.Array  # int32 position in the current sequence
    ctrl_freq: jax.Array  # filtered commanded frequency


def build_tables(base_pattern: np.ndarray | None = None,
                 base_beat_freq: float = BASE_FREQ,
                 rel_freq_range: float = REL_FREQ_RANGE,
                 num_freqs: int = NUM_FREQS,
                 min_repeats: int = 10,
                 max_repeats: int = 20,
                 dt_ctrl: float = FLY_CONTROL_TIMESTEP,
                 ctrl_filter: float = 0.5 / BASE_FREQ,
                 dtype=np.float64) -> WBPGTables:
    """Precompute the frequency bank (host-side)."""
    if base_pattern is None:
        base_pattern = synthetic_base_pattern()
    base = np.tile(base_pattern, (1, 2))  # both wings, (L0, 6)

    beat_freqs = np.linspace((1 - rel_freq_range) * base_beat_freq,
                             (1 + rel_freq_range) * base_beat_freq,
                             num_freqs)
    trajs, phases = [], []
    for f in beat_freqs:
        beat_time = 1.0 / f
        reps = np.arange(min_repeats, max_repeats + 1)
        rel_error = ((reps * beat_time) % dt_ctrl) / dt_ctrl
        a1 = int(np.argmin(rel_error))
        a2 = int(np.argmin(np.abs(1 - rel_error)))
        if rel_error[a1] < abs(1 - rel_error[a2]):
            argmin, shift = a1, dt_ctrl
        else:
            argmin, shift = a2, 0.0
        n_reps = argmin + 1
        repeated = np.tile(base, (n_reps, 1))
        phase = np.linspace(0, n_reps, n_reps * base.shape[0],
                            endpoint=False)
        dt_data = beat_time / base.shape[0]
        duration = repeated.shape[0] * dt_data
        t_data = np.linspace(0, duration, repeated.shape[0])
        t_ctrl = np.arange(0, duration - shift, dt_ctrl)
        traj_ctrl = np.stack(
            [np.interp(t_ctrl, t_data, repeated[:, i])
             for i in range(base.shape[1])], axis=1)
        phase_ctrl = np.interp(t_ctrl, t_data, phase)
        trajs.append(traj_ctrl)
        phases.append(phase_ctrl)

    lmax = max(t.shape[0] for t in trajs)
    F = len(trajs)
    traj_pad = np.zeros((F, lmax, base.shape[1]), dtype)
    phase_pad = np.full((F, lmax), 1e12, dtype)  # large: never matched
    length = np.zeros(F, np.int32)
    for i, (t, p) in enumerate(zip(trajs, phases)):
        traj_pad[i, :t.shape[0]] = t
        phase_pad[i, :t.shape[0]] = p
        length[i] = t.shape[0]

    rate = np.exp(-dt_ctrl / ctrl_filter) if ctrl_filter != 0 else 0.0
    return WBPGTables(
        traj=jnp.asarray(traj_pad), phase=jnp.asarray(phase_pad),
        length=jnp.asarray(length), beat_freqs=jnp.asarray(beat_freqs),
        base_freq=float(base_beat_freq),
        rel_freq_range=float(rel_freq_range),
        ctrl_filter_rate=float(rate), dt_ctrl=float(dt_ctrl))


def reset(tables: WBPGTables, initial_phase, ctrl_freq=None):
    """Reset to step 0 at `initial_phase` in [0, 1); returns
    (state, wing_qpos, wing_qvel)."""
    dtype = tables.traj.dtype
    cf = (jnp.asarray(tables.base_freq, dtype) if ctrl_freq is None
          else jnp.asarray(ctrl_freq, dtype))
    idx = jnp.argmin(jnp.abs(tables.beat_freqs - cf)).astype(jnp.int32)
    phase_row = tables.phase[idx]
    step = jnp.argmin(jnp.abs(initial_phase - phase_row)).astype(jnp.int32)
    angles = tables.traj[idx, step]
    nxt = tables.traj[idx, step + 1]
    qvel = (nxt - angles) / tables.dt_ctrl
    return WBPGState(freq_idx=idx, step=step, ctrl_freq=cf), angles, qvel


def step(tables: WBPGTables, state: WBPGState, ctrl_freq):
    """Advance one control step at the commanded frequency; returns
    (state, wing_qpos). Matches reference pattern_generators.py:168-203."""
    dtype = tables.traj.dtype
    length = tables.length[state.freq_idx]
    new_step = jnp.mod(state.step + 1, length)

    rate = tables.ctrl_filter_rate
    cf = (jnp.asarray(ctrl_freq, dtype) if rate == 0.0
          else state.ctrl_freq * rate + jnp.asarray(ctrl_freq, dtype)
          * (1.0 - rate))

    idx_new = jnp.argmin(jnp.abs(tables.beat_freqs - cf)).astype(jnp.int32)
    switch = idx_new != state.freq_idx
    cur_phase = jnp.mod(tables.phase[state.freq_idx, new_step], 1.0)
    # Phase-preserving jump into the new sequence.
    new_phase_row = jnp.mod(tables.phase[idx_new], 1.0)
    # Padded entries hold 1e12; mod 1 maps them near arbitrary values, so
    # mask them out explicitly.
    valid = (jnp.arange(tables.phase.shape[1]) < tables.length[idx_new])
    dist = jnp.where(valid, jnp.abs(cur_phase - new_phase_row), 1e12)
    jump_step = jnp.argmin(dist).astype(jnp.int32)

    step_out = jnp.where(switch, jump_step, new_step)
    idx_out = jnp.where(switch, idx_new, state.freq_idx)
    angles = tables.traj[idx_out, step_out]
    return WBPGState(freq_idx=idx_out, step=step_out, ctrl_freq=cf), angles
