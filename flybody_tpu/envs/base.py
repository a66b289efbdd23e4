"""Functional environment core.

Environments are pure-functional: `reset(rng) -> (EnvState, TimeStep)` and
`step(EnvState, action) -> (EnvState, TimeStep)`, both jittable and
vmappable over thousands of flies. A dm_env-style adapter for single-env,
numpy-in/numpy-out usage lives in dm_adapter.py.

Semantics mirror the reference composer tasks (flybody/tasks/base.py):
  * a control step runs n_sub physics substeps (scan), averaging the
    buffered sensors (gyro/accelerometer/velocimeter/force/touch) over
    substeps exactly like the reference's buffer_size/'mean' aggregation
    (flybody/fruitfly/fruitfly.py:626-707),
  * rewards multiply factored terms (base.py:212-215),
  * termination on qacc explosion (base.py:222-225) plus task conditions,
  * observables keep the reference names, shapes and values.

One deliberate difference: control-boundary observables are evaluated on a
fresh forward-kinematics pass of the post-step state (the reference reads
some stale pre-integration fields through dm_control's legacy step — a
sub-substep-timescale difference).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from flybody_tpu.model.spec import FlyModel
from flybody_tpu.physics import engine
from flybody_tpu.physics import kinematics as kin
from flybody_tpu.physics.state import Data, make_data
from flybody_tpu.envs import walker as walker_lib
from flybody_tpu.utils import quaternions as quat

# dm_env step types.
FIRST, MID, LAST = 0, 1, 2

TERMINAL_QACC = 1e14  # reference tasks/constants.py:21
TERMINAL_LINVEL = 50.0
TERMINAL_ANGVEL = 200.0
TERMINAL_HEIGHT = 0.2


def exceeds(x, thresh):
    """NaN-safe divergence test: True when x > thresh OR x is non-finite.

    A plain `x > thresh` lets a NaN state keep running (NaN compares
    False both ways), so an exploding episode would never hit the
    reference's qacc/velocity termination guards (tasks/constants.py:21,
    walk_imitation.py:179-192) once it passes through NaN."""
    return ~(x <= thresh)


def below(x, thresh):
    """NaN-safe `x < thresh` that also fires on non-finite x."""
    return ~(x >= thresh)


@struct.dataclass
class TimeStep:
    step_type: jax.Array
    reward: jax.Array
    discount: jax.Array
    observation: dict


@struct.dataclass
class EnvState:
    data: Data
    rng: jax.Array
    step_idx: jax.Array  # control steps completed this episode
    prev_action: jax.Array
    task: Any = None


class FruitFlyEnv:
    """Base class for functional fly environments.

    Subclasses override the task hooks; `reset`/`step` are pure functions of
    (self-static config, state) suitable for jax.jit/vmap.
    """

    def __init__(self, model: FlyModel, num_user_actions: int = 0,
                 control_timestep: float = 2e-3,
                 physics_timestep: float = 1e-4,
                 time_limit: float = 1.0,
                 solver_iterations: int = 10,
                 ls_iterations: int = 8,
                 ncon_max: int = 64,
                 refactor_period: int = 1,
                 noslip_contacts: int | None = None,
                 extra_observables=()):
        # Ensure all model leaves are jnp arrays (not numpy) so functional
        # code can use .at[] updates uniformly.
        model = jax.tree.map(jnp.asarray, model)
        self.model = model
        self.tables = walker_lib.build_tables(model.meta, num_user_actions)
        self.action_min, self.action_max = walker_lib.action_bounds(
            model, self.tables)
        self.n_sub = int(round(control_timestep / physics_timestep))
        self.control_timestep = control_timestep
        self.physics_timestep = physics_timestep
        self.time_limit = time_limit
        self.max_steps = int(round(time_limit / control_timestep))
        self.engine_kwargs = dict(solver_iterations=solver_iterations,
                                  ls_iterations=ls_iterations,
                                  ncon_max=ncon_max,
                                  refactor_period=refactor_period,
                                  noslip_contacts=noslip_contacts)
        self.extra_observables = tuple(extra_observables)
        # Optional per-substep control callback (the functional analogue
        # of MuJoCo's mjcb_control, reference template_task.py:48 and
        # tests/test_core.py:72-103): called with (model, data) at the
        # START of every physics substep, returning an updated Data —
        # typically with qfrc_applied/xfrc_applied set from the previous
        # substep's forward quantities (matching mjcb_control's view).
        self.control_callback = None

    # ---------------------------------------------------------------- hooks

    def _init_task(self, rng) -> Any:
        return None

    def _init_qpos_qvel_act(self, task, rng):
        dtype = self.model.qpos0.dtype
        return (self.model.qpos0,
                jnp.zeros((self.model.meta.nv,), dtype),
                jnp.zeros((self.model.meta.na,), dtype))

    def _before_step(self, state: EnvState, action):
        """Returns (task_state, mj_action) after task-level action edits."""
        return state.task, action

    def _reward_factors(self, state: EnvState, fkd: Data):
        return jnp.ones((1,), fkd.qpos.dtype)

    def _check_termination(self, state: EnvState, fkd: Data, obs):
        """Returns (should_terminate, reached_good_end)."""
        dtype = fkd.qpos.dtype
        qacc_huge = exceeds(jnp.linalg.norm(state.data.qacc),
                            TERMINAL_QACC)
        return qacc_huge, jnp.zeros((), bool)

    def _observations(self, state: EnvState, fkd: Data, sensors_mean):
        return {}

    def _terrain(self, state: EnvState):
        """Per-env heightfield grid for physics contacts, or None. Tasks
        with procedural terrain (vision flight) override this."""
        return None

    # ------------------------------------------------------------- plumbing

    def action_to_ctrl(self, action):
        dtype = self.model.qpos0.dtype
        S = jnp.asarray(self.tables.scatter, dtype)
        return S @ action

    def _substeps(self, data: Data, ctrl,
                  terrain=None) -> tuple[Data, jax.Array]:
        """Run n_sub physics substeps; returns (data, mean sensordata).

        The self-contact force sum rides as one extra trailing channel of
        the sensor vector so it gets the same substep-mean aggregation as
        the buffered sensors (reference fruitfly.py:705-707).

        The core is a custom_vmap function whose batched rule runs
        scan(vmap(engine.step)) instead of letting an outer jax.vmap
        batch the substep scan: the vmap(scan(...)) form makes jax's
        scan-batching replay the pallas stage kernels' custom_vmap rules
        in a context that leaks tracers into lowering constants ("No
        constant handler for DynamicJaxprTracer"); the commuted form is
        semantically identical and lowers cleanly."""
        core = self._substeps_core(terrain is not None)
        if terrain is None:
            return core(data, ctrl)
        return core(data, ctrl, terrain)

    def _substeps_core(self, with_terrain: bool):
        """Per-instance cache of the custom_vmap substep cores (keyed on
        the current control_callback so late assignment invalidates)."""
        key = '_subcore_terrain' if with_terrain else '_subcore_plain'
        cached = self.__dict__.get(key)
        if cached is not None and cached[0] is self.control_callback:
            return cached[1]
        fn = _build_substeps_core(self.model, dict(self.engine_kwargs),
                                  self.n_sub, self.control_callback,
                                  with_terrain)
        self.__dict__[key] = (self.control_callback, fn)
        return fn

    def _fk(self, data: Data) -> Data:
        fkd, ja, jx = kin.fwd_position_smooth(self.model, data)
        # Keep joint anchors/axes for reward features (walk imitation's
        # joint_quat factor) so they are not recomputed with another FK.
        return fkd.replace(jnt_xanchor=ja, jnt_xaxis=jx)

    # -------------------------------------------------------------- obs lib

    def _obs_vestibular(self, fkd: Data, sensors_mean):
        tb = self.tables
        obs = {}
        for name in ('accelerometer', 'gyro', 'velocimeter'):
            adr, dim = tb.vest_adr[name]
            obs[f'walker/{name}'] = jax.lax.dynamic_slice(
                sensors_mean, (adr,), (dim,))
        R = fkd.xmat[tb.thorax_body]
        obs['walker/world_zaxis'] = R[2, :]
        return obs

    def _obs_proprioception(self, state: EnvState, fkd: Data):
        tb = self.tables
        return {
            'walker/joints_pos': fkd.qpos[tb.joints_qpos_idx],
            'walker/joints_vel': state.data.qvel[tb.joints_dof_idx],
            'walker/actuator_activation': state.data.act,
        }

    def _obs_appendages(self, fkd: Data):
        tb = self.tables
        sites = fkd.site_xpos[tb.appendage_sites]
        torso_pos = fkd.xpos[tb.thorax_body]
        torso_mat = fkd.xmat[tb.thorax_body]
        rel = (sites - torso_pos) @ torso_mat
        return {'walker/appendages_pos': rel.reshape(-1)}

    def _obs_force_touch(self, sensors_mean):
        tb = self.tables
        return {
            'walker/force': sensors_mean[tb.force_adr],
            'walker/touch': sensors_mean[tb.touch_adr],
        }

    def _extra_observables(self, state: EnvState, fkd: Data, sensors_mean,
                           names):
        """Optional observables from the reference FruitFlyObservables
        catalog (fruitfly.py:594-726), enabled via `extra_observables`."""
        tb = self.tables
        obs = {}
        for name in names:
            key = f'walker/{name}'
            if name == 'thorax_height':
                obs[key] = fkd.xpos[tb.thorax_body, 2]
            elif name == 'abdomen_height':
                obs[key] = fkd.xpos[tb.abdomen_body, 2]
            elif name == 'world_zaxis_abdomen':
                obs[key] = fkd.xmat[tb.abdomen_body][2, :]
            elif name == 'world_zaxis_head':
                obs[key] = fkd.xmat[tb.head_body][2, :]
            elif name == 'world_zaxis_hover':
                sid = self.model.meta.site_names.index('hover_up_dir')
                obs[key] = fkd.site_xmat[sid][2, :]
            elif name == 'prev_action':
                obs[key] = state.prev_action
            elif name == 'self_contact':
                # Substep-mean of the fly self-contact force sum
                # (reference fruitfly.py:687-707).
                obs[key] = sensors_mean[-1]
            else:
                raise KeyError(f'unknown extra observable {name}')
        return obs

    def _root_pose(self, fkd: Data):
        """Root (free joint) position and quaternion."""
        return fkd.qpos[:3], fkd.qpos[3:7]

    def _obs_ref(self, state: EnvState, fkd: Data, ref_qpos_window):
        """ref_displacement / ref_root_quat with future preview
        (reference tasks/base.py:245-268)."""
        fly_pos, fly_quat = self._root_pose(fkd)
        disp = quat.rotate_vec_inv_quat(
            ref_qpos_window[:, :3] - fly_pos, fly_quat)
        dquat = quat.get_dquat_local(fly_quat, ref_qpos_window[:, 3:7])
        return {'walker/ref_displacement': disp,
                'walker/ref_root_quat': dquat}

    # ----------------------------------------------------------- public API

    def reset(self, rng) -> tuple[EnvState, TimeStep]:
        dtype = self.model.qpos0.dtype
        rng, sub = jax.random.split(rng)
        task = self._init_task(sub)
        data = make_data(self.model)
        state0 = EnvState(
            data=data, rng=rng, step_idx=jnp.zeros((), jnp.int32),
            prev_action=jnp.zeros((self.tables.num_actions,), dtype),
            task=task)
        qpos, qvel, act = self._init_qpos_qvel_act(task, rng)
        data = data.replace(qpos=qpos, qvel=qvel, act=act,
                            qacc=jnp.zeros((self.model.meta.nv,), dtype))
        state = state0.replace(data=data)
        fkd = self._fk(data)
        zeros_sens = jnp.zeros((self.model.meta.nsensordata + 1,), dtype)
        obs = self._observations(state, fkd, zeros_sens)
        ts = TimeStep(step_type=jnp.asarray(FIRST, jnp.int32),
                      reward=jnp.zeros((), dtype),
                      discount=jnp.ones((), dtype),
                      observation=obs)
        return state, ts

    def step(self, state: EnvState, action) -> tuple[EnvState, TimeStep]:
        dtype = self.model.qpos0.dtype
        action = jnp.asarray(action, dtype)
        task, mj_action = self._before_step(state, action)
        state = state.replace(task=task,
                              prev_action=action)
        ctrl = self.action_to_ctrl(mj_action)
        data, sensors_mean = self._substeps(state.data, ctrl,
                                            self._terrain(state))
        state = state.replace(data=data,
                              step_idx=state.step_idx + 1)
        fkd = self._fk(data)
        obs = self._observations(state, fkd, sensors_mean)
        factors = self._reward_factors(state, fkd)
        reward = jnp.prod(factors)
        terminate, good_end = self._check_termination(state, fkd, obs)
        timeout = state.step_idx >= self.max_steps
        last = terminate | timeout
        # Discount 0 only on fatal termination (reference base.py:206-210,
        # walk/flight get_discount overrides).
        fatal = terminate & ~good_end
        discount = jnp.where(fatal, jnp.zeros((), dtype),
                             jnp.ones((), dtype))
        ts = TimeStep(
            step_type=jnp.where(last, jnp.asarray(LAST, jnp.int32),
                                jnp.asarray(MID, jnp.int32)),
            reward=jnp.asarray(reward, dtype),
            discount=discount, observation=obs)
        return state, ts

    # Convenience specs.

    def action_spec(self):
        return dict(shape=(self.tables.num_actions,),
                    minimum=self.action_min, maximum=self.action_max,
                    name='\t'.join(self.tables.action_names))

    def observation_spec(self):
        rng = jax.random.PRNGKey(0)
        _, ts = jax.eval_shape(self.reset, rng)
        return {k: v for k, v in ts.observation.items()}


def _build_substeps_core(model, kw, n_sub, control_callback, with_terrain):
    """Builds the custom_vmap substep core for one env configuration.

    The primal runs the per-env substep scan (single-env usage). The
    batched rule commutes the loop to scan(vmap(engine.step)) so the
    pallas stage kernels' own custom_vmap rules fire inside a plain
    vmap trace rather than inside jax's scan-batching replay (see
    FruitFlyEnv._substeps).
    """
    from jax import custom_batching

    cb = control_callback

    def prep(data, ctrl):
        # With a control callback the carry additionally threads the
        # previous substep's qfrc_actuator (the view mjcb_control has of
        # mjData at the top of mj_forward) and qfrc_applied must be
        # array-shaped from the start for a stable scan structure.
        if cb is None:
            return data.replace(ctrl=ctrl), None
        prev = (data.qfrc_actuator if data.qfrc_actuator is not None
                else jnp.zeros_like(data.qvel))
        data = data.replace(
            ctrl=ctrl,
            qfrc_actuator=None,
            qfrc_applied=(data.qfrc_applied
                          if data.qfrc_applied is not None
                          else jnp.zeros_like(data.qvel)))
        return data, prev

    def one_sub(d, prev_qfrc_act, terrain):
        if cb is not None:
            d = cb(model, d.replace(qfrc_actuator=prev_qfrc_act))
            d = d.replace(qfrc_actuator=None)
        out = engine.step(model, d, terrain=terrain, **kw)
        sens = jnp.concatenate(
            [out.sensordata, out.self_contact_force[None]])
        prev = out.qfrc_actuator if cb is not None else None
        return out.strip(), prev, sens

    def finalize(data, prev):
        return data if cb is None else data.replace(qfrc_actuator=prev)

    def single(data, ctrl, terrain):
        data, prev = prep(data, ctrl)

        def body(carry, _):
            d, p = carry
            d, p, sens = one_sub(d, p, terrain)
            return (d, p), sens

        (data, prev), sens = jax.lax.scan(body, (data, prev),
                                          length=n_sub)
        return finalize(data, prev), jnp.mean(sens, axis=0)

    def batched(axis_size, in_batched, data, ctrl, terrain,
                terrain_batched):
        def bc(x, b):
            if x is None or b:
                return x
            return jnp.broadcast_to(jnp.asarray(x)[None],
                                    (axis_size,) + jnp.shape(x))

        data = jax.tree.map(bc, data, in_batched[0])
        ctrl = jax.tree.map(bc, ctrl, in_batched[1])
        if terrain is not None:
            terrain = jax.tree.map(bc, terrain, terrain_batched)
        data, prev = jax.vmap(prep)(data, ctrl)

        def body(carry, _):
            d, p = carry
            d, p, sens = jax.vmap(
                one_sub,
                in_axes=(0, 0, 0 if with_terrain else None))(d, p,
                                                             terrain)
            return (d, p), sens

        (data, prev), sens = jax.lax.scan(body, (data, prev),
                                          length=n_sub)
        out = (jax.vmap(finalize)(data, prev), jnp.mean(sens, axis=0))
        return out, jax.tree.map(lambda _: True, out)

    if with_terrain:
        @custom_batching.custom_vmap
        def core(data, ctrl, terrain):
            return single(data, ctrl, terrain)

        @core.def_vmap
        def _rule(axis_size, in_batched, data, ctrl, terrain):
            return batched(axis_size, in_batched, data, ctrl, terrain,
                           in_batched[2])
    else:
        @custom_batching.custom_vmap
        def core(data, ctrl):
            return single(data, ctrl, None)

        @core.def_vmap
        def _rule(axis_size, in_batched, data, ctrl):
            return batched(axis_size, in_batched, data, ctrl, None,
                           None)

    return core
