"""Full physics step: the TPU-native counterpart of mj_step.

Pipeline (matching MuJoCo's stage ordering):
  1. position stage: FK, com quantities, tendons, collision
  2. velocity stage: body velocities, tendon velocities
  3. actuation (including adhesion transmission through contact normals)
  4. passive + fluid forces, RNE bias, CRB mass matrix
  5. constraint solve (Newton, elliptic cones + joint limits, noslip)
  6. semi-implicit Euler integration with implicit joint damping

All stages are fixed-shape, jit/vmap/scan-friendly. `step` is the hot
function: vmap it over thousands of flies and scan it over substeps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from flybody_tpu.model.spec import FlyModel, TRN_BODY
from flybody_tpu.physics import collision as _col
from flybody_tpu.physics import fluid as _fluid
from flybody_tpu.physics import kinematics as _kin
from flybody_tpu.physics import smooth as _sm
from flybody_tpu.physics import solver as _sol
from flybody_tpu.physics.state import Data, make_data


@functools.lru_cache(maxsize=8)
def _adhesion_tables(meta):
    """Static adhesion actuator -> body map."""
    adh_u, adh_body, adh_gain_idx = [], [], []
    for u in range(meta.nu):
        if meta.actuator_trntype[u] == TRN_BODY:
            adh_u.append(u)
            adh_body.append(meta.actuator_trnid[u])
    return np.array(adh_u, dtype=np.int64), np.array(adh_body,
                                                     dtype=np.int64)


def adhesion_moment(model: FlyModel, efc: _sol.EfcRows,
                    contact_bodies: tuple[jax.Array, jax.Array]):
    """Adhesion transmission moments (nu_adh, nv).

    moment_u = -(1/n_u) * sum of normal-J rows over active contacts that
    involve actuator u's body (validated against mjData.actuator_moment).
    """
    meta = model.meta
    dtype = efc.con_J.dtype
    adh_u, adh_body = _adhesion_tables(meta)
    if len(adh_u) == 0:
        return adh_u, jnp.zeros((0, meta.nv), dtype)
    b1, b2 = contact_bodies  # (K,) traced int arrays
    # involve[u, k] = 1 iff contact k touches body of actuator u.
    bodies = jnp.asarray(adh_body)[:, None]
    involve = ((b1[None, :] == bodies) | (b2[None, :] == bodies))
    involve = involve.astype(dtype) * efc.con_active[None, :]
    n = jnp.sum(involve, axis=1)
    Jn = efc.con_J[:, 0, :]  # (K, nv) normal rows
    mom = -(involve @ Jn) / jnp.maximum(n, 1.0)[:, None]
    return adh_u, mom


def fwd(model: FlyModel, data: Data,
        ncon_max: int = _sol.NCON_MAX,
        solver_iterations: int = 15,
        ls_iterations: int = 10,
        noslip_iterations: int | None = None,
        noslip_contacts: int | None = None,
        refactor_period: int = 1,
        use_contacts: bool = True,
        terrain=None) -> Data:
    """Forward dynamics: fills everything including qacc (mj_forward).

    `terrain` (optional, traced): per-env heightfield grid; adds hfield
    contacts (physics/terrain.py) to the candidate set."""
    meta = model.meta
    dtype = data.qpos.dtype
    terrain_on = terrain is not None

    # Position stage (one fused pallas kernel on TPU).
    data, jnt_xanchor, jnt_xaxis = _kin.fwd_position_smooth(model, data)
    con = _col.collide(model, data, terrain=terrain, compact=True)
    if not use_contacts:
        con = con.replace(
            dist=jnp.full_like(con.dist, 1e10),
            blocks=tuple(b.replace(dist=jnp.full_like(b.dist, 1e10))
                         for b in con.blocks))

    # Velocity + force stages: ONE fused pallas kernel on TPU
    # (ops/force_stage.py) covering com_vel/tendon_vel/CRB(packed)/RNE/
    # passive/fluid/actuation; XLA stage chain otherwise.
    from flybody_tpu.ops import force_stage as _fs
    ff = _fs.make_force_stage_pe(model)
    if ff is not None:
        (cvel, cdof_dot, ten_velocity, qfrc_bias, qfrc_passive,
         qfrc_fluid, qfrc_actuator, actuator_force, act_dot, Mp) = ff(
            data.qpos, data.qvel, data.act, data.ctrl, data.cdof,
            data.cinert, data.xipos, data.ximat, data.subtree_com,
            data.geom_xpos, data.geom_xmat, data.ten_length)
        data = data.replace(
            cvel=cvel, cdof_dot=cdof_dot, ten_velocity=ten_velocity,
            qfrc_bias=qfrc_bias, qfrc_passive=qfrc_passive,
            qfrc_fluid=qfrc_fluid, qfrc_actuator=qfrc_actuator,
            actuator_force=actuator_force, act_dot=act_dot, qM=Mp)
        efc = _sol.make_efc(model, data, con, ncon_max=ncon_max,
                            terrain=terrain_on)
    else:
        data = _sm.com_vel(model, data)
        data = _sm.tendon_vel(model, data)
        efc = _sol.make_efc(model, data, con, ncon_max=ncon_max,
                            terrain=terrain_on)
        data = _sm.actuation(model, data)

    # Adhesion transmission (needs the selected contact rows).
    adh_u, adh_mom = adhesion_moment(model, efc,
                                     (efc.con_body1, efc.con_body2))
    if len(adh_u):
        adh_force = data.actuator_force[adh_u]
        qfrc_adh = adh_mom.T @ adh_force
        data = data.replace(qfrc_actuator=data.qfrc_actuator + qfrc_adh)

    if ff is None:
        # Remaining smooth forces. With the block-arrow backbone the
        # mass matrix stays in packed form end-to-end (crb -> factor ->
        # Newton M-products -> euler); dense (nv, nv) M is never
        # materialized.
        if _sm.arrow_ops(meta) is not None:
            data = _sm.crb_packed(model, data)
        else:
            data = _sm.crb(model, data)
        data = _sm.rne(model, data)
        data = _sm.passive(model, data)
        data = _fluid.fluid(model, data)

    qfrc_applied = (data.qfrc_applied if data.qfrc_applied is not None
                    else jnp.zeros_like(data.qvel))
    qfrc_smooth = (data.qfrc_passive + data.qfrc_fluid + data.qfrc_actuator
                   + qfrc_applied + _sm.xfrc_accumulate(model, data)
                   - data.qfrc_bias)
    data = data.replace(qfrc_smooth=qfrc_smooth)

    # Constraint solve.
    data, a_free = _sm.factor_solve_m(model, data, qfrc_smooth)
    qacc, qfrc_con, f_l, f_c = _sol.solve(
        model, data, efc, a_free, iterations=solver_iterations,
        ls_iterations=ls_iterations,
        warmstart=data.qacc if data.qacc is not None else None,
        refactor_period=refactor_period)
    niter = (meta.noslip_iterations if noslip_iterations is None
             else noslip_iterations)
    if niter > 0:
        f_c_old = f_c
        qacc, f_c = _sol.noslip(model, data, efc, qacc, f_c,
                                iterations=niter,
                                max_contacts=noslip_contacts)
        # Incremental qfrc update: noslip only changes the tangent
        # forces of the swept contact prefix, so qfrc_con needs one
        # (ns, 2, nv) contraction over the delta instead of a full
        # J^T f re-contraction (a ~255 MB con_J HBM pass at batch 8192).
        ns = f_c.shape[0]
        if noslip_contacts is not None:
            ns = min(noslip_contacts, ns)
        df_t = (f_c - f_c_old)[:ns, 1:]
        qfrc_con = qfrc_con + jnp.sum(
            efc.con_J[:ns, 1:, :] * df_t[:, :, None], axis=(0, 1))

    # Self-contact force magnitude sum (observable; fruitfly.py:687-704).
    m_self = efc.con_self * efc.con_active
    self_force = jnp.sum(m_self * jnp.linalg.norm(f_c, axis=-1))

    data = data.replace(qacc=qacc, qfrc_constraint=qfrc_con, contact=con,
                        self_contact_force=self_force)

    # Sensors (acceleration stage needs qacc and contact forces); one
    # fused pallas kernel on TPU (ops/sens_stage.py), XLA otherwise.
    from flybody_tpu.physics import sensors as _sens
    if meta.nsensor:
        fsens = None
        if data.xfrc_applied is None:
            from flybody_tpu.ops import sens_stage as _ss
            fsens = _ss.make_sens_stage_pe(model)
        if fsens is not None:
            cb12 = jnp.stack([efc.con_body1.astype(dtype),
                              efc.con_body2.astype(dtype)])
            sd = fsens(data.qacc, data.qvel, data.cvel, data.cdof,
                       data.cdof_dot, data.cinert, data.site_xpos,
                       data.site_xmat, data.subtree_com, efc.con_xpos,
                       efc.con_normal, cb12, efc.con_active, f_c)
            data = data.replace(sensordata=sd)
        else:
            data = data.replace(
                sensordata=_sens.sensordata(model, data, efc, f_c,
                                            terrain=terrain_on))
    else:
        data = data.replace(sensordata=jnp.zeros((0,), dtype))
    return data


def step(model: FlyModel, data: Data, **kwargs) -> Data:
    """One physics step (mj_step): forward dynamics + Euler integration."""
    data = fwd(model, data, **kwargs)
    return _sm.euler(model, data)
