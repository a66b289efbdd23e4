"""Fluid forces: inertia-box model and ellipsoid model.

The fly model runs in a viscous medium (fruitfly.xml:4, density=0.00128,
viscosity=0.000185 CGS), so every body experiences inertia-box fluid drag;
flight tasks additionally activate the ellipsoid fluid model on the wing
'fluid' geoms with fluidcoef=(1.0, 0.5, 1.5, 1.7, 1.0)
(reference flybody/tasks/base.py:318-322, constants.py:28).

Semantics follow MuJoCo's passive fluid forces (the reference ships its own
Python port for analysis at flybody/ellipsoid_fluid_model.py; this is an
independent vectorized JAX implementation of the same published model).

TPU-first: both models are computed vectorized over all bodies/geoms with
static masks; forces are projected to joint space with one masked matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from flybody_tpu.model.spec import FlyModel
from flybody_tpu.physics.state import Data

_MJMINVAL = 1e-15


def _object_local_velocity(data, rootid, pos, mat, bodyid):
    """6D velocity of an object frame, in local coordinates.

    Equivalent to mj_objectVelocity(..., flg_local=1): take the body spatial
    velocity (reference point = root subtree CoM), shift the linear part to
    the object origin, rotate both parts into the object frame.
    """
    cvel = data.cvel[bodyid]  # (..., 6)
    w, v = cvel[..., :3], cvel[..., 3:]
    ref = data.subtree_com[rootid]
    v_at = v + jnp.cross(w, pos - ref)
    matT = jnp.swapaxes(mat, -1, -2)
    # mul+sum (batched 3x3 matvecs serialize on the MXU).
    lw = jnp.sum(matT * w[..., None, :], axis=-1)
    lv = jnp.sum(matT * v_at[..., None, :], axis=-1)
    return lw, lv


def _project_wrench(model, data, torque, force, point, bodymask):
    """qfrc += Jᵀ (force, torque) applied at `point` on each body.

    torque/force/point: (nbody, 3) world frame; bodymask: (nbody,) 0/1.
    """
    dtype = force.dtype
    root = np.array(model.meta.body_rootid)
    ref = data.subtree_com[root]
    t_ref = torque + jnp.cross(point - ref, force)
    f_spatial = jnp.concatenate([t_ref, force], axis=-1) * bodymask[:, None]
    mask = model.body_dof_mask.astype(dtype)
    return jnp.einsum('vi,vi->v', data.cdof, mask.T @ f_spatial)


@functools.lru_cache(maxsize=8)
def _fluid_tables(meta):
    geom_active = np.array(meta.geom_fluid_active, dtype=bool)
    body_uses_ellipsoid = np.zeros(meta.nbody, dtype=bool)
    for g in range(meta.ngeom):
        if geom_active[g]:
            body_uses_ellipsoid[meta.geom_bodyid[g]] = True
    return dict(
        geom_active=geom_active,
        body_uses_ellipsoid=body_uses_ellipsoid,
        geom_bodyid=np.array(meta.geom_bodyid),
        geom_rootid=np.array(meta.body_rootid)[np.array(meta.geom_bodyid)],
        body_rootid=np.array(meta.body_rootid),
    )


def _inertia_box_forces(model: FlyModel, data: Data,
                        tb) -> jax.Array:
    """Inertia-box fluid model, vectorized over bodies."""
    dtype = data.qpos.dtype
    mass = model.body_mass.astype(dtype)
    inertia = model.body_inertia.astype(dtype)
    viscosity = model.viscosity.astype(dtype)
    density = model.density.astype(dtype)

    # Equivalent inertia box semi-dimensions.
    i0, i1, i2 = inertia[:, 0], inertia[:, 1], inertia[:, 2]
    safe_mass = jnp.maximum(mass, _MJMINVAL)
    box = jnp.stack([
        jnp.sqrt(jnp.maximum(_MJMINVAL, i1 + i2 - i0) / safe_mass * 6.0),
        jnp.sqrt(jnp.maximum(_MJMINVAL, i0 + i2 - i1) / safe_mass * 6.0),
        jnp.sqrt(jnp.maximum(_MJMINVAL, i0 + i1 - i2) / safe_mass * 6.0),
    ], axis=-1)  # (nbody, 3)

    # Local velocity at the body inertial frame, minus wind.
    lw, lv = _object_local_velocity(data, tb['body_rootid'], data.xipos,
                                    data.ximat, np.arange(model.meta.nbody))
    wind_local = jnp.sum(data.ximat * model.wind.astype(dtype)[:, None],
                         axis=-2)
    lv = lv - wind_local

    # Viscous (Stokes-sphere) force/torque.
    diam = jnp.mean(box, axis=-1)
    ltrq = -jnp.pi * diam[:, None] ** 3 * viscosity * lw
    lfrc = -3.0 * jnp.pi * diam[:, None] * viscosity * lv

    # Quadratic lift/drag.
    b0, b1, b2 = box[:, 0], box[:, 1], box[:, 2]
    lfrc = lfrc - 0.5 * density * jnp.stack([
        b1 * b2 * jnp.abs(lv[:, 0]) * lv[:, 0],
        b0 * b2 * jnp.abs(lv[:, 1]) * lv[:, 1],
        b0 * b1 * jnp.abs(lv[:, 2]) * lv[:, 2],
    ], axis=-1)
    ltrq = ltrq - density / 64.0 * jnp.stack([
        b0 * (b1**4 + b2**4) * jnp.abs(lw[:, 0]) * lw[:, 0],
        b1 * (b0**4 + b2**4) * jnp.abs(lw[:, 1]) * lw[:, 1],
        b2 * (b0**4 + b1**4) * jnp.abs(lw[:, 2]) * lw[:, 2],
    ], axis=-1)

    # Rotate to world, apply at body inertial com.
    world_t = jnp.sum(data.ximat * ltrq[..., None, :], axis=-1)
    world_f = jnp.sum(data.ximat * lfrc[..., None, :], axis=-1)
    bodymask = jnp.asarray(
        (~tb['body_uses_ellipsoid'])
        & (np.arange(model.meta.nbody) > 0), dtype)
    bodymask = bodymask * (mass > _MJMINVAL).astype(dtype)
    return _project_wrench(model, data, world_t, world_f, data.xipos,
                           bodymask)


def _ellipsoid_forces(model: FlyModel, data: Data, tb,
                      return_components: bool = False):
    """Ellipsoid fluid model, vectorized over fluid-interaction geoms.

    With return_components=True, also returns the named per-geom force and
    torque components in world frame (fA/fD/fM/fK/fV, gA/gD/gV — the same
    decomposition as the reference analysis tool,
    flybody/ellipsoid_fluid_model.py:16-86).
    """
    dtype = data.qpos.dtype
    meta = model.meta
    density = model.density.astype(dtype)
    viscosity = model.viscosity.astype(dtype)

    gf = model.geom_fluid.astype(dtype)  # (ngeom, 12)
    interaction = gf[:, 0]
    blunt_drag = gf[:, 1]
    slender_drag = gf[:, 2]
    ang_drag = gf[:, 3]
    kutta_lift = gf[:, 4]
    magnus_lift = gf[:, 5]
    virtual_mass = gf[:, 6:9]
    virtual_inertia = gf[:, 9:12]

    size = model.geom_size.astype(dtype)  # semiaxes (ngeom, 3)
    s0, s1, s2 = size[:, 0], size[:, 1], size[:, 2]

    lw, lv = _object_local_velocity(data, tb['geom_rootid'], data.geom_xpos,
                                    data.geom_xmat, tb['geom_bodyid'])
    wind_local = jnp.sum(data.geom_xmat * model.wind.astype(dtype)[:, None],
                         axis=-2)
    lv = lv - wind_local

    # Added-mass ("virtual") momenta.
    v_lin_mom = density * virtual_mass * lv
    v_ang_mom = density * virtual_inertia * lw
    fA = jnp.cross(v_lin_mom, lw)
    gA = jnp.cross(v_lin_mom, lv) + jnp.cross(v_ang_mom, lw)

    # Magnus lift.
    volume = 4.0 / 3.0 * jnp.pi * s0 * s1 * s2
    fM = magnus_lift[:, None] * density * volume[:, None] * jnp.cross(lw, lv)

    # Kutta lift.
    d_max = jnp.max(size, axis=-1)
    d_min = jnp.min(size, axis=-1)
    d_mid = s0 + s1 + s2 - d_max - d_min
    A_max = jnp.pi * d_max * d_mid
    proj_denom = ((s1 * s2) ** 4 * lv[:, 0] ** 2
                  + (s2 * s0) ** 4 * lv[:, 1] ** 2
                  + (s0 * s1) ** 4 * lv[:, 2] ** 2)
    proj_num = ((s1 * s2 * lv[:, 0]) ** 2
                + (s2 * s0 * lv[:, 1]) ** 2
                + (s0 * s1 * lv[:, 2]) ** 2)
    A_proj = jnp.pi * jnp.sqrt(proj_denom
                               / jnp.maximum(_MJMINVAL, proj_num))
    norm = jnp.stack([(s1 * s2) ** 2 * lv[:, 0],
                      (s2 * s0) ** 2 * lv[:, 1],
                      (s0 * s1) ** 2 * lv[:, 2]], axis=-1)
    speed = jnp.linalg.norm(lv, axis=-1)
    cos_alpha = proj_num / jnp.maximum(_MJMINVAL, speed * proj_denom)
    kutta_circ = (kutta_lift * density * cos_alpha * A_proj)[:, None] \
        * jnp.cross(norm, lv)
    fK = jnp.cross(kutta_circ, lv)

    # Stokes-flow (viscous) coefficients.
    eq_sphere_D = 2.0 / 3.0 * (s0 + s1 + s2)
    lin_visc_force_coef = 3.0 * jnp.pi * eq_sphere_D
    lin_visc_torq_coef = jnp.pi * eq_sphere_D ** 3

    # Angular quadratic drag via per-axis maximum moments.
    def max_moment(d0, da, db):
        return 8.0 / 15.0 * jnp.pi * d0 * jnp.maximum(da, db) ** 4

    II = jnp.stack([max_moment(s0, s1, s2),
                    max_moment(s1, s2, s0),
                    max_moment(s2, s0, s1)], axis=-1)
    I_max = (8.0 / 15.0 * jnp.pi * d_mid * d_max ** 4)[:, None]
    mom_visc = lw * (ang_drag[:, None] * II
                     + slender_drag[:, None] * (I_max - II))

    drag_lin_coef = (viscosity * lin_visc_force_coef
                     + density * speed * (A_proj * blunt_drag
                                          + slender_drag * (A_max - A_proj)))
    drag_ang_coef = (viscosity * lin_visc_torq_coef
                     + density * jnp.linalg.norm(mom_visc, axis=-1))

    ltrq = gA - drag_ang_coef[:, None] * lw
    lfrc = fA + fM + fK - drag_lin_coef[:, None] * lv

    ltrq = ltrq * interaction[:, None]
    lfrc = lfrc * interaction[:, None]

    if return_components:
        speed_ = speed[:, None]
        fD = -(density * speed_ * (A_proj * blunt_drag
                                   + slender_drag * (A_max - A_proj)
                                   )[:, None]) * lv
        fV = -(viscosity * lin_visc_force_coef)[:, None] * lv
        gD = -(density * jnp.linalg.norm(mom_visc, axis=-1))[:, None] * lw
        gV = -(viscosity * lin_visc_torq_coef)[:, None] * lw
        comps = {'fA': fA, 'fD': fD, 'fM': fM, 'fK': fK, 'fV': fV,
                 'gA': gA, 'gD': gD, 'gV': gV}
        R = data.geom_xmat
        comps = {k: jnp.sum(R * (v * interaction[:, None])[..., None, :],
                            axis=-1)
                 for k, v in comps.items()}

    # Rotate to world, sum per body at geom positions.
    world_t = jnp.sum(data.geom_xmat * ltrq[..., None, :], axis=-1)
    world_f = jnp.sum(data.geom_xmat * lfrc[..., None, :], axis=-1)

    geommask = jnp.asarray(tb['geom_active'], dtype)
    root = tb['geom_rootid']
    ref = data.subtree_com[root]
    t_ref = world_t + jnp.cross(data.geom_xpos - ref, world_f)
    f_spatial = jnp.concatenate([t_ref, world_f], axis=-1) \
        * geommask[:, None]
    # Scatter to bodies then project (geoms of the same body share dofs).
    f_body = jnp.zeros((meta.nbody, 6), dtype).at[tb['geom_bodyid']].add(
        f_spatial)
    mask = model.body_dof_mask.astype(dtype)
    qfrc = jnp.einsum('vi,vi->v', data.cdof, mask.T @ f_body)
    if return_components:
        return qfrc, comps
    return qfrc


def ellipsoid_force_components(model: FlyModel, data: Data):
    """Per-geom ellipsoid fluid force decomposition in world frame
    (analysis counterpart of reference flybody/ellipsoid_fluid_model.py).

    Returns (qfrc_fluid_ellipsoid, components) where components maps
    {'fA','fD','fM','fK','fV','gA','gD','gV'} -> (ngeom, 3) arrays (zero
    rows for geoms without fluidshape='ellipsoid')."""
    tb = _fluid_tables(model.meta)
    return _ellipsoid_forces(model, data, tb, return_components=True)


def fluid(model: FlyModel, data: Data) -> Data:
    """Total fluid generalized forces (qfrc_fluid)."""
    tb = _fluid_tables(model.meta)
    qfrc = _inertia_box_forces(model, data, tb)
    if tb['geom_active'].any():
        qfrc = qfrc + _ellipsoid_forces(model, data, tb)
    return data.replace(qfrc_fluid=qfrc)
