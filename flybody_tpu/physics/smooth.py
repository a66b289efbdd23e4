"""Smooth (constraint-free) dynamics: velocities, CRB, RNE, passive forces,
actuation, and the smooth forward pass.

TPU-first design: the classic recursive algorithms are recast as dense
masked matmuls that map onto the MXU and batch over thousands of flies:

  * body spatial velocities   cvel = (A ⊙ qvel) @ cdof          (A = ancestor mask)
  * dof motion derivatives    cdof_dot[i] = vel_prefix(i) ×ₘ cdof[i]
  * mass matrix               M = Σ_b J_bᵀ I_b J_b  as one (nv × 6·nbody)
                              by (6·nbody × nv) matmul
  * bias forces               qfrc_bias = cdof · (Aᵀ f_bodies)

Reference semantics: MuJoCo mj_comVel / mj_crb / mj_rne / mj_passive /
mj_fwdActuation, applied to the fly model (fruitfly.xml).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from flybody_tpu.model import spec as _s
from flybody_tpu.model.spec import FlyModel
from flybody_tpu.physics import math as sm
from flybody_tpu.physics.state import Data


# -----------------------------------------------------------------------------
# Velocity stage.


def com_vel(model: FlyModel, data: Data) -> Data:
    """Body spatial velocities and dof motion-vector derivatives."""
    qvel = data.qvel
    cdof = data.cdof
    # cvel[b] = sum over ancestor dofs of cdof_i * qvel_i.
    cvel = (model.body_dof_mask.astype(qvel.dtype) * qvel) @ cdof
    # Velocity prefix seen by each dof (mj_comVel accumulation order).
    prefix = (model.dof_prefix_mask.astype(qvel.dtype) * qvel) @ cdof
    cdof_dot = sm.motion_cross(prefix, cdof)
    return data.replace(cvel=cvel, cdof_dot=cdof_dot)


def tendon_vel(model: FlyModel, data: Data) -> Data:
    ten_velocity = model.ten_J.astype(data.qvel.dtype) @ data.qvel
    return data.replace(ten_velocity=ten_velocity)


# -----------------------------------------------------------------------------
# Composite rigid body: dense mass matrix.


@functools.lru_cache(maxsize=8)
def _crb_tables(meta: _s.Meta):
    """Static tables for the composite-rigid-body sweep.

    anc_low[i, j] = 1 iff dof j is an ancestor-or-self dof of dof i with
    j <= i (the lower triangle of the tree-sparsity pattern of M)."""
    from flybody_tpu.physics import kinematics as _kin
    tb = _kin._tables(meta)
    nv = meta.nv
    dof_body = np.array(meta.dof_bodyid)
    # body_dof_mask is on the model (device); rebuild it host-side from the
    # subtree mask: dof j (of body b_j) is an ancestor dof of body b iff b
    # is in the subtree of b_j.
    sub = np.asarray(tb['subtree_mask'])  # sub[b, c]=1 iff c in subtree(b)
    body_dof = sub[dof_body, :].T  # (nbody, nv): dof j anc-of-self of b
    anc = body_dof[dof_body]  # (nv, nv)
    low = np.tril(np.ones((nv, nv)))
    return dict(anc_low=(anc * low), subtree_mask=np.asarray(
        tb['subtree_mask']), dof_body=dof_body)


def crb(model: FlyModel, data: Data) -> Data:
    """Dense joint-space mass matrix via composite rigid bodies.

    TPU form of mj_crb: accumulate spatial inertias up the tree with one
    static (nbody, nbody) matmul, then M[i, j] = cdof_j · (I^c_{b(i)} cdof_i)
    masked to the tree-sparsity pattern — one (nv, 6)(6, nv) MXU matmul
    instead of the (nv, 6·nbody)(6·nbody, nv) masked form (≈7x less work
    and ~20x less HBM traffic at batch)."""
    dtype = data.qpos.dtype
    meta = model.meta
    tb = _crb_tables(meta)
    nb = meta.nbody
    # Composite inertia per body: sum of cinert over the body's subtree.
    sub = jnp.asarray(tb['subtree_mask'], dtype)  # (nbody, nbody)
    crb_acc = (sub @ data.cinert.reshape(nb, 36)).reshape(nb, 6, 6)
    Ic = crb_acc[tb['dof_body']]  # (nv, 6, 6), static gather
    # buf_i = I^c_{b(i)} @ cdof_i as mul+sum (tiny batched matmuls
    # serialize on the MXU).
    buf = jnp.sum(Ic * data.cdof[:, None, :], axis=-1)  # (nv, 6)
    P = buf @ data.cdof.T  # (nv, nv) MXU matmul
    A = jnp.asarray(tb['anc_low'], dtype)
    ML = A * P
    M = ML + ML.T - jnp.diag(jnp.diagonal(ML))
    M = M + jnp.diag(model.dof_armature.astype(dtype))
    return data.replace(qM=M)


@functools.lru_cache(maxsize=8)
def _crb_packed_tables(meta: _s.Meta):
    from flybody_tpu.ops import arrow as _ar
    part = _ar.build_partition(meta)
    tb = _crb_tables(meta)
    anc = np.asarray(tb['anc_low'])
    idx, w, _ = _ar._limb_dof_tables(part)
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    ancp = np.zeros((nl, dm, dm))
    for i, (lo, d) in enumerate(zip(part.los, part.ds)):
        ancp[i, :d, :d] = anc[lo:lo + d, lo:lo + d]
    return dict(part=part, idx=idx, w=w, ancp=ancp,
                anc_root=anc[:nr, :nr])


def crb_packed(model: FlyModel, data: Data) -> Data:
    """Mass matrix in block-arrow PACKED form (ops/arrow.py
    pack_sym_ref layout) — the dense (nv, nv) M is never materialized.

    Same composite-rigid-body math as crb(), but only the tree-sparse
    blocks are formed: per-limb diagonal blocks D_l, the root border
    B_l, and the root block R (~14 KB/env packed vs 46.7 KB dense at
    nv=108 — M is the hottest repeatedly-read operand in the Newton
    solve)."""
    dtype = data.qpos.dtype
    meta = model.meta
    tb = _crb_tables(meta)
    nb = meta.nbody
    sub = jnp.asarray(tb['subtree_mask'], dtype)
    crb_acc = (sub @ data.cinert.reshape(nb, 36)).reshape(nb, 6, 6)
    Ic = crb_acc[tb['dof_body']]  # (nv, 6, 6), static gather
    buf = jnp.sum(Ic * data.cdof[:, None, :], axis=-1)  # (nv, 6)

    pt = _crb_packed_tables(meta)
    part = pt['part']
    from flybody_tpu.ops import arrow as _ar
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    idx = pt['idx']  # numpy: static gathers
    w = jnp.asarray(pt['w'], dtype)
    arm = jnp.asarray(model.dof_armature).astype(dtype)
    bufp = buf[idx] * w[:, :, None]          # (nl, dm, 6)
    cdofp = data.cdof[idx] * w[:, :, None]   # (nl, dm, 6)
    # P[l, i, j] = buf_i . cdof_j within limb l (mul+sum, no batched
    # tiny matmuls).
    P = jnp.sum(bufp[:, :, None, :] * cdofp[:, None, :, :], axis=-1)
    ML = jnp.asarray(pt['ancp'], dtype) * P
    eye_dm = jnp.eye(dm, dtype=dtype)
    D = (ML + jnp.swapaxes(ML, 1, 2)
         - eye_dm[None] * jnp.diagonal(ML, axis1=1, axis2=2)[:, None, :]
         + eye_dm[None] * (arm[idx] * w)[:, None, :])
    # Border rows: B_l[r, j] = buf_j . cdof_r (root is an ancestor of
    # every limb dof).
    Bl = jnp.sum(bufp[:, :, None, :]
                 * data.cdof[None, None, :nr, :], axis=-1)  # (nl, dm, nr)
    Bl = jnp.swapaxes(Bl, 1, 2)  # (nl, nr, dm)
    # Root block.
    Pr = jnp.sum(buf[:nr, None, :] * data.cdof[None, :nr, :], axis=-1)
    MLr = jnp.asarray(pt['anc_root'], dtype) * Pr
    R = (MLr + MLr.T - jnp.diag(jnp.diagonal(MLr))
         + jnp.diag(arm[:nr]))
    limb_rows = jnp.concatenate([D, Bl], axis=1)  # (nl, dm+nr, dm)
    root_row = (jnp.zeros((1, dm + nr, dm), dtype)
                .at[0, :nr, :nr].set(R))
    Mp = jnp.concatenate([limb_rows, root_row], axis=0)
    Mp = Mp + jnp.asarray(_ar._pad_eye_np(part), dtype)
    return data.replace(qM=Mp)


def arrow_ops(meta: _s.Meta):
    """Block-arrow factor/solve ops for this tree, or None (dense path).

    The fly's 12-limb tree factors ~26x cheaper in block-arrow form
    (ops/arrow.py); FLYBODY_NO_ARROW=1 forces dense for A/B testing."""
    from flybody_tpu.ops import arrow as _ar
    if not _ar.enabled():
        return None
    part = _ar.build_partition(meta)
    if part is None:
        return None
    return _ar.ops_for(part)


def factor_m(model: FlyModel, data: Data,
             extra_diag: jax.Array | None = None) -> Data:
    """Cholesky factorization of (qM + diag(extra_diag)).

    Block-arrow factorization when the tree supports it (ops/arrow.py),
    dense pallas Cholesky otherwise (ops/cholesky.py). The factor kind
    is carried in qLD's rank: (nv, nv) dense vs (nl+1, dm+nr, dm)
    packed arrow."""
    M = data.qM
    aops = arrow_ops(model.meta)
    if M.ndim == 3:  # packed arrow M (crb_packed)
        from flybody_tpu.ops import arrow as _ar
        part = _ar.build_partition(model.meta)
        if extra_diag is not None:
            M = _ar.add_diag_packed(part, M, extra_diag)
        return data.replace(qLD=aops.chol_pe(M))
    if extra_diag is not None:
        M = M + jnp.diag(extra_diag)
    if aops is not None:
        return data.replace(qLD=aops.chol_pe(M))
    from flybody_tpu.ops import cholesky as _pchol
    return data.replace(qLD=_pchol.chol_pe(M))


def factor_solve_m(model: FlyModel, data: Data,
                   rhs: jax.Array) -> tuple[Data, jax.Array]:
    """Fused factor_m + solve_m: one factor+solve launch instead of a
    factor launch followed by a substitution launch (the factor kernel's
    cost is dominated by moving M; the fused kernel solves while M is
    already VMEM-resident)."""
    M = data.qM
    aops = arrow_ops(model.meta)
    if aops is not None:
        qLD, x = aops.chol_solve_pe(M, rhs)
        return data.replace(qLD=qLD), x
    from flybody_tpu.ops import cholesky as _pchol
    qLD, x = _pchol.chol_solve_pe(M, rhs)
    return data.replace(qLD=qLD), x


def solve_m(model: FlyModel, data: Data, rhs: jax.Array) -> jax.Array:
    """Solve qM x = rhs using the cached factor (dense or arrow-packed;
    distinguished by qLD rank). Vector rhs takes the single-RHS pallas
    substitution kernel; matrix rhs the multi-RHS kernel (XLA's batched
    triangular solves run ~10x slower at batch 8192 — measured v5e)."""
    if data.qLD.ndim == 3:  # packed arrow factor
        aops = arrow_ops(model.meta)
        return aops.solve_pe(data.qLD, rhs)
    from flybody_tpu.ops import cholesky as _pchol
    if rhs.ndim == 1:
        return _pchol.cho_solve_pe(data.qLD, rhs)
    return _pchol.cho_solve_multi_pe(data.qLD, rhs)


# -----------------------------------------------------------------------------
# Recursive Newton-Euler: bias forces.


def rne(model: FlyModel, data: Data) -> Data:
    """qfrc_bias = C(qpos, qvel) qvel + gravity loads (mj_rne, flg_acc=0)."""
    dtype = data.qpos.dtype
    qvel = data.qvel
    mask = model.body_dof_mask.astype(dtype)

    # Velocity-product accelerations + gravity pseudo-acceleration.
    cacc = (mask * qvel) @ data.cdof_dot  # (nbody, 6)
    grav = jnp.concatenate(
        [jnp.zeros(3, dtype), -model.gravity.astype(dtype)])
    cacc = cacc + grav

    # Per-body Newton-Euler forces: f = I a + v ×* (I v).
    # mul+sum (batched 6x6 matvecs serialize on the MXU).
    Iv = jnp.sum(data.cinert * data.cvel[:, None, :], axis=-1)
    f = jnp.sum(data.cinert * cacc[:, None, :], axis=-1) + sm.force_cross(
        data.cvel, Iv)

    # Project into joint space: qfrc_bias_i = cdof_i · Σ_{b ⊇ i} f_b.
    qfrc_bias = jnp.einsum('vi,vi->v', data.cdof, mask.T @ f)
    return data.replace(qfrc_bias=qfrc_bias)


# -----------------------------------------------------------------------------
# Passive forces: joint/tendon springs and dampers. (Fluid forces are added
# by physics/fluid.py on top of these.)


@functools.lru_cache(maxsize=8)
def _spring_tables(meta: _s.Meta):
    """1:1 qpos<->dof maps for slide/hinge joints with springs."""
    qadr, dadr = [], []
    for j in range(meta.njnt):
        if meta.jnt_type[j] in (_s.SLIDE, _s.HINGE):
            qadr.append(meta.jnt_qposadr[j])
            dadr.append(meta.jnt_dofadr[j])
        else:
            # Spring on ball/free joints unsupported (zero in the fly model).
            pass
    jids = [j for j in range(meta.njnt)
            if meta.jnt_type[j] in (_s.SLIDE, _s.HINGE)]
    return (np.array(qadr, dtype=np.int64), np.array(dadr, dtype=np.int64),
            np.array(jids, dtype=np.int64))


def passive(model: FlyModel, data: Data) -> Data:
    """Spring/damper passive forces (mj_passive minus fluid)."""
    dtype = data.qpos.dtype
    meta = model.meta
    qfrc = jnp.zeros((meta.nv,), dtype)

    # Joint springs (slide/hinge): -k (qpos - qpos_spring).
    qadr, dadr, jids = _spring_tables(meta)
    if len(jids):
        k = model.jnt_stiffness[jids].astype(dtype)
        disp = data.qpos[qadr] - model.qpos_spring[qadr].astype(dtype)
        qfrc = qfrc.at[dadr].add(-k * disp)

    # Dof dampers: -b qvel.
    qfrc = qfrc - model.dof_damping.astype(dtype) * data.qvel

    # Tendon springs (with deadband) and dampers.
    if meta.ntendon:
        ls = model.ten_lengthspring.astype(dtype)
        length = data.ten_length
        disp = jnp.where(length > ls[:, 1], length - ls[:, 1],
                         jnp.where(length < ls[:, 0], length - ls[:, 0],
                                   jnp.zeros_like(length)))
        frc = (-model.ten_stiffness.astype(dtype) * disp
               - model.ten_damping.astype(dtype) * data.ten_velocity)
        qfrc = qfrc + model.ten_J.astype(dtype).T @ frc

    return data.replace(qfrc_passive=qfrc)


# -----------------------------------------------------------------------------
# Actuation.


@functools.lru_cache(maxsize=8)
def _act_tables(meta: _s.Meta):
    """Static actuator tables: transmission length maps and dynamics masks."""
    nu = meta.nu
    trn_qadr = np.zeros(nu, dtype=np.int64)  # qpos index for joint trans
    trn_dadr = np.zeros(nu, dtype=np.int64)
    is_joint = np.zeros(nu)
    is_tendon = np.zeros(nu)
    ten_id = np.zeros(nu, dtype=np.int64)
    for u in range(nu):
        t = meta.actuator_trntype[u]
        tid = meta.actuator_trnid[u]
        if t == _s.TRN_JOINT:
            is_joint[u] = 1.0
            trn_qadr[u] = meta.jnt_qposadr[tid]
            trn_dadr[u] = meta.jnt_dofadr[tid]
        elif t == _s.TRN_TENDON:
            is_tendon[u] = 1.0
            ten_id[u] = tid
    dyn = np.array(meta.actuator_dyntype)
    has_act = np.array(meta.actuator_actadr) >= 0
    act_first = np.array(
        [meta.actuator_actadr[u] if has_act[u] else 0 for u in range(nu)],
        dtype=np.int64)
    # Static act-index -> actuator-index map (the fly model's stateful
    # actuators all have actnum == 1).
    na = sum(1 for a in meta.actuator_actadr if a >= 0)
    act_to_u = np.zeros(max(na, 1), dtype=np.int64)
    for u in range(nu):
        if meta.actuator_actadr[u] >= 0:
            act_to_u[meta.actuator_actadr[u]] = u
    act_to_u = act_to_u[:na]
    return dict(trn_qadr=trn_qadr, trn_dadr=trn_dadr, is_joint=is_joint,
                is_tendon=is_tendon, ten_id=ten_id, dyn=dyn,
                has_act=has_act.astype(np.float64), act_first=act_first,
                act_to_u=act_to_u)


def actuation(model: FlyModel, data: Data) -> Data:
    """Actuator forces and activation derivatives (mj_fwdActuation)."""
    dtype = data.qpos.dtype
    meta = model.meta
    tb = _act_tables(meta)

    # Clamp ctrl to ctrlrange (all fly actuators are ctrllimited,
    # fruitfly.xml:11).
    ctrlrange = model.actuator_ctrlrange.astype(dtype)
    ctrl = jnp.clip(data.ctrl, ctrlrange[:, 0], ctrlrange[:, 1])

    # Activation dynamics: filter / filterexact share act_dot = (ctrl-act)/tau.
    if meta.na:
        act_for_u = data.act[tb['act_first']]
        tau = jnp.maximum(model.actuator_dynprm[:, 0].astype(dtype), 1e-10)
        act_dot_u = (ctrl - act_for_u) / tau
        act_dot = act_dot_u[tb['act_to_u']]
        # Actuator input: act if stateful else ctrl.
        has_act = jnp.asarray(tb['has_act'], dtype)
        inp = has_act * act_for_u + (1.0 - has_act) * ctrl
    else:
        act_dot = jnp.zeros((0,), dtype)
        inp = ctrl

    # Transmission length/velocity.
    length = (jnp.asarray(tb['is_joint'], dtype)
              * data.qpos[tb['trn_qadr']]
              + jnp.asarray(tb['is_tendon'], dtype)
              * data.ten_length[tb['ten_id']])
    velocity = (jnp.asarray(tb['is_joint'], dtype)
                * data.qvel[tb['trn_dadr']]
                + jnp.asarray(tb['is_tendon'], dtype)
                * data.ten_velocity[tb['ten_id']])
    gear = model.actuator_gear0.astype(dtype)
    length = length * gear
    velocity = velocity * gear

    # Gain (fixed) and bias (none / affine).
    gain = model.actuator_gainprm[:, 0].astype(dtype)
    bias = (model.actuator_biasprm[:, 0].astype(dtype)
            + model.actuator_biasprm[:, 1].astype(dtype) * length
            + model.actuator_biasprm[:, 2].astype(dtype) * velocity)
    is_affine = jnp.asarray(
        np.array(meta.actuator_biastype) == _s.BIAS_AFFINE, dtype)
    force = gain * inp + is_affine * bias

    # Clamp to forcerange where limited.
    fr = model.actuator_forcerange.astype(dtype)
    limited = model.actuator_forcelimited.astype(dtype)
    force = limited * jnp.clip(force, fr[:, 0], fr[:, 1]) + (
        1.0 - limited) * force

    qfrc_actuator = model.actuator_moment.astype(dtype).T @ force
    return data.replace(actuator_force=force, act_dot=act_dot,
                        qfrc_actuator=qfrc_actuator, ctrl=data.ctrl)


# -----------------------------------------------------------------------------
# Applied forces.


def xfrc_accumulate(model: FlyModel, data: Data) -> jax.Array:
    """Map Cartesian per-body applied wrenches to joint space.

    data.xfrc_applied follows the mjData convention (force(3); torque(3))
    applied at the body frame origin, world coordinates.
    """
    if data.xfrc_applied is None:
        return jnp.zeros((model.meta.nv,), data.qpos.dtype)
    dtype = data.qpos.dtype
    # Convert to (torque; force) at the kinematic-root subtree CoM point.
    root = np.array(model.meta.body_rootid)
    ref = data.subtree_com[root]
    force = data.xfrc_applied[:, :3]
    torque = data.xfrc_applied[:, 3:]
    torque_ref = torque + jnp.cross(data.xpos - ref, force)
    f = jnp.concatenate([torque_ref, force], axis=-1)
    mask = model.body_dof_mask.astype(dtype)
    return jnp.einsum('vi,vi->v', data.cdof, mask.T @ f)


# -----------------------------------------------------------------------------
# Smooth forward + Euler integration.


def fwd_smooth(model: FlyModel, data: Data) -> Data:
    """Everything up to (but excluding) constraints: fills qfrc_smooth."""
    from flybody_tpu.physics import kinematics as kin
    from flybody_tpu.physics import fluid as _fluid

    data, _, _ = kin.fwd_position_smooth(model, data)
    data = com_vel(model, data)
    data = tendon_vel(model, data)
    data = crb(model, data)
    data = rne(model, data)
    data = passive(model, data)
    data = _fluid.fluid(model, data)
    data = actuation(model, data)

    qfrc_applied = (data.qfrc_applied if data.qfrc_applied is not None
                    else jnp.zeros_like(data.qvel))
    qfrc_smooth = (data.qfrc_passive + data.qfrc_fluid + data.qfrc_actuator
                   + qfrc_applied + xfrc_accumulate(model, data)
                   - data.qfrc_bias)
    return data.replace(qfrc_smooth=qfrc_smooth)


@functools.lru_cache(maxsize=8)
def _integrate_tables(meta: _s.Meta):
    """qpos/dof correspondence for integration, grouped by joint type."""
    lin_q, lin_d = [], []  # 1:1 qpos-dof (hinge/slide + free translation)
    quat_q, quat_d = [], []  # quaternion qpos with 3 dofs (ball/free-rot)
    for j in range(meta.njnt):
        t, qadr, dadr = (meta.jnt_type[j], meta.jnt_qposadr[j],
                         meta.jnt_dofadr[j])
        if t in (_s.SLIDE, _s.HINGE):
            lin_q.append(qadr)
            lin_d.append(dadr)
        elif t == _s.BALL:
            quat_q.append(qadr)
            quat_d.append(dadr)
        elif t == _s.FREE:
            lin_q += [qadr, qadr + 1, qadr + 2]
            lin_d += [dadr, dadr + 1, dadr + 2]
            quat_q.append(qadr + 3)
            quat_d.append(dadr + 3)
    return (np.array(lin_q, dtype=np.int64), np.array(lin_d, dtype=np.int64),
            np.array(quat_q, dtype=np.int64),
            np.array(quat_d, dtype=np.int64))


def integrate_pos(model: FlyModel, qpos: jax.Array, qvel: jax.Array,
                  dt) -> jax.Array:
    """mj_integratePos: advance qpos by qvel*dt with quaternion handling."""
    from flybody_tpu.utils import quaternions as quat

    lin_q, lin_d, quat_q, quat_d = _integrate_tables(model.meta)
    out = qpos
    if len(lin_q):
        out = out.at[lin_q].add(dt * qvel[lin_d])
    if len(quat_q):
        gather_q = quat_q[:, None] + np.arange(4)[None, :]
        gather_d = quat_d[:, None] + np.arange(3)[None, :]
        q = qpos[gather_q]
        w = qvel[gather_d]
        q_new = quat.integrate_quat(q, w, dt)
        out = out.at[gather_q].set(q_new)
    return out


def _advance_act(model: FlyModel, data: Data, dt) -> jax.Array:
    """Advance activations: Euler for `filter`, exact for `filterexact`."""
    meta = model.meta
    if not meta.na:
        return data.act
    dtype = data.act.dtype
    tb = _act_tables(meta)
    dyn = np.array(meta.actuator_dyntype)[tb['act_to_u']]
    tau = jnp.maximum(
        model.actuator_dynprm[tb['act_to_u'], 0].astype(dtype), 1e-10)
    euler_new = data.act + dt * data.act_dot
    # filterexact: act + act_dot * tau * (1 - exp(-dt/tau)).
    exact_new = data.act + data.act_dot * tau * (1.0 - jnp.exp(-dt / tau))
    is_exact = jnp.asarray(dyn == _s.DYN_FILTEREXACT, dtype)
    return is_exact * exact_new + (1.0 - is_exact) * euler_new


def euler(model: FlyModel, data: Data) -> Data:
    """Semi-implicit Euler with implicit joint damping (mj_Euler)."""
    dt = model.timestep.astype(data.qpos.dtype)
    # Implicit damping: qacc = (M + dt diag(b))^{-1} qfrc_total.
    qfrc = data.qfrc_smooth + (data.qfrc_constraint
                               if data.qfrc_constraint is not None
                               else jnp.zeros_like(data.qfrc_smooth))
    # Fused factor+solve of the damped system (one VMEM pass).
    damp = dt * model.dof_damping.astype(qfrc.dtype)
    aops = arrow_ops(model.meta)
    if data.qM.ndim == 3:  # packed arrow M
        from flybody_tpu.ops import arrow as _ar
        part = _ar.build_partition(model.meta)
        Md = _ar.add_diag_packed(part, data.qM, damp)
        qLD, qacc = aops.chol_solve_pe(Md, qfrc)
    elif aops is not None:
        Md = data.qM + jnp.diag(damp)
        qLD, qacc = aops.chol_solve_pe(Md, qfrc)
    else:
        from flybody_tpu.ops import cholesky as _pchol
        Md = data.qM + jnp.diag(damp)
        qLD, qacc = _pchol.chol_solve_pe(Md, qfrc)
    data = data.replace(qLD=qLD)
    act = _advance_act(model, data, dt)
    qvel = data.qvel + dt * qacc
    qpos = integrate_pos(model, data.qpos, qvel, dt)
    return data.replace(qpos=qpos, qvel=qvel, act=act, qacc=qacc,
                        time=data.time + dt)


def step_smooth(model: FlyModel, data: Data) -> Data:
    """One contact-free physics step: smooth forward + Euler."""
    data = fwd_smooth(model, data)
    data = data.replace(qfrc_constraint=jnp.zeros_like(data.qfrc_smooth))
    return euler(model, data)
