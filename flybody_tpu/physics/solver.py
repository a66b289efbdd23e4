"""Constraint solver: joint limits + elliptic-cone contacts, Newton method.

Implements MuJoCo's soft-constraint model (validated row-by-row against
mjData.efc_* on live scenes):

  impedance  imp(r) from solimp (two-sided power sigmoid),
  reference  aref = -B*vel - K*imp*(pos - margin),
             B = 2/(dmax*timeconst), K = 1/(dmax^2*timeconst^2*dampratio^2),
  regularizer R = (1-imp)/imp * diagApprox(A),  D = 1/R.

The primal problem  min_x 0.5 (x-a_free)^T M (x-a_free) + s(Jx - aref)
is solved with exact Newton iterations + Newton line search. The per-cone
cost is 0.5*D*||jar - proj_Σ(jar)||^2 with Σ = {v : v_n >= mu*||v_t||},
whose projection and Jacobian are analytic, so gradients and the exact
(generalized) Hessian are assembled in closed form as dense MXU matmuls.

TPU-first: contacts are gathered to a static top-K set before Jacobian
assembly; everything else is fixed-shape masked math batched over envs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from flybody_tpu.model import spec as _s
from flybody_tpu.model.spec import FlyModel
from flybody_tpu.physics import collision as _col
from flybody_tpu.physics.state import Data

# Default static number of contact slots fed to the solver.
NCON_MAX = 64


def impedance(solimp, r):
    """Constraint impedance imp(r) (MuJoCo solimp sigmoid)."""
    d0, dmax, width, mid, power = (solimp[..., 0], solimp[..., 1],
                                   solimp[..., 2], solimp[..., 3],
                                   solimp[..., 4])
    x = jnp.clip(jnp.abs(r) / jnp.maximum(width, 1e-15), 0.0, 1.0)
    lo = x ** power / jnp.maximum(mid ** (power - 1), 1e-15)
    hi = 1.0 - (1.0 - x) ** power / jnp.maximum(
        (1.0 - mid) ** (power - 1), 1e-15)
    y = jnp.where(x <= mid, lo, hi)
    imp = d0 + y * (dmax - d0)
    return jnp.clip(imp, 1e-5, 1.0 - 1e-5)


def kbi(solref, solimp, r):
    """Stiffness K, damping B, impedance imp for a constraint row."""
    imp = impedance(solimp, r)
    dmax = solimp[..., 1]
    tc = solref[..., 0]
    dr = solref[..., 1]
    # Standard (positive) solref; direct format (-stiffness, -damping).
    std = tc > 0
    K = jnp.where(std,
                  1.0 / jnp.maximum((dmax * tc * dr) ** 2, 1e-15),
                  -solref[..., 0] / jnp.maximum(dmax * dmax, 1e-15))
    B = jnp.where(std, 2.0 / jnp.maximum(dmax * tc, 1e-15),
                  -solref[..., 1] / jnp.maximum(dmax, 1e-15))
    return K, B, imp


class EfcRows(NamedTuple):
    """Static-shape constraint rows: L limit rows + K contacts x 3 rows."""

    # Limits.
    lim_dof: np.ndarray  # (L,) static dof index
    lim_sign: np.ndarray  # (L,) +1 for lower limit, -1 for upper
    lim_active: jax.Array  # (L,)
    lim_aref: jax.Array  # (L,)
    lim_D: jax.Array  # (L,)
    lim_pos: jax.Array  # (L,)

    # Contacts (top-K gathered).
    con_J: jax.Array  # (K, 3, nv) rows: normal, tangent1, tangent2
    con_active: jax.Array  # (K,)
    con_frictional: jax.Array  # (K,) 1 if condim >= 3
    con_mu: jax.Array  # (K,)
    con_aref: jax.Array  # (K, 3)
    con_D: jax.Array  # (K,)
    con_pos: jax.Array  # (K,)  (dist)
    con_sel: jax.Array  # (K,) int32 indices into contact slots


@functools.lru_cache(maxsize=8)
def _limit_tables(meta: _s.Meta):
    """Two static rows (lower, upper) per limited slide/hinge joint."""
    dofs, signs, jids = [], [], []
    for j in range(meta.njnt):
        if meta.jnt_limited[j] and meta.jnt_type[j] in (_s.SLIDE, _s.HINGE):
            dofs += [meta.jnt_dofadr[j]] * 2
            signs += [1.0, -1.0]
            jids += [j, j]
    return (np.array(dofs, dtype=np.int64), np.array(signs),
            np.array(jids, dtype=np.int64))


def make_frame(normal):
    """Tangent basis for contact normals (batched)."""
    n = normal
    # Pick a helper axis least aligned with n.
    ax = jnp.zeros_like(n).at[..., 0].set(1.0)
    az = jnp.zeros_like(n).at[..., 2].set(1.0)
    helper = jnp.where(jnp.abs(n[..., 0:1]) > 0.9, az, ax)
    t1 = jnp.cross(n, helper)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-15)
    t2 = jnp.cross(n, t1)
    return t1, t2


def point_jacobian_diff(model: FlyModel, data: Data, body1, body2, pos):
    """J(body2, p) - J(body1, p): translational Jacobian difference.

    Args: body1/body2 (K,) static int arrays; pos (K, 3).
    Returns (K, 3, nv).
    """
    meta = model.meta
    dtype = data.qpos.dtype
    root = np.array(meta.body_rootid)
    # Per-dof reference point (subtree com of the dof's tree root).
    dof_body = np.array(meta.dof_bodyid)
    ref = data.subtree_com[root[dof_body]]  # (nv, 3)
    ang = data.cdof[:, :3]  # (nv, 3)
    lin = data.cdof[:, 3:]  # (nv, 3)
    # Velocity of point p due to dof i: lin_i + ang_i x (p - ref_i).
    # (K, nv, 3)
    arm = pos[:, None, :] - ref[None, :, :]
    contrib = lin[None] + jnp.cross(ang[None], arm)
    mask = model.body_dof_mask.astype(dtype)
    w = mask[body2] - mask[body1]  # (K, nv)
    return jnp.swapaxes(contrib * w[:, :, None], 1, 2)  # (K, 3, nv)


def make_efc(model: FlyModel, data: Data, con: _col.Contact,
             ncon_max: int = NCON_MAX, terrain: bool = False) -> EfcRows:
    """Assemble constraint rows: joint limits + top-K contacts."""
    meta = model.meta
    dtype = data.qpos.dtype
    tb = _col.pair_tables(meta, terrain)

    # --- Joint limits.
    lim_dof, lim_sign, lim_jid = _limit_tables(meta)
    jrange = model.jnt_range[lim_jid].astype(dtype)
    qp = data.qpos[np.array(meta.jnt_qposadr)[lim_jid]]
    # Distance to the limit (positive inside range).
    dist = jnp.where(jnp.asarray(lim_sign) > 0, qp - jrange[:, 0],
                     jrange[:, 1] - qp)
    margin = model.jnt_margin[lim_jid].astype(dtype)
    lim_active = dist < margin
    r = dist - margin
    K_, B_, imp = kbi(model.jnt_solref[lim_jid].astype(dtype),
                      model.jnt_solimp[lim_jid].astype(dtype), r)
    vel = data.qvel[lim_dof] * jnp.asarray(lim_sign, dtype)
    aref = -B_ * vel - K_ * imp * r
    diag = model.dof_invweight0[lim_dof].astype(dtype)
    R = jnp.maximum((1.0 - imp) / imp * diag, 1e-12)
    lim_D = 1.0 / R

    # --- Contacts: select top-K by (dist - includemargin).
    params = _col.slot_params(model, terrain)
    score = con.dist - params.includemargin.astype(dtype)
    neg = -score
    k = min(ncon_max, score.shape[0])
    _, sel = jax.lax.top_k(neg, k)
    sel = sel.astype(jnp.int32)

    c_dist = con.dist[sel]
    c_margin = params.margin.astype(dtype)[sel]
    c_incl = params.includemargin.astype(dtype)[sel]
    c_active = c_dist < c_incl
    c_pos = con.pos[sel]
    c_n = con.normal[sel]
    c_mu = params.friction.astype(dtype)[sel][:, 0]
    c_solref = params.solref.astype(dtype)[sel]
    c_solimp = params.solimp.astype(dtype)[sel]
    condim = jnp.asarray(tb['slot_condim'], jnp.int32)[sel]
    body1 = jnp.asarray(tb['slot_body1'], jnp.int32)[sel]
    body2 = jnp.asarray(tb['slot_body2'], jnp.int32)[sel]

    # Contact frame rows and Jacobian.
    t1, t2 = make_frame(c_n)
    frame = jnp.stack([c_n, t1, t2], axis=1)  # (K, 3, 3)
    # Jacobian difference needs static body indices; they are traced here
    # (gathered), so compute via one-hot instead of numpy indexing.
    meta_nbody = meta.nbody
    onehot2 = jax.nn.one_hot(body2, meta_nbody, dtype=dtype)
    onehot1 = jax.nn.one_hot(body1, meta_nbody, dtype=dtype)
    mask = model.body_dof_mask.astype(dtype)
    w = (onehot2 - onehot1) @ mask  # (K, nv)
    root = np.array(meta.body_rootid)
    dof_body = np.array(meta.dof_bodyid)
    ref = data.subtree_com[root[dof_body]]
    ang = data.cdof[:, :3]
    lin = data.cdof[:, 3:]
    arm = c_pos[:, None, :] - ref[None, :, :]
    contrib = lin[None] + jnp.cross(ang[None], arm)  # (K, nv, 3)
    Jp = contrib * w[:, :, None]  # (K, nv, 3)
    con_J = jnp.einsum('krj,kvj->krv', frame, Jp)  # (K, 3, nv)

    # aref / D.
    r_c = c_dist - c_incl
    K_c, B_c, imp_c = kbi(c_solref, c_solimp, r_c)
    vel_c = jnp.einsum('krv,v->kr', con_J, data.qvel)
    aref_n = -B_c * vel_c[:, 0] - K_c * imp_c * r_c
    aref_t = -B_c[:, None] * vel_c[:, 1:]
    con_aref = jnp.concatenate([aref_n[:, None], aref_t], axis=1)
    inv1 = model.body_invweight0.astype(dtype)[:, 0]
    diag_c = onehot1 @ inv1 + onehot2 @ inv1
    R_c = jnp.maximum((1.0 - imp_c) / imp_c * diag_c, 1e-12)
    con_D = 1.0 / R_c

    return EfcRows(
        lim_dof=lim_dof, lim_sign=lim_sign,
        lim_active=lim_active.astype(dtype),
        lim_aref=aref, lim_D=lim_D, lim_pos=dist,
        con_J=con_J, con_active=c_active.astype(dtype),
        con_frictional=(condim >= 3).astype(dtype),
        con_mu=c_mu, con_aref=con_aref, con_D=con_D, con_pos=c_dist,
        con_sel=sel,
    )


# -----------------------------------------------------------------------------
# Cone projection machinery (Σ = {v : v_n >= mu ||v_t||}).


def _cone_residual(jar, mu, frictional, active):
    """Residual jar - proj_Σ(jar) per contact; (K, 3) -> (K, 3).

    For frictionless contacts the cone degenerates to {v_n >= 0} applied to
    the normal row only.
    """
    N = jar[:, 0]
    y = jar[:, 1:]
    T = jnp.linalg.norm(y, axis=-1)
    a = 1.0 / jnp.maximum(mu, 1e-6)  # Σ = K_a = {||v_t|| <= a * v_n}... n/a
    # Σ = {v_n >= mu*T}: projection onto K with "t >= mu*||x||" i.e.
    # K_{1/mu} in (x, t) notation; middle-zone apex parameter:
    w = (N + a * T) / (1.0 + a * a)  # projected normal component
    top = N >= mu * T  # inside Σ: zero residual
    bottom = mu * N + T <= 0.0  # inside polar cone: full residual
    # middle:
    safe_T = jnp.maximum(T, 1e-15)
    res_mid_n = N - w
    res_mid_t = y * (1.0 - a * w / safe_T)[:, None]
    res = jnp.concatenate([res_mid_n[:, None], res_mid_t], axis=1)
    res = jnp.where(bottom[:, None], jar, res)
    res = jnp.where(top[:, None], jnp.zeros_like(jar), res)
    # Frictionless: one-sided on normal row only.
    res_fl = jnp.concatenate(
        [jnp.minimum(N, 0.0)[:, None], jnp.zeros_like(y)], axis=1)
    res = jnp.where(frictional[:, None] > 0, res, res_fl)
    return res * active[:, None]


def _cone_hessian(jar, mu, frictional, active):
    """Per-contact 3x3 Hessian of 0.5*||res||^2 (i.e. I - dP)."""
    dtype = jar.dtype
    N = jar[:, 0]
    y = jar[:, 1:]
    T = jnp.linalg.norm(y, axis=-1)
    a = 1.0 / jnp.maximum(mu, 1e-6)
    safe_T = jnp.maximum(T, 1e-15)
    yhat = y / safe_T[:, None]
    w = (N + a * T) / (1.0 + a * a)

    top = N >= mu * T
    bottom = mu * N + T <= 0.0

    I3 = jnp.eye(3, dtype=dtype)
    # dP (middle zone):
    c = 1.0 / (1.0 + a * a)
    dP = jnp.zeros(jar.shape[:1] + (3, 3), dtype)
    dP = dP.at[:, 0, 0].set(c)
    dP = dP.at[:, 0, 1:].set((a * c)[:, None] * yhat)
    dP = dP.at[:, 1:, 0].set((a * c)[:, None] * yhat)
    outer = yhat[:, :, None] * yhat[:, None, :]
    I2 = jnp.eye(2, dtype=dtype)
    dP = dP.at[:, 1:, 1:].set((a * a * c)[:, None, None] * outer
                              + (a * w / safe_T)[:, None, None]
                              * (I2 - outer))
    H_mid = I3 - dP
    H = jnp.where(bottom[:, None, None], jnp.broadcast_to(I3, H_mid.shape),
                  H_mid)
    H = jnp.where(top[:, None, None], jnp.zeros_like(H), H)
    # Frictionless: normal row only, active when N < 0.
    H_fl = jnp.zeros_like(H).at[:, 0, 0].set((N < 0).astype(dtype))
    H = jnp.where((frictional > 0)[:, None, None], H, H_fl)
    return H * active[:, None, None]


def _constraint_cost_grad_hess(efc: EfcRows, x, qvel_dummy=None):
    """Cost pieces from constraints at qacc x; returns (grad_qfrc, blocks).

    grad contribution in joint space, plus per-contact Hessian blocks and
    limit diagonal weights for assembling the Newton Hessian.
    """
    # Limits: jar = sign * x[dof] - aref.
    jar_l = x[efc.lim_dof] * jnp.asarray(efc.lim_sign, x.dtype) - efc.lim_aref
    act_l = efc.lim_active * (jar_l < 0)
    f_l = -efc.lim_D * jar_l * act_l  # row force (>= 0)
    # Contacts.
    jar_c = jnp.einsum('krv,v->kr', efc.con_J, x) - efc.con_aref
    res = _cone_residual(jar_c, efc.con_mu, efc.con_frictional,
                         efc.con_active)
    f_c = -efc.con_D[:, None] * res
    return jar_l, f_l, jar_c, f_c


def _primal_cost(efc: EfcRows, M, a_free, x):
    """Primal objective 0.5(x-a_free)^T M (x-a_free) + s(Jx - aref)."""
    dx = x - a_free
    cost = 0.5 * dx @ (M @ dx)
    jar_l = x[efc.lim_dof] * jnp.asarray(efc.lim_sign, x.dtype) - efc.lim_aref
    act_l = efc.lim_active * (jar_l < 0)
    cost = cost + 0.5 * jnp.sum(efc.lim_D * act_l * jar_l ** 2)
    jar_c = jnp.einsum('krv,v->kr', efc.con_J, x) - efc.con_aref
    res = _cone_residual(jar_c, efc.con_mu, efc.con_frictional,
                         efc.con_active)
    cost = cost + 0.5 * jnp.sum(efc.con_D[:, None] * res ** 2)
    return cost


def solve(model: FlyModel, data: Data, efc: EfcRows, a_free: jax.Array,
          iterations: int = 15, ls_iterations: int = 10,
          warmstart: jax.Array | None = None):
    """Newton solve for qacc; returns (qacc, qfrc_constraint, efc forces).

    `a_free` is the unconstrained acceleration M^{-1} qfrc_smooth.
    `warmstart` (optional): previous step's qacc; the starting point is
    whichever of (warmstart, a_free) has lower primal cost — MuJoCo's
    mj_warmstart semantics.
    """
    dtype = data.qpos.dtype
    nv = model.meta.nv
    M = data.qM

    lim_sign = jnp.asarray(efc.lim_sign, dtype)
    lim_onehot = jax.nn.one_hot(jnp.asarray(efc.lim_dof), nv, dtype=dtype)

    def grad_and_hess(x):
        jar_l, f_l, jar_c, f_c = _constraint_cost_grad_hess(efc, x)
        # Gradient: M(x - a_free) - J^T f.
        g = M @ (x - a_free)
        g = g - lim_onehot.T @ (f_l * lim_sign)
        g = g - jnp.einsum('krv,kr->v', efc.con_J, f_c)
        # Hessian: M + J^T D H J + limit diag.
        act_l = efc.lim_active * (jar_l < 0)
        hd = efc.lim_D * act_l
        Hc = _cone_hessian(jar_c, efc.con_mu, efc.con_frictional,
                           efc.con_active) * efc.con_D[:, None, None]
        JH = jnp.einsum('krs,ksv->krv', Hc, efc.con_J)
        H = M + jnp.einsum('krv,krw->vw', efc.con_J, JH)
        H = H + lim_onehot.T @ (hd[:, None] * lim_onehot)
        return g, H

    x = a_free
    if warmstart is not None:
        c_ws = _primal_cost(efc, M, a_free, warmstart)
        c_af = _primal_cost(efc, M, a_free, a_free)
        x = jnp.where(c_ws < c_af, warmstart, a_free)

    def newton_step(carry):
        x, it, g0n = carry
        g, H = grad_and_hess(x)
        from flybody_tpu.ops import cholesky as _pchol
        L = _pchol.chol_pe(H + 1e-12 * jnp.eye(nv, dtype=dtype))
        dx = -_pchol.cho_solve_pe(L, g)

        # Precompute directional quantities once: along dx, phi'(alpha) and
        # phi''(alpha) are pure per-row functions of jar0 + alpha*jv (the
        # same trick MuJoCo's Newton line search uses) — the line-search
        # iterations below involve NO matrix-vector products.
        mdx = M @ dx
        sm0 = (M @ (x - a_free)) @ dx  # smooth slope at alpha = 0
        smm = dx @ mdx                 # smooth curvature (constant)
        jar0_l = (x[efc.lim_dof] * jnp.asarray(efc.lim_sign, dtype)
                  - efc.lim_aref)
        jv_l = dx[efc.lim_dof] * jnp.asarray(efc.lim_sign, dtype)
        jar0_c = jnp.einsum('krv,v->kr', efc.con_J, x) - efc.con_aref
        jv_c = jnp.einsum('krv,v->kr', efc.con_J, dx)

        def slope_at(a):
            jar_l = jar0_l + a * jv_l
            act_l = efc.lim_active * (jar_l < 0)
            f_l = -efc.lim_D * jar_l * act_l
            jar_c = jar0_c + a * jv_c
            res = _cone_residual(jar_c, efc.con_mu, efc.con_frictional,
                                 efc.con_active)
            f_c = -efc.con_D[:, None] * res
            slope = (sm0 + a * smm - jnp.sum(f_l * jv_l)
                     - jnp.sum(f_c * jv_c))
            Hc = _cone_hessian(jar_c, efc.con_mu, efc.con_frictional,
                               efc.con_active) * efc.con_D[:, None, None]
            curv = smm + jnp.sum(efc.lim_D * act_l * jv_l ** 2)
            curv = curv + jnp.einsum('kr,krs,ks->', jv_c, Hc, jv_c)
            return slope, jnp.maximum(curv, 1e-15)

        # phi(alpha) is convex piecewise-quadratic along dx with phi'(0) < 0.
        # Bracket the minimizer by doubling, then bisection with Newton
        # acceleration inside the bracket.

        def expand(_, hi):
            s, _ = slope_at(hi)
            return jnp.where(s < 0, hi * 2.0, hi)

        hi = jax.lax.fori_loop(0, 6, expand, jnp.asarray(1.0, dtype))
        lo = jnp.zeros_like(hi)

        def bisect(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            s, c = slope_at(mid)
            # Newton candidate from mid; fall back to bisection.
            cand = mid - s / c
            inside = (cand > lo) & (cand < hi)
            probe = jnp.where(inside, cand, mid)
            sp, _ = slope_at(probe)
            lo = jnp.where(sp < 0, probe, lo)
            hi = jnp.where(sp < 0, hi, probe)
            return lo, hi

        lo, hi = jax.lax.fori_loop(0, ls_iterations, bisect, (lo, hi))
        alpha = 0.5 * (lo + hi)
        # Guard: never take an uphill step.
        s0, _ = slope_at(jnp.zeros_like(alpha))
        alpha = jnp.where(s0 < 0, alpha, jnp.zeros_like(alpha))
        gnorm = jnp.linalg.norm(g)
        g0n = jnp.where(it == 0, gnorm, g0n)
        return x + alpha * dx, it + 1, g0n

    # NOTE: a tolerance-based lax.while_loop would let warm-started envs
    # exit early, but a pallas custom-call inside a batched while_loop
    # faults the TPU runtime (observed 2026-08-16); fixed trip count.
    x, _, _ = jax.lax.fori_loop(
        0, iterations, lambda i, c: newton_step(c),
        (x, jnp.zeros((), jnp.int32), jnp.zeros((), dtype)))

    jar_l, f_l, jar_c, f_c = _constraint_cost_grad_hess(efc, x)
    qfrc = lim_onehot.T @ (f_l * lim_sign) + jnp.einsum(
        'krv,kr->v', efc.con_J, f_c)
    return x, qfrc, f_l, f_c


def noslip(model: FlyModel, data: Data, efc: EfcRows, qacc: jax.Array,
           f_c: jax.Array, iterations: int = 3):
    """Noslip post-processing (mj noslip solver).

    Gauss-Seidel sweeps over the friction rows of active elliptic contacts,
    solving the unregularized (R=0) subproblem for tangential forces with
    normal forces held fixed, clamping to the friction cone. Matches
    MuJoCo's noslip_iterations semantics (fruitfly.xml:4 sets 3).
    """
    dtype = qacc.dtype
    K = efc.con_J.shape[0]
    Jt = efc.con_J[:, 1:, :]  # (K, 2, nv) tangent rows
    # P_k = M^{-1} J_t_k^T via the cached Cholesky factor.
    from flybody_tpu.physics import smooth as _sm
    Pt = _sm.solve_m(model, data, Jt.reshape(K * 2, -1).T)  # (nv, 2K)
    Pt = jnp.swapaxes(Pt.reshape(-1, K, 2), 0, 1)  # (K, nv, 2)
    # A = Jt @ Pt as mul+sum (the tiny batched 2x108x2 matmul form
    # serializes on the MXU: ~335 ms at batch 8192; this is ~3 ms) and a
    # closed-form 2x2 inverse.
    A = jnp.sum(Jt[:, :, None, :] * jnp.swapaxes(Pt, -1, -2)[:, None],
                axis=-1)  # (K, 2, 2)
    a, b_, c_, d_ = A[:, 0, 0], A[:, 0, 1], A[:, 1, 0], A[:, 1, 1]
    det = a * d_ - b_ * c_
    det = jnp.where(jnp.abs(det) > 1e-12, det,
                    jnp.where(det >= 0, 1e-12, -1e-12))
    Ainv = jnp.stack([jnp.stack([d_, -b_], -1),
                      jnp.stack([-c_, a], -1)], -2) / det[:, None, None]
    aref_t = efc.con_aref[:, 1:]
    use = (efc.con_active * efc.con_frictional) > 0

    # Friction-circle radii (normal forces held fixed).
    lim = jnp.maximum(efc.con_mu * f_c[:, 0], 0.0)
    ft0 = f_c[:, 1:]

    # The sequential GS sweeps run in a VMEM-resident pallas kernel when
    # vmapped on TPU (ops/noslip_gs.py); plain scan otherwise.
    from flybody_tpu.ops import noslip_gs as _ngs
    x, ft = _ngs.make_gs_pe(iterations)(
        Jt, Pt, Ainv, aref_t, lim, use.astype(dtype), qacc, ft0)
    f_c_new = jnp.concatenate([f_c[:, :1], ft], axis=1)
    return x, f_c_new
