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
    # Carried contact geometry/topology so downstream consumers (adhesion
    # transmission, sensors, self-contact observable) never re-gather the
    # big slot tables by traced index.
    con_xpos: jax.Array  # (K, 3) world contact point
    con_normal: jax.Array  # (K, 3) geom1 -> geom2
    con_body1: jax.Array  # (K,) int32
    con_body2: jax.Array  # (K,) int32
    con_self: jax.Array  # (K,) 1.0 for fly-self contacts
    # 1.0 for rows whose Jacobian couples two DIFFERENT limbs of the
    # block-arrow tree partition (ops/arrow.py) — e.g. leg-leg self
    # contacts. These rows ride a low-rank Woodbury correction on the
    # arrow Newton factor instead of the block-sparse Hessian.
    con_break: jax.Array  # (K,)


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


def _contact_rows_ref(cand_b, cand_u, cand_g, qvel, cdof, com_root,
                      maskt, limb, k):
    """XLA reference for ops/efc_stage.py: top-K contact selection +
    row assembly on per-env arrays (single kinematic tree).

    Args: cand_b (C, 7) [dist|pos|normal], cand_u (C, 14)
    efc_slot_table rows, cand_g (C,), qvel (nv,), cdof (nv, 6),
    com_root (3,), maskt (nv, nbody) dof-mask^T, limb (1, nbody)
    limb-of-body (-1 outside the arrow partition).

    Returns (con_J (k, 3, nv), scal (19, k)) — row layout documented in
    ops/efc_stage.py.
    """
    dtype = cand_b.dtype
    nbody = maskt.shape[1]
    score = cand_b[:, 0] - cand_u[:, 0]
    _, lsel = jax.lax.top_k(-score, k)
    oh = jax.nn.one_hot(lsel, score.shape[0], dtype=dtype)
    bsel = oh @ cand_b
    usel = oh @ cand_u
    gsel = oh @ cand_g

    c_dist = bsel[:, 0]
    c_pos = bsel[:, 1:4]
    c_n = bsel[:, 4:7]
    c_incl = usel[:, 0]
    c_mu = usel[:, 1]
    c_solref = usel[:, 2:4]
    c_solimp = usel[:, 4:9]
    condim = usel[:, 9]
    diag_c = usel[:, 10]
    b1f = usel[:, 11]
    b2f = usel[:, 12]
    c_self = usel[:, 13]
    c_active = c_dist < c_incl

    t1, t2 = make_frame(c_n)
    frame = jnp.stack([c_n, t1, t2], axis=1)  # (k, 3, 3)
    oh_b1 = jax.nn.one_hot(jnp.round(b1f).astype(jnp.int32), nbody,
                           dtype=dtype)
    oh_b2 = jax.nn.one_hot(jnp.round(b2f).astype(jnp.int32), nbody,
                           dtype=dtype)
    w = (oh_b2 - oh_b1) @ maskt.T  # (k, nv)
    arm = c_pos - com_root[None, :]
    gkr = jnp.concatenate(
        [jnp.cross(arm[:, None, :], frame), frame], axis=-1)  # (k,3,6)
    con_J = jnp.sum(gkr[:, :, None, :] * cdof[None, None, :, :],
                    axis=-1) * w[:, None, :]  # (k, 3, nv)

    l1 = oh_b1 @ limb[0]
    l2 = oh_b2 @ limb[0]
    c_break = ((jnp.abs(l1 - l2) > 0.5) & (l1 > -0.5)
               & (l2 > -0.5)).astype(dtype)

    r_c = c_dist - c_incl
    K_c, B_c, imp_c = kbi(c_solref, c_solimp, r_c)
    vel_c = jnp.sum(con_J * qvel[None, None, :], axis=-1)  # (k, 3)
    aref_n = -B_c * vel_c[:, 0] - K_c * imp_c * r_c
    aref_t = -B_c[:, None] * vel_c[:, 1:]
    R_c = jnp.maximum((1.0 - imp_c) / imp_c * diag_c, 1e-12)

    scal = jnp.stack([
        c_dist, c_active.astype(dtype), (condim >= 3).astype(dtype),
        c_mu, 1.0 / R_c, aref_n, aref_t[:, 0], aref_t[:, 1],
        c_pos[:, 0], c_pos[:, 1], c_pos[:, 2],
        c_n[:, 0], c_n[:, 1], c_n[:, 2],
        b1f, b2f, c_self, c_break, gsel,
    ], axis=0)  # (19, k)
    return con_J, scal


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
    # Static per-slot params table (includemargin, mu, solref, solimp,
    # condim, diag/nrep, bodies, selfmask) — collision.efc_slot_table.
    ucat_full = _col.efc_slot_table(model, terrain, dtype)  # (S_all, 14)
    compact = len(con.blocks) > 0
    if compact:
        # Dense rows cover only the plane/sphere (+terrain) slots; the
        # big pair families join the selection as pre-gathered compact
        # blocks (params already batched).
        dsid = np.asarray(_col.dense_slot_ids(meta, terrain))
        ucat = ucat_full[dsid]
        gid = jnp.asarray(np.asarray(dsid, np.float64), dtype)
        P_m = sum(int(b.dist.shape[0]) for b in con.blocks)
    else:
        ucat = ucat_full
        gid = jnp.asarray(
            np.arange(ucat.shape[0], dtype=np.float64), dtype)
        P_m = 0
    score = con.dist - ucat[:, 0]
    S = score.shape[0]
    k = min(ncon_max, S + P_m)
    # Batched per-slot state [dist | pos | normal] (S, 7).
    bcat = jnp.concatenate([con.dist[:, None], con.pos, con.normal], -1)

    TILE = 32
    if S > 16 * TILE:
        # Two-stage exact top-k: pick the T tiles with the smallest
        # per-tile minimum, then top-k within those tiles' T*TILE
        # candidates. Exact for k <= T: any element of a non-selected
        # tile is >= that tile's min, which is >= T selected tile mins,
        # i.e. >= T >= k other elements. Cuts the top_k domain and
        # shrinks the one-hot gather GEMM from (K, S) to (K, T*TILE) —
        # an S-sized one-hot alone is GBs of HBM at batch 8192.
        pad_len = (-S) % TILE
        nt = (S + pad_len) // TILE
        # T = nt means all tiles are kept (still cheaper: the gathers and
        # the second top_k stay tile-shaped).
        T = min(max(TILE, k), nt)
        score_p = jnp.concatenate(
            [score, jnp.full((pad_len,), 1e10, dtype)])
        tiles = score_p.reshape(nt, TILE)
        tmin = tiles.min(axis=1)
        _, tidx = jax.lax.top_k(-tmin, T)
        # All tile gathers ride small (T, nt) one-hot GEMMs — batched
        # traced row gathers lower to per-row loops on TPU (~100 ms at
        # batch 8192, measured).
        oh_t = jax.nn.one_hot(tidx, nt, dtype=dtype)  # (T, nt)
        cand_s = (oh_t @ tiles).reshape(T * TILE)
        # Tile-gather each table SEPARATELY (ucat is an unbatched model
        # constant — concatenating it into the batched table would
        # materialize a (B, S, 21) array), then pick rows with one
        # (K, T*TILE) one-hot GEMM each.
        bpad_row = jnp.zeros((7,), dtype).at[0].set(1e10).at[6].set(1.0)
        bcat_p = jnp.concatenate(
            [bcat, jnp.broadcast_to(bpad_row, (pad_len, 7))])
        cand_b = (oh_t @ bcat_p.reshape(nt, TILE * 7)).reshape(
            T * TILE, 7)
        ucat_p = jnp.concatenate(
            [ucat, jnp.zeros((pad_len, ucat.shape[-1]), dtype)])
        nu = ucat.shape[-1]
        cand_u = (oh_t @ ucat_p.reshape(nt, TILE * nu)).reshape(
            T * TILE, nu)
        gid_p = jnp.concatenate([gid, jnp.zeros((pad_len,), dtype)])
        cand_g = (oh_t @ gid_p.reshape(nt, TILE)).reshape(T * TILE)
    else:
        cand_s, cand_b, cand_u, cand_g = score, bcat, ucat, gid

    if compact:
        cand_s = jnp.concatenate(
            [cand_s] + [b.dist - b.params[:, 0] for b in con.blocks])
        cand_b = jnp.concatenate(
            [cand_b] + [jnp.concatenate([b.dist[:, None], b.pos,
                                         b.normal], -1)
                        for b in con.blocks], axis=0)
        cand_u = jnp.concatenate(
            [cand_u] + [b.params for b in con.blocks], axis=0)
        cand_g = jnp.concatenate([cand_g] + [b.idx for b in con.blocks])

    # ------------------------------------------------------------------
    # Contact-row selection + assembly. Single-tree scenes route through
    # one shared op (ops/efc_stage.py): a whole-stage Pallas kernel on
    # TPU (top-K selection, candidate gathers, frame/Jacobian/aref all
    # VMEM-resident in one launch), with _contact_rows_ref below as the
    # XLA reference/fallback — bit-comparable math either way.
    from flybody_tpu.ops import arrow as _arrow
    from flybody_tpu.ops import efc_stage as _efc
    root = np.array(meta.body_rootid)
    dof_body = np.array(meta.dof_bodyid)
    roots = np.unique(root[dof_body])
    part = _arrow.build_partition(meta) if _arrow.enabled() else None
    if len(roots) == 1:
        maskt = jnp.asarray(
            np.asarray(model.body_dof_mask, np.float64).T).astype(dtype)
        if part is not None:
            limb_np = np.asarray(part.limb_of_body, np.float64)
        else:
            limb_np = -np.ones((meta.nbody,), np.float64)
        limb = jnp.asarray(limb_np[None]).astype(dtype)  # (1, nbody)
        com_root = data.subtree_com[int(roots[0])]
        fop = _efc.make_efc_contacts_pe(k, meta.nv, meta.nbody)
        con_J, scal = fop(cand_b, cand_u, cand_g, data.qvel, data.cdof,
                          com_root, maskt, limb)
        return EfcRows(
            lim_dof=lim_dof, lim_sign=lim_sign,
            lim_active=lim_active.astype(dtype),
            lim_aref=aref, lim_D=lim_D, lim_pos=dist,
            con_J=con_J, con_active=scal[1],
            con_frictional=scal[2], con_mu=scal[3],
            con_aref=jnp.swapaxes(scal[5:8], 0, 1), con_D=scal[4],
            con_pos=scal[0],
            con_sel=jnp.round(scal[18]).astype(jnp.int32),
            con_xpos=jnp.swapaxes(scal[8:11], 0, 1),
            con_normal=jnp.swapaxes(scal[11:14], 0, 1),
            con_body1=jnp.round(scal[14]).astype(jnp.int32),
            con_body2=jnp.round(scal[15]).astype(jnp.int32),
            con_self=scal[16], con_break=scal[17],
        )

    _, lsel = jax.lax.top_k(-cand_s, k)
    oh = jax.nn.one_hot(lsel, cand_s.shape[0], dtype=dtype)
    if compact:
        # ONE fused gather GEMM: in the compact path every candidate
        # table is batched (the blocks' params are per-env), and at
        # batch each (k, P) batched matmul instance is tiny and
        # serializes on the MXU — three separate gathers paid that
        # pipeline cost three times.
        cand_all = jnp.concatenate([cand_b, cand_u, cand_g[:, None]], -1)
        sel_all = oh @ cand_all
        nb_, nu_ = cand_b.shape[-1], cand_u.shape[-1]
        bsel = sel_all[:, :nb_]
        usel = sel_all[:, nb_:nb_ + nu_]
        gsel = sel_all[:, nb_ + nu_]
    else:
        # Non-compact (parity/test) path: cand_u/cand_g stay unbatched
        # model constants — separate GEMMs avoid broadcasting a
        # (B, S, 15) table.
        bsel = oh @ cand_b
        usel = oh @ cand_u
        gsel = oh @ cand_g
    # Global slot ids (exact small ints through the f32 one-hot GEMM).
    sel = jnp.round(gsel).astype(jnp.int32)

    c_dist = bsel[:, 0]
    c_pos = bsel[:, 1:4]
    c_n_raw = bsel[:, 4:7]
    c_incl = usel[:, 0]
    c_mu = usel[:, 1]
    c_solref = usel[:, 2:4]
    c_solimp = usel[:, 4:9]
    condim = usel[:, 9]
    diag_c = usel[:, 10]
    c_body1 = jnp.round(usel[:, 11]).astype(jnp.int32)
    c_body2 = jnp.round(usel[:, 12]).astype(jnp.int32)
    c_self = usel[:, 13]
    c_active = c_dist < c_incl
    # Dead slots (uncovered when S < K never happens here, but top_k padding
    # with separated pairs still yields valid unit normals from collide()).
    c_n = c_n_raw

    # Contact frame rows and Jacobian.
    t1, t2 = make_frame(c_n)
    frame = jnp.stack([c_n, t1, t2], axis=1)  # (K, 3, 3)
    # Jacobian difference: per-slot dof-mask difference is a static
    # (S, nv) table; gather it through the same one-hot contraction...
    # at nv=108 wide that GEMM is too large, so instead use small
    # one-hot body matmuls: (K, nbody)(nbody, nv).
    body1 = c_body1
    body2 = c_body2
    mask = jnp.asarray(model.body_dof_mask).astype(dtype)
    oh_b1 = jax.nn.one_hot(body1, meta.nbody, dtype=dtype)
    oh_b2 = jax.nn.one_hot(body2, meta.nbody, dtype=dtype)
    w = (oh_b2 - oh_b1) @ mask  # (K, nv)
    root = np.array(meta.body_rootid)
    dof_body = np.array(meta.dof_bodyid)
    roots = np.unique(root[dof_body])
    if len(roots) == 1:
        # Single kinematic tree: every dof shares the Jacobian reference
        # point (its tree root's subtree com), so the row collapses via
        # (ang_i x arm_k) . f = ang_i . (arm_k x f) to a 6-wide
        # contraction J[k,r,i] = cdof_i . (arm_k x f_kr ; f_kr) * w[k,i]
        # — no (K, nv, 3) cross-product intermediates.
        ref0 = data.subtree_com[int(roots[0])]
        arm = c_pos - ref0[None, :]  # (K, 3)
        gkr = jnp.concatenate(
            [jnp.cross(arm[:, None, :], frame), frame], axis=-1)  # (K,3,6)
        con_J = jnp.sum(gkr[:, :, None, :] * data.cdof[None, None, :, :],
                        axis=-1) * w[:, None, :]  # (K, 3, nv)
    else:
        # Multi-fly scenes: per-dof reference points.
        ref = data.subtree_com[root[dof_body]]
        ang = data.cdof[:, :3]
        lin = data.cdof[:, 3:]
        arm = c_pos[:, None, :] - ref[None, :, :]
        contrib = lin[None] + jnp.cross(ang[None], arm)  # (K, nv, 3)
        Jp = contrib * w[:, :, None]  # (K, nv, 3)
        # frame @ Jp^T per contact via broadcast mul+sum (tiny batched
        # matmuls serialize on the MXU).
        con_J = jnp.sum(frame[:, :, None, :] * Jp[:, None, :, :],
                        axis=-1)  # (K, 3, nv)

    # aref / D.
    # Cross-limb coupling flag for the block-arrow Newton path: limb ids
    # via the existing body one-hots (GEMM, not a traced gather).
    from flybody_tpu.ops import arrow as _arrow
    part = _arrow.build_partition(meta) if _arrow.enabled() else None
    if part is not None:
        limb_f = jnp.asarray(np.array(part.limb_of_body, np.float64), dtype)
        l1 = oh_b1 @ limb_f
        l2 = oh_b2 @ limb_f
        c_break = ((jnp.abs(l1 - l2) > 0.5) & (l1 > -0.5)
                   & (l2 > -0.5)).astype(dtype)
    else:
        c_break = jnp.zeros_like(c_mu)

    r_c = c_dist - c_incl
    K_c, B_c, imp_c = kbi(c_solref, c_solimp, r_c)
    vel_c = jnp.sum(con_J * data.qvel[None, None, :], axis=-1)  # (K, 3)
    aref_n = -B_c * vel_c[:, 0] - K_c * imp_c * r_c
    aref_t = -B_c[:, None] * vel_c[:, 1:]
    con_aref = jnp.concatenate([aref_n[:, None], aref_t], axis=1)
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
        con_xpos=c_pos, con_normal=c_n, con_body1=c_body1,
        con_body2=c_body2, con_self=c_self, con_break=c_break,
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


def _mv(A, x):
    """Batched-friendly matvec A @ x as a mul+sum reduction.

    Under vmap a (n, m) @ (m,) dot lowers to a per-env MXU pass (N=1
    batched matmuls serialize, ~1 us each at batch 8192 — measured v5e);
    the broadcast-multiply + lane reduction runs at HBM speed."""
    return jnp.sum(A * x[None, :], axis=-1)


def _constraint_cost_grad_hess(efc: EfcRows, x, qvel_dummy=None):
    """Cost pieces from constraints at qacc x; returns (grad_qfrc, blocks).

    grad contribution in joint space, plus per-contact Hessian blocks and
    limit diagonal weights for assembling the Newton Hessian.
    """
    # Limits: jar = sign * x[dof] - aref.
    jar_l = x[efc.lim_dof] * jnp.asarray(efc.lim_sign, x.dtype) - efc.lim_aref
    act_l = efc.lim_active * (jar_l < 0)
    f_l = -efc.lim_D * jar_l * act_l  # row force (>= 0)
    # Contacts: jar = Jx - aref, mul+sum over the dof axis.
    jar_c = jnp.sum(efc.con_J * x[None, None, :], axis=-1) - efc.con_aref
    res = _cone_residual(jar_c, efc.con_mu, efc.con_frictional,
                         efc.con_active)
    f_c = -efc.con_D[:, None] * res
    return jar_l, f_l, jar_c, f_c


def _chol3_psd(W):
    """Closed-form lower Cholesky of PSD (S, 3, 3) blocks.

    Zero pivots produce zero rows (exact for PSD: a zero pivot forces
    its whole row/column to zero), so inactive / projection-top-zone
    cone Hessians factor to G = 0 and drop out of the Woodbury term."""
    w11 = jnp.maximum(W[:, 0, 0], 0.0)
    a = jnp.sqrt(w11)
    ia = jnp.where(a > 1e-12, 1.0 / jnp.maximum(a, 1e-30), 0.0)
    b = W[:, 1, 0] * ia
    c = W[:, 2, 0] * ia
    d = jnp.sqrt(jnp.maximum(W[:, 1, 1] - b * b, 0.0))
    idd = jnp.where(d > 1e-12, 1.0 / jnp.maximum(d, 1e-30), 0.0)
    e = (W[:, 2, 1] - c * b) * idd
    f = jnp.sqrt(jnp.maximum(W[:, 2, 2] - c * c - e * e, 0.0))
    z = jnp.zeros_like(a)
    return jnp.stack([jnp.stack([a, z, z], -1),
                      jnp.stack([b, d, z], -1),
                      jnp.stack([c, e, f], -1)], -2)


def _primal_cost(efc: EfcRows, mv, a_free, x):
    """Primal objective 0.5(x-a_free)^T M (x-a_free) + s(Jx - aref).
    `mv`: matvec closure (dense or packed-arrow M)."""
    dx = x - a_free
    cost = 0.5 * jnp.dot(dx, mv(dx))
    jar_l = x[efc.lim_dof] * jnp.asarray(efc.lim_sign, x.dtype) - efc.lim_aref
    act_l = efc.lim_active * (jar_l < 0)
    cost = cost + 0.5 * jnp.sum(efc.lim_D * act_l * jar_l ** 2)
    jar_c = jnp.sum(efc.con_J * x[None, None, :], axis=-1) - efc.con_aref
    res = _cone_residual(jar_c, efc.con_mu, efc.con_frictional,
                         efc.con_active)
    cost = cost + 0.5 * jnp.sum(efc.con_D[:, None] * res ** 2)
    return cost


def solve(model: FlyModel, data: Data, efc: EfcRows, a_free: jax.Array,
          iterations: int = 15, ls_iterations: int = 10,
          warmstart: jax.Array | None = None,
          refactor_period: int = 1):
    """Newton solve for qacc; returns (qacc, qfrc_constraint, efc forces).

    `a_free` is the unconstrained acceleration M^{-1} qfrc_smooth.
    `warmstart` (optional): previous step's qacc; the starting point is
    whichever of (warmstart, a_free) has lower primal cost — MuJoCo's
    mj_warmstart semantics.

    `refactor_period`: 1 (default) = exact Newton, a fresh Hessian
    assembly + factorization every iteration (MuJoCo semantics). p > 1 =
    only every p-th iteration refreshes the factor; in between, steps
    reuse the last Cholesky factor and skip Hessian assembly entirely
    (the cone Hessian only changes when contacts switch projection
    zones, which is rare after the first warmstarted iterations). The
    stale-factor direction -L^-T L^-1 g stays a descent direction (L is
    SPD) and the exact line search keeps global convergence; the batched
    108x108 factorization is the single most expensive op in the engine,
    so this roughly halves (p=2) the Newton loop cost for a small loss
    in per-iteration contraction.
    """
    dtype = data.qpos.dtype
    nv = model.meta.nv
    M = data.qM
    packed_m = M.ndim == 3  # block-arrow packed M (smooth.crb_packed)

    lim_sign = jnp.asarray(efc.lim_sign, dtype)

    K = efc.con_J.shape[0]
    J2 = efc.con_J.reshape(3 * K, nv)  # (3K, nv) row block

    # Static limit-row dof/sign tables from the model (efc.lim_dof may be
    # traced if EfcRows crossed a jit boundary; traced index gathers are
    # ~3x slower than static ones on TPU).
    lim_dof_idx, lim_sign_st, _ = _limit_tables(model.meta)
    efc = efc._replace(lim_dof=lim_dof_idx, lim_sign=lim_sign_st)

    # Block-arrow Newton: arrow-compatible contact rows (single limb +
    # root) go into the block-sparse Hessian; cross-limb rows ride a
    # low-rank Woodbury correction (see below).
    from flybody_tpu.ops import arrow as _arrow
    part = _arrow.build_partition(model.meta) if _arrow.enabled() else None
    aops = _arrow.ops_for(part) if part is not None else None
    hess_active = (efc.con_active * (1.0 - efc.con_break)
                   if aops is not None else efc.con_active)

    if packed_m:
        def mv(x):
            return _arrow.matvec_packed(part, M, x)
    else:
        def mv(x):
            return _mv(M, x)

    # --- Incremental Newton state. Along a line step x + alpha*dx, the
    # smooth gradient piece msm = M(x - a_free) and the constraint jar
    # values update LINEARLY: msm += alpha*M dx, jar += alpha*J dx — and
    # M dx / J dx are needed for the exact line search anyway. Carrying
    # (x, msm, jar_l, jar_c) therefore makes each Newton iteration cost
    # exactly ONE M product and ONE J product (both mul+sum reductions:
    # N=1 batched matmuls serialize on the MXU), instead of the 3 M- and
    # 3 J-products of the stateless form.

    def forces_from(jar_l, jar_c):
        act_l = efc.lim_active * (jar_l < 0)
        f_l = -efc.lim_D * jar_l * act_l  # row force (>= 0)
        res = _cone_residual(jar_c, efc.con_mu, efc.con_frictional,
                             efc.con_active)
        f_c = -efc.con_D[:, None] * res
        return f_l, f_c

    def grad_from(msm, jar_l, jar_c):
        """Gradient from carried state. Limit rows each touch ONE dof,
        so J_lim^T f is a static scatter-add, not an (nv, L) matmul."""
        f_l, f_c = forces_from(jar_l, jar_c)
        g = msm.at[lim_dof_idx].add(-f_l * lim_sign)
        g = g - jnp.sum(efc.con_J * f_c[:, :, None], axis=(0, 1))
        return g

    def init_state(x):
        msm = mv(x - a_free)
        jar_l = x[efc.lim_dof] * lim_sign - efc.lim_aref
        jar_c = jnp.sum(efc.con_J * x[None, None, :], axis=-1) - efc.con_aref
        return (x, msm, jar_l, jar_c)

    def hessian(jar_l, jar_c):
        """Newton Hessian M + J^T D H J + limit diag at the jar values."""
        act_l = efc.lim_active * (jar_l < 0)
        hd = efc.lim_D * act_l
        hd_dof = jnp.zeros(nv, dtype).at[lim_dof_idx].add(hd)
        Hc = _cone_hessian(jar_c, efc.con_mu, efc.con_frictional,
                           hess_active) * efc.con_D[:, None, None]
        # (Hc J) via broadcast mul+sum (tiny batched 3x3 matmuls
        # serialize on the MXU); the outer product is one native GEMM.
        JH = jnp.sum(Hc[:, :, :, None] * efc.con_J[:, None, :, :], axis=2)
        JHr = JH.reshape(3 * K, nv)
        # J^T (HJ) with the transpose folded into the contraction (the
        # MXU reads the lhs transposed natively — no materialized JT).
        dn = (((0,), (0,)), ((), ()))
        if dtype == jnp.float32:
            # bf16 operands with f32 accumulation: H only steers the
            # Newton direction (the exact line search preserves descent
            # and the gradient stays f32), and the MXU runs bf16 at 2x.
            JTJH = jax.lax.dot_general(J2.astype(jnp.bfloat16),
                                       JHr.astype(jnp.bfloat16), dn,
                                       preferred_element_type=jnp.float32)
        else:
            JTJH = jax.lax.dot_general(J2, JHr, dn)
        if packed_m:
            # Pack the (arrow-sparse, hess_active excludes cross-limb
            # rows) JTJH and add to the packed M -- dense H is never
            # materialized. The fresh factor's 1e-12 jitter rides the
            # same diagonal add.
            Hp = M + _arrow.pack_sym_ref(part, JTJH, pad_identity=False)
            return _arrow.add_diag_packed(part, Hp, hd_dof + 1e-12)
        H = M + JTJH
        H = H + jnp.diag(hd_dof)
        return H

    from flybody_tpu.ops import linesearch as _pls
    ls_fn = _pls.make_ls_pe(6, ls_iterations)

    def ls_and_update(state, dx):
        # Exact line search along dx + incremental state update. Along
        # dx, phi'(alpha) and phi''(alpha) are pure per-row functions of
        # jar0 + alpha*jv (the same trick MuJoCo's Newton line search
        # uses); jar0/msm come from the carried state. The search itself
        # (bracket doubling + guarded Newton/bisection) runs as ONE
        # pallas kernel on TPU (ops/linesearch.py) — in XLA it is ~20
        # tiny kernel launches per Newton iteration.
        x, msm, jar_l, jar_c = state
        mdx = mv(dx)
        jv_l = dx[efc.lim_dof] * lim_sign
        jv_c = jnp.sum(efc.con_J * dx[None, None, :], axis=-1)
        sm0 = jnp.dot(msm, dx)          # smooth slope at alpha = 0
        smm = jnp.dot(dx, mdx)          # smooth curvature (constant)
        lim = jnp.stack([jar_l, jv_l, efc.lim_active, efc.lim_D])
        con = jnp.concatenate([
            jar_c.T, jv_c.T, efc.con_mu[None], efc.con_frictional[None],
            efc.con_active[None], efc.con_D[None]])
        sc = jnp.stack([sm0[None], smm[None]])
        alpha = ls_fn(lim, con, sc)
        return (x + alpha * dx, msm + alpha * mdx,
                jar_l + alpha * jv_l, jar_c + alpha * jv_c)

    import os as _os
    whole_solve = (
        aops is not None and packed_m
        and iterations <= max(1, refactor_period)
        and _os.environ.get('FLYBODY_NEWTON_WHOLE', '1').strip().lower()
        not in ('0', 'false', 'no', 'off'))
    if whole_solve:
        # The ENTIRE solve in one pallas launch (warmstart selection,
        # jar/msm init, in-kernel Hessian/Woodbury assembly, all
        # iterations, final forces + qfrc) — ops/newton_fused.py
        # make_newton_solve_pe. Every XLA-side pass over con_J
        # (~255 MB/pass at batch 8192: 2x warmstart costs, init_state,
        # final J^T f) disappears. FLYBODY_NEWTON_WHOLE=0 restores the
        # split form below for A/B.
        from flybody_tpu.ops import newton_fused as _nf
        SB = min(int(_os.environ.get('FLYBODY_SB_BREAK', 8)), K)
        brk = efc.con_break * efc.con_active
        score_b = jnp.where(brk > 0, efc.con_pos,
                            jnp.full_like(efc.con_pos, 1e10))
        _, bsel = jax.lax.top_k(-score_b, SB)
        ohb = jax.nn.one_hot(bsel, K, dtype=dtype)  # (SB, K)
        _lim_dof_t = tuple(int(v) for v in lim_dof_idx)
        _lim_sign_t = tuple(float(v) for v in lim_sign_st)
        hess_act = efc.con_active * (1.0 - efc.con_break)
        lim_params = jnp.stack([efc.lim_active, efc.lim_D])
        con_params5 = jnp.stack([efc.con_mu, efc.con_frictional,
                                 efc.con_active, efc.con_D, hess_act])
        ws = a_free if warmstart is None else warmstart
        fn = _nf.make_newton_solve_pe(part, _lim_dof_t, _lim_sign_t,
                                      ls_iterations, iterations)
        return fn(M, efc.con_J, ohb, a_free, ws, efc.lim_aref,
                  efc.con_aref, lim_params, con_params5)

    x = a_free
    if warmstart is not None:
        c_ws = _primal_cost(efc, mv, a_free, warmstart)
        c_af = _primal_cost(efc, mv, a_free, a_free)
        x = jnp.where(c_ws < c_af, warmstart, a_free)

    from flybody_tpu.ops import cholesky as _pchol
    eye = jnp.eye(nv, dtype=dtype)

    if aops is not None:
        # Static budget of cross-limb rows carried exactly by Woodbury;
        # overflow rows stay in the gradient/cost (same fixed point) but
        # drop out of the Hessian — the exact line search keeps descent.
        # FLYBODY_SB_BREAK narrows the budget (the Z-solve RHS width and
        # capacitance work scale with 3*SB); accuracy gated by
        # tests/test_solver_knobs.py::test_sb_break_solver_accuracy.
        import os as _os
        SB = min(int(_os.environ.get('FLYBODY_SB_BREAK', 8)), K)
        brk = efc.con_break * efc.con_active
        score_b = jnp.where(brk > 0, efc.con_pos,
                            jnp.full_like(efc.con_pos, 1e10))
        _, bsel = jax.lax.top_k(-score_b, SB)
        ohb = jax.nn.one_hot(bsel, K, dtype=dtype)  # (SB, K)
        Vb = (ohb @ efc.con_J.reshape(K, 3 * nv)).reshape(SB, 3, nv)
        mub = ohb @ efc.con_mu
        Db = ohb @ efc.con_D
        fricb = ohb @ efc.con_frictional
        actb = ohb @ brk
        eye_sb = jnp.eye(3 * SB, dtype=dtype)
        # Fused reuse-step kernel (gradient + arrow solve + Woodbury +
        # line search, ALL reuse iterations of a block in ONE launch,
        # ops/newton_fused.py).
        from flybody_tpu.ops import newton_fused as _nf
        _lim_dof_t = tuple(int(v) for v in lim_dof_idx)
        _lim_sign_t = tuple(float(v) for v in lim_sign_st)
        lim_params = jnp.stack([efc.lim_active, efc.lim_D])
        con_params = jnp.stack([efc.con_mu, efc.con_frictional,
                                efc.con_active, efc.con_D])

    def fresh_step_arrow(st):
        """Arrow Newton step: block-sparse factor of the compatible part
        + rank-3*SB Woodbury correction for cross-limb contact rows:
        H = A + U U^T  =>  H^-1 b = t - Z (I + U^T Z)^-1 U^T t with
        t = A^-1 b, Z = A^-1 U (one fused multi-RHS arrow solve)."""
        x, msm, jar_l, jar_c = st
        g = grad_from(msm, jar_l, jar_c)
        H = hessian(jar_l, jar_c)
        jar_b = ohb @ jar_c  # (SB, 3) jar of the selected breaking rows
        Wb = _cone_hessian(jar_b, mub, fricb, actb) * Db[:, None, None]
        G = _chol3_psd(Wb)  # (SB, 3, 3) lower
        # U columns = (G^T J)_s rows: U (nv, 3*SB).
        Vt = jnp.sum(G[:, :, :, None] * Vb[:, :, None, :], axis=1)
        U = Vt.reshape(3 * SB, nv).T
        rhs = jnp.concatenate([g[:, None], U], axis=1)
        if packed_m:
            F, sol = aops.chol_solve_pe(H, rhs)
        else:
            F, sol = aops.chol_solve_pe(H + 1e-12 * eye, rhs)
        t = sol[:, 0]
        Z = sol[:, 1:]
        C = eye_sb + U.T @ Z  # true (3SB, 3SB) GEMM: MXU-friendly as-is
        LC = _pchol.chol_pe(C + 1e-10 * eye_sb)
        w = _pchol.cho_solve_pe(LC, jnp.sum(U * t[:, None], axis=0))
        dx = -(t - jnp.sum(Z * w[None, :], axis=-1))
        return ls_and_update(st, dx), (F, Z, LC, U)

    def reuse_steps_arrow(st, fac, n):
        F, Z, LC, U = fac
        x, msm, jar_l, jar_c = st
        fr = _nf.make_reuse_pe(part, _lim_dof_t, _lim_sign_t,
                               ls_iterations, n)
        return fr(F, M, efc.con_J, Z, U, LC, x, msm, jar_l,
                  jar_c, lim_params, con_params)

    def newton_block(st, n):
        """A whole refactor block in ONE kernel launch. FULL form
        (FLYBODY_NEWTON_BLOCK_FULL=1): Hessian assembly (cone-Hessian-
        weighted packed JTJH + limit diagonal) AND the Woodbury operands
        are built in-kernel from J/jar/params planes
        (make_newton_block_full_pe) — the XLA per-env JTJH GEMMs and
        one-hot gathers are batched tiny matmuls that serialize on the
        MXU. Default (=0) is the split form (XLA assembly +
        make_newton_block_pe). Packed-M path only. (The round-4 'Mosaic
        mismatch' note that used to gate this was disproven — it was a
        test-input bug, see PROGRESS round-4 session 2; the default here
        is set by the round-5 A/B ledger entry in PROGRESS.md.)"""
        import os as _os
        x, msm, jar_l, jar_c = st
        if _os.environ.get('FLYBODY_NEWTON_BLOCK_FULL',
                           '0').strip().lower() \
                not in ('0', 'false', 'no', 'off'):
            con_params5 = jnp.concatenate(
                [con_params, hess_active[None]], axis=0)
            fn = _nf.make_newton_block_full_pe(
                part, _lim_dof_t, _lim_sign_t, ls_iterations, n)
            return fn(M, efc.con_J, ohb, x, msm, jar_l, jar_c,
                      lim_params, con_params5)
        Hp = hessian(jar_l, jar_c)
        jar_b = ohb @ jar_c
        Wb = _cone_hessian(jar_b, mub, fricb, actb) * Db[:, None, None]
        G = _chol3_psd(Wb)
        Vt = jnp.sum(G[:, :, :, None] * Vb[:, :, None, :], axis=1)
        U = Vt.reshape(3 * SB, nv).T
        fn = _nf.make_newton_block_pe(part, _lim_dof_t, _lim_sign_t,
                                      ls_iterations, n)
        return fn(Hp, M, efc.con_J, U, x, msm, jar_l, jar_c,
                  lim_params, con_params)

    def fresh_step_dense(st):
        """Newton step with fresh Hessian assembly + fused factor/solve."""
        g = grad_from(st[1], st[2], st[3])
        H = hessian(st[2], st[3])
        L, sol = _pchol.chol_solve_pe(H + 1e-12 * eye, g)
        dx = -sol
        return ls_and_update(st, dx), L

    def reuse_step_dense(st, L):
        """Newton step reusing the last factor: gradient + substitution
        only (no Hessian assembly, no factorization)."""
        g = grad_from(st[1], st[2], st[3])
        dx = -_pchol.cho_solve_pe(L, g)
        return ls_and_update(st, dx)

    if aops is not None:
        fresh_step, reuse_steps = fresh_step_arrow, reuse_steps_arrow
    else:
        fresh_step = fresh_step_dense

        def reuse_steps(st, L, n):
            for _ in range(n):
                st = reuse_step_dense(st, L)
            return st

    st = init_state(x)
    # NOTE: a tolerance-based lax.while_loop would let warm-started envs
    # exit early, but a pallas custom-call inside a batched while_loop
    # faults the TPU runtime (observed 2026-08-16); fixed trip counts.
    p = max(1, refactor_period)
    if aops is not None and packed_m:
        # Whole-block fused kernel (factor + all iterations per launch).
        nblocks, tail = divmod(iterations, p)
        if nblocks:
            st = jax.lax.fori_loop(0, nblocks,
                                   lambda i, ss: newton_block(ss, p), st)
        if tail:
            st = newton_block(st, tail)
    elif p == 1:
        st = jax.lax.fori_loop(0, iterations,
                               lambda i, ss: fresh_step(ss)[0], st)
    else:
        # Blocks of [fresh, (p-1) x reuse]; tail block truncated.
        def block(reuse_n):
            def body(i, ss):
                ss, Lb = fresh_step(ss)
                if reuse_n:
                    ss = reuse_steps(ss, Lb, reuse_n)
                return ss
            return body
        nblocks, tail = divmod(iterations, p)
        if nblocks:
            st = jax.lax.fori_loop(0, nblocks, block(p - 1), st)
        if tail:
            st = block(tail - 1)(0, st)

    x, _, jar_l, jar_c = st
    f_l, f_c = forces_from(jar_l, jar_c)
    qfrc = (jnp.zeros(nv, dtype).at[lim_dof_idx].add(f_l * lim_sign)
            + jnp.sum(efc.con_J * f_c[:, :, None], axis=(0, 1)))
    return x, qfrc, f_l, f_c


def noslip(model: FlyModel, data: Data, efc: EfcRows, qacc: jax.Array,
           f_c: jax.Array, iterations: int = 3,
           max_contacts: int | None = None):
    """Noslip post-processing (mj noslip solver).

    Gauss-Seidel sweeps over the friction rows of active elliptic contacts,
    solving the unregularized (R=0) subproblem for tangential forces with
    normal forces held fixed, clamping to the friction cone. Matches
    MuJoCo's noslip_iterations semantics (fruitfly.xml:4 sets 3).

    `max_contacts`: restrict the sweep to the first N contact slots. The
    top-K selection in make_efc sorts contacts by (dist - includemargin),
    so active contacts form a prefix of the slots; with the walking scene
    peaking at ~9 active contacts (measured), a prefix of 16 covers the
    active set while cutting the M^{-1} J_t^T solve (the dominant cost
    here) proportionally. None = all slots (exact MuJoCo semantics).
    """
    dtype = qacc.dtype
    K = efc.con_J.shape[0]
    if max_contacts is not None and max_contacts < K:
        K = max_contacts
    Jt = efc.con_J[:K, 1:, :]  # (K, 2, nv) tangent rows
    aref_t_f = efc.con_aref[:K, 1:]
    use_f = (efc.con_active[:K] * efc.con_frictional[:K]) > 0
    lim_f = jnp.maximum(efc.con_mu[:K] * f_c[:K, 0], 0.0)
    if data.qLD is not None and data.qLD.ndim == 3:
        # Packed block-arrow factor: ONE fused launch does the
        # M^{-1} J_t^T solve, the 2x2 block inverses, and the GS sweeps.
        from flybody_tpu.ops import arrow as _arrow
        from flybody_tpu.ops import noslip_gs as _ngs
        part = _arrow.build_partition(model.meta)
        fn = _ngs.make_noslip_fused_pe(part, iterations)
        x, ft = fn(data.qLD, Jt, aref_t_f, lim_f, use_f.astype(dtype),
                   qacc, f_c[:K, 1:])
        ft_full = jnp.concatenate([ft, f_c[K:, 1:]], axis=0)
        return x, jnp.concatenate([f_c[:, :1], ft_full], axis=1)
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
    aref_t = efc.con_aref[:K, 1:]
    use = (efc.con_active[:K] * efc.con_frictional[:K]) > 0

    # Friction-circle radii (normal forces held fixed).
    lim = jnp.maximum(efc.con_mu[:K] * f_c[:K, 0], 0.0)
    ft0 = f_c[:K, 1:]

    # The sequential GS sweeps run in a VMEM-resident pallas kernel when
    # vmapped on TPU (ops/noslip_gs.py); plain scan otherwise.
    from flybody_tpu.ops import noslip_gs as _ngs
    x, ft = _ngs.make_gs_pe(iterations)(
        Jt, Pt, Ainv, aref_t, lim, use.astype(dtype), qacc, ft0)
    ft_full = jnp.concatenate([ft, f_c[K:, 1:]], axis=0)
    f_c_new = jnp.concatenate([f_c[:, :1], ft_full], axis=1)
    return x, f_c_new
