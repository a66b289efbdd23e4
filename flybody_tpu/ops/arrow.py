"""Block-arrow (branch-sparse) Cholesky factor/solve for the fly tree.

The fly's kinematic tree is N limbs hanging off a free root. Ordering
dofs [limb_1 .. limb_N, root] makes any matrix with the tree's coupling
pattern — the mass matrix M (mj_crb tree sparsity) and the Newton
Hessian's arrow-compatible part M + J^T W J for contact rows touching a
single limb — block-arrow:

    P A P^T = [[D_1            B_1^T]
               [     ...       ...  ]
               [         D_N   B_N^T]
               [B_1  ... B_N   R    ]]

Exact factorization cost drops from nv^3/3 to sum_i d_i*(d_i + nr)^2-ish
(~26x fewer FLOPs for the fly: nv=108 -> 12 limb blocks of <= 14 dofs +
a 6-wide root border), and — the bigger TPU win — the sequential column
loop shortens from nv steps to dmax + nr (14 + 6), with all limbs
processed simultaneously on the VPU lanes.

The packed factor F has shape (nlimb + 1, dmax + nr, dmax):
    F[i, :dmax, :]  = L_i   (lower Cholesky of D_i, identity in padding)
    F[i, dmax:, :]  = LB_i  = B_i L_i^{-T}  (nr x dmax, zero padding)
    F[nlimb, :nr, :nr] = L_R (lower Cholesky of R - sum_i LB_i LB_i^T)

Reference semantics: replaces dense Cholesky in mj_factorM / mj_solveM /
the Newton solver; MuJoCo's own L^T D L factorization (engine_core_smooth.c)
exploits the same tree sparsity row-by-row, this is the lane-batched
block form of it.

Like ops/cholesky.py, per-env functions are exposed via custom_vmap:
plain jnp for a single env, one lane-batched pallas kernel under vmap on
TPU.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


class Part(NamedTuple):
    """Static arrow partition of the dof vector (hashable)."""

    los: tuple[int, ...]  # limb dof block starts
    ds: tuple[int, ...]  # limb dof block sizes
    nr: int  # root (border) dof count; root dofs are [0, nr)
    nv: int
    dmax: int
    limb_of_body: tuple[int, ...]  # -1 for world/trunk bodies


@functools.lru_cache(maxsize=8)
def build_partition(meta) -> Part | None:
    """Derive the limb/root partition from the body tree.

    Trunk = world plus the chain of bodies absorbed while a body has at
    most one child with dofs in its subtree (dof-less side branches join
    the trunk); the remaining subtrees are limbs. Returns None (dense
    fallback) when the partition is unprofitable or the dof layout is
    not [root..., contiguous limb blocks].
    """
    nb = meta.nbody
    par = np.array(meta.body_parentid)
    kids: list[list[int]] = [[] for _ in range(nb)]
    for b in range(1, nb):
        kids[par[b]].append(b)
    dof_body = np.array(meta.dof_bodyid)
    ndof = np.zeros(nb, dtype=np.int64)
    for b in dof_body:
        ndof[b] += 1
    sub_dofs = ndof.copy()
    for b in range(nb - 1, 0, -1):  # children have higher ids (MuJoCo)
        sub_dofs[par[b]] += sub_dofs[b]

    trunk = {0}
    limb_roots: list[int] = []
    frontier = [0]
    while frontier:
        b = frontier.pop()
        dofful = [c for c in kids[b] if sub_dofs[c] > 0]
        trunkless = [c for c in kids[b] if sub_dofs[c] == 0]
        for c in trunkless:
            trunk.add(c)  # dof-less side branch: irrelevant to M
            frontier.append(c)
        if len(dofful) == 1:
            trunk.add(dofful[0])
            frontier.append(dofful[0])
        else:
            limb_roots.extend(dofful)
    if len(limb_roots) < 2:
        return None

    def subtree(b):
        out = [b]
        for c in kids[b]:
            out.extend(subtree(c))
        return out

    root_dofs = sorted(d for d in range(meta.nv)
                       if dof_body[d] in trunk)
    nr = len(root_dofs)
    if root_dofs != list(range(nr)):
        return None

    limb_of_body = np.full(nb, -1, dtype=np.int64)
    blocks = []
    for li, r in enumerate(sorted(limb_roots)):
        bodies = subtree(r)
        dofs = sorted(d for d in range(meta.nv)
                      if dof_body[d] in set(bodies))
        if not dofs or dofs != list(range(dofs[0], dofs[-1] + 1)):
            return None
        blocks.append((dofs[0], len(dofs)))
        for b in bodies:
            limb_of_body[b] = li
    blocks.sort()
    # Blocks must tile [nr, nv).
    pos = nr
    for lo, d in blocks:
        if lo != pos:
            return None
        pos += d
    if pos != meta.nv:
        return None
    dmax = max(d for _, d in blocks)
    if dmax > 16 or dmax < nr:
        return None  # unprofitable (e.g. multi-fly scenes): dense path
    return Part(los=tuple(lo for lo, _ in blocks),
                ds=tuple(d for _, d in blocks), nr=nr, nv=meta.nv,
                dmax=dmax, limb_of_body=tuple(int(x) for x in limb_of_body))


def enabled() -> bool:
    """Global kill switch: FLYBODY_NO_ARROW=1 forces the dense path."""
    return os.environ.get('FLYBODY_NO_ARROW', '').strip() not in (
        '1', 'true', 'yes', 'all')


def _use_pallas():
    from flybody_tpu.ops.dispatch import pallas_enabled
    return pallas_enabled('arrow')


# ---------------------------------------------------------------------------
# jnp reference (single env). Also the off-TPU fallback.


def _pack(part: Part, A):
    """Dense (nv, nv) -> (D (nl, dm, dm) identity-padded, B (nl, nr, dm),
    R (nr, nr))."""
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    dtype = A.dtype
    D = jnp.broadcast_to(jnp.eye(dm, dtype=dtype), (nl, dm, dm))
    B = jnp.zeros((nl, nr, dm), dtype)
    for i, (lo, d) in enumerate(zip(part.los, part.ds)):
        blk = A[lo:lo + d, lo:lo + d]
        Dd = jnp.zeros((dm, dm), dtype).at[:d, :d].set(blk)
        pad_eye = jnp.diag((jnp.arange(dm) >= d).astype(dtype))
        D = D.at[i].set(Dd + pad_eye)
        if nr:
            B = B.at[i, :, :d].set(A[0:nr, lo:lo + d])
    R = A[0:nr, 0:nr]
    return D, B, R


@functools.lru_cache(maxsize=8)
def _pad_eye_np(part: Part):
    """(nl+1, dm+nr, dm) with 1.0 on padded limb-diagonal positions."""
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    pe = np.zeros((nl + 1, dm + nr, dm))
    for i, d in enumerate(part.ds):
        for j in range(d, dm):
            pe[i, j, j] = 1.0
    return pe


@functools.lru_cache(maxsize=8)
def _limb_dof_tables(part: Part):
    """Static gather/scatter tables for (nl, dm) <-> (nv,) limb packing:
    idx (nl, dm) dof index (0 for padding), w (nl, dm) validity mask,
    scat (nv, nl*dm) 0/1 scatter matrix (rows = dofs, cols = padded limb
    slots)."""
    nl, dm = len(part.ds), part.dmax
    idx = np.zeros((nl, dm), np.int64)
    w = np.zeros((nl, dm))
    scat = np.zeros((part.nv, nl * dm))
    for i, (lo, d) in enumerate(zip(part.los, part.ds)):
        idx[i, :d] = np.arange(lo, lo + d)
        w[i, :d] = 1.0
        for j in range(d):
            scat[lo + j, i * dm + j] = 1.0
    return idx, w, scat


def pack_sym_ref(part: Part, A, pad_identity: bool = True):
    """Dense symmetric (nv, nv) with the tree's arrow sparsity ->
    packed (nl + 1, dm + nr, dm):
        Mp[i, :d, :d]        = D_i   (limb diagonal block)
        Mp[i, dm:dm+nr, :d]  = B_i   (root-limb border rows)
        Mp[nl, :nr, :nr]     = R     (root block)
    Padded limb-diagonal entries are 1 when pad_identity (so the packed
    factor kernels can skip masking), 0 otherwise (so packs ADD)."""
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    dtype = A.dtype
    Mp = jnp.zeros((nl + 1, dm + nr, dm), dtype)
    for i, (lo, d) in enumerate(zip(part.los, part.ds)):
        Mp = Mp.at[i, :d, :d].set(A[lo:lo + d, lo:lo + d])
        if nr:
            Mp = Mp.at[i, dm:dm + nr, :d].set(A[0:nr, lo:lo + d])
    if nr:
        Mp = Mp.at[nl, :nr, :nr].set(A[0:nr, 0:nr])
    if pad_identity:
        Mp = Mp + jnp.asarray(_pad_eye_np(part), dtype)
    return Mp


def unpack_sym_ref(part: Part, Mp):
    """Packed symmetric (nl + 1, dm + nr, dm) -> dense (nv, nv)
    (padding-identity entries dropped)."""
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    A = jnp.zeros((part.nv, part.nv), Mp.dtype)
    for i, (lo, d) in enumerate(zip(part.los, part.ds)):
        A = A.at[lo:lo + d, lo:lo + d].set(Mp[i, :d, :d])
        if nr:
            A = A.at[0:nr, lo:lo + d].set(Mp[i, dm:dm + nr, :d])
            A = A.at[lo:lo + d, 0:nr].set(Mp[i, dm:dm + nr, :d].T)
    if nr:
        A = A.at[0:nr, 0:nr].set(Mp[nl, :nr, :nr])
    return A


def add_diag_packed(part: Part, Mp, diag):
    """Packed M plus diag(diag) (diag: (nv,)); padding untouched."""
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    idx, w, _ = _limb_dof_tables(part)
    diag = jnp.asarray(diag)
    ext = diag[idx] * jnp.asarray(w, diag.dtype)  # (nl, dm)
    eye_dm = jnp.eye(dm, dtype=Mp.dtype)
    Mp = Mp.at[:nl, :dm, :].add(eye_dm[None] * ext[:, None, :])
    if nr:
        Mp = Mp.at[nl, :nr, :nr].add(jnp.diag(diag[:nr]))
    return Mp


def matvec_packed(part: Part, Mp, x):
    """y = M x for packed symmetric M. x: (nv,) or (nv, m). Pure
    mul+sum / constant-matrix contractions (no batched tiny matmuls), so
    it vmaps efficiently."""
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    vec = x.ndim == 1
    xm = x[:, None] if vec else x
    m = xm.shape[1]
    idx, w, scat = _limb_dof_tables(part)
    xlp = xm[idx] * jnp.asarray(w, x.dtype)[:, :, None]
    Dall = Mp[:nl, :dm, :]          # (nl, dm, dm)
    Ball = Mp[:nl, dm:dm + nr, :]   # (nl, nr, dm)
    R = Mp[nl, :nr, :nr]
    xr = xm[0:nr]                   # (nr, m)
    # Limb rows: D_i x_i + B_i^T x_r. The identity padding of D only
    # touches padded rows, which the scatter matrix drops.
    ylp = jnp.sum(Dall[:, :, :, None] * xlp[:, None, :, :], axis=2)
    if nr:
        ylp = ylp + jnp.sum(Ball[:, :, :, None] * xr[None, :, None, :],
                            axis=1)
    out = jnp.asarray(scat, x.dtype) @ ylp.reshape(nl * dm, m)
    if nr:
        y_r = (jnp.sum(Ball[:, :, :, None] * xlp[:, None, :, :],
                       axis=(0, 2))
               + jnp.sum(R[:, :, None] * xr[None, :, :], axis=1))
        out = out.at[0:nr].add(y_r)
    return out[:, 0] if vec else out


def factor_ref_p(part: Part, Mp):
    """Arrow Cholesky from a PACKED symmetric matrix (identity-padded)
    -> packed factor (nl + 1, dm + nr, dm)."""
    import jax.scipy.linalg as jsl
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    D = Mp[:nl, :dm, :]
    B = Mp[:nl, dm:dm + nr, :]
    R = Mp[nl, :nr, :nr]
    L = jnp.linalg.cholesky(D)
    if nr:
        LB = jax.vmap(lambda l, b: jsl.solve_triangular(
            l, b.T, lower=True).T)(L, B)
        S = R - jnp.einsum('iak,ibk->ab', LB, LB)
        LR = jnp.linalg.cholesky(S)
    else:
        LB = B
        LR = jnp.zeros((0, 0), Mp.dtype)
    F = jnp.zeros((nl + 1, dm + nr, dm), Mp.dtype)
    F = F.at[:nl, :dm, :].set(L)
    if nr:
        F = F.at[:nl, dm:, :].set(LB)
        F = F.at[nl, :nr, :nr].set(LR)
    return F


def factor_ref(part: Part, A):
    """Arrow Cholesky of dense (nv, nv) -> packed factor
    (nl + 1, dm + nr, dm)."""
    import jax.scipy.linalg as jsl
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    D, B, R = _pack(part, A)
    L = jnp.linalg.cholesky(D)  # (nl, dm, dm) vmapped small chol
    if nr:
        # LB_i = B_i L_i^{-T} = (L_i^{-1} B_i^T)^T
        LB = jax.vmap(lambda l, b: jsl.solve_triangular(
            l, b.T, lower=True).T)(L, B)
        S = R - jnp.einsum('iak,ibk->ab', LB, LB)
        LR = jnp.linalg.cholesky(S)
    else:
        LB = B
        LR = jnp.zeros((0, 0), A.dtype)
    F = jnp.zeros((nl + 1, dm + nr, dm), A.dtype)
    F = F.at[:nl, :dm, :].set(L)
    if nr:
        F = F.at[:nl, dm:, :].set(LB)
        F = F.at[nl, :nr, :nr].set(LR)
    return F


def solve_ref(part: Part, F, b):
    """Solve A x = b given the packed arrow factor. b: (nv,) or (nv, m)."""
    import jax.scipy.linalg as jsl
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    vec = b.ndim == 1
    bm = b[:, None] if vec else b
    m = bm.shape[1]
    L = F[:nl, :dm, :]
    LB = F[:nl, dm:, :]
    LR = F[nl, :nr, :nr]
    # Pack rhs per limb.
    bl = jnp.zeros((nl, dm, m), b.dtype)
    for i, (lo, d) in enumerate(zip(part.los, part.ds)):
        bl = bl.at[i, :d, :].set(bm[lo:lo + d, :])
    # Forward: limb solves, then root.
    y = jax.vmap(lambda l, r: jsl.solve_triangular(l, r, lower=True))(L, bl)
    if nr:
        br = bm[0:nr, :] - jnp.einsum('iak,ikm->am', LB, y)
        yr = jsl.solve_triangular(LR, br, lower=True)
        xr = jsl.solve_triangular(LR.T, yr, lower=False)
        y2 = y - jnp.einsum('iak,am->ikm', LB, xr)
    else:
        xr = jnp.zeros((0, m), b.dtype)
        y2 = y
    x_l = jax.vmap(lambda l, r: jsl.solve_triangular(
        l.T, r, lower=False))(L, y2)
    out = jnp.zeros_like(bm)
    if nr:
        out = out.at[0:nr, :].set(xr)
    for i, (lo, d) in enumerate(zip(part.los, part.ds)):
        out = out.at[lo:lo + d, :].set(x_l[i, :d, :])
    return out[:, 0] if vec else out


# ---------------------------------------------------------------------------
# Pallas kernels (lane-batched; batch on the last dim).


def _make_factor_body(part: Part, packed: bool = False):
    """Kernel body: factor a_ref into packed f_ref. a_ref is dense
    (n, n, LANES), or the packed symmetric (nl+1, dm+nr, dm, LANES)
    layout of pack_sym_ref when `packed` (3.3x less HBM per env)."""
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    los, ds = part.los, part.ds

    def body(a_ref, f_ref, dw, bw):
        dtype = a_ref.dtype
        rows4 = jax.lax.broadcasted_iota(jnp.int32, (1, dm, 1, 1), 1)
        cols4 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, dm, 1), 2)
        eye4 = (rows4 == cols4).astype(dtype)  # (1, dm, dm, 1)
        f_ref[...] = jnp.zeros_like(f_ref[...])
        if packed:
            # Packed input is already identity-padded per pack_sym_ref.
            dw[...] = a_ref[0:nl, 0:dm, :, :]
            if nr:
                bw[...] = a_ref[0:nl, dm:dm + nr, :, :]
        else:
            # Identity-init: padded rows/cols (j >= d_i) factor to
            # identity columns and never perturb the live region.
            dw[...] = jnp.broadcast_to(eye4, dw.shape)
            if nr:
                bw[...] = jnp.zeros_like(bw[...])
            for i, (lo, d) in enumerate(zip(los, ds)):
                dw[i, :d, :d, :] = a_ref[lo:lo + d, lo:lo + d, :]
                if nr:
                    bw[i, :, :d, :] = a_ref[0:nr, lo:lo + d, :]

        for k in range(dm):  # static unroll: direct-offset slices
            colv = dw[:, :, k:k + 1, :]  # (nl, dm, 1, LANES)
            rowv = dw[:, k:k + 1, :, :]  # (nl, 1, dm, LANES)
            dkk = dw[:, k:k + 1, k:k + 1, :]  # (nl, 1, 1, LANES)
            inv = jax.lax.rsqrt(jnp.maximum(dkk, 1e-30))
            c = jnp.where(rows4 >= k, colv * inv, 0.0)
            r = jnp.where(cols4 >= k, rowv * inv, 0.0)
            f_ref[0:nl, 0:dm, k:k + 1, :] = c
            dw[...] = dw[...] - c * r
            if nr:
                bc = bw[:, :, k:k + 1, :] * inv  # (nl, nr, 1, LANES)
                f_ref[0:nl, dm:dm + nr, k:k + 1, :] = bc
                bw[...] = bw[...] - bc * r

        if nr:
            # Schur complement R' = R - sum_i LB_i LB_i^T, then its
            # dense 6x6 Cholesky (nr sequential steps).
            rw = (a_ref[nl, 0:nr, 0:nr, :] if packed
                  else a_ref[0:nr, 0:nr, :])  # (nr, nr, LANES) value
            LBall = f_ref[0:nl, dm:dm + nr, :, :]  # (nl, nr, dm, LANES)
            for i in range(nl):
                lb = LBall[i]  # (nr, dm, LANES)
                rw = rw - jnp.sum(lb[:, None, :, :] * lb[None, :, :, :],
                                  axis=2)
            rrows = jax.lax.broadcasted_iota(jnp.int32, (nr, 1, 1), 0)
            rcols = jax.lax.broadcasted_iota(jnp.int32, (1, nr, 1), 1)
            lr = jnp.zeros_like(rw)
            for k in range(nr):  # static unroll: nr = 6
                dkk = rw[k:k + 1, k:k + 1, :]
                inv = jax.lax.rsqrt(jnp.maximum(dkk, 1e-30))
                c = jnp.where(rrows >= k, rw[:, k:k + 1, :] * inv, 0.0)
                rr = jnp.where(rcols >= k, rw[k:k + 1, :, :] * inv, 0.0)
                lr = lr + c * (rcols == k).astype(dtype)
                rw = rw - c * rr
            f_ref[nl, 0:nr, 0:nr, :] = lr

    return body


def _make_solve_body(part: Part, m: int):
    """Kernel body: solve with packed factor. b_ref/x_ref: (m, n, LANES)."""
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    los, ds = part.los, part.ds

    def body(f_ref, b_ref, x_ref, yl, cl):
        # yl: (nl, m, dm, LANES) rhs -> y -> x workspace per limb;
        # cl: (nl, m, dm, LANES) running corrections.
        yl[...] = jnp.zeros_like(yl[...])
        for i, (lo, d) in enumerate(zip(los, ds)):
            yl[i, :, :d, :] = b_ref[:, lo:lo + d, :]

        # Forward limb substitution: L y = b, all limbs at once. yl is
        # both rhs and solution: the full-row dot picks up L_kk * b_k
        # from the not-yet-solved row k, which is subtracted back.
        for k in range(dm):  # static unroll
            Lrow = f_ref[0:nl, k:k + 1, 0:dm, :]  # (nl, 1, dm, L)
            dkk = f_ref[0:nl, k:k + 1, k:k + 1, :]
            bk = yl[:, :, k:k + 1, :]
            acc = jnp.sum(Lrow * yl[...], axis=2, keepdims=True) - dkk * bk
            yl[:, :, k:k + 1, :] = (bk - acc) / dkk

        if nr:
            rsel = jax.lax.broadcasted_iota(jnp.int32, (1, nr, 1), 1)
            # Root rhs: b_r - sum_i LB_i y_i.
            br = b_ref[:, 0:nr, :]  # (m, nr, LANES)
            for i in range(nl):
                lb = f_ref[i, dm:dm + nr, 0:dm, :]  # (nr, dm, LANES)
                br = br - jnp.sum(lb[None, :, :, :] * yl[i][:, None, :, :],
                                  axis=2)  # (m, nr, LANES)
            LR = f_ref[nl, 0:nr, 0:nr, :]  # (nr, nr, LANES)
            # Forward root: LR yr = br (nr static steps, where-masked).
            yr = jnp.zeros_like(br)
            for k in range(nr):
                row = LR[k:k + 1, :, :]  # (1, nr, LANES)
                acc = jnp.sum(row * yr, axis=1, keepdims=True)  # (m,1,L)
                dkk = LR[k:k + 1, k:k + 1, :]
                yr = jnp.where(rsel == k, (br[:, k:k + 1, :] - acc) / dkk,
                               yr)
            # Backward root: LR^T xr = yr, running-correction form.
            xr = jnp.zeros_like(yr)
            cr = jnp.zeros_like(yr)
            for i2 in range(nr):
                k = nr - 1 - i2
                dkk = LR[k:k + 1, k:k + 1, :]
                xk = (yr[:, k:k + 1, :] - cr[:, k:k + 1, :]) / dkk
                xr = jnp.where(rsel == k, xk, xr)
                cr = cr + LR[k:k + 1, :, :] * xk
            x_ref[:, 0:nr, :] = xr
            # Limb rhs for the backward pass: y_i - LB_i^T xr.
            for i in range(nl):
                lb = f_ref[i, dm:dm + nr, 0:dm, :]  # (nr, dm, LANES)
                corr = jnp.sum(lb[None, :, :, :] * xr[:, :, None, :],
                               axis=1)  # (m, dm, LANES)
                yl[i, :, :, :] = yl[i, :, :, :] - corr

        # Backward limb substitution: L^T x = y, running-correction form
        # (row slices of L only; yl becomes x in place).
        cl[...] = jnp.zeros_like(cl[...])

        for k in range(dm - 1, -1, -1):  # static unroll
            Lrow = f_ref[0:nl, k:k + 1, 0:dm, :]  # (nl, 1, dm, L)
            dkk = f_ref[0:nl, k:k + 1, k:k + 1, :]
            xk = (yl[:, :, k:k + 1, :] - cl[:, :, k:k + 1, :]) / dkk
            cl[...] = cl[...] + Lrow * xk
            yl[:, :, k:k + 1, :] = xk

        for i, (lo, d) in enumerate(zip(los, ds)):
            x_ref[:, lo:lo + d, :] = yl[i, :, :d, :]

    return body


def _a_spec(part: Part, packed: bool):
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    n = part.nv
    if packed:
        return pl.BlockSpec((nl + 1, dm + nr, dm, LANES),
                            lambda i: (0, 0, 0, i),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=16)
def _factor_fn(part: Part, interpret: bool = False,
               packed: bool = False):
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    body = _make_factor_body(part, packed)

    @jax.jit
    def run(A_t):  # (n, n, B) or packed (nl+1, dm+nr, dm, B)
        B = A_t.shape[-1]
        grid = (B // LANES,)
        return pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((nl + 1, dm + nr, dm, B),
                                           A_t.dtype),
            grid=grid,
            in_specs=[_a_spec(part, packed)],
            out_specs=pl.BlockSpec((nl + 1, dm + nr, dm, LANES),
                                   lambda i: (0, 0, 0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((nl, dm, dm, LANES), jnp.float32),
                            pltpu.VMEM((max(nl, 1), max(nr, 1), dm, LANES),
                                       jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(A_t)

    return run


@functools.lru_cache(maxsize=32)
def _solve_fn(part: Part, m: int, interpret: bool = False):
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    n = part.nv
    body = _make_solve_body(part, m)

    @jax.jit
    def run(F_t, b_t):  # F_t: (nl+1, dm+nr, dm, B); b_t: (m, n, B)
        B = F_t.shape[-1]
        grid = (B // LANES,)
        return pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((m, n, B), b_t.dtype),
            grid=grid,
            in_specs=[pl.BlockSpec((nl + 1, dm + nr, dm, LANES),
                                   lambda i: (0, 0, 0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((m, n, LANES), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((m, n, LANES), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((nl, m, dm, LANES), jnp.float32),
                            pltpu.VMEM((nl, m, dm, LANES), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(F_t, b_t)

    return run


@functools.lru_cache(maxsize=32)
def _factor_solve_fn(part: Part, m: int, interpret: bool = False,
                     packed: bool = False):
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    n = part.nv
    fbody = _make_factor_body(part, packed)
    sbody = _make_solve_body(part, m)

    def body(a_ref, b_ref, f_ref, x_ref, dw, bw, yl, cl):
        fbody(a_ref, f_ref, dw, bw)
        sbody(f_ref, b_ref, x_ref, yl, cl)

    @jax.jit
    def run(A_t, b_t):
        B = A_t.shape[-1]
        grid = (B // LANES,)
        return pl.pallas_call(
            body,
            out_shape=(jax.ShapeDtypeStruct((nl + 1, dm + nr, dm, B),
                                            A_t.dtype),
                       jax.ShapeDtypeStruct((m, n, B), b_t.dtype)),
            grid=grid,
            in_specs=[_a_spec(part, packed),
                      pl.BlockSpec((m, n, LANES), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((nl + 1, dm + nr, dm, LANES),
                                    lambda i: (0, 0, 0, i),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((m, n, LANES), lambda i: (0, 0, i),
                                    memory_space=pltpu.VMEM)),
            scratch_shapes=[pltpu.VMEM((nl, dm, dm, LANES), jnp.float32),
                            pltpu.VMEM((max(nl, 1), max(nr, 1), dm, LANES),
                                       jnp.float32),
                            pltpu.VMEM((nl, m, dm, LANES), jnp.float32),
                            pltpu.VMEM((nl, m, dm, LANES), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(A_t, b_t)

    return run


# ---------------------------------------------------------------------------
# Batched entry points (pad batch to LANES, transpose to lane layout).


def _pad_lanes(x, pad, fill):
    if not pad:
        return x
    return jnp.concatenate([x, jnp.broadcast_to(
        fill, x.shape[:-1] + (pad,))], axis=-1)


def _identity_packed(part: Part, dtype):
    """Packed symmetric identity (fill for dead batch lanes)."""
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    Mp = np.zeros((nl + 1, dm + nr, dm))
    for j in range(dm):
        Mp[:nl, j, j] = 1.0
    for r in range(nr):
        Mp[nl, r, r] = 1.0
    return jnp.asarray(Mp, dtype)[..., None]


def factor_batched(part: Part, A, interpret: bool = False):
    """Dense (B, n, n) or packed (B, nl+1, dm+nr, dm) -> packed factors
    (B, nl+1, dm+nr, dm) via pallas."""
    packed = A.ndim == 4
    B = A.shape[0]
    pad = (-B) % LANES
    A_t = jnp.moveaxis(A, 0, -1)
    fill = (_identity_packed(part, A.dtype) if packed
            else jnp.eye(part.nv, dtype=A.dtype)[:, :, None])
    A_t = _pad_lanes(A_t, pad, fill)
    F_t = _factor_fn(part, interpret, packed)(A_t)
    return jnp.moveaxis(F_t[..., :B], -1, 0)


def _identity_factor(part: Part, dtype):
    """Packed factor of the identity (fill for dead batch lanes)."""
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    F = np.zeros((nl + 1, dm + nr, dm), dtype=np.float64)
    for j in range(dm):
        F[:, j, j] = 1.0  # L_i = I (incl. the LR block's top-left)
    return jnp.asarray(F, dtype)[..., None]


def solve_batched(part: Part, F, b, interpret: bool = False):
    """F: (B, nl+1, dm+nr, dm); b: (B, n) or (B, n, m)."""
    vec = b.ndim == 2
    bm = b[:, :, None] if vec else b
    B, n, m = bm.shape
    pad = (-B) % LANES
    F_t = jnp.moveaxis(F, 0, -1)
    b_t = jnp.transpose(bm, (2, 1, 0))  # (m, n, B)
    F_t = _pad_lanes(F_t, pad, _identity_factor(part, F.dtype))
    b_t = _pad_lanes(b_t, pad, jnp.zeros((), b.dtype))
    x_t = _solve_fn(part, m, interpret)(F_t, b_t)
    x = jnp.transpose(x_t[..., :B], (2, 1, 0))
    return x[:, :, 0] if vec else x


def factor_solve_batched(part: Part, A, b, interpret: bool = False):
    """Fused factor+solve: A dense (B, n, n) or packed
    (B, nl+1, dm+nr, dm); b (B, n) or (B, n, m)."""
    packed = A.ndim == 4
    vec = b.ndim == 2
    bm = b[:, :, None] if vec else b
    B, n, m = bm.shape
    pad = (-B) % LANES
    A_t = jnp.moveaxis(A, 0, -1)
    fill = (_identity_packed(part, A.dtype) if packed
            else jnp.eye(n, dtype=A.dtype)[:, :, None])
    A_t = _pad_lanes(A_t, pad, fill)
    b_t = jnp.transpose(bm, (2, 1, 0))
    b_t = _pad_lanes(b_t, pad, jnp.zeros((), b.dtype))
    F_t, x_t = _factor_solve_fn(part, m, interpret, packed)(A_t, b_t)
    F = jnp.moveaxis(F_t[..., :B], -1, 0)
    x = jnp.transpose(x_t[..., :B], (2, 1, 0))
    return F, (x[:, :, 0] if vec else x)


# ---------------------------------------------------------------------------
# Per-env custom_vmap wrappers (mirrors ops/cholesky.py).


@functools.lru_cache(maxsize=8)
def ops_for(part: Part):
    """Per-partition per-env ops that pallas-batch under vmap on TPU."""

    def _fref(part, A):
        """Dense (nv, nv) or packed (nl+1, dm+nr, dm) -> factor."""
        return (factor_ref_p(part, A) if A.ndim == 3
                else factor_ref(part, A))

    @custom_batching.custom_vmap
    def chol_pe(A):
        return _fref(part, A)

    @chol_pe.def_vmap
    def _(axis_size, in_batched, A):
        del axis_size
        if not in_batched[0]:  # pragma: no cover
            return _fref(part, A), False
        if _use_pallas():
            return factor_batched(part, A), True
        return jax.vmap(lambda a: _fref(part, a))(A), True

    @custom_batching.custom_vmap
    def solve_pe(F, b):
        return solve_ref(part, F, b)

    @solve_pe.def_vmap
    def _(axis_size, in_batched, F, b):
        del axis_size
        if not (in_batched[0] and in_batched[1]):  # pragma: no cover
            out = jax.vmap(lambda f, r: solve_ref(part, f, r),
                           in_axes=(0 if in_batched[0] else None,
                                    0 if in_batched[1] else None))(F, b)
            return out, True
        if _use_pallas():
            return solve_batched(part, F, b), True
        return jax.vmap(lambda f, r: solve_ref(part, f, r))(F, b), True

    @custom_batching.custom_vmap
    def chol_solve_pe(A, b):
        F = _fref(part, A)
        return F, solve_ref(part, F, b)

    @chol_solve_pe.def_vmap
    def _(axis_size, in_batched, A, b):
        del axis_size
        if not (in_batched[0] and in_batched[1]):  # pragma: no cover
            out = jax.vmap(
                lambda a, r: ((F := _fref(part, a)),
                              solve_ref(part, F, r)),
                in_axes=(0 if in_batched[0] else None,
                         0 if in_batched[1] else None))(A, b)
            return out, (True, True)
        if _use_pallas():
            return factor_solve_batched(part, A, b), (True, True)
        out = jax.vmap(
            lambda a, r: ((F := _fref(part, a)),
                          solve_ref(part, F, r)))(A, b)
        return out, (True, True)

    class _Ops(NamedTuple):
        chol_pe: object
        solve_pe: object
        chol_solve_pe: object

    return _Ops(chol_pe=chol_pe, solve_pe=solve_pe,
                chol_solve_pe=chol_solve_pe)
