"""Fused Newton reuse step as ONE Pallas TPU kernel.

A refactor-period Newton 'reuse' iteration is: gradient from carried
state -> arrow solve with the cached factor -> Woodbury correction ->
exact line search -> linear state update. In XLA that is ~6 dispatches
per iteration, each re-reading M / con_J / the factor from HBM with
small intermediates bouncing in between. This kernel runs the WHOLE
iteration VMEM-resident per (128-env) lane block: M, con_J, the packed
arrow factor, and the Woodbury operators are read from HBM exactly once,
and everything else (cone forces, substitutions, the entire line
search) happens on registers/VMEM.

State carried across iterations (see physics/solver.py):
    x      (nv,)   current qacc iterate
    msm    (nv,)   M (x - a_free)
    jar_l  (L,)    limit-row jar values
    jar_c  (K, 3)  contact jar values
All four update linearly along the accepted step.

The per-env primal composes the existing jnp references (arrow solve,
alpha_ref) so CPU tests exercise the same math; the pallas path engages
under vmap on TPU (custom_vmap, like every other hot op).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flybody_tpu.ops import arrow as _arrow
from flybody_tpu.ops import linesearch as _ls

LANES = 128


def _use_pallas():
    from flybody_tpu.ops.dispatch import pallas_enabled
    return pallas_enabled('newton')


def _newton_lanes():
    """Lane-block width for the full/whole-solve Newton kernels. The
    kernel is per-op overhead bound (round-5 measurement: ~230us per
    128-lane grid step vs ~30us of FLOPs), so wider blocks amortize the
    fixed per-op cost; bounded by VMEM (scratch scales linearly)."""
    import os
    return int(os.environ.get('FLYBODY_NEWTON_LANES', '128'))


def _cone_residual_planes(N, y1, y2, mu, fric):
    """Elliptic-cone residual on (K, lanes) component planes (same math
    as solver._cone_residual / linesearch.search_planes zone selects)."""
    amu = 1.0 / jnp.maximum(mu, 1e-6)
    c_ = 1.0 / (1.0 + amu * amu)
    T = jnp.sqrt(y1 * y1 + y2 * y2)
    safe_T = jnp.maximum(T, 1e-15)
    w = (N + amu * T) * c_
    top = N >= mu * T
    bottom = mu * N + T <= 0.0
    coef = 1.0 - amu * w / safe_T
    r0 = jnp.where(bottom, N, N - w)
    r1 = jnp.where(bottom, y1, y1 * coef)
    r2 = jnp.where(bottom, y2, y2 * coef)
    r0 = jnp.where(top, 0.0, r0)
    r1 = jnp.where(top, 0.0, r1)
    r2 = jnp.where(top, 0.0, r2)
    fric_pos = fric > 0
    r0 = jnp.where(fric_pos, r0, jnp.minimum(N, 0.0))
    r1 = jnp.where(fric_pos, r1, 0.0)
    r2 = jnp.where(fric_pos, r2, 0.0)
    return r0, r1, r2


def _width_groups(los, ds):
    """Limb groups of equal width d for vectorized packed-JTJH assembly.

    Returns (scratch_order, groups): scratch_order[p] is the original
    limb index stored at grouped-scratch row p (limbs sorted by width,
    ties by index), and each group is (s0, d, runs) where runs =
    [(li0, p0, n)] are maximal runs of CONSECUTIVE original limb
    indices — scratch rows p0..p0+n hold limbs li0..li0+n — so the
    hp writes stay range-sliced (the Mosaic rule)."""
    nl = len(ds)
    order = sorted(range(nl), key=lambda li: (ds[li], li))
    groups = []
    i = 0
    while i < nl:
        j = i
        while j < nl and ds[order[j]] == ds[order[i]]:
            j += 1
        idxs = order[i:j]
        runs = []
        k = 0
        while k < len(idxs):
            m = k
            while m + 1 < len(idxs) and idxs[m + 1] == idxs[m] + 1:
                m += 1
            runs.append((idxs[k], i + k, m - k + 1))
            k = m + 1
        groups.append((i, ds[order[i]], runs))
        i = j
    return tuple(order), tuple(groups)


def _tri_inv_lower(lc, SB3, dtype):
    """Dense inverse of a per-lane lower-triangular (SB3, SB3, L) factor
    by forward substitution with the identity RHS — SB3 sequential steps
    ONCE, so each Newton iteration's two triangular solves collapse to
    two mul+reduce contractions against the inverse."""
    rows_c = jax.lax.broadcasted_iota(jnp.int32, (SB3, 1, 1), 0)
    ek_rows = jax.lax.broadcasted_iota(jnp.int32, (SB3, 1), 0)
    linv = jnp.zeros_like(lc)
    for k in range(SB3):
        term = jnp.sum(lc[k, :, :][:, None, :] * linv, axis=0)  # (SB3, L)
        ek = (ek_rows == k).astype(dtype)
        val = (ek - term) / lc[k, k, :][None]
        linv = jnp.where(rows_c == k, val[None, :, :], linv)
    return linv


def _make_kernel(part: _arrow.Part, K: int, SB3: int, nlim: int,
                 lim_dof: tuple, lim_sign: tuple, ls_iters: int,
                 n_iters: int = 1, packed_m: bool = False):
    nv = part.nv
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    los, ds = part.los, part.ds
    solve_body = _arrow._make_solve_body(part, 1)

    def body(f_ref, m_ref, j_ref, z_ref, u_ref, lc_ref, xm_ref, jl_ref,
             jc_ref, lp_ref, cp_ref, s_ref, st_ref, xm_o, jl_o, jc_o,
             g_scr, t_scr, yl, cl, m_scr):
        dtype = m_ref.dtype
        actl, Dl = lp_ref[0], lp_ref[1]
        mu, fric, actc, Dc = cp_ref[0], cp_ref[1], cp_ref[2], cp_ref[3]
        # Capacitance-factor inverse, once per launch (see prologue note
        # in _make_block_kernel).
        linv = _tri_inv_lower(lc_ref[...], SB3, dtype)
        smat = s_ref[...]    # (nv, nlim) static limit scatter (signed)
        stmat = st_ref[...]  # (nlim, nv) its transpose

        def mdx_packed(dx):
            """M dx with m_ref in the packed arrow layout
            (nl+1, dm+nr, dm, LANES): per-limb block products + root
            border, assembled in the m_scr scratch."""
            xr = dx[0:nr, :]
            yr = jnp.sum(m_ref[nl, 0:nr, 0:nr, :] * xr[None, :, :],
                         axis=1)
            for li, (lo, d) in enumerate(zip(los, ds)):
                xl = dx[lo:lo + d, :]
                Dblk = m_ref[li, 0:dm, 0:d, :]        # (dm, d, L)
                ylv = jnp.sum(Dblk * xl[None, :, :], axis=1)  # (dm, L)
                Bblk = m_ref[li, dm:dm + nr, 0:d, :]  # (nr, d, L)
                ylb = jnp.sum(Bblk * xr[:, None, :], axis=0)  # (d, L)
                yr = yr + jnp.sum(Bblk * xl[None, :, :], axis=1)
                m_scr[0, lo:lo + d, :] = ylv[0:d, :] + ylb
            m_scr[0, 0:nr, :] = yr
            return m_scr[0]

        def mdx_dense(dx):
            return jnp.sum(m_ref[...] * dx[None, :, :], axis=1)

        mdx_fn = mdx_packed if packed_m else mdx_dense

        def one_iter(x, msm, jar_l, N, y1, y2):
            # Constraint forces at the carried jar values.
            f_l = jnp.where(jar_l < 0, -Dl * jar_l * actl, 0.0)
            r0, r1, r2 = _cone_residual_planes(N, y1, y2, mu, fric)
            Dact = Dc * actc
            f0, f1, f2 = -Dact * r0, -Dact * r1, -Dact * r2

            # Gradient g = msm - S f_lim - J^T f. The static limit
            # scatter rides the MXU as one small matmul (S is 0/+-1, so
            # HIGHEST keeps it bit-faithful) instead of nlim sequential
            # masked row adds.
            g = msm - jax.lax.dot(smat, f_l,
                                  precision=jax.lax.Precision.HIGHEST)
            frows = jnp.stack([f0, f1, f2], axis=1).reshape(3 * K, -1)
            g = g - jnp.sum(j_ref[...] * frows[:, None, :], axis=0)

            # Arrow substitution with the cached factor (VMEM-resident).
            g_scr[...] = g[None]
            solve_body(f_ref, g_scr, t_scr, yl, cl)
            t = t_scr[0]  # (nv, L)

            # Woodbury via the precomputed inverse: two contractions.
            Ut = jnp.sum(u_ref[...] * t[:, None, :], axis=0)  # (SB3, L)
            wv = jnp.sum(linv * Ut[None, :, :], axis=1)
            wb = jnp.sum(linv * wv[:, None, :], axis=0)
            dx = -(t - jnp.sum(z_ref[...] * wb[None, :, :], axis=1))

            # Line-search precomputes (M and J read once more from VMEM).
            mdx = mdx_fn(dx)  # (nv, L)
            jv = jnp.sum(j_ref[...] * dx[None, :, :], axis=1)   # (3K, L)
            jv3 = jv.reshape(K, 3, -1)
            jvn, jvt1, jvt2 = jv3[:, 0, :], jv3[:, 1, :], jv3[:, 2, :]
            jv_l = jax.lax.dot(stmat, dx,
                               precision=jax.lax.Precision.HIGHEST)
            sm0 = jnp.sum(msm * dx, axis=0, keepdims=True)
            smm = jnp.sum(dx * mdx, axis=0, keepdims=True)
            lim_planes = jnp.stack([jar_l, jv_l, actl, Dl])
            con_planes = jnp.stack([N, y1, y2, jvn, jvt1, jvt2,
                                    mu, fric, actc, Dc])
            alpha = _ls.search_planes(lim_planes, con_planes, sm0, smm,
                                      6, ls_iters)  # (1, L)
            return (x + alpha * dx, msm + alpha * mdx,
                    jar_l + alpha * jv_l, N + alpha * jvn,
                    y1 + alpha * jvt1, y2 + alpha * jvt2)

        st = (xm_ref[0], xm_ref[1], jl_ref[0],
              jc_ref[0], jc_ref[1], jc_ref[2])
        # All n_iters reuse iterations in ONE launch: the HBM->VMEM
        # transfer of F / M / J / Z / U / LC amortizes across the loop
        # (each separate launch previously paid ~1.75 ms mostly moving
        # those operands).
        for _ in range(n_iters):
            st = one_iter(*st)
        x, msm, jar_l, N, y1, y2 = st
        xm_o[...] = jnp.stack([x, msm])
        jl_o[...] = jar_l[None]
        jc_o[...] = jnp.stack([N, y1, y2])

    return body


@functools.lru_cache(maxsize=16)
def _fused_fn(part: _arrow.Part, K: int, SB3: int, nlim: int,
              lim_dof: tuple, lim_sign: tuple, ls_iters: int,
              n_iters: int = 1, packed_m: bool = False,
              interpret: bool = False):
    nv = part.nv
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    body = _make_kernel(part, K, SB3, nlim, lim_dof, lim_sign, ls_iters,
                        n_iters, packed_m)

    @jax.jit
    def run(F_t, M_t, J_t, Z_t, U_t, LC_t, xm_t, jl_t, jc_t, lp_t, cp_t,
            S_t, ST_t):
        B = M_t.shape[-1]
        grid = (B // LANES,)

        def spec(*shape):
            return pl.BlockSpec(shape + (LANES,),
                                lambda i: (0,) * len(shape) + (i,),
                                memory_space=pltpu.VMEM)

        def flat_spec(*shape):  # grid-invariant shared matrices
            return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        m_spec = (spec(nl + 1, dm + nr, dm) if packed_m
                  else spec(nv, nv))
        return pl.pallas_call(
            body,
            out_shape=(jax.ShapeDtypeStruct((2, nv, B), M_t.dtype),
                       jax.ShapeDtypeStruct((1, nlim, B), M_t.dtype),
                       jax.ShapeDtypeStruct((3, K, B), M_t.dtype)),
            grid=grid,
            in_specs=[spec(nl + 1, dm + nr, dm), m_spec,
                      spec(3 * K, nv), spec(nv, SB3), spec(nv, SB3),
                      spec(SB3, SB3), spec(2, nv), spec(1, nlim),
                      spec(3, K), spec(2, nlim), spec(4, K),
                      flat_spec(nv, nlim), flat_spec(nlim, nv)],
            out_specs=(spec(2, nv), spec(1, nlim), spec(3, K)),
            scratch_shapes=[pltpu.VMEM((1, nv, LANES), jnp.float32),
                            pltpu.VMEM((1, nv, LANES), jnp.float32),
                            pltpu.VMEM((nl, 1, dm, LANES), jnp.float32),
                            pltpu.VMEM((nl, 1, dm, LANES), jnp.float32),
                            pltpu.VMEM((1, nv, LANES), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(F_t, M_t, J_t, Z_t, U_t, LC_t, xm_t, jl_t, jc_t, lp_t, cp_t,
          S_t, ST_t)

    return run


def _scatter_mats(nv: int, lim_dof: tuple, lim_sign: tuple, dtype):
    """Static signed limit scatter matrix S (nv, nlim) with
    S[dof_i, i] = sign_i, and its transpose."""
    nlim = len(lim_dof)
    S = np.zeros((nv, nlim), np.float32)
    if nlim:
        S[np.array(lim_dof, np.int64), np.arange(nlim)] = np.array(
            lim_sign, np.float32)
    return jnp.asarray(S, dtype), jnp.asarray(S.T, dtype)


def _ref_step_n(part, lim_dof, lim_sign, ls_iters, n_iters, F, M, conJ,
                Z, U, LC, x, msm, jar_l, jar_c, lim_params, con_params):
    st = (x, msm, jar_l, jar_c)
    for _ in range(n_iters):
        st = _ref_step(part, lim_dof, lim_sign, ls_iters, F, M, conJ, Z,
                       U, LC, *st, lim_params, con_params)
    return st


def _ref_step(part, lim_dof, lim_sign, ls_iters, F, M, conJ, Z, U, LC,
              x, msm, jar_l, jar_c, lim_params, con_params):
    """Single-env jnp reference: same composition as the kernel."""
    import jax.scipy.linalg as jsl
    K = conJ.shape[0]
    dtype = x.dtype
    actl, Dl = lim_params[0], lim_params[1]
    mu, fric, actc, Dc = (con_params[0], con_params[1], con_params[2],
                          con_params[3])
    sign = jnp.asarray(np.array(lim_sign), dtype)
    dof = np.array(lim_dof, dtype=np.int64)

    f_l = jnp.where(jar_l < 0, -Dl * jar_l * actl, 0.0)
    r0, r1, r2 = _cone_residual_planes(
        jar_c[:, 0], jar_c[:, 1], jar_c[:, 2], mu, fric)
    Dact = Dc * actc
    f_c = jnp.stack([-Dact * r0, -Dact * r1, -Dact * r2], axis=1)
    g = msm.at[dof].add(-f_l * sign)
    g = g - jnp.sum(conJ * f_c[:, :, None], axis=(0, 1))

    t = _arrow.solve_ref(part, F, g)
    w = jsl.cho_solve((LC, True), U.T @ t)
    dx = -(t - Z @ w)

    mdx = (_arrow.matvec_packed(part, M, dx) if M.ndim == 3
           else jnp.sum(M * dx[None, :], axis=-1))
    jv_c = jnp.sum(conJ * dx[None, None, :], axis=-1)  # (K, 3)
    jv_l = dx[dof] * sign
    sm0 = jnp.dot(msm, dx)
    smm = jnp.dot(dx, mdx)
    lim = jnp.stack([jar_l, jv_l, actl, Dl])
    con = jnp.concatenate([jar_c.T, jv_c.T, mu[None], fric[None],
                           actc[None], Dc[None]])
    sc = jnp.stack([sm0[None], smm[None]])
    alpha = _ls.alpha_ref(lim, con, sc, 6, ls_iters)
    return (x + alpha * dx, msm + alpha * mdx, jar_l + alpha * jv_l,
            jar_c + alpha * jv_c)


def _make_block_kernel(part: _arrow.Part, K: int, SB3: int, nlim: int,
                       lim_dof: tuple, lim_sign: tuple, ls_iters: int,
                       n_iters: int):
    """Kernel body: ONE launch runs a whole Newton refactor block —
    packed-arrow factor of H, the SB3-RHS solve for the Woodbury Z,
    the (SB3, SB3) capacitance Cholesky, then n_iters full Newton
    iterations (gradient, substitution, Woodbury correction, exact line
    search, incremental state update) with every operand VMEM-resident.

    Z is carried in the solve kernel's (SB3, nv, L) layout and U is
    passed transposed as (SB3, nv) so the multi-RHS substitution writes
    Z directly."""
    nv = part.nv
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    los, ds = part.los, part.ds
    fbody = _arrow._make_factor_body(part, packed=True)
    solveZ = _arrow._make_solve_body(part, SB3)
    solve1 = _arrow._make_solve_body(part, 1)

    def body(hp_ref, m_ref, j_ref, u2_ref, xm_ref, jl_ref, jc_ref,
             lp_ref, cp_ref, s_ref, st_ref, xm_o, jl_o, jc_o,
             dw, bw, f_scr, z_scr, ylz, clz, g_scr, t_scr, yl1, cl1,
             lc_scr, m_scr):
        dtype = m_ref.dtype
        actl, Dl = lp_ref[0], lp_ref[1]
        mu, fric, actc, Dc = cp_ref[0], cp_ref[1], cp_ref[2], cp_ref[3]
        smat = s_ref[...]    # (nv, nlim) static limit scatter (signed)
        stmat = st_ref[...]  # (nlim, nv)

        # --- Prologue: factor H, solve Z, capacitance Cholesky.
        fbody(hp_ref, f_scr, dw, bw)
        solveZ(f_scr, u2_ref, z_scr, ylz, clz)  # z_scr: (SB3, nv, L)
        rows_c = jax.lax.broadcasted_iota(jnp.int32, (SB3, 1, 1), 0)
        cols_c = jax.lax.broadcasted_iota(jnp.int32, (1, SB3, 1), 1)
        eye_c = (rows_c == cols_c).astype(dtype)
        cw = jnp.concatenate([
            jnp.sum(u2_ref[a:a + 1, :, :] * z_scr[...], axis=1)[None]
            for a in range(SB3)], axis=0)  # (SB3, SB3, L) = U^T Z^T? no:
        # cw[a, b, :] = sum_v U2[a, v] Z[b, v] = (U^T A^-1 U)[a, b].
        cw = cw + eye_c * (1.0 + 1e-10)
        lc = jnp.zeros_like(cw)
        for k in range(SB3):
            dkk = cw[k:k + 1, k:k + 1, :]
            inv = jax.lax.rsqrt(jnp.maximum(dkk, 1e-30))
            c = jnp.where(rows_c >= k, cw[:, k:k + 1, :] * inv, 0.0)
            r = jnp.where(cols_c >= k, cw[k:k + 1, :, :] * inv, 0.0)
            lc = lc + c * (cols_c == k).astype(dtype)
            cw = cw - c * r
        # Invert LC once (SB3 steps); every iteration's pair of
        # triangular solves then collapses to two contractions.
        lc_scr[...] = _tri_inv_lower(lc, SB3, dtype)

        def mdx_packed(dx):
            xr = dx[0:nr, :]
            yr = jnp.sum(m_ref[nl, 0:nr, 0:nr, :] * xr[None, :, :],
                         axis=1)
            for li, (lo, d) in enumerate(zip(los, ds)):
                xl = dx[lo:lo + d, :]
                Dblk = m_ref[li, 0:dm, 0:d, :]
                ylv = jnp.sum(Dblk * xl[None, :, :], axis=1)
                Bblk = m_ref[li, dm:dm + nr, 0:d, :]
                ylb = jnp.sum(Bblk * xr[:, None, :], axis=0)
                yr = yr + jnp.sum(Bblk * xl[None, :, :], axis=1)
                m_scr[0, lo:lo + d, :] = ylv[0:d, :] + ylb
            m_scr[0, 0:nr, :] = yr
            return m_scr[0]

        def one_iter(x, msm, jar_l, N, y1, y2):
            f_l = jnp.where(jar_l < 0, -Dl * jar_l * actl, 0.0)
            r0, r1, r2 = _cone_residual_planes(N, y1, y2, mu, fric)
            Dact = Dc * actc
            f0, f1, f2 = -Dact * r0, -Dact * r1, -Dact * r2
            g = msm - jax.lax.dot(smat, f_l,
                                  precision=jax.lax.Precision.HIGHEST)
            frows = jnp.stack([f0, f1, f2], axis=1).reshape(3 * K, -1)
            g = g - jnp.sum(j_ref[...] * frows[:, None, :], axis=0)

            g_scr[...] = g[None]
            solve1(f_scr, g_scr, t_scr, yl1, cl1)
            t = t_scr[0]  # (nv, L)

            # Woodbury with the transposed layouts: Ut[a] = U2[a,:].t;
            # lc_scr holds LC^-1 from the prologue.
            Ut = jnp.sum(u2_ref[...] * t[None, :, :], axis=1)  # (SB3, L)
            wv = jnp.sum(lc_scr[...] * Ut[None, :, :], axis=1)
            wb = jnp.sum(lc_scr[...] * wv[:, None, :], axis=0)
            dx = -(t - jnp.sum(z_scr[...] * wb[:, None, :], axis=0))

            mdx = mdx_packed(dx)
            jv = jnp.sum(j_ref[...] * dx[None, :, :], axis=1)
            jv3 = jv.reshape(K, 3, -1)
            jvn, jvt1, jvt2 = jv3[:, 0, :], jv3[:, 1, :], jv3[:, 2, :]
            jv_l = jax.lax.dot(stmat, dx,
                               precision=jax.lax.Precision.HIGHEST)
            sm0 = jnp.sum(msm * dx, axis=0, keepdims=True)
            smm = jnp.sum(dx * mdx, axis=0, keepdims=True)
            lim_planes = jnp.stack([jar_l, jv_l, actl, Dl])
            con_planes = jnp.stack([N, y1, y2, jvn, jvt1, jvt2,
                                    mu, fric, actc, Dc])
            alpha = _ls.search_planes(lim_planes, con_planes, sm0, smm,
                                      6, ls_iters)
            return (x + alpha * dx, msm + alpha * mdx,
                    jar_l + alpha * jv_l, N + alpha * jvn,
                    y1 + alpha * jvt1, y2 + alpha * jvt2)

        st = (xm_ref[0], xm_ref[1], jl_ref[0],
              jc_ref[0], jc_ref[1], jc_ref[2])
        for _ in range(n_iters):
            st = one_iter(*st)
        x, msm, jar_l, N, y1, y2 = st
        xm_o[...] = jnp.stack([x, msm])
        jl_o[...] = jar_l[None]
        jc_o[...] = jnp.stack([N, y1, y2])

    return body


@functools.lru_cache(maxsize=32)
def _block_fn(part: _arrow.Part, K: int, SB3: int, nlim: int,
              lim_dof: tuple, lim_sign: tuple, ls_iters: int,
              n_iters: int, interpret: bool = False):
    nv = part.nv
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    body = _make_block_kernel(part, K, SB3, nlim, lim_dof, lim_sign,
                              ls_iters, n_iters)

    @jax.jit
    def run(Hp_t, M_t, J_t, U2_t, xm_t, jl_t, jc_t, lp_t, cp_t, S_t,
            ST_t):
        B = M_t.shape[-1]
        grid = (B // LANES,)

        def spec(*shape):
            return pl.BlockSpec(shape + (LANES,),
                                lambda i: (0,) * len(shape) + (i,),
                                memory_space=pltpu.VMEM)

        def flat_spec(*shape):
            return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        pk = spec(nl + 1, dm + nr, dm)
        return pl.pallas_call(
            body,
            out_shape=(jax.ShapeDtypeStruct((2, nv, B), M_t.dtype),
                       jax.ShapeDtypeStruct((1, nlim, B), M_t.dtype),
                       jax.ShapeDtypeStruct((3, K, B), M_t.dtype)),
            grid=grid,
            in_specs=[pk, pk, spec(3 * K, nv), spec(SB3, nv),
                      spec(2, nv), spec(1, nlim), spec(3, K),
                      spec(2, nlim), spec(4, K),
                      flat_spec(nv, nlim), flat_spec(nlim, nv)],
            out_specs=(spec(2, nv), spec(1, nlim), spec(3, K)),
            scratch_shapes=[
                pltpu.VMEM((nl, dm, dm, LANES), jnp.float32),
                pltpu.VMEM((max(nl, 1), max(nr, 1), dm, LANES),
                           jnp.float32),
                pltpu.VMEM((nl + 1, dm + nr, dm, LANES), jnp.float32),
                pltpu.VMEM((SB3, nv, LANES), jnp.float32),
                pltpu.VMEM((nl, SB3, dm, LANES), jnp.float32),
                pltpu.VMEM((nl, SB3, dm, LANES), jnp.float32),
                pltpu.VMEM((1, nv, LANES), jnp.float32),
                pltpu.VMEM((1, nv, LANES), jnp.float32),
                pltpu.VMEM((nl, 1, dm, LANES), jnp.float32),
                pltpu.VMEM((nl, 1, dm, LANES), jnp.float32),
                pltpu.VMEM((SB3, SB3, LANES), jnp.float32),
                pltpu.VMEM((1, nv, LANES), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(Hp_t, M_t, J_t, U2_t, xm_t, jl_t, jc_t, lp_t, cp_t, S_t, ST_t)

    return run


def _ref_block(part, lim_dof, lim_sign, ls_iters, n_iters, Hp, M, conJ,
               U, x, msm, jar_l, jar_c, lim_params, con_params):
    """Single-env jnp reference for the block kernel: factor + Z + LC
    prologue, then n_iters chained reference steps. U: (nv, SB3)."""
    SB3 = U.shape[-1]
    F = _arrow.factor_ref_p(part, Hp)
    Z = _arrow.solve_ref(part, F, U)
    C = jnp.eye(SB3, dtype=U.dtype) + U.T @ Z
    LC = jnp.linalg.cholesky(C + 1e-10 * jnp.eye(SB3, dtype=U.dtype))
    return _ref_step_n(part, lim_dof, lim_sign, ls_iters, n_iters, F, M,
                       conJ, Z, U, LC, x, msm, jar_l, jar_c, lim_params,
                       con_params)


@functools.lru_cache(maxsize=32)
def make_newton_block_pe(part: _arrow.Part, lim_dof: tuple,
                         lim_sign: tuple, ls_iters: int, n_iters: int,
                         interpret: bool = False):
    """Per-env whole-Newton-block op (packed H and M only);
    pallas-batched under vmap on TPU.

    Per-env args: Hp/M packed (nl+1, dm+nr, dm), conJ (K, 3, nv),
    U (nv, 3SB) Woodbury columns, x/msm (nv,), jar_l (L,), jar_c (K, 3),
    lim_params (2, L), con_params (4, K). Returns the updated
    (x, msm, jar_l, jar_c) after n_iters Newton iterations on the fresh
    factor."""
    nlim = len(lim_dof)

    @custom_batching.custom_vmap
    def f(Hp, M, conJ, U, x, msm, jar_l, jar_c, lim_params, con_params):
        return _ref_block(part, lim_dof, lim_sign, ls_iters, n_iters,
                          Hp, M, conJ, U, x, msm, jar_l, jar_c,
                          lim_params, con_params)

    @f.def_vmap
    def _rule(axis_size, in_batched, Hp, M, conJ, U, x, msm, jar_l,
              jar_c, lim_params, con_params):
        del axis_size
        args = (Hp, M, conJ, U, x, msm, jar_l, jar_c, lim_params,
                con_params)
        if not all(in_batched) or not (_use_pallas() or interpret):
            axes = [0 if b else None for b in in_batched]
            out = jax.vmap(lambda *a: _ref_block(
                part, lim_dof, lim_sign, ls_iters, n_iters, *a),
                in_axes=axes)(*args)
            return out, (True, True, True, True)
        B = M.shape[0]
        K = conJ.shape[1]
        SB3 = U.shape[-1]
        pad = (-B) % LANES

        def tol(v):
            v = jnp.moveaxis(v, 0, -1)
            if pad:
                fill = jnp.zeros(v.shape[:-1] + (pad,), v.dtype)
                v = jnp.concatenate([v, fill], axis=-1)
            return v

        Hp_t = tol(Hp)
        if pad:  # dead lanes factor an identity
            Hp_t = Hp_t.at[..., B:].set(
                _arrow._identity_packed(part, Hp.dtype))
        M_t = tol(M)
        J_t = tol(conJ.reshape(B, 3 * K, -1))
        U2_t = tol(jnp.swapaxes(U, 1, 2))  # (SB3, nv, B)
        xm_t = tol(jnp.stack([x, msm], axis=1))
        jl_t = tol(jar_l)[None]
        jc_t = tol(jnp.swapaxes(jar_c, 1, 2))
        lp_t = tol(lim_params)
        cp_t = tol(con_params)
        run = _block_fn(part, K, SB3, nlim, lim_dof, lim_sign, ls_iters,
                        n_iters, interpret)
        S_t, ST_t = _scatter_mats(part.nv, lim_dof, lim_sign, M.dtype)
        xm_o, jl_o, jc_o = run(Hp_t, M_t, J_t, U2_t, xm_t, jl_t, jc_t,
                               lp_t, cp_t, S_t, ST_t)

        def fro(v):
            return jnp.moveaxis(v[..., :B], -1, 0)

        xm = fro(xm_o)
        return (xm[:, 0], xm[:, 1], fro(jl_o)[:, 0],
                jnp.swapaxes(fro(jc_o), 1, 2)), (True, True, True, True)

    return f


@functools.lru_cache(maxsize=16)
def make_reuse_pe(part: _arrow.Part, lim_dof: tuple, lim_sign: tuple,
                  ls_iters: int, n_iters: int = 1,
                  interpret: bool = False):
    """Per-env fused Newton reuse step (n_iters iterations in ONE
    launch); pallas-batched under vmap on TPU.

    Per-env args: F (packed arrow factor), M (nv, nv), conJ (K, 3, nv),
    Z/U (nv, 3SB), LC (3SB, 3SB), x/msm (nv,), jar_l (L,), jar_c (K, 3),
    lim_params (2, L) [active | D], con_params (4, K)
    [mu | frictional | active | D]. Returns the updated
    (x, msm, jar_l, jar_c)."""
    nlim = len(lim_dof)

    @custom_batching.custom_vmap
    def f(F, M, conJ, Z, U, LC, x, msm, jar_l, jar_c, lim_params,
          con_params):
        return _ref_step_n(part, lim_dof, lim_sign, ls_iters, n_iters,
                           F, M, conJ, Z, U, LC, x, msm, jar_l, jar_c,
                           lim_params, con_params)

    @f.def_vmap
    def _rule(axis_size, in_batched, F, M, conJ, Z, U, LC, x, msm,
              jar_l, jar_c, lim_params, con_params):
        del axis_size
        args = (F, M, conJ, Z, U, LC, x, msm, jar_l, jar_c, lim_params,
                con_params)
        if not all(in_batched) or not (_use_pallas() or interpret):
            axes = [0 if b else None for b in in_batched]
            out = jax.vmap(lambda *a: _ref_step_n(
                part, lim_dof, lim_sign, ls_iters, n_iters, *a),
                in_axes=axes)(*args)
            return out, (True, True, True, True)
        B = M.shape[0]
        K = conJ.shape[1]
        SB3 = Z.shape[-1]
        pad = (-B) % LANES

        def tol(v, pad_val=0.0):
            v = jnp.moveaxis(v, 0, -1)
            if pad:
                fill = jnp.full(v.shape[:-1] + (pad,), pad_val, v.dtype)
                v = jnp.concatenate([v, fill], axis=-1)
            return v

        F_t = tol(F)
        if pad:  # dead lanes need a valid (identity) factor + LC diag
            F_t = F_t.at[..., B:].set(
                _arrow._identity_factor(part, F.dtype))
        M_t = tol(M)
        J_t = tol(conJ.reshape(B, 3 * K, -1))
        Z_t = tol(Z)
        U_t = tol(U)
        LC_t = tol(LC)
        if pad:
            eye = jnp.eye(SB3, dtype=LC.dtype)[:, :, None]
            LC_t = LC_t.at[..., B:].set(eye)
        xm_t = tol(jnp.stack([x, msm], axis=1))
        jl_t = tol(jar_l)[None]  # (1, nlim, B)
        jc_t = tol(jnp.swapaxes(jar_c, 1, 2))  # (3, K, B)
        lp_t = tol(lim_params)
        cp_t = tol(con_params)
        run = _fused_fn(part, K, SB3, nlim, lim_dof, lim_sign, ls_iters,
                        n_iters, M.ndim == 4, interpret)
        S_t, ST_t = _scatter_mats(part.nv, lim_dof, lim_sign, M.dtype)
        xm_o, jl_o, jc_o = run(F_t, M_t, J_t, Z_t, U_t, LC_t, xm_t,
                               jl_t, jc_t, lp_t, cp_t, S_t, ST_t)

        def fro(v):
            return jnp.moveaxis(v[..., :B], -1, 0)

        xm = fro(xm_o)
        return (xm[:, 0], xm[:, 1], fro(jl_o)[:, 0],
                jnp.swapaxes(fro(jc_o), 1, 2)), (True, True, True, True)

    return f


# ------------------------------------------------------- full block kernel
# The block kernel above still receives a PRE-ASSEMBLED Hessian and
# Woodbury columns from XLA: per-env (108, 72)x(72, 108) JTJH GEMMs,
# one-hot gathers and packing, all batched tiny matmuls that serialize
# on the MXU (~12 ms of the bench substep's Newton cost, measured
# 2026-08-19). The "full" variant moves that assembly INTO the kernel:
# the cone Hessian, the packed JTJH columns, the limit diagonal and the
# Woodbury G/U2 operands are built from J / jar / params planes already
# VMEM-resident, so XLA contributes only the tiny top-k row selection.


def _cone_hessian_planes(N, y1, y2, mu, fric, act):
    """Elliptic-cone Hessian I - dP on (rows, lanes) planes: the six
    unique entries of the symmetric 3x3 per-row blocks (same math as
    physics/solver._cone_hessian)."""
    a = 1.0 / jnp.maximum(mu, 1e-6)
    c = 1.0 / (1.0 + a * a)
    T = jnp.sqrt(y1 * y1 + y2 * y2)
    safe_T = jnp.maximum(T, 1e-15)
    yh1, yh2 = y1 / safe_T, y2 / safe_T
    w = (N + a * T) * c
    awt = a * w / safe_T
    one = jnp.ones_like(N)
    zero = jnp.zeros_like(N)
    H00 = one - c
    H01 = -(a * c) * yh1
    H02 = -(a * c) * yh2
    H11 = one - (a * a * c) * yh1 * yh1 - awt * (one - yh1 * yh1)
    H12 = (awt - a * a * c) * yh1 * yh2
    H22 = one - (a * a * c) * yh2 * yh2 - awt * (one - yh2 * yh2)
    bottom = mu * N + T <= 0.0
    H00 = jnp.where(bottom, one, H00)
    H11 = jnp.where(bottom, one, H11)
    H22 = jnp.where(bottom, one, H22)
    H01 = jnp.where(bottom, zero, H01)
    H02 = jnp.where(bottom, zero, H02)
    H12 = jnp.where(bottom, zero, H12)
    top = N >= mu * T
    planes = [jnp.where(top, zero, h)
              for h in (H00, H01, H02, H11, H12, H22)]
    H00, H01, H02, H11, H12, H22 = planes
    fr = fric > 0
    H00 = jnp.where(fr, H00, (N < 0).astype(N.dtype))
    H01 = jnp.where(fr, H01, zero)
    H02 = jnp.where(fr, H02, zero)
    H11 = jnp.where(fr, H11, zero)
    H12 = jnp.where(fr, H12, zero)
    H22 = jnp.where(fr, H22, zero)
    return tuple(h * act for h in (H00, H01, H02, H11, H12, H22))


def _chol3_planes(W00, W01, W02, W11, W12, W22):
    """Closed-form lower Cholesky of PSD 3x3 blocks on planes (same
    zero-pivot semantics as physics/solver._chol3_psd: inactive blocks
    factor to zero rows and drop out of the Woodbury term)."""
    w11 = jnp.maximum(W00, 0.0)
    a = jnp.sqrt(w11)
    ia = jnp.where(a > 1e-12, 1.0 / jnp.maximum(a, 1e-30), 0.0)
    b = W01 * ia
    c = W02 * ia
    d = jnp.sqrt(jnp.maximum(W11 - b * b, 0.0))
    idd = jnp.where(d > 1e-12, 1.0 / jnp.maximum(d, 1e-30), 0.0)
    e = (W12 - c * b) * idd
    f = jnp.sqrt(jnp.maximum(W22 - c * c - e * e, 0.0))
    return a, b, c, d, e, f


def _make_block_full_kernel(part: _arrow.Part, K: int, SB: int,
                            nlim: int, lim_dof: tuple, lim_sign: tuple,
                            ls_iters: int, n_iters: int,
                            whole_solve: bool = False):
    """whole_solve=False: one refactor block over carried state
    (x, msm, jar_l, jar_c planes in / out).

    whole_solve=True: the ENTIRE solver.solve in one launch —
    MuJoCo-style warmstart selection (primal-cost argmin over
    {warmstart, a_free}), jar/msm initialization, Hessian/Woodbury
    assembly, n_iters Newton iterations, and the final constraint
    forces + qfrc_constraint = S f_l + J^T f_c. Inputs repurposed:
    xm_ref = [a_free, warmstart], lp_ref = (3, nlim) [act, D, aref],
    cp_ref = (8, K) [mu | fric | act | D | hess_act | aref_n/t1/t2];
    outputs xm_o = [qacc, qfrc], jl_o = f_l, jc_o = f_c planes. This
    removes every XLA-side pass over con_J in solve(): the warmstart
    cost comparison, init_state and the final J^T f contraction each
    re-read the (B, K, 3, nv) Jacobian from HBM (~255 MB at batch
    8192)."""
    nv = part.nv
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    los, ds = part.los, part.ds
    scratch_order, groups = _width_groups(los, ds)
    SB3 = 3 * SB
    fbody = _arrow._make_factor_body(part, packed=True)
    solveZ = _arrow._make_solve_body(part, SB3)
    solve1 = _arrow._make_solve_body(part, 1)

    def body(mp_ref, j_ref, ohb_ref, xm_ref, jl_ref, jc_ref, lp_ref,
             cp_ref, s_ref, st_ref, xm_o, jl_o, jc_o,
             jh_scr, hp_scr, u2_scr, dw, bw, f_scr, z_scr, ylz, clz,
             g_scr, t_scr, yl1, cl1, lc_scr, m_scr, jg_scr, jhg_scr,
             hdg_scr):
        dtype = mp_ref.dtype
        actl, Dl = lp_ref[0], lp_ref[1]
        mu, fric, actc, Dc, hact = (cp_ref[0], cp_ref[1], cp_ref[2],
                                    cp_ref[3], cp_ref[4])
        smat = s_ref[...]
        stmat = st_ref[...]

        def mdx_packed(dx):
            xr = dx[0:nr, :]
            yr = jnp.sum(mp_ref[nl, 0:nr, 0:nr, :] * xr[None, :, :],
                         axis=1)
            for li, (lo, d) in enumerate(zip(los, ds)):
                xl = dx[lo:lo + d, :]
                Dblk = mp_ref[li, 0:dm, 0:d, :]
                ylv = jnp.sum(Dblk * xl[None, :, :], axis=1)
                Bblk = mp_ref[li, dm:dm + nr, 0:d, :]
                ylb = jnp.sum(Bblk * xr[:, None, :], axis=0)
                yr = yr + jnp.sum(Bblk * xl[None, :, :], axis=1)
                m_scr[0, lo:lo + d, :] = ylv[0:d, :] + ylb
            m_scr[0, 0:nr, :] = yr
            return m_scr[0]

        if whole_solve:
            # Input reinterpretation (same specs as the block form):
            # xm_ref = [a_free, warmstart], jl_ref = lim aref planes,
            # jc_ref = contact aref planes.
            arefl = jl_ref[0]
            an, at1, at2 = jc_ref[0], jc_ref[1], jc_ref[2]
            a_free = xm_ref[0]
            ws = xm_ref[1]

            def jar_of(xv):
                jl = jax.lax.dot(
                    stmat, xv,
                    precision=jax.lax.Precision.HIGHEST) - arefl
                jv = jnp.sum(j_ref[...] * xv[None, :, :], axis=1)
                jv3 = jv.reshape(K, 3, -1)
                return (jl, jv3[:, 0, :] - an, jv3[:, 1, :] - at1,
                        jv3[:, 2, :] - at2)

            def con_cost(jl, N, y1, y2, smooth):
                cl = 0.5 * jnp.sum(
                    Dl * actl * (jl < 0.0) * jl * jl, axis=0)
                r0, r1, r2 = _cone_residual_planes(N, y1, y2, mu, fric)
                cc = 0.5 * jnp.sum(
                    Dc * actc * (r0 * r0 + r1 * r1 + r2 * r2), axis=0)
                return smooth + cl + cc

            jl_w, Nw, y1w, y2w = jar_of(ws)
            mdw = mdx_packed(ws - a_free)
            c_ws = con_cost(jl_w, Nw, y1w, y2w,
                            0.5 * jnp.sum((ws - a_free) * mdw, axis=0))
            jl_a, Na, y1a, y2a = jar_of(a_free)
            c_af = con_cost(jl_a, Na, y1a, y2a, 0.0)
            use_ws = c_ws < c_af  # (L,)
            x0 = jnp.where(use_ws[None, :], ws, a_free)
            msm0 = jnp.where(use_ws[None, :], mdw,
                             jnp.zeros_like(mdw))
            jar_l0 = jnp.where(use_ws[None, :], jl_w, jl_a)
            N0 = jnp.where(use_ws[None, :], Nw, Na)
            y10 = jnp.where(use_ws[None, :], y1w, y1a)
            y20 = jnp.where(use_ws[None, :], y2w, y2a)
        else:
            jar_l0 = jl_ref[0]
            N0, y10, y20 = jc_ref[0], jc_ref[1], jc_ref[2]

        # --- Hessian assembly (JH rows, packed JTJH columns, limit
        # diagonal), all VMEM-resident.
        W00, W01, W02, W11, W12, W22 = _cone_hessian_planes(
            N0, y10, y20, mu, fric, hact)
        W00, W01, W02 = W00 * Dc, W01 * Dc, W02 * Dc
        W11, W12, W22 = W11 * Dc, W12 * Dc, W22 * Dc
        Jv = j_ref[...].reshape(K, 3, nv, -1)
        J0, J1, J2 = Jv[:, 0], Jv[:, 1], Jv[:, 2]  # (K, nv, L)
        jh0 = (W00[:, None, :] * J0 + W01[:, None, :] * J1
               + W02[:, None, :] * J2)
        jh1 = (W01[:, None, :] * J0 + W11[:, None, :] * J1
               + W12[:, None, :] * J2)
        jh2 = (W02[:, None, :] * J0 + W12[:, None, :] * J1
               + W22[:, None, :] * J2)
        jh_scr[...] = jnp.stack([jh0, jh1, jh2],
                                axis=1).reshape(3 * K, nv, -1)

        hd = Dl * actl * (jar_l0 < 0.0)
        sabs = smat * smat  # entries are 0/+-1: |S| scatters the diag
        hd_dof = jax.lax.dot(
            sabs, hd, precision=jax.lax.Precision.HIGHEST) + 1e-12

        # NOTE: every ref slice below keeps ranges (b:b+1) and >=3 dims —
        # integer indexing of NON-leading ref dims and 1-D (lanes-only)
        # ref reads/writes silently corrupt on Mosaic (observed
        # 2026-08-19: finite-but-wrong hp, then NaN at the factor).
        #
        # Grouped packed-JTJH assembly (round 5): limbs with equal
        # width d are contracted SIMULTANEOUSLY from width-grouped
        # scratch copies of J / JH — sum(distinct widths) + nr (~35 for
        # the fly partition) sequential VPU ops instead of the per-dof
        # sum(ds) + nr (~108) chain, with zero padding waste (groups
        # are exact-width). The per-dof form was the round-4 regression
        # that gave back the whole-solve kernel's bench win.
        hp_scr[...] = mp_ref[...]
        jh_all = jh_scr[...]
        for p_row, li in enumerate(scratch_order):
            lo, d = los[li], ds[li]
            jg_scr[:, p_row:p_row + 1, 0:d, :] = jnp.expand_dims(
                j_ref[:, lo:lo + d, :], 1)
            jhg_scr[:, p_row:p_row + 1, 0:d, :] = jnp.expand_dims(
                jh_all[:, lo:lo + d, :], 1)
        hdg_scr[...] = jnp.zeros((nl + 1, dm, hd_dof.shape[-1]), dtype)
        for li, (lo, d) in enumerate(zip(los, ds)):
            hdg_scr[li:li + 1, 0:d, :] = jnp.expand_dims(
                hd_dof[lo:lo + d, :], 0)
        if nr:
            hdg_scr[nl:nl + 1, 0:nr, :] = jnp.expand_dims(
                hd_dof[0:nr, :], 0)
            jhR = jnp.expand_dims(jh_all[:, 0:nr, :], 1)  # (3K,1,nr,L)
        for s0, d, runs in groups:
            n = sum(r[2] for r in runs)
            jhg = jhg_scr[:, s0:s0 + n, 0:d, :]  # (3K, n, d, L)
            for b in range(d):
                jcol = jg_scr[:, s0:s0 + n, b:b + 1, :]  # (3K,n,1,L)
                acc = jnp.sum(jhg * jcol, axis=0)  # (n, d, L)
                if nr:
                    accB = jnp.sum(jhR * jcol, axis=0)  # (n, nr, L)
                for li0, p0, rl in runs:
                    o = p0 - s0
                    hp_scr[li0:li0 + rl, 0:d, b:b + 1, :] = (
                        hp_scr[li0:li0 + rl, 0:d, b:b + 1, :]
                        + jnp.expand_dims(acc[o:o + rl], 2))
                    if nr:
                        hp_scr[li0:li0 + rl, dm:dm + nr,
                               b:b + 1, :] = (
                            hp_scr[li0:li0 + rl, dm:dm + nr, b:b + 1, :]
                            + jnp.expand_dims(accB[o:o + rl], 2))
        for b in range(nr):
            jcol = j_ref[:, b:b + 1, :]
            accR = jnp.sum(jh_all[:, 0:nr, :] * jcol,
                           axis=0)[:, None, :]
            hp_scr[nl, 0:nr, b:b + 1, :] = (
                hp_scr[nl, 0:nr, b:b + 1, :] + accR)
        # Limit diagonal for ALL blocks at once per dof column (hdg
        # rows are zero past each limb's width, so over-wide adds are
        # no-ops; the root block rides row nl).
        for b in range(dm):
            hp_scr[:, b:b + 1, b:b + 1, :] = (
                hp_scr[:, b:b + 1, b:b + 1, :]
                + jnp.expand_dims(hdg_scr[:, b:b + 1, :], 2))

        # --- Woodbury operands from the selected breaking rows.
        ohb = ohb_ref[...]  # (SB, K, L)

        def sel(p):
            return jnp.sum(ohb * p[None, :, :], axis=1)  # (SB, L)

        jb0, jb1, jb2 = sel(N0), sel(y10), sel(y20)
        mub, fricb, Db = sel(mu), sel(fric), sel(Dc)
        actb = sel(actc - hact)  # = ohb @ (con_break * con_active)
        V00, V01, V02, V11, V12, V22 = _cone_hessian_planes(
            jb0, jb1, jb2, mub, fricb, actb)
        ga, gb, gc, gd, ge, gf = _chol3_planes(
            V00 * Db, V01 * Db, V02 * Db, V11 * Db, V12 * Db, V22 * Db)
        for s in range(SB):
            oh_s = jnp.swapaxes(ohb[s:s + 1], 0, 1)  # (K, 1, L)
            vb0 = jnp.sum(J0 * oh_s, axis=0)  # (nv, L)
            vb1 = jnp.sum(J1 * oh_s, axis=0)
            vb2 = jnp.sum(J2 * oh_s, axis=0)
            u2_scr[3 * s + 0] = (ga[s:s + 1] * vb0 + gb[s:s + 1] * vb1
                                 + gc[s:s + 1] * vb2)
            u2_scr[3 * s + 1] = gd[s:s + 1] * vb1 + ge[s:s + 1] * vb2
            u2_scr[3 * s + 2] = gf[s:s + 1] * vb2

        # --- Factor, Z, capacitance (as in the block kernel).
        fbody(hp_scr, f_scr, dw, bw)
        solveZ(f_scr, u2_scr, z_scr, ylz, clz)
        rows_c = jax.lax.broadcasted_iota(jnp.int32, (SB3, 1, 1), 0)
        cols_c = jax.lax.broadcasted_iota(jnp.int32, (1, SB3, 1), 1)
        eye_c = (rows_c == cols_c).astype(dtype)
        cw = jnp.concatenate([
            jnp.sum(u2_scr[a:a + 1, :, :] * z_scr[...], axis=1)[None]
            for a in range(SB3)], axis=0)
        cw = cw + eye_c * (1.0 + 1e-10)
        lc = jnp.zeros_like(cw)
        for k in range(SB3):
            dkk = cw[k:k + 1, k:k + 1, :]
            inv = jax.lax.rsqrt(jnp.maximum(dkk, 1e-30))
            c = jnp.where(rows_c >= k, cw[:, k:k + 1, :] * inv, 0.0)
            r = jnp.where(cols_c >= k, cw[k:k + 1, :, :] * inv, 0.0)
            lc = lc + c * (cols_c == k).astype(dtype)
            cw = cw - c * r
        lc_scr[...] = _tri_inv_lower(lc, SB3, dtype)

        def one_iter(x, msm, jar_l, N, y1, y2):
            f_l = jnp.where(jar_l < 0, -Dl * jar_l * actl, 0.0)
            r0, r1, r2 = _cone_residual_planes(N, y1, y2, mu, fric)
            Dact = Dc * actc
            f0, f1, f2 = -Dact * r0, -Dact * r1, -Dact * r2
            g = msm - jax.lax.dot(smat, f_l,
                                  precision=jax.lax.Precision.HIGHEST)
            frows = jnp.stack([f0, f1, f2], axis=1).reshape(3 * K, -1)
            g = g - jnp.sum(j_ref[...] * frows[:, None, :], axis=0)

            g_scr[...] = g[None]
            solve1(f_scr, g_scr, t_scr, yl1, cl1)
            t = t_scr[0]

            Ut = jnp.sum(u2_scr[...] * t[None, :, :], axis=1)
            wv = jnp.sum(lc_scr[...] * Ut[None, :, :], axis=1)
            wb = jnp.sum(lc_scr[...] * wv[:, None, :], axis=0)
            dx = -(t - jnp.sum(z_scr[...] * wb[:, None, :], axis=0))

            mdx = mdx_packed(dx)
            jv = jnp.sum(j_ref[...] * dx[None, :, :], axis=1)
            jv3 = jv.reshape(K, 3, -1)
            jvn, jvt1, jvt2 = jv3[:, 0, :], jv3[:, 1, :], jv3[:, 2, :]
            jv_l = jax.lax.dot(stmat, dx,
                               precision=jax.lax.Precision.HIGHEST)
            sm0 = jnp.sum(msm * dx, axis=0, keepdims=True)
            smm = jnp.sum(dx * mdx, axis=0, keepdims=True)
            lim_planes = jnp.stack([jar_l, jv_l, actl, Dl])
            con_planes = jnp.stack([N, y1, y2, jvn, jvt1, jvt2,
                                    mu, fric, actc, Dc])
            alpha = _ls.search_planes(lim_planes, con_planes, sm0, smm,
                                      6, ls_iters)
            return (x + alpha * dx, msm + alpha * mdx,
                    jar_l + alpha * jv_l, N + alpha * jvn,
                    y1 + alpha * jvt1, y2 + alpha * jvt2)

        if whole_solve:
            st = (x0, msm0, jar_l0, N0, y10, y20)
        else:
            st = (xm_ref[0], xm_ref[1], jar_l0, N0, y10, y20)
        for _ in range(n_iters):
            st = one_iter(*st)
        x, msm, jar_l, N, y1, y2 = st
        if whole_solve:
            # Final constraint forces + qfrc = S f_l + J^T f_c (same
            # math as solver.forces_from / the solve() tail).
            f_l = jnp.where(jar_l < 0, -Dl * jar_l * actl, 0.0)
            r0, r1, r2 = _cone_residual_planes(N, y1, y2, mu, fric)
            Dact = Dc * actc
            f0, f1, f2 = -Dact * r0, -Dact * r1, -Dact * r2
            frows = jnp.stack([f0, f1, f2], axis=1).reshape(3 * K, -1)
            qfrc = (jax.lax.dot(smat, f_l,
                                precision=jax.lax.Precision.HIGHEST)
                    + jnp.sum(j_ref[...] * frows[:, None, :], axis=0))
            xm_o[...] = jnp.stack([x, qfrc])
            jl_o[...] = f_l[None]
            jc_o[...] = jnp.stack([f0, f1, f2])
        else:
            xm_o[...] = jnp.stack([x, msm])
            jl_o[...] = jar_l[None]
            jc_o[...] = jnp.stack([N, y1, y2])
    return body


@functools.lru_cache(maxsize=32)
def _block_full_fn(part: _arrow.Part, K: int, SB: int, nlim: int,
                   lim_dof: tuple, lim_sign: tuple, ls_iters: int,
                   n_iters: int, interpret: bool = False,
                   whole_solve: bool = False, lanes: int = LANES):
    nv = part.nv
    nl, dm, nr = len(part.ds), part.dmax, part.nr
    SB3 = 3 * SB
    LANES = lanes  # noqa: N806 — this kernel is per-op overhead bound
    # (measured 230us/grid-step vs ~30us of FLOPs, round 5); wider lane
    # blocks amortize the fixed per-op cost across more envs.
    body = _make_block_full_kernel(part, K, SB, nlim, lim_dof, lim_sign,
                                   ls_iters, n_iters,
                                   whole_solve=whole_solve)

    @jax.jit
    def run(Mp_t, J_t, ohb_t, xm_t, jl_t, jc_t, lp_t, cp_t, S_t, ST_t):
        B = Mp_t.shape[-1]
        grid = (B // LANES,)

        def spec(*shape):
            return pl.BlockSpec(shape + (LANES,),
                                lambda i: (0,) * len(shape) + (i,),
                                memory_space=pltpu.VMEM)

        def flat_spec(*shape):
            return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        pk = spec(nl + 1, dm + nr, dm)
        return pl.pallas_call(
            body,
            out_shape=(jax.ShapeDtypeStruct((2, nv, B), Mp_t.dtype),
                       jax.ShapeDtypeStruct((1, nlim, B), Mp_t.dtype),
                       jax.ShapeDtypeStruct((3, K, B), Mp_t.dtype)),
            grid=grid,
            in_specs=[pk, spec(3 * K, nv), spec(SB, K),
                      spec(2, nv), spec(1, nlim), spec(3, K),
                      spec(2, nlim), spec(5, K),
                      flat_spec(nv, nlim), flat_spec(nlim, nv)],
            out_specs=(spec(2, nv), spec(1, nlim), spec(3, K)),
            scratch_shapes=[
                pltpu.VMEM((3 * K, nv, LANES), jnp.float32),     # jh
                pltpu.VMEM((nl + 1, dm + nr, dm, LANES),
                           jnp.float32),                          # hp
                pltpu.VMEM((SB3, nv, LANES), jnp.float32),        # u2
                pltpu.VMEM((nl, dm, dm, LANES), jnp.float32),     # dw
                pltpu.VMEM((max(nl, 1), max(nr, 1), dm, LANES),
                           jnp.float32),                          # bw
                pltpu.VMEM((nl + 1, dm + nr, dm, LANES),
                           jnp.float32),                          # f
                pltpu.VMEM((SB3, nv, LANES), jnp.float32),        # z
                pltpu.VMEM((nl, SB3, dm, LANES), jnp.float32),    # ylz
                pltpu.VMEM((nl, SB3, dm, LANES), jnp.float32),    # clz
                pltpu.VMEM((1, nv, LANES), jnp.float32),          # g
                pltpu.VMEM((1, nv, LANES), jnp.float32),          # t
                pltpu.VMEM((nl, 1, dm, LANES), jnp.float32),      # yl1
                pltpu.VMEM((nl, 1, dm, LANES), jnp.float32),      # cl1
                pltpu.VMEM((SB3, SB3, LANES), jnp.float32),       # lc
                pltpu.VMEM((1, nv, LANES), jnp.float32),          # m
                pltpu.VMEM((3 * K, nl, dm, LANES), jnp.float32),  # jg
                pltpu.VMEM((3 * K, nl, dm, LANES), jnp.float32),  # jhg
                pltpu.VMEM((nl + 1, dm, LANES), jnp.float32)],    # hdg
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
            interpret=interpret,
        )(Mp_t, J_t, ohb_t, xm_t, jl_t, jc_t, lp_t, cp_t, S_t, ST_t)

    return run


def _ref_block_full(part, lim_dof, lim_sign, ls_iters, n_iters, Mp,
                    conJ, ohb, x, msm, jar_l, jar_c, lim_params,
                    con_params):
    """Single-env jnp reference: Hessian/Woodbury assembly (same math as
    physics/solver.fresh_step_arrow's prologue) + the block reference."""
    from flybody_tpu.physics import solver as _sol
    mu, fric, actc, Dc, hact = (con_params[0], con_params[1],
                                con_params[2], con_params[3],
                                con_params[4])
    actl, Dl = lim_params[0], lim_params[1]
    K, _, nv = conJ.shape
    Hc = _sol._cone_hessian(jar_c, mu, fric, hact) * Dc[:, None, None]
    JH = jnp.einsum('kij,kjv->kiv', Hc, conJ)
    JTJH = jnp.einsum('kiv,kiw->vw', conJ, JH)
    hd = Dl * actl * (jar_l < 0)
    dof = np.array(lim_dof, dtype=np.int64)
    hd_dof = jnp.zeros(nv, x.dtype).at[dof].add(hd)
    Hp = Mp + _arrow.pack_sym_ref(part, JTJH, pad_identity=False)
    Hp = _arrow.add_diag_packed(part, Hp, hd_dof + 1e-12)
    jar_b = ohb @ jar_c
    mub, fricb, Db = ohb @ mu, ohb @ fric, ohb @ Dc
    actb = ohb @ (actc - hact)
    Wb = _sol._cone_hessian(jar_b, mub, fricb, actb) * Db[:, None, None]
    G = _sol._chol3_psd(Wb)
    Vb = (ohb @ conJ.reshape(K, 3 * nv)).reshape(-1, 3, nv)
    Vt = jnp.sum(G[:, :, :, None] * Vb[:, :, None, :], axis=1)
    U = Vt.reshape(-1, nv).T
    return _ref_block(part, lim_dof, lim_sign, ls_iters, n_iters, Hp,
                      Mp, conJ, U, x, msm, jar_l, jar_c, lim_params,
                      con_params)


@functools.lru_cache(maxsize=32)
def make_newton_block_full_pe(part: _arrow.Part, lim_dof: tuple,
                              lim_sign: tuple, ls_iters: int,
                              n_iters: int, interpret: bool = False):
    """Per-env whole-Newton-block op INCLUDING Hessian/Woodbury assembly
    (packed M in, no pre-assembled H); pallas-batched under vmap on TPU.

    Per-env args: Mp packed (nl+1, dm+nr, dm), conJ (K, 3, nv),
    ohb (SB, K) one-hot selected breaking rows, x/msm (nv,), jar_l (L,),
    jar_c (K, 3), lim_params (2, L), con_params (5, K)
    [mu | frictional | active | D | hess_active]."""
    nlim = len(lim_dof)

    @custom_batching.custom_vmap
    def f(Mp, conJ, ohb, x, msm, jar_l, jar_c, lim_params, con_params):
        return _ref_block_full(part, lim_dof, lim_sign, ls_iters,
                               n_iters, Mp, conJ, ohb, x, msm, jar_l,
                               jar_c, lim_params, con_params)

    @f.def_vmap
    def _rule(axis_size, in_batched, Mp, conJ, ohb, x, msm, jar_l,
              jar_c, lim_params, con_params):
        del axis_size
        args = (Mp, conJ, ohb, x, msm, jar_l, jar_c, lim_params,
                con_params)
        if not all(in_batched) or not (_use_pallas() or interpret):
            axes = [0 if b else None for b in in_batched]
            out = jax.vmap(lambda *a: _ref_block_full(
                part, lim_dof, lim_sign, ls_iters, n_iters, *a),
                in_axes=axes)(*args)
            return out, (True, True, True, True)
        B = Mp.shape[0]
        K = conJ.shape[1]
        SB = ohb.shape[1]
        lanes = _newton_lanes()
        pad = (-B) % lanes

        def tol(v):
            v = jnp.moveaxis(v, 0, -1)
            if pad:
                fill = jnp.zeros(v.shape[:-1] + (pad,), v.dtype)
                v = jnp.concatenate([v, fill], axis=-1)
            return v

        Mp_t = tol(Mp)
        if pad:
            Mp_t = Mp_t.at[..., B:].set(
                _arrow._identity_packed(part, Mp.dtype))
        J_t = tol(conJ.reshape(B, 3 * K, -1))
        ohb_t = tol(ohb)
        xm_t = tol(jnp.stack([x, msm], axis=1))
        jl_t = tol(jar_l)[None]
        jc_t = tol(jnp.swapaxes(jar_c, 1, 2))
        lp_t = tol(lim_params)
        cp_t = tol(con_params)
        run = _block_full_fn(part, K, SB, nlim, lim_dof, lim_sign,
                             ls_iters, n_iters, interpret,
                             lanes=lanes)
        S_t, ST_t = _scatter_mats(part.nv, lim_dof, lim_sign, Mp.dtype)
        xm_o, jl_o, jc_o = run(Mp_t, J_t, ohb_t, xm_t, jl_t, jc_t,
                               lp_t, cp_t, S_t, ST_t)

        def fro(v):
            return jnp.moveaxis(v[..., :B], -1, 0)

        xm = fro(xm_o)
        return (xm[:, 0], xm[:, 1], fro(jl_o)[:, 0],
                jnp.swapaxes(fro(jc_o), 1, 2)), (True, True, True, True)

    return f


def _ref_solve_full(part, lim_dof, lim_sign, ls_iters, n_iters, Mp,
                    conJ, ohb, a_free, ws, lim_aref, con_aref,
                    lim_params, con_params):
    """Single-env jnp reference for the whole-solve op: warmstart
    selection + jar/msm init + the full refactor block + final forces
    and qfrc (same math as physics/solver.solve end-to-end for
    iterations <= refactor_period)."""
    from flybody_tpu.physics import solver as _sol
    actl, Dl = lim_params[0], lim_params[1]
    mu, fric, actc, Dc = (con_params[0], con_params[1], con_params[2],
                          con_params[3])
    dof = np.array(lim_dof, dtype=np.int64)
    sign = jnp.asarray(np.asarray(lim_sign, np.float32), conJ.dtype)

    def mv(x):
        return _arrow.matvec_packed(part, Mp, x)

    def jar_of(x):
        jl = x[dof] * sign - lim_aref
        jc = jnp.sum(conJ * x[None, None, :], axis=-1) - con_aref
        return jl, jc

    def cost(x):
        jl, jc = jar_of(x)
        c = 0.5 * jnp.dot(x - a_free, mv(x - a_free))
        c = c + 0.5 * jnp.sum(Dl * actl * (jl < 0) * jl ** 2)
        res = _sol._cone_residual(jc, mu, fric, actc)
        c = c + 0.5 * jnp.sum(Dc[:, None] * res ** 2)
        return c

    x0 = jnp.where(cost(ws) < cost(a_free), ws, a_free)
    msm0 = mv(x0 - a_free)
    jl0, jc0 = jar_of(x0)
    x, _, jar_l, jar_c = _ref_block_full(
        part, lim_dof, lim_sign, ls_iters, n_iters, Mp, conJ, ohb, x0,
        msm0, jl0, jc0, lim_params, con_params)
    f_l = -Dl * jar_l * (actl * (jar_l < 0))
    res = _sol._cone_residual(jar_c, mu, fric, actc)
    f_c = -Dc[:, None] * res
    qfrc = (jnp.zeros_like(x).at[dof].add(f_l * sign)
            + jnp.sum(conJ * f_c[:, :, None], axis=(0, 1)))
    return x, qfrc, f_l, f_c


@functools.lru_cache(maxsize=32)
def make_newton_solve_pe(part: _arrow.Part, lim_dof: tuple,
                         lim_sign: tuple, ls_iters: int,
                         n_iters: int, interpret: bool = False):
    """Per-env WHOLE-SOLVE Newton op: warmstart selection, jar/msm
    initialization, in-kernel Hessian/Woodbury assembly, n_iters Newton
    iterations, and the final constraint forces + qfrc_constraint -- the
    entire solver.solve (for iterations <= refactor_period) in ONE
    pallas launch. Removes every XLA-side pass over the (B, K, 3, nv)
    Jacobian: the warmstart cost comparison, init_state, and the closing
    J^T f contraction each re-read ~255 MB from HBM at batch 8192.

    Per-env args: Mp packed, conJ (K, 3, nv), ohb (SB, K), a_free (nv,),
    warmstart (nv,), lim_aref (L,), con_aref (K, 3), lim_params (2, L)
    [active | D], con_params (5, K) [mu | fric | active | D |
    hess_active]. Returns (qacc, qfrc_constraint, f_l, f_c)."""
    nlim = len(lim_dof)

    @custom_batching.custom_vmap
    def f(Mp, conJ, ohb, a_free, ws, lim_aref, con_aref, lim_params,
          con_params):
        return _ref_solve_full(part, lim_dof, lim_sign, ls_iters,
                               n_iters, Mp, conJ, ohb, a_free, ws,
                               lim_aref, con_aref, lim_params,
                               con_params)

    @f.def_vmap
    def _rule(axis_size, in_batched, Mp, conJ, ohb, a_free, ws,
              lim_aref, con_aref, lim_params, con_params):
        del axis_size
        args = (Mp, conJ, ohb, a_free, ws, lim_aref, con_aref,
                lim_params, con_params)
        if not all(in_batched) or not (_use_pallas() or interpret):
            axes = [0 if b else None for b in in_batched]
            out = jax.vmap(lambda *a: _ref_solve_full(
                part, lim_dof, lim_sign, ls_iters, n_iters, *a),
                in_axes=axes)(*args)
            return out, (True, True, True, True)
        B = Mp.shape[0]
        K = conJ.shape[1]
        SB = ohb.shape[1]
        lanes = _newton_lanes()
        pad = (-B) % lanes

        def tol(v):
            v = jnp.moveaxis(v, 0, -1)
            if pad:
                fill = jnp.zeros(v.shape[:-1] + (pad,), v.dtype)
                v = jnp.concatenate([v, fill], axis=-1)
            return v

        Mp_t = tol(Mp)
        if pad:
            Mp_t = Mp_t.at[..., B:].set(
                _arrow._identity_packed(part, Mp.dtype))
        J_t = tol(conJ.reshape(B, 3 * K, -1))
        ohb_t = tol(ohb)
        aw_t = tol(jnp.stack([a_free, ws], axis=1))
        la_t = tol(lim_aref)[None]
        ca_t = tol(jnp.swapaxes(con_aref, 1, 2))
        lp_t = tol(lim_params)
        cp_t = tol(con_params)
        run = _block_full_fn(part, K, SB, nlim, lim_dof, lim_sign,
                             ls_iters, n_iters, interpret,
                             whole_solve=True, lanes=lanes)
        S_t, ST_t = _scatter_mats(part.nv, lim_dof, lim_sign, Mp.dtype)
        xm_o, fl_o, fc_o = run(Mp_t, J_t, ohb_t, aw_t, la_t, ca_t,
                               lp_t, cp_t, S_t, ST_t)

        def fro(v):
            return jnp.moveaxis(v[..., :B], -1, 0)

        xm = fro(xm_o)
        return (xm[:, 0], xm[:, 1], fro(fl_o)[:, 0],
                jnp.swapaxes(fro(fc_o), 1, 2)), (True, True, True, True)

    return f
