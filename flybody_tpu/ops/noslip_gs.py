"""Noslip Gauss-Seidel sweeps as a Pallas TPU kernel.

The noslip post-pass is an inherently sequential Gauss-Seidel loop over
K=64 contacts x 3 sweeps. As a lax.scan it moves the (B, nv) state and a
(B, nv, 2) Pt slice through HBM on every one of the 192 steps (~500 ms at
batch 8192). This kernel keeps x, ft, and all per-contact operands
VMEM-resident for a 128-lane (= env) block, so the whole sweep touches HBM
once (~5 ms).

Layouts (B on lanes):
    jt:    (2K, nv, B)   tangent Jacobian rows, contact-major
    pt:    (2K, nv, B)   M^{-1} J_t^T columns, same ordering
    ainv:  (4, K, B)     2x2 block inverses, flattened row-major
    aref:  (2, K, B)
    lim:   (1, K, B)     friction-circle radius mu * f_n (>= 0)
    use:   (1, K, B)     active-frictional mask (0/1)
    x0:    (nv, 1, B)
    ft0:   (2, K, B)
Outputs: x (nv, 1, B), ft (2, K, B).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _kernel(iterations, jt_ref, pt_ref, ainv_ref, aref_ref, lim_ref,
            use_ref, x0_ref, ft0_ref, x_ref, ft_ref):
    K = ainv_ref.shape[1]

    x_ref[...] = x0_ref[...]
    ft_ref[...] = ft0_ref[...]

    def contact_update(k, _):
        jk = jt_ref[pl.ds(2 * k, 2), :, :]        # (2, nv, L)
        # res = J_t x - aref
        s = jnp.sum(jk * x_ref[:, 0, :][None, :, :], axis=1)  # (2, L)
        res = s - aref_ref[:, pl.ds(k, 1), :][:, 0, :]        # (2, L)
        a = ainv_ref[:, pl.ds(k, 1), :][:, 0, :]              # (4, L)
        d0 = -(a[0] * res[0] + a[1] * res[1])
        d1 = -(a[2] * res[0] + a[3] * res[1])
        ftk = ft_ref[:, pl.ds(k, 1), :][:, 0, :]              # (2, L)
        f0 = ftk[0] + d0
        f1 = ftk[1] + d1
        lim = lim_ref[0, pl.ds(k, 1), :][0]                   # (L,)
        norm = jnp.sqrt(f0 * f0 + f1 * f1)
        scale = jnp.where(norm > lim, lim / jnp.maximum(norm, 1e-15), 1.0)
        f0 = f0 * scale
        f1 = f1 * scale
        u = use_ref[0, pl.ds(k, 1), :][0]
        f0 = jnp.where(u > 0, f0, ftk[0])
        f1 = jnp.where(u > 0, f1, ftk[1])
        dft0 = f0 - ftk[0]
        dft1 = f1 - ftk[1]
        pk = pt_ref[pl.ds(2 * k, 2), :, :]                    # (2, nv, L)
        x_ref[:, 0, :] = (x_ref[:, 0, :] + dft0[None, :] * pk[0]
                          + dft1[None, :] * pk[1])
        ft_ref[:, pl.ds(k, 1), :] = jnp.stack([f0, f1])[:, None, :]
        return 0

    def sweep(_, carry):
        jax.lax.fori_loop(0, K, contact_update, 0)
        return carry

    jax.lax.fori_loop(0, iterations, sweep, 0)


@functools.partial(jax.jit, static_argnames=('iterations', 'interpret'))
def _noslip_pallas(jt, pt, ainv, aref, lim, use, x0, ft0,
                   iterations=3, interpret=False):
    K2, nv, B = jt.shape
    K = K2 // 2
    grid = (B // LANES,)

    def spec(*shape):
        return pl.BlockSpec(shape + (LANES,),
                            lambda i: (0,) * len(shape) + (i,),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, iterations),
        out_shape=(jax.ShapeDtypeStruct((nv, 1, B), jt.dtype),
                   jax.ShapeDtypeStruct((2, K, B), jt.dtype)),
        grid=grid,
        in_specs=[spec(K2, nv), spec(K2, nv), spec(4, K), spec(2, K),
                  spec(1, K), spec(1, K), spec(nv, 1), spec(2, K)],
        out_specs=(spec(nv, 1), spec(2, K)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(jt, pt, ainv, aref, lim, use, x0, ft0)


def _reference(Jt, Pt, Ainv, aref_t, lim, use, x0, ft0, iterations):
    """Plain-XLA Gauss-Seidel (single env), the non-TPU fallback."""
    def contact_update(carry, k):
        x, ft = carry
        res = Jt[k] @ x - aref_t[k]
        delta = -(Ainv[k] @ res)
        ft_new = ft[k] + delta
        norm = jnp.linalg.norm(ft_new)
        ft_new = jnp.where(norm > lim[k],
                           ft_new * (lim[k] / jnp.maximum(norm, 1e-15)),
                           ft_new)
        ft_new = jnp.where(use[k] > 0, ft_new, ft[k])
        dft = ft_new - ft[k]
        x = x + Pt[k] @ dft
        ft = ft.at[k].set(ft_new)
        return (x, ft), None

    K = Jt.shape[0]

    def sweep(_, carry):
        (x, ft), _ = jax.lax.scan(contact_update, carry, jnp.arange(K))
        return (x, ft)

    return jax.lax.fori_loop(0, iterations, sweep, (x0, ft0))


@functools.lru_cache(maxsize=8)
def make_gs_pe(iterations: int):
    """Per-env noslip GS entry with the pallas batch rule under vmap."""

    @custom_batching.custom_vmap
    def gs(Jt, Pt, Ainv, aref_t, lim, use, x0, ft0):
        return _reference(Jt, Pt, Ainv, aref_t, lim, use, x0, ft0,
                          iterations)

    @gs.def_vmap
    def _rule(axis_size, in_batched, Jt, Pt, Ainv, aref_t, lim, use, x0,
              ft0):
        del axis_size
        from flybody_tpu.ops.dispatch import pallas_enabled
        on_tpu = pallas_enabled('noslip')
        if not all(in_batched) or not on_tpu:
            axes = [0 if b else None for b in in_batched]
            out = jax.vmap(lambda *a: _reference(*a, iterations),
                           in_axes=axes)(
                Jt, Pt, Ainv, aref_t, lim, use, x0, ft0)
            return out, (True, True)
        B, K, _, nv = Jt.shape  # (B, K, 2, nv)
        pad = (-B) % LANES

        def tolanes(v, shape):
            v = jnp.moveaxis(v.reshape((B,) + shape), 0, -1)
            if pad:
                v = jnp.concatenate(
                    [v, jnp.zeros(shape + (pad,), v.dtype)], axis=-1)
            return v

        jt = tolanes(Jt, (2 * K, nv))
        pt = tolanes(jnp.swapaxes(Pt, 2, 3), (2 * K, nv))  # (B,K,2,nv)
        ainv = tolanes(jnp.swapaxes(Ainv.reshape(B, K, 4), 1, 2), (4, K))
        aref = tolanes(jnp.swapaxes(aref_t, 1, 2), (2, K))
        lim_t = tolanes(lim, (1, K))
        use_t = tolanes(use.astype(Jt.dtype), (1, K))
        x0_t = tolanes(x0, (nv, 1))
        ft0_t = tolanes(jnp.swapaxes(ft0, 1, 2), (2, K))
        x_t, ft_t = _noslip_pallas(jt, pt, ainv, aref, lim_t, use_t, x0_t,
                                   ft0_t, iterations=iterations)
        x = jnp.moveaxis(x_t[:, 0, :B], -1, 0)
        ft = jnp.swapaxes(jnp.moveaxis(ft_t[..., :B], -1, 0), 1, 2)
        return (x, ft), (True, True)

    return gs


# --------------------------------------------------------------- fused op
# Factor-solve (Pt = M^{-1} J_t^T with the packed block-arrow factor) +
# 2x2 block inverses + the GS sweeps in ONE launch: the separate
# multi-RHS solve and GS kernels each re-moved the factor / Pt through
# HBM and paid a launch.


def _fused_kernel(part, iterations, f_ref, jt_ref, aref_ref, lim_ref,
                  use_ref, x0_ref, ft0_ref, x_ref, ft_ref,
                  pt_scr, yl, cl, ainv_scr):
    from flybody_tpu.ops import arrow as _arrow
    K2, nv, L = jt_ref.shape
    K = K2 // 2
    solve = _arrow._make_solve_body(part, K2)
    solve(f_ref, jt_ref, pt_scr, yl, cl)  # pt_scr: (2K, nv, L)

    # A_k = J_t_k @ Pt_k (2x2) -> closed-form inverse.
    jt = jt_ref[...].reshape(K, 2, nv, L)
    pt = pt_scr[...].reshape(K, 2, nv, L)
    a = jnp.sum(jt[:, 0] * pt[:, 0], axis=1)  # (K, L)
    b_ = jnp.sum(jt[:, 0] * pt[:, 1], axis=1)
    c_ = jnp.sum(jt[:, 1] * pt[:, 0], axis=1)
    d_ = jnp.sum(jt[:, 1] * pt[:, 1], axis=1)
    det = a * d_ - b_ * c_
    det = jnp.where(jnp.abs(det) > 1e-12, det,
                    jnp.where(det >= 0, 1e-12, -1e-12))
    ainv_scr[...] = jnp.stack([d_, -b_, -c_, a], axis=0) / det[None]

    _kernel(iterations, jt_ref, pt_scr, ainv_scr, aref_ref, lim_ref,
            use_ref, x0_ref, ft0_ref, x_ref, ft_ref)


def _fused_ref(part, iterations, F, Jt, aref_t, lim, use, x0, ft0):
    """Single-env jnp reference: packed-factor solve + A + GS."""
    from flybody_tpu.ops import arrow as _arrow
    K = Jt.shape[0]
    Pt = _arrow.solve_ref(part, F, Jt.reshape(2 * K, -1).T)  # (nv, 2K)
    Pt = jnp.swapaxes(Pt.reshape(-1, K, 2), 0, 1)  # (K, nv, 2)
    A = jnp.sum(Jt[:, :, None, :] * jnp.swapaxes(Pt, -1, -2)[:, None],
                axis=-1)
    a, b_, c_, d_ = A[:, 0, 0], A[:, 0, 1], A[:, 1, 0], A[:, 1, 1]
    det = a * d_ - b_ * c_
    det = jnp.where(jnp.abs(det) > 1e-12, det,
                    jnp.where(det >= 0, 1e-12, -1e-12))
    Ainv = jnp.stack([jnp.stack([d_, -b_], -1),
                      jnp.stack([-c_, a], -1)], -2) / det[:, None, None]
    return _reference(Jt, Pt, Ainv, aref_t, lim, use, x0, ft0,
                      iterations)


@functools.lru_cache(maxsize=8)
def make_noslip_fused_pe(part, iterations: int, interpret: bool = False):
    """Per-env fused noslip (solve + Ainv + GS); pallas-batched on TPU.

    Per-env args: F packed factor (nl+1, dm+nr, dm), Jt (K, 2, nv),
    aref_t (K, 2), lim (K,), use (K,), x0 (nv,), ft0 (K, 2).
    Returns (x (nv,), ft (K, 2))."""
    import jax as _jax
    from jax.experimental import pallas as _pl
    from jax.experimental.pallas import tpu as _pltpu

    @custom_batching.custom_vmap
    def f(F, Jt, aref_t, lim, use, x0, ft0):
        return _fused_ref(part, iterations, F, Jt, aref_t, lim, use,
                          x0, ft0)

    @f.def_vmap
    def _rule(axis_size, in_batched, F, Jt, aref_t, lim, use, x0, ft0):
        del axis_size
        from flybody_tpu.ops.dispatch import pallas_enabled
        if not all(in_batched) or not (pallas_enabled('noslip')
                                       or interpret):
            axes = [0 if b else None for b in in_batched]
            out = jax.vmap(lambda *a: _fused_ref(part, iterations, *a),
                           in_axes=axes)(F, Jt, aref_t, lim, use, x0,
                                         ft0)
            return out, (True, True)
        B, K, _, nv = Jt.shape
        nl, dm, nr = len(part.ds), part.dmax, part.nr
        pad = (-B) % LANES

        def tol(v, shape):
            v = jnp.moveaxis(v.reshape((B,) + shape), 0, -1)
            if pad:
                v = jnp.concatenate(
                    [v, jnp.zeros(shape + (pad,), v.dtype)], axis=-1)
            return v

        F_t = tol(F, (nl + 1, dm + nr, dm))
        if pad:
            from flybody_tpu.ops import arrow as _arrow
            F_t = F_t.at[..., B:].set(
                _arrow._identity_packed(part, F.dtype))
        jt = tol(Jt, (2 * K, nv))
        aref = tol(jnp.swapaxes(aref_t, 1, 2), (2, K))
        lim_t = tol(lim, (1, K))
        use_t = tol(use.astype(Jt.dtype), (1, K))
        x0_t = tol(x0, (nv, 1))
        ft0_t = tol(jnp.swapaxes(ft0, 1, 2), (2, K))
        Bp = jt.shape[-1]
        grid = (Bp // LANES,)

        def spec(*shape):
            return _pl.BlockSpec(shape + (LANES,),
                                 lambda i: (0,) * len(shape) + (i,),
                                 memory_space=_pltpu.VMEM)

        x_t, ft_t = _pl.pallas_call(
            functools.partial(_fused_kernel, part, iterations),
            out_shape=(_jax.ShapeDtypeStruct((nv, 1, Bp), Jt.dtype),
                       _jax.ShapeDtypeStruct((2, K, Bp), Jt.dtype)),
            grid=grid,
            in_specs=[spec(nl + 1, dm + nr, dm), spec(2 * K, nv),
                      spec(2, K), spec(1, K), spec(1, K), spec(nv, 1),
                      spec(2, K)],
            out_specs=(spec(nv, 1), spec(2, K)),
            scratch_shapes=[
                _pltpu.VMEM((2 * K, nv, LANES), jnp.float32),
                _pltpu.VMEM((nl, 2 * K, dm, LANES), jnp.float32),
                _pltpu.VMEM((nl, 2 * K, dm, LANES), jnp.float32),
                _pltpu.VMEM((4, K, LANES), jnp.float32)],
            compiler_params=_pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(F_t, jt, aref, lim_t, use_t, x0_t, ft0_t)
        x = jnp.moveaxis(x_t[:, 0, :B], -1, 0)
        ft = jnp.swapaxes(jnp.moveaxis(ft_t[..., :B], -1, 0), 1, 2)
        return (x, ft), (True, True)

    return f
