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
