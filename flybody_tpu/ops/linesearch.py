"""Newton line search as one Pallas TPU kernel.

The solver's exact line search evaluates the directional derivative
phi'(alpha) ~13-20 times per Newton iteration (bracket doubling + guarded
bisection/Newton). In XLA each evaluation is a handful of tiny fused
kernels; at 8 Newton iterations that is ~160 kernel launches per physics
substep and ~30 ms at batch 8192 (measured v5e) — pure launch overhead,
the math is trivial. This kernel runs the entire search (all evaluations,
all iterations) in VMEM with envs on the 128 lanes, so the whole search
is ONE launch.

Inputs are the alpha-independent precomputes (the same trick MuJoCo's
Newton line search uses): along direction dx, per-row jar0/jv and the
smooth slope/curvature constants. Layout (per lane-block):
    lim_ref: (4, L, 128)  [jar0_l | jv_l | active_l | D_l]
    con_ref: (10, K, 128) [jar0 xyz | jv xyz | mu | frictional | act | D]
    sc_ref:  (2, 1, 128)  [sm0 | smm]
Output: alpha (1, 1, 128).

Semantics identical to the jnp reference `alpha_ref` below (used off-TPU
and in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


# ----------------------------------------------------------- jnp reference


def _slope_curv_ref(a, lim, con, sm0, smm):
    """phi'(a), phi''(a) for one env. lim: (4, L); con: (10, K)."""
    jar0_l, jv_l, act0_l, D_l = lim[0], lim[1], lim[2], lim[3]
    jar_l = jar0_l + a * jv_l
    act_l = act0_l * (jar_l < 0)
    f_l = -D_l * jar_l * act_l
    slope = sm0 + a * smm - jnp.sum(f_l * jv_l)
    curv = smm + jnp.sum(D_l * act_l * jv_l ** 2)

    jar = con[0:3] + a * con[3:6]  # (3, K)
    jv = con[3:6]
    mu, fric, act, D = con[6], con[7], con[8], con[9]
    N, y1, y2 = jar[0], jar[1], jar[2]
    T = jnp.sqrt(y1 * y1 + y2 * y2)
    amu = 1.0 / jnp.maximum(mu, 1e-6)
    safe_T = jnp.maximum(T, 1e-15)
    w = (N + amu * T) / (1.0 + amu * amu)
    top = N >= mu * T
    bottom = mu * N + T <= 0.0
    # Residual (middle zone), then zone selects.
    res_n = N - w
    coef = 1.0 - amu * w / safe_T
    r0 = jnp.where(bottom, N, res_n)
    r1 = jnp.where(bottom, y1, y1 * coef)
    r2 = jnp.where(bottom, y2, y2 * coef)
    r0 = jnp.where(top, 0.0, r0)
    r1 = jnp.where(top, 0.0, r1)
    r2 = jnp.where(top, 0.0, r2)
    # Frictionless: one-sided normal only.
    r0 = jnp.where(fric > 0, r0, jnp.minimum(N, 0.0))
    r1 = jnp.where(fric > 0, r1, 0.0)
    r2 = jnp.where(fric > 0, r2, 0.0)
    f0, f1, f2 = -D * r0 * act, -D * r1 * act, -D * r2 * act
    slope = slope - jnp.sum(f0 * jv[0] + f1 * jv[1] + f2 * jv[2])

    # curvature: jv^T Hc jv per contact.
    v0, v1, v2 = jv[0], jv[1], jv[2]
    yh1 = y1 / safe_T
    yh2 = y2 / safe_T
    yv = yh1 * v1 + yh2 * v2
    vt2 = v1 * v1 + v2 * v2
    c = 1.0 / (1.0 + amu * amu)
    qdP = (c * v0 * v0 + 2.0 * amu * c * v0 * yv
           + amu * amu * c * yv * yv
           + (amu * w / safe_T) * (vt2 - yv * yv))
    q_mid = v0 * v0 + vt2 - qdP
    q = jnp.where(bottom, v0 * v0 + vt2, q_mid)
    q = jnp.where(top, 0.0, q)
    q = jnp.where(fric > 0, q, (N < 0) * v0 * v0)
    curv = curv + jnp.sum(D * act * q)
    return slope, jnp.maximum(curv, 1e-15)


def alpha_ref(lim, con, sc, expand_iters: int, ls_iters: int):
    """Reference line search for one env; returns scalar alpha."""
    sm0, smm = sc[0, 0], sc[1, 0]
    dtype = sm0.dtype

    def slope_at(a):
        return _slope_curv_ref(a, lim, con, sm0, smm)

    def expand(_, hi):
        s, _ = slope_at(hi)
        return jnp.where(s < 0, hi * 2.0, hi)

    hi = jax.lax.fori_loop(0, expand_iters, expand,
                           jnp.asarray(1.0, dtype))
    lo = jnp.zeros_like(hi)

    def bisect(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        s, c = slope_at(mid)
        cand = mid - s / c
        inside = (cand > lo) & (cand < hi)
        probe = jnp.where(inside, cand, mid)
        sp, _ = slope_at(probe)
        lo = jnp.where(sp < 0, probe, lo)
        hi = jnp.where(sp < 0, hi, probe)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, ls_iters, bisect, (lo, hi))
    alpha = 0.5 * (lo + hi)
    s0, _ = slope_at(jnp.zeros_like(alpha))
    return jnp.where(s0 < 0, alpha, jnp.zeros_like(alpha))


# ------------------------------------------------------------------ kernel


def search_planes(lim, con, sm0, smm, expand_iters, ls_iters):
    """The whole line search on (rows, lanes) component planes.

    lim: (4, L, lanes) [jar0_l | jv_l | active_l | D_l];
    con: (10, K, lanes) [jar0 xyz | jv xyz | mu | frictional | act | D];
    sm0/smm: (1, lanes). Returns alpha (1, lanes). Shared by the
    standalone line-search kernel and the fused Newton-step kernel
    (ops/newton_fused.py)."""
    jar0_l, jv_l = lim[0], lim[1]
    act0_l, D_l = lim[2], lim[3]
    j0n, j0t1, j0t2 = con[0], con[1], con[2]
    jvn, jvt1, jvt2 = con[3], con[4], con[5]
    mu, fric, act, D = con[6], con[7], con[8], con[9]
    amu = 1.0 / jnp.maximum(mu, 1e-6)
    c_ = 1.0 / (1.0 + amu * amu)
    Dact = D * act
    fric_pos = fric > 0

    def slope_curv(a):
        # a: (1, 128) broadcast over rows.
        jar_l = jar0_l + a * jv_l
        neg = jar_l < 0
        f_l = jnp.where(neg, -D_l * jar_l * act0_l, 0.0)
        slope = sm0 + a * smm - jnp.sum(f_l * jv_l, axis=0,
                                        keepdims=True)
        curv = smm + jnp.sum(
            jnp.where(neg, D_l * act0_l, 0.0) * jv_l * jv_l,
            axis=0, keepdims=True)

        N = j0n + a * jvn
        y1 = j0t1 + a * jvt1
        y2 = j0t2 + a * jvt2
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
        r0 = jnp.where(fric_pos, r0, jnp.minimum(N, 0.0))
        r1 = jnp.where(fric_pos, r1, 0.0)
        r2 = jnp.where(fric_pos, r2, 0.0)
        sdot = Dact * (r0 * jvn + r1 * jvt1 + r2 * jvt2)
        slope = slope + jnp.sum(sdot, axis=0, keepdims=True)

        yh1 = y1 / safe_T
        yh2 = y2 / safe_T
        yv = yh1 * jvt1 + yh2 * jvt2
        vt2 = jvt1 * jvt1 + jvt2 * jvt2
        qdP = (c_ * jvn * jvn + 2.0 * amu * c_ * jvn * yv
               + amu * amu * c_ * yv * yv
               + (amu * w / safe_T) * (vt2 - yv * yv))
        q_mid = jvn * jvn + vt2 - qdP
        q = jnp.where(bottom, jvn * jvn + vt2, q_mid)
        q = jnp.where(top, 0.0, q)
        q = jnp.where(fric_pos, q, jnp.where(N < 0, jvn * jvn, 0.0))
        curv = curv + jnp.sum(Dact * q, axis=0, keepdims=True)
        return slope, jnp.maximum(curv, 1e-15)

    one = jnp.ones_like(sm0)

    def expand(_, hi):
        s, _ = slope_curv(hi)
        return jnp.where(s < 0, hi * 2.0, hi)

    hi = jax.lax.fori_loop(0, expand_iters, expand, one)
    lo = jnp.zeros_like(hi)

    def bisect(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        s, c = slope_curv(mid)
        cand = mid - s / c
        inside = (cand > lo) & (cand < hi)
        probe = jnp.where(inside, cand, mid)
        sp, _ = slope_curv(probe)
        lo = jnp.where(sp < 0, probe, lo)
        hi = jnp.where(sp < 0, hi, probe)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, ls_iters, bisect, (lo, hi))
    alpha = 0.5 * (lo + hi)
    s0, _ = slope_curv(jnp.zeros_like(alpha))
    return jnp.where(s0 < 0, alpha, jnp.zeros_like(alpha))


def _ls_kernel(expand_iters, ls_iters, lim_ref, con_ref, sc_ref, out_ref):
    alpha = search_planes(lim_ref[...], con_ref[...], sc_ref[0, :, :],
                          sc_ref[1, :, :], expand_iters, ls_iters)
    out_ref[...] = alpha[None]


@functools.partial(jax.jit, static_argnames=('expand_iters', 'ls_iters',
                                             'interpret'))
def _ls_pallas(lim_t, con_t, sc_t, expand_iters, ls_iters,
               interpret=False):
    L = lim_t.shape[1]
    K = con_t.shape[1]
    B = lim_t.shape[-1]
    grid = (B // LANES,)
    return pl.pallas_call(
        functools.partial(_ls_kernel, expand_iters, ls_iters),
        out_shape=jax.ShapeDtypeStruct((1, 1, B), lim_t.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((4, L, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((10, K, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((2, 1, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(lim_t, con_t, sc_t)


def _tolanes(v, pad):
    v = jnp.moveaxis(v, 0, -1)
    if pad:
        v = jnp.concatenate(
            [v, jnp.zeros(v.shape[:-1] + (pad,), v.dtype)], axis=-1)
    return v


@functools.lru_cache(maxsize=8)
def make_ls_pe(expand_iters: int, ls_iters: int):
    """Per-env line-search entry; pallas-batched under vmap on TPU.

    Args per env: lim (4, L), con (10, K), sc (2, 1). Returns alpha ()."""

    @custom_batching.custom_vmap
    def f(lim, con, sc):
        return alpha_ref(lim, con, sc, expand_iters, ls_iters)

    @f.def_vmap
    def _rule(axis_size, in_batched, lim, con, sc):
        del axis_size
        from flybody_tpu.ops.dispatch import pallas_enabled
        if not all(in_batched) or not pallas_enabled('linesearch'):
            axes = [0 if b else None for b in in_batched]
            out = jax.vmap(
                lambda l, c, s: alpha_ref(l, c, s, expand_iters,
                                          ls_iters), in_axes=axes)(
                lim, con, sc)
            return out, True
        B = lim.shape[0]
        pad = (-B) % LANES
        a_t = _ls_pallas(_tolanes(lim, pad), _tolanes(con, pad),
                         _tolanes(sc, pad), expand_iters, ls_iters)
        return jnp.moveaxis(a_t[0, 0, :B], -1, 0), True

    return f
