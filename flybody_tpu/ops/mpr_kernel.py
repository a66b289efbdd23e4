"""MPR narrowphase as a Pallas TPU kernel.

The XLA version of the MPR loop (physics/mpr.py) streams ~20 live
(pairs, B, 3) arrays through HBM on each of its ~40 sequential iterations
(~330 ms/substep at batch 8192). This kernel runs the identical algorithm
with the entire portal state VMEM-resident for a (P<=128 pairs, 128 envs)
block: vectors are component tuples of (P, 128) planes, so every op is a
clean full-width VPU op and HBM is touched exactly once.

The algorithm mirrors physics/mpr.py line for line (discovery + refinement
+ smooth-pair polish, margin-inflated supports, witness-sum s = a + b).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flybody_tpu.model import spec as _s

LANES = 128
_EPS = 1e-12
_DISCOVERY_ITERS = 10
_REFINE_ITERS = 24

# ------------------------------------------------------- component algebra


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _norm3(a):
    n = jnp.sqrt(_dot3(a, a))
    inv = 1.0 / jnp.maximum(n, _EPS)
    return _scale3(a, inv)


def _where3(c, a, b):
    return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]),
            jnp.where(c, a[2], b[2]))


def _matvec(m, v):
    """m: tuple of 9 (row-major R[i][j]); returns R @ v."""
    return (m[0] * v[0] + m[1] * v[1] + m[2] * v[2],
            m[3] * v[0] + m[4] * v[1] + m[5] * v[2],
            m[6] * v[0] + m[7] * v[1] + m[8] * v[2])


def _matvec_t(m, v):
    """R^T @ v."""
    return (m[0] * v[0] + m[3] * v[1] + m[6] * v[2],
            m[1] * v[0] + m[4] * v[1] + m[7] * v[2],
            m[2] * v[0] + m[5] * v[1] + m[8] * v[2])


def _support(gtype: int, pos, mat, size, d):
    """Componentized support function (mirrors physics/mpr.py support)."""
    if gtype == _s.GEOM_SPHERE:
        return _add3(pos, _scale3(d, size[0]))
    dl = _matvec_t(mat, d)
    if gtype == _s.GEOM_CAPSULE:
        axial = jnp.sign(dl[2]) * size[1]
        world = _matvec(mat, (jnp.zeros_like(axial), jnp.zeros_like(axial),
                              axial))
        return _add3(_add3(pos, world), _scale3(d, size[0]))
    if gtype == _s.GEOM_CYLINDER:
        rn = jnp.sqrt(dl[0] * dl[0] + dl[1] * dl[1])
        ok = rn > 1e-10
        inv = jnp.where(ok, size[0] / jnp.maximum(rn, _EPS), 0.0)
        local = (dl[0] * inv, dl[1] * inv, jnp.sign(dl[2]) * size[1])
        return _add3(pos, _matvec(mat, local))
    if gtype == _s.GEOM_ELLIPSOID:
        sx, sy, sz = size
        num = (sx * sx * dl[0], sy * sy * dl[1], sz * sz * dl[2])
        den = jnp.sqrt((sx * dl[0]) ** 2 + (sy * dl[1]) ** 2
                       + (sz * dl[2]) ** 2)
        inv = 1.0 / jnp.maximum(den, _EPS)
        return _add3(pos, _matvec(mat, _scale3(num, inv)))
    raise NotImplementedError(gtype)


def _support_any(tc, pos, mat, size, d):
    """Per-pair type dispatch: all four supports + select (merged path).

    Shares the R^T d rotation across the three frame-local shapes; the
    4x support cost is repaid by running ONE kernel + ONE broadphase for
    all mixed-type MPR pairs (physics/collision.py merged path)."""
    sp = _add3(pos, _scale3(d, size[0]))
    dl = _matvec_t(mat, d)
    # Capsule.
    axial = jnp.sign(dl[2]) * size[1]
    ca_l = (jnp.zeros_like(axial), jnp.zeros_like(axial), axial)
    # Cylinder.
    rn = jnp.sqrt(dl[0] * dl[0] + dl[1] * dl[1])
    inv_c = jnp.where(rn > 1e-10, size[0] / jnp.maximum(rn, _EPS), 0.0)
    cy_l = (dl[0] * inv_c, dl[1] * inv_c, jnp.sign(dl[2]) * size[1])
    # Ellipsoid.
    sx, sy, sz = size
    num = (sx * sx * dl[0], sy * sy * dl[1], sz * sz * dl[2])
    den = jnp.sqrt((sx * dl[0]) ** 2 + (sy * dl[1]) ** 2
                   + (sz * dl[2]) ** 2)
    inv_e = 1.0 / jnp.maximum(den, _EPS)
    el_l = _scale3(num, inv_e)
    # Select the local point, rotate once, add capsule's radial term.
    is_ca = tc == _s.GEOM_CAPSULE
    is_cy = tc == _s.GEOM_CYLINDER
    local = _where3(is_ca, ca_l, _where3(is_cy, cy_l, el_l))
    pt = _add3(pos, _matvec(mat, local))
    pt = _where3(is_ca, _add3(pt, _scale3(d, size[0])), pt)
    return _where3(tc == _s.GEOM_SPHERE, sp, pt)


# ----------------------------------------------------------------- kernel


def _mpr_kernel(sup1, sup2, polish_iters, smooth, refs):
    """Shared MPR body. sup1/sup2: (pos, mat, size, d) -> support point
    (componentized); smooth: None, or a per-pair mask gating the
    strictly-convex polish acceptance (merged mixed-type path)."""
    (p1_ref, m1_ref, s1_ref, mg1_ref, p2_ref, m2_ref, s2_ref, mg2_ref,
     dist_ref, n_ref, pos_ref) = refs

    def vec(ref):
        return (ref[0], ref[1], ref[2])

    pos1 = vec(p1_ref)
    pos2 = vec(p2_ref)
    size1 = vec(s1_ref)
    size2 = vec(s2_ref)
    mat1 = tuple(m1_ref[i] for i in range(9))
    mat2 = tuple(m2_ref[i] for i in range(9))
    mg1 = mg1_ref[0]
    mg2 = mg2_ref[0]
    total_margin = mg1 + mg2

    def S(d):
        a = sup1(pos1, mat1, size1, d)
        b = sup2(pos2, mat2, size2, _scale3(d, -1.0))
        a = _add3(a, _scale3(d, mg1))
        b = _sub3(b, _scale3(d, mg2))
        return _sub3(a, b), _add3(a, b)

    # v0: interior point.
    v0 = _sub3(pos1, pos2)
    tiny = jnp.sqrt(_dot3(v0, v0)) < 1e-10
    v0 = (jnp.where(tiny, 1e-7, v0[0]), v0[1], v0[2])

    n = _norm3(_scale3(v0, -1.0))
    v1, s1 = S(n)
    sep = (_dot3(v1, n) <= 0).astype(v1[0].dtype)

    n1 = _cross3(v1, v0)
    degen = jnp.sqrt(_dot3(n1, n1)) < 1e-14
    d10 = _sub3(v1, v0)
    alt = _cross3(d10, (jnp.ones_like(v0[0]), 0.013 + 0.0 * v0[0],
                        0.021 + 0.0 * v0[0]))
    alt2 = _cross3(d10, (0.021 + 0.0 * v0[0], jnp.ones_like(v0[0]),
                         0.013 + 0.0 * v0[0]))
    alt_deg = jnp.sqrt(_dot3(alt, alt)) < 1e-14
    alt = _where3(alt_deg, alt2, alt)
    n1 = _norm3(_where3(degen, alt, n1))
    v2, s2 = S(n1)
    sep = jnp.maximum(sep, (_dot3(v2, n1) <= 0).astype(sep.dtype))

    n2 = _cross3(_sub3(v1, v0), _sub3(v2, v0))
    swap = _dot3(n2, v0) > 0
    v1s = _where3(swap, v2, v1)
    s1s = _where3(swap, s2, s1)
    v2s = _where3(swap, v1, v2)
    s2s = _where3(swap, s1, s2)
    v1, s1, v2, s2 = v1s, s1s, v2s, s2s
    n2 = _norm3(_where3(swap, _scale3(n2, -1.0), n2))

    v3, s3 = S(n2)
    sep = jnp.maximum(sep, (_dot3(v3, n2) <= 0).astype(sep.dtype))

    def discovery(_, carry):
        v1, s1, v2, s2, v3, s3, n, done, sep = carry
        out1 = (_dot3(_cross3(v1, v3), v0) < 0).astype(sep.dtype)
        out2 = (_dot3(_cross3(v3, v2), v0) < 0).astype(sep.dtype)
        act = (1.0 - done) * (1.0 - sep)
        rep2 = act * out1
        rep1 = act * (1.0 - out1) * out2
        done = jnp.maximum(done, act * (1.0 - out1) * (1.0 - out2))

        v2_ = _where3(rep2 > 0, v3, v2)
        s2_ = _where3(rep2 > 0, s3, s2)
        v1_ = _where3(rep1 > 0, v3, v1)
        s1_ = _where3(rep1 > 0, s3, s1)
        n_new = _where3(rep2 > 0, _cross3(_sub3(v1_, v0), _sub3(v3, v0)),
                        _cross3(_sub3(v3, v0), _sub3(v2_, v0)))
        n_new = _norm3(n_new)
        v3n, s3n = S(n_new)
        cont = jnp.maximum(rep1, rep2)
        sep = jnp.maximum(
            sep, cont * (_dot3(v3n, n_new) <= 0).astype(sep.dtype))
        v3_ = _where3(cont > 0, v3n, v3)
        s3_ = _where3(cont > 0, s3n, s3)
        n = _where3(cont > 0, n_new, n)
        return (v1_, s1_, v2_, s2_, v3_, s3_, n, done, sep)

    done0 = jnp.zeros_like(sep)
    carry = (v1, s1, v2, s2, v3, s3, n2, done0, sep)
    carry = jax.lax.fori_loop(0, _DISCOVERY_ITERS, discovery, carry)
    v1, s1, v2, s2, v3, s3, _, _, sep = carry

    def refine(_, carry):
        v1, s1, v2, s2, v3, s3, best_n, best_depth, conv = carry
        n = _norm3(_cross3(_sub3(v2, v1), _sub3(v3, v1)))
        v4, s4 = S(n)
        depth = _dot3(v1, n)
        gap = _dot3(_sub3(v4, v3), n)
        cb = conv > 0
        best_n = _where3(cb, best_n, n)
        best_depth = jnp.where(cb, best_depth, depth)
        conv = jnp.maximum(conv, (gap < 1e-10).astype(conv.dtype))
        live = conv <= 0

        d1 = _dot3(_cross3(v4, v1), v0)
        d2 = _dot3(_cross3(v4, v2), v0)
        d3 = _dot3(_cross3(v4, v3), v0)
        rep_v1 = ((d1 < 0) & (d2 < 0)) | ((d1 >= 0) & (d3 >= 0))
        rep_v3 = (d1 < 0) & (d2 >= 0)
        rep_v2 = (d1 >= 0) & (d3 < 0)

        v1_ = _where3(rep_v1 & live, v4, v1)
        s1_ = _where3(rep_v1 & live, s4, s1)
        v2_ = _where3(rep_v2 & live, v4, v2)
        s2_ = _where3(rep_v2 & live, s4, s2)
        v3_ = _where3(rep_v3 & live, v4, v3)
        s3_ = _where3(rep_v3 & live, s4, s3)
        return (v1_, s1_, v2_, s2_, v3_, s3_, best_n, best_depth, conv)

    conv0 = jnp.zeros_like(sep)
    bn0 = (jnp.zeros_like(v1[0]), jnp.zeros_like(v1[0]),
           jnp.ones_like(v1[0]))
    bd0 = jnp.zeros_like(v1[0])
    carry = (v1, s1, v2, s2, v3, s3, bn0, bd0, conv0)
    carry = jax.lax.fori_loop(0, _REFINE_ITERS, refine, carry)
    v1, s1, v2, s2, v3, s3, n, depth, _ = carry

    # Witness midpoint via barycentric weights of the origin projection.
    p = _scale3(n, depth)
    area = _cross3(_sub3(v2, v1), _sub3(v3, v1))
    w1 = _dot3(_cross3(_sub3(v2, p), _sub3(v3, p)), area)
    w2 = _dot3(_cross3(_sub3(v3, p), _sub3(v1, p)), area)
    w3 = _dot3(_cross3(_sub3(v1, p), _sub3(v2, p)), area)
    wsum = w1 + w2 + w3
    bad = jnp.abs(wsum) < 1e-20
    safe = jnp.where(bad, 1.0, wsum)
    w1 = jnp.where(bad, 1.0, w1 / safe)
    w2 = jnp.where(bad, 0.0, w2 / safe)
    w3 = jnp.where(bad, 0.0, w3 / safe)
    pos = _scale3(_add3(_add3(_scale3(s1, w1), _scale3(s2, w2)),
                        _scale3(s3, w3)), 0.5)

    if polish_iters:
        scale = jnp.maximum(
            jnp.maximum(jnp.maximum(size1[0], size1[1]), size1[2]),
            jnp.maximum(jnp.maximum(size2[0], size2[1]), size2[2]))

        def polish(_, u):
            xd, _ = S(u)
            g = _sub3(xd, _scale3(u, _dot3(xd, u)))
            return _norm3(_sub3(u, _scale3(g, 0.3 / scale)))

        n_p = jax.lax.fori_loop(0, polish_iters, polish, n)
        v_p, s_p = S(n_p)
        depth_p = _dot3(v_p, n_p)
        better = depth_p < depth
        if smooth is not None:
            better = better & smooth
        n = _where3(better, n_p, n)
        depth = jnp.where(better, depth_p, depth)
        pos = _where3(better, _scale3(s_p, 0.5), pos)

    sepb = sep > 0
    dist = jnp.where(sepb, jnp.ones_like(depth), total_margin - depth)
    pos = _where3(sepb, (jnp.zeros_like(depth),) * 3, pos)

    dist_ref[0] = dist
    for i in range(3):
        n_ref[i] = n[i]
        pos_ref[i] = pos[i]


def _kernel_entry(type1, type2, polish_iters, p1, m1, s1, mg1, p2, m2, s2,
                  mg2, dist_ref, n_ref, pos_ref):
    _mpr_kernel(functools.partial(_support, type1),
                functools.partial(_support, type2), polish_iters, None,
                (p1, m1, s1, mg1, p2, m2, s2, mg2, dist_ref, n_ref,
                 pos_ref))


def _merged_entry(polish_iters, p1, m1, s1, mg1, p2, m2, s2, mg2, tc,
                  dist_ref, n_ref, pos_ref):
    """Mixed-type entry: tc holds [type1; type2; smooth] channels."""
    t1 = tc[0]
    t2 = tc[1]
    smooth = tc[2] > 0.5
    _mpr_kernel(functools.partial(_support_any, t1),
                functools.partial(_support_any, t2), polish_iters, smooth,
                (p1, m1, s1, mg1, p2, m2, s2, mg2, dist_ref, n_ref,
                 pos_ref))


@functools.partial(jax.jit, static_argnames=('type1', 'type2',
                                             'polish_iters', 'interpret'))
def _mpr_pallas(type1, type2, polish_iters, p1, m1, s1, mg1, p2, m2, s2,
                mg2, interpret=False):
    """All inputs in (C, P, B) layout, B a multiple of LANES."""
    _, P, B = p1.shape
    grid = (B // LANES,)

    def spec(c):
        return pl.BlockSpec((c, P, LANES), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel_entry, type1, type2, polish_iters),
        out_shape=(jax.ShapeDtypeStruct((1, P, B), p1.dtype),
                   jax.ShapeDtypeStruct((3, P, B), p1.dtype),
                   jax.ShapeDtypeStruct((3, P, B), p1.dtype)),
        grid=grid,
        in_specs=[spec(3), spec(9), spec(3), spec(1),
                  spec(3), spec(9), spec(3), spec(1)],
        out_specs=(spec(1), spec(3), spec(3)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(p1, m1, s1, mg1, p2, m2, s2, mg2)


@functools.partial(jax.jit, static_argnames=('polish_iters', 'interpret'))
def _mpr_merged_pallas(polish_iters, p1, m1, s1, mg1, p2, m2, s2, mg2, tc,
                       interpret=False):
    """Mixed-type MPR: inputs in (C, P, B) layout; tc = (3, P, B) holding
    [type1; type2; smooth]."""
    _, P, B = p1.shape
    grid = (B // LANES,)

    def spec(c):
        return pl.BlockSpec((c, P, LANES), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_merged_entry, polish_iters),
        out_shape=(jax.ShapeDtypeStruct((1, P, B), p1.dtype),
                   jax.ShapeDtypeStruct((3, P, B), p1.dtype),
                   jax.ShapeDtypeStruct((3, P, B), p1.dtype)),
        grid=grid,
        in_specs=[spec(3), spec(9), spec(3), spec(1),
                  spec(3), spec(9), spec(3), spec(1), spec(3)],
        out_specs=(spec(1), spec(3), spec(3)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(p1, m1, s1, mg1, p2, m2, s2, mg2, tc)


@functools.lru_cache(maxsize=8)
def make_mpr_merged_pe(polish_iters: int, interpret: bool = False):
    """Per-env mixed-type MPR entry (type codes + smooth flag as traced
    per-pair inputs); pallas-batched under vmap on TPU."""
    from flybody_tpu.physics import mpr as _mpr

    @custom_batching.custom_vmap
    def f(pos1, mat1, size1, mg1, pos2, mat2, size2, mg2, t1, t2, smooth):
        return _mpr.mpr_penetration(t1, t2, pos1, mat1, size1, pos2,
                                    mat2, size2, margin1=mg1, margin2=mg2,
                                    polish_iters=polish_iters,
                                    smooth_mask=smooth > 0.5)

    @f.def_vmap
    def _rule(axis_size, in_batched, pos1, mat1, size1, mg1, pos2, mat2,
              size2, mg2, t1, t2, smooth):
        from flybody_tpu.ops.dispatch import pallas_enabled
        on_tpu = pallas_enabled('mpr') or interpret
        args = [pos1, mat1, size1, mg1, pos2, mat2, size2, mg2, t1, t2,
                smooth]
        if not on_tpu:
            axes = [0 if b else None for b in in_batched]
            out = jax.vmap(lambda *a: _mpr.mpr_penetration(
                a[8], a[9], a[0], a[1], a[2], a[4], a[5], a[6],
                margin1=a[3], margin2=a[7], polish_iters=polish_iters,
                smooth_mask=a[10] > 0.5), in_axes=axes)(*args)
            return out, (True, True, True)
        args = [a if b else jnp.broadcast_to(a[None], (axis_size,)
                                             + a.shape)
                for a, b in zip(args, in_batched)]
        (pos1, mat1, size1, mg1, pos2, mat2, size2, mg2, t1, t2,
         smooth) = args
        B, P = pos1.shape[:2]
        pad = (-B) % LANES

        def tolanes(v, c):
            v = jnp.moveaxis(v.reshape(B, P, c), 0, -1)  # (P, c, B)
            v = jnp.moveaxis(v, 1, 0)  # (c, P, B)
            if pad:
                v = jnp.concatenate(
                    [v, jnp.zeros((c, P, pad), v.dtype)], axis=-1)
            return v

        tc = tolanes(jnp.stack([t1, t2, smooth], axis=-1), 3)
        d_t, n_t, q_t = _mpr_merged_pallas(
            polish_iters, tolanes(pos1, 3), tolanes(mat1, 9),
            tolanes(size1, 3), tolanes(mg1[..., None], 1),
            tolanes(pos2, 3), tolanes(mat2, 9), tolanes(size2, 3),
            tolanes(mg2[..., None], 1), tc, interpret=interpret)

        def fromlanes(v, c):
            v = jnp.moveaxis(v[..., :B], 0, 1)  # (P, c, B)
            return jnp.moveaxis(v, -1, 0).reshape(B, P, c)

        dist = fromlanes(d_t, 1)[..., 0]
        n = fromlanes(n_t, 3)
        pos = fromlanes(q_t, 3)
        return (dist, n, pos), (True, True, True)

    return f


@functools.lru_cache(maxsize=32)
def make_mpr_pe(type1: int, type2: int, polish_iters: int):
    """Per-env MPR entry; pallas-batched under vmap on TPU."""
    from flybody_tpu.physics import mpr as _mpr

    @custom_batching.custom_vmap
    def f(pos1, mat1, size1, mg1, pos2, mat2, size2, mg2):
        return _mpr.mpr_penetration(type1, type2, pos1, mat1, size1, pos2,
                                    mat2, size2, margin1=mg1, margin2=mg2,
                                    polish_iters=polish_iters)

    @f.def_vmap
    def _rule(axis_size, in_batched, pos1, mat1, size1, mg1, pos2, mat2,
              size2, mg2):
        from flybody_tpu.ops.dispatch import pallas_enabled
        on_tpu = pallas_enabled('mpr')
        args = [pos1, mat1, size1, mg1, pos2, mat2, size2, mg2]
        if not on_tpu:
            axes = [0 if b else None for b in in_batched]
            out = jax.vmap(lambda *a: _mpr.mpr_penetration(
                type1, type2, a[0], a[1], a[2], a[4], a[5], a[6],
                margin1=a[3], margin2=a[7], polish_iters=polish_iters),
                in_axes=axes)(*args)
            return out, (True, True, True)
        # Broadcast unbatched operands (static sizes/margins) to the batch.
        args = [a if b else jnp.broadcast_to(a[None], (axis_size,)
                                             + a.shape)
                for a, b in zip(args, in_batched)]
        pos1, mat1, size1, mg1, pos2, mat2, size2, mg2 = args
        B, P = pos1.shape[:2]
        pad = (-B) % LANES

        def tolanes(v, c):
            v = jnp.moveaxis(v.reshape(B, P, c), 0, -1)  # (P, c, B)
            v = jnp.moveaxis(v, 1, 0)  # (c, P, B)
            if pad:
                v = jnp.concatenate(
                    [v, jnp.zeros((c, P, pad), v.dtype)], axis=-1)
            return v

        p1 = tolanes(pos1, 3)
        m1 = tolanes(mat1, 9)
        s1 = tolanes(size1, 3)
        g1 = tolanes(mg1[..., None], 1)
        p2 = tolanes(pos2, 3)
        m2 = tolanes(mat2, 9)
        s2 = tolanes(size2, 3)
        g2 = tolanes(mg2[..., None], 1)
        d_t, n_t, q_t = _mpr_pallas(type1, type2, polish_iters,
                                    p1, m1, s1, g1, p2, m2, s2, g2)

        def fromlanes(v, c):
            v = jnp.moveaxis(v[..., :B], 0, 1)  # (P, c, B)
            return jnp.moveaxis(v, -1, 0).reshape(B, P, c)

        dist = fromlanes(d_t, 1)[..., 0]
        n = fromlanes(n_t, 3)
        pos = fromlanes(q_t, 3)
        return (dist, n, pos), (True, True, True)

    return f
