"""Vectorized Minkowski Portal Refinement for convex geom pairs.

MuJoCo collides ellipsoid/cylinder pairs with libccd's MPR; this is an
independent JAX implementation of the same algorithm (XenoCollide,
Snethen 2008), batched over pairs with fixed iteration counts so it jits
and vmaps. Returns penetration depth, normal and a midpoint contact
position like MuJoCo's convex-pair wrapper.

Support functions operate in world frame on (pos, mat, size) triples with
a static geom-type code per batch (pairs are grouped by type statically).

The loop state carries, per portal vertex, the Minkowski point v = a - b
and the witness SUM s = a + b (the contact midpoint only needs
0.5*(pa + pb) = 0.5 * sum_i w_i s_i), which cuts the sequential loops'
HBM-resident carry by a third vs carrying (a, b) separately.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from flybody_tpu.model import spec as _s

_EPS = 1e-12
_DISCOVERY_ITERS = 10
_REFINE_ITERS = 24


def support(gtype: int, pos, mat, size, d):
    """World-frame support point of a geom in world direction d (unit)."""
    if gtype == _s.GEOM_SPHERE:
        return pos + size[..., 0:1] * d
    dl = jnp.einsum('...ij,...i->...j', mat, d)  # R^T d
    if gtype == _s.GEOM_CAPSULE:
        r = size[..., 0:1]
        h = size[..., 1:2]
        axial = jnp.sign(dl[..., 2:3]) * h
        local = jnp.concatenate(
            [jnp.zeros_like(axial), jnp.zeros_like(axial), axial], axis=-1)
        return pos + jnp.einsum('...ij,...j->...i', mat, local) + r * d
    if gtype == _s.GEOM_CYLINDER:
        r = size[..., 0:1]
        h = size[..., 1:2]
        radial = dl[..., :2]
        rn = jnp.linalg.norm(radial, axis=-1, keepdims=True)
        radial_dir = jnp.where(rn > 1e-10, radial / jnp.maximum(rn, _EPS),
                               jnp.zeros_like(radial))
        local = jnp.concatenate(
            [r * radial_dir, jnp.sign(dl[..., 2:3]) * h], axis=-1)
        return pos + jnp.einsum('...ij,...j->...i', mat, local)
    if gtype == _s.GEOM_ELLIPSOID:
        s2n = size * size * dl
        denom = jnp.linalg.norm(size * dl, axis=-1, keepdims=True)
        local = s2n / jnp.maximum(denom, _EPS)
        return pos + jnp.einsum('...ij,...j->...i', mat, local)
    raise NotImplementedError(f'support for geom type {gtype}')


def support_any(tc, pos, mat, size, d):
    """Support with PER-PAIR type dispatch (tc: (...,) int array).

    Evaluates all four convex supports and selects by type code — the
    price of running mixed-type pair sets through ONE batched MPR sweep
    (the merged broadphase path in collision.py) instead of one sweep
    per type pair."""
    sp = support(_s.GEOM_SPHERE, pos, mat, size, d)
    ca = support(_s.GEOM_CAPSULE, pos, mat, size, d)
    cy = support(_s.GEOM_CYLINDER, pos, mat, size, d)
    el = support(_s.GEOM_ELLIPSOID, pos, mat, size, d)
    t = tc[..., None]
    return jnp.where(
        t == _s.GEOM_SPHERE, sp,
        jnp.where(t == _s.GEOM_CAPSULE, ca,
                  jnp.where(t == _s.GEOM_CYLINDER, cy, el)))


def _norm(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), _EPS)


def _dot(a, b):
    return jnp.einsum('...i,...i->...', a, b)


def mpr_penetration(type1, type2, pos1, mat1, size1, pos2, mat2,
                    size2, margin1=None, margin2=None,
                    polish_iters: int = 0, smooth_mask=None):
    """Batched MPR penetration query (canonical XenoCollide formulation).

    Geoms are inflated by their contact margins (Minkowski sum with a ball,
    matching MuJoCo's convex-pair margin handling), so contacts within the
    combined margin report positive distances.

    Returns (dist, normal, pos): dist is the (approximate) signed surface
    distance, or +1 when separated beyond the margins; normal is a unit
    vector from geom1 into geom2 (MuJoCo convention); pos is the contact
    midpoint.
    """
    total_margin = 0.0
    if margin1 is not None:
        total_margin = total_margin + margin1
    if margin2 is not None:
        total_margin = total_margin + margin2

    # Static int type codes -> specialized supports; array type codes ->
    # per-pair dispatch (merged mixed-type path). `smooth_mask` (optional,
    # per pair) gates the strictly-convex polish acceptance in that case.
    _sup1 = (functools.partial(support, type1) if isinstance(type1, int)
             else functools.partial(support_any, type1))
    _sup2 = (functools.partial(support, type2) if isinstance(type2, int)
             else functools.partial(support_any, type2))

    def S(d):
        """Returns (v, s) = (a - b, a + b) of the margin-inflated pair."""
        a = _sup1(pos1, mat1, size1, d)
        b = _sup2(pos2, mat2, size2, -d)
        if margin1 is not None:
            a = a + margin1[..., None] * d
        if margin2 is not None:
            b = b - margin2[..., None] * d
        return a - b, a + b

    dtype = pos1.dtype
    batch = pos1.shape[:-1]

    # v0: interior point of D = G1 ⊖ G2.
    v0 = pos1 - pos2
    v0 = jnp.where(jnp.linalg.norm(v0, axis=-1, keepdims=True) < 1e-10,
                   jnp.zeros_like(v0).at[..., 0].set(1e-7), v0)

    # v1: support toward origin.
    n = _norm(-v0)
    v1, s1 = S(n)
    sep = _dot(v1, n) <= 0

    # v2: perpendicular to (v1, v0).
    n1 = jnp.cross(v1, v0)
    degen = jnp.linalg.norm(n1, axis=-1) < 1e-14
    alt = jnp.cross(v1 - v0, jnp.broadcast_to(
        jnp.asarray([1.0, 0.013, 0.021], dtype), v1.shape))
    alt2 = jnp.cross(v1 - v0, jnp.broadcast_to(
        jnp.asarray([0.021, 1.0, 0.013], dtype), v1.shape))
    alt = jnp.where(jnp.linalg.norm(alt, axis=-1, keepdims=True) < 1e-14,
                    alt2, alt)
    n1 = _norm(jnp.where(degen[..., None], alt, n1))
    v2, s2 = S(n1)
    sep = sep | (_dot(v2, n1) <= 0)

    # Initial portal candidate; enforce winding: n away from v0.
    n2 = jnp.cross(v1 - v0, v2 - v0)
    swap = _dot(n2, v0) > 0
    v1n = jnp.where(swap[..., None], v2, v1)
    s1n = jnp.where(swap[..., None], s2, s1)
    v2n = jnp.where(swap[..., None], v1, v2)
    s2n_ = jnp.where(swap[..., None], s1, s2)
    v1, s1, v2, s2 = v1n, s1n, v2n, s2n_
    n2 = _norm(jnp.where(swap[..., None], -n2, n2))

    v3, s3 = S(n2)
    sep = sep | (_dot(v3, n2) <= 0)

    # --- Discovery: origin ray (from v0) must pass through (v1, v2, v3).
    def discovery(_, carry):
        v1, s1, v2, s2, v3, s3, n, done, sep = carry
        out1 = _dot(jnp.cross(v1, v3), v0) < 0  # origin outside (v1,v0,v3)
        out2 = _dot(jnp.cross(v3, v2), v0) < 0  # origin outside (v3,v0,v2)
        act = ~done & ~sep
        rep2 = act & out1              # v2 <- v3
        rep1 = act & ~out1 & out2      # v1 <- v3
        newly_done = act & ~out1 & ~out2
        done = done | newly_done

        v2_ = jnp.where(rep2[..., None], v3, v2)
        s2_ = jnp.where(rep2[..., None], s3, s2)
        v1_ = jnp.where(rep1[..., None], v3, v1)
        s1_ = jnp.where(rep1[..., None], s3, s1)
        # New candidate normal maintaining winding.
        n_new = jnp.where(rep2[..., None],
                          jnp.cross(v1_ - v0, v3 - v0),
                          jnp.cross(v3 - v0, v2_ - v0))
        n_new = _norm(n_new)
        v3n, s3n = S(n_new)
        cont = rep1 | rep2
        sep = sep | (cont & (_dot(v3n, n_new) <= 0))
        v3_ = jnp.where(cont[..., None], v3n, v3)
        s3_ = jnp.where(cont[..., None], s3n, s3)
        n = jnp.where(cont[..., None], n_new, n)
        return (v1_, s1_, v2_, s2_, v3_, s3_, n, done, sep)

    done0 = jnp.zeros(batch, dtype=bool)
    carry = (v1, s1, v2, s2, v3, s3, n2, done0, sep)
    carry = jax.lax.fori_loop(0, _DISCOVERY_ITERS, discovery, carry)
    v1, s1, v2, s2, v3, s3, _, _, sep = carry

    # --- Refinement.
    def refine(_, carry):
        v1, s1, v2, s2, v3, s3, best_n, best_depth, conv = carry
        n = _norm(jnp.cross(v2 - v1, v3 - v1))
        v4, s4 = S(n)
        depth = _dot(v1, n)
        gap = _dot(v4 - v3, n)
        best_n = jnp.where(conv[..., None], best_n, n)
        best_depth = jnp.where(conv, best_depth, depth)
        conv = conv | (gap < 1e-10)

        d1 = _dot(jnp.cross(v4, v1), v0)
        d2 = _dot(jnp.cross(v4, v2), v0)
        d3 = _dot(jnp.cross(v4, v3), v0)
        rep_v1a = (d1 < 0) & (d2 < 0)
        rep_v3 = (d1 < 0) & (d2 >= 0)
        rep_v2 = (d1 >= 0) & (d3 < 0)
        rep_v1b = (d1 >= 0) & (d3 >= 0)

        def repl(cond, old, new):
            return jnp.where((cond & ~conv)[..., None], new, old)

        v1_ = repl(rep_v1a | rep_v1b, v1, v4)
        s1_ = repl(rep_v1a | rep_v1b, s1, s4)
        v2_ = repl(rep_v2, v2, v4)
        s2_ = repl(rep_v2, s2, s4)
        v3_ = repl(rep_v3, v3, v4)
        s3_ = repl(rep_v3, s3, s4)
        return (v1_, s1_, v2_, s2_, v3_, s3_, best_n, best_depth, conv)

    conv0 = jnp.zeros(batch, dtype=bool)
    bn0 = jnp.zeros(batch + (3,), dtype).at[..., 2].set(1.0)
    bd0 = jnp.zeros(batch, dtype)
    carry = (v1, s1, v2, s2, v3, s3, bn0, bd0, conv0)
    carry = jax.lax.fori_loop(0, _REFINE_ITERS, refine, carry)
    v1, s1, v2, s2, v3, s3, n, depth, _ = carry

    # Witness midpoint: project origin onto the portal plane, barycentric.
    p = depth[..., None] * n
    area = jnp.cross(v2 - v1, v3 - v1)
    w1 = _dot(jnp.cross(v2 - p, v3 - p), area)
    w2 = _dot(jnp.cross(v3 - p, v1 - p), area)
    w3 = _dot(jnp.cross(v1 - p, v2 - p), area)
    wsum = w1 + w2 + w3
    bad = jnp.abs(wsum) < 1e-20
    safe = jnp.where(bad, 1.0, wsum)
    w1 = jnp.where(bad, 1.0, w1 / safe)
    w2 = jnp.where(bad, 0.0, w2 / safe)
    w3 = jnp.where(bad, 0.0, w3 / safe)

    # 0.5 * (pa + pb) = 0.5 * sum_i w_i * (a_i + b_i).
    pos = 0.5 * (w1[..., None] * s1 + w2[..., None] * s2
                 + w3[..., None] * s3)

    if polish_iters:
        # Smooth-pair polish: the penetration depth is min over unit
        # directions u of h(u) = support_D(u)·u, with envelope-theorem
        # gradient x_D(u). Projected gradient descent from the MPR portal
        # normal converges to the exact minimal-translation direction for
        # strictly convex (sphere-swept / ellipsoidal) pairs.
        scale = jnp.maximum(jnp.max(size1, axis=-1),
                            jnp.max(size2, axis=-1))[..., None]

        def polish(_, u):
            xd, _ = S(u)
            grad_t = xd - _dot(xd, u)[..., None] * u
            return _norm(u - 0.3 * grad_t / scale)

        n_p = jax.lax.fori_loop(0, polish_iters, polish, n)
        v_p, s_p = S(n_p)
        depth_p = _dot(v_p, n_p)
        better = depth_p < depth
        if smooth_mask is not None:
            better = better & smooth_mask
        n = jnp.where(better[..., None], n_p, n)
        depth = jnp.where(better, depth_p, depth)
        pos = jnp.where(better[..., None], 0.5 * s_p, pos)

    # MuJoCo normal convention (from geom1 into geom2) = +n empirically.
    # Un-inflate: real distance = total_margin - inflated depth.
    dist = jnp.where(sep, jnp.ones_like(depth), total_margin - depth)
    pos = jnp.where(sep[..., None], jnp.zeros_like(pos), pos)
    return dist, n, pos
