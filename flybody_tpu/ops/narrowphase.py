"""Analytic narrowphase (plane/sphere/capsule pairs) as one Pallas kernel.

The XLA path evaluates each analytic collision group as a chain of
elementwise ops over (B, P, 3) arrays; at batch 8192 the capsule-capsule
group alone streams ~5 GB of temporaries through HBM (~20 ms measured on
v5e, with the plane/sphere groups adding ~12 ms of per-group fixed cost).
This kernel computes EVERY analytic pair type in one launch with all
temporaries VMEM-resident: geometry is pre-gathered to (12, P, 128)
planes, each type segment is processed with static slicing (pairs are
grouped by type), and only dist/pos/normal ever return to HBM.

The math is written once over component tuples and shared verbatim
between the jnp reference (component = (P,) array) and the kernel
(component = (P, 128) plane) — see `_segment_rows`.

Handled type keys (canonical MuJoCo order, geom1.type <= geom2.type):
    (PLANE, SPHERE) k=1      (PLANE, CAPSULE) k=2
    (PLANE, ELLIPSOID) k=1   (PLANE, CYLINDER) k=3
    (SPHERE, SPHERE) k=1     (SPHERE, CAPSULE) k=1
    (CAPSULE, CAPSULE) k=1
Semantics match physics/collision.py's per-group handlers row for row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flybody_tpu.model import spec as _s

LANES = 128
_EPS = 1e-15


# ----------------------------------------------------- component algebra


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _normalize(a):
    n = jnp.sqrt(_dot(a, a))
    return _scale(a, 1.0 / jnp.maximum(n, _EPS)), n


def _where(c, a, b):
    return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]),
            jnp.where(c, a[2], b[2]))


def _matcol(m, j):
    """Column j of a row-major 9-tuple 3x3 matrix."""
    return (m[0 + j], m[3 + j], m[6 + j])


def _matvec(m, v):
    return (m[0] * v[0] + m[1] * v[1] + m[2] * v[2],
            m[3] * v[0] + m[4] * v[1] + m[5] * v[2],
            m[6] * v[0] + m[7] * v[1] + m[8] * v[2])


def _matvec_t(m, v):
    return (m[0] * v[0] + m[3] * v[1] + m[6] * v[2],
            m[1] * v[0] + m[4] * v[1] + m[7] * v[2],
            m[2] * v[0] + m[5] * v[1] + m[8] * v[2])


# ------------------------------------------------------- per-type formulas
# Each returns a list of k (dist, pos, normal) rows; all components keep
# the input plane shape.


def _plane_sphere_row(pp, pn, c, r):
    dist = _dot(_sub(c, pp), pn) - r
    pos = _sub(c, _scale(pn, r + 0.5 * dist))
    return dist, pos, pn


def _rows_plane_sphere(p1, m1, s1, p2, m2, s2):
    pn = _matcol(m1, 2)
    return [_plane_sphere_row(p1, pn, p2, s2[0])]


def _rows_plane_capsule(p1, m1, s1, p2, m2, s2):
    pn = _matcol(m1, 2)
    axis = _matcol(m2, 2)
    r, h = s2[0], s2[1]
    e1 = _add(p2, _scale(axis, h))
    e2 = _sub(p2, _scale(axis, h))
    return [_plane_sphere_row(p1, pn, e1, r),
            _plane_sphere_row(p1, pn, e2, r)]


def _rows_plane_ellipsoid(p1, m1, s1, p2, m2, s2):
    pn = _matcol(m1, 2)
    nl = _matvec_t(m2, pn)
    sx, sy, sz = s2
    denom = jnp.sqrt((sx * nl[0]) ** 2 + (sy * nl[1]) ** 2
                     + (sz * nl[2]) ** 2)
    inv = -1.0 / jnp.maximum(denom, _EPS)
    x_local = (sx * sx * nl[0] * inv, sy * sy * nl[1] * inv,
               sz * sz * nl[2] * inv)
    point = _add(p2, _matvec(m2, x_local))
    dist = _dot(_sub(point, p1), pn)
    pos = _sub(point, _scale(pn, 0.5 * dist))
    return [(dist, pos, pn)]


def _rows_plane_cylinder(p1, m1, s1, p2, m2, s2):
    """2 side-line contacts when lying, else 3 lower-cap rim candidates
    (deepest, +-120 deg) — matches collision._h_plane_cylinder."""
    n = _matcol(m1, 2)
    a = _matcol(m2, 2)
    r, h = s2[0], s2[1]
    ca = _dot(a, n)

    lower = _sub(p2, _scale(a, jnp.sign(ca) * h))
    u = _sub(n, _scale(a, ca))
    u_n, un = _normalize(u)
    u = _where(un > 1e-12, u_n, _matcol(m2, 0))
    w = _cross(a, u)
    deep = _sub(lower, _scale(u, r))
    c120, s120 = -0.5, 0.866025403784439
    rim2 = _sub(lower, _add(_scale(u, r * c120), _scale(w, r * s120)))
    rim3 = _sub(lower, _sub(_scale(u, r * c120), _scale(w, r * s120)))

    nperp, npn = _normalize(_sub(n, _scale(a, ca)))
    side1 = _sub(_add(p2, _scale(a, h)), _scale(nperp, r))
    side2 = _sub(_sub(p2, _scale(a, h)), _scale(nperp, r))

    lying = jnp.abs(ca) < 1e-4
    pts = [_where(lying, side1, deep), _where(lying, side2, rim2),
           _where(lying, side2, rim3)]
    rows = []
    for i, pt in enumerate(pts):
        dist = _dot(_sub(pt, p1), n)
        if i == 2:  # duplicate third side contact: deactivate when lying
            dist = jnp.where(lying, 1e10, dist)
        pos = _sub(pt, _scale(n, 0.5 * dist))
        rows.append((dist, pos, n))
    return rows


def _sphere_sphere_row(c1, r1, c2, r2):
    d = _sub(c2, c1)
    n, dn = _normalize(d)
    dist = dn - r1 - r2
    pos = _add(c1, _scale(n, r1 + 0.5 * dist))
    return dist, pos, n


def _rows_sphere_sphere(p1, m1, s1, p2, m2, s2):
    return [_sphere_sphere_row(p1, s1[0], p2, s2[0])]


def _rows_sphere_capsule(p1, m1, s1, p2, m2, s2):
    a = _matcol(m2, 2)
    h = s2[1]
    t = jnp.clip(_dot(_sub(p1, p2), a), -h, h)
    closest = _add(p2, _scale(a, t))
    return [_sphere_sphere_row(p1, s1[0], closest, s2[0])]


def _rows_capsule_capsule(p1, m1, s1, p2, m2, s2):
    a1 = _matcol(m1, 2)
    a2 = _matcol(m2, 2)
    r1, h1 = s1[0], s1[1]
    r2, h2 = s2[0], s2[1]
    # Closest points between segments p +- h*a (collision._seg_seg_closest).
    rvec = _sub(p1, p2)
    a_ = _dot(a1, a1)
    e_ = _dot(a2, a2)
    f_ = _dot(a2, rvec)
    cd = _dot(a1, rvec)
    b_ = _dot(a1, a2)
    denom = a_ * e_ - b_ * b_
    s = jnp.where(denom > 1e-14,
                  (b_ * f_ - cd * e_) / jnp.maximum(denom, _EPS), 0.0)
    s = jnp.clip(s, -h1, h1)
    t = (b_ * s + f_) / jnp.maximum(e_, _EPS)
    t_cl = jnp.clip(t, -h2, h2)
    s = jnp.clip((b_ * t_cl - cd) / jnp.maximum(a_, _EPS), -h1, h1)
    t = jnp.clip((b_ * s + f_) / jnp.maximum(e_, _EPS), -h2, h2)
    q1 = _add(p1, _scale(a1, s))
    q2 = _add(p2, _scale(a2, t))
    # Coincident closest points: perpendicular fallback.
    d = _sub(q2, q1)
    tiny = jnp.sqrt(_dot(d, d)) < 1e-12
    fb = _cross(a1, a2)
    fbn = jnp.sqrt(_dot(fb, fb))
    ex = (jnp.ones_like(fbn), jnp.zeros_like(fbn), jnp.zeros_like(fbn))
    fb = _where(fbn > 1e-12, _scale(fb, 1.0 / jnp.maximum(fbn, _EPS)),
                _cross(a1, ex))
    q2 = _where(tiny, _add(q2, _scale(fb, 1e-12)), q2)
    return [_sphere_sphere_row(q1, r1, q2, r2)]


_ROW_FNS = {
    (_s.GEOM_PLANE, _s.GEOM_SPHERE): _rows_plane_sphere,
    (_s.GEOM_PLANE, _s.GEOM_CAPSULE): _rows_plane_capsule,
    (_s.GEOM_PLANE, _s.GEOM_ELLIPSOID): _rows_plane_ellipsoid,
    (_s.GEOM_PLANE, _s.GEOM_CYLINDER): _rows_plane_cylinder,
    (_s.GEOM_SPHERE, _s.GEOM_SPHERE): _rows_sphere_sphere,
    (_s.GEOM_SPHERE, _s.GEOM_CAPSULE): _rows_sphere_capsule,
    (_s.GEOM_CAPSULE, _s.GEOM_CAPSULE): _rows_capsule_capsule,
}

ANALYTIC_KEYS = frozenset(_ROW_FNS)


def _segment_rows(key, c1, c2, s1, s2):
    """Rows for one type segment. c1/c2: 12-component tuples
    [pos | mat]; s1/s2: 3-component size tuples. Returns list of
    (dist, pos3, normal3) with components shaped like the inputs."""
    p1, m1 = c1[:3], c1[3:12]
    p2, m2 = c2[:3], c2[3:12]
    return _ROW_FNS[key](p1, m1, s1, p2, m2, s2)


# ------------------------------------------------------------------ kernel


def _np_kernel(segs, c1_ref, c2_ref, sz_ref, d_ref, p_ref, n_ref):
    """Outputs in ROW-MAJOR segment layout: row r of pair j lands at
    slot slo + r*npairs + j (contiguous writes — no strided stores in
    Mosaic). The wrapper permutes back to canonical pair-major order."""
    for (key, plo, phi, slo, k) in segs:
        npairs = phi - plo
        c1 = tuple(c1_ref[i, plo:phi, :] for i in range(12))
        c2 = tuple(c2_ref[i, plo:phi, :] for i in range(12))
        s1 = tuple(sz_ref[i, plo:phi, :] for i in range(3))
        s2 = tuple(sz_ref[3 + i, plo:phi, :] for i in range(3))
        rows = _segment_rows(key, c1, c2, s1, s2)
        for r, (dist, pos, nrm) in enumerate(rows):
            lo = slo + r * npairs
            d_ref[0, lo:lo + npairs, :] = dist
            for i in range(3):
                p_ref[i, lo:lo + npairs, :] = pos[i]
                n_ref[i, lo:lo + npairs, :] = nrm[i]


@functools.partial(jax.jit, static_argnames=('segs', 'n_slots',
                                             'interpret'))
def _np_pallas(segs, n_slots, c1_t, c2_t, sz_t, interpret=False):
    P = c1_t.shape[1]
    B = c1_t.shape[-1]
    grid = (B // LANES,)

    def spec(c, rows):
        return pl.BlockSpec((c, rows, LANES), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_np_kernel, segs),
        out_shape=(jax.ShapeDtypeStruct((1, n_slots, B), c1_t.dtype),
                   jax.ShapeDtypeStruct((3, n_slots, B), c1_t.dtype),
                   jax.ShapeDtypeStruct((3, n_slots, B), c1_t.dtype)),
        grid=grid,
        in_specs=[spec(12, P), spec(12, P), spec(6, P)],
        out_specs=(spec(1, n_slots), spec(3, n_slots), spec(3, n_slots)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(c1_t, c2_t, sz_t)


def _reference(segs, n_slots, c1, c2, sz):
    """Per-env jnp path: same math, components are (P,) slices. Builds
    the same ROW-MAJOR layout as the kernel (wrapper permutes after)."""
    d_segs, p_segs, n_segs = [], [], []
    for (key, plo, phi, slo, k) in segs:
        c1t = tuple(c1[plo:phi, i] for i in range(12))
        c2t = tuple(c2[plo:phi, i] for i in range(12))
        s1 = tuple(sz[plo:phi, i] for i in range(3))
        s2 = tuple(sz[plo:phi, 3 + i] for i in range(3))
        rows = _segment_rows(key, c1t, c2t, s1, s2)
        for r, (dist, pos, nrm) in enumerate(rows):
            d_segs.append(dist)
            p_segs.append(jnp.stack(pos, -1))
            n_segs.append(jnp.stack(nrm, -1))
    return (jnp.concatenate(d_segs), jnp.concatenate(p_segs),
            jnp.concatenate(n_segs))


def rowmajor_to_canonical_perm(segs, n_slots):
    """Static permutation: canonical slot (pair-major) <- row-major
    kernel index. out[s_canonical] = kernel_index."""
    perm = np.zeros((n_slots,), dtype=np.int64)
    for (key, plo, phi, slo, k) in segs:
        npairs = phi - plo
        for j in range(npairs):
            for r in range(k):
                perm[slo + j * k + r] = slo + r * npairs + j
    return perm


@functools.lru_cache(maxsize=8)
def make_narrowphase_pe(segs: tuple, n_slots: int):
    """Per-env analytic narrowphase over all segments; pallas-batched
    under vmap on TPU.

    segs: tuple of (key, pair_lo, pair_hi, slot_lo, k). Args per env:
    c1, c2 (P, 12) gathered [pos | xmat] rows; sz (P, 6) sizes
    [size1 | size2] (unbatched OK). Returns (dist (S,), pos (S, 3),
    normal (S, 3))."""

    perm = tuple(rowmajor_to_canonical_perm(segs, n_slots).tolist())

    @custom_batching.custom_vmap
    def f(c1, c2, sz):
        d, p, n = _reference(segs, n_slots, c1, c2, sz)
        pm = jnp.asarray(np.array(perm))
        return d[pm], p[pm], n[pm]

    @f.def_vmap
    def _rule(axis_size, in_batched, c1, c2, sz):
        from flybody_tpu.ops.dispatch import pallas_enabled
        pm = jnp.asarray(np.array(perm))
        if not (in_batched[0] and in_batched[1]) or \
                not pallas_enabled('narrow'):
            axes = tuple(0 if b else None for b in in_batched)
            d, p, n = jax.vmap(
                lambda a, b, s: _reference(segs, n_slots, a, b, s),
                in_axes=axes)(c1, c2, sz)
            return (d[:, pm], p[:, pm], n[:, pm]), (True, True, True)
        B = c1.shape[0]
        pad = (-B) % LANES

        def tolanes(v, batched):
            if not batched:
                v = jnp.broadcast_to(v[None], (B,) + v.shape)
            v = jnp.swapaxes(jnp.moveaxis(v, 0, -1), 0, 1)  # (C, P, B)
            if pad:
                v = jnp.concatenate(
                    [v, jnp.zeros(v.shape[:-1] + (pad,), v.dtype)],
                    axis=-1)
            return v

        d_t, p_t, n_t = _np_pallas(
            segs, n_slots, tolanes(c1, True), tolanes(c2, True),
            tolanes(sz, in_batched[2]))
        d = jnp.moveaxis(d_t[0, :, :B], -1, 0)
        p = jnp.moveaxis(jnp.swapaxes(p_t[:, :, :B], 0, 1), -1, 0)
        n = jnp.moveaxis(jnp.swapaxes(n_t[:, :, :B], 0, 1), -1, 0)
        return (d[:, pm], p[:, pm], n[:, pm]), (True, True, True)

    return f
