"""Collision detection: static pair tables, analytic narrowphase for the
dominant pair types, MPR for general convex pairs.

Pair filtering replicates MuJoCo's rules (contype/conaffinity compatibility,
same-body/weld and parent-child filters, explicit exclude list from
fruitfly.xml:733-761). Pairs are canonicalized so geom1's type <= geom2's
type, matching MuJoCo's normal convention (normal points from geom1 into
geom2).

TPU-first: all candidate pairs are evaluated every step as masked vector
ops (the fly has ~2.3k self-pairs — cheap next to CRB); the constraint
solver then gathers the top-K deepest contacts into its static-size rows.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from flybody_tpu.model import spec as _s
from flybody_tpu.model.spec import FlyModel
from flybody_tpu.physics import mpr as _mpr
from flybody_tpu.physics.state import Data

# Max contacts a pair slot can produce, by canonical (type1, type2).
_PAIR_NCON = {
    (_s.GEOM_PLANE, _s.GEOM_SPHERE): 1,
    (_s.GEOM_PLANE, _s.GEOM_CAPSULE): 2,
    (_s.GEOM_PLANE, _s.GEOM_ELLIPSOID): 1,
    (_s.GEOM_PLANE, _s.GEOM_CYLINDER): 3,
    (_s.GEOM_SPHERE, _s.GEOM_SPHERE): 1,
    (_s.GEOM_SPHERE, _s.GEOM_CAPSULE): 1,
    (_s.GEOM_SPHERE, _s.GEOM_ELLIPSOID): 1,
    (_s.GEOM_SPHERE, _s.GEOM_CYLINDER): 1,
    (_s.GEOM_CAPSULE, _s.GEOM_CAPSULE): 1,
    (_s.GEOM_CAPSULE, _s.GEOM_ELLIPSOID): 1,
    # MuJoCo's nativeccd deterministically emits 3 near-coincident points
    # (spread ~6e-5 cm, identical dist — measured 260/260 occurrences
    # over a 3000-step settled-fly rollout) for capsule-cylinder, which
    # triples the effective contact stiffness; we replicate the 3-row
    # manifold so solver-level forces match.
    (_s.GEOM_CAPSULE, _s.GEOM_CYLINDER): 3,
    (_s.GEOM_ELLIPSOID, _s.GEOM_ELLIPSOID): 1,
    (_s.GEOM_ELLIPSOID, _s.GEOM_CYLINDER): 1,
    (_s.GEOM_CYLINDER, _s.GEOM_CYLINDER): 1,
}

def _pair_rows(key) -> int:
    """Contact slots emitted per candidate pair.

    Analytic plane manifolds (plane-capsule 2 pts, plane-cylinder 3 pts)
    are genuinely distinct contact points and keep one slot each. MPR
    multi-point manifolds are REPLICATED rows (MuJoCo's nativeccd emits
    near-coincident points with identical dist/normal — see _PAIR_NCON
    note), which are exactly equivalent in the soft-constraint model to
    ONE row with nrep-scaled stiffness (n identical rows of weight D
    contribute n*D to cost/gradient/Hessian and total force): they
    collapse to a single slot with slot_nrep = n, shrinking the slot
    tables and freeing top-K contact budget."""
    return 1 if key in _MPR_PAIRS else _PAIR_NCON[key]


def _pair_nrep(key) -> int:
    """Stiffness replication factor folded into the collapsed slot."""
    return _PAIR_NCON[key] if key in _MPR_PAIRS else 1


# Pairs handled by MPR rather than analytic formulas.
_MPR_PAIRS = {
    (_s.GEOM_SPHERE, _s.GEOM_ELLIPSOID),
    (_s.GEOM_SPHERE, _s.GEOM_CYLINDER),
    (_s.GEOM_CAPSULE, _s.GEOM_ELLIPSOID),
    (_s.GEOM_CAPSULE, _s.GEOM_CYLINDER),
    (_s.GEOM_ELLIPSOID, _s.GEOM_ELLIPSOID),
    (_s.GEOM_ELLIPSOID, _s.GEOM_CYLINDER),
    (_s.GEOM_CYLINDER, _s.GEOM_CYLINDER),
}


@functools.lru_cache(maxsize=8)
def pair_tables(meta: _s.Meta, terrain: bool = False):
    """Static candidate-pair tables grouped by canonical type pair.

    With terrain=True, heightfield candidate slots (terrain.py) are appended
    after the geom-pair slots, in terrain_tables order: slot_geom1 = -1
    (pseudo-geom), slot_body1 = 0 (world), matching how collide() appends
    the terrain contact rows."""
    ngeom = meta.ngeom
    parent = np.array(meta.body_parentid)
    weld = np.array(meta.body_weldid)
    gtype = np.array(meta.geom_type)
    gbody = np.array(meta.geom_bodyid)
    contype = np.array(meta.geom_contype)
    conaff = np.array(meta.geom_conaffinity)
    excl = set(meta.exclude_pairs)

    groups: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for g1 in range(ngeom):
        for g2 in range(g1 + 1, ngeom):
            b1, b2 = gbody[g1], gbody[g2]
            if b1 == b2 or weld[b1] == weld[b2]:
                continue
            w1, w2 = weld[b1], weld[b2]
            pw1, pw2 = weld[parent[w1]], weld[parent[w2]]
            # Parent-child filter (world parent exempt).
            if (w1 == pw2 and w2 != 0) or (w2 == pw1 and w1 != 0):
                continue
            if (int(b1), int(b2)) in excl or (int(b2), int(b1)) in excl:
                continue
            if not ((contype[g1] & conaff[g2]) or (contype[g2] & conaff[g1])):
                continue
            # Canonical order by type (MuJoCo convention).
            a, b = (g1, g2) if gtype[g1] <= gtype[g2] else (g2, g1)
            key = (int(gtype[a]), int(gtype[b]))
            if key not in _PAIR_NCON:
                raise NotImplementedError(f'collision pair type {key}')
            groups.setdefault(key, []).append((a, b))

    out = {}
    slot_geom1, slot_geom2, slot_condim, slot_nrep = [], [], [], []
    condim = np.array(meta.geom_condim)
    prio = np.array(meta.geom_priority)
    for key in sorted(groups):
        g1 = np.array([p[0] for p in groups[key]])
        g2 = np.array([p[1] for p in groups[key]])
        k = _pair_rows(key)
        nrep = _pair_nrep(key)
        out[key] = (g1, g2, k)
        for p1, p2 in groups[key]:
            if prio[p1] != prio[p2]:
                cd = condim[p1] if prio[p1] > prio[p2] else condim[p2]
            else:
                cd = max(condim[p1], condim[p2])
            slot_geom1 += [p1] * k
            slot_geom2 += [p2] * k
            slot_condim += [int(cd)] * k
            slot_nrep += [float(nrep)] * k

    slot_geom1 = np.array(slot_geom1, dtype=np.int64)
    slot_geom2 = np.array(slot_geom2, dtype=np.int64)
    slot_body1 = gbody[slot_geom1]
    slot_body2 = gbody[slot_geom2]
    slot_condim = np.array(slot_condim, dtype=np.int64)
    slot_nrep = np.array(slot_nrep, dtype=np.float64)

    if terrain:
        from flybody_tpu.physics import terrain as _terr
        ttb = _terr.terrain_tables(meta)
        slot_geom1 = np.concatenate(
            [slot_geom1, np.full(ttb['nslot'], -1, dtype=np.int64)])
        slot_geom2 = np.concatenate([slot_geom2, ttb['slot_geom']])
        slot_body1 = np.concatenate(
            [slot_body1, np.zeros(ttb['nslot'], dtype=np.int64)])
        slot_body2 = np.concatenate([slot_body2, ttb['slot_body']])
        slot_condim = np.concatenate([slot_condim, ttb['slot_condim']])
        slot_nrep = np.concatenate(
            [slot_nrep, np.ones(ttb['nslot'], dtype=np.float64)])

    return dict(
        groups=out,
        slot_geom1=slot_geom1,
        slot_geom2=slot_geom2,
        slot_condim=slot_condim,
        slot_body1=slot_body1,
        slot_body2=slot_body2,
        slot_nrep=slot_nrep,
        nslot=len(slot_geom1),
    )


@functools.lru_cache(maxsize=8)
def self_pair_mask(meta: _s.Meta, terrain: bool = False):
    """Slot mask: both geoms rooted at the SAME non-world kinematic root,
    i.e. fly-self contacts (reference fruitfly.py:694-700). Root-equality
    (rather than a thorax lookup) keeps the semantics per-fly in
    multi-fly scenes."""
    tb = pair_tables(meta, terrain)
    root = np.array(meta.body_rootid)
    r1 = root[tb['slot_body1']]
    r2 = root[tb['slot_body2']]
    return (r1 == r2) & (r1 != 0)


@struct.dataclass
class CompactBlock:
    """A broadphase-compacted candidate block (P closest pairs of some
    family), carrying everything make_efc needs — gathered through the
    broadphase one-hot GEMM, never scattered back to full slots."""

    idx: jax.Array  # (P,) float global slot ids (exact small ints)
    dist: jax.Array  # (P,)
    pos: jax.Array  # (P, 3)
    normal: jax.Array  # (P, 3)
    params: jax.Array  # (P, 14) efc_slot_table rows


@struct.dataclass
class Contact:
    """Candidate contact slots.

    Dense mode (collide(compact=False), the parity/test API): dist/pos/
    normal cover ALL S slots in pair_tables order and blocks is empty.

    Compact mode (engine perf path): dist/pos/normal cover only the
    plane/sphere (+terrain) slots — global ids dense_slot_ids() — while
    the big pair families (capsule-capsule, merged MPR) arrive as
    CompactBlocks of their P closest candidates; make_efc feeds the
    blocks straight into its top-K selection.

    Only state-dependent fields live here: contact parameters (friction,
    solref, solimp, margins) are pure functions of the model and come from
    slot_params() — keeping them out of the vmapped collide output avoids
    broadcasting ~2/3 of the struct across the env batch."""

    dist: jax.Array  # (S,) or (S_dense,)
    pos: jax.Array  # (·, 3)
    normal: jax.Array  # (·, 3), geom1 -> geom2
    blocks: tuple = ()  # tuple[CompactBlock, ...]


class SlotParams(NamedTuple):
    """Per-slot contact parameters (model constants, unbatched)."""

    friction: jax.Array  # (S, 5)
    solref: jax.Array  # (S, 2)
    solimp: jax.Array  # (S, 5)
    margin: jax.Array  # (S,)
    includemargin: jax.Array  # (S,) = margin - gap


def slot_params(model: FlyModel, terrain: bool = False) -> SlotParams:
    """Mixed contact parameters for every slot, in collide() slot order.

    Pure function of the model (MuJoCo 3.x mixing; margin = SUM of geom
    margins, includemargin == margin) — constant-folded inside jit and
    never batched under vmap."""
    meta = model.meta
    tb = pair_tables(meta)
    frictions, solrefs, solimps, margins, incmargins = [], [], [], [], []
    for key, (g1, g2, k) in tb['groups'].items():
        fr, sr, si, mg, im = _combine_params(model, g1, g2)
        rep = lambda x: jnp.repeat(x, k, axis=0)
        frictions.append(rep(fr))
        solrefs.append(rep(sr))
        solimps.append(rep(si))
        margins.append(rep(mg))
        incmargins.append(rep(im))
    if terrain:
        from flybody_tpu.physics import terrain as _terr
        ttb = _terr.terrain_tables(meta)
        tfr, tsr, tsi, tmg = _terr._terrain_params(model, ttb)
        frictions.append(tfr)
        solrefs.append(tsr)
        solimps.append(tsi)
        margins.append(tmg)
        incmargins.append(tmg)
    return SlotParams(
        friction=jnp.concatenate(frictions),
        solref=jnp.concatenate(solrefs),
        solimp=jnp.concatenate(solimps),
        margin=jnp.concatenate(margins),
        includemargin=jnp.concatenate(incmargins),
    )


def _combine_params(model: FlyModel, g1: np.ndarray, g2: np.ndarray):
    """MuJoCo contact-parameter mixing (equal-priority path; the fly model
    has all priorities equal — validated at table build)."""
    dtype = model.geom_friction.dtype
    meta = model.meta
    prio = np.array(meta.geom_priority)
    f1 = model.geom_friction[g1]
    f2 = model.geom_friction[g2]
    p1 = jnp.asarray((prio[g1] > prio[g2]).astype(np.float64), dtype)[:, None]
    p2 = jnp.asarray((prio[g2] > prio[g1]).astype(np.float64), dtype)[:, None]
    peq = 1.0 - p1 - p2
    fmax = jnp.maximum(f1, f2)
    f3 = peq * fmax + p1 * f1 + p2 * f2
    friction = jnp.stack([f3[:, 0], f3[:, 0], f3[:, 1], f3[:, 2], f3[:, 2]],
                         axis=-1)

    # solmix weighting.
    m1 = model.geom_solmix[g1]
    m2 = model.geom_solmix[g2]
    both_pos = (m1 >= 1e-15) & (m2 >= 1e-15)
    w1 = jnp.where(both_pos, m1 / jnp.maximum(m1 + m2, 1e-15),
                   jnp.where(m1 >= 1e-15, 1.0,
                             jnp.where(m2 >= 1e-15, 0.0, 0.5)))
    w2 = 1.0 - w1
    sr1 = model.geom_solref[g1]
    sr2 = model.geom_solref[g2]
    # Standard (positive timeconst) -> weighted avg; direct (<=0) -> min.
    standard = (sr1[:, 0] > 0) & (sr2[:, 0] > 0)
    solref = jnp.where(standard[:, None],
                       w1[:, None] * sr1 + w2[:, None] * sr2,
                       jnp.minimum(sr1, sr2))
    solimp_mix = (w1[:, None] * model.geom_solimp[g1]
                  + w2[:, None] * model.geom_solimp[g2])
    solref = peq * solref + p1 * sr1 + p2 * sr2
    solimp = (peq * solimp_mix + p1 * model.geom_solimp[g1]
              + p2 * model.geom_solimp[g2])

    # MuJoCo 3.x semantics (validated empirically): combined margin is the
    # SUM of geom margins; `gap` no longer excludes contacts from the
    # solver, so includemargin == margin.
    margin = model.geom_margin[g1] + model.geom_margin[g2]
    return friction, solref, solimp, margin, margin


# -----------------------------------------------------------------------------
# Analytic narrowphase. All handlers take a PairGeo of pre-gathered per-pair
# geometry and return (dist (P,k), pos (P,k,3), normal (P,k,3)) with
# k = _PAIR_NCON of the pair type.
#
# Gather discipline (measured on v5e at batch 8192): a traced row gather
# costs ~8-25 ms while a single static gather of a CONCATENATED
# [xpos | xmat] table costs ~2-4 ms and a one-hot matmul gather ~2.7 ms.
# So collide() builds one (ngeom, 12) table per env and every group does
# exactly one static gather per side; the MPR broadphase path gathers its
# top-P candidates with one-hot matmuls on the MXU.


class PairGeo(NamedTuple):
    """Per-pair gathered geometry for one candidate group (P pairs)."""

    pos1: jax.Array  # (P, 3)
    mat1: jax.Array  # (P, 3, 3)
    size1: jax.Array  # (P, 3)
    mg1: jax.Array  # (P,)
    pos2: jax.Array  # (P, 3)
    mat2: jax.Array  # (P, 3, 3)
    size2: jax.Array  # (P, 3)
    mg2: jax.Array  # (P,)


def _geom_cat(data: Data) -> jax.Array:
    """Concatenated per-geom pose table [xpos | xmat rows]: (ngeom, 12)."""
    n = data.geom_xpos.shape[0]
    return jnp.concatenate(
        [data.geom_xpos, data.geom_xmat.reshape(n, 9)], axis=-1)


def _split_cat(c):
    """(P, 12) -> pos (P, 3), mat (P, 3, 3)."""
    return c[:, :3], c[:, 3:12].reshape(-1, 3, 3)


def _gather_group(model: FlyModel, gcat: jax.Array, g1, g2) -> PairGeo:
    """One static gather per side from the concatenated pose table."""
    c1 = gcat[jnp.asarray(g1)]
    c2 = gcat[jnp.asarray(g2)]
    pos1, mat1 = _split_cat(c1)
    pos2, mat2 = _split_cat(c2)
    size = jnp.asarray(model.geom_size)
    mg = jnp.asarray(model.geom_margin)
    return PairGeo(pos1=pos1, mat1=mat1, size1=size[np.asarray(g1)],
                   mg1=mg[np.asarray(g1)],
                   pos2=pos2, mat2=mat2, size2=size[np.asarray(g2)],
                   mg2=mg[np.asarray(g2)])


def _plane_sphere(pp, pn, c, r):
    dist = jnp.einsum('pi,pi->p', c - pp, pn) - r
    pos = c - pn * (r[:, None] + 0.5 * dist[:, None])
    return dist[:, None], pos[:, None], jnp.broadcast_to(
        pn[:, None], pos[:, None].shape)


def _h_plane_sphere(pg: PairGeo):
    return _plane_sphere(pg.pos1, pg.mat1[:, :, 2], pg.pos2,
                         pg.size2[:, 0])


def _h_plane_capsule(pg: PairGeo):
    pp = pg.pos1
    pn = pg.mat1[:, :, 2]
    c = pg.pos2
    axis = pg.mat2[:, :, 2]
    r = pg.size2[:, 0]
    h = pg.size2[:, 1]
    d1, p1, n1 = _plane_sphere(pp, pn, c + h[:, None] * axis, r)
    d2, p2, n2 = _plane_sphere(pp, pn, c - h[:, None] * axis, r)
    return (jnp.concatenate([d1, d2], 1), jnp.concatenate([p1, p2], 1),
            jnp.concatenate([n1, n2], 1))


def _h_plane_ellipsoid(pg: PairGeo):
    pp = pg.pos1
    pn = pg.mat1[:, :, 2]
    c = pg.pos2
    R = pg.mat2
    size = pg.size2
    nl = jnp.einsum('pij,pi->pj', R, pn)  # R^T n
    denom = jnp.linalg.norm(size * nl, axis=-1, keepdims=True)
    x_local = -(size * size * nl) / jnp.maximum(denom, 1e-15)
    point = c + jnp.einsum('pij,pj->pi', R, x_local)
    dist = jnp.einsum('pi,pi->p', point - pp, pn)
    pos = point - 0.5 * dist[:, None] * pn
    return dist[:, None], pos[:, None], jnp.broadcast_to(
        pn[:, None], pos[:, None].shape)


def _h_plane_cylinder(pg: PairGeo):
    """Plane-cylinder: 2 side-line contacts when lying, else 3 lower-cap rim
    candidates at azimuths (deepest, ±120°). Matches observed MuJoCo
    behavior; non-penetrating candidates are masked by dist."""
    pp = pg.pos1
    n = pg.mat1[:, :, 2]
    c = pg.pos2
    a = pg.mat2[:, :, 2]
    r = pg.size2[:, 0:1]
    h = pg.size2[:, 1:2]
    ca = jnp.einsum('pi,pi->p', a, n)[:, None]  # cos(axis, normal)

    # Rim mode: lower cap center and in-disk downhill direction.
    lower = c - jnp.sign(ca) * h * a
    u = n - ca * a  # component of n in disk plane (points uphill)
    un = jnp.linalg.norm(u, axis=-1, keepdims=True)
    u = jnp.where(un > 1e-12, u / jnp.maximum(un, 1e-15),
                  pg.mat2[:, :, 0])
    w = jnp.cross(a, u)
    deep = lower - r * u
    rim2 = lower - r * (-0.5 * u + 0.866025403784439 * w)
    rim3 = lower - r * (-0.5 * u - 0.866025403784439 * w)
    rim = jnp.stack([deep, rim2, rim3], axis=1)

    # Side mode (|cos| ~ 0): two cap-center points pushed down by r along
    # the in-plane normal.
    nperp = n - ca * a
    npn = jnp.linalg.norm(nperp, axis=-1, keepdims=True)
    nperp = nperp / jnp.maximum(npn, 1e-15)
    side1 = c + h * a - r * nperp
    side2 = c - h * a - r * nperp
    side = jnp.stack([side1, side2, side2], axis=1)  # 3rd duplicates

    lying = (jnp.abs(ca) < 1e-4)[:, :, None]
    pts = jnp.where(lying[:, 0:1], side, rim)
    dist = jnp.einsum('pki,pi->pk', pts - pp[:, None], n)
    # Duplicate third side contact: deactivate.
    dist = jnp.where(lying[:, 0] & (jnp.arange(3) == 2)[None, :],
                     jnp.full_like(dist, 1e10), dist)
    pos = pts - 0.5 * dist[..., None] * n[:, None]
    normal = jnp.broadcast_to(n[:, None], pos.shape)
    return dist, pos, normal


def _sphere_sphere(c1, r1, c2, r2):
    d = c2 - c1
    dn = jnp.linalg.norm(d, axis=-1)
    n = d / jnp.maximum(dn[:, None], 1e-15)
    dist = dn - r1 - r2
    pos = c1 + n * (r1 + 0.5 * dist)[:, None]
    return dist[:, None], pos[:, None], n[:, None]


def _h_sphere_sphere(pg: PairGeo):
    return _sphere_sphere(pg.pos1, pg.size1[:, 0], pg.pos2,
                          pg.size2[:, 0])


def _h_sphere_capsule(pg: PairGeo):
    c1 = pg.pos1
    r1 = pg.size1[:, 0]
    c2 = pg.pos2
    a = pg.mat2[:, :, 2]
    r2 = pg.size2[:, 0]
    h = pg.size2[:, 1]
    t = jnp.clip(jnp.einsum('pi,pi->p', c1 - c2, a), -h, h)
    closest = c2 + t[:, None] * a
    return _sphere_sphere(c1, r1, closest, r2)


def _seg_seg_closest(p1, d1, h1, p2, d2, h2):
    """Closest points between segments p±h*d (batched)."""
    r = p1 - p2
    a = jnp.einsum('pi,pi->p', d1, d1)
    e = jnp.einsum('pi,pi->p', d2, d2)
    f = jnp.einsum('pi,pi->p', d2, r)
    cdot = jnp.einsum('pi,pi->p', d1, r)
    b = jnp.einsum('pi,pi->p', d1, d2)
    denom = a * e - b * b
    # Line-line parameters, clamped (standard segment-segment algorithm).
    s = jnp.where(denom > 1e-14, (b * f - cdot * e) / jnp.maximum(
        denom, 1e-15), 0.0)
    s = jnp.clip(s, -h1, h1)
    t = (b * s + f) / jnp.maximum(e, 1e-15)
    t_cl = jnp.clip(t, -h2, h2)
    s = jnp.clip((b * t_cl - cdot) / jnp.maximum(a, 1e-15), -h1, h1)
    t = jnp.clip((b * s + f) / jnp.maximum(e, 1e-15), -h2, h2)
    return p1 + s[:, None] * d1, p2 + t[:, None] * d2


def _h_capsule_capsule(pg: PairGeo):
    c1 = pg.pos1
    a1 = pg.mat1[:, :, 2]
    r1 = pg.size1[:, 0]
    h1 = pg.size1[:, 1]
    c2 = pg.pos2
    a2 = pg.mat2[:, :, 2]
    r2 = pg.size2[:, 0]
    h2 = pg.size2[:, 1]
    q1, q2 = _seg_seg_closest(c1, a1, h1, c2, a2, h2)
    # Coincident closest points (crossing segments): fall back to a
    # perpendicular of the first axis.
    d = q2 - q1
    tiny = jnp.linalg.norm(d, axis=-1, keepdims=True) < 1e-12
    fallback = jnp.cross(a1, a2)
    fn = jnp.linalg.norm(fallback, axis=-1, keepdims=True)
    fallback = jnp.where(fn > 1e-12, fallback / jnp.maximum(fn, 1e-15),
                         jnp.cross(a1, jnp.broadcast_to(
                             jnp.asarray([1.0, 0.0, 0.0], d.dtype), d.shape)))
    q2_adj = jnp.where(tiny, q2 + 1e-12 * fallback, q2)
    return _sphere_sphere(q1, r1, q2_adj, r2)


def _mpr_handler(t1, t2):
    # Strictly convex (sphere-swept/ellipsoidal) pairs get a smooth-surface
    # polish after MPR; cylinder edges are non-smooth, so they do not.
    smooth_pair = _s.GEOM_CYLINDER not in (t1, t2)

    def h(pg: PairGeo):
        # Under vmap on TPU this dispatches the VMEM-resident pallas MPR
        # kernel (ops/mpr_kernel.py); otherwise the plain jnp MPR runs.
        # Multi-point MPR manifolds collapse to one slot (_pair_rows).
        from flybody_tpu.ops import mpr_kernel as _mprk
        f = _mprk.make_mpr_pe(t1, t2, 8 if smooth_pair else 0)
        dist, n, pos = f(pg.pos1, pg.mat1, pg.size1, pg.mg1,
                         pg.pos2, pg.mat2, pg.size2, pg.mg2)
        return dist[:, None], pos[:, None], n[:, None]
    return h


def _handler(key):
    if key in _MPR_PAIRS:
        return _mpr_handler(*key)
    return {
        (_s.GEOM_PLANE, _s.GEOM_SPHERE): _h_plane_sphere,
        (_s.GEOM_PLANE, _s.GEOM_CAPSULE): _h_plane_capsule,
        (_s.GEOM_PLANE, _s.GEOM_ELLIPSOID): _h_plane_ellipsoid,
        (_s.GEOM_PLANE, _s.GEOM_CYLINDER): _h_plane_cylinder,
        (_s.GEOM_SPHERE, _s.GEOM_SPHERE): _h_sphere_sphere,
        (_s.GEOM_SPHERE, _s.GEOM_CAPSULE): _h_sphere_capsule,
        (_s.GEOM_CAPSULE, _s.GEOM_CAPSULE): _h_capsule_capsule,
    }[key]


# Number of closest pairs (by bounding sphere) run through narrowphase for
# large groups. A random-action walking rollout peaks at 27 bound-active
# pairs in the largest group (capsule-ellipsoid), so 64 has >2x headroom.
MPR_TOP_P = 64


def _mpr_topp(model: FlyModel, data: Data, key, g1, g2,
              gcat: jax.Array | None = None):
    """Bounding-sphere broadphase + gathered narrowphase (top-P pairs).

    Pairs further apart than their bounding spheres (+ margins) cannot
    contact; only the MPR_TOP_P closest run the (possibly iterative)
    narrowphase. Used for every single-contact group bigger than the
    budget — including analytic capsule-capsule, where skipping ~15/16
    of the provably separated pairs beats evaluating them.
    All traced-index gathers/scatters are one-hot matmuls (MXU) — a
    traced row gather costs ~3x more at batch (measured v5e).
    """
    dtype = data.qpos.dtype
    if gcat is None:
        gcat = _geom_cat(data)
    P_all = len(g1)
    c1_all = gcat[jnp.asarray(g1)]  # (P_all, 12) static gather
    c2_all = gcat[jnp.asarray(g2)]
    rb = jnp.asarray(model.geom_rbound).astype(dtype)
    mg = jnp.asarray(model.geom_margin).astype(dtype)
    d_bound = (jnp.linalg.norm(c2_all[:, :3] - c1_all[:, :3], axis=-1)
               - rb[np.asarray(g1)] - rb[np.asarray(g2)]
               - mg[np.asarray(g1)] - mg[np.asarray(g2)])
    P = min(MPR_TOP_P, P_all)
    _, idx = jax.lax.top_k(-d_bound, P)
    oh = jax.nn.one_hot(idx, P_all, dtype=dtype)  # (P, P_all)

    # Candidate geometry via one-hot matmul gathers.
    c1 = oh @ c1_all
    c2 = oh @ c2_all
    pos1, mat1 = _split_cat(c1)
    pos2, mat2 = _split_cat(c2)
    sz = jnp.asarray(model.geom_size)
    smcat1 = jnp.concatenate(
        [sz[np.asarray(g1)], mg[np.asarray(g1)][:, None]], -1)  # static
    smcat2 = jnp.concatenate(
        [sz[np.asarray(g2)], mg[np.asarray(g2)][:, None]], -1)
    s1 = oh @ smcat1.astype(dtype)
    s2 = oh @ smcat2.astype(dtype)
    pg = PairGeo(pos1=pos1, mat1=mat1, size1=s1[:, :3], mg1=s1[:, 3],
                 pos2=pos2, mat2=mat2, size2=s2[:, :3], mg2=s2[:, 3])
    d, p, n = _handler(key)(pg)  # (P, k, ...)
    k = d.shape[1]
    covered = jnp.sum(oh, axis=0)  # (P_all,)
    # MPR multi-row manifolds are replicated rows (identical per pair),
    # so scatter row 0 and repeat — plane groups (whose rows differ)
    # never route through this broadphase.
    d_full = oh.T @ d[:, 0] + 1e10 * (1.0 - covered)
    p_full = oh.T @ p[:, 0]
    n_full = oh.T @ n[:, 0]
    # Uncovered slots need a valid (unit) normal for frame construction.
    n_full = n_full + (1.0 - covered)[:, None] * jnp.asarray(
        [0.0, 0.0, 1.0], dtype)
    return (jnp.repeat(d_full[:, None], k, axis=1),
            jnp.repeat(p_full[:, None], k, axis=1),
            jnp.repeat(n_full[:, None], k, axis=1))


# Candidate budget for the MERGED MPR broadphase (all mixed-type pairs in
# one top-P): a random-action walking rollout peaks at ~30 bound-active
# MPR pairs across ALL groups, so 128 has >4x headroom.
MPR_MERGED_TOP_P = int(os.environ.get('FLYBODY_MPR_TOP_P', 128))


@functools.lru_cache(maxsize=8)
def _mpr_tables(meta: _s.Meta):
    """Concatenated candidate tables for the merged MPR broadphase.

    `slot_ids` maps merged-pair order -> global slot-table index
    (pair_tables order), used by the compact contact path."""
    tb = pair_tables(meta)
    g1s, g2s, t1s, t2s, sids = [], [], [], [], []
    ranges = {}  # key -> (pair_lo, npairs, k)
    lo = 0
    slot_lo = 0
    for key, (g1, g2, k) in tb['groups'].items():
        n = len(g1)
        if key in _MPR_PAIRS:
            ranges[key] = (lo, n, k)
            g1s.append(g1)
            g2s.append(g2)
            t1s.append(np.full(n, key[0], dtype=np.float64))
            t2s.append(np.full(n, key[1], dtype=np.float64))
            # MPR rows collapse to 1 slot per pair (_pair_rows).
            sids.append(slot_lo + np.arange(n, dtype=np.int64) * k)
            lo += n
        slot_lo += n * k
    g1 = np.concatenate(g1s)
    g2 = np.concatenate(g2s)
    t1 = np.concatenate(t1s)
    t2 = np.concatenate(t2s)
    smooth = ((t1 != _s.GEOM_CYLINDER)
              & (t2 != _s.GEOM_CYLINDER)).astype(np.float64)
    return dict(g1=g1, g2=g2, t1=t1, t2=t2, smooth=smooth, ranges=ranges,
                n=lo, slot_ids=np.concatenate(sids))


_CC_KEY = (_s.GEOM_CAPSULE, _s.GEOM_CAPSULE)


@functools.lru_cache(maxsize=8)
def dense_slot_ids(meta: _s.Meta, terrain: bool = False) -> np.ndarray:
    """Global slot ids of the rows collide(compact=True) emits densely:
    the plane/sphere analytic-group slots in pair_tables order, then
    terrain slots. Capsule-capsule and the MPR families arrive as
    CompactBlocks instead."""
    from flybody_tpu.ops import narrowphase as _np
    tb = pair_tables(meta, terrain)
    ids = []
    slot_lo = 0
    for key, (g1, g2, k) in tb['groups'].items():
        n = len(g1) * k
        if key in _np.ANALYTIC_KEYS and key != _CC_KEY:
            ids.append(slot_lo + np.arange(n, dtype=np.int64))
        slot_lo += n
    if terrain:
        ids.append(np.arange(slot_lo, tb['nslot'], dtype=np.int64))
    return np.concatenate(ids)


# Candidate budget for the compacted capsule-capsule narrowphase: a
# 3000-step random-ctrl rollout on the full fly peaks at 15 bound-active
# capsule-capsule pairs (of 1039), so 128 has ~8x headroom.
# Env-overridable for A/B sweeps.
CC_TOP_P = int(os.environ.get('FLYBODY_CC_TOP_P', 128))


@functools.lru_cache(maxsize=8)
def _cc_tables(meta: _s.Meta):
    """Capsule-capsule group's pair arrays + global slot ids."""
    tb = pair_tables(meta)
    slot_lo = 0
    for key, (g1, g2, k) in tb['groups'].items():
        if key == _CC_KEY:
            n = len(g1)
            return dict(g1=g1, g2=g2,
                        slot_ids=slot_lo + np.arange(n, dtype=np.int64),
                        n=n)
        slot_lo += len(g1) * k
    return None


def _cc_compact(model: FlyModel, data: Data,
                gcat: jax.Array) -> CompactBlock:
    """Capsule-capsule bounding-sphere broadphase + EXACT analytic
    narrowphase on the P closest candidates.

    The fused all-pairs analytic kernel spends most of its time on this
    one group (1039 of 1154 pairs); only ~15 pairs are ever within
    bounding-sphere contact range, so a top-P compaction (same one-hot
    gather GEMM recipe as the merged MPR broadphase) removes ~90% of
    that work while keeping the exact segment-segment formula."""
    ct = _cc_tables(model.meta)
    dtype = data.qpos.dtype
    g1, g2 = ct['g1'], ct['g2']
    n_all = ct['n']
    ngeom = model.meta.ngeom
    # Bound needs positions only — don't materialize (n_all, 12) pose
    # rows for provably separated pairs.
    p1_all = data.geom_xpos[g1]
    p2_all = data.geom_xpos[g2]
    rb = jnp.asarray(model.geom_rbound).astype(dtype)
    mg = jnp.asarray(model.geom_margin).astype(dtype)
    d_bound = (jnp.linalg.norm(p2_all - p1_all, axis=-1)
               - rb[g1] - rb[g2] - mg[g1] - mg[g2])
    P = min(CC_TOP_P, n_all)
    _, idx = jax.lax.top_k(-d_bound, P)
    oh = jax.nn.one_hot(idx, n_all, dtype=dtype)  # (P, n_all)
    # Selected pose rows via small per-geom one-hots straight off gcat
    # (geom ids ride the pair one-hot GEMM -- traced int gathers lower
    # to per-row loops on TPU). Both endpoints' ids come through ONE
    # constant-RHS GEMM, and both pose-row gathers through ONE batched
    # GEMM (2P tall) — batched matmul instances are tiny at batch and
    # serialize on the MXU, so instance count is what costs.
    g12 = oh @ jnp.asarray(np.stack([np.asarray(g1, np.float64),
                                     np.asarray(g2, np.float64)], -1),
                           dtype)  # (P, 2)
    oh12 = jax.nn.one_hot(jnp.round(g12).astype(jnp.int32), ngeom,
                          dtype=dtype)  # (P, 2, ngeom)
    c12 = jnp.swapaxes(oh12, 0, 1).reshape(2 * P, ngeom) @ gcat
    pos1, mat1 = _split_cat(c12[:P])
    pos2, mat2 = _split_cat(c12[P:])
    # Static per-pair table [size1 | mg1 | size2 | mg2 | efc(14) | gid].
    sz = jnp.asarray(model.geom_size).astype(dtype)
    efc_tab = efc_slot_table(model, dtype=dtype)[
        np.asarray(ct['slot_ids'])]
    gid = jnp.asarray(np.asarray(ct['slot_ids'], np.float64), dtype)
    ucat = jnp.concatenate([
        sz[g1], mg[g1][:, None], sz[g2], mg[g2][:, None],
        efc_tab, gid[:, None]], -1)
    sel = oh @ ucat
    pg = PairGeo(pos1=pos1, mat1=mat1, size1=sel[:, 0:3], mg1=sel[:, 3],
                 pos2=pos2, mat2=mat2, size2=sel[:, 4:7], mg2=sel[:, 7])
    d, p, n = _h_capsule_capsule(pg)  # (P, 1, ...) exact analytic
    return CompactBlock(idx=sel[:, 22], dist=d[:, 0], pos=p[:, 0],
                        normal=n[:, 0], params=sel[:, 8:22])


def efc_slot_table(model: FlyModel, terrain: bool = False,
                   dtype=jnp.float32) -> jax.Array:
    """Static per-slot constraint-row parameter table (S, 14), columns
    [includemargin, mu, solref(2), solimp(5), condim, diag, body1, body2,
    selfmask]. Pure function of the model — constant-folded under jit.
    `diag` (the contact-space inverse-weight approximation) is pre-divided
    by slot_nrep so collapsed manifold slots get nrep-scaled stiffness."""
    meta = model.meta
    tb = pair_tables(meta, terrain)
    params = slot_params(model, terrain)
    inv1 = jnp.asarray(model.body_invweight0).astype(dtype)[:, 0]
    sbody1 = np.asarray(tb['slot_body1'])
    sbody2 = np.asarray(tb['slot_body2'])
    nrep_slot = jnp.asarray(tb['slot_nrep'], dtype)
    diag_slot = (inv1[sbody1] + inv1[sbody2]) / nrep_slot  # (S,)
    selfmask = self_pair_mask(meta, terrain)
    return jnp.concatenate([
        params.includemargin.astype(dtype)[:, None],
        params.friction.astype(dtype)[:, :1],
        params.solref.astype(dtype),
        params.solimp.astype(dtype),
        jnp.asarray(tb['slot_condim'], dtype)[:, None],
        diag_slot[:, None],
        jnp.asarray(sbody1, dtype)[:, None],
        jnp.asarray(sbody2, dtype)[:, None],
        jnp.asarray(selfmask, dtype)[:, None],
    ], -1)  # (S, 14)


def _mpr_merged(model: FlyModel, data: Data, gcat: jax.Array,
                compact: bool = False):
    """ALL mixed-type MPR groups through one bounding-sphere broadphase +
    one type-dispatching narrowphase sweep.

    Replaces 6 per-type-pair kernel launches + 4 per-group top-k
    broadphases with one top-P over the full 1.2k-pair candidate set:
    the per-pair support dispatch costs ~3x inside the kernel but the
    narrowphase runs on 128 candidates instead of ~280 and all the
    XLA-side gather/scatter fixed costs are paid once.

    compact=True skips the full-slot scatter-back and instead returns
    (slot_ids, dist, pos, normal, efc_params) for the P candidates —
    the efc params ride the SAME one-hot gather GEMM as the geometry.
    """
    from flybody_tpu.ops import mpr_kernel as _mprk
    meta = model.meta
    mtb = _mpr_tables(meta)
    dtype = data.qpos.dtype
    g1, g2 = mtb['g1'], mtb['g2']
    n_all = mtb['n']
    ngeom = meta.ngeom
    # Bound needs positions only — don't materialize (n_all, 12) pose
    # rows for provably separated pairs.
    p1_all = data.geom_xpos[g1]
    p2_all = data.geom_xpos[g2]
    rb = jnp.asarray(model.geom_rbound).astype(dtype)
    mg = jnp.asarray(model.geom_margin).astype(dtype)
    d_bound = (jnp.linalg.norm(p2_all - p1_all, axis=-1)
               - rb[g1] - rb[g2] - mg[g1] - mg[g2])
    P = min(MPR_MERGED_TOP_P, n_all)
    _, idx = jax.lax.top_k(-d_bound, P)
    oh = jax.nn.one_hot(idx, n_all, dtype=dtype)  # (P, n_all)
    # Selected pose rows via small per-geom one-hots straight off gcat
    # (geom ids ride the pair one-hot GEMM -- traced int gathers lower
    # to per-row loops on TPU). Both endpoints through ONE id GEMM and
    # ONE (2P)-tall pose GEMM — batched matmul instances serialize on
    # the MXU, so instance count is what costs at batch.
    g12 = oh @ jnp.asarray(np.stack([np.asarray(g1, np.float64),
                                     np.asarray(g2, np.float64)], -1),
                           dtype)  # (P, 2)
    oh12 = jax.nn.one_hot(jnp.round(g12).astype(jnp.int32), ngeom,
                          dtype=dtype)  # (P, 2, ngeom)
    c12 = jnp.swapaxes(oh12, 0, 1).reshape(2 * P, ngeom) @ gcat
    pos1, mat1 = _split_cat(c12[:P])
    pos2, mat2 = _split_cat(c12[P:])
    # Static per-pair table [size1|mg1|size2|mg2|t1|t2|smooth] (n_all, 11).
    sz = jnp.asarray(model.geom_size).astype(dtype)
    ucat = jnp.concatenate([
        sz[g1], mg[g1][:, None], sz[g2], mg[g2][:, None],
        jnp.asarray(mtb['t1'], dtype)[:, None],
        jnp.asarray(mtb['t2'], dtype)[:, None],
        jnp.asarray(mtb['smooth'], dtype)[:, None]], -1)
    if compact:
        # Fold the efc params + global slot id into the same gather GEMM.
        efc_tab = efc_slot_table(model, dtype=dtype)[
            np.asarray(mtb['slot_ids'])]  # (n_all, 14) static
        gid = jnp.asarray(np.asarray(mtb['slot_ids'], np.float64), dtype)
        ucat = jnp.concatenate([ucat, efc_tab, gid[:, None]], -1)
    sel = oh @ ucat
    f = _mprk.make_mpr_merged_pe(8)
    dist, n, pos = f(pos1, mat1, sel[:, 0:3], sel[:, 3],
                     pos2, mat2, sel[:, 4:7], sel[:, 7],
                     sel[:, 8], sel[:, 9], sel[:, 10])
    if compact:
        return CompactBlock(idx=sel[:, 25], dist=dist, pos=pos, normal=n,
                            params=sel[:, 11:25])
    covered = jnp.sum(oh, axis=0)  # (n_all,)
    d_pairs = oh.T @ dist + 1e10 * (1.0 - covered)
    p_pairs = oh.T @ pos
    # Uncovered slots need a valid (unit) normal for frame construction.
    n_pairs = oh.T @ n + (1.0 - covered)[:, None] * jnp.asarray(
        [0.0, 0.0, 1.0], dtype)
    return d_pairs, p_pairs, n_pairs, mtb['ranges']


@functools.lru_cache(maxsize=8)
def _analytic_tables(meta: _s.Meta, exclude_cc: bool = False):
    """Static segment tables for the fused analytic-narrowphase kernel:
    (segs, g1_all, g2_all, n_slots, key->(slot_lo, npairs, k)).

    exclude_cc=True (compact collide path) leaves the capsule-capsule
    group out — it goes through its own broadphase-compacted exact
    narrowphase (_cc_compact) instead of the all-pairs kernel."""
    from flybody_tpu.ops import narrowphase as _np
    tb = pair_tables(meta)
    segs, g1_all, g2_all = [], [], []
    ranges = {}
    plo = slo = 0
    for key, (g1, g2, k) in tb['groups'].items():
        if key not in _np.ANALYTIC_KEYS:
            continue
        if exclude_cc and key == _CC_KEY:
            continue
        n = len(g1)
        segs.append((key, plo, plo + n, slo, k))
        ranges[key] = (slo, n, k)
        g1_all.append(g1)
        g2_all.append(g2)
        plo += n
        slo += n * k
    return (tuple(segs), np.concatenate(g1_all), np.concatenate(g2_all),
            slo, ranges)


def collide(model: FlyModel, data: Data,
            terrain: jax.Array | None = None,
            compact: bool = False) -> Contact:
    """Evaluate all candidate pairs; returns static-size contact slots.

    `terrain` (optional, traced): per-env heightfield grid; appends the
    terrain candidate rows from terrain.py after the geom-pair slots.

    compact=True (the engine perf path) keeps the capsule-capsule and
    merged-MPR candidates compact instead of scattering them back to
    full slots — see Contact."""
    from flybody_tpu.ops import narrowphase as _np
    meta = model.meta
    tb = pair_tables(meta)
    dtype = data.qpos.dtype
    gcat = _geom_cat(data)

    # All analytic pair types in ONE fused narrowphase op — each was a
    # separate chain of (P, 3) ops with ~2 ms of fixed cost at batch
    # 8192. In compact mode capsule-capsule (1039 of 1154 pairs) leaves
    # this kernel for its own broadphase-compacted block.
    has_cc = compact and _cc_tables(meta) is not None
    segs, ag1, ag2, n_aslots, ranges = _analytic_tables(
        meta, exclude_cc=has_cc)
    c1 = gcat[jnp.asarray(ag1)]
    c2 = gcat[jnp.asarray(ag2)]
    size = jnp.asarray(model.geom_size).astype(dtype)
    sz = jnp.concatenate([size[ag1], size[ag2]], -1)  # (P, 6) unbatched
    d_a, p_a, n_a = _np.make_narrowphase_pe(segs, n_aslots)(c1, c2, sz)

    dists, poss, normals = [], [], []
    mpr_res = None
    has_mpr = False
    for key, (g1, g2, k) in tb['groups'].items():
        if key in _np.ANALYTIC_KEYS:
            if has_cc and key == _CC_KEY:
                continue  # compact capsule-capsule block below
            slo, n, kk = ranges[key]
            d = d_a[slo:slo + n * kk]
            p = p_a[slo:slo + n * kk]
            nr = n_a[slo:slo + n * kk]
            dists.append(d)
            poss.append(p)
            normals.append(nr)
            continue
        has_mpr = True
        if compact:
            continue  # handled as one compact block below
        # Mixed-type MPR pairs: ONE merged broadphase + narrowphase sweep
        # for all groups (computed lazily on the first MPR key), sliced
        # back into each group's static slot range (one slot per pair —
        # manifold replication is folded into slot_nrep).
        if mpr_res is None:
            mpr_res = _mpr_merged(model, data, gcat)
        d_pairs, p_pairs, n_pairs, ranges_m = mpr_res
        lo, n, kk = ranges_m[key]
        d = jnp.repeat(d_pairs[lo:lo + n, None], kk, axis=1)
        p = jnp.repeat(p_pairs[lo:lo + n, None], kk, axis=1)
        nr2 = jnp.repeat(n_pairs[lo:lo + n, None], kk, axis=1)
        dists.append(d.reshape(-1))
        poss.append(p.reshape(-1, 3))
        normals.append(nr2.reshape(-1, 3))

    if terrain is not None:
        from flybody_tpu.physics import terrain as _terr
        td, tp, tn = _terr.terrain_contacts(model, data, terrain)
        dists.append(td)
        poss.append(tp)
        normals.append(tn)

    blocks = []
    if has_cc:
        blocks.append(_cc_compact(model, data, gcat))
    if compact and has_mpr:
        blocks.append(_mpr_merged(model, data, gcat, compact=True))

    return Contact(
        dist=jnp.concatenate(dists).astype(dtype),
        pos=jnp.concatenate(poss).astype(dtype),
        normal=jnp.concatenate(normals).astype(dtype),
        blocks=tuple(blocks),
    )
