"""Heightfield narrowphase: fly primitives vs a per-env terrain grid.

TPU-native equivalent of MuJoCo's hfield collision (used by the reference
hills arenas, flybody/tasks/arenas/hills.py:200-245): instead of the
triangle-prism mesh MuJoCo builds from the grid, each candidate contact
treats the terrain as locally planar — sample the bilinear surface height
and gradient under the probe point, build the tangent plane, and run the
analytic plane-primitive formulas. First-order accurate in surface
curvature, which is tight for the reference terrains (bump wavelength
~2 cm >> geom radii ~0.05 cm), and fully vectorized: every candidate is a
masked lane, no data-dependent shapes.

The terrain grid is a traced per-env array (regenerated every reset,
mirroring the reference's per-episode `physics.model.hfield_data` rewrite,
hills.py:277-281), so one compiled step serves all terrains.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from flybody_tpu.model import spec as _s
from flybody_tpu.model.spec import FlyModel
from flybody_tpu.physics.state import Data
from flybody_tpu.vision import hfield as hf

# Contact slots per fly geom type (capsule: one per end cap).
TERRAIN_NCON = {_s.GEOM_SPHERE: 1, _s.GEOM_CAPSULE: 2, _s.GEOM_ELLIPSOID: 1}

# MuJoCo defaults for the terrain pseudo-geom: the reference hfield geoms
# carry no custom contact attributes (hills.py:200-245).
_T_FRICTION = (1.0, 0.005, 0.0001)
_T_SOLREF = (0.02, 1.0)
_T_SOLIMP = (0.9, 0.95, 0.001, 0.5, 2.0)
_T_SOLMIX = 1.0
_T_CONDIM = 3


@functools.lru_cache(maxsize=8)
def terrain_tables(meta):
    """Static tables of fly geoms that can touch the terrain.

    Group order is sorted by geom type then geom id — the same deterministic
    order used when appending terrain contact rows in collide().
    """
    gtype = np.array(meta.geom_type)
    gbody = np.array(meta.geom_bodyid)
    contype = np.array(meta.geom_contype)
    conaff = np.array(meta.geom_conaffinity)
    condim = np.array(meta.geom_condim)

    groups: dict[int, list[int]] = {}
    for g in range(meta.ngeom):
        if gbody[g] == 0 or not (contype[g] or conaff[g]):
            continue
        t = int(gtype[g])
        if t not in TERRAIN_NCON:
            continue
        groups.setdefault(t, []).append(g)

    slot_geom, slot_condim = [], []
    out = {}
    for t in sorted(groups):
        gs = np.array(groups[t], dtype=np.int64)
        out[t] = gs
        k = TERRAIN_NCON[t]
        for g in groups[t]:
            slot_geom += [g] * k
            slot_condim += [max(int(condim[g]), _T_CONDIM)] * k

    return dict(
        groups=out,
        slot_geom=np.array(slot_geom, dtype=np.int64),
        slot_body=gbody[np.array(slot_geom, dtype=np.int64)],
        slot_condim=np.array(slot_condim, dtype=np.int64),
        nslot=len(slot_geom),
    )


def _surface(terrain, x, y, half_size: float = hf.ARENA_HALF_SIZE):
    """Terrain point and upward unit normal under world (x, y)."""
    h = hf.height_at(terrain, x, y, half_size)
    eps = half_size / terrain.shape[-1]  # half a grid cell
    gx = (hf.height_at(terrain, x + eps, y, half_size)
          - hf.height_at(terrain, x - eps, y, half_size)) / (2 * eps)
    gy = (hf.height_at(terrain, x, y + eps, half_size)
          - hf.height_at(terrain, x, y - eps, half_size)) / (2 * eps)
    n = jnp.stack([-gx, -gy, jnp.ones_like(gx)], axis=-1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    p0 = jnp.stack([x, y, h], axis=-1)
    return p0, n


def _plane_sphere(p0, n, c, r):
    dist = jnp.einsum('pi,pi->p', c - p0, n) - r
    pos = c - n * (r + 0.5 * dist)[:, None]
    return dist, pos, n


def terrain_contacts(model: FlyModel, data: Data, terrain: jax.Array):
    """All terrain candidate contacts, in terrain_tables slot order.

    Returns (dist (S,), pos (S,3), normal (S,3)); the normal points from
    the terrain into the fly geom (canonical geom1 -> geom2 with the
    hfield as geom1, matching MuJoCo type ordering). Contact parameters
    are static (see _terrain_params / collision.slot_params).
    """
    meta = model.meta
    tb = terrain_tables(meta)
    dtype = data.qpos.dtype

    dists, poss, normals = [], [], []
    for t, gs in tb['groups'].items():
        c = data.geom_xpos[gs]
        size = model.geom_size[gs]
        if t == _s.GEOM_SPHERE:
            p0, n = _surface(terrain, c[:, 0], c[:, 1])
            d, p, nn = _plane_sphere(p0, n, c, size[:, 0])
            d, p, nn = d[:, None], p[:, None], nn[:, None]
        elif t == _s.GEOM_CAPSULE:
            axis = data.geom_xmat[gs][:, :, 2]
            r, h = size[:, 0], size[:, 1]
            e1 = c + h[:, None] * axis
            e2 = c - h[:, None] * axis
            # Each end cap gets its own tangent plane (handles slopes).
            p01, n1 = _surface(terrain, e1[:, 0], e1[:, 1])
            p02, n2 = _surface(terrain, e2[:, 0], e2[:, 1])
            d1, p1, nn1 = _plane_sphere(p01, n1, e1, r)
            d2, p2, nn2 = _plane_sphere(p02, n2, e2, r)
            d = jnp.stack([d1, d2], 1)
            p = jnp.stack([p1, p2], 1)
            nn = jnp.stack([nn1, nn2], 1)
        elif t == _s.GEOM_ELLIPSOID:
            R = data.geom_xmat[gs]
            p0, n = _surface(terrain, c[:, 0], c[:, 1])
            # Support point of the ellipsoid in direction -n.
            nl = jnp.einsum('pij,pi->pj', R, n)  # R^T n
            denom = jnp.linalg.norm(size * nl, axis=-1, keepdims=True)
            x_local = -(size * size * nl) / jnp.maximum(denom, 1e-15)
            point = c + jnp.einsum('pij,pj->pi', R, x_local)
            d = jnp.einsum('pi,pi->p', point - p0, n)
            p = point - 0.5 * d[:, None] * n
            d, p, nn = d[:, None], p[:, None], n[:, None]
        else:  # pragma: no cover - table construction excludes other types
            raise NotImplementedError(t)
        k = TERRAIN_NCON[t]
        dists.append(d.reshape(-1))
        poss.append(p.reshape(-1, 3))
        normals.append(nn.reshape(-1, 3))

    dist = jnp.concatenate(dists).astype(dtype)
    pos = jnp.concatenate(poss).astype(dtype)
    normal = jnp.concatenate(normals).astype(dtype)
    return dist, pos, normal


def _terrain_params(model: FlyModel, tb):
    """Contact parameter mixing of each fly geom against the MuJoCo-default
    terrain pseudo-geom (mirrors collision._combine_params; all fly geoms
    have priority 0 and solmix 1 — equal-priority path)."""
    dtype = model.geom_friction.dtype
    gs = tb['slot_geom']
    f1 = jnp.asarray(np.tile(np.array(_T_FRICTION), (len(gs), 1)), dtype)
    f2 = model.geom_friction[gs]
    fmax = jnp.maximum(f1, f2)
    friction = jnp.stack([fmax[:, 0], fmax[:, 0], fmax[:, 1], fmax[:, 2],
                          fmax[:, 2]], axis=-1)

    m1 = jnp.full((len(gs),), _T_SOLMIX, dtype)
    m2 = model.geom_solmix[gs]
    w1 = m1 / jnp.maximum(m1 + m2, 1e-15)
    w2 = 1.0 - w1
    sr1 = jnp.asarray(np.tile(np.array(_T_SOLREF), (len(gs), 1)), dtype)
    sr2 = model.geom_solref[gs]
    standard = (sr1[:, 0] > 0) & (sr2[:, 0] > 0)
    solref = jnp.where(standard[:, None],
                       w1[:, None] * sr1 + w2[:, None] * sr2,
                       jnp.minimum(sr1, sr2))
    si1 = jnp.asarray(np.tile(np.array(_T_SOLIMP), (len(gs), 1)), dtype)
    solimp = w1[:, None] * si1 + w2[:, None] * model.geom_solimp[gs]
    margin = model.geom_margin[gs]  # terrain margin is 0
    return friction, solref, solimp, margin
