"""Eye-camera renderer: on-device ray tracing of terrain + fly geoms.

Replaces the reference's EGL/OpenGL eye-camera pipeline
(flybody/fruitfly/fruitfly.py:728-756: two 32x32 MJCFCamera observables,
fovy 150 deg) with a fully on-device renderer that runs inside the batched
observation function — no host round trip, no GL context.

Per pixel: a primary ray is intersected analytically against the fly's
primitive geoms (sphere/capsule/ellipsoid) and marched against the hfield
terrain (fixed-step march + bisection refinement). Shading approximates the
reference's headlight-only scene (lights are removed by the vision task,
reference vision_flight.py:59-61): ambient 0.4 + 0.8 * diffuse toward the
camera, on a 0..255 grayscale like the grayscaled RGB the reference's
VisNet computes.

Known deviation: the reference renders the cosmetic mesh geoms (group 1);
we render the collision primitives. Terrain appearance — the signal the
vision tasks depend on — is equivalent; self-visible fly pixels differ in
silhouette detail.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from flybody_tpu.model import spec as _s
from flybody_tpu.model.spec import FlyModel
from flybody_tpu.vision import hfield as hf

_BIG = 1e9


@functools.lru_cache(maxsize=8)
def _render_tables(meta: _s.Meta):
    """Static geom tables for rendering (collision primitives only)."""
    spheres, capsules, ellipsoids = [], [], []
    for g in range(meta.ngeom):
        if meta.geom_contype[g] == 0 and meta.geom_conaffinity[g] == 0:
            # Visual-only geoms (meshes) are not rendered; collision
            # primitives stand in for the body silhouette.
            continue
        t = meta.geom_type[g]
        if t == _s.GEOM_SPHERE:
            spheres.append(g)
        elif t == _s.GEOM_CAPSULE:
            capsules.append(g)
        elif t in (_s.GEOM_ELLIPSOID, _s.GEOM_CYLINDER):
            # Cylinders (wing membranes) rendered as ellipsoids.
            ellipsoids.append(g)
    cams = [i for i, n in enumerate(meta.cam_names)
            if n in ('eye_left', 'eye_right')]
    # Render in reference order: (left, right)? The reference enables
    # right_eye and left_eye observables; we emit dict entries by name.
    return (np.array(spheres, np.int64), np.array(capsules, np.int64),
            np.array(ellipsoids, np.int64), {meta.cam_names[i]: i
                                             for i in cams})


def _pixel_rays(size: int, fovy_deg, dtype):
    """Camera-frame ray directions (size, size, 3); camera looks along -z,
    x right, y up (MuJoCo camera convention)."""
    half = jnp.tan(jnp.deg2rad(fovy_deg) / 2.0)
    # Pixel centers, image row 0 at the top.
    ys = (jnp.arange(size, dtype=dtype) + 0.5) / size * 2.0 - 1.0
    xs = (jnp.arange(size, dtype=dtype) + 0.5) / size * 2.0 - 1.0
    yv = -ys[:, None] * half  # top row -> +y
    xv = xs[None, :] * half
    d = jnp.stack([jnp.broadcast_to(xv, (size, size)),
                   jnp.broadcast_to(yv, (size, size)),
                   -jnp.ones((size, size), dtype)], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def _ray_spheres(origin, dirs, centers, radii):
    """Nearest sphere hit: returns (t, normal) with t=BIG when missed."""
    oc = origin - centers  # (G, 3)
    b = jnp.einsum('pi,gi->pg', dirs, oc)  # (P, G)
    c = jnp.sum(oc * oc, axis=-1)[None, :] - (radii ** 2)[None, :]
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = -b - sq
    t = jnp.where((disc > 0) & (t > 1e-4), t, _BIG)
    tmin = jnp.min(t, axis=1)
    gbest = jnp.argmin(t, axis=1)
    hitp = origin + dirs * tmin[:, None]
    n = hitp - centers[gbest]
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return tmin, n


def _ray_capsules(origin, dirs, a, bpt, radii):
    """Nearest capsule hit via sphere-sweep: approximate the closest point
    on the axis per ray by projecting the ray's closest approach."""
    # Solve for the exact infinite-cylinder/caps intersection per pair.
    # Vectorized exact capsule intersection:
    ba = bpt - a  # (G, 3)
    baba = jnp.sum(ba * ba, axis=-1)
    oa = origin - a  # (G, 3)
    bard = jnp.einsum('pi,gi->pg', dirs, ba)  # (P, G)
    baoa = jnp.sum(ba * oa, axis=-1)[None, :]
    rdoa = jnp.einsum('pi,gi->pg', dirs, oa)
    oaoa = jnp.sum(oa * oa, axis=-1)[None, :]
    r2 = (radii ** 2)[None, :]
    A = baba[None, :] - bard * bard
    B = baba[None, :] * rdoa - baoa * bard
    C = baba[None, :] * oaoa - baoa * baoa - r2 * baba[None, :]
    H = B * B - A * C
    sqH = jnp.sqrt(jnp.maximum(H, 0.0))
    t_body = (-B - sqH) / jnp.maximum(A, 1e-12)
    y = baoa + t_body * bard
    body_hit = (H > 0) & (y > 0) & (y < baba[None, :]) & (t_body > 1e-4)
    t_body = jnp.where(body_hit, t_body, _BIG)

    # End caps: sphere tests at both ends.
    def cap(centers):
        oc = origin - centers
        b = jnp.einsum('pi,gi->pg', dirs, oc)
        c = jnp.sum(oc * oc, axis=-1)[None, :] - r2
        disc = b * b - c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t = -b - sq
        return jnp.where((disc > 0) & (t > 1e-4), t, _BIG)

    t_all = jnp.minimum(t_body, jnp.minimum(cap(a), cap(bpt)))
    tmin = jnp.min(t_all, axis=1)
    gbest = jnp.argmin(t_all, axis=1)
    hitp = origin + dirs * tmin[:, None]
    # Normal: from nearest axis point.
    ag = a[gbest]
    bag = ba[gbest]
    h = jnp.clip(jnp.sum((hitp - ag) * bag, -1)
                 / jnp.maximum(jnp.sum(bag * bag, -1), 1e-12), 0.0, 1.0)
    axis_pt = ag + h[:, None] * bag
    n = hitp - axis_pt
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return tmin, n


def _ray_ellipsoids(origin, dirs, centers, mats, sizes):
    """Nearest ellipsoid hit: transform ray to unit-sphere space."""
    # Local-space ray per geom: R^T (o - c), R^T d.
    ol = jnp.einsum('gij,gj->gi', jnp.swapaxes(mats, 1, 2), origin - centers)
    dl = jnp.einsum('pi,gij->pgj', dirs, mats)  # (P, G, 3)
    os = ol[None] / sizes[None]  # (P?, G, 3) scaled
    ds = dl / sizes[None]
    A = jnp.sum(ds * ds, axis=-1)
    B = jnp.sum(os * ds, axis=-1)
    C = jnp.sum(os * os, axis=-1) - 1.0
    disc = B * B - A * C
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-B - sq) / jnp.maximum(A, 1e-12)
    t = jnp.where((disc > 0) & (t > 1e-4), t, _BIG)
    tmin = jnp.min(t, axis=1)
    gbest = jnp.argmin(t, axis=1)
    hitp = origin + dirs * tmin[:, None]
    # Normal: local gradient x / s^2, rotated to world.
    Rb = mats[gbest]
    local = jnp.einsum('pij,pj->pi', jnp.swapaxes(Rb, 1, 2),
                       hitp - centers[gbest])
    nl = local / (sizes[gbest] ** 2)
    n = jnp.einsum('pij,pj->pi', Rb, nl)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return tmin, n


# Eye terrain sampling (default: hat-weight matmuls on a strided render
# lattice — see hfield.height_at_matmul). FLYBODY_EYE_DENSE=0 restores
# the per-point gather path (exact full-res bilinear, ~60x slower on
# TPU); FLYBODY_EYE_STRIDE sets the render sublattice stride (2 ->
# 0.2 cm lattice on the 400-node arena; depth parity suite gates it).
_EYE_DENSE = os.environ.get('FLYBODY_EYE_DENSE', '1') != '0'
_EYE_STRIDE = int(os.environ.get('FLYBODY_EYE_STRIDE', 2))


def _ray_terrain(origin, dirs, terrain, n_steps: int = 48,
                 max_dist: float = 40.0, n_refine: int = 6):
    """Terrain intersection by fixed-step marching + bisection."""
    dtype = origin.dtype
    if _EYE_DENSE and terrain.shape[-1] % _EYE_STRIDE == 0:
        gs = terrain[::_EYE_STRIDE, ::_EYE_STRIDE]
        full_res = terrain.shape[-1]

        def sample(px, py):
            return hf.height_at_matmul(gs, px, py, stride=_EYE_STRIDE,
                                       full_res=full_res)
    else:
        def sample(px, py):
            return hf.height_at(terrain, px, py)

    # March points: denser near the camera. Scanned one step at a time
    # so the (P, R) hat-weight matrices never materialize for all steps
    # at once (48 x P x R x B would be tens of GB at batch).
    s = jnp.linspace(0.0, 1.0, n_steps, dtype=dtype) ** 1.5 * max_dist

    def march(carry, si_pair):
        found, t_lo, t_hi = carry
        s_prev, si = si_pair
        p = origin[None, :] + si * dirs
        below = p[:, 2] < sample(p[:, 0], p[:, 1])
        new = below & ~found
        t_hi = jnp.where(new, si, t_hi)
        t_lo = jnp.where(new, s_prev, t_lo)
        return (found | below, t_lo, t_hi), None

    P = dirs.shape[0]
    init = (jnp.zeros((P,), bool), jnp.zeros((P,), dtype),
            jnp.zeros((P,), dtype))
    s_prevs = jnp.concatenate([s[:1], s[:-1]])
    (anyhit, t_lo, t_hi), _ = jax.lax.scan(march, init,
                                           (s_prevs, s))

    def refine(_, carry):
        t_lo, t_hi = carry
        tm = 0.5 * (t_lo + t_hi)
        p = origin[None, :] + tm[:, None] * dirs
        under = p[:, 2] < sample(p[:, 0], p[:, 1])
        t_hi = jnp.where(under, tm, t_hi)
        t_lo = jnp.where(under, t_lo, tm)
        return t_lo, t_hi

    t_lo, t_hi = jax.lax.fori_loop(0, n_refine, refine, (t_lo, t_hi))
    t = jnp.where(anyhit, 0.5 * (t_lo + t_hi), _BIG)
    # Normal from terrain gradient (central differences in world units).
    p = origin[None, :] + t[:, None] * dirs
    eps = 0.1
    hx1 = sample(p[:, 0] + eps, p[:, 1])
    hx0 = sample(p[:, 0] - eps, p[:, 1])
    hy1 = sample(p[:, 0], p[:, 1] + eps)
    hy0 = sample(p[:, 0], p[:, 1] - eps)
    n = jnp.stack([-(hx1 - hx0) / (2 * eps), -(hy1 - hy0) / (2 * eps),
                   jnp.ones_like(t)], axis=-1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    return t, n


def render_scene(model: FlyModel, data, cam_pos, cam_mat, terrain=None,
                 size: int = 32, fovy: float = 150.0,
                 floor_z: float | None = None,
                 return_depth: bool = False,
                 ghost_data=None, ghost_albedo: float = 1.45):
    """Ray-traced grayscale render from an arbitrary camera pose.

    cam_mat columns are the camera axes (x right, y up, looks along -z,
    MuJoCo convention). `floor_z` adds an infinite checkered ground plane
    (for scenes without hfield terrain). `ghost_data` (optional): a
    second FK'd Data rendered with washed-out albedo — the counterpart
    of the reference's grey ghost reference fly (task_utils.py:124-153)."""
    meta = model.meta
    dtype = data.qpos.dtype
    spheres, capsules, ellipsoids, _ = _render_tables(meta)

    rays_cam = _pixel_rays(size, jnp.asarray(fovy, dtype), dtype)
    dirs = (rays_cam.reshape(-1, 3) @ cam_mat.T)  # (P, 3) world
    origin = cam_pos

    t_best = jnp.full((size * size,), _BIG, dtype)
    n_best = jnp.zeros((size * size, 3), dtype).at[:, 2].set(1.0)
    albedo = jnp.ones((size * size,), dtype)

    def merge(state, t, n, alb=None):
        t_best, n_best, albedo = state
        better = t < t_best
        alb = jnp.ones_like(t) if alb is None else alb
        return (jnp.where(better, t, t_best),
                jnp.where(better[:, None], n, n_best),
                jnp.where(better, alb, albedo))

    def merge_fly(state, fly_data, alb: float):
        if len(spheres):
            c = fly_data.geom_xpos[spheres]
            r = model.geom_size[spheres][:, 0]
            t, n = _ray_spheres(origin, dirs, c, r)
            state = merge(state, t, n, jnp.full_like(t, alb))
        if len(capsules):
            c = fly_data.geom_xpos[capsules]
            axis = fly_data.geom_xmat[capsules][:, :, 2]
            h = model.geom_size[capsules][:, 1]
            r = model.geom_size[capsules][:, 0]
            t, n = _ray_capsules(origin, dirs, c - h[:, None] * axis,
                                 c + h[:, None] * axis, r)
            state = merge(state, t, n, jnp.full_like(t, alb))
        if len(ellipsoids):
            c = fly_data.geom_xpos[ellipsoids]
            mats = fly_data.geom_xmat[ellipsoids]
            sz = jnp.maximum(model.geom_size[ellipsoids], 1e-4)
            t, n = _ray_ellipsoids(origin, dirs, c, mats, sz)
            state = merge(state, t, n, jnp.full_like(t, alb))
        return state

    state = (t_best, n_best, albedo)
    state = merge_fly(state, data, 1.0)
    if ghost_data is not None:
        state = merge_fly(state, ghost_data, ghost_albedo)
    if terrain is not None:
        t, n = _ray_terrain(origin, dirs, terrain)
        state = merge(state, t, n)
    if floor_z is not None:
        t = (floor_z - origin[2]) / jnp.where(
            jnp.abs(dirs[:, 2]) > 1e-9, dirs[:, 2], 1e-9)
        t = jnp.where((dirs[:, 2] < -1e-9) & (t > 1e-4), t, _BIG)
        p = origin[None, :] + t[:, None] * dirs
        checker = (jnp.floor(p[:, 0] * 2) + jnp.floor(p[:, 1] * 2)) % 2
        alb = 0.6 + 0.4 * checker
        n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], dtype),
                             (size * size, 3))
        state = merge(state, t, n, alb)

    t_best, n_best, albedo = state
    hit = t_best < _BIG
    # Headlight shading (ambient 0.4, diffuse 0.8 toward the camera,
    # matching the fruitfly.xml headlight, fruitfly.xml:202).
    diffuse = jnp.maximum(-jnp.sum(n_best * dirs, axis=-1), 0.0)
    shade = jnp.clip((0.4 + 0.8 * diffuse) * albedo, 0.0, 1.0)
    background = 0.25  # dark sky (lights removed in the vision task)
    img = jnp.where(hit, shade, background) * 255.0
    if return_depth:
        # Along-ray hit distance (1e9 for misses) + the world ray dirs,
        # for quantitative parity against mujoco.mj_ray ground truth.
        return (img.reshape(size, size), t_best.reshape(size, size),
                dirs.reshape(size, size, 3))
    return img.reshape(size, size)


def render_eye(model: FlyModel, data, cam_id: int, terrain=None,
               size: int = 32, fovy: float = 150.0,
               return_depth: bool = False):
    """Render one eye camera to a (size, size) grayscale image in 0..255."""
    meta = model.meta
    # Camera world pose.
    b = meta.cam_bodyid[cam_id]
    from flybody_tpu.utils import quaternions as quat
    cam_pos = data.xpos[b] + quat.rotate_vec_with_quat(
        model.cam_pos[cam_id], data.xquat[b])
    cam_mat = quat.quat_to_mat(quat.mult_quat(data.xquat[b],
                                              model.cam_quat[cam_id]))
    return render_scene(model, data, cam_pos, cam_mat, terrain, size, fovy,
                        return_depth=return_depth)


def tracking_camera_pose(target, azimuth_deg=30.0, elevation_deg=-25.0,
                         distance=2.0, dtype=jnp.float32):
    """Third-person camera pose orbiting a target point. Returns
    (cam_pos, cam_mat) in the MuJoCo camera convention (looks along -z)."""
    target = jnp.asarray(target, dtype)
    az = jnp.deg2rad(jnp.asarray(azimuth_deg, dtype))
    el = jnp.deg2rad(jnp.asarray(elevation_deg, dtype))
    # Offset from target toward the camera.
    off = distance * jnp.stack([jnp.cos(el) * jnp.cos(az),
                                jnp.cos(el) * jnp.sin(az),
                                -jnp.sin(el)])
    cam_pos = target + off
    fwd = (target - cam_pos)
    fwd = fwd / jnp.linalg.norm(fwd)
    up0 = jnp.asarray([0.0, 0.0, 1.0], dtype)
    right = jnp.cross(fwd, up0)
    right = right / jnp.maximum(jnp.linalg.norm(right), 1e-9)
    up = jnp.cross(right, fwd)
    cam_mat = jnp.stack([right, up, -fwd], axis=1)  # columns x, y, -fwd=z
    return cam_pos, cam_mat


def render_tracking(model: FlyModel, data, terrain=None, size: int = 64,
                    fovy: float = 60.0, azimuth_deg=30.0,
                    elevation_deg=-25.0, distance=2.0,
                    floor_z: float | None = 0.0, ghost_data=None):
    """Third-person view tracking the fly root body (video rendering,
    counterpart of the reference's MuJoCo tracking cameras). Pass
    `ghost_data` to draw the reference ghost fly (imitation tasks)."""
    meta = model.meta
    b = meta.body_names.index('thorax')
    cam_pos, cam_mat = tracking_camera_pose(
        data.xpos[b], azimuth_deg, elevation_deg, distance,
        dtype=data.qpos.dtype)
    if terrain is not None:
        floor_z = None
    return render_scene(model, data, cam_pos, cam_mat, terrain, size, fovy,
                        floor_z=floor_z, ghost_data=ghost_data)


def render_eyes(model: FlyModel, data, terrain=None, size: int = 32,
                fovy: float = 150.0):
    """Render both eye cameras; returns dict name -> (size, size) image."""
    _, _, _, cams = _render_tables(model.meta)
    return {name: render_eye(model, data, cid, terrain, size, fovy)
            for name, cid in cams.items()}
