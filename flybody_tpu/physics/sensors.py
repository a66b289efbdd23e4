"""Sensor evaluation: gyro, velocimeter, accelerometer, force, touch.

Covers the fly model's sensor suite (fruitfly.xml:900-916, 15 sensors /
33 sensordata). Acceleration-stage sensors need the post-constraint
body accelerations and internal forces (MuJoCo's mj_rnePostConstraint),
implemented here as masked dense ops:

  cacc_b   = gravity + (A_b ⊙ qacc) @ cdof + (A_b ⊙ qvel) @ cdof_dot
  h_b      = I_b cacc_b + v_b ×* (I_b v_b)
  cfrc_int = subtree-sum of (h - cfrc_ext)      (force through each joint)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from flybody_tpu.model import spec as _s
from flybody_tpu.model.spec import FlyModel
from flybody_tpu.physics import collision as _col
from flybody_tpu.physics import math as sm
from flybody_tpu.physics import solver as _sol
from flybody_tpu.physics.state import Data


@functools.lru_cache(maxsize=8)
def _sensor_tables(meta: _s.Meta):
    """Static per-sensor dispatch tables (adr-ordered) + per-element
    cutoff vector."""
    rows = []
    for i in range(meta.nsensor):
        rows.append(dict(type=meta.sensor_type[i], objid=meta.sensor_objid[i],
                         adr=meta.sensor_adr[i], dim=meta.sensor_dim[i],
                         cutoff_idx=i))
    rows.sort(key=lambda r: r['adr'])
    # Sensors tile sensordata contiguously (checked so sensordata() can
    # build the vector by ordered concatenation).
    off = 0
    for r in rows:
        assert r['adr'] == off, (r, off)
        off += r['dim']
    assert off == meta.nsensordata
    # Subtree mask for cfrc_int.
    parent = np.array(meta.body_parentid)
    nbody = meta.nbody
    sub = np.eye(nbody)
    for c in range(nbody - 1, 0, -1):
        sub[parent[c]] += sub[c]
    sub = (sub > 0).astype(np.float64)
    return rows, sub


def body_cacc(model: FlyModel, data: Data) -> jax.Array:
    """Post-constraint body spatial accelerations (nbody, 6)."""
    dtype = data.qpos.dtype
    mask = model.body_dof_mask.astype(dtype)
    grav = jnp.concatenate(
        [jnp.zeros(3, dtype), -model.gravity.astype(dtype)])
    cacc = (mask * data.qacc) @ data.cdof + (mask * data.qvel) @ data.cdof_dot
    return cacc + grav


def contact_body_wrenches(model: FlyModel, data: Data, efc: _sol.EfcRows,
                          f_c: jax.Array, terrain: bool = False
                          ) -> jax.Array:
    """External contact wrenches per body at the root-subtree-CoM reference
    point, (nbody, 6) in (torque; force) spatial layout."""
    meta = model.meta
    dtype = data.qpos.dtype
    b1, b2 = efc.con_body1, efc.con_body2
    pos = efc.con_xpos
    normal = efc.con_normal
    t1, t2 = _sol.make_frame(normal)
    frame = jnp.stack([normal, t1, t2], axis=1)  # (K, 3, 3)
    f_world = jnp.einsum('kr,kri->ki', f_c, frame)  # force on body2 (+)
    root = jnp.asarray(np.array(meta.body_rootid))
    out = jnp.zeros((meta.nbody, 6), dtype)

    def wrench(body, sign):
        ref = data.subtree_com[root[body]]
        torque = jnp.cross(pos - ref, sign * f_world)
        w = jnp.concatenate([torque, sign * f_world], axis=-1)
        w = w * efc.con_active[:, None]
        # Scatter-add as a one-hot mul+sum (batched traced scatters and
        # tiny (nbody, K)@(K, 6) matmuls are both slow on TPU).
        oh = jax.nn.one_hot(body, meta.nbody, dtype=dtype)  # (K, nbody)
        return jnp.sum(oh[:, :, None] * w[:, None, :], axis=0)

    out = wrench(b2, 1.0) + wrench(b1, -1.0)
    return out


def cfrc_int(model: FlyModel, data: Data, efc: _sol.EfcRows,
             f_c: jax.Array, terrain: bool = False
             ) -> tuple[jax.Array, jax.Array]:
    """Internal (joint-transmitted) wrenches per body + cacc."""
    dtype = data.qpos.dtype
    _, sub = _sensor_tables(model.meta)
    cacc = body_cacc(model, data)
    # mul+sum (batched 6x6 matvecs serialize on the MXU).
    Iv = jnp.sum(data.cinert * data.cvel[:, None, :], axis=-1)
    h = jnp.sum(data.cinert * cacc[:, None, :], axis=-1) + sm.force_cross(
        data.cvel, Iv)
    cfrc_ext = contact_body_wrenches(model, data, efc, f_c, terrain)
    if data.xfrc_applied is not None:
        root = np.array(model.meta.body_rootid)
        ref = data.subtree_com[root]
        force = data.xfrc_applied[:, :3]
        torque = data.xfrc_applied[:, 3:]
        t_ref = torque + jnp.cross(data.xpos - ref, force)
        cfrc_ext = cfrc_ext + jnp.concatenate([t_ref, force], axis=-1)
    net = h - cfrc_ext
    fint = jnp.asarray(sub, dtype) @ net  # (nbody, 6)
    return fint, cacc


def _site_vel(model: FlyModel, data: Data, sid: int):
    """Site 6D velocity in the site frame (ang, lin)."""
    b = model.meta.site_bodyid[sid]
    root = model.meta.body_rootid[b]
    cvel = data.cvel[b]
    w, v = cvel[:3], cvel[3:]
    p = data.site_xpos[sid]
    ref = data.subtree_com[root]
    v_at = v + jnp.cross(w, p - ref)
    R = data.site_xmat[sid]
    return R.T @ w, R.T @ v_at


def sensordata(model: FlyModel, data: Data, efc: _sol.EfcRows,
               f_c: jax.Array, terrain: bool = False) -> jax.Array:
    """Full sensordata vector (nsensordata,)."""
    meta = model.meta
    dtype = data.qpos.dtype
    rows, _ = _sensor_tables(meta)

    need_acc = any(r['type'] in (_s.SENS_ACCELEROMETER, _s.SENS_FORCE,
                                 _s.SENS_TORQUE, _s.SENS_TOUCH)
                   for r in rows)
    if need_acc:
        fint, cacc = cfrc_int(model, data, efc, f_c, terrain)

    b1, b2 = efc.con_body1, efc.con_body2
    normal_force = jnp.maximum(f_c[:, 0], 0.0) * efc.con_active

    # Build segments in adr order (rows tile sensordata contiguously —
    # asserted in _sensor_tables) and concatenate ONCE: ~30 sequential
    # at[].set updates of the output vector cost ~15 ms/substep at batch
    # 8192 in launch overhead alone.
    segs = []
    for r in rows:
        t, sid = r['type'], r['objid']
        if t == _s.SENS_GYRO:
            w, _ = _site_vel(model, data, sid)
            segs.append(w)
        elif t == _s.SENS_VELOCIMETER:
            _, v = _site_vel(model, data, sid)
            segs.append(v)
        elif t == _s.SENS_ACCELEROMETER:
            b = meta.site_bodyid[sid]
            root = meta.body_rootid[b]
            p = data.site_xpos[sid]
            ref = data.subtree_com[root]
            wa, va = cacc[b][:3], cacc[b][3:]
            w, v = data.cvel[b][:3], data.cvel[b][3:]
            # Conventional acceleration of the site point.
            a_lin = va + jnp.cross(wa, p - ref)
            v_at = v + jnp.cross(w, p - ref)
            a_conv = a_lin + jnp.cross(w, v_at)
            segs.append(data.site_xmat[sid].T @ a_conv)
        elif t == _s.SENS_FORCE:
            b = meta.site_bodyid[sid]
            # Interaction force (child side) at the site, site frame.
            force = fint[b][3:]
            segs.append(data.site_xmat[sid].T @ force)
        elif t == _s.SENS_TOUCH:
            b = meta.site_bodyid[sid]
            involve = ((b1 == b) | (b2 == b)).astype(dtype)
            segs.append(jnp.sum(involve * normal_force)[None])
        else:
            raise NotImplementedError(f'sensor type {t}')
    out = jnp.concatenate(segs).astype(dtype)

    # Apply cutoffs (clip to [-cutoff, cutoff] where cutoff > 0) as one
    # vectorized op over a per-element cutoff vector.
    cut = model.sensor_cutoff.astype(dtype)
    cutvec = jnp.concatenate(
        [jnp.broadcast_to(cut[r['cutoff_idx']], (r['dim'],))
         for r in rows])
    return jnp.where(cutvec > 0, jnp.clip(out, -cutvec, cutvec), out)
