"""Forward kinematics and CoM-based quantities.

TPU-first design notes:
  * The kinematic tree is flattened: per-body local transforms are computed
    vectorized over all joints, then world poses are obtained with
    log-depth pointer-doubling prefix products (4 batched quaternion
    compositions for the fly's depth-16 tree) instead of a serial tree walk.
  * Per-joint world anchors/axes are tracked in the final body frame during
    local composition, so multi-joint bodies (e.g. 3-hinge head/coxa bodies)
    reproduce MuJoCo's sequential-joint semantics exactly
    (reference semantics: mj_kinematics; model at fruitfly.xml:326-338).
  * Everything is batched over leading dims and dtype-polymorphic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from flybody_tpu.model import spec as _s
from flybody_tpu.physics import math as sm
from flybody_tpu.physics.state import Data
from flybody_tpu.model.spec import FlyModel
from flybody_tpu.utils import quaternions as quat


@functools.lru_cache(maxsize=8)
def _tables(meta: _s.Meta):
    """Constant index tables derived from static metadata (host-side)."""
    njnt, nv, nbody = meta.njnt, meta.nv, meta.nbody

    jnt_type = np.array(meta.jnt_type)
    jnt_qposadr = np.array(meta.jnt_qposadr)
    jnt_bodyid = np.array(meta.jnt_bodyid)

    hinge_ids = np.where(jnt_type == _s.HINGE)[0]
    slide_ids = np.where(jnt_type == _s.SLIDE)[0]
    ball_ids = np.where(jnt_type == _s.BALL)[0]
    free_ids = np.where(jnt_type == _s.FREE)[0]

    # Per-body joint slot table, -1 padded.
    slots = np.full((nbody, meta.max_jnt_per_body), -1, dtype=np.int64)
    for b in range(nbody):
        for s in range(meta.body_jntnum[b]):
            slots[b, s] = meta.body_jntadr[b] + s

    # Free-jointed bodies.
    free_body = jnt_bodyid[free_ids]

    # Subtree mask: sub[b, c] = 1 iff c is in the subtree of b.
    parent = np.array(meta.body_parentid)
    sub = np.eye(nbody)
    for c in range(nbody - 1, 0, -1):
        # Accumulate child subtree into parent (children have higher ids).
        sub[parent[c]] += sub[c]
    sub = (sub > 0).astype(np.float64)

    # Per-dof tables for cdof.
    dof_jnt = np.array(meta.dof_jntid)
    dof_body = np.array(meta.dof_bodyid)
    dof_rot = np.zeros(nv)
    dof_in_body_frame = np.zeros(nv)
    dof_local_axis = np.zeros((nv, 3))
    for j in range(njnt):
        adr = meta.jnt_dofadr[j]
        t = jnt_type[j]
        if t == _s.HINGE:
            dof_rot[adr] = 1.0
            dof_in_body_frame[adr] = 1.0  # axis from jnt_axis, body frame
        elif t == _s.SLIDE:
            dof_in_body_frame[adr] = 1.0
        elif t == _s.BALL:
            for k in range(3):
                dof_rot[adr + k] = 1.0
                dof_in_body_frame[adr + k] = 1.0
                dof_local_axis[adr + k, k] = 1.0
        elif t == _s.FREE:
            for k in range(3):  # translation, world axes
                dof_local_axis[adr + k, k] = 1.0
            for k in range(3):  # rotation, body axes
                dof_rot[adr + 3 + k] = 1.0
                dof_in_body_frame[adr + 3 + k] = 1.0
                dof_local_axis[adr + 3 + k, k] = 1.0

    root_of_body = np.array(meta.body_rootid)

    return dict(
        hinge_ids=hinge_ids, slide_ids=slide_ids, ball_ids=ball_ids,
        free_ids=free_ids, free_body=free_body,
        jnt_qposadr=jnt_qposadr, jnt_bodyid=jnt_bodyid, slots=slots,
        subtree_mask=sub, dof_jnt=dof_jnt, dof_body=dof_body,
        dof_rot=dof_rot, dof_in_body_frame=dof_in_body_frame,
        dof_local_axis=dof_local_axis, root_of_body=root_of_body,
        body_anc=np.array(meta.body_anc),
        geom_bodyid=np.array(meta.geom_bodyid),
        site_bodyid=np.array(meta.site_bodyid),
        cam_bodyid=np.array(meta.cam_bodyid),
    )


def _joint_local_transforms(model: FlyModel, qpos: jax.Array):
    """Local (pos, quat) transform of every joint, plus identity padding.

    Returns (jpos, jquat) of shape (njnt+1, 3/4); index njnt is identity so
    that -1 slot entries can gather it safely.
    """
    meta = model.meta
    tb = _tables(meta)
    dtype = qpos.dtype
    njnt = meta.njnt

    jquat = jnp.zeros((njnt + 1, 4), dtype).at[:, 0].set(1.0)
    jpos = jnp.zeros((njnt + 1, 3), dtype)

    if len(tb['hinge_ids']):
        ids = tb['hinge_ids']
        qadr = tb['jnt_qposadr'][ids]
        angles = qpos[..., qadr] - model.qpos0[qadr]
        axes = model.jnt_axis[ids]
        q = quat.axis_angle_to_quat(axes, angles)
        anchor = model.jnt_pos[ids]
        p = anchor - quat.rotate_vec_with_quat(anchor, q)
        jquat = jquat.at[ids].set(q)
        jpos = jpos.at[ids].set(p)

    if len(tb['slide_ids']):
        ids = tb['slide_ids']
        qadr = tb['jnt_qposadr'][ids]
        disp = (qpos[..., qadr] - model.qpos0[qadr])[..., None]
        jpos = jpos.at[ids].set(model.jnt_axis[ids] * disp)

    if len(tb['ball_ids']):
        ids = tb['ball_ids']
        qadr = tb['jnt_qposadr'][ids]
        gather = qadr[:, None] + np.arange(4)[None, :]
        q = quat.norm_quat(qpos[..., gather])
        anchor = model.jnt_pos[ids]
        p = anchor - quat.rotate_vec_with_quat(anchor, q)
        jquat = jquat.at[ids].set(q)
        jpos = jpos.at[ids].set(p)

    return jpos, jquat


def kinematics(model: FlyModel, data: Data) -> Data:
    """Forward kinematics: fills body/geom/site world poses."""
    meta = model.meta
    tb = _tables(meta)
    qpos = data.qpos
    dtype = qpos.dtype
    nbody = meta.nbody

    jpos, jquat = _joint_local_transforms(model, qpos)

    # Per-body local transform (relative to parent body frame) and
    # per-joint anchor/axis expressed in the final body frame.
    lpos = jnp.asarray(model.body_pos, dtype)
    lquat = jnp.asarray(model.body_quat, dtype)
    njnt = meta.njnt
    # Anchor/axis accumulated in the *pre-joint* local frame.
    jnt_anchor_loc = jnp.zeros((njnt + 1, 3), dtype)
    jnt_axis_loc = jnp.zeros((njnt + 1, 3), dtype)

    slots = tb['slots']
    for s in range(meta.max_jnt_per_body):
        jids = slots[:, s]  # (nbody,) -1 padded -> gather at njnt identity
        gidx = np.where(jids >= 0, jids, njnt)
        valid = (jids >= 0)[:, None]
        jp = jpos[gidx]
        jq = jquat[gidx]
        # Record anchor/axis in the current accumulated local frame.
        anchor = lpos + quat.rotate_vec_with_quat(
            model.jnt_pos[np.minimum(gidx, njnt - 1)], lquat)
        axis = quat.rotate_vec_with_quat(
            model.jnt_axis[np.minimum(gidx, njnt - 1)], lquat)
        jnt_anchor_loc = jnt_anchor_loc.at[gidx].set(
            jnp.where(valid, anchor, jnt_anchor_loc[gidx]))
        jnt_axis_loc = jnt_axis_loc.at[gidx].set(
            jnp.where(valid, axis, jnt_axis_loc[gidx]))
        # Compose the joint transform.
        new_pos, new_quat = sm.compose_frame(lpos, lquat, jp, jq)
        lpos = jnp.where(valid, new_pos, lpos)
        lquat = jnp.where(valid, new_quat, lquat)

    # Free-joint bodies: local transform comes directly from qpos.
    for j, b in zip(tb['free_ids'], tb['free_body']):
        adr = int(tb['jnt_qposadr'][j])
        lpos = lpos.at[b].set(qpos[adr:adr + 3])
        fq = quat.norm_quat(qpos[adr + 3:adr + 7])
        lquat = lquat.at[b].set(fq)
        jnt_anchor_loc = jnt_anchor_loc.at[j].set(jnp.zeros(3, dtype))
        # Free-joint axes are only used via cdof (handled there).

    # Pointer-doubling prefix product -> world transforms.
    xpos, xquat = lpos, lquat
    for anc in tb['body_anc']:
        xpos = xpos[anc] + quat.rotate_vec_with_quat(xpos, xquat[anc])
        xquat = quat.mult_quat(xquat[anc], xquat)
    xquat = quat.norm_quat(xquat)
    xmat = quat.quat_to_mat(xquat)

    # Inertial frames.
    xipos = xpos + quat.rotate_vec_with_quat(model.body_ipos, xquat)
    ximat = quat.quat_to_mat(quat.mult_quat(xquat, model.body_iquat))

    # Geoms and sites, honoring sameframe shortcuts (mjtSameFrame: 0=none,
    # 1=body, 2=inertia, 3=body-rotation-only, 4=inertia-rotation-only) for
    # bit-parity with the reference compiler's frame dedup.
    def _object_poses(obj_pos, obj_quat, bodyid, sameframe):
        sf = np.asarray(sameframe)
        pos = xpos[bodyid] + quat.rotate_vec_with_quat(obj_pos, xquat[bodyid])
        mat = quat.quat_to_mat(quat.mult_quat(xquat[bodyid], obj_quat))
        use_body = (sf == 1)[:, None]
        use_inertia = (sf == 2)[:, None]
        pos = jnp.where(use_body, xpos[bodyid],
                        jnp.where(use_inertia, xipos[bodyid], pos))
        use_body_rot = ((sf == 1) | (sf == 3))[:, None, None]
        use_inertia_rot = ((sf == 2) | (sf == 4))[:, None, None]
        mat = jnp.where(use_body_rot, xmat[bodyid],
                        jnp.where(use_inertia_rot, ximat[bodyid], mat))
        return pos, mat

    geom_xpos, geom_xmat = _object_poses(
        model.geom_pos, model.geom_quat, tb['geom_bodyid'],
        meta.geom_sameframe)
    site_xpos, site_xmat = _object_poses(
        model.site_pos, model.site_quat, tb['site_bodyid'],
        meta.site_sameframe)

    # Joint anchors/axes in world frame (via the *parent-relative* local
    # records: transform with parent world frame).
    parent = np.array(meta.body_parentid)
    jb = tb['jnt_bodyid']
    pb = parent[jb]
    jnt_xanchor = xpos[pb] + quat.rotate_vec_with_quat(
        jnt_anchor_loc[:njnt], xquat[pb])
    jnt_xaxis = quat.rotate_vec_with_quat(jnt_axis_loc[:njnt], xquat[pb])
    # Free joints: anchor at body origin, axis +z (unused).
    for j, b in zip(tb['free_ids'], tb['free_body']):
        jnt_xanchor = jnt_xanchor.at[j].set(xpos[b])
        jnt_xaxis = jnt_xaxis.at[j].set(
            jnp.array([0.0, 0.0, 1.0], dtype))

    return data.replace(
        xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
        geom_xpos=geom_xpos, geom_xmat=geom_xmat,
        site_xpos=site_xpos, site_xmat=site_xmat,
    ), jnt_xanchor, jnt_xaxis


def com_pos(model: FlyModel, data: Data, jnt_xanchor: jax.Array,
            jnt_xaxis: jax.Array) -> Data:
    """Subtree CoM, com-based dof motion vectors (cdof) and body spatial
    inertias (cinert). Matches mj_comPos semantics."""
    meta = model.meta
    tb = _tables(meta)
    dtype = data.qpos.dtype

    mass = jnp.asarray(model.body_mass, dtype)
    weighted = mass[:, None] * data.xipos
    sub = jnp.asarray(tb['subtree_mask'], dtype)
    subtreemass = jnp.maximum(jnp.asarray(model.body_subtreemass, dtype),
                              jnp.asarray(1e-30, dtype))
    subtree_com = (sub @ weighted) / subtreemass[:, None]

    # Reference point for each body: subtree CoM of its kinematic root.
    root = tb['root_of_body']
    ref = subtree_com[root]  # (nbody, 3)

    # cinert.
    r = data.xipos - ref
    cinert = sm.spatial_inertia(mass, jnp.asarray(model.body_inertia, dtype),
                                data.ximat, r)

    # cdof: per-dof world axis, by static category.
    dof_body = tb['dof_body']
    dof_jnt = tb['dof_jnt']
    dof_jnt_type = np.array(meta.jnt_type)[dof_jnt]
    is_free_trans = (dof_jnt_type == _s.FREE) & (tb['dof_rot'] == 0)
    is_body_frame_unit = ((dof_jnt_type == _s.BALL)
                          | ((dof_jnt_type == _s.FREE) & (tb['dof_rot'] == 1)))
    R = data.xmat[dof_body]  # (nv, 3, 3)
    local_axis = jnp.asarray(tb['dof_local_axis'], dtype)
    # mul+sum, not (3,3)@(3,1) batched matmuls (those serialize on MXU).
    body_frame_axis = jnp.sum(R * local_axis[:, None, :], axis=-1)
    hinge_slide_axis = jnt_xaxis[dof_jnt]
    world_axis = jnp.where(
        jnp.asarray(is_free_trans)[:, None], local_axis,
        jnp.where(jnp.asarray(is_body_frame_unit)[:, None],
                  body_frame_axis, hinge_slide_axis))

    anchor = jnt_xanchor[dof_jnt]
    refd = ref[dof_body]
    is_rot = jnp.asarray(tb['dof_rot'], dtype)[:, None]
    cdof_ang = world_axis * is_rot
    cdof_lin = jnp.where(is_rot > 0,
                         jnp.cross(world_axis, refd - anchor),
                         world_axis)
    cdof = jnp.concatenate([cdof_ang, cdof_lin], axis=-1)

    return data.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def tendon(model: FlyModel, data: Data) -> Data:
    """Fixed-tendon lengths (constant moment arms live in model.ten_J)."""
    ten_length = model.ten_Lq.astype(data.qpos.dtype) @ data.qpos
    return data.replace(ten_length=ten_length)


def fwd_position_smooth(model: FlyModel, data: Data) -> tuple[Data, jax.Array,
                                                              jax.Array]:
    """Position-stage pipeline: kinematics -> com_pos -> tendon.

    On TPU under vmap the whole stage runs as ONE fused pallas kernel
    (ops/pos_stage.py); otherwise (or for unsupported models) the XLA
    stages below run."""
    from flybody_tpu.ops import pos_stage as _ps
    f = _ps.make_pos_stage_pe(model)
    if f is not None:
        (xpos, xquat, xmat, xipos, ximat, geom_xpos, geom_xmat,
         site_xpos, site_xmat, subtree_com, cinert, cdof, jnt_xanchor,
         jnt_xaxis, ten_length) = f(data.qpos)
        data = data.replace(
            xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
            geom_xpos=geom_xpos, geom_xmat=geom_xmat,
            site_xpos=site_xpos, site_xmat=site_xmat,
            subtree_com=subtree_com, cinert=cinert, cdof=cdof,
            ten_length=ten_length)
        return data, jnt_xanchor, jnt_xaxis
    data, jnt_xanchor, jnt_xaxis = kinematics(model, data)
    data = com_pos(model, data, jnt_xanchor, jnt_xaxis)
    data = tendon(model, data)
    return data, jnt_xanchor, jnt_xaxis
