"""Fused position-stage kernel: FK + com quantities + tendons in ONE launch.

The XLA position stage (physics/kinematics.py: joint local transforms,
per-body composition, pointer-doubling world poses, inertial/geom/site
frames, subtree CoM, cinert, cdof, tendon lengths) lowers to dozens of
small elementwise fusions, each paying fixed launch + HBM round-trip
cost at batch (~13 ms/substep at 8192 on v5e, and the env pays the same
stage again for observations). This kernel computes the whole stage
VMEM-resident per 128-lane block.

Design notes (TPU/Mosaic-friendly by construction):
  * All state arrays are (N, C, LANES) planes: N entities on sublanes,
    C channels, batch on lanes.
  * Every static tree gather/scatter (per-body joint slots, parent
    pointers per doubling level, geom/site/dof -> body maps, the
    subtree-mass matrix) is a CONSTANT one-hot matrix multiply
    (tiny MXU matmuls) — no dynamic indexing in the kernel.
  * The constant matrices ride in as unbatched 2-D inputs grouped by
    contraction width (nq / nhinge / nbody / njnt), sliced statically
    inside the kernel; small per-row constants ride in one (R, 8) pack.

Supported models: free + hinge joints only (the fly); anything else
falls back to the XLA pipeline (physics/kinematics.py), as does any
non-TPU backend via the custom_vmap reference.

Reference semantics: mj_kinematics / mj_comPos / mj_tendon
(physics/kinematics.py:148-319 is the parity-tested XLA formulation).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flybody_tpu.model import spec as _s

# In-kernel dot precision. Most of these dots are one-hot gather/
# scatter matmuls whose operand VALUES must survive rounding intact:
# Precision.DEFAULT rounds operands to bf16 (7-bit mantissa) and breaks
# the 1e-4 reference-parity tolerances, so HIGHEST (multi-pass bf16,
# f32-faithful) is the default. Mosaic does not lower Precision.HIGH
# (bf16x3) — measured on v5e 2026-08-19: NotImplementedError — so the
# only A/B alternative is the lossy 'default'
# (FLYBODY_STAGE_PRECISION=default, perf-probe only; fails parity).
def _stage_precision():
    v = os.environ.get('FLYBODY_STAGE_PRECISION', 'highest').strip().lower()
    if v == 'high':  # legacy round-2 value; Mosaic cannot lower bf16x3
        import warnings
        warnings.warn("FLYBODY_STAGE_PRECISION=high is not lowerable by "
                      "Mosaic on TPU; using 'highest'", stacklevel=2)
        v = 'highest'
    table = {'highest': jax.lax.Precision.HIGHEST,
             'default': jax.lax.Precision.DEFAULT}
    if v not in table:
        raise ValueError(
            f"FLYBODY_STAGE_PRECISION={v!r}: valid options are 'highest' "
            "(f32-faithful, default) or 'default' (lossy bf16 operands)")
    return table[v]


_DOT_PRECISION = _stage_precision()

LANES = 128
_EPS = 1e-15


class _Pack:
    """Row-packer for the (R, w) constant tables with named slices."""

    def __init__(self, width):
        self.width = width
        self.rows = []
        self.map = {}

    def add(self, name, arr):
        arr = np.asarray(arr, np.float64)
        if arr.ndim == 1:
            arr = arr[:, None]
        r, w = arr.shape
        assert w <= self.width, (name, w)
        pad = np.zeros((r, self.width - w))
        self.map[name] = (len(self.rows) and sum(
            a.shape[0] for a in self.rows) or 0, r, w)
        self.rows.append(np.concatenate([arr, pad], axis=1))

    def table(self):
        return np.concatenate(self.rows, axis=0) if self.rows else \
            np.zeros((1, self.width))


def _onehot(rows, n, idx):
    m = np.zeros((rows, n))
    m[np.arange(rows), np.asarray(idx)] = 1.0
    return m


def build_tables(model):
    """Host-side constant tables. Returns None if the model is
    unsupported (non free/hinge joints) or model arrays are traced."""
    meta = model.meta
    try:
        body_pos = np.asarray(model.body_pos, np.float64)
    except Exception:  # traced model leaves -> no kernel
        return None
    jnt_type = np.array(meta.jnt_type)
    if not set(np.unique(jnt_type)) <= {_s.FREE, _s.HINGE}:
        return None
    nb, nj, nq, nv = meta.nbody, meta.njnt, meta.nq, meta.nv
    ng, ns, nt = meta.ngeom, meta.nsite, meta.ntendon
    if ns == 0 or nt == 0:
        return None

    qadr = np.array(meta.jnt_qposadr)
    jbody = np.array(meta.jnt_bodyid)
    parent = np.array(meta.body_parentid)
    hinge = np.where(jnt_type == _s.HINGE)[0]
    free = np.where(jnt_type == _s.FREE)[0]
    nh = len(hinge)
    hidx = np.full(nj, -1, dtype=np.int64)
    hidx[hinge] = np.arange(nh)
    jnt_pos = np.asarray(model.jnt_pos, np.float64)
    jnt_axis = np.asarray(model.jnt_axis, np.float64)
    qpos0 = np.asarray(model.qpos0, np.float64)

    # ---- width-nq selectors: [Gq (nh) | Pfp (3nb) | Pfq (4nb) | TL (nt)]
    cq = []
    offs_q = {}
    Gq = _onehot(nh, nq, qadr[hinge])
    Pfp = np.zeros((3 * nb, nq))
    Pfq = np.zeros((4 * nb, nq))
    freemask_b = np.zeros((nb, 1))
    freejnt = np.zeros((nj, 1))
    for j in free:
        b = jbody[j]
        adr = qadr[j]
        for k in range(3):
            Pfp[3 * b + k, adr + k] = 1.0
        for k in range(4):
            Pfq[4 * b + k, adr + 3 + k] = 1.0
        freemask_b[b, 0] = 1.0
        freejnt[j, 0] = 1.0
    TL = np.asarray(model.ten_Lq, np.float64)
    lo = 0
    for name, m in [('Gq', Gq), ('Pfp', Pfp), ('Pfq', Pfq), ('TL', TL)]:
        cq.append(m)
        offs_q[name] = (lo, m.shape[0])
        lo += m.shape[0]
    CQ = np.concatenate(cq, axis=0)

    # ---- per-body joint slots (hinges only; free handled separately).
    max_s = meta.max_jnt_per_body
    slots = np.full((nb, max_s), -1, dtype=np.int64)
    for b in range(nb):
        for s in range(meta.body_jntnum[b]):
            slots[b, s] = meta.body_jntadr[b] + s
    S_list, T_list, valid_list, jp_list, ja_list = [], [], [], [], []
    for s in range(max_s):
        S = np.zeros((nb, nh))
        T = np.zeros((nj, nb))
        valid = np.zeros((nb, 1))
        jp = np.zeros((nb, 3))
        ja = np.zeros((nb, 3))
        for b in range(nb):
            j = slots[b, s]
            if j >= 0 and jnt_type[j] == _s.HINGE:
                S[b, hidx[j]] = 1.0
                T[j, b] = 1.0
                valid[b, 0] = 1.0
                jp[b] = jnt_pos[j]
                ja[b] = jnt_axis[j]
        S_list.append(S)
        T_list.append(T)
        valid_list.append(valid)
        jp_list.append(jp)
        ja_list.append(ja)
    CH = np.concatenate(S_list, axis=0)  # (max_s*nb, nh)

    # ---- width-nb gathers/scatters.
    anc_levels = [np.asarray(a) for a in meta.body_anc]
    cb = []
    offs_b = {}
    mats_b = [(f'A{li}', _onehot(nb, nb, a))
              for li, a in enumerate(anc_levels)]
    mass = np.asarray(model.body_mass, np.float64)
    subm = np.maximum(np.asarray(model.body_subtreemass, np.float64),
                      1e-30)
    sub = np.eye(nb)
    for c in range(nb - 1, 0, -1):
        sub[parent[c]] += sub[c]
    sub = (sub > 0).astype(np.float64)
    M1 = sub * mass[None, :] / subm[:, None]
    mats_b += [('M1', M1),
               ('R1', _onehot(nb, nb, np.array(meta.body_rootid))),
               ('Gg', _onehot(ng, nb, np.array(meta.geom_bodyid))),
               ('Gs', _onehot(ns, nb, np.array(meta.site_bodyid))),
               ('Pj', _onehot(nj, nb, parent[jbody])),
               ('Bj', _onehot(nj, nb, jbody)),
               ('Db', _onehot(nv, nb, np.array(meta.dof_bodyid)))]
    for s in range(max_s):
        mats_b.append((f'T{s}', T_list[s]))
    lo = 0
    for name, m in mats_b:
        cb.append(m)
        offs_b[name] = (lo, m.shape[0])
        lo += m.shape[0]
    CB = np.concatenate(cb, axis=0)

    # ---- width-nj: dof -> joint gather.
    CJ = _onehot(nv, nj, np.array(meta.dof_jntid))

    # ---- per-row constant pack.
    pk = _Pack(8)
    pk.add('axes_h', jnt_axis[hinge])
    pk.add('anch_h', jnt_pos[hinge])
    pk.add('qpos0_h', qpos0[qadr[hinge]])
    pk.add('body_pos', body_pos)
    pk.add('body_quat', np.asarray(model.body_quat, np.float64))
    for s in range(max_s):
        pk.add(f'valid{s}', valid_list[s])
        pk.add(f'jp{s}', jp_list[s])
        pk.add(f'ja{s}', ja_list[s])
    pk.add('freemask_b', freemask_b)
    pk.add('freejnt', freejnt)
    pk.add('ipos', np.asarray(model.body_ipos, np.float64))
    pk.add('iquat', np.asarray(model.body_iquat, np.float64))
    pk.add('geom_pos', np.asarray(model.geom_pos, np.float64))
    pk.add('geom_quat', np.asarray(model.geom_quat, np.float64))
    gsf = np.array(meta.geom_sameframe)
    pk.add('gsf', np.stack([(gsf == 1), (gsf == 2), (gsf == 1) | (gsf == 3),
                            (gsf == 2) | (gsf == 4)], axis=1)
           .astype(np.float64))
    pk.add('site_pos', np.asarray(model.site_pos, np.float64))
    pk.add('site_quat', np.asarray(model.site_quat, np.float64))
    ssf = np.array(meta.site_sameframe)
    pk.add('ssf', np.stack([(ssf == 1), (ssf == 2), (ssf == 1) | (ssf == 3),
                            (ssf == 2) | (ssf == 4)], axis=1)
           .astype(np.float64))
    pk.add('mass', mass)
    pk.add('inertia', np.asarray(model.body_inertia, np.float64))
    # dof tables.
    dof_jnt_type = jnt_type[np.array(meta.dof_jntid)]
    dof_rot = np.zeros(nv)
    dof_local_axis = np.zeros((nv, 3))
    for j in range(nj):
        adr = meta.jnt_dofadr[j]
        if jnt_type[j] == _s.HINGE:
            dof_rot[adr] = 1.0
        elif jnt_type[j] == _s.FREE:
            for k in range(3):
                dof_local_axis[adr + k, k] = 1.0
            for k in range(3):
                dof_rot[adr + 3 + k] = 1.0
                dof_local_axis[adr + 3 + k, k] = 1.0
    is_free_trans = ((dof_jnt_type == _s.FREE) & (dof_rot == 0))
    is_bfu = ((dof_jnt_type == _s.FREE) & (dof_rot == 1))
    pk.add('dof_la', dof_local_axis)
    pk.add('dof_masks', np.stack(
        [dof_rot, is_free_trans.astype(np.float64),
         is_bfu.astype(np.float64)], axis=1))
    CV = pk.table()

    dims = dict(nb=nb, nj=nj, nq=nq, nv=nv, ng=ng, ns=ns, nt=nt, nh=nh,
                max_s=max_s, nlev=len(anc_levels))
    return dict(CQ=CQ, CB=CB, CH=CH, CJ=CJ, CV=CV, offs_q=offs_q,
                offs_b=offs_b, cvmap=pk.map, dims=dims)


# ------------------------------------------------------------- kernel math


def _cross(a, b):
    """Channel-axis cross product for (N, 3, L)-ish operands."""
    a0, a1, a2 = a[:, 0], a[:, 1], a[:, 2]
    b0, b1, b2 = b[:, 0], b[:, 1], b[:, 2]
    return jnp.stack([a1 * b2 - a2 * b1, a2 * b0 - a0 * b2,
                      a0 * b1 - a1 * b0], axis=1)


def _qmult(a, b):
    aw, ax, ay, az = a[:, 0], a[:, 1], a[:, 2], a[:, 3]
    bw, bx, by, bz = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw], axis=1)


def _qrot(v, q):
    """Rotate v (N, 3, Lv) by quat q (N, 4, L); expanded Rodrigues
    (matches utils/quaternions.rotate_vec_with_quat incl. the 1/|q|^2)."""
    w = q[:, 0:1]
    u = q[:, 1:4]
    s = jnp.sum(q * q, axis=1, keepdims=True)
    uv = _cross(u, v)
    out = (v * (s - 2.0 * jnp.sum(u * u, axis=1, keepdims=True))
           + 2.0 * u * jnp.sum(u * v, axis=1, keepdims=True)
           + 2.0 * w * uv)
    return out / jnp.maximum(s, _EPS)


def _qmat9(q):
    """Quat (N, 4, L) -> row-major rotation channels (N, 9, L)."""
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=1)


def _make_kernel(tb):
    d = tb['dims']
    nb, nj, nq, nv = d['nb'], d['nj'], d['nq'], d['nv']
    ng, ns, nt, nh = d['ng'], d['ns'], d['nt'], d['nh']
    max_s, nlev = d['max_s'], d['nlev']
    offs_q, offs_b, cvmap = tb['offs_q'], tb['offs_b'], tb['cvmap']

    def body(qp_ref, cq_ref, cb_ref, ch_ref, cj_ref, cv_ref,
             xpos_o, xquat_o, xmat_o, xipos_o, ximat_o, gpos_o, gmat_o,
             spos_o, smat_o, scom_o, cin_o, cdof_o, janc_o, jaxw_o,
             ten_o):
        L = qp_ref.shape[-1]
        f32 = jnp.float32
        qp = qp_ref[...]  # (nq, L)

        def mmq(name):
            lo, r = offs_q[name]
            return jnp.dot(cq_ref[lo:lo + r, :], qp,
                           preferred_element_type=f32,
                        precision=_DOT_PRECISION)

        def mmb(name, x):
            lo, r = offs_b[name]
            N, C, _ = x.shape
            y = jnp.dot(cb_ref[lo:lo + r, :], x.reshape(N, C * L),
                        preferred_element_type=f32,
                        precision=_DOT_PRECISION)
            return y.reshape(r, C, L)

        def mmh(s, x):
            N, C, _ = x.shape
            y = jnp.dot(ch_ref[s * nb:(s + 1) * nb, :],
                        x.reshape(N, C * L), preferred_element_type=f32,
                        precision=_DOT_PRECISION)
            return y.reshape(nb, C, L)

        def cv(name):
            lo, r, w = cvmap[name]
            return cv_ref[lo:lo + r, 0:w][:, :, None]  # (r, w, 1)

        ones_l = jnp.ones((1, 1, L), f32)

        # --- A: hinge joint local transforms.
        ang = mmq('Gq') - cv('qpos0_h')[:, 0]  # (nh, L)
        half = 0.5 * ang
        chalf = jnp.cos(half)[:, None, :]
        shalf = jnp.sin(half)[:, None, :]
        axes = cv('axes_h')  # (nh, 3, 1)
        q_h = jnp.concatenate([chalf, shalf * axes], axis=1)  # (nh,4,L)
        anch = cv('anch_h')
        jpos_h = anch - _qrot(anch, q_h)  # (nh, 3, L)
        jcat = jnp.concatenate([jpos_h, q_h], axis=1)  # (nh, 7, L)

        # --- B: per-body composition + anchor/axis records.
        lpos = cv('body_pos') * ones_l  # (nb, 3, L)
        lquat = cv('body_quat') * ones_l  # (nb, 4, L)
        janc_loc = jnp.zeros((nj, 3, L), f32)
        jaxis_loc = jnp.zeros((nj, 3, L), f32)
        for s in range(max_s):
            valid = cv(f'valid{s}')  # (nb, 1, 1)
            rec_anchor = lpos + _qrot(cv(f'jp{s}') * ones_l, lquat)
            rec_axis = _qrot(cv(f'ja{s}') * ones_l, lquat)
            janc_loc = janc_loc + mmb(f'T{s}', rec_anchor)
            jaxis_loc = jaxis_loc + mmb(f'T{s}', rec_axis)
            js = mmh(s, jcat)  # (nb, 7, L)
            jp, jq = js[:, :3], js[:, 3:]
            new_pos = lpos + _qrot(jp, lquat)
            new_quat = _qmult(lquat, jq)
            lpos = jnp.where(valid > 0, new_pos, lpos)
            lquat = jnp.where(valid > 0, new_quat, lquat)

        # --- C: free-joint bodies straight from qpos.
        fposes = mmq('Pfp').reshape(nb, 3, L)
        fquat = mmq('Pfq').reshape(nb, 4, L)
        fn = jnp.sqrt(jnp.maximum(
            jnp.sum(fquat * fquat, axis=1, keepdims=True), _EPS))
        fquat = fquat / fn
        fm = cv('freemask_b')
        lpos = jnp.where(fm > 0, fposes, lpos)
        lquat = jnp.where(fm > 0, fquat, lquat)

        # --- D: pointer-doubling prefix products.
        cat7 = jnp.concatenate([lpos, lquat], axis=1)  # (nb, 7, L)
        for li in range(nlev):
            par = mmb(f'A{li}', cat7)
            pp, pq = par[:, :3], par[:, 3:]
            xp = pp + _qrot(cat7[:, :3], pq)
            xq = _qmult(pq, cat7[:, 3:])
            cat7 = jnp.concatenate([xp, xq], axis=1)
        xpos = cat7[:, :3]
        xquat = cat7[:, 3:]
        qn = jnp.sqrt(jnp.maximum(
            jnp.sum(xquat * xquat, axis=1, keepdims=True), _EPS))
        xquat = xquat / qn

        # --- E: matrices + inertial frames.
        xmat = _qmat9(xquat)  # (nb, 9, L)
        xipos = xpos + _qrot(cv('ipos') * ones_l, xquat)
        xiquat = _qmult(xquat, cv('iquat') * ones_l)
        ximat = _qmat9(xiquat)

        # --- F: geoms and sites (sameframe shortcuts).
        bodycat = jnp.concatenate([xpos, xquat, xipos, xmat, ximat],
                                  axis=1)  # (nb, 28, L)

        def objects(gname, pos_c, quat_c, sf_c, n):
            g = mmb(gname, bodycat)
            bpos, bquat = g[:, 0:3], g[:, 3:7]
            bipos = g[:, 7:10]
            bmat, bimat = g[:, 10:19], g[:, 19:28]
            pos = bpos + _qrot(pos_c * ones_l, bquat)
            mat = _qmat9(_qmult(bquat, quat_c * ones_l))
            sf = sf_c  # (n, 4, 1): [pos_body, pos_inertia, rot_b, rot_i]
            pos = jnp.where(sf[:, 0:1] > 0, bpos,
                            jnp.where(sf[:, 1:2] > 0, bipos, pos))
            mat = jnp.where(sf[:, 2:3] > 0, bmat,
                            jnp.where(sf[:, 3:4] > 0, bimat, mat))
            return pos, mat

        gpos, gmat = objects('Gg', cv('geom_pos'), cv('geom_quat'),
                             cv('gsf'), ng)
        spos, smat = objects('Gs', cv('site_pos'), cv('site_quat'),
                             cv('ssf'), ns)

        # --- G: joint world anchors/axes.
        pj = mmb('Pj', bodycat)
        janc_w = pj[:, 0:3] + _qrot(janc_loc, pj[:, 3:7])
        jaxis_w = _qrot(jaxis_loc, pj[:, 3:7])
        bj = mmb('Bj', bodycat)
        fj = cv('freejnt')
        janc_w = jnp.where(fj > 0, bj[:, 0:3], janc_w)
        zc = jnp.zeros((nj, 1, L), f32)
        zaxis = jnp.concatenate([zc, zc, zc + 1.0], axis=1)
        jaxis_w = jnp.where(fj > 0, zaxis, jaxis_w)

        # --- H: subtree com + cinert.
        scom = mmb('M1', xipos)  # (nb, 3, L)
        ref = mmb('R1', scom)
        r = xipos - ref
        diag = cv('inertia')  # (nb, 3, 1)
        m = cv('mass')[:, 0:1]  # (nb, 1, 1)
        # I_com = ximat diag ximat^T (row-major channels).
        ic = []
        for i in range(3):
            for j in range(3):
                acc = (ximat[:, 3 * i + 0] * ximat[:, 3 * j + 0]
                       * diag[:, 0]
                       + ximat[:, 3 * i + 1] * ximat[:, 3 * j + 1]
                       * diag[:, 1]
                       + ximat[:, 3 * i + 2] * ximat[:, 3 * j + 2]
                       * diag[:, 2])
                ic.append(acc)
        r0, r1, r2 = r[:, 0], r[:, 1], r[:, 2]
        r2sum = r0 * r0 + r1 * r1 + r2 * r2
        rr = [r0 * r0, r0 * r1, r0 * r2,
              r1 * r0, r1 * r1, r1 * r2,
              r2 * r0, r2 * r1, r2 * r2]
        mm_ = m[:, 0]
        # skew(r) row-major: [0 -r2 r1; r2 0 -r0; -r1 r0 0].
        sk = [0.0 * r0, -r2, r1, r2, 0.0 * r0, -r0, -r1, r0, 0.0 * r0]
        eye = [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
        ch36 = []
        for i in range(3):  # top rows: [Ic + m(r^2 I - rr) | m S]
            for j in range(3):
                k = 3 * i + j
                ch36.append(ic[k] + mm_ * (r2sum * eye[k] - rr[k]))
            for j in range(3):
                ch36.append(mm_ * sk[3 * i + j])
        zero_l = 0.0 * r0  # (nb, L) for full-lane constant channels
        for i in range(3):  # bottom rows: [-m S | m I]
            for j in range(3):
                ch36.append(-mm_ * sk[3 * i + j])
            for j in range(3):
                ch36.append(mm_ * eye[3 * i + j] + zero_l)
        cinert = jnp.stack(ch36, axis=1)  # (nb, 36, L)

        # --- I: cdof.
        bcat2 = jnp.concatenate([xmat, ref], axis=1)  # (nb, 12, L)
        dd = mmb('Db', bcat2)  # (nv, 12, L)
        R9, refd = dd[:, :9], dd[:, 9:12]
        la = cv('dof_la') * ones_l  # (nv, 3, L)
        bfa = jnp.stack([
            R9[:, 0] * la[:, 0] + R9[:, 1] * la[:, 1] + R9[:, 2] * la[:, 2],
            R9[:, 3] * la[:, 0] + R9[:, 4] * la[:, 1] + R9[:, 5] * la[:, 2],
            R9[:, 6] * la[:, 0] + R9[:, 7] * la[:, 1] + R9[:, 8] * la[:, 2],
        ], axis=1)
        jcat2 = jnp.concatenate([janc_w, jaxis_w], axis=1)  # (nj, 6, L)
        jd = jnp.dot(cj_ref[...], jcat2.reshape(nj, 6 * L),
                     preferred_element_type=f32,
                        precision=_DOT_PRECISION).reshape(nv, 6, L)
        anchor_d, hax = jd[:, :3], jd[:, 3:]
        dm_ = cv('dof_masks')  # (nv, 3, 1): [rot, free_trans, bfu]
        is_rot = dm_[:, 0:1]
        world_axis = jnp.where(dm_[:, 1:2] > 0, la,
                               jnp.where(dm_[:, 2:3] > 0, bfa, hax))
        cdof_ang = world_axis * is_rot
        cdof_lin = jnp.where(is_rot > 0,
                             _cross(world_axis, refd - anchor_d),
                             world_axis)
        cdof = jnp.concatenate([cdof_ang, cdof_lin], axis=1)  # (nv,6,L)

        # --- J: tendon lengths.
        ten = mmq('TL')  # (nt, L)

        xpos_o[...] = xpos
        xquat_o[...] = xquat
        xmat_o[...] = xmat
        xipos_o[...] = xipos
        ximat_o[...] = ximat
        gpos_o[...] = gpos
        gmat_o[...] = gmat
        spos_o[...] = spos
        smat_o[...] = smat
        scom_o[...] = scom
        cin_o[...] = cinert
        cdof_o[...] = cdof
        janc_o[...] = janc_w
        jaxw_o[...] = jaxis_w
        ten_o[...] = ten[:, None, :]

    return body


def _run_pallas(tb, body, qp_t, consts, interpret):
    d = tb['dims']
    nb, nj, nv = d['nb'], d['nj'], d['nv']
    ng, ns, nt = d['ng'], d['ns'], d['nt']
    B = qp_t.shape[-1]
    grid = (B // LANES,)
    CQ, CB, CH, CJ, CV = consts

    def lspec(*shape):
        return pl.BlockSpec(shape + (LANES,),
                            lambda i: (0,) * len(shape) + (i,),
                            memory_space=pltpu.VMEM)

    def cspec(m):
        return pl.BlockSpec(m.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    f32 = jnp.float32
    outs = (jax.ShapeDtypeStruct((nb, 3, B), f32),
            jax.ShapeDtypeStruct((nb, 4, B), f32),
            jax.ShapeDtypeStruct((nb, 9, B), f32),
            jax.ShapeDtypeStruct((nb, 3, B), f32),
            jax.ShapeDtypeStruct((nb, 9, B), f32),
            jax.ShapeDtypeStruct((ng, 3, B), f32),
            jax.ShapeDtypeStruct((ng, 9, B), f32),
            jax.ShapeDtypeStruct((ns, 3, B), f32),
            jax.ShapeDtypeStruct((ns, 9, B), f32),
            jax.ShapeDtypeStruct((nb, 3, B), f32),
            jax.ShapeDtypeStruct((nb, 36, B), f32),
            jax.ShapeDtypeStruct((nv, 6, B), f32),
            jax.ShapeDtypeStruct((nj, 3, B), f32),
            jax.ShapeDtypeStruct((nj, 3, B), f32),
            jax.ShapeDtypeStruct((nt, 1, B), f32))
    out_specs = (lspec(nb, 3), lspec(nb, 4), lspec(nb, 9), lspec(nb, 3),
                 lspec(nb, 9), lspec(ng, 3), lspec(ng, 9), lspec(ns, 3),
                 lspec(ns, 9), lspec(nb, 3), lspec(nb, 36), lspec(nv, 6),
                 lspec(nj, 3), lspec(nj, 3), lspec(nt, 1))
    return pl.pallas_call(
        body,
        out_shape=outs,
        grid=grid,
        in_specs=[lspec(d['nq']), cspec(CQ), cspec(CB), cspec(CH),
                  cspec(CJ), cspec(CV)],
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(qp_t, CQ, CB, CH, CJ, CV)


def _ref_outputs(model, qpos):
    """Single-env jnp reference: the existing XLA position stage."""
    from flybody_tpu.physics import kinematics as kin
    from flybody_tpu.physics.state import make_data
    d = make_data(model, dtype=qpos.dtype).replace(qpos=qpos)
    d, ja, jx = kin.kinematics(model, d)
    d = kin.com_pos(model, d, ja, jx)
    d = kin.tendon(model, d)
    return (d.xpos, d.xquat, d.xmat, d.xipos, d.ximat, d.geom_xpos,
            d.geom_xmat, d.site_xpos, d.site_xmat, d.subtree_com,
            d.cinert, d.cdof, ja, jx, d.ten_length)


def make_pos_stage_pe(model, interpret: bool = False):
    """Per-env fused position stage; pallas-batched under vmap on TPU.

    Returns None if the model is unsupported (then callers use the XLA
    pipeline). Otherwise returns f(qpos) -> 15-tuple matching
    _ref_outputs (xpos, xquat, xmat, xipos, ximat, geom_xpos, geom_xmat,
    site_xpos, site_xmat, subtree_com, cinert, cdof, jnt_xanchor,
    jnt_xaxis, ten_length)."""
    tb = build_tables(model)
    if tb is None:
        return None
    body = _make_kernel(tb)
    consts = tuple(jnp.asarray(tb[k], jnp.float32)
                   for k in ('CQ', 'CB', 'CH', 'CJ', 'CV'))

    @custom_batching.custom_vmap
    def f(qpos):
        return _ref_outputs(model, qpos)

    @f.def_vmap
    def _rule(axis_size, in_batched, qpos):
        del axis_size
        from flybody_tpu.ops.dispatch import pallas_enabled
        if not in_batched[0] or not (pallas_enabled('posstage')
                                     or interpret):
            axes = [0 if b else None for b in in_batched]
            out = jax.vmap(lambda q: _ref_outputs(model, q),
                           in_axes=axes)(qpos)
            return out, tuple(True for _ in range(15))
        B = qpos.shape[0]
        pad = (-B) % LANES
        qp_t = jnp.moveaxis(qpos.astype(jnp.float32), 0, -1)
        if pad:
            qp_t = jnp.concatenate(
                [qp_t, jnp.zeros(qp_t.shape[:-1] + (pad,), jnp.float32)],
                axis=-1)
        outs = _run_pallas(tb, body, qp_t, consts, interpret)

        def fro(v):
            return jnp.moveaxis(v[..., :B], -1, 0)

        (xpos, xquat, xmat, xipos, ximat, gpos, gmat, spos, smat, scom,
         cin, cdof, janc, jaxw, ten) = [fro(v) for v in outs]
        nbody = xpos.shape[1]
        out = (xpos, xquat, xmat.reshape(B, nbody, 3, 3), xipos,
               ximat.reshape(B, nbody, 3, 3), gpos,
               gmat.reshape(B, gmat.shape[1], 3, 3), spos,
               smat.reshape(B, smat.shape[1], 3, 3), scom,
               cin.reshape(B, nbody, 6, 6), cdof, janc, jaxw, ten[:, :, 0])
        return out, tuple(True for _ in range(15))

    return f
