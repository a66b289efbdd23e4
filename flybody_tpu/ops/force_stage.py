"""Fused velocity+force-stage kernel: com_vel -> CRB(packed) -> RNE ->
passive -> fluid -> actuation in ONE launch.

Companion of ops/pos_stage.py: consumes the position-stage outputs plus
(qvel, act, ctrl) and produces every smooth-dynamics quantity the
constraint solve and integrator need — body spatial velocities, dof
motion derivatives, tendon velocities, the block-arrow PACKED mass
matrix, bias forces, passive spring/damper forces, both fluid models,
and actuator forces/activation derivatives — with all intermediates
VMEM-resident. The XLA formulation of these stages (physics/smooth.py,
physics/fluid.py) is the parity-tested reference and remains the
fallback for non-TPU backends and unsupported models.

Same construction rules as pos_stage.py: (N, C, LANES) planes, every
static gather/scatter a constant one-hot matmul, constants grouped by
contraction width as unbatched 2-D inputs, per-row constants in one
(R, 16) pack. Host-precomputable coefficient algebra (inertia-box
dimensions, ellipsoid drag coefficients, spring scatter matrices) is
folded into the constants.
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
_MJMINVAL = 1e-15


class _Pack:
    def __init__(self, width):
        self.width = width
        self.rows = []
        self.map = {}
        self._n = 0

    def add(self, name, arr):
        arr = np.asarray(arr, np.float64)
        if arr.ndim == 1:
            arr = arr[:, None]
        r, w = arr.shape
        assert w <= self.width, (name, w)
        self.map[name] = (self._n, r, w)
        self.rows.append(np.concatenate(
            [arr, np.zeros((r, self.width - w))], axis=1))
        self._n += r

    def table(self):
        return np.concatenate(self.rows, axis=0)


def build_tables(model):
    """Host-side constants; None if unsupported."""
    from flybody_tpu.ops import arrow as _ar
    meta = model.meta
    try:
        mass = np.asarray(model.body_mass, np.float64)
    except Exception:
        return None
    jnt_type = np.array(meta.jnt_type)
    if not set(np.unique(jnt_type)) <= {_s.FREE, _s.HINGE}:
        return None
    if not _ar.enabled():
        return None
    part = _ar.build_partition(meta)
    if part is None:
        return None
    nb, nq, nv = meta.nbody, meta.nq, meta.nv
    ng, nt, nu, na = meta.ngeom, meta.ntendon, meta.nu, meta.na
    if nt == 0 or nu == 0:
        return None
    # Stateless-actuator models (e.g. flight, na=0): pad the activation
    # axis to 1 so no zero-size kernel operands exist; has_act masks it.
    na_k = max(na, 1)
    nl, dm, nr = len(part.ds), part.dmax, part.nr

    # ---- width-nv block.
    from flybody_tpu.physics import smooth as _sm
    bdm = np.asarray(model.body_dof_mask, np.float64)  # (nb, nv)
    dpm = np.asarray(model.dof_prefix_mask, np.float64)  # (nv, nv)
    tenJ = np.asarray(model.ten_J, np.float64)  # (nt, nv)
    idx, w, scat = _ar._limb_dof_tables(part)
    Glimb = scat.T  # (nl*dm, nv)
    # actuator joint-velocity selector.
    tb_act = _sm._act_tables(meta)
    Gv_u = np.zeros((nu, nv))
    for u in range(nu):
        if tb_act['is_joint'][u]:
            Gv_u[u, tb_act['trn_dadr'][u]] = 1.0
    cnv = []
    offs_nv = {}
    lo = 0
    for name, m in [('bdm', bdm), ('dpm', dpm), ('tenJ', tenJ),
                    ('Gvu', Gv_u), ('Glimb', Glimb)]:
        cnv.append(m)
        offs_nv[name] = (lo, m.shape[0])
        lo += m.shape[0]
    CNV = np.concatenate(cnv, axis=0)

    # ---- width-nq block: spring scatter + actuator qpos selector.
    qadr_s, dadr_s, jids_s = _sm._spring_tables(meta)
    Aspring = np.zeros((nv, nq))
    cspring = np.zeros(nv)
    if len(jids_s):
        k = np.asarray(model.jnt_stiffness, np.float64)[jids_s]
        qs = np.asarray(model.qpos_spring, np.float64)[qadr_s]
        Aspring[dadr_s, qadr_s] = -k
        cspring[dadr_s] = k * qs
    Gq_u = np.zeros((nu, nq))
    for u in range(nu):
        if tb_act['is_joint'][u]:
            Gq_u[u, tb_act['trn_qadr'][u]] = 1.0
    cnq = []
    offs_nq = {}
    lo = 0
    for name, m in [('Aspring', Aspring), ('Gqu', Gq_u)]:
        cnq.append(m)
        offs_nq[name] = (lo, m.shape[0])
        lo += m.shape[0]
    CNQ = np.concatenate(cnq, axis=0)

    # ---- width-nb block.
    sub = np.eye(nb)
    parent = np.array(meta.body_parentid)
    for c in range(nb - 1, 0, -1):
        sub[parent[c]] += sub[c]
    sub = (sub > 0).astype(np.float64)
    dof_body = np.array(meta.dof_bodyid)
    cnb = []
    offs_nb = {}
    lo = 0
    geom_body = np.array(meta.geom_bodyid)
    for name, m in [('sub', sub), ('maskT', bdm.T),
                    ('Gdofb', _onehot(nv, nb, dof_body)),
                    ('Ggb', _onehot(ng, nb, geom_body)),
                    ('Groot', _onehot(nb, nb,
                                      np.array(meta.body_rootid)))]:
        cnb.append(m)
        offs_nb[name] = (lo, m.shape[0])
        lo += m.shape[0]
    CNB = np.concatenate(cnb, axis=0)

    # ---- width-ng: geom wrench -> body scatter.
    CNG = _onehot(ng, nb, geom_body).T  # (nb, ng)

    # ---- width-nu: moment^T and activation scatter.
    momentT = np.asarray(model.actuator_moment, np.float64).T  # (nv, nu)
    act_scat = np.zeros((na_k, nu))
    for u in range(nu):
        if meta.actuator_actadr[u] >= 0:
            act_scat[meta.actuator_actadr[u], u] = 1.0
    cnu = []
    offs_nu = {}
    lo = 0
    for name, m in [('momT', momentT), ('ascat', act_scat)]:
        cnu.append(m)
        offs_nu[name] = (lo, m.shape[0])
        lo += m.shape[0]
    CNU = np.concatenate(cnu, axis=0)

    # ---- width-na: act gather per actuator.
    CNA = np.zeros((nu, na_k))
    for u in range(nu):
        if meta.actuator_actadr[u] >= 0:
            CNA[u, meta.actuator_actadr[u]] = 1.0

    # ---- width-nt: tendon J^T for the spring projection + actuator
    # tendon selectors.
    tenJT = tenJ.T  # (nv, nt)
    Gt_u = np.zeros((nu, nt))
    for u in range(nu):
        if tb_act['is_tendon'][u]:
            Gt_u[u, tb_act['ten_id'][u]] = 1.0
    cnt = []
    offs_nt = {}
    lo = 0
    for name, m in [('tenJT', tenJT), ('Gtu', Gt_u)]:
        cnt.append(m)
        offs_nt[name] = (lo, m.shape[0])
        lo += m.shape[0]
    CNT = np.concatenate(cnt, axis=0)

    # ---- per-row constant pack (width 16).
    pk = _Pack(16)
    pk.add('gravity', np.asarray(model.gravity, np.float64)[None, :])
    pk.add('wind', np.asarray(model.wind, np.float64)[None, :])
    pk.add('dv', np.array([[float(model.density),
                            float(model.viscosity)]]))
    pk.add('damping', np.asarray(model.dof_damping, np.float64))
    pk.add('cspring', cspring)
    pk.add('armature', np.asarray(model.dof_armature, np.float64))
    ls = np.asarray(model.ten_lengthspring, np.float64)
    pk.add('tenp', np.concatenate([
        np.asarray(model.ten_stiffness, np.float64)[:, None],
        np.asarray(model.ten_damping, np.float64)[:, None], ls], axis=1))
    # Actuation constants: [gear, gain, b0, b1, b2, affine, cr0, cr1,
    # fr0, fr1, limited, tau, has_act, is_joint+is_tendon].
    tau = np.maximum(np.asarray(model.actuator_dynprm, np.float64)[:, 0],
                     1e-10)
    pk.add('actp', np.concatenate([
        np.asarray(model.actuator_gear0, np.float64)[:, None],
        np.asarray(model.actuator_gainprm, np.float64)[:, 0:1],
        np.asarray(model.actuator_biasprm, np.float64)[:, 0:3],
        (np.array(meta.actuator_biastype) == _s.BIAS_AFFINE
         ).astype(np.float64)[:, None],
        np.asarray(model.actuator_ctrlrange, np.float64),
        np.asarray(model.actuator_forcerange, np.float64),
        np.asarray(model.actuator_forcelimited, np.float64)[:, None],
        tau[:, None],
        tb_act['has_act'][:, None],
    ], axis=1))
    # Inertia-box fluid: per-body box dims + scalars (host-precomputed).
    inertia = np.asarray(model.body_inertia, np.float64)
    i0, i1, i2 = inertia[:, 0], inertia[:, 1], inertia[:, 2]
    sm_ = np.maximum(mass, _MJMINVAL)
    box = np.stack([
        np.sqrt(np.maximum(_MJMINVAL, i1 + i2 - i0) / sm_ * 6.0),
        np.sqrt(np.maximum(_MJMINVAL, i0 + i2 - i1) / sm_ * 6.0),
        np.sqrt(np.maximum(_MJMINVAL, i0 + i1 - i2) / sm_ * 6.0)],
        axis=-1)
    from flybody_tpu.physics import fluid as _fl
    ftb = _fl._fluid_tables(meta)
    boxmask = ((~ftb['body_uses_ellipsoid'])
               & (np.arange(nb) > 0)
               & (mass > _MJMINVAL)).astype(np.float64)
    diam = box.mean(axis=-1)
    pk.add('boxp', np.concatenate([
        box, diam[:, None], boxmask[:, None],
        (box[:, 1] * box[:, 2])[:, None],
        (box[:, 0] * box[:, 2])[:, None],
        (box[:, 0] * box[:, 1])[:, None],
        (box[:, 0] * (box[:, 1]**4 + box[:, 2]**4))[:, None],
        (box[:, 1] * (box[:, 0]**4 + box[:, 2]**4))[:, None],
        (box[:, 2] * (box[:, 0]**4 + box[:, 1]**4))[:, None]], axis=1))
    # Ellipsoid fluid per-geom constants.
    gf = np.asarray(model.geom_fluid, np.float64)  # (ng, 12)
    size = np.asarray(model.geom_size, np.float64)
    s0, s1, s2 = size[:, 0], size[:, 1], size[:, 2]
    volume = 4.0 / 3.0 * np.pi * s0 * s1 * s2
    d_max = size.max(axis=-1)
    d_min = size.min(axis=-1)
    d_mid = s0 + s1 + s2 - d_max - d_min
    A_max = np.pi * d_max * d_mid
    eqD = 2.0 / 3.0 * (s0 + s1 + s2)
    lin_f = 3.0 * np.pi * eqD
    lin_t = np.pi * eqD ** 3

    def max_moment(d0, da, db):
        return 8.0 / 15.0 * np.pi * d0 * np.maximum(da, db) ** 4

    II = np.stack([max_moment(s0, s1, s2), max_moment(s1, s2, s0),
                   max_moment(s2, s0, s1)], axis=-1)
    I_max = 8.0 / 15.0 * np.pi * d_mid * d_max ** 4
    gmask = ftb['geom_active'].astype(np.float64)
    pk.add('gflA', gf[:, 6:12])  # virtual mass (3), virtual inertia (3)
    pk.add('gflB', np.concatenate([
        gf[:, 0:6],  # interaction, blunt, slender, ang, kutta, magnus
        volume[:, None], A_max[:, None], lin_f[:, None], lin_t[:, None],
        I_max[:, None], gmask[:, None]], axis=1))
    pk.add('gszA', np.stack([
        (s1 * s2) ** 2, (s2 * s0) ** 2, (s0 * s1) ** 2,
        (s1 * s2) ** 4, (s2 * s0) ** 4, (s0 * s1) ** 4], axis=1))
    pk.add('gII', II)
    # Packed-CRB masks.
    from flybody_tpu.physics.smooth import _crb_tables
    anc = np.asarray(_crb_tables(meta)['anc_low'])
    ancp = np.zeros((nl, dm, dm))
    for i, (lo_, d_) in enumerate(zip(part.los, part.ds)):
        ancp[i, :d_, :d_] = anc[lo_:lo_ + d_, lo_:lo_ + d_]
    pk.add('ancp', ancp.reshape(nl * dm, dm))
    pk.add('ancpT', np.transpose(ancp, (0, 2, 1)).reshape(nl * dm, dm))
    pk.add('ancr', anc[:nr, :nr])
    pk.add('ancrT', anc[:nr, :nr].T)
    pk.add('padeye', _ar._pad_eye_np(part).reshape((nl + 1) * (dm + nr),
                                                   dm))
    pk.add('limbw', w.reshape(nl * dm, 1))
    pk.add('limbarm', (np.asarray(model.dof_armature,
                                  np.float64)[idx] * w).reshape(
        nl * dm, 1))
    CV = pk.table()

    dims = dict(nb=nb, nq=nq, nv=nv, ng=ng, nt=nt, nu=nu, na=na,
                na_k=na_k, nl=nl, dm=dm, nr=nr)
    wind_h = tuple(float(w) for w in np.asarray(model.wind))
    scal = dict(density=float(model.density),
                viscosity=float(model.viscosity), wind=wind_h)
    return dict(CNV=CNV, CNQ=CNQ, CNB=CNB, CNG=CNG, CNU=CNU, CNA=CNA,
                CNT=CNT, CV=CV, offs_nv=offs_nv, offs_nq=offs_nq,
                offs_nb=offs_nb, offs_nu=offs_nu, offs_nt=offs_nt,
                cvmap=pk.map, dims=dims, scal=scal)


def _onehot(rows, n, idx):
    m = np.zeros((rows, n))
    m[np.arange(rows), np.asarray(idx)] = 1.0
    return m


def _cross(a, b):
    a0, a1, a2 = a[:, 0], a[:, 1], a[:, 2]
    b0, b1, b2 = b[:, 0], b[:, 1], b[:, 2]
    return jnp.stack([a1 * b2 - a2 * b1, a2 * b0 - a0 * b2,
                      a0 * b1 - a1 * b0], axis=1)


def _make_kernel(tb):
    d = tb['dims']
    nb, nq, nv = d['nb'], d['nq'], d['nv']
    ng, nt, nu = d['ng'], d['nt'], d['nu']
    na = d['na_k']
    nl, dm, nr = d['nl'], d['dm'], d['nr']
    offs_nv, offs_nq = tb['offs_nv'], tb['offs_nq']
    offs_nb, offs_nu, offs_nt = (tb['offs_nb'], tb['offs_nu'],
                                 tb['offs_nt'])
    cvmap = tb['cvmap']

    def body(qp_ref, qv_ref, act_ref, ctrl_ref, cdof_ref, cin_ref,
             xipos_ref, ximat_ref, scom_ref, gpos_ref, gmat_ref,
             tenl_ref, cnv_ref, cnq_ref, cnb_ref, cng_ref, cnu_ref,
             cna_ref, cnt_ref, cv_ref,
             cvel_o, cdd_o, tenv_o, bias_o, pas_o, fld_o, qact_o,
             afrc_o, adot_o, mp_o):
        L = qp_ref.shape[-1]
        f32 = jnp.float32

        def mm(ref, offs, name, x):
            lo, r = offs[name]
            if x.ndim == 2:
                return jnp.dot(ref[lo:lo + r, :], x,
                               preferred_element_type=f32,
                        precision=_DOT_PRECISION)
            N, C, _ = x.shape
            y = jnp.dot(ref[lo:lo + r, :], x.reshape(N, C * L),
                        preferred_element_type=f32,
                        precision=_DOT_PRECISION)
            return y.reshape(r, C, L)

        def cv(name):
            lo, r, w_ = cvmap[name]
            return cv_ref[lo:lo + r, 0:w_][:, :, None]

        qp = qp_ref[...]
        qv = qv_ref[...]
        cdof = cdof_ref[...]          # (nv, 6, L)
        cin = cin_ref[...]            # (nb, 36, L)
        xipos = xipos_ref[...]
        ximat = ximat_ref[...]        # (nb, 9, L)
        scom = scom_ref[...]

        # --- com_vel + cdof_dot.
        qcdof = qv[:, None, :] * cdof  # (nv, 6, L)
        cvel = mm(cnv_ref, offs_nv, 'bdm', qcdof)  # (nb, 6, L)
        prefix = mm(cnv_ref, offs_nv, 'dpm', qcdof)  # (nv, 6, L)
        pw, pu = prefix[:, :3], prefix[:, 3:]
        cw, cu = cdof[:, :3], cdof[:, 3:]
        cdof_dot = jnp.concatenate(
            [_cross(pw, cw), _cross(pw, cu) + _cross(pu, cw)], axis=1)

        # --- tendon velocity.
        tenv = mm(cnv_ref, offs_nv, 'tenJ', qv)  # (nt, L)

        # --- CRB packed mass matrix.
        crb_acc = mm(cnb_ref, offs_nb, 'sub', cin)  # (nb, 36, L)
        Ic = mm(cnb_ref, offs_nb, 'Gdofb', crb_acc)  # (nv, 36, L)
        buf = jnp.stack([
            sum(Ic[:, 6 * i + j] * cdof[:, j] for j in range(6))
            for i in range(6)], axis=1)  # (nv, 6, L)
        bufp = mm(cnv_ref, offs_nv, 'Glimb', buf).reshape(nl, dm, 6, L)
        cdofp = mm(cnv_ref, offs_nv, 'Glimb', cdof).reshape(nl, dm, 6, L)
        # Mosaic cannot broadcast sublanes and lanes in one op; expand
        # constants to full lane width first (lane-only broadcast), so
        # the multiply below only broadcasts sublanes.
        limbw = jnp.broadcast_to(
            cv('limbw').reshape(nl, dm, 1, 1), (nl, dm, 1, L))
        bufp = bufp * limbw
        cdofp = cdofp * limbw
        # NOTE: mixing None with an integer index in one [] lowers to a
        # >2-D gather, which Mosaic rejects; slice first, then expand.
        bufp_c = [jnp.expand_dims(bufp[:, :, c, :], 2) for c in range(6)]
        bufp_r = [jnp.expand_dims(bufp[:, :, c, :], 1) for c in range(6)]
        cdofp_c = [jnp.expand_dims(cdofp[:, :, c, :], 2) for c in range(6)]
        cdofp_r = [jnp.expand_dims(cdofp[:, :, c, :], 1) for c in range(6)]
        P = sum(bufp_c[c] * cdofp_r[c]
                for c in range(6))  # (nl, dm, dm, L)
        Pt = sum(cdofp_c[c] * bufp_r[c]
                 for c in range(6))
        ancp = cv('ancp').reshape(nl, dm, dm, 1)
        ancpT = cv('ancpT').reshape(nl, dm, dm, 1)
        rows_d = jax.lax.broadcasted_iota(jnp.int32, (1, dm, dm, 1), 1)
        cols_d = jax.lax.broadcasted_iota(jnp.int32, (1, dm, dm, 1), 2)
        eye_d = (rows_d == cols_d).astype(f32)
        diagP = jnp.sum(P * eye_d, axis=2, keepdims=True)  # (nl,dm,1,L)
        limbarm = cv('limbarm').reshape(nl, dm, 1, 1)
        D = (ancp * P + ancpT * Pt - eye_d * diagP
             + eye_d * limbarm)  # (nl, dm, dm, L)
        # Border rows B[l, r, j] = buf_limb_j . cdof_root_r.
        cdof_root = cdof[0:nr]  # (nr, 6, L)
        B = sum(cdof_root[:, c, :][None, :, None, :] * bufp_r[c]
                for c in range(6))  # (nl, nr, dm, L)
        # Root block.
        buf_root = buf[0:nr]
        Pr = sum(buf_root[:, c, :][:, None, :]
                 * cdof_root[:, c, :][None, :, :]
                 for c in range(6))  # (nr, nr, L)
        Prt = sum(cdof_root[:, c, :][:, None, :]
                  * buf_root[:, c, :][None, :, :]
                  for c in range(6))
        ancr = cv('ancr')[:, :, :]  # (nr, nr, 1)
        ancrT = cv('ancrT')[:, :, :]
        rows_r = jax.lax.broadcasted_iota(jnp.int32, (nr, nr, 1), 0)
        cols_r = jax.lax.broadcasted_iota(jnp.int32, (nr, nr, 1), 1)
        eye_r = (rows_r == cols_r).astype(f32)
        diagPr = jnp.sum(Pr * eye_r, axis=1, keepdims=True)  # (nr,1,L)
        arm = cv('armature')[:, 0]  # (nv, 1)
        R = (ancr * Pr + ancrT * Prt - eye_r * diagPr
             + eye_r * arm[0:nr][:, None, :])  # (nr, nr, L)
        limb_rows = jnp.concatenate([D, B], axis=1)
        # Root row padded to (1, dm+nr, dm, L).
        zc = jnp.zeros((nr, dm - nr, L), f32) if dm > nr else None
        Rp = (jnp.concatenate([R, zc], axis=1) if zc is not None
              else R[:, 0:dm])
        zrow = jnp.zeros((dm + nr - nr, dm, L), f32)
        root_row = jnp.concatenate([Rp, zrow], axis=0)[None]
        Mp = jnp.concatenate([limb_rows, root_row], axis=0)
        Mp = Mp + cv('padeye').reshape(nl + 1, dm + nr, dm, 1)

        # --- RNE bias.
        grav3 = cv('gravity')  # (1, 3, 1)
        qcdd = qv[:, None, :] * cdof_dot
        cacc = mm(cnv_ref, offs_nv, 'bdm', qcdd)  # (nb, 6, L)
        gvec = jnp.concatenate(
            [jnp.zeros((1, 3, L), f32), -grav3 + jnp.zeros((1, 3, L),
                                                           f32)], axis=1)
        cacc = cacc + gvec
        Iv = jnp.stack([
            sum(cin[:, 6 * i + j] * cvel[:, j] for j in range(6))
            for i in range(6)], axis=1)
        Ia = jnp.stack([
            sum(cin[:, 6 * i + j] * cacc[:, j] for j in range(6))
            for i in range(6)], axis=1)
        vw, vu = cvel[:, :3], cvel[:, 3:]
        iw, iu = Iv[:, :3], Iv[:, 3:]
        fbody = Ia + jnp.concatenate(
            [_cross(vw, iw) + _cross(vu, iu), _cross(vw, iu)], axis=1)
        fproj = mm(cnb_ref, offs_nb, 'maskT', fbody)  # (nv, 6, L)
        qfrc_bias = jnp.sum(cdof * fproj, axis=1)  # (nv, L)

        # --- passive: springs + dampers + tendon springs/dampers.
        qfrc_pas = (mm(cnq_ref, offs_nq, 'Aspring', qp)
                    + cv('cspring')[:, 0]
                    - cv('damping')[:, 0] * qv)
        tenp = cv('tenp')  # (nt, 4, 1)
        tl = tenl_ref[...][:, 0, :]  # (nt, L)
        ls0, ls1 = tenp[:, 2], tenp[:, 3]
        disp = jnp.where(tl > ls1, tl - ls1,
                         jnp.where(tl < ls0, tl - ls0,
                                   jnp.zeros_like(tl)))
        tfrc = -tenp[:, 0] * disp - tenp[:, 1] * tenv
        qfrc_pas = qfrc_pas + mm(cnt_ref, offs_nt, 'tenJT', tfrc)

        # --- fluid: inertia box (per body).
        # Per-model fluid constants are static: bake them in as Python
        # floats (scalar immediates) — Mosaic rejects the alternative,
        # a (1,1,1)->(n,s,L) vector broadcast ("broadcast in both
        # sublanes and lanes"), and in-kernel rank-0 extracts from VMEM
        # SIGABRT the compiler.
        density = tb['scal']['density']
        viscosity = tb['scal']['viscosity']
        wind3 = tb['scal']['wind']

        def bmul(c, y):
            # Per-row constant c (n, 1, 1) times y (n, s, L). A direct
            # broadcast-multiply needs a sublane+lane double broadcast,
            # which Mosaic can't lower; lane-expand the constant in 2-D
            # (lane-only broadcast) and multiply per sublane row.
            c2 = jnp.broadcast_to(c[:, 0], (y.shape[0], y.shape[2]))
            return jnp.stack([c2 * y[:, i] for i in range(y.shape[1])],
                             axis=1)

        def local_vel(cvel_o_, scom_o_, pos, mat):
            w_ = cvel_o_[:, :3]
            v_ = cvel_o_[:, 3:]
            v_at = v_ + _cross(w_, pos - scom_o_)
            lw = jnp.stack([
                mat[:, 0] * w_[:, 0] + mat[:, 3] * w_[:, 1]
                + mat[:, 6] * w_[:, 2],
                mat[:, 1] * w_[:, 0] + mat[:, 4] * w_[:, 1]
                + mat[:, 7] * w_[:, 2],
                mat[:, 2] * w_[:, 0] + mat[:, 5] * w_[:, 1]
                + mat[:, 8] * w_[:, 2]], axis=1)
            lv = jnp.stack([
                mat[:, 0] * v_at[:, 0] + mat[:, 3] * v_at[:, 1]
                + mat[:, 6] * v_at[:, 2],
                mat[:, 1] * v_at[:, 0] + mat[:, 4] * v_at[:, 1]
                + mat[:, 7] * v_at[:, 2],
                mat[:, 2] * v_at[:, 0] + mat[:, 5] * v_at[:, 1]
                + mat[:, 8] * v_at[:, 2]], axis=1)
            wind_l = jnp.stack([
                mat[:, 0] * wind3[0] + mat[:, 3] * wind3[1]
                + mat[:, 6] * wind3[2],
                mat[:, 1] * wind3[0] + mat[:, 4] * wind3[1]
                + mat[:, 7] * wind3[2],
                mat[:, 2] * wind3[0] + mat[:, 5] * wind3[1]
                + mat[:, 8] * wind3[2]], axis=1)
            return lw, lv - wind_l

        def rot_world(mat, x):
            return jnp.stack([
                mat[:, 0] * x[:, 0] + mat[:, 1] * x[:, 1]
                + mat[:, 2] * x[:, 2],
                mat[:, 3] * x[:, 0] + mat[:, 4] * x[:, 1]
                + mat[:, 5] * x[:, 2],
                mat[:, 6] * x[:, 0] + mat[:, 7] * x[:, 1]
                + mat[:, 8] * x[:, 2]], axis=1)

        boxp = cv('boxp')  # (nb, 12, 1)
        # Reference point: the kinematic ROOT's subtree CoM (matches
        # mj_objectVelocity / the cdof reference point).
        sroot = mm(cnb_ref, offs_nb, 'Groot', scom)  # (nb, 3, L)
        lw_b, lv_b = local_vel(cvel, sroot, xipos, ximat)

        diam = boxp[:, 3:4]  # (nb, 1, 1)
        ltrq = bmul(-jnp.pi * viscosity * diam ** 3, lw_b)
        lfrc = bmul(-3.0 * jnp.pi * viscosity * diam, lv_b)
        lfrc = lfrc - 0.5 * density * jnp.stack([
            boxp[:, 5] * jnp.abs(lv_b[:, 0]) * lv_b[:, 0],
            boxp[:, 6] * jnp.abs(lv_b[:, 1]) * lv_b[:, 1],
            boxp[:, 7] * jnp.abs(lv_b[:, 2]) * lv_b[:, 2]], axis=1)
        ltrq = ltrq - density / 64.0 * jnp.stack([
            boxp[:, 8] * jnp.abs(lw_b[:, 0]) * lw_b[:, 0],
            boxp[:, 9] * jnp.abs(lw_b[:, 1]) * lw_b[:, 1],
            boxp[:, 10] * jnp.abs(lw_b[:, 2]) * lw_b[:, 2]], axis=1)
        wt_b = rot_world(ximat, ltrq)
        wf_b = rot_world(ximat, lfrc)
        bmask = boxp[:, 4:5]  # (nb, 1, 1)
        t_ref_b = wt_b + _cross(xipos - sroot, wf_b)
        fsp_b = bmul(bmask, jnp.concatenate([t_ref_b, wf_b], axis=1))

        # --- fluid: ellipsoid (per geom).
        gpos = gpos_ref[...]
        gmat = gmat_ref[...]
        cvel_g = mm(cnb_ref, offs_nb, 'Ggb', cvel)  # (ng, 6, L)
        scom_g = mm(cnb_ref, offs_nb, 'Ggb', sroot)
        lw_g, lv_g = local_vel(cvel_g, scom_g, gpos, gmat)
        gflA = cv('gflA')  # (ng, 6, 1): virtual mass(3), inertia(3)
        gflB = cv('gflB')  # (ng, 12, 1)
        interaction = gflB[:, 0:1]
        blunt, slender = gflB[:, 1:2], gflB[:, 2:3]
        ang_d, kutta, magnus = gflB[:, 3:4], gflB[:, 4:5], gflB[:, 5:6]
        volume = gflB[:, 6:7]
        A_max = gflB[:, 7:8]
        lin_f, lin_t = gflB[:, 8:9], gflB[:, 9:10]
        I_max = gflB[:, 10:11]
        gmask = gflB[:, 11:12]
        v_lin = density * gflA[:, 0:3] * lv_g
        v_ang = density * gflA[:, 3:6] * lw_g
        fA = _cross(v_lin, lw_g)
        gA = _cross(v_lin, lv_g) + _cross(v_ang, lw_g)
        fM = bmul(density * magnus * volume, _cross(lw_g, lv_g))
        gsz = cv('gszA')  # (ng, 6, 1): (s1s2)^2... (s0s1)^4
        proj_den = (gsz[:, 3] * lv_g[:, 0] ** 2
                    + gsz[:, 4] * lv_g[:, 1] ** 2
                    + gsz[:, 5] * lv_g[:, 2] ** 2)
        proj_num = (gsz[:, 0] * lv_g[:, 0] ** 2
                    + gsz[:, 1] * lv_g[:, 1] ** 2
                    + gsz[:, 2] * lv_g[:, 2] ** 2)
        A_proj = jnp.pi * jnp.sqrt(
            proj_den / jnp.maximum(_MJMINVAL, proj_num))
        norm_v = jnp.stack([gsz[:, 0] * lv_g[:, 0],
                            gsz[:, 1] * lv_g[:, 1],
                            gsz[:, 2] * lv_g[:, 2]], axis=1)
        speed = jnp.sqrt(jnp.maximum(
            jnp.sum(lv_g * lv_g, axis=1), 0.0))
        cos_a = proj_num / jnp.maximum(_MJMINVAL, speed * proj_den)
        circ = (kutta[:, 0] * density * cos_a
                * A_proj)[:, None, :] * _cross(norm_v, lv_g)
        fK = _cross(circ, lv_g)
        gII = cv('gII')  # (ng, 3, 1)
        mom_visc = lw_g * (ang_d * gII + slender * (I_max - gII))
        mv_norm = jnp.sqrt(jnp.maximum(
            jnp.sum(mom_visc * mom_visc, axis=1), 0.0))
        drag_lin = (viscosity * lin_f[:, 0]
                    + density * speed
                    * (A_proj * blunt[:, 0]
                       + slender[:, 0] * (A_max[:, 0] - A_proj)))
        drag_ang = (viscosity * lin_t[:, 0]
                    + density * mv_norm)
        ltrq_g = bmul(interaction, gA - drag_ang[:, None, :] * lw_g)
        lfrc_g = bmul(interaction,
                      fA + fM + fK - drag_lin[:, None, :] * lv_g)
        wt_g = rot_world(gmat, ltrq_g)
        wf_g = rot_world(gmat, lfrc_g)
        t_ref_g = wt_g + _cross(gpos - scom_g, wf_g)
        fsp_g = bmul(gmask, jnp.concatenate([t_ref_g, wf_g], axis=1))
        fsp_gb = jnp.dot(cng_ref[...], fsp_g.reshape(ng, 6 * L),
                         preferred_element_type=f32,
                        precision=_DOT_PRECISION).reshape(nb, 6, L)

        fproj_fl = mm(cnb_ref, offs_nb, 'maskT', fsp_b + fsp_gb)
        qfrc_fluid = jnp.sum(cdof * fproj_fl, axis=1)

        # --- actuation.
        actp = cv('actp')  # (nu, 14, 1)
        gear, gain = actp[:, 0], actp[:, 1]
        b0, b1, b2 = actp[:, 2], actp[:, 3], actp[:, 4]
        affine = actp[:, 5]
        cr0, cr1 = actp[:, 6], actp[:, 7]
        fr0, fr1, limited = actp[:, 8], actp[:, 9], actp[:, 10]
        tau_u = actp[:, 11]
        has_act = actp[:, 12]
        ctrl = jnp.clip(ctrl_ref[...], cr0, cr1)  # (nu, L)
        act = act_ref[...]  # (na, L)
        act_for_u = jnp.dot(cna_ref[...], act,
                            preferred_element_type=f32,
                        precision=_DOT_PRECISION)
        act_dot_u = (ctrl - act_for_u) / tau_u
        adot = mm(cnu_ref, offs_nu, 'ascat', act_dot_u)  # (na, L)
        inp = has_act * act_for_u + (1.0 - has_act) * ctrl
        length = (mm(cnq_ref, offs_nq, 'Gqu', qp)
                  + mm(cnt_ref, offs_nt, 'Gtu', tl)) * gear
        velocity = (mm(cnv_ref, offs_nv, 'Gvu', qv)
                    + mm(cnt_ref, offs_nt, 'Gtu', tenv)) * gear
        bias = b0 + b1 * length + b2 * velocity
        force = gain * inp + affine * bias
        force = limited * jnp.clip(force, fr0, fr1) \
            + (1.0 - limited) * force
        qact = mm(cnu_ref, offs_nu, 'momT', force)  # (nv, L)

        # Compile-fault bisection: FLYBODY_FS_BISECT names outputs to
        # zero out at trace time; their compute chains DCE away, so a
        # successful compile isolates the faulty section. Diagnostics
        # only — parity tests fail loudly if left set.
        import os as _os
        _skip = frozenset(
            p.strip() for p in
            _os.environ.get('FLYBODY_FS_BISECT', '').split(',') if p.strip())

        def w(ref, name, val):
            ref[...] = jnp.zeros(ref.shape, ref.dtype) \
                if name in _skip else val

        w(cvel_o, 'cvel', cvel)
        w(cdd_o, 'cdd', cdof_dot)
        w(tenv_o, 'tenv', tenv[:, None, :])
        w(bias_o, 'bias', qfrc_bias[:, None, :])
        w(pas_o, 'pas', qfrc_pas[:, None, :])
        w(fld_o, 'fld', qfrc_fluid[:, None, :])
        w(qact_o, 'qact', qact[:, None, :])
        # actuator_force is the one non-matmul vector among the
        # outputs; storing it as (nu, 1, L) forces a sublane relayout
        # that crashes Mosaic's LLO lowering (Check failed: d >> 32 == 0)
        # on v5e, so its output stays 2-D (nu, L).
        w(afrc_o, 'afrc', force)
        w(adot_o, 'adot', adot[:, None, :])
        w(mp_o, 'mp', Mp)

    return body


def _run_pallas(tb, body, batched, consts, interpret):
    d = tb['dims']
    nb, nv, nt = d['nb'], d['nv'], d['nt']
    nu, na = d['nu'], d['na_k']
    nl, dm, nr = d['nl'], d['dm'], d['nr']
    B = batched[0].shape[-1]
    grid = (B // LANES,)

    def lspec(*shape):
        return pl.BlockSpec(shape + (LANES,),
                            lambda i: (0,) * len(shape) + (i,),
                            memory_space=pltpu.VMEM)

    def cspec(m):
        return pl.BlockSpec(m.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    f32 = jnp.float32
    in_specs = ([lspec(*v.shape[:-1]) for v in batched]
                + [cspec(c) for c in consts])
    outs = (jax.ShapeDtypeStruct((nb, 6, B), f32),
            jax.ShapeDtypeStruct((nv, 6, B), f32),
            jax.ShapeDtypeStruct((nt, 1, B), f32),
            jax.ShapeDtypeStruct((nv, 1, B), f32),
            jax.ShapeDtypeStruct((nv, 1, B), f32),
            jax.ShapeDtypeStruct((nv, 1, B), f32),
            jax.ShapeDtypeStruct((nv, 1, B), f32),
            jax.ShapeDtypeStruct((nu, B), f32),
            jax.ShapeDtypeStruct((na, 1, B), f32),
            jax.ShapeDtypeStruct((nl + 1, dm + nr, dm, B), f32))
    out_specs = (lspec(nb, 6), lspec(nv, 6), lspec(nt, 1), lspec(nv, 1),
                 lspec(nv, 1), lspec(nv, 1), lspec(nv, 1), lspec(nu),
                 lspec(na, 1), lspec(nl + 1, dm + nr, dm))
    return pl.pallas_call(
        body,
        out_shape=outs,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*batched, *consts)


def _ref_outputs(model, qpos, qvel, act, ctrl, cdof, cinert, xipos,
                 ximat, subtree_com, geom_xpos, geom_xmat, ten_length):
    """Single-env jnp reference: the existing XLA stages."""
    from flybody_tpu.physics import fluid as _fl
    from flybody_tpu.physics import smooth as _sm
    from flybody_tpu.physics.state import make_data
    d = make_data(model, dtype=qpos.dtype).replace(
        qpos=qpos, qvel=qvel, act=act, ctrl=ctrl, cdof=cdof,
        cinert=cinert, xipos=xipos, ximat=ximat,
        subtree_com=subtree_com, geom_xpos=geom_xpos,
        geom_xmat=geom_xmat, ten_length=ten_length)
    d = _sm.com_vel(model, d)
    d = _sm.tendon_vel(model, d)
    d = _sm.crb_packed(model, d)
    d = _sm.rne(model, d)
    d = _sm.passive(model, d)
    d = _fl.fluid(model, d)
    d = _sm.actuation(model, d)
    return (d.cvel, d.cdof_dot, d.ten_velocity, d.qfrc_bias,
            d.qfrc_passive, d.qfrc_fluid, d.qfrc_actuator,
            d.actuator_force, d.act_dot, d.qM)


def make_force_stage_pe(model, interpret: bool = False):
    """Per-env fused velocity+force stage; pallas-batched under vmap.

    Returns None for unsupported models. f(qpos, qvel, act, ctrl, cdof,
    cinert, xipos, ximat, subtree_com, geom_xpos, geom_xmat, ten_length)
    -> (cvel, cdof_dot, ten_velocity, qfrc_bias, qfrc_passive,
    qfrc_fluid, qfrc_actuator, actuator_force, act_dot, qM_packed)."""
    tb = build_tables(model)
    if tb is None:
        return None
    body = _make_kernel(tb)
    consts = tuple(jnp.asarray(tb[k], jnp.float32)
                   for k in ('CNV', 'CNQ', 'CNB', 'CNG', 'CNU', 'CNA',
                             'CNT', 'CV'))
    nouts = 10

    @custom_batching.custom_vmap
    def f(qpos, qvel, act, ctrl, cdof, cinert, xipos, ximat,
          subtree_com, geom_xpos, geom_xmat, ten_length):
        return _ref_outputs(model, qpos, qvel, act, ctrl, cdof, cinert,
                            xipos, ximat, subtree_com, geom_xpos,
                            geom_xmat, ten_length)

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        del axis_size
        from flybody_tpu.ops.dispatch import pallas_enabled
        if not all(in_batched) or not (pallas_enabled('forcestage')
                                       or interpret):
            axes = [0 if b else None for b in in_batched]
            out = jax.vmap(lambda *a: _ref_outputs(model, *a),
                           in_axes=axes)(*args)
            return out, tuple(True for _ in range(nouts))
        B = args[0].shape[0]
        pad = (-B) % LANES
        d = tb['dims']

        def tol(v, chan):
            v = jnp.moveaxis(v.astype(jnp.float32), 0, -1)
            if chan is not None:
                v = v.reshape(chan + (v.shape[-1],))
            if pad:
                v = jnp.concatenate(
                    [v, jnp.zeros(v.shape[:-1] + (pad,), jnp.float32)],
                    axis=-1)
            return v

        (qpos, qvel, act, ctrl, cdof, cinert, xipos, ximat, scom,
         gpos, gmat, tenl) = args
        if d['na'] == 0:
            act = jnp.zeros((B, 1), jnp.float32)
        batched = (
            tol(qpos, None), tol(qvel, None), tol(act, None),
            tol(ctrl, None), tol(cdof, None),
            tol(cinert.reshape(B, d['nb'], 36), None),
            tol(xipos, None),
            tol(ximat.reshape(B, d['nb'], 9), None), tol(scom, None),
            tol(gpos, None), tol(gmat.reshape(B, d['ng'], 9), None),
            tol(tenl.reshape(B, d['nt'], 1), None))
        outs = _run_pallas(tb, body, batched, consts, interpret)

        def fro(v):
            return jnp.moveaxis(v[..., :B], -1, 0)

        (cvel, cdd, tenv, bias, pas, fld, qact, afrc, adot, mp) = [
            fro(v) for v in outs]
        out = (cvel, cdd, tenv[:, :, 0], bias[:, :, 0], pas[:, :, 0],
               fld[:, :, 0], qact[:, :, 0], afrc,
               adot[:, :d['na'], 0], mp)
        return out, tuple(True for _ in range(nouts))

    return f
