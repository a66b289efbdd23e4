"""Fused sensor kernel: the full sensordata vector in ONE launch.

The XLA sensor stage (physics/sensors.py) evaluates ~15 sensors as a
chain of small per-site ops plus the mj_rnePostConstraint machinery
(post-constraint body accelerations, contact wrenches, subtree internal
forces) — ~12 ms/substep of launch + HBM overhead at batch 8192. This
kernel computes everything VMEM-resident, including the contact-wrench
scatter (a traced-body one-hot built from lane-wise compares, summed
over the K contact slots).

Inputs are the post-solve state (qacc) plus position/velocity-stage
outputs and the selected contact rows. Models applying xfrc_applied
fall back to the XLA path (rare: template-task experiments).

Reference semantics: physics/sensors.py (parity-tested vs CPU MuJoCo).
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


def build_tables(model):
    meta = model.meta
    try:
        bdm = np.asarray(model.body_dof_mask, np.float64)
    except Exception:
        return None
    if meta.nsensor == 0:
        return None
    from flybody_tpu.physics import sensors as _sens
    rows, sub = _sens._sensor_tables(meta)
    for r in rows:
        if r['type'] not in (_s.SENS_GYRO, _s.SENS_VELOCIMETER,
                             _s.SENS_ACCELEROMETER, _s.SENS_FORCE,
                             _s.SENS_TOUCH):
            return None
    cut = np.asarray(model.sensor_cutoff, np.float64)
    cutvec = np.concatenate(
        [np.broadcast_to(cut[r['cutoff_idx']], (r['dim'],))
         for r in rows])
    dims = dict(nb=meta.nbody, nv=meta.nv, ns=meta.nsite,
                nsd=meta.nsensordata)
    nb = meta.nbody
    # Per-row constant pack: [gravity | cutvec | body_rootid-as-float].
    CV = np.zeros((1 + meta.nsensordata + nb, 3))
    CV[0, :3] = np.asarray(model.gravity, np.float64)
    CV[1:1 + meta.nsensordata, 0] = cutvec
    CV[1 + meta.nsensordata:, 0] = np.asarray(meta.body_rootid,
                                              np.float64)
    return dict(CNV=bdm, CNB=sub, CV=CV, rows=tuple(
        (int(r['type']), int(r['objid'])) for r in rows),
        site_bodyid=tuple(int(b) for b in meta.site_bodyid),
        body_rootid=tuple(int(b) for b in meta.body_rootid),
        dims=dims)


def _cross(a, b):
    a0, a1, a2 = a[:, 0], a[:, 1], a[:, 2]
    b0, b1, b2 = b[:, 0], b[:, 1], b[:, 2]
    return jnp.stack([a1 * b2 - a2 * b1, a2 * b0 - a0 * b2,
                      a0 * b1 - a1 * b0], axis=1)


def _make_kernel(tb):
    d = tb['dims']
    nb, nv, nsd = d['nb'], d['nv'], d['nsd']
    rows = tb['rows']
    site_body = tb['site_bodyid']
    body_root = tb['body_rootid']

    def body(qacc_ref, qvel_ref, cvel_ref, cdof_ref, cdd_ref, cin_ref,
             spos_ref, smat_ref, scom_ref, cxp_ref, cn_ref, cb_ref,
             cact_ref, fc_ref, cnv_ref, cnb_ref, cv_ref, out_ref):
        L = qacc_ref.shape[-1]
        f32 = jnp.float32
        bdm = cnv_ref[...]
        qacc = qacc_ref[...]
        qvel = qvel_ref[...]
        cdof = cdof_ref[...]
        cdd = cdd_ref[...]
        cvel = cvel_ref[...]
        cin = cin_ref[...]
        scom = scom_ref[...]
        spos = spos_ref[...]
        smat = smat_ref[...]

        # cacc = gravity + (A . qacc) @ cdof + (A . qvel) @ cdof_dot.
        x = qacc[:, None, :] * cdof + qvel[:, None, :] * cdd  # (nv,6,L)
        cacc = jnp.dot(bdm, x.reshape(nv, 6 * L),
                       preferred_element_type=f32,
                        precision=_DOT_PRECISION).reshape(nb, 6, L)
        gvec = jnp.concatenate([
            jnp.zeros((1, 3, L), f32),
            jnp.zeros((1, 3, L), f32)
            - cv_ref[0:1, 0:3][:, :, None]], axis=1)
        cacc = cacc + gvec

        # h = I cacc + v x* (I v).
        Iv = jnp.stack([
            sum(cin[:, 6 * i + j] * cvel[:, j] for j in range(6))
            for i in range(6)], axis=1)
        Ia = jnp.stack([
            sum(cin[:, 6 * i + j] * cacc[:, j] for j in range(6))
            for i in range(6)], axis=1)
        vw, vu = cvel[:, :3], cvel[:, 3:]
        iw, iu = Iv[:, :3], Iv[:, 3:]
        h = Ia + jnp.concatenate(
            [_cross(vw, iw) + _cross(vu, iu), _cross(vw, iu)], axis=1)

        # Contact wrenches (traced bodies -> iota-compare one-hots).
        cxp = cxp_ref[...]        # (K, 3, L)
        cn = cn_ref[...]          # (K, 3, L)
        cb = cb_ref[...]          # (2, K, L) float body ids
        cact = cact_ref[...]      # (1, K, L)
        fc = fc_ref[...]          # (K, 3, L) contact-frame forces
        K = cxp.shape[0]
        # Tangent frame (solver.make_frame).
        n0, n1, n2 = cn[:, 0], cn[:, 1], cn[:, 2]
        big = jnp.abs(n0) > 0.9
        h0 = jnp.where(big, 0.0, 1.0)
        h2 = jnp.where(big, 1.0, 0.0)
        hlp = jnp.stack([h0, jnp.zeros_like(h0), h2], axis=1)
        t1v = _cross(cn, hlp)
        t1n = jnp.sqrt(jnp.maximum(
            jnp.sum(t1v * t1v, axis=1, keepdims=True), 1e-30))
        t1v = t1v / jnp.maximum(t1n, 1e-15)
        t2v = _cross(cn, t1v)
        # World force on body2 (+): f_c through the frame rows.
        fw = (fc[:, 0:1] * cn + fc[:, 1:2] * t1v + fc[:, 2:3] * t2v)
        # Gather per-contact root references through body one-hots.
        biota = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
        rootf = cv_ref[1 + nsd:1 + nsd + nb, 0:1].reshape(
            1, nb)[:, :, None]

        def scatter_wrench(bodyf, sign):
            oh = (jnp.abs(bodyf[:, None, :]
                          - biota.astype(f32)) < 0.5).astype(f32)
            # (K, nb, L); per-contact root subtree com.
            rsel = jnp.sum(oh * rootf, axis=1)  # (K, L) root body id
            ohr = (jnp.abs(rsel[:, None, :]
                           - biota.astype(f32)) < 0.5).astype(f32)
            # (None + int index in one [] lowers to >2-D gather, which
            # Mosaic rejects; slice with the int first, then expand.)
            ref = jnp.stack([
                jnp.sum(ohr * scom[:, 0, :][None], axis=1),
                jnp.sum(ohr * scom[:, 1, :][None], axis=1),
                jnp.sum(ohr * scom[:, 2, :][None], axis=1)], axis=1)
            trq = _cross(cxp - ref, sign * fw)
            w6 = jnp.concatenate([trq, sign * fw], axis=1) \
                * cact[0][:, None, :]
            return jnp.stack([
                jnp.sum(oh * w6[:, c:c + 1, :], axis=0)
                for c in range(6)], axis=1)  # (nb, 6, L)

        cfrc_ext = scatter_wrench(cb[0], -1.0) + scatter_wrench(
            cb[1], 1.0)
        net = h - cfrc_ext
        fint = jnp.dot(cnb_ref[...], net.reshape(nb, 6 * L),
                       preferred_element_type=f32,
                        precision=_DOT_PRECISION).reshape(nb, 6, L)

        # Per-sensor segments (static site/body ids -> static slices).
        normal_force = jnp.maximum(fc[:, 0], 0.0) * cact[0]  # (K, L)
        segs = []
        for (t, sid) in rows:
            b = site_body[sid] if t != _s.SENS_TOUCH else site_body[sid]
            rb = body_root[b]
            R = smat[sid]  # (9, L) row-major
            p = spos[sid]  # (3, L)
            ref = scom[rb]  # (3, L)

            def rT(v):  # R^T v, v (3, L)
                return jnp.stack([
                    R[0] * v[0] + R[3] * v[1] + R[6] * v[2],
                    R[1] * v[0] + R[4] * v[1] + R[7] * v[2],
                    R[2] * v[0] + R[5] * v[1] + R[8] * v[2]], axis=0)

            def cr(a, b_):
                return jnp.stack([
                    a[1] * b_[2] - a[2] * b_[1],
                    a[2] * b_[0] - a[0] * b_[2],
                    a[0] * b_[1] - a[1] * b_[0]], axis=0)

            w = cvel[b, :3]
            v = cvel[b, 3:]
            if t == _s.SENS_GYRO:
                segs.append(rT(w))
            elif t == _s.SENS_VELOCIMETER:
                v_at = v + cr(w, p - ref)
                segs.append(rT(v_at))
            elif t == _s.SENS_ACCELEROMETER:
                wa = cacc[b, :3]
                va = cacc[b, 3:]
                a_lin = va + cr(wa, p - ref)
                v_at = v + cr(w, p - ref)
                a_conv = a_lin + cr(w, v_at)
                segs.append(rT(a_conv))
            elif t == _s.SENS_FORCE:
                segs.append(rT(fint[b, 3:]))
            elif t == _s.SENS_TOUCH:
                bf = float(b)
                involve = ((jnp.abs(cb[0] - bf) < 0.5)
                           | (jnp.abs(cb[1] - bf) < 0.5)).astype(f32)
                segs.append(jnp.sum(involve * normal_force, axis=0,
                                    keepdims=True))
        out = jnp.concatenate(segs, axis=0)  # (nsd, L)
        cutv = cv_ref[1:1 + nsd, 0:1]
        out = jnp.where(cutv > 0, jnp.clip(out, -cutv, cutv), out)
        out_ref[...] = out[:, None, :]

    return body


def _run_pallas(tb, body, batched, consts, interpret):
    d = tb['dims']
    nsd = d['nsd']
    B = batched[0].shape[-1]
    grid = (B // LANES,)

    def lspec(*shape):
        return pl.BlockSpec(shape + (LANES,),
                            lambda i: (0,) * len(shape) + (i,),
                            memory_space=pltpu.VMEM)

    def cspec(m):
        return pl.BlockSpec(m.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((nsd, 1, B), jnp.float32),
        grid=grid,
        in_specs=([lspec(*v.shape[:-1]) for v in batched]
                  + [cspec(c) for c in consts]),
        out_specs=lspec(nsd, 1),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*batched, *consts)


def _ref_outputs(model, qacc, qvel, cvel, cdof, cdof_dot, cinert,
                 site_xpos, site_xmat, subtree_com, con_xpos,
                 con_normal, con_b12, con_active, f_c):
    """Single-env jnp reference via physics/sensors.py."""
    from flybody_tpu.physics import sensors as _sens
    from flybody_tpu.physics import solver as _sol
    from flybody_tpu.physics.state import make_data
    d = make_data(model, dtype=qacc.dtype).replace(
        qacc=qacc, qvel=qvel, cvel=cvel, cdof=cdof, cdof_dot=cdof_dot,
        cinert=cinert, site_xpos=site_xpos, site_xmat=site_xmat,
        subtree_com=subtree_com)
    K = con_xpos.shape[0]
    dt = qacc.dtype
    efc = _sol.EfcRows(
        lim_dof=np.zeros(0, np.int64), lim_sign=np.zeros(0),
        lim_active=jnp.zeros((0,), dt), lim_aref=jnp.zeros((0,), dt),
        lim_D=jnp.zeros((0,), dt), lim_pos=jnp.zeros((0,), dt),
        con_J=jnp.zeros((K, 3, model.meta.nv), dt),
        con_active=con_active,
        con_frictional=jnp.ones((K,), dt), con_mu=jnp.ones((K,), dt),
        con_aref=jnp.zeros((K, 3), dt), con_D=jnp.ones((K,), dt),
        con_pos=jnp.zeros((K,), dt),
        con_sel=jnp.zeros((K,), jnp.int32),
        con_xpos=con_xpos, con_normal=con_normal,
        con_body1=jnp.round(con_b12[0]).astype(jnp.int32),
        con_body2=jnp.round(con_b12[1]).astype(jnp.int32),
        con_self=jnp.zeros((K,), dt), con_break=jnp.zeros((K,), dt))
    return _sens.sensordata(model, d, efc, f_c)


def make_sens_stage_pe(model, interpret: bool = False):
    """Per-env fused sensor stage; pallas-batched under vmap on TPU.

    f(qacc, qvel, cvel, cdof, cdof_dot, cinert, site_xpos, site_xmat,
    subtree_com, con_xpos, con_normal, con_b12 (2, K) float,
    con_active, f_c) -> sensordata (nsensordata,). Returns None for
    unsupported models."""
    tb = build_tables(model)
    if tb is None:
        return None
    body = _make_kernel(tb)
    consts = tuple(jnp.asarray(tb[k], jnp.float32)
                   for k in ('CNV', 'CNB', 'CV'))

    @custom_batching.custom_vmap
    def f(qacc, qvel, cvel, cdof, cdof_dot, cinert, site_xpos,
          site_xmat, subtree_com, con_xpos, con_normal, con_b12,
          con_active, f_c):
        return _ref_outputs(model, qacc, qvel, cvel, cdof, cdof_dot,
                            cinert, site_xpos, site_xmat, subtree_com,
                            con_xpos, con_normal, con_b12, con_active,
                            f_c)

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        del axis_size
        from flybody_tpu.ops.dispatch import pallas_enabled
        if not all(in_batched) or not (pallas_enabled('sensstage')
                                       or interpret):
            axes = [0 if b else None for b in in_batched]
            out = jax.vmap(lambda *a: _ref_outputs(model, *a),
                           in_axes=axes)(*args)
            return out, True
        B = args[0].shape[0]
        pad = (-B) % LANES
        d = tb['dims']

        def tol(v, chan=None):
            v = jnp.moveaxis(v.astype(jnp.float32), 0, -1)
            if chan is not None:
                v = v.reshape(chan + (v.shape[-1],))
            if pad:
                v = jnp.concatenate(
                    [v, jnp.zeros(v.shape[:-1] + (pad,), jnp.float32)],
                    axis=-1)
            return v

        (qacc, qvel, cvel, cdof, cdd, cinert, spos, smat, scom, cxp,
         cn, cb12, cact, fc) = args
        K = cxp.shape[1]
        batched = (
            tol(qacc), tol(qvel), tol(cvel), tol(cdof), tol(cdd),
            tol(cinert.reshape(B, d['nb'], 36)), tol(spos),
            tol(smat.reshape(B, d['ns'], 9)), tol(scom), tol(cxp),
            tol(cn), tol(cb12), tol(cact.reshape(B, 1, K)), tol(fc))
        out = _run_pallas(tb, body, batched, consts, interpret)
        return jnp.moveaxis(out[:, 0, :B], -1, 0), True

    return f
