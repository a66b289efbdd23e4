"""Contact constraint-row assembly (make_efc's contact half) as ONE
Pallas kernel.

The XLA path (physics/solver.py make_efc, reference semantics from
MuJoCo's mj_makeConstraint consumed by flybody via dm_control) costs
~15-30 ms/substep at batch 8192: an exact top-k sort over the compact
candidate set, three one-hot gather GEMMs (batched matmul instances
serialize on the MXU), the contact-frame/Jacobian assembly, and the
aref/D row parameters — ~10 separate XLA fusions each paying a kernel
launch + HBM round trip.

This kernel runs the whole chain VMEM-resident per (candidates, 128
envs) block:

  1. iterative top-K selection by score = dist - includemargin
     (exact min-extraction, K unrolled steps — no sort),
  2. per-selection candidate-row extraction by masked reduction
     (one-hot x feature planes),
  3. body-mask Jacobian rows via real MXU matmuls against the static
     (nv, nbody) dof-mask table,
  4. contact frame, velocity, KBI impedance, aref/D assembly
     (componentized math identical to the XLA reference).

Layout: envs on lanes (128), candidates/rows on sublanes — the same
(channels, items, B) recipe as ops/narrowphase.py. Static model tables
are passed as unbatched 2-D inputs (Mosaic forbids captured array
constants).

Single-kinematic-tree scenes only (the 6-wide gkr contraction of
solver.make_efc); multi-fly scenes fall back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_BIG = 3e38


def _impedance(d0, dmax, width, mid, power, r):
    """Componentized MuJoCo solimp sigmoid (solver.impedance)."""
    x = jnp.clip(jnp.abs(r) / jnp.maximum(width, 1e-15), 0.0, 1.0)
    # x ** power with traced power: exp/log form, guarded at x=0 (the
    # limit is 0 and exp(power*log(eps)) underflows to 0 as required).
    xp = jnp.exp(power * jnp.log(jnp.maximum(x, 1e-30)))
    omx = jnp.exp(power * jnp.log(jnp.maximum(1.0 - x, 1e-30)))
    midp = jnp.exp((power - 1.0) * jnp.log(jnp.maximum(mid, 1e-30)))
    omidp = jnp.exp((power - 1.0) * jnp.log(jnp.maximum(1.0 - mid,
                                                        1e-30)))
    lo = xp / jnp.maximum(midp, 1e-15)
    hi = 1.0 - omx / jnp.maximum(omidp, 1e-15)
    y = jnp.where(x <= mid, lo, hi)
    imp = d0 + y * (dmax - d0)
    return jnp.clip(imp, 1e-5, 1.0 - 1e-5)


def _kbi(sr0, sr1, si0, si1, si2, si3, si4, r):
    """Componentized solver.kbi."""
    imp = _impedance(si0, si1, si2, si3, si4, r)
    std = sr0 > 0
    K = jnp.where(std,
                  1.0 / jnp.maximum((si1 * sr0 * sr1) ** 2, 1e-15),
                  -sr0 / jnp.maximum(si1 * si1, 1e-15))
    B = jnp.where(std, 2.0 / jnp.maximum(si1 * sr0, 1e-15),
                  -sr1 / jnp.maximum(si1, 1e-15))
    return K, B, imp


# Candidate feature-row layout inside the stacked F array:
#   0     dist
#   1:4   pos
#   4:7   normal
#   7     includemargin        (efc_slot_table col 0)
#   8     mu                   (col 1)
#   9:11  solref               (cols 2:4)
#   11:16 solimp               (cols 4:9)
#   16    condim               (col 9)
#   17    diag                 (col 10)
#   18    body1                (col 11)
#   19    body2                (col 12)
#   20    selfmask             (col 13)
#   21    gid
_NF = 22

# Scalar output-row layout (out_scal, (NS, K, E)):
#   0 dist | 1 active | 2 frictional | 3 mu | 4 D
#   5:8 aref | 8:11 xpos | 11:14 normal
#   14 body1 | 15 body2 | 16 self | 17 break | 18 gid
_NS = 19


def _kernel(K, nv, nbody, b_ref, u_ref, g_ref, qvel_ref, cdof_ref,
            com_ref, maskt_ref, limb_ref, j_ref, s_ref):
    """b (7, C, E), u (14, C, E), g (1, C, E), qvel (nv, E),
    cdof (6, nv, E), com (3, E) [root subtree com],
    maskt (nv, nbody) static dof-mask^T, limb (1, nbody) static;
    outputs j (K*3, nv, E), s (_NS, K, E)."""
    C = b_ref.shape[1]
    E = b_ref.shape[2]
    f32 = b_ref.dtype

    F = jnp.concatenate([b_ref[...], u_ref[...], g_ref[...]], axis=0)
    score = F[0] - F[7]  # dist - includemargin, (C, E)
    # Mosaic requires integer iota (tpu.iota rejects float results).
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (C, E), 0)

    sels = []
    sc = score
    for _ in range(K):
        m = jnp.min(sc, axis=0, keepdims=True)  # (1, E)
        idx = jnp.min(jnp.where(sc == m, iota_c, C), axis=0,
                      keepdims=True)  # first argmin, (1, E)
        oh = iota_c == idx  # (C, E) exactly-one-hot
        sel = jnp.sum(jnp.where(oh[None], F, 0.0), axis=1)  # (_NF, E)
        sels.append(sel)
        sc = jnp.where(oh, _BIG, sc)

    def row(i):  # (K, E) plane of selected feature i — 2-D ops only
        return jnp.concatenate([s[i:i + 1] for s in sels], axis=0)

    dist = row(0)
    pos = (row(1), row(2), row(3))
    n = (row(4), row(5), row(6))
    incl = row(7)
    mu = row(8)
    sr0, sr1 = row(9), row(10)
    si = (row(11), row(12), row(13), row(14), row(15))
    condim = row(16)
    diag = row(17)
    b1 = row(18)
    b2 = row(19)
    selfm = row(20)
    gid = row(21)

    # Contact frame (solver.make_frame, componentized).
    ex = (jnp.ones_like(dist), jnp.zeros_like(dist), jnp.zeros_like(dist))
    ez = (jnp.zeros_like(dist), jnp.zeros_like(dist), jnp.ones_like(dist))
    usex = jnp.abs(n[0]) > 0.9
    h = (jnp.where(usex, ez[0], ex[0]), jnp.where(usex, ez[1], ex[1]),
         jnp.where(usex, ez[2], ex[2]))
    t1 = (n[1] * h[2] - n[2] * h[1], n[2] * h[0] - n[0] * h[2],
          n[0] * h[1] - n[1] * h[0])
    t1n = jnp.maximum(
        jnp.sqrt(t1[0] ** 2 + t1[1] ** 2 + t1[2] ** 2), 1e-15)
    t1 = (t1[0] / t1n, t1[1] / t1n, t1[2] / t1n)
    t2 = (n[1] * t1[2] - n[2] * t1[1], n[2] * t1[0] - n[0] * t1[2],
          n[0] * t1[1] - n[1] * t1[0])
    frame = (n, t1, t2)

    # arm = pos - root subtree com, (3 comps of (K, E)).
    com = com_ref[...]
    arm = (pos[0] - com[0:1], pos[1] - com[1:2], pos[2] - com[2:3])

    qvel = qvel_ref[...]  # (nv, E)
    maskt = maskt_ref[...]  # (nv, nbody) static
    limb = limb_ref[...]  # (1, nbody) static
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (nbody, E), 0)
    b1i = jnp.round(b1).astype(jnp.int32)
    b2i = jnp.round(b2).astype(jnp.int32)

    vel_rows = [[], [], []]
    l1s, l2s = [], []
    for k in range(K):
        oh1 = (iota_b == b1i[k:k + 1]).astype(f32)  # (nbody, E)
        oh2 = (iota_b == b2i[k:k + 1]).astype(f32)
        # w = dof-mask difference row, (nv, E): one clean MXU matmul
        # against the static mask (0/1 entries exact in bf16).
        w = jax.lax.dot_general(
            maskt, oh2 - oh1, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        l1s.append(jax.lax.dot_general(
            limb, oh1, (((1,), (0,)), ((), ())),
            preferred_element_type=f32))
        l2s.append(jax.lax.dot_general(
            limb, oh2, (((1,), (0,)), ((), ())),
            preferred_element_type=f32))
        for r in range(3):
            fr = (frame[r][0][k:k + 1], frame[r][1][k:k + 1],
                  frame[r][2][k:k + 1])
            ak = (arm[0][k:k + 1], arm[1][k:k + 1], arm[2][k:k + 1])
            cx = (ak[1] * fr[2] - ak[2] * fr[1],
                  ak[2] * fr[0] - ak[0] * fr[2],
                  ak[0] * fr[1] - ak[1] * fr[0])
            gkr = (cx[0], cx[1], cx[2], fr[0], fr[1], fr[2])  # 6x (1, E)
            Jkr = (cdof_ref[0] * gkr[0] + cdof_ref[1] * gkr[1]
                   + cdof_ref[2] * gkr[2] + cdof_ref[3] * gkr[3]
                   + cdof_ref[4] * gkr[4] + cdof_ref[5] * gkr[5])
            Jkr = Jkr * w  # (nv, E)
            j_ref[k * 3 + r] = Jkr
            vel_rows[r].append(
                jnp.sum(Jkr * qvel, axis=0, keepdims=True))  # (1, E)

    vel = [jnp.concatenate(vel_rows[r], axis=0) for r in range(3)]  # (K,E)
    l1 = jnp.concatenate(l1s, axis=0)  # (K, E)
    l2 = jnp.concatenate(l2s, axis=0)

    r_c = dist - incl
    Kc, Bc, imp = _kbi(sr0, sr1, si[0], si[1], si[2], si[3], si[4], r_c)
    aref_n = -Bc * vel[0] - Kc * imp * r_c
    aref_t1 = -Bc * vel[1]
    aref_t2 = -Bc * vel[2]
    R = jnp.maximum((1.0 - imp) / imp * diag, 1e-12)
    D = 1.0 / R

    active = (dist < incl).astype(f32)
    frictional = (condim >= 3.0).astype(f32)
    brk = ((jnp.abs(l1 - l2) > 0.5) & (l1 > -0.5)
           & (l2 > -0.5)).astype(f32)

    s_ref[0] = dist
    s_ref[1] = active
    s_ref[2] = frictional
    s_ref[3] = mu
    s_ref[4] = D
    s_ref[5] = aref_n
    s_ref[6] = aref_t1
    s_ref[7] = aref_t2
    s_ref[8] = pos[0]
    s_ref[9] = pos[1]
    s_ref[10] = pos[2]
    s_ref[11] = n[0]
    s_ref[12] = n[1]
    s_ref[13] = n[2]
    s_ref[14] = b1
    s_ref[15] = b2
    s_ref[16] = selfm
    s_ref[17] = brk
    s_ref[18] = gid


@functools.partial(jax.jit,
                   static_argnames=('K', 'nv', 'nbody', 'interpret'))
def _efc_pallas(K, nv, nbody, b_t, u_t, g_t, qvel_t, cdof_t, com_t,
                maskt, limb, interpret=False):
    B = b_t.shape[-1]
    C = b_t.shape[1]
    grid = (B // LANES,)

    def spec(c, rows):
        return pl.BlockSpec((c, rows, LANES), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    def spec2(rows):
        return pl.BlockSpec((rows, LANES), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def spec_u(r, c):
        return pl.BlockSpec((r, c), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, K, nv, nbody),
        out_shape=(jax.ShapeDtypeStruct((K * 3, nv, B), b_t.dtype),
                   jax.ShapeDtypeStruct((_NS, K, B), b_t.dtype)),
        grid=grid,
        in_specs=[spec(7, C), spec(14, C), spec(1, C), spec2(nv),
                  spec(6, nv), spec2(3), spec_u(nv, nbody),
                  spec_u(1, nbody)],
        out_specs=(spec(K * 3, nv), spec(_NS, K)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(b_t, u_t, g_t, qvel_t, cdof_t, com_t, maskt, limb)


@functools.lru_cache(maxsize=8)
def make_efc_contacts_pe(K: int, nv: int, nbody: int,
                         interpret: bool = False):
    """Per-env contact-row assembly; pallas-batched under vmap on TPU.

    Args per env: cand_b (C, 7) [dist|pos|normal], cand_u (C, 14)
    efc_slot_table rows, cand_g (C,) global slot ids, qvel (nv,),
    cdof (nv, 6), com_root (3,); unbatched static: maskt (nv, nbody)
    dof-mask^T, limb (1, nbody) limb-of-body (or -1).

    Returns (con_J (K, 3, nv), scal (_NS, K)) matching solver.make_efc's
    contact outputs (see _NS layout above).
    """

    def reference(cand_b, cand_u, cand_g, qvel, cdof, com_root, maskt,
                  limb):
        from flybody_tpu.physics import solver as _sol
        return _sol._contact_rows_ref(cand_b, cand_u, cand_g, qvel,
                                      cdof, com_root, maskt, limb, K)

    @custom_batching.custom_vmap
    def f(cand_b, cand_u, cand_g, qvel, cdof, com_root, maskt, limb):
        return reference(cand_b, cand_u, cand_g, qvel, cdof, com_root,
                         maskt, limb)

    @f.def_vmap
    def _rule(axis_size, in_batched, cand_b, cand_u, cand_g, qvel, cdof,
              com_root, maskt, limb):
        from flybody_tpu.ops.dispatch import pallas_enabled
        needed = (all(in_batched[:6]) and not in_batched[6]
                  and not in_batched[7])
        if not needed or not (pallas_enabled('efcstage') or interpret):
            axes = tuple(0 if bb else None for bb in in_batched)
            out = jax.vmap(reference, in_axes=axes)(
                cand_b, cand_u, cand_g, qvel, cdof, com_root, maskt,
                limb)
            return out, (True, True)
        B = cand_b.shape[0]
        nv = qvel.shape[-1]
        pad = (-B) % LANES
        padc = (-cand_b.shape[1]) % 8

        def padlanes(v):
            if pad:
                v = jnp.concatenate(
                    [v, jnp.zeros(v.shape[:-1] + (pad,), v.dtype)],
                    axis=-1)
            return v

        def cand_t(v, pad_dist):
            """(B, C[, F]) -> (F, C_pad, B_pad)."""
            if v.ndim == 2:
                v = v[:, :, None]
            v = jnp.swapaxes(jnp.moveaxis(v, 0, -1), 0, 1)  # (F, C, B)
            if padc:
                fill = jnp.zeros((v.shape[0], padc, B), v.dtype)
                if pad_dist:
                    # Padded candidates: huge dist, never selected.
                    fill = fill.at[0].set(1e10)
                v = jnp.concatenate([v, fill], axis=1)
            return padlanes(v)

        b_t = cand_t(cand_b, True)
        u_t = cand_t(cand_u, False)
        g_t = cand_t(cand_g, False)
        qvel_t = padlanes(jnp.moveaxis(qvel, 0, -1))  # (nv, B)
        # cdof (B, nv, 6) -> (6, nv, B)
        cd = padlanes(jnp.swapaxes(jnp.moveaxis(cdof, 0, -1), 0, 1))
        com_t = padlanes(jnp.moveaxis(com_root, 0, -1))  # (3, B)
        j_t, s_t = _efc_pallas(K, nv, maskt.shape[-1], b_t, u_t, g_t,
                               qvel_t, cd, com_t, maskt, limb,
                               interpret=interpret)
        con_J = jnp.moveaxis(j_t[:, :, :B], -1, 0).reshape(B, K, 3, nv)
        scal = jnp.moveaxis(s_t[:, :, :B], -1, 0)  # (B, _NS, K)
        return (con_J, scal), (True, True)

    return f
