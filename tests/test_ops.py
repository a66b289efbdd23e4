"""Pallas kernels (ops/) validated in interpret mode against references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flybody_tpu.model import spec as _s
from flybody_tpu.ops import cholesky as pchol
from flybody_tpu.ops import mpr_kernel as mprk
from flybody_tpu.ops import noslip_gs as ngs
from flybody_tpu.physics import mpr as jmpr


@pytest.fixture(scope='module')
def spd():
    rng = np.random.RandomState(0)
    B, n = 256, 54
    A = jnp.asarray(rng.randn(B, n, n), jnp.float32)
    M = (jnp.einsum('bij,bkj->bik', A, A)
         + 10.0 * jnp.eye(n, dtype=jnp.float32))
    b = jnp.asarray(rng.randn(B, n), jnp.float32)
    return M, b


def test_chol_kernel_matches_xla(spd):
    M, _ = spd
    L_ref = jnp.linalg.cholesky(M)
    L = pchol.chol(M, interpret=True)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref),
                               atol=2e-5, rtol=2e-3)
    # Upper triangle must be exactly zero (consumers assume a clean L).
    n = M.shape[-1]
    upper = np.triu(np.ones((n, n)), k=1).astype(bool)
    assert np.abs(np.asarray(L)[:, upper]).max() == 0.0


def test_cho_solve_kernel_matches_xla(spd):
    M, b = spd
    import jax.scipy.linalg as jsl
    L = jnp.linalg.cholesky(M)
    x_ref = jsl.cho_solve((L, True), b[..., None])[..., 0]
    x = pchol.cho_solve(L, b, interpret=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=2e-5)
    # Residual check against the original system.
    res = jnp.einsum('bij,bj->bi', M, x) - b
    assert float(jnp.abs(res).max()) < 1e-4


def test_cho_solve_multi_kernel_matches_xla(spd):
    M, b = spd
    import jax.scipy.linalg as jsl
    rng = np.random.RandomState(3)
    m = 32
    R = jnp.asarray(rng.randn(M.shape[0], M.shape[-1], m), jnp.float32)
    L = jnp.linalg.cholesky(M)
    X_ref = jsl.cho_solve((L, True), R)
    X = pchol.cho_solve_multi(L, R, interpret=True)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X_ref),
                               atol=5e-5, rtol=2e-3)
    res = jnp.einsum('bij,bjm->bim', M, X) - R
    assert float(jnp.abs(res).max()) < 2e-4


def test_linesearch_kernel_matches_reference():
    from flybody_tpu.ops import linesearch as pls
    rng = np.random.RandomState(7)
    B, L, K = 64, 24, 16
    lim = jnp.asarray(np.stack([
        rng.randn(B, L),                      # jar0
        rng.randn(B, L),                      # jv
        (rng.rand(B, L) < 0.5).astype(float),  # active
        rng.rand(B, L) * 100.0,               # D
    ], axis=1), jnp.float32)
    jar0 = rng.randn(B, 3, K)
    jv = rng.randn(B, 3, K)
    con = jnp.asarray(np.concatenate([
        jar0, jv,
        (0.2 + rng.rand(B, 1, K)),            # mu
        (rng.rand(B, 1, K) < 0.8).astype(float),  # frictional
        (rng.rand(B, 1, K) < 0.7).astype(float),  # active
        rng.rand(B, 1, K) * 100.0,            # D
    ], axis=1), jnp.float32)
    sc = jnp.asarray(np.stack([
        -np.abs(rng.randn(B, 1)) * 10.0,      # sm0 < 0 (descent)
        np.abs(rng.randn(B, 1)) * 5.0 + 1.0,  # smm > 0
    ], axis=1), jnp.float32)

    ref = jax.vmap(lambda l, c, s: pls.alpha_ref(l, c, s, 6, 6))(
        lim, con, sc)
    a_t = pls._ls_pallas(
        pls._tolanes(lim, (-B) % pls.LANES),
        pls._tolanes(con, (-B) % pls.LANES),
        pls._tolanes(sc, (-B) % pls.LANES), 6, 6, interpret=True)
    got = np.asarray(a_t[0, 0, :B])
    # f32 reduction-order differences can flip a bracketing branch near a
    # zero slope; allow sub-percent deviations on those envs.
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-2, atol=1e-3)
    # Sanity: at least some envs take a nonzero step.
    assert (np.asarray(ref) > 0).any()


def test_narrowphase_kernel_matches_reference():
    from flybody_tpu.ops import narrowphase as pnp
    from flybody_tpu.model import spec as _sp
    rng = np.random.RandomState(11)
    # One segment per supported key, a few pairs each.
    keys = [(_sp.GEOM_PLANE, _sp.GEOM_SPHERE),
            (_sp.GEOM_PLANE, _sp.GEOM_CAPSULE),
            (_sp.GEOM_PLANE, _sp.GEOM_ELLIPSOID),
            (_sp.GEOM_PLANE, _sp.GEOM_CYLINDER),
            (_sp.GEOM_SPHERE, _sp.GEOM_SPHERE),
            (_sp.GEOM_SPHERE, _sp.GEOM_CAPSULE),
            (_sp.GEOM_CAPSULE, _sp.GEOM_CAPSULE)]
    kk = {(_sp.GEOM_PLANE, _sp.GEOM_CAPSULE): 2,
          (_sp.GEOM_PLANE, _sp.GEOM_CYLINDER): 3}
    NP_, segs, plo, slo = 5, [], 0, 0
    for key in keys:
        k = kk.get(key, 1)
        segs.append((key, plo, plo + NP_, slo, k))
        plo += NP_
        slo += NP_ * k
    segs = tuple(segs)
    B, P = 64, plo

    def rand_rot(n):
        q = rng.randn(n, 4)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        w, x, y, z = q.T
        return np.stack([
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
            2 * (x * z + w * y), 2 * (x * y + w * z),
            1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x),
            1 - 2 * (x * x + y * y)], axis=-1)

    def geom(n):
        return np.concatenate(
            [0.3 * rng.randn(n, 3), rand_rot(n)], -1)

    c1 = jnp.asarray(np.stack([geom(P) for _ in range(B)]), jnp.float32)
    c2 = jnp.asarray(np.stack([geom(P) for _ in range(B)]), jnp.float32)
    sz = jnp.asarray(0.05 + 0.2 * rng.rand(P, 6), jnp.float32)

    f = pnp.make_narrowphase_pe(segs, slo)
    d_ref, p_ref, n_ref = jax.vmap(f, in_axes=(0, 0, None))(c1, c2, sz)

    pad = (-B) % pnp.LANES

    def tol(v, batched=True):
        if not batched:
            v = jnp.broadcast_to(v[None], (B,) + v.shape)
        v = jnp.swapaxes(jnp.moveaxis(v, 0, -1), 0, 1)
        if pad:
            v = jnp.concatenate(
                [v, jnp.zeros(v.shape[:-1] + (pad,), v.dtype)], -1)
        return v

    d_t, p_t, n_t = pnp._np_pallas(segs, slo, tol(c1), tol(c2),
                                   tol(sz, False), interpret=True)
    pm = pnp.rowmajor_to_canonical_perm(segs, slo)
    got_d = np.moveaxis(np.asarray(d_t)[0, :, :B], -1, 0)[:, pm]
    np.testing.assert_allclose(got_d, np.asarray(d_ref), rtol=1e-5,
                               atol=1e-5)
    got_p = np.moveaxis(np.swapaxes(np.asarray(p_t)[:, :, :B], 0, 1),
                        -1, 0)[:, pm]
    np.testing.assert_allclose(got_p, np.asarray(p_ref), rtol=1e-4,
                               atol=1e-5)


def test_chol_pe_vmap_dispatch(spd):
    M, b = spd
    # Under vmap the custom rule runs; off-TPU it falls back to XLA.
    L = jax.vmap(pchol.chol_pe)(M)
    np.testing.assert_allclose(np.asarray(L),
                               np.asarray(jnp.linalg.cholesky(M)),
                               atol=2e-5, rtol=2e-3)
    x = jax.vmap(pchol.cho_solve_pe)(L, b)
    res = jnp.einsum('bij,bj->bi', M, x) - b
    assert float(jnp.abs(res).max()) < 1e-4


def test_noslip_gs_kernel_matches_scan():
    rng = np.random.RandomState(0)
    B, K, nv = 8, 16, 32
    Jt = jnp.asarray(rng.randn(B, K, 2, nv), jnp.float32)
    Pt = jnp.asarray(rng.randn(B, K, nv, 2) * 0.05, jnp.float32)
    A = (jnp.einsum('bkrv,bkvs->bkrs', Jt, Pt)
         + 0.5 * jnp.eye(2, dtype=jnp.float32))
    Ainv = jnp.linalg.inv(A).astype(jnp.float32)
    aref = jnp.asarray(rng.randn(B, K, 2), jnp.float32)
    lim = jnp.asarray(np.abs(rng.randn(B, K)), jnp.float32)
    use = jnp.asarray((rng.rand(B, K) > 0.3).astype(np.float32))
    x0 = jnp.asarray(rng.randn(B, nv), jnp.float32)
    ft0 = jnp.asarray(0.1 * rng.randn(B, K, 2), jnp.float32)

    ref = jax.vmap(lambda *a: ngs._reference(*a, 3))(
        Jt, Pt, Ainv, aref, lim, use, x0, ft0)

    def tol(v, shape):
        v = jnp.moveaxis(v.reshape((B,) + shape), 0, -1)
        pad = (-B) % ngs.LANES
        return jnp.concatenate([v, jnp.zeros(shape + (pad,), v.dtype)], -1)

    x_t, ft_t = ngs._noslip_pallas(
        tol(Jt, (2 * K, nv)), tol(jnp.swapaxes(Pt, 2, 3), (2 * K, nv)),
        tol(jnp.swapaxes(Ainv.reshape(B, K, 4), 1, 2), (4, K)),
        tol(jnp.swapaxes(aref, 1, 2), (2, K)), tol(lim, (1, K)),
        tol(use, (1, K)), tol(x0, (nv, 1)),
        tol(jnp.swapaxes(ft0, 1, 2), (2, K)), iterations=3, interpret=True)
    x = jnp.moveaxis(x_t[:, 0, :B], -1, 0)
    ft = jnp.swapaxes(jnp.moveaxis(ft_t[..., :B], -1, 0), 1, 2)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ft), np.asarray(ref[1]),
                               atol=1e-4)


def _rand_rots(rng, n):
    q = rng.randn(n, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q.T
    return np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x),
        1 - 2 * (x * x + y * y)], axis=1).reshape(n, 3, 3)


@pytest.mark.parametrize('types,polish', [
    ((_s.GEOM_CAPSULE, _s.GEOM_ELLIPSOID), 8),
    ((_s.GEOM_ELLIPSOID, _s.GEOM_ELLIPSOID), 8),
])
def test_mpr_kernel_matches_reference(types, polish):
    t1, t2 = types
    rng = np.random.RandomState(0)
    B, P = 4, 8
    pos1 = jnp.asarray(0.2 * rng.randn(B, P, 3), jnp.float32)
    pos2 = jnp.asarray(pos1 + 0.08 * rng.randn(B, P, 3), jnp.float32)
    mat1 = jnp.asarray(_rand_rots(rng, B * P).reshape(B, P, 3, 3),
                       jnp.float32)
    mat2 = jnp.asarray(_rand_rots(rng, B * P).reshape(B, P, 3, 3),
                       jnp.float32)
    size1 = jnp.asarray(0.04 + 0.05 * rng.rand(B, P, 3), jnp.float32)
    size2 = jnp.asarray(0.04 + 0.05 * rng.rand(B, P, 3), jnp.float32)
    mg = jnp.full((B, P), 5e-4, jnp.float32)

    ref = jax.vmap(lambda *a: jmpr.mpr_penetration(
        t1, t2, a[0], a[1], a[2], a[4], a[5], a[6], margin1=a[3],
        margin2=a[7], polish_iters=polish))(
        pos1, mat1, size1, mg, pos2, mat2, size2, mg)

    def tol(v, c):
        v = jnp.moveaxis(v.reshape(B, P, c), 0, -1)
        v = jnp.moveaxis(v, 1, 0)
        pad = (-B) % mprk.LANES
        return jnp.concatenate([v, jnp.zeros((c, P, pad), v.dtype)], -1)

    d_t, n_t, q_t = mprk._mpr_pallas(
        t1, t2, polish, tol(pos1, 3), tol(mat1, 9), tol(size1, 3),
        tol(mg[..., None], 1), tol(pos2, 3), tol(mat2, 9), tol(size2, 3),
        tol(mg[..., None], 1), interpret=True)

    def froml(v, c):
        v = jnp.moveaxis(v[..., :B], 0, 1)
        return jnp.moveaxis(v, -1, 0).reshape(B, P, c)

    d = froml(d_t, 1)[..., 0]
    n = froml(n_t, 3)
    # Compare contact-relevant pairs (separated pairs have arbitrary
    # normals and clamped dist).
    near = np.asarray(ref[0] < 0.001)
    assert near.sum() > 5
    np.testing.assert_allclose(np.asarray(d)[near],
                               np.asarray(ref[0])[near], atol=1e-4)
    ndot = np.asarray(jnp.sum(n * ref[1], -1))[near]
    assert ndot.min() > 0.999


def test_mpr_merged_kernel_mixed_types():
    """Merged mixed-type MPR (per-pair type dispatch + smooth-polish
    mask) matches the per-type jnp reference on every pair."""
    rng = np.random.RandomState(1)
    B, P = 4, 12
    type_pairs = [(_s.GEOM_SPHERE, _s.GEOM_ELLIPSOID),
                  (_s.GEOM_CAPSULE, _s.GEOM_ELLIPSOID),
                  (_s.GEOM_CAPSULE, _s.GEOM_CYLINDER),
                  (_s.GEOM_ELLIPSOID, _s.GEOM_CYLINDER)]
    t1 = np.array([type_pairs[j % 4][0] for j in range(P)], np.float32)
    t2 = np.array([type_pairs[j % 4][1] for j in range(P)], np.float32)
    smooth = ((t1 != _s.GEOM_CYLINDER)
              & (t2 != _s.GEOM_CYLINDER)).astype(np.float32)
    pos1 = jnp.asarray(0.2 * rng.randn(B, P, 3), jnp.float32)
    pos2 = jnp.asarray(pos1 + 0.08 * rng.randn(B, P, 3), jnp.float32)
    mat1 = jnp.asarray(_rand_rots(rng, B * P).reshape(B, P, 3, 3),
                       jnp.float32)
    mat2 = jnp.asarray(_rand_rots(rng, B * P).reshape(B, P, 3, 3),
                       jnp.float32)
    size1 = jnp.asarray(0.04 + 0.05 * rng.rand(B, P, 3), jnp.float32)
    size2 = jnp.asarray(0.04 + 0.05 * rng.rand(B, P, 3), jnp.float32)
    mg = jnp.full((B, P), 5e-4, jnp.float32)

    # Per-type jnp reference, sliced per pair column.
    refs_d = np.zeros((B, P), np.float32)
    refs_n = np.zeros((B, P, 3), np.float32)
    for j in range(P):
        tt1, tt2 = int(t1[j]), int(t2[j])
        polish = 8 if smooth[j] else 0
        d, n, _ = jax.vmap(lambda *a: jmpr.mpr_penetration(
            tt1, tt2, a[0], a[1], a[2], a[4], a[5], a[6], margin1=a[3],
            margin2=a[7], polish_iters=polish))(
            pos1[:, j:j + 1], mat1[:, j:j + 1], size1[:, j:j + 1],
            mg[:, j:j + 1], pos2[:, j:j + 1], mat2[:, j:j + 1],
            size2[:, j:j + 1], mg[:, j:j + 1])
        refs_d[:, j] = np.asarray(d)[:, 0]
        refs_n[:, j] = np.asarray(n)[:, 0]

    f = mprk.make_mpr_merged_pe(8, interpret=True)
    d, n, q = jax.vmap(
        f, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None, None, None))(
        pos1, mat1, size1, mg, pos2, mat2, size2, mg,
        jnp.asarray(t1), jnp.asarray(t2), jnp.asarray(smooth))

    near = refs_d < 0.001
    assert near.sum() > 5
    np.testing.assert_allclose(np.asarray(d)[near], refs_d[near],
                               atol=1e-4)
    ndot = np.asarray(jnp.sum(n * refs_n, -1))[near]
    assert ndot.min() > 0.999


def test_fused_newton_reuse_step_interpret():
    """The fused reuse-step kernel (ops/newton_fused.py) matches the jnp
    reference composition on every output of the carried Newton state."""
    from flybody_tpu.model import compile as fmc
    from flybody_tpu.ops import arrow, newton_fused

    fly, _ = fmc.build_fly_model()
    part = arrow.build_partition(fly.meta)
    rng = np.random.RandomState(3)
    B, K, SB3, nlim = 160, 8, 6, 12
    nv = part.nv
    lim_dof = tuple(int(v) for v in rng.choice(nv, nlim, replace=False))
    lim_sign = tuple(float(s) for s in rng.choice([-1.0, 1.0], nlim))

    def rand_arrow_spd():
        X = rng.randn(nv, nv).astype(np.float32) * 0.2
        S = X @ X.T + np.eye(nv, dtype=np.float32) * 3.0
        mask = np.zeros((nv, nv), np.float32)
        mask[:part.nr, :] = 1
        mask[:, :part.nr] = 1
        for lo, d in zip(part.los, part.ds):
            mask[lo:lo + d, lo:lo + d] = 1
        A = S * mask + np.eye(nv, dtype=np.float32) * 3.0
        return (A + A.T) / 2

    As = np.stack([rand_arrow_spd() for _ in range(B)])
    F = jax.vmap(lambda a: arrow.factor_ref(part, a))(jnp.asarray(As))
    M = jnp.asarray(As)  # reuse as a stand-in mass matrix (SPD)
    conJ = jnp.asarray(rng.randn(B, K, 3, nv).astype(np.float32) * 0.3)
    U = jnp.asarray(rng.randn(B, nv, SB3).astype(np.float32) * 0.3)
    Z = jax.vmap(lambda f, u: arrow.solve_ref(part, f, u))(F, U)
    C = (jnp.eye(SB3)[None]
         + jnp.einsum('bik,bil->bkl', U, Z)).astype(jnp.float32)
    LC = jnp.linalg.cholesky(C)
    x = jnp.asarray(rng.randn(B, nv).astype(np.float32) * 0.1)
    msm = jnp.asarray(rng.randn(B, nv).astype(np.float32) * 0.1)
    jar_l = jnp.asarray(rng.randn(B, nlim).astype(np.float32) * 0.01)
    jar_c = jnp.asarray(rng.randn(B, K, 3).astype(np.float32) * 0.01)
    lim_params = jnp.asarray(np.stack([
        (rng.rand(B, nlim) < 0.5).astype(np.float32),
        rng.rand(B, nlim).astype(np.float32) * 100.0], axis=1))
    con_params = jnp.asarray(np.stack([
        0.5 + rng.rand(B, K).astype(np.float32),
        (rng.rand(B, K) < 0.8).astype(np.float32),
        (rng.rand(B, K) < 0.6).astype(np.float32),
        rng.rand(B, K).astype(np.float32) * 100.0], axis=1))

    args = (F, M, conJ, Z, U, LC, x, msm, jar_l, jar_c, lim_params,
            con_params)
    # ls_iters=30: with few bisection iterations, f32 branch flips in
    # the search leave alpha mid-bracket and the comparison measures
    # bisection noise, not kernel correctness; at 30 both paths converge
    # to the same minimizer.
    ref = jax.vmap(lambda *a: newton_fused._ref_step(
        part, lim_dof, lim_sign, 30, *a))(*args)
    fused = newton_fused.make_reuse_pe(part, lim_dof, lim_sign, 30,
                                       interpret=True)
    out = jax.vmap(fused)(*args)
    names = ['x', 'msm', 'jar_l', 'jar_c']
    for nm, o, r in zip(names, out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=0, atol=5e-4, err_msg=nm)

    # Multi-iteration variant: n_iters=3 in one launch == 3 chained
    # reference steps.
    ref3 = jax.vmap(lambda *a: newton_fused._ref_step_n(
        part, lim_dof, lim_sign, 30, 3, *a))(*args)
    fused3 = newton_fused.make_reuse_pe(part, lim_dof, lim_sign, 30,
                                        n_iters=3, interpret=True)
    out3 = jax.vmap(fused3)(*args)
    for nm, o, r in zip(names, out3, ref3):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=0, atol=2e-3, err_msg=nm)


def test_pos_stage_kernel_matches_reference():
    """Fused position-stage kernel (interpret) == XLA pipeline on the
    walking model: all 15 outputs (poses, frames, com, cinert, cdof,
    joint anchors/axes, tendons) to f32 precision."""
    import jax.numpy as jnp
    from flybody_tpu.envs import fly_envs
    from flybody_tpu.ops import pos_stage

    model = fly_envs._walking_model(False, True, 0.01)
    model = jax.tree.map(
        lambda x: (jnp.asarray(x, jnp.float32)
                   if hasattr(x, 'dtype') and
                   jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                   else x), model)
    B = 8
    rng = np.random.RandomState(0)
    qpos = np.tile(np.asarray(model.qpos0, np.float32)[None], (B, 1))
    qpos[:, :3] += 0.1 * rng.randn(B, 3).astype(np.float32)
    qpos[:, 3:7] += 0.2 * rng.randn(B, 4).astype(np.float32)
    qpos[:, 3:7] /= np.linalg.norm(qpos[:, 3:7], axis=1, keepdims=True)
    qpos[:, 7:] += 0.2 * rng.randn(B, qpos.shape[1] - 7).astype(
        np.float32)
    qpos = jnp.asarray(qpos)

    ref = jax.vmap(pos_stage.make_pos_stage_pe(model))(qpos)
    f_int = pos_stage.make_pos_stage_pe(model, interpret=True)
    assert f_int is not None
    out = jax.vmap(f_int)(qpos)
    names = ['xpos', 'xquat', 'xmat', 'xipos', 'ximat', 'geom_xpos',
             'geom_xmat', 'site_xpos', 'site_xmat', 'subtree_com',
             'cinert', 'cdof', 'jnt_xanchor', 'jnt_xaxis', 'ten_length']
    for nm, o, r in zip(names, out, ref):
        o, r = np.asarray(o), np.asarray(r)
        scale = max(1e-6, float(np.max(np.abs(r))))
        assert np.max(np.abs(o - r)) / scale < 3e-6, nm

    # Ball-joint model is unsupported -> falls back to the XLA path.
    ball = fly_envs._ball_model(False, True)
    assert pos_stage.make_pos_stage_pe(ball) is None


def test_force_stage_kernel_matches_reference():
    """Fused velocity+force-stage kernel (interpret) == XLA stages on
    walking AND flight models (the latter exercises the ellipsoid wing
    fluid and the stateless-actuator na=0 path)."""
    import jax.numpy as jnp
    from flybody_tpu.envs import fly_envs
    from flybody_tpu.ops import force_stage, pos_stage

    for model in [fly_envs._walking_model(False, True, 0.01),
                  fly_envs._flight_model(True)]:
        model = jax.tree.map(
            lambda x: (jnp.asarray(x, jnp.float32)
                       if hasattr(x, 'dtype') and
                       jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                       else x), model)
        B = 8
        rng = np.random.RandomState(0)
        meta = model.meta
        qpos = np.tile(np.asarray(model.qpos0, np.float32)[None], (B, 1))
        qpos += 0.1 * rng.randn(B, meta.nq).astype(np.float32)
        qvel = 2.0 * rng.randn(B, meta.nv).astype(np.float32)
        act = 0.2 * rng.randn(B, meta.na).astype(np.float32)
        ctrl = 0.3 * rng.randn(B, meta.nu).astype(np.float32)
        qpos, qvel, act, ctrl = map(jnp.asarray,
                                    (qpos, qvel, act, ctrl))
        ps = jax.vmap(pos_stage.make_pos_stage_pe(model))(qpos)
        (xpos, xquat, xmat, xipos, ximat, gpos, gmat, spos, smat, scom,
         cinert, cdof, janc, jaxw, tenl) = ps
        args = (qpos, qvel, act, ctrl, cdof, cinert, xipos, ximat,
                scom, gpos, gmat, tenl)
        f_int = force_stage.make_force_stage_pe(model, interpret=True)
        assert f_int is not None
        ref = jax.vmap(force_stage.make_force_stage_pe(model))(*args)
        out = jax.vmap(f_int)(*args)
        names = ['cvel', 'cdof_dot', 'ten_velocity', 'qfrc_bias',
                 'qfrc_passive', 'qfrc_fluid', 'qfrc_actuator',
                 'actuator_force', 'act_dot', 'qM']
        for nm, o, r in zip(names, out, ref):
            o, r = np.asarray(o), np.asarray(r)
            if o.size == 0:
                assert r.size == 0
                continue
            scale = max(1e-6, float(np.max(np.abs(r))))
            assert np.max(np.abs(o - r)) / scale < 3e-6, nm


def test_sens_stage_kernel_matches_reference():
    """Fused sensor kernel (interpret) == physics/sensors.py on a
    contact-rich pose (touch/force sensors see real contact wrenches)."""
    import jax.numpy as jnp
    from flybody_tpu.envs import fly_envs
    from flybody_tpu.ops import sens_stage
    from flybody_tpu.physics import collision, smooth, solver
    from flybody_tpu.physics.state import make_data

    model = fly_envs._walking_model(False, True, 0.01)
    model = jax.tree.map(
        lambda x: (jnp.asarray(x, jnp.float32)
                   if hasattr(x, 'dtype') and
                   jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                   else x), model)
    B = 8
    rng = np.random.RandomState(0)
    meta = model.meta
    qpos = np.tile(np.asarray(model.qpos0, np.float32)[None], (B, 1))
    qpos[:, 2] = 0.1
    qpos[:, 7:] += 0.1 * rng.randn(B, meta.nq - 7).astype(np.float32)
    qvel = 0.3 * rng.randn(B, meta.nv).astype(np.float32)

    def prep(qp, qv):
        d = make_data(model).replace(qpos=qp, qvel=qv)
        d = smooth.fwd_smooth(model, d)
        con = collision.collide(model, d)
        efc = solver.make_efc(model, d, con, ncon_max=32)
        d, a_free = smooth.factor_solve_m(model, d, d.qfrc_smooth)
        qacc, _, _, f_c = solver.solve(model, d, efc, a_free,
                                       iterations=15, ls_iterations=10)
        return d.replace(qacc=qacc), efc, f_c

    ds, efcs, fcs = jax.vmap(prep)(jnp.asarray(qpos), jnp.asarray(qvel))
    cb12 = jnp.stack([efcs.con_body1.astype(jnp.float32),
                      efcs.con_body2.astype(jnp.float32)], axis=1)
    args = (ds.qacc, ds.qvel, ds.cvel, ds.cdof, ds.cdof_dot, ds.cinert,
            ds.site_xpos, ds.site_xmat, ds.subtree_com, efcs.con_xpos,
            efcs.con_normal, cb12, efcs.con_active, fcs)
    assert float(np.asarray(efcs.con_active).sum()) > 50  # contact-rich
    f_int = sens_stage.make_sens_stage_pe(model, interpret=True)
    assert f_int is not None
    ref = jax.vmap(sens_stage.make_sens_stage_pe(model))(*args)
    out = jax.vmap(f_int)(*args)
    o, r = np.asarray(out), np.asarray(ref)
    scale = np.maximum(1e-6, np.abs(r).max(0))
    assert float((np.abs(o - r) / scale).max()) < 3e-6


def test_efc_stage_kernel_matches_reference(monkeypatch):
    """Fused contact-row kernel (ops/efc_stage.py, interpret) ==
    solver._contact_rows_ref through make_efc on contact-rich walking
    states, both dense and compact collide paths."""
    import jax.numpy as jnp
    from flybody_tpu.envs import fly_envs
    from flybody_tpu.ops import efc_stage
    from flybody_tpu.physics import collision, smooth, solver
    from flybody_tpu.physics.state import make_data

    model = fly_envs._walking_model(False, True, 0.01)
    model = jax.tree.map(
        lambda x: (jnp.asarray(x, jnp.float32)
                   if hasattr(x, 'dtype') and
                   jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                   else x), model)
    B = 8
    rng = np.random.RandomState(0)
    meta = model.meta
    qpos = np.tile(np.asarray(model.qpos0, np.float32)[None], (B, 1))
    qpos[:, 2] = 0.1
    qpos[:, 7:] += 0.1 * rng.randn(B, meta.nq - 7).astype(np.float32)
    qvel = 0.3 * rng.randn(B, meta.nv).astype(np.float32)

    def rows(qp, qv, compact):
        d = make_data(model).replace(qpos=qp, qvel=qv)
        d = smooth.fwd_smooth(model, d)
        con = collision.collide(model, d, compact=compact)
        return solver.make_efc(model, d, con, ncon_max=24)

    fields = ['con_J', 'con_active', 'con_frictional', 'con_mu',
              'con_aref', 'con_D', 'con_pos', 'con_sel', 'con_xpos',
              'con_normal', 'con_body1', 'con_body2', 'con_self',
              'con_break']
    orig = efc_stage.make_efc_contacts_pe
    for compact in [True, False]:
        ref = jax.vmap(lambda qp, qv: rows(qp, qv, compact))(
            jnp.asarray(qpos), jnp.asarray(qvel))
        monkeypatch.setattr(
            efc_stage, 'make_efc_contacts_pe',
            lambda K, nv, nbody: orig(K, nv, nbody, interpret=True))
        out = jax.vmap(lambda qp, qv: rows(qp, qv, compact))(
            jnp.asarray(qpos), jnp.asarray(qvel))
        monkeypatch.setattr(efc_stage, 'make_efc_contacts_pe', orig)
        assert int(np.asarray(ref.con_active).sum()) > 8  # contact-rich
        for nm in fields:
            o = np.asarray(getattr(out, nm))
            r = np.asarray(getattr(ref, nm))
            if nm in ('con_sel', 'con_body1', 'con_body2'):
                assert (o == r).all(), nm
                continue
            scale = max(1e-6, float(np.abs(r).max()))
            assert float(np.abs(o - r).max()) / scale < 3e-6, nm


def test_fused_noslip_matches_reference():
    """Fused noslip (packed-factor solve + Ainv + GS in one launch,
    interpret) == the chained reference path."""
    import jax.numpy as jnp
    from flybody_tpu.envs import fly_envs
    from flybody_tpu.ops import arrow, noslip_gs
    from flybody_tpu.physics import collision, smooth, solver
    from flybody_tpu.physics.state import make_data

    model = fly_envs._walking_model(False, True, 0.01)
    model = jax.tree.map(
        lambda x: (jnp.asarray(x, jnp.float32)
                   if hasattr(x, 'dtype') and
                   jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                   else x), model)
    B = 8
    rng = np.random.RandomState(0)
    meta = model.meta
    part = arrow.build_partition(meta)
    qpos = np.tile(np.asarray(model.qpos0, np.float32)[None], (B, 1))
    qpos[:, 2] = 0.1
    qpos[:, 7:] += 0.1 * rng.randn(B, meta.nq - 7).astype(np.float32)
    qvel = 0.3 * rng.randn(B, meta.nv).astype(np.float32)

    def prep(qp, qv):
        d = make_data(model).replace(qpos=qp, qvel=qv)
        d = smooth.fwd_smooth(model, d)
        con = collision.collide(model, d)
        efc = solver.make_efc(model, d, con, ncon_max=32)
        d, a_free = smooth.factor_solve_m(model, d, d.qfrc_smooth)
        qacc, _, _, f_c = solver.solve(model, d, efc, a_free,
                                       iterations=15, ls_iterations=10)
        return d, efc, qacc, f_c

    ds, efcs, qaccs, fcs = jax.vmap(prep)(jnp.asarray(qpos),
                                          jnp.asarray(qvel))
    K = 16
    args = (ds.qLD, efcs.con_J[:, :K, 1:, :], efcs.con_aref[:, :K, 1:],
            jnp.maximum(efcs.con_mu[:, :K] * fcs[:, :K, 0], 0.0),
            efcs.con_active[:, :K] * efcs.con_frictional[:, :K],
            qaccs, fcs[:, :K, 1:])
    ref = jax.vmap(noslip_gs.make_noslip_fused_pe(part, 3))(*args)
    out = jax.vmap(noslip_gs.make_noslip_fused_pe(
        part, 3, interpret=True))(*args)
    for nm, o, r in zip(['x', 'ft'], out, ref):
        o, r = np.asarray(o), np.asarray(r)
        scale = max(1e-6, float(np.abs(r).max()))
        assert float(np.abs(o - r).max()) / scale < 3e-6, nm


def test_full_newton_block_interpret():
    """The FULL Newton block kernel (in-kernel Hessian/Woodbury assembly,
    ops/newton_fused.make_newton_block_full_pe) matches the jnp
    reference composition in interpret mode."""
    import numpy as np
    from flybody_tpu.model import compile as fmc
    from flybody_tpu.ops import arrow, newton_fused

    fly, _ = fmc.build_fly_model()
    part = arrow.build_partition(fly.meta)
    rng = np.random.RandomState(7)
    B, K, SB, nlim = 4, 8, 4, 12
    nv = part.nv
    lim_dof = tuple(int(v) for v in rng.choice(nv, nlim, replace=False))
    lim_sign = tuple(float(s) for s in rng.choice([-1.0, 1.0], nlim))

    def rand_arrow_spd():
        X = rng.randn(nv, nv).astype(np.float32) * 0.2
        S = X @ X.T + np.eye(nv, dtype=np.float32) * 3.0
        mask = np.zeros((nv, nv), np.float32)
        mask[:part.nr, :] = 1
        mask[:, :part.nr] = 1
        for lo, d in zip(part.los, part.ds):
            mask[lo:lo + d, lo:lo + d] = 1
        A = S * mask + np.eye(nv, dtype=np.float32) * 3.0
        return (A + A.T) / 2

    As = np.stack([rand_arrow_spd() for _ in range(B)])
    Mps = jax.vmap(lambda a: arrow.pack_sym_ref(part, a))(jnp.asarray(As))
    # Hessian-active rows must be arrow-compatible (root + one limb);
    # cross-limb rows are dense and flagged break (hess_active=0) — the
    # solver invariant (see tests/test_tpu_kernels.py note; violating it
    # makes the truncated packed Hessian indefinite and NaNs BOTH the
    # kernel and the reference, which equal-nan allclose used to hide).
    from tests.helpers import arrow_compatible_rows
    conJ_np, brk_np = arrow_compatible_rows(part, rng, B, K, nv)
    conJ = jnp.asarray(conJ_np)
    # One-hot break-row selection (disjoint rows per env).
    ohb_np = np.zeros((B, SB, K), np.float32)
    for b in range(B):
        rows = rng.choice(K, SB, replace=False)
        ohb_np[b, np.arange(SB), rows] = 1.0
    ohb = jnp.asarray(ohb_np)
    x = jnp.asarray(rng.randn(B, nv).astype(np.float32) * 0.1)
    msm = jnp.asarray(rng.randn(B, nv).astype(np.float32) * 0.1)
    jar_l = jnp.asarray(rng.randn(B, nlim).astype(np.float32) * 0.01)
    jar_c = jnp.asarray(rng.randn(B, K, 3).astype(np.float32) * 0.01)
    lim_params = jnp.asarray(np.stack([
        (rng.rand(B, nlim) < 0.5).astype(np.float32),
        rng.rand(B, nlim).astype(np.float32) * 100.0], axis=1))
    actc = (rng.rand(B, K) < 0.8).astype(np.float32)
    con_params = jnp.asarray(np.stack([
        0.5 + rng.rand(B, K).astype(np.float32),
        (rng.rand(B, K) < 0.8).astype(np.float32),
        actc,
        rng.rand(B, K).astype(np.float32) * 100.0,
        actc * (1.0 - brk_np)], axis=1))

    args = (Mps, conJ, ohb, x, msm, jar_l, jar_c, lim_params, con_params)
    ref = jax.vmap(lambda *a: newton_fused._ref_block_full(
        part, lim_dof, lim_sign, 30, 2, *a))(*args)
    full = newton_fused.make_newton_block_full_pe(
        part, lim_dof, lim_sign, 30, 2, interpret=True)
    out = jax.vmap(full)(*args)
    for nm, o, r in zip(['x', 'msm', 'jar_l', 'jar_c'], out, ref):
        got, want = np.asarray(o), np.asarray(r)
        assert np.isfinite(want).all(), f'{nm}: reference not finite'
        assert np.isfinite(got).all(), f'{nm}: kernel not finite'
        np.testing.assert_allclose(got, want, rtol=0, atol=3e-3,
                                   err_msg=nm)


def test_whole_solve_newton_interpret():
    """The WHOLE-SOLVE Newton op (warmstart pick + init + block +
    final forces/qfrc in one kernel, ops/newton_fused.make_newton_solve_pe)
    matches the jnp reference composition in interpret mode."""
    import numpy as np
    from helpers import arrow_compatible_rows
    from flybody_tpu.model import compile as fmc
    from flybody_tpu.ops import arrow, newton_fused

    fly, _ = fmc.build_fly_model()
    part = arrow.build_partition(fly.meta)
    rng = np.random.RandomState(3)
    B, K, SB, nlim = 4, 8, 4, 12
    nv = part.nv
    lim_dof = tuple(int(v) for v in rng.choice(nv, nlim, replace=False))
    lim_sign = tuple(float(s) for s in rng.choice([-1.0, 1.0], nlim))

    def rand_arrow_spd():
        X = rng.randn(nv, nv).astype(np.float32) * 0.2
        S = X @ X.T + np.eye(nv, dtype=np.float32) * 3.0
        mask = np.zeros((nv, nv), np.float32)
        mask[:part.nr, :] = 1
        mask[:, :part.nr] = 1
        for lo, d in zip(part.los, part.ds):
            mask[lo:lo + d, lo:lo + d] = 1
        A = S * mask + np.eye(nv, dtype=np.float32) * 3.0
        return (A + A.T) / 2

    As = np.stack([rand_arrow_spd() for _ in range(B)])
    Mps = jax.vmap(lambda a: arrow.pack_sym_ref(part, a))(jnp.asarray(As))
    conJ_np, brk_np = arrow_compatible_rows(part, rng, B, K, nv)
    conJ = jnp.asarray(conJ_np)
    ohb_np = np.zeros((B, SB, K), np.float32)
    for b in range(B):
        rows = rng.choice(K, SB, replace=False)
        ohb_np[b, np.arange(SB), rows] = 1.0
    ohb = jnp.asarray(ohb_np)
    a_free = jnp.asarray(rng.randn(B, nv).astype(np.float32) * 0.1)
    ws = jnp.asarray(rng.randn(B, nv).astype(np.float32) * 0.1)
    lim_aref = jnp.asarray(rng.randn(B, nlim).astype(np.float32) * 0.01)
    con_aref = jnp.asarray(rng.randn(B, K, 3).astype(np.float32) * 0.01)
    lim_params = jnp.asarray(np.stack([
        (rng.rand(B, nlim) < 0.5).astype(np.float32),
        rng.rand(B, nlim).astype(np.float32) * 100.0], axis=1))
    actc = (rng.rand(B, K) < 0.8).astype(np.float32)
    con_params = jnp.asarray(np.stack([
        0.5 + rng.rand(B, K).astype(np.float32),
        (rng.rand(B, K) < 0.8).astype(np.float32),
        actc,
        rng.rand(B, K).astype(np.float32) * 100.0,
        actc * (1.0 - brk_np)], axis=1))

    args = (Mps, conJ, ohb, a_free, ws, lim_aref, con_aref,
            lim_params, con_params)
    ref = jax.vmap(lambda *a: newton_fused._ref_solve_full(
        part, lim_dof, lim_sign, 30, 2, *a))(*args)
    op = newton_fused.make_newton_solve_pe(
        part, lim_dof, lim_sign, 30, 2, interpret=True)
    out = jax.vmap(op)(*args)
    for nm, o, r in zip(['qacc', 'qfrc', 'f_l', 'f_c'], out, ref):
        got, want = np.asarray(o), np.asarray(r)
        assert np.isfinite(want).all(), f'{nm}: reference not finite'
        assert np.isfinite(got).all(), f'{nm}: kernel not finite'
        np.testing.assert_allclose(got, want, rtol=0, atol=3e-3,
                                   err_msg=nm)
