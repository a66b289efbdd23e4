"""Opt-in accelerator lane: compiled (non-interpret) pallas kernels vs
their jnp references on the real device.

CPU CI runs the kernels in interpret mode only (tests/test_ops.py),
which can never catch a Mosaic-side miscompile (round-1 hit one: "Mosaic
miscompiles large mixed f32/i1 loop carries"). This lane runs the actual
compiled kernels and is gated so it only executes when explicitly
requested on a machine with an accelerator:

    FLYBODY_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -q

(The env var also stops conftest.py from forcing the CPU platform.)
"""

import os

import numpy as np
import pytest

if not os.environ.get('FLYBODY_TPU_TESTS'):
    pytest.skip('set FLYBODY_TPU_TESTS=1 to run the compiled-kernel lane',
                allow_module_level=True)

# The whole-stage fusion kernels are opt-in (ops/dispatch.py) until
# this lane has validated them on the real chip; the lane always
# exercises them.
os.environ.setdefault('FLYBODY_STAGE_FUSION', '1')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if jax.default_backend() != 'tpu':
    pytest.skip('no TPU backend present', allow_module_level=True)

from flybody_tpu.ops import cholesky as pchol  # noqa: E402


@pytest.fixture(scope='module')
def spd():
    rng = np.random.RandomState(0)
    B, n = 256, 108
    A = jnp.asarray(rng.randn(B, n, 4 * n), jnp.float32)
    M = (jnp.einsum('bij,bkj->bik', A, A) / (4 * n)
         + 10.0 * jnp.eye(n, dtype=jnp.float32))
    b = jnp.asarray(rng.randn(B, n), jnp.float32)
    return M, b


def test_compiled_chol_and_solves(spd):
    M, b = spd
    import jax.scipy.linalg as jsl
    L = np.asarray(jax.jit(pchol.chol)(M))
    L_ref = np.asarray(jnp.linalg.cholesky(M))
    np.testing.assert_allclose(L, L_ref, atol=5e-4, rtol=5e-3)
    x = np.asarray(jax.jit(pchol.cho_solve)(jnp.asarray(L), b))
    x_ref = np.asarray(jsl.cho_solve((jnp.asarray(L_ref), True),
                                     b[..., None])[..., 0])
    np.testing.assert_allclose(x, x_ref, atol=1e-3, rtol=1e-2)
    # Fused factor+solve and multi-RHS.
    Lf, xf = jax.jit(pchol.chol_solve)(M, b)
    np.testing.assert_allclose(np.asarray(xf), x_ref, atol=1e-3,
                               rtol=1e-2)
    R = jnp.asarray(np.random.RandomState(1).randn(M.shape[0], 108, 16),
                    jnp.float32)
    X = np.asarray(jax.jit(pchol.cho_solve_multi)(jnp.asarray(L_ref), R))
    X_ref = np.asarray(jsl.cho_solve((jnp.asarray(L_ref), True), R))
    np.testing.assert_allclose(X, X_ref, atol=2e-3, rtol=1e-2)


def test_compiled_linesearch():
    from flybody_tpu.ops import linesearch as pls
    rng = np.random.RandomState(7)
    B, L, K = 128, 24, 16
    lim = jnp.asarray(np.stack([
        rng.randn(B, L), rng.randn(B, L),
        (rng.rand(B, L) < 0.5).astype(float),
        rng.rand(B, L) * 100.0], axis=1), jnp.float32)
    con = jnp.asarray(np.concatenate([
        rng.randn(B, 3, K), rng.randn(B, 3, K),
        0.2 + rng.rand(B, 1, K),
        (rng.rand(B, 1, K) < 0.8).astype(float),
        (rng.rand(B, 1, K) < 0.7).astype(float),
        rng.rand(B, 1, K) * 100.0], axis=1), jnp.float32)
    sc = jnp.asarray(np.stack([
        -np.abs(rng.randn(B, 1)) * 10.0,
        np.abs(rng.randn(B, 1)) * 5.0 + 1.0], axis=1), jnp.float32)
    f = pls.make_ls_pe(6, 6)
    got = np.asarray(jax.jit(jax.vmap(f))(lim, con, sc))
    ref = np.asarray(jax.jit(jax.vmap(
        lambda l, c, s: pls.alpha_ref(l, c, s, 6, 6)))(lim, con, sc))
    # f32 reduction-order flips near zero slopes allowed.
    close = np.isclose(got, ref, rtol=2e-2, atol=1e-3)
    assert close.mean() > 0.95, close.mean()


def test_compiled_fused_newton_reuse_step():
    """Fused Newton reuse-step kernel (ops/newton_fused.py) vs its jnp
    reference, compiled on the real device."""
    from flybody_tpu.model import compile as fmc
    from flybody_tpu.ops import arrow, newton_fused

    fly, _ = fmc.build_fly_model()
    part = arrow.build_partition(fly.meta)
    rng = np.random.RandomState(3)
    B, K, SB3, nlim = 256, 8, 6, 12
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
    M = jnp.asarray(As)
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
    ref = jax.jit(jax.vmap(lambda *a: newton_fused._ref_step(
        part, lim_dof, lim_sign, 30, *a)))(*args)
    fused = newton_fused.make_reuse_pe(part, lim_dof, lim_sign, 30)
    out = jax.jit(jax.vmap(fused))(*args)
    for nm, o, r in zip(['x', 'msm', 'jar_l', 'jar_c'], out, ref):
        got, want = np.asarray(o), np.asarray(r)
        close = np.isclose(got, want, rtol=1e-2, atol=2e-3)
        assert close.mean() > 0.995, (nm, close.mean())

    # Whole-block kernel (factor + Z + LC + 3 iterations per launch)
    # with packed H/M.
    Mps = jax.vmap(lambda a: arrow.pack_sym_ref(part, a))(jnp.asarray(As))
    args_blk = (Mps, Mps, conJ, U, x, msm, jar_l, jar_c, lim_params,
                con_params)
    ref_b = jax.jit(jax.vmap(lambda *a: newton_fused._ref_block(
        part, lim_dof, lim_sign, 30, 3, *a)))(*args_blk)
    blk = newton_fused.make_newton_block_pe(part, lim_dof, lim_sign,
                                            30, 3)
    out_b = jax.jit(jax.vmap(blk))(*args_blk)
    for nm, o, r in zip(['x', 'msm', 'jar_l', 'jar_c'], out_b, ref_b):
        got, want = np.asarray(o), np.asarray(r)
        close = np.isclose(got, want, rtol=1e-2, atol=2e-3)
        assert close.mean() > 0.995, (nm, close.mean())


def test_compiled_engine_step_finite():
    """Full engine step (all pallas kernels live) at a modest batch."""
    from flybody_tpu.envs import fly_envs
    from flybody_tpu.physics import engine
    from flybody_tpu.physics.state import make_data
    model = fly_envs._walking_model(False, True, 0.01)
    model = jax.tree.map(
        lambda x: (jnp.asarray(x, jnp.float32)
                   if hasattr(x, 'dtype') and
                   jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                   else jnp.asarray(x)), model)
    B = 256
    qpos = jnp.tile(model.qpos0[None], (B, 1))
    qpos = qpos + 0.01 * jax.random.normal(jax.random.PRNGKey(0),
                                           qpos.shape, jnp.float32)
    d = jax.vmap(lambda q: make_data(model).replace(qpos=q))(qpos)
    step = jax.jit(jax.vmap(lambda dd: engine.step(
        model, dd, solver_iterations=8, ls_iterations=6,
        refactor_period=4, ncon_max=32, noslip_contacts=16).strip()))
    for _ in range(3):
        d = step(d)
    assert np.isfinite(np.asarray(d.qpos)).all()
    assert np.isfinite(np.asarray(d.qvel)).all()


def test_compiled_pos_stage_kernel():
    """Fused position-stage kernel compiled on the real accelerator
    matches the XLA reference pipeline."""
    from flybody_tpu.envs import fly_envs
    from flybody_tpu.ops import pos_stage
    model = fly_envs._walking_model(False, True, 0.01)
    model = jax.tree.map(
        lambda x: (jnp.asarray(x, jnp.float32)
                   if hasattr(x, 'dtype') and
                   jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                   else jnp.asarray(x)), model)
    B = 256
    rng = np.random.RandomState(0)
    qpos = np.tile(np.asarray(model.qpos0, np.float32)[None], (B, 1))
    qpos += 0.1 * rng.randn(B, qpos.shape[1]).astype(np.float32)
    qpos = jnp.asarray(qpos)
    f = pos_stage.make_pos_stage_pe(model)
    assert f is not None
    out = jax.jit(jax.vmap(f))(qpos)  # pallas path on TPU
    # The kernel computes its dots at Precision.HIGHEST (exact f32);
    # the XLA stages' default-precision dots run at bf16 on TPU
    # (~4e-3 rel), so the reference must be held to the same
    # precision for a 1e-5 comparison to be meaningful.
    with jax.default_matmul_precision('highest'):
        ref = jax.jit(jax.vmap(
            lambda q: pos_stage._ref_outputs(model, q)))(qpos)
    names = ['xpos', 'xquat', 'xmat', 'xipos', 'ximat', 'geom_xpos',
             'geom_xmat', 'site_xpos', 'site_xmat', 'subtree_com',
             'cinert', 'cdof', 'jnt_xanchor', 'jnt_xaxis', 'ten_length']
    for nm, o, r in zip(names, out, ref):
        o, r = np.asarray(o), np.asarray(r)
        scale = max(1e-6, float(np.max(np.abs(r))))
        assert np.max(np.abs(o - r)) / scale < 1e-5, nm


def test_compiled_force_stage_kernel():
    """Fused velocity+force-stage kernel compiled on the real
    accelerator matches the XLA reference stages."""
    from flybody_tpu.envs import fly_envs
    from flybody_tpu.ops import force_stage, pos_stage
    model = fly_envs._walking_model(False, True, 0.01)
    model = jax.tree.map(
        lambda x: (jnp.asarray(x, jnp.float32)
                   if hasattr(x, 'dtype') and
                   jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                   else jnp.asarray(x)), model)
    B = 256
    rng = np.random.RandomState(0)
    meta = model.meta
    qpos = np.tile(np.asarray(model.qpos0, np.float32)[None], (B, 1))
    qpos += 0.1 * rng.randn(B, meta.nq).astype(np.float32)
    qvel = jnp.asarray(0.5 * rng.randn(B, meta.nv).astype(np.float32))
    act = jnp.asarray(0.2 * rng.randn(B, meta.na).astype(np.float32))
    ctrl = jnp.asarray(0.3 * rng.randn(B, meta.nu).astype(np.float32))
    qpos = jnp.asarray(qpos)
    ps = jax.jit(jax.vmap(pos_stage.make_pos_stage_pe(model)))(qpos)
    (xpos, xquat, xmat, xipos, ximat, gpos, gmat, spos, smat, scom,
     cinert, cdof, janc, jaxw, tenl) = ps
    args = (qpos, qvel, act, ctrl, cdof, cinert, xipos, ximat, scom,
            gpos, gmat, tenl)
    f = force_stage.make_force_stage_pe(model)
    out = jax.jit(jax.vmap(f))(*args)
    with jax.default_matmul_precision('highest'):
        ref = jax.jit(jax.vmap(
            lambda *a: force_stage._ref_outputs(model, *a)))(*args)
    names = ['cvel', 'cdof_dot', 'ten_velocity', 'qfrc_bias',
             'qfrc_passive', 'qfrc_fluid', 'qfrc_actuator',
             'actuator_force', 'act_dot', 'qM']
    for nm, o, r in zip(names, out, ref):
        o, r = np.asarray(o), np.asarray(r)
        if o.size == 0:
            continue
        scale = max(1e-6, float(np.max(np.abs(r))))
        assert np.max(np.abs(o - r)) / scale < 1e-4, nm


def test_compiled_sens_stage_kernel():
    """Fused sensor kernel compiled on the real accelerator matches
    the XLA sensor stage."""
    from flybody_tpu.envs import fly_envs
    from flybody_tpu.ops import sens_stage
    from flybody_tpu.physics import collision, smooth, solver
    from flybody_tpu.physics.state import make_data
    model = fly_envs._walking_model(False, True, 0.01)
    model = jax.tree.map(
        lambda x: (jnp.asarray(x, jnp.float32)
                   if hasattr(x, 'dtype') and
                   jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                   else jnp.asarray(x)), model)
    B = 256
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
                                       iterations=10, ls_iterations=8)
        return d.replace(qacc=qacc), efc, f_c

    ds, efcs, fcs = jax.jit(jax.vmap(prep))(jnp.asarray(qpos),
                                            jnp.asarray(qvel))
    cb12 = jnp.stack([efcs.con_body1.astype(jnp.float32),
                      efcs.con_body2.astype(jnp.float32)], axis=1)
    args = (ds.qacc, ds.qvel, ds.cvel, ds.cdof, ds.cdof_dot, ds.cinert,
            ds.site_xpos, ds.site_xmat, ds.subtree_com, efcs.con_xpos,
            efcs.con_normal, cb12, efcs.con_active, fcs)
    f = sens_stage.make_sens_stage_pe(model)
    out = jax.jit(jax.vmap(f))(*args)
    with jax.default_matmul_precision('highest'):
        ref = jax.jit(jax.vmap(
            lambda *a: sens_stage._ref_outputs(model, *a)))(*args)
    o, r = np.asarray(out), np.asarray(ref)
    scale = np.maximum(1e-6, np.abs(r).max(0))
    assert float((np.abs(o - r) / scale).max()) < 1e-4


def test_compiled_efc_stage_kernel(monkeypatch):
    """Fused contact-row kernel (ops/efc_stage.py) compiled on the real
    accelerator matches the XLA reference path through make_efc."""
    from flybody_tpu.envs import fly_envs
    from flybody_tpu.physics import collision, smooth, solver
    from flybody_tpu.physics.state import make_data
    model = fly_envs._walking_model(False, True, 0.01)
    model = jax.tree.map(
        lambda x: (jnp.asarray(x, jnp.float32)
                   if hasattr(x, 'dtype') and
                   jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                   else jnp.asarray(x)), model)
    B = 256
    rng = np.random.RandomState(0)
    meta = model.meta
    qpos = np.tile(np.asarray(model.qpos0, np.float32)[None], (B, 1))
    qpos[:, 2] = 0.1
    qpos[:, 7:] += 0.1 * rng.randn(B, meta.nq - 7).astype(np.float32)
    qvel = 0.3 * rng.randn(B, meta.nv).astype(np.float32)

    def rows(qp, qv):
        d = make_data(model).replace(qpos=qp, qvel=qv)
        d = smooth.fwd_smooth(model, d)
        con = collision.collide(model, d, compact=True)
        return solver.make_efc(model, d, con, ncon_max=24)

    # Both traces run the XLA glue (tile prestage, broadphase gathers)
    # at HIGHEST so the candidate values feeding the op are identical;
    # only the contact-row op itself differs between the two runs. (The
    # kernel's own gathers are exact masked reductions; the reference's
    # one-hot GEMMs are exact only at f32 precision.)
    with jax.default_matmul_precision('highest'):
        out = jax.jit(jax.vmap(rows))(jnp.asarray(qpos),
                                      jnp.asarray(qvel))
        monkeypatch.setenv('FLYBODY_NO_PALLAS', 'efcstage')
        ref = jax.jit(jax.vmap(rows))(jnp.asarray(qpos),
                                      jnp.asarray(qvel))
        monkeypatch.delenv('FLYBODY_NO_PALLAS')
    assert int(np.asarray(ref.con_active).sum()) > B  # contact-rich
    for nm in ['con_J', 'con_active', 'con_frictional', 'con_mu',
               'con_aref', 'con_D', 'con_pos', 'con_sel', 'con_xpos',
               'con_normal', 'con_body1', 'con_body2', 'con_self',
               'con_break']:
        o = np.asarray(getattr(out, nm))
        r = np.asarray(getattr(ref, nm))
        if nm in ('con_sel', 'con_body1', 'con_body2'):
            assert (o == r).all(), nm
            continue
        scale = max(1e-6, float(np.abs(r).max()))
        assert float(np.abs(o - r).max()) / scale < 1e-4, nm


def test_compiled_full_newton_block():
    """The FULL Newton block kernel (in-kernel Hessian/Woodbury
    assembly) compiled on the real device, at walking-model-class
    shapes (nlim=204, K=24, SB=8).

    The in-kernel Hessian differs from the XLA reference's at bf16
    level (the reference einsum runs at MXU DEFAULT precision), and a
    Newton direction difference of that size amplifies chaotically
    through the exact line search — direct iterate comparison is
    meaningless. Instead this asserts the chaos-robust invariants:
    finiteness, bit-level internal consistency of the carried state
    (jar/msm updates must equal J/S^T/M times the x update), and
    primal-cost descent at least as good as the reference's."""
    from flybody_tpu.model import compile as fmc
    from flybody_tpu.ops import arrow, newton_fused

    fly, _ = fmc.build_fly_model()
    part = arrow.build_partition(fly.meta)
    rng = np.random.RandomState(11)
    B, K, SB, nlim = 256, 24, 8, 204
    nv = part.nv
    lim_dof = tuple(int(v) for v in rng.choice(nv, nlim, replace=True))
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
    # Contact-row contract (physics/solver.py): rows with
    # hess_active=1 MUST be arrow-compatible (support within root dofs
    # + ONE limb block) — the packed Hessian truncates cross-limb
    # blocks, and truncating a dense random row's PSD contribution
    # makes Hp indefinite -> Cholesky NaN (that is the real solver's
    # invariant, not a kernel defect: hess_active = active*(1-break)
    # excludes exactly the cross-limb rows). Cross-limb rows are
    # generated dense and flagged break=1.
    from tests.helpers import arrow_compatible_rows
    conJ_np, brk_np = arrow_compatible_rows(part, rng, B, K, nv)
    conJ = jnp.asarray(conJ_np)
    ohb_np = np.zeros((B, SB, K), np.float32)
    for b in range(B):
        rows = rng.choice(K, SB, replace=False)
        ohb_np[b, np.arange(SB), rows] = 1.0
    ohb = jnp.asarray(ohb_np)
    x = jnp.asarray(rng.randn(B, nv).astype(np.float32) * 0.1)
    # msm consistent with x (msm = M (x - a_free) for some a_free).
    a_free = jnp.asarray(rng.randn(B, nv).astype(np.float32) * 0.1)
    msm = jax.vmap(lambda m, xv: arrow.matvec_packed(part, m, xv))(
        Mps, x - a_free)
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

    args = (Mps, conJ, ohb, x, msm, jar_l, jar_c, lim_params,
            con_params)
    full = newton_fused.make_newton_block_full_pe(part, lim_dof,
                                                  lim_sign, 12, 3)
    xo, msmo, jlo, jco = jax.jit(jax.vmap(full))(*args)
    xo, msmo = np.asarray(xo), np.asarray(msmo)
    jlo, jco = np.asarray(jlo), np.asarray(jco)
    for nm, v in (('x', xo), ('msm', msmo), ('jar_l', jlo),
                  ('jar_c', jco)):
        assert np.isfinite(v).all(), nm

    # Internal consistency: the carried state must equal the linear
    # maps of the accepted total step (catches any Mosaic garbage).
    # Predictions are computed on HOST in f64 — a device einsum /
    # matvec_packed reference runs at MXU default (bf16) precision on
    # TPU and its ~1e-2 error dwarfs the kernel's f32 accumulation
    # (this exact contamination made the round-4 form of this test
    # flake at 0.0139 vs atol 0.0105 on one element). Tolerances below
    # are set by the kernel's own regime: f32 mul+VPU-sum matvecs
    # accumulated over 3 iterations (~1e-5 relative); 1e-3 absolute
    # leaves 100x headroom while still failing instantly on off-target
    # Mosaic writes (which corrupt at O(1)).
    dx64 = (xo - np.asarray(x)).astype(np.float64)
    smat64 = (np.eye(nv)[list(lim_dof)]
              * np.asarray(lim_sign, np.float64)[:, None])
    jl_pred = np.asarray(jar_l, np.float64) + dx64 @ smat64.T
    jc_pred = (np.asarray(jar_c, np.float64)
               + np.einsum('bkiv,bv->bki',
                           np.asarray(conJ, np.float64), dx64))
    msm_pred = (np.asarray(msm, np.float64)
                + np.einsum('bvw,bw->bv', As.astype(np.float64), dx64))
    scale = float(np.abs(msm_pred).max())
    np.testing.assert_allclose(jlo, jl_pred, atol=1e-3)
    np.testing.assert_allclose(jco, jc_pred, atol=1e-3)
    np.testing.assert_allclose(msmo, msm_pred, atol=1e-3 * max(1.0, scale))

    # Primal-cost descent comparable to the reference composition.
    def cost(xv, msv, jl, jc):
        mu, fric, act, D = (con_params[:, 0], con_params[:, 1],
                            con_params[:, 2], con_params[:, 3])
        actl, Dl = lim_params[:, 0], lim_params[:, 1]
        smooth = 0.5 * jnp.sum((xv - a_free) * msv, axis=-1)
        cl = 0.5 * jnp.sum(Dl * actl * (jl < 0) * jl ** 2, axis=-1)
        from flybody_tpu.physics import solver as _sol
        res = jax.vmap(_sol._cone_residual)(jc, mu, fric, act)
        cc = 0.5 * jnp.sum(D[:, :, None] * res ** 2, axis=(-2, -1))
        return smooth + cl + cc

    ref = jax.jit(jax.vmap(lambda *a: newton_fused._ref_block_full(
        part, lim_dof, lim_sign, 12, 3, *a)))(*args)
    c0 = np.asarray(cost(x, msm, jar_l, jar_c))
    ck = np.asarray(cost(jnp.asarray(xo), jnp.asarray(msmo),
                         jnp.asarray(jlo), jnp.asarray(jco)))
    cr = np.asarray(cost(ref[0], ref[1], ref[2], ref[3]))
    assert (ck <= c0 + 1e-3).all(), 'kernel iterates must descend'
    # Aggregate descent within 5% of the reference composition.
    assert ck.mean() <= cr.mean() + 0.05 * np.abs(c0.mean()), (
        ck.mean(), cr.mean(), c0.mean())


def test_compiled_whole_solve_newton():
    """The WHOLE-SOLVE Newton kernel (warmstart pick + init + assembly
    + iterations + final forces/qfrc, ops/newton_fused.
    make_newton_solve_pe) compiled on the real device.

    Chaos-robust invariants (direct iterate comparison is meaningless —
    see test_compiled_full_newton_block): finiteness, exact consistency
    qfrc == S f_l + J^T f_c of the emitted outputs, primal-cost descent
    from BOTH candidate starts, and aggregate cost within 5% of the jnp
    reference composition."""
    from tests.helpers import arrow_compatible_rows
    from flybody_tpu.model import compile as fmc
    from flybody_tpu.ops import arrow, newton_fused

    fly, _ = fmc.build_fly_model()
    part = arrow.build_partition(fly.meta)
    rng = np.random.RandomState(13)
    B, K, SB, nlim = 256, 24, 8, 204
    nv = part.nv
    lim_dof = tuple(int(v) for v in rng.choice(nv, nlim, replace=True))
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
    op = newton_fused.make_newton_solve_pe(part, lim_dof, lim_sign,
                                           12, 3)
    qacc, qfrc, f_l, f_c = jax.jit(jax.vmap(op))(*args)
    qacc, qfrc = np.asarray(qacc), np.asarray(qfrc)
    f_l, f_c = np.asarray(f_l), np.asarray(f_c)
    for nm, v in (('qacc', qacc), ('qfrc', qfrc), ('f_l', f_l),
                  ('f_c', f_c)):
        assert np.isfinite(v).all(), nm

    # Output self-consistency: qfrc must equal S f_l + J^T f_c of the
    # emitted forces (catches any Mosaic garbage in the epilogue).
    dof = np.array(lim_dof)
    sign = np.asarray(lim_sign, np.float32)
    qfrc_pred = jnp.asarray(
        np.zeros((B, nv), np.float32))
    qfrc_pred = jax.vmap(
        lambda fl, fc, cj: jnp.zeros(nv, jnp.float32)
        .at[dof].add(fl * sign)
        + jnp.sum(cj * fc[:, :, None], axis=(0, 1)))(
            jnp.asarray(f_l), jnp.asarray(f_c), conJ)
    np.testing.assert_allclose(
        qfrc, np.asarray(qfrc_pred),
        atol=5e-3 + 1e-3 * np.abs(np.asarray(qfrc_pred)).max())

    # Primal-cost descent from both candidate starts.
    from flybody_tpu.physics import solver as _sol

    def cost(xv):
        mu, fric, act, D = (con_params[:, 0], con_params[:, 1],
                            con_params[:, 2], con_params[:, 3])
        actl, Dl = lim_params[:, 0], lim_params[:, 1]
        dxv = xv - a_free
        msv = jax.vmap(
            lambda m, d: arrow.matvec_packed(part, m, d))(Mps, dxv)
        smooth = 0.5 * jnp.sum(dxv * msv, axis=-1)
        jl = (xv[:, dof] * sign[None] - lim_aref)
        cl = 0.5 * jnp.sum(Dl * actl * (jl < 0) * jl ** 2, axis=-1)
        jc = jnp.einsum('bkiv,bv->bki', conJ, xv) - con_aref
        res = jax.vmap(_sol._cone_residual)(jc, mu, fric, act)
        cc = 0.5 * jnp.sum(D[:, :, None] * res ** 2, axis=(-2, -1))
        return smooth + cl + cc

    c_start = np.minimum(np.asarray(cost(ws)), np.asarray(cost(a_free)))
    ck = np.asarray(cost(jnp.asarray(qacc)))
    assert (ck <= c_start + 1e-3).all(), 'whole solve must descend'
    ref = jax.jit(jax.vmap(lambda *a: newton_fused._ref_solve_full(
        part, lim_dof, lim_sign, 12, 3, *a)))(*args)
    cr = np.asarray(cost(ref[0]))
    assert ck.mean() <= cr.mean() + 0.05 * np.abs(c_start.mean()), (
        ck.mean(), cr.mean(), c_start.mean())
