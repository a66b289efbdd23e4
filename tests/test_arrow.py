"""Block-arrow factorization tests: partition, jnp reference, pallas
kernels (interpret mode), and engine-level arrow-vs-dense A/B parity.

The arrow path replaces dense Cholesky everywhere (factor_m / euler /
Newton fresh+reuse steps / noslip multi-RHS solve); reference semantics
are MuJoCo's sparse L^T D L mass-matrix factorization
(engine_core_smooth.c) extended to the Newton Hessian with a Woodbury
correction for cross-limb contact rows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flybody_tpu.model import compile as mc
from flybody_tpu.ops import arrow


@pytest.fixture(scope='module')
def fly_meta():
    fly, _ = mc.build_fly_model()
    return fly.meta


@pytest.fixture(scope='module')
def part(fly_meta):
    return arrow.build_partition(fly_meta)


def test_partition_structure(part, fly_meta):
    assert part is not None
    assert part.nr == 6
    assert len(part.ds) == 12
    assert part.dmax == 14
    # Blocks tile [nr, nv).
    pos = part.nr
    for lo, d in zip(part.los, part.ds):
        assert lo == pos
        pos += d
    assert pos == fly_meta.nv
    # Every non-trunk body belongs to a limb.
    assert min(part.limb_of_body) == -1
    assert max(part.limb_of_body) == 11


def _random_arrow_spd(part, rng, dtype=np.float64):
    """Random SPD matrix with exactly the arrow sparsity pattern."""
    nv = part.nv
    X = rng.standard_normal((nv, nv)) * 0.2
    S = X @ X.T + np.eye(nv) * 2.0
    mask = np.zeros((nv, nv))
    mask[:part.nr, :] = 1
    mask[:, :part.nr] = 1
    for lo, d in zip(part.los, part.ds):
        mask[lo:lo + d, lo:lo + d] = 1
    A = S * mask
    A += np.eye(nv) * (abs(np.linalg.eigvalsh((A + A.T) / 2).min()) + 1.0)
    return ((A + A.T) / 2).astype(dtype)


def test_mass_matrix_is_arrow(part):
    """The fly mass matrix has exactly the arrow pattern (tree sparsity)."""
    import mujoco
    fly, m = mc.build_fly_model()
    d = mujoco.MjData(m)
    rng = np.random.default_rng(0)
    d.qpos[:] = m.qpos0 + 0.05 * rng.standard_normal(m.nq)
    mujoco.mj_forward(m, d)
    M = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, M)
    mask = np.zeros((m.nv, m.nv), bool)
    mask[:part.nr, :] = True
    mask[:, :part.nr] = True
    for lo, dd in zip(part.los, part.ds):
        mask[lo:lo + dd, lo:lo + dd] = True
    assert np.abs(M[~mask]).max() == 0.0


def test_factor_solve_ref(part):
    rng = np.random.default_rng(1)
    A = jnp.asarray(_random_arrow_spd(part, rng))
    F = arrow.factor_ref(part, A)
    b = jnp.asarray(rng.standard_normal(part.nv))
    x = arrow.solve_ref(part, F, b)
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b),
                               rtol=0, atol=1e-10)
    Bm = jnp.asarray(rng.standard_normal((part.nv, 7)))
    X = arrow.solve_ref(part, F, Bm)
    np.testing.assert_allclose(np.asarray(A @ X), np.asarray(Bm),
                               rtol=0, atol=1e-10)


def test_pallas_interpret_parity(part):
    rng = np.random.default_rng(2)
    B = 160  # > LANES to exercise the grid + padding path
    As = jnp.asarray(np.stack(
        [_random_arrow_spd(part, rng, np.float32) for _ in range(B)]))
    bs = jnp.asarray(rng.standard_normal((B, part.nv)).astype(np.float32))
    Bm = jnp.asarray(
        rng.standard_normal((B, part.nv, 5)).astype(np.float32))

    F_ref = jax.vmap(lambda a: arrow.factor_ref(part, a))(As)
    F_pl = arrow.factor_batched(part, As, interpret=True)
    np.testing.assert_allclose(np.asarray(F_pl), np.asarray(F_ref),
                               rtol=0, atol=3e-6)

    x_ref = jax.vmap(lambda f, r: arrow.solve_ref(part, f, r))(F_ref, bs)
    x_pl = arrow.solve_batched(part, F_ref, bs, interpret=True)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_ref),
                               rtol=0, atol=3e-6)

    X_ref = jax.vmap(lambda f, r: arrow.solve_ref(part, f, r))(F_ref, Bm)
    X_pl = arrow.solve_batched(part, F_ref, Bm, interpret=True)
    np.testing.assert_allclose(np.asarray(X_pl), np.asarray(X_ref),
                               rtol=0, atol=3e-6)

    F2, x2 = arrow.factor_solve_batched(part, As, bs, interpret=True)
    np.testing.assert_allclose(np.asarray(F2), np.asarray(F_ref),
                               rtol=0, atol=3e-6)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x_ref),
                               rtol=0, atol=3e-6)


def test_factor_m_roundtrip_arrow(part):
    """smooth.factor_m/solve_m use the packed arrow factor end to end."""
    from flybody_tpu.physics import kinematics as kin
    from flybody_tpu.physics import smooth as sm
    from flybody_tpu.physics.state import make_data
    fly, _ = mc.build_fly_model()
    rng = np.random.default_rng(3)
    data = make_data(fly)
    data = data.replace(qpos=data.qpos + 0.03 * jnp.asarray(
        rng.standard_normal(fly.meta.nq)))
    data, ja, jx = kin.kinematics(fly, data)
    data = kin.com_pos(fly, data, ja, jx)
    data = sm.crb(fly, data)
    data = sm.factor_m(fly, data)
    assert data.qLD.ndim == 3  # packed arrow factor
    rhs = jnp.asarray(rng.standard_normal(fly.meta.nv))
    x = sm.solve_m(fly, data, rhs)
    np.testing.assert_allclose(np.asarray(data.qM @ x), np.asarray(rhs),
                               rtol=0, atol=1e-9)
    # Multi-RHS path (noslip's M^-1 J^T solve).
    R = jnp.asarray(rng.standard_normal((fly.meta.nv, 6)))
    X = sm.solve_m(fly, data, R)
    np.testing.assert_allclose(np.asarray(data.qM @ X), np.asarray(R),
                               rtol=0, atol=1e-9)


def test_woodbury_hessian_solve(part):
    """Arrow + Woodbury solves (A + U U^T) x = b exactly."""
    rng = np.random.default_rng(4)
    nv = part.nv
    A = _random_arrow_spd(part, rng)
    U = rng.standard_normal((nv, 9)) * 0.5
    H = A + U @ U.T
    b = rng.standard_normal(nv)
    F = arrow.factor_ref(part, jnp.asarray(A))
    t = arrow.solve_ref(part, F, jnp.asarray(b))
    Z = arrow.solve_ref(part, F, jnp.asarray(U))
    C = np.eye(9) + U.T @ np.asarray(Z)
    w = np.linalg.solve(C, U.T @ np.asarray(t))
    x = np.asarray(t) - np.asarray(Z) @ w
    np.testing.assert_allclose(H @ x, b, rtol=0, atol=1e-9)


def test_efc_compaction_overflow_and_padding():
    """make_efc slot selection (exact top-k by score): all penetrating
    slots are selected, unselected rows are inactive with valid unit
    normals, and overflow beyond ncon_max keeps the deepest slots."""
    import mujoco  # noqa: F401  (model build path)
    from flybody_tpu.physics import collision as col
    from flybody_tpu.physics import kinematics as kin
    from flybody_tpu.physics import solver
    from flybody_tpu.physics.state import make_data

    fly, _ = mc.build_fly_model()
    data = make_data(fly)
    data, ja, jx = kin.kinematics(fly, data)
    data = kin.com_pos(fly, data, ja, jx)
    from flybody_tpu.physics import smooth as sm
    data = sm.com_vel(fly, data)

    tb = col.pair_tables(fly.meta)
    S = tb['nslot']
    rng = np.random.default_rng(0)
    # 7 penetrating slots at chosen positions.
    active_slots = np.array([3, 100, 101, 500, 1500, 2000, S - 1])
    dist = np.full((S,), 1.0)
    dist[active_slots] = -1e-4
    n = rng.standard_normal((S, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    con = col.Contact(dist=jnp.asarray(dist, jnp.float64)
                      if data.qpos.dtype == jnp.float64
                      else jnp.asarray(dist, data.qpos.dtype),
                      pos=jnp.zeros((S, 3), data.qpos.dtype),
                      normal=jnp.asarray(n, data.qpos.dtype))

    efc = solver.make_efc(fly, data, con, ncon_max=8)
    sel = np.asarray(efc.con_sel)
    act = np.asarray(efc.con_active).astype(bool)
    # All 7 penetrating slots selected (order is by score, not slot id).
    assert set(active_slots.tolist()) <= set(sel.tolist())
    assert act.sum() == 7
    assert set(sel[act].tolist()) == set(active_slots.tolist())
    # Inactive rows still carry valid unit normals (frame construction).
    norms = np.linalg.norm(np.asarray(efc.con_normal), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    # Overflow: cap 4 keeps 4 of the penetrating slots, all active.
    efc4 = solver.make_efc(fly, data, con, ncon_max=4)
    sel4 = np.asarray(efc4.con_sel)
    assert set(sel4.tolist()) <= set(active_slots.tolist())
    assert np.asarray(efc4.con_active).all()


def _rand_arrow_spd_np(part, rng, dtype=np.float64):
    nv = part.nv
    X = rng.standard_normal((nv, nv)).astype(dtype) * 0.2
    S = X @ X.T + np.eye(nv, dtype=dtype) * 3.0
    mask = np.zeros((nv, nv), dtype)
    mask[:part.nr, :] = 1
    mask[:, :part.nr] = 1
    for lo, d in zip(part.los, part.ds):
        mask[lo:lo + d, lo:lo + d] = 1
    A = S * mask + np.eye(nv, dtype=dtype) * 3.0
    return (A + A.T) / 2


def test_packed_sym_roundtrip_matvec_factor(part):
    """pack_sym_ref/unpack_sym_ref roundtrip, matvec_packed, diag add,
    and the packed-input factor reference all match dense."""
    rng = np.random.default_rng(7)
    A = jnp.asarray(_rand_arrow_spd_np(part, rng))
    Mp = arrow.pack_sym_ref(part, A)
    np.testing.assert_allclose(np.asarray(arrow.unpack_sym_ref(part, Mp)),
                               np.asarray(A), rtol=0, atol=0)
    x = jnp.asarray(rng.standard_normal(part.nv))
    np.testing.assert_allclose(np.asarray(arrow.matvec_packed(part, Mp, x)),
                               np.asarray(A @ x), rtol=1e-12, atol=1e-12)
    Xm = jnp.asarray(rng.standard_normal((part.nv, 4)))
    np.testing.assert_allclose(
        np.asarray(arrow.matvec_packed(part, Mp, Xm)),
        np.asarray(A @ Xm), rtol=1e-12, atol=1e-12)
    dg = jnp.asarray(rng.random(part.nv))
    np.testing.assert_allclose(
        np.asarray(arrow.unpack_sym_ref(
            part, arrow.add_diag_packed(part, Mp, dg))),
        np.asarray(A + jnp.diag(dg)), rtol=0, atol=1e-15)
    np.testing.assert_allclose(np.asarray(arrow.factor_ref_p(part, Mp)),
                               np.asarray(arrow.factor_ref(part, A)),
                               rtol=0, atol=1e-12)


def test_packed_factor_kernel_interpret(part):
    """The packed-input pallas factor (and fused factor+solve) matches
    the dense-input reference."""
    rng = np.random.default_rng(8)
    B = 160
    As = jnp.asarray(np.stack(
        [_rand_arrow_spd_np(part, rng, np.float32) for _ in range(B)]))
    Mps = jax.vmap(lambda a: arrow.pack_sym_ref(part, a))(As)
    F_ref = jax.vmap(lambda a: arrow.factor_ref(part, a))(As)
    F_pk = arrow.factor_batched(part, Mps, interpret=True)
    np.testing.assert_allclose(np.asarray(F_pk), np.asarray(F_ref),
                               rtol=0, atol=5e-6)
    b = jnp.asarray(rng.standard_normal((B, part.nv)).astype(np.float32))
    _, x2 = arrow.factor_solve_batched(part, Mps, b, interpret=True)
    x_ref = jax.vmap(lambda f, r: arrow.solve_ref(part, f, r))(F_ref, b)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x_ref),
                               rtol=0, atol=5e-6)


def test_crb_packed_matches_dense():
    """smooth.crb_packed equals smooth.crb under unpack on a live state."""
    from flybody_tpu.physics import kinematics as kin
    from flybody_tpu.physics import smooth as sm
    from flybody_tpu.physics.state import make_data

    fly, _ = mc.build_fly_model()
    p = arrow.build_partition(fly.meta)
    rng = np.random.default_rng(9)
    data = make_data(fly)
    data = data.replace(
        qpos=data.qpos + 0.05 * jnp.asarray(
            rng.standard_normal(data.qpos.shape[0])),
        qvel=jnp.asarray(0.2 * rng.standard_normal(fly.meta.nv)))
    data, ja, jx = kin.kinematics(fly, data)
    data = kin.com_pos(fly, data, ja, jx)
    Md = np.asarray(sm.crb(fly, data).qM)
    Mp = sm.crb_packed(fly, data).qM
    np.testing.assert_allclose(
        np.asarray(arrow.unpack_sym_ref(p, Mp)), Md,
        rtol=0, atol=1e-15)
