"""Parity tests for collision detection and the constraint solver.

Ground truth: CPU MuJoCo on the fly + floor scene (floor params as set by
the Walking task, reference flybody/tasks/base.py:397-401).

Known, documented approximations vs MuJoCo 3.10:
  * convex (MPR) pair distances agree to ~1e-6 cm (MuJoCo's native CCD and
    our MPR are different approximations of the same quantity),
  * MuJoCo's flat-face contact manifolds (e.g. capsule lying on a cylinder)
    emit up to 3 near-duplicate points where we emit one,
  * consequently qacc agrees tightly on well-conditioned scenes and forces
    agree per-row at a given state, while ill-conditioned poses can differ
    along near-null directions of the (flat) optimum.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from flybody_tpu.model import compile as mc
from flybody_tpu.physics import collision, engine, smooth, solver
from flybody_tpu.physics.state import make_data

FLOOR = ('<worldbody><geom name="floor" type="plane" size="50 50 0.1" '
         'friction="0.5" solref="0.001 1" solimp="0.95 0.99 0.01"/>')


@pytest.fixture(scope='module')
def models():
    xml, assets = mc.fly_xml_and_assets()
    xml = xml.replace('<worldbody>', FLOOR, 1)
    return mc.build_fly_model(xml, assets)


@pytest.fixture(scope='module')
def settled(models):
    """Fly settled on the floor after 0.2 s of MuJoCo simulation."""
    _, m = models
    d = mujoco.MjData(m)
    d.qpos[:] = m.qpos0
    d.qpos[2] = 0.1278
    for _ in range(2000):
        mujoco.mj_step(m, d)
    return d.qpos.copy(), d.qvel.copy()


def _collide(fly, qpos):
    from flybody_tpu.physics import kinematics as kin
    data = make_data(fly).replace(qpos=jnp.asarray(qpos))
    data, _, _ = kin.fwd_position_smooth(fly, data)
    return collision.collide(fly, data), data


@pytest.mark.parametrize('z', [0.1278, 0.11, 0.08])
def test_contact_set_parity(models, z):
    fly, m = models
    d = mujoco.MjData(m)
    d.qpos[:] = m.qpos0
    d.qpos[2] = z
    mujoco.mj_forward(m, d)
    con, _ = _collide(fly, d.qpos.copy())
    tb = collision.pair_tables(fly.meta)
    params = collision.slot_params(fly)
    dist = np.asarray(con.dist)
    active = dist < np.asarray(params.includemargin)
    # Every MuJoCo contact has a matching active slot and vice versa.
    mjset = {}
    for c in d.contact:
        mjset.setdefault((c.geom1, c.geom2), []).append(c)
    ours = {}
    for i in np.where(active)[0]:
        ours.setdefault(
            (tb['slot_geom1'][i], tb['slot_geom2'][i]), []).append(i)
    assert set(map(tuple, mjset)) == set(map(tuple, ours))
    for key, cons in mjset.items():
        slots = ours[tuple(key)]
        for c in cons:
            best = min(slots, key=lambda i: np.linalg.norm(
                np.asarray(con.pos)[i] - c.pos))
            assert abs(dist[best] - c.dist) < 2e-6
            assert np.dot(np.asarray(con.normal)[best], c.frame[:3]) > 0.999
            np.testing.assert_allclose(np.asarray(params.friction)[best],
                                       c.friction, rtol=1e-9)
            np.testing.assert_allclose(np.asarray(params.solref)[best],
                                       c.solref, rtol=1e-9)
            assert abs(float(params.includemargin[best])
                       - c.includemargin) < 1e-12


def test_efc_row_parity(models, settled):
    """aref, R/D and contact Jacobians match mjData.efc_* row-for-row."""
    fly, m = models
    qpos, qvel = settled
    d = mujoco.MjData(m)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    mujoco.mj_forward(m, d)
    data = make_data(fly).replace(qpos=jnp.asarray(qpos),
                                  qvel=jnp.asarray(qvel))
    data = smooth.fwd_smooth(fly, data)
    con = collision.collide(fly, data)
    efc = solver.make_efc(fly, data, con, ncon_max=64)
    tb = collision.pair_tables(fly.meta)
    sel = np.asarray(efc.con_sel)
    Jmj = np.zeros((d.nefc, m.nv))
    mujoco.mju_sparse2dense(Jmj, d.efc_J, d.efc_J_rownnz, d.efc_J_rowadr,
                            d.efc_J_colind)
    checked = 0
    for c in d.contact:
        if c.geom1 >= m.ngeom or c.dim not in (1, 3):
            continue
        # Find our matching contact (skip MuJoCo's duplicate manifold pts).
        cands = [k for k in range(len(sel))
                 if (tb['slot_geom1'][sel[k]], tb['slot_geom2'][sel[k]])
                 == (c.geom1, c.geom2)]
        if not cands:
            continue
        k = min(cands, key=lambda k: abs(float(efc.con_pos[k]) - c.dist))
        if abs(float(efc.con_pos[k]) - c.dist) > 1e-5:
            continue  # MPR-precision or manifold-duplicate mismatch
        adr = c.efc_address
        # J arm precision is bounded by convex-pair contact-pos precision.
        np.testing.assert_allclose(np.asarray(efc.con_J)[k][0], Jmj[adr],
                                   atol=5e-4, rtol=0.02)
        # aref precision is bounded by convex-pair distance precision
        # (~2e-6 cm) times the contact stiffness K (~3e6).
        assert abs(float(efc.con_aref[k][0]) - d.efc_aref[adr]) < (
            1e-4 * max(1.0, abs(d.efc_aref[adr])) + 15.0)
        # Collapsed MPR manifolds carry nrep identical MuJoCo rows in one
        # slot with D scaled by nrep (collision._pair_rows).
        nrep = float(tb['slot_nrep'][sel[k]])
        assert abs(float(efc.con_D[k]) / nrep
                   - d.efc_D[adr]) < 1e-6 * d.efc_D[adr]
        checked += 1
    assert checked >= 5


def test_qacc_parity_touch(models):
    """Full forward parity on a well-conditioned contact scene."""
    fly, m = models
    d = mujoco.MjData(m)
    d.qpos[:] = m.qpos0
    d.qpos[2] = 0.105
    # Compare the main Newton solve; noslip order-dependence is tested
    # separately at trajectory level.
    m.opt.noslip_iterations = 0
    try:
        mujoco.mj_forward(m, d)
    finally:
        m.opt.noslip_iterations = 3
    data = make_data(fly).replace(qpos=jnp.asarray(d.qpos.copy()))
    out = engine.fwd(fly, data, solver_iterations=25, ls_iterations=14,
                     noslip_iterations=0)
    scale = np.abs(d.qacc).max()
    assert np.abs(np.asarray(out.qacc) - d.qacc).max() / scale < 2e-3
    np.testing.assert_allclose(np.asarray(out.qfrc_constraint),
                               d.qfrc_constraint,
                               atol=2e-3 * np.abs(d.qfrc_constraint).max())


def test_adhesion_moment_parity(models, settled):
    """Adhesion transmission moments match mjData.actuator_moment."""
    fly, m = models
    qpos, qvel = settled
    d = mujoco.MjData(m)
    d.qpos[:] = qpos
    mujoco.mj_forward(m, d)
    data = make_data(fly).replace(qpos=jnp.asarray(qpos))
    data = smooth.fwd_smooth(fly, data)
    con = collision.collide(fly, data)
    efc = solver.make_efc(fly, data, con, ncon_max=64)
    tb = collision.pair_tables(fly.meta)
    b1 = jnp.asarray(tb['slot_body1'], jnp.int32)[efc.con_sel]
    b2 = jnp.asarray(tb['slot_body2'], jnp.int32)[efc.con_sel]
    adh_u, adh_mom = engine.adhesion_moment(fly, efc, (b1, b2))
    dense = np.zeros((m.nu, m.nv))
    mujoco.mju_sparse2dense(dense, d.actuator_moment, d.moment_rownnz,
                            d.moment_rowadr, d.moment_colind)
    checked = 0
    for i, u in enumerate(adh_u):
        if 'claw' not in fly.meta.actuator_names[u]:
            continue  # labrum contacts are MPR pairs with ~1e-6 dist noise
        np.testing.assert_allclose(np.asarray(adh_mom)[i], dense[u],
                                   atol=1e-6)
        checked += 1
    assert checked == 6


def test_limits_engage(models):
    """Joint-limit rows engage and match MuJoCo qacc on a limit-violating
    pose (contact-free, fly in the air)."""
    fly, m = models
    d = mujoco.MjData(m)
    d.qpos[:] = m.qpos0
    d.qpos[2] = 5.0  # high above floor
    # Push several joints past their limits.
    rng = np.random.RandomState(3)
    for j in range(1, m.njnt):
        if m.jnt_limited[j] and rng.rand() < 0.3:
            lo, hi = m.jnt_range[j]
            d.qpos[m.jnt_qposadr[j]] = hi + 0.05 * (hi - lo)
    # Random in-air poses interpenetrate self geoms deeply, where convex
    # collision approximations diverge; isolate the limit machinery by
    # disabling contacts on both sides.
    m.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_CONTACT
    try:
        mujoco.mj_forward(m, d)
        assert d.nl > 0  # limits active in ground truth
        data = make_data(fly).replace(qpos=jnp.asarray(d.qpos.copy()))
        out = engine.fwd(fly, data, solver_iterations=25, ls_iterations=14,
                         use_contacts=False)
        scale = np.abs(d.qacc).max()
        assert np.abs(np.asarray(out.qacc) - d.qacc).max() / scale < 1e-5
    finally:
        m.opt.disableflags &= ~int(mujoco.mjtDisableBit.mjDSBL_CONTACT)


@pytest.mark.parametrize('z0', [0.1278, 0.11, 0.08])
def test_settled_constraint_force_parity(models, z0):
    """Tight qfrc_constraint parity on deeply settled poses (all drop
    heights), WITH noslip and the full contact manifold.

    This replaces the round-1 'near-null direction' caveat: with the
    capsule-cylinder 3-row manifold the constraint FORCES match MuJoCo to
    ~2e-4 relative. qacc itself remains an amplified quantity at settled
    equilibria — an O(1e-4) force difference pushed through the inverse
    inertia of milligram-scale limbs (principal inertias ~1e-9 g cm^2)
    moves qacc by O(100) rad/s^2, for MuJoCo-vs-MuJoCo fp-level
    perturbations just as for ours — so force space is the right place
    to assert parity."""
    fly, m = models
    d = mujoco.MjData(m)
    d.qpos[:] = m.qpos0
    d.qpos[2] = z0
    for _ in range(2000):
        mujoco.mj_step(m, d)
    mujoco.mj_forward(m, d)
    data = make_data(fly).replace(qpos=jnp.asarray(d.qpos.copy()),
                                  qvel=jnp.asarray(d.qvel.copy()))
    out = engine.fwd(fly, data, solver_iterations=25, ls_iterations=14)
    qf = np.asarray(out.qfrc_constraint)
    scale = np.abs(d.qfrc_constraint).max()
    rel = np.abs(qf - d.qfrc_constraint).max() / scale
    assert rel < 1e-3, rel


def test_capsule_cylinder_manifold_rows(models, settled):
    """Capsule-cylinder contacts carry MuJoCo's 3-row manifold (nativeccd
    deterministically produces 3 near-coincident points — measured
    260/260 over a 3000-step rollout — tripling effective stiffness).
    The three identical rows are collapsed into ONE slot with
    slot_nrep=3 (D scaled 3x — exactly equivalent total force), so the
    nrep-weighted active row count must match MuJoCo's row count."""
    fly, m = models
    qpos, _ = settled
    d = mujoco.MjData(m)
    d.qpos[:] = qpos
    mujoco.mj_forward(m, d)
    mj_cc = sum(1 for i in range(d.ncon)
                if {int(m.geom_type[d.contact[i].geom1]),
                    int(m.geom_type[d.contact[i].geom2])} == {3, 5})
    con, data = _collide(fly, qpos)
    params = collision.slot_params(fly, False)
    tb = collision.pair_tables(fly.meta)
    gt = np.array(fly.meta.geom_type)
    act = np.asarray(con.dist) < np.asarray(params.includemargin)
    ours_cc = 0.0
    for i in np.where(act)[0]:
        g1, g2 = tb['slot_geom1'][i], tb['slot_geom2'][i]
        if g1 >= 0 and {int(gt[g1]), int(gt[g2])} == {3, 5}:
            assert tb['slot_nrep'][i] == 3.0
            ours_cc += tb['slot_nrep'][i]
    assert mj_cc > 0 and ours_cc == mj_cc, (ours_cc, mj_cc)


def test_compact_collide_efc_equivalence(models, settled):
    """collide(compact=True) + make_efc selects the same contact rows
    (same global slot ids, same J/aref/D) as the dense scatter path."""
    fly, m = models
    qpos, qvel = settled
    data = make_data(fly).replace(qpos=jnp.asarray(qpos),
                                  qvel=jnp.asarray(qvel))
    data = smooth.fwd_smooth(fly, data)
    con_d = collision.collide(fly, data)
    con_c = collision.collide(fly, data, compact=True)
    assert len(con_c.blocks) == 2  # capsule-capsule + merged MPR
    efc_d = solver.make_efc(fly, data, con_d, ncon_max=32)
    efc_c = solver.make_efc(fly, data, con_c, ncon_max=32)
    act_d = np.asarray(efc_d.con_active) > 0
    act_c = np.asarray(efc_c.con_active) > 0
    sel_d = np.asarray(efc_d.con_sel)[act_d]
    sel_c = np.asarray(efc_c.con_sel)[act_c]
    assert set(sel_d) == set(sel_c), (sorted(sel_d), sorted(sel_c))
    od, oc = np.argsort(sel_d), np.argsort(sel_c)
    for name in ['con_J', 'con_aref', 'con_D', 'con_pos', 'con_mu',
                 'con_self', 'con_body1', 'con_body2']:
        vd = np.asarray(getattr(efc_d, name))[act_d][od]
        vc = np.asarray(getattr(efc_c, name))[act_c][oc]
        np.testing.assert_allclose(vd, vc, rtol=1e-6, atol=1e-8,
                                   err_msg=name)


def test_settle_trajectory(models):
    """Dropped fly settles like MuJoCo: statistical trajectory parity."""
    fly, m = models
    d = mujoco.MjData(m)
    d.qpos[:] = m.qpos0
    d.qpos[2] = 0.1278
    data = make_data(fly).replace(qpos=jnp.asarray(d.qpos.copy()))
    step = jax.jit(lambda dd: engine.step(fly, dd, solver_iterations=20,
                                          ls_iterations=12).strip())
    for _ in range(300):
        mujoco.mj_step(m, d)
        data = step(data)
    # Same qualitative state: settled at the same height, low velocity.
    assert abs(float(data.qpos[2]) - d.qpos[2]) < 0.01
    assert np.abs(np.asarray(data.qpos)[7:] - d.qpos[7:]).max() < 0.2
    assert np.linalg.norm(np.asarray(data.qvel)) < 3 * max(
        1.0, np.linalg.norm(d.qvel))
