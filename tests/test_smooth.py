"""Parity tests for smooth dynamics (CRB/RNE/passive/fluid/actuation/Euler)
against CPU MuJoCo, contacts disabled."""

import mujoco
import numpy as np
import pytest

from flybody_tpu.model import compile as mc
from flybody_tpu.physics import smooth
from flybody_tpu.physics.state import make_data

from helpers import random_qpos, random_qvel

TOL = dict(rtol=1e-8, atol=1e-11)


@pytest.fixture(scope='module')
def models():
    return mc.build_fly_model()


@pytest.fixture(scope='module')
def models_fluid():
    """Variant with the ellipsoid fluid model active on the wing fluid geoms
    (what Flying tasks do, reference flybody/tasks/base.py:318-322)."""
    xml, assets = mc.fly_xml_and_assets()
    for name in ['wing_left_fluid', 'wing_right_fluid']:
        xml = xml.replace(
            f'<geom name="{name}" class="wing-fluid"',
            f'<geom name="{name}" class="wing-fluid" '
            'fluidshape="ellipsoid" fluidcoef="1.0 0.5 1.5 1.7 1.0"')
    return mc.build_fly_model(xml, assets)


def _setup(models, seed, vel_scale=1.0):
    fly, m = models
    # Smooth-stage parity is contact-free: disable contacts so MuJoCo's
    # adhesion transmission (which routes through contact Jacobians) is
    # inactive too. Contact/adhesion parity is tested in the solver tests.
    m.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_CONTACT
    d = mujoco.MjData(m)
    rng = np.random.RandomState(seed)
    d.qpos[:] = random_qpos(m, rng)
    d.qvel[:] = random_qvel(m, rng, vel_scale)
    d.ctrl[:] = rng.uniform(-0.2, 0.2, m.nu)
    data = make_data(fly).replace(qpos=d.qpos.copy(),
                                  qvel=d.qvel.copy(),
                                  ctrl=d.ctrl.copy())
    return fly, m, d, data


@pytest.mark.parametrize('seed', [0, 1])
def test_com_vel(models, seed):
    fly, m, d, data = _setup(models, seed)
    mujoco.mj_forward(m, d)
    data = smooth.fwd_smooth(fly, data)
    np.testing.assert_allclose(np.asarray(data.cvel), d.cvel, **TOL)
    np.testing.assert_allclose(np.asarray(data.cdof_dot), d.cdof_dot, **TOL)
    np.testing.assert_allclose(np.asarray(data.ten_velocity), d.ten_velocity,
                               **TOL)


@pytest.mark.parametrize('seed', [0, 1])
def test_mass_matrix(models, seed):
    fly, m, d, data = _setup(models, seed)
    mujoco.mj_forward(m, d)
    data = smooth.fwd_smooth(fly, data)
    M_mj = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, M_mj)
    np.testing.assert_allclose(np.asarray(data.qM), M_mj, rtol=1e-8,
                               atol=1e-14)


@pytest.mark.parametrize('seed', [0, 1])
def test_bias_passive_actuator_forces(models, seed):
    fly, m, d, data = _setup(models, seed)
    mujoco.mj_forward(m, d)
    data = smooth.fwd_smooth(fly, data)
    np.testing.assert_allclose(np.asarray(data.qfrc_bias), d.qfrc_bias, **TOL)
    ours_passive = np.asarray(data.qfrc_passive + data.qfrc_fluid)
    np.testing.assert_allclose(ours_passive, d.qfrc_passive, **TOL)
    np.testing.assert_allclose(np.asarray(data.qfrc_actuator),
                               d.qfrc_actuator, **TOL)


@pytest.mark.parametrize('seed', [0, 1])
def test_fluid_box_model(models, seed):
    fly, m, d, data = _setup(models, seed, vel_scale=5.0)
    mujoco.mj_forward(m, d)
    data = smooth.fwd_smooth(fly, data)
    np.testing.assert_allclose(np.asarray(data.qfrc_fluid), d.qfrc_fluid,
                               **TOL)
    assert np.abs(d.qfrc_fluid).max() > 0  # fluid actually active


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_fluid_ellipsoid_model(models_fluid, seed):
    fly, m, d, data = _setup(models_fluid, seed, vel_scale=5.0)
    assert any(fly.meta.geom_fluid_active)
    mujoco.mj_forward(m, d)
    data = smooth.fwd_smooth(fly, data)
    np.testing.assert_allclose(np.asarray(data.qfrc_fluid), d.qfrc_fluid,
                               **TOL)


@pytest.mark.parametrize('seed', [0, 1])
def test_qacc_smooth(models, seed):
    fly, m, d, data = _setup(models, seed)
    mujoco.mj_forward(m, d)
    assert d.ncon == 0
    data = smooth.fwd_smooth(fly, data)
    data = smooth.factor_m(fly, data)
    qacc = smooth.solve_m(fly, data, data.qfrc_smooth)
    np.testing.assert_allclose(np.asarray(qacc), d.qacc, rtol=1e-6,
                               atol=1e-6 * max(1.0, np.abs(d.qacc).max()))


def test_step_trajectory_contact_free(models):
    """Trajectory parity over 50 Euler steps with contacts disabled."""
    fly, m, d, data = _setup(models, 7, vel_scale=0.0)
    # Joint limits are constraints too; this test covers smooth dynamics
    # only (limits are exercised in the constraint-solver tests).
    m.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_LIMIT
    rng = np.random.RandomState(11)
    ctrl = rng.uniform(-0.2, 0.2, m.nu)
    d.ctrl[:] = ctrl
    data = data.replace(ctrl=ctrl.copy())
    import jax
    step = jax.jit(smooth.step_smooth)
    for _ in range(50):
        mujoco.mj_step(m, d)
        data = step(fly, data)
    np.testing.assert_allclose(np.asarray(data.qpos), d.qpos, rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(data.qvel), d.qvel, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(data.time), d.time, rtol=1e-9)
