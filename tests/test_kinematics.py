"""Stage-wise parity tests: position-stage pipeline vs CPU MuJoCo."""

import mujoco
import numpy as np
import pytest

from flybody_tpu.model import compile as mc
from flybody_tpu.physics import kinematics as kin
from flybody_tpu.physics.state import make_data

from helpers import random_qpos, quat_sign_align

TOL = dict(rtol=1e-9, atol=1e-9)


@pytest.fixture(scope='module')
def models():
    return mc.build_fly_model()


def _run_both(models, seed):
    fly, m = models
    d = mujoco.MjData(m)
    rng = np.random.RandomState(seed)
    d.qpos[:] = random_qpos(m, rng)
    mujoco.mj_kinematics(m, d)
    mujoco.mj_comPos(m, d)
    mujoco.mj_tendon(m, d)

    data = make_data(fly).replace(qpos=d.qpos.copy())
    data, xanchor, xaxis = kin.fwd_position_smooth(fly, data)
    return fly, m, d, data, np.asarray(xanchor), np.asarray(xaxis)


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_body_poses(models, seed):
    _, m, d, data, _, _ = _run_both(models, seed)
    np.testing.assert_allclose(np.asarray(data.xpos), d.xpos, **TOL)
    np.testing.assert_allclose(
        quat_sign_align(np.asarray(data.xquat), d.xquat), d.xquat, **TOL)
    np.testing.assert_allclose(np.asarray(data.xipos), d.xipos, **TOL)
    np.testing.assert_allclose(
        np.asarray(data.ximat).reshape(m.nbody, 9), d.ximat, **TOL)


@pytest.mark.parametrize('seed', [0, 1])
def test_geom_site_poses(models, seed):
    _, m, d, data, _, _ = _run_both(models, seed)
    np.testing.assert_allclose(np.asarray(data.geom_xpos), d.geom_xpos, **TOL)
    np.testing.assert_allclose(
        np.asarray(data.geom_xmat).reshape(m.ngeom, 9), d.geom_xmat, **TOL)
    np.testing.assert_allclose(np.asarray(data.site_xpos), d.site_xpos, **TOL)
    np.testing.assert_allclose(
        np.asarray(data.site_xmat).reshape(m.nsite, 9), d.site_xmat, **TOL)


@pytest.mark.parametrize('seed', [0, 1])
def test_joint_anchors_axes(models, seed):
    _, m, d, data, xanchor, xaxis = _run_both(models, seed)
    np.testing.assert_allclose(xanchor, d.xanchor, **TOL)
    np.testing.assert_allclose(xaxis, d.xaxis, **TOL)


@pytest.mark.parametrize('seed', [0, 1])
def test_com_quantities(models, seed):
    _, m, d, data, _, _ = _run_both(models, seed)
    np.testing.assert_allclose(np.asarray(data.subtree_com), d.subtree_com,
                               **TOL)
    np.testing.assert_allclose(np.asarray(data.cdof), d.cdof, **TOL)
    # cinert: compare via inertia-vector products against mju_mulInertVec.
    rng = np.random.RandomState(100 + seed)
    v = rng.randn(6)
    ours = np.asarray(data.cinert) @ v
    theirs = np.zeros((m.nbody, 6))
    w, u = v[:3], v[3:]
    for b in range(m.nbody):
        # Packed cinert layout: inertia upper triangle (xx,yy,zz,xy,xz,yz),
        # mass*com offset (3), mass (1).
        c = d.cinert[b]
        imat = np.array([[c[0], c[3], c[4]],
                         [c[3], c[1], c[5]],
                         [c[4], c[5], c[2]]])
        h = c[6:9]  # mass * com offset
        mass = c[9]
        theirs[b, :3] = imat @ w + np.cross(h, u)
        theirs[b, 3:] = mass * u - np.cross(h, w)
    np.testing.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-12)


def test_tendon_length(models):
    _, m, d, data, _, _ = _run_both(models, 3)
    np.testing.assert_allclose(np.asarray(data.ten_length), d.ten_length,
                               **TOL)
