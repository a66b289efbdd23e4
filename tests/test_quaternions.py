"""Quaternion library parity vs MuJoCo's quaternion utilities
(the reference library, flybody/quaternions.py, ports the same math)."""

import mujoco
import numpy as np
import pytest

from flybody_tpu.utils import quaternions as quat

RNG = np.random.RandomState(0)


def _rand_quat():
    q = RNG.randn(4)
    return q / np.linalg.norm(q)


@pytest.mark.parametrize('trial', range(5))
def test_mult_rotate(trial):
    q1, q2 = _rand_quat(), _rand_quat()
    out = np.zeros(4)
    mujoco.mju_mulQuat(out, q1, q2)
    np.testing.assert_allclose(np.asarray(quat.mult_quat(q1, q2)), out,
                               atol=1e-12)
    v = RNG.randn(3)
    rv = np.zeros(3)
    mujoco.mju_rotVecQuat(rv, v, q1)
    np.testing.assert_allclose(np.asarray(quat.rotate_vec_with_quat(v, q1)),
                               rv, atol=1e-12)


def test_mat_quat_roundtrip():
    for _ in range(10):
        q = _rand_quat()
        R = np.asarray(quat.quat_to_mat(q))
        Rmj = np.zeros(9)
        mujoco.mju_quat2Mat(Rmj, q)
        np.testing.assert_allclose(R.ravel(), Rmj, atol=1e-12)
        q2 = np.asarray(quat.mat_to_quat(R))
        np.testing.assert_allclose(q2 * np.sign(q2[0]), q * np.sign(q[0]),
                                   atol=1e-10)


def test_axis_angle():
    axis = np.array([0.0, 0.0, 1.0])
    q = np.asarray(quat.axis_angle_to_quat(axis, np.pi / 2))
    qmj = np.zeros(4)
    mujoco.mju_axisAngle2Quat(qmj, axis, np.pi / 2)
    np.testing.assert_allclose(q, qmj, atol=1e-12)
    aa = np.asarray(quat.quat_to_axis_angle(q))
    np.testing.assert_allclose(aa, axis * np.pi / 2, atol=1e-12)


def test_integrate_quat_matches_mj():
    for _ in range(5):
        q = _rand_quat()
        w = RNG.randn(3)
        dt = 0.01
        ours = np.asarray(quat.integrate_quat(q, w, dt))
        mj = q.copy()
        mujoco.mju_quatIntegrate(mj, w, dt)
        np.testing.assert_allclose(ours * np.sign(ours[0]),
                                   mj * np.sign(mj[0]), atol=1e-9)


def test_quat_dist_short_arc():
    q = _rand_quat()
    assert abs(float(quat.quat_dist_short_arc(q, q))) < 1e-6
    assert abs(float(quat.quat_dist_short_arc(q, -q))) < 1e-6  # same rotation
    qz = np.asarray(quat.axis_angle_to_quat(np.array([0.0, 0, 1]), 0.3))
    qi = np.array([1.0, 0, 0, 0])
    np.testing.assert_allclose(float(quat.quat_dist_short_arc(qi, qz)), 0.3,
                               atol=1e-9)


def test_egocentric_and_dquat():
    root_q = _rand_quat()
    root_p = RNG.randn(3)
    world = RNG.randn(4, 3)
    ego = np.asarray(quat.get_egocentric_vec(root_p, world, root_q))
    # Back-transform recovers the world vectors.
    back = np.asarray(quat.rotate_vec_with_quat(ego, root_q)) + root_p
    np.testing.assert_allclose(back, world, atol=1e-12)
    q2 = _rand_quat()
    dq = np.asarray(quat.get_dquat_local(root_q, q2))
    recomposed = np.asarray(quat.mult_quat(root_q, dq))
    np.testing.assert_allclose(recomposed * np.sign(recomposed[0]),
                               q2 * np.sign(q2[0]), atol=1e-12)


def test_quat_seq_to_angvel():
    # Constant rotation about z at 2 rad/s.
    dt = 0.01
    T = 20
    qs = np.zeros((T, 4))
    for t in range(T):
        qs[t] = np.asarray(quat.axis_angle_to_quat(np.array([0.0, 0, 1]),
                                                   2.0 * dt * t))
    w = np.asarray(quat.quat_seq_to_angvel(qs, dt))
    np.testing.assert_allclose(w, np.tile([0, 0, 2.0], (T - 1, 1)),
                               atol=1e-9)
