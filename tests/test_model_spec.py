"""Model-invariant tests for the compiled FlyModel spec.

Mirrors the reference's exact-model-constant test strategy
(reference tests/test_flybare.py:12-36) against the TPU-native spec.
"""

import numpy as np
import pytest

from flybody_tpu.model import compile as mc
from flybody_tpu.model import spec as spec_lib

EXPECT = {
    'nq': 109,
    'nv': 108,
    'nu': 78,
    'nbody': 68,
    'njnt': 103,
    'ngeom': 159,
    'nsensor': 15,
    'nsensordata': 33,
    'nsite': 15,
    'ntendon': 8,
}

EXPECT_MASSES = {
    'fly_mass': 0.0009846214672177625,
    'head': 0.0001499089219064366,
    'thorax': 0.00034,
    'abdomen': 0.0003802050947221454,
    'leg_T1': 1.618451244357944e-05,
    'leg_T2': 1.3834187453723818e-05,
    'leg_T3': 1.841834251998194e-05,
    'wing': 8e-6,
}


@pytest.fixture(scope='module')
def fly():
    model, _ = mc.build_fly_model()
    return model


def test_model_sizes(fly):
    for k, v in EXPECT.items():
        assert getattr(fly.meta, k) == v, k


def test_masses(fly):
    meta = fly.meta
    subtree = np.asarray(fly.body_subtreemass)
    mass = np.asarray(fly.body_mass)
    assert np.isclose(subtree[meta.name2id('body', 'thorax')],
                      EXPECT_MASSES['fly_mass'])
    assert np.isclose(subtree[meta.name2id('body', 'head')],
                      EXPECT_MASSES['head'])
    assert np.isclose(mass[meta.name2id('body', 'thorax')],
                      EXPECT_MASSES['thorax'])
    assert np.isclose(subtree[meta.name2id('body', 'abdomen')],
                      EXPECT_MASSES['abdomen'])
    for side in ['left', 'right']:
        for seg in ['T1', 'T2', 'T3']:
            assert np.isclose(subtree[meta.name2id('body', f'coxa_{seg}_{side}')],
                              EXPECT_MASSES[f'leg_{seg}'])
        assert np.isclose(mass[meta.name2id('body', f'wing_{side}')],
                          EXPECT_MASSES['wing'])


def test_position_actuator_ctrlrange_matches_joint_range(fly):
    meta = fly.meta
    ctrlrange = np.asarray(fly.actuator_ctrlrange)
    jnt_range = np.asarray(fly.jnt_range)
    checked = 0
    for u in range(meta.nu):
        if (meta.actuator_trntype[u] == spec_lib.TRN_JOINT
                and meta.actuator_biastype[u] == spec_lib.BIAS_AFFINE):
            j = meta.actuator_trnid[u]
            assert meta.actuator_names[u] == meta.jnt_names[j]
            np.testing.assert_array_equal(ctrlrange[u], jnt_range[j])
            checked += 1
    assert checked > 0


def test_save_load_roundtrip(fly, tmp_path):
    path = str(tmp_path / 'fly.npz')
    spec_lib.save(path, fly)
    loaded = spec_lib.load(path)
    assert loaded.meta == fly.meta
    np.testing.assert_allclose(np.asarray(loaded.body_pos),
                               np.asarray(fly.body_pos))
    np.testing.assert_allclose(np.asarray(loaded.actuator_moment),
                               np.asarray(fly.actuator_moment))


def test_tendon_matrices(fly):
    # 8 fixed tendons; abdomen tendons couple 7 joints with coef 1,
    # tarsus tendons couple 4 joints with coefs (1, .5, .5, .5)
    # (fruitfly.xml:762-818).
    ten_J = np.asarray(fly.ten_J)
    assert ten_J.shape == (8, fly.nv)
    counts = (ten_J != 0).sum(axis=1)
    assert sorted(counts.tolist()) == [4, 4, 4, 4, 4, 4, 7, 7]
    sums = ten_J.sum(axis=1)
    assert set(np.round(sums, 6)) == {7.0, 2.5}
