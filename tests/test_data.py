"""FTRJ packed dataset format + native loader."""

import numpy as np
import pytest

from flybody_tpu.data import format as fmt
from flybody_tpu.data import native_store


@pytest.fixture(scope='module')
def ftrj_path(tmp_path_factory):
    rng = np.random.RandomState(0)
    qpos = [rng.randn(50, 9), rng.randn(40, 9), rng.randn(30, 9)]
    qvel = [rng.randn(50, 8), rng.randn(40, 8), rng.randn(30, 8)]
    path = tmp_path_factory.mktemp('ftrj') / 'toy.ftrj'
    fmt.write_ftrj(str(path), {'qpos': qpos, 'qvel': qvel},
                   {'timestep': 0.002, 'tag': 'toy'})
    return str(path), qpos, qvel


def test_header_roundtrip(ftrj_path):
    path, qpos, _ = ftrj_path
    n, lengths, fields, dtype, _, meta = fmt.read_header(path)
    assert n == 3
    assert lengths.tolist() == [50, 40, 30]
    assert dict(fields) == {'qpos': 9, 'qvel': 8}
    assert dtype == np.float64
    assert meta == {'timestep': 0.002, 'tag': 'toy'}


def test_gather_padded_matches_source(ftrj_path):
    path, qpos, qvel = ftrj_path
    r = native_store.FtrjReader(path)
    bank = r.gather_padded('qpos')
    assert bank.shape == (3, 50, 9)
    for i, q in enumerate(qpos):
        np.testing.assert_array_equal(bank[i, :q.shape[0]], q)
        # final-frame padding
        np.testing.assert_array_equal(
            bank[i, q.shape[0]:], np.tile(q[-1], (50 - q.shape[0], 1)))
    # subset + custom t_max
    sub = r.gather_padded('qvel', sel=np.array([2, 0]), t_max=35)
    assert sub.shape == (2, 35, 8)
    np.testing.assert_array_equal(sub[0, :30], qvel[2])
    np.testing.assert_array_equal(sub[1], qvel[0][:35])
    r.close()


def test_numpy_fallback_identical(ftrj_path):
    path, _, _ = ftrj_path
    r = native_store.FtrjReader(path)
    a = r.gather_padded('qpos')
    if r.native:
        # Force the numpy path and compare.
        h, r._h = r._h, None
        r._mm = np.memmap(path, np.uint8, mode='r')
        b = r.gather_padded('qpos')
        r._h = h
        np.testing.assert_array_equal(a, b)
    r.close()


def test_bad_magic_rejected(tmp_path, ftrj_path):
    path, _, _ = ftrj_path
    bad = tmp_path / 'bad.ftrj'
    data = open(path, 'rb').read()
    bad.write_bytes(b'XXXX' + data[4:])
    with pytest.raises(ValueError):
        native_store.FtrjReader(str(bad))


def test_pack_walking_hdf5_matches_h5py_loader(tmp_path):
    from flybody_tpu.envs import fly_envs
    from flybody_tpu.envs import trajectories as traj_lib
    from flybody_tpu.tools import make_test_dataset as mkds
    model = fly_envs._walking_model(False, True, 0.01)
    h5 = tmp_path / 'walk.h5'
    mkds.make_walking_dataset(str(h5), model, n_traj=2, n_steps=60)
    out = fmt.pack_walking_hdf5(str(h5), str(tmp_path / 'walk.ftrj'))
    store_n, meta = native_store.load_packed(out)
    store_h, sites, joints = traj_lib.load_walking_hdf5(str(h5))
    assert meta['sites'] == sites and meta['joints'] == joints
    for f in ('qpos', 'qvel', 'lengths', 'root2site', 'joint_quat'):
        np.testing.assert_array_equal(np.asarray(getattr(store_n, f)),
                                      np.asarray(getattr(store_h, f)))
