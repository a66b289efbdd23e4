"""FTRJ: flat binary trajectory dataset format.

The reference serves mocap snippets from HDF5 via h5py (C library) with
per-episode Python-side reads (flybody/tasks/trajectory_loaders.py). For
the TPU framework the datasets are uploaded to device once per job, so the
host path that matters is: open -> pad into contiguous banks -> upload.
FTRJ is an mmap-friendly layout for exactly that: all frames of a field
stored contiguously, with a per-trajectory offset table, so the C++ loader
(ftrj.cpp) can build the padded (N, Tmax, D) banks with threaded memcpy
and zero intermediate copies.

Layout (little-endian):
  header:
    magic   'FTRJ'            (4 bytes)
    version uint32 = 1
    n_traj  uint32
    n_field uint32
    dtype   uint32            0 = float32, 1 = float64
    reserved uint32 * 3
  lengths  int64[n_traj]      frames per trajectory
  fields   n_field * { name char[32]; int64 width }   per-frame flat width
  offsets  int64[n_field][n_traj]   byte offset of each trajectory's block
  data     raw blobs, frame-major within a trajectory

Scalar metadata (timestep) and name lists ride in a JSON sidecar footer:
  int64 json_len, then json bytes at EOF.
"""

from __future__ import annotations

import json
import struct

import numpy as np

MAGIC = b'FTRJ'
VERSION = 1
_DTYPES = {0: np.float32, 1: np.float64}
_DTYPE_IDS = {np.dtype(np.float32): 0, np.dtype(np.float64): 1}
_HEADER = struct.Struct('<4s7I')


def write_ftrj(path: str, fields: dict[str, list[np.ndarray]],
               meta: dict | None = None, dtype=np.float64) -> str:
    """Writes trajectories to FTRJ.

    Args:
        fields: field name -> list of per-trajectory (T_i, ...) arrays.
            All fields must agree on each trajectory's frame count T_i.
        meta: JSON-serializable sidecar (timestep, site/joint names, ...).
    """
    names = list(fields)
    n_field = len(names)
    n_traj = len(fields[names[0]])
    lengths = np.array([a.shape[0] for a in fields[names[0]]], np.int64)
    for nm in names:
        if len(fields[nm]) != n_traj:
            raise ValueError(f'field {nm}: trajectory count mismatch')
        for i, a in enumerate(fields[nm]):
            if a.shape[0] != lengths[i]:
                raise ValueError(f'field {nm} traj {i}: frame mismatch')
    widths = {nm: int(np.prod(fields[nm][0].shape[1:], dtype=np.int64))
              for nm in names}
    dt = np.dtype(dtype)
    itemsize = dt.itemsize

    header = _HEADER.pack(MAGIC, VERSION, n_traj, n_field,
                          _DTYPE_IDS[dt], 0, 0, 0)
    field_table = b''
    for nm in names:
        enc = nm.encode()
        if len(enc) > 31:
            raise ValueError(f'field name too long: {nm}')
        field_table += enc.ljust(32, b'\0') + struct.pack(
            '<q', widths[nm])

    data_start = (len(header) + 8 * n_traj + len(field_table)
                  + 8 * n_field * n_traj)
    offsets = np.zeros((n_field, n_traj), np.int64)
    pos = data_start
    for fi, nm in enumerate(names):
        for ti in range(n_traj):
            pos = (pos + 63) & ~63  # 64-byte align each block
            offsets[fi, ti] = pos
            pos += int(lengths[ti]) * widths[nm] * itemsize

    with open(path, 'wb') as f:
        f.write(header)
        f.write(lengths.tobytes())
        f.write(field_table)
        f.write(offsets.tobytes())
        for fi, nm in enumerate(names):
            for ti in range(n_traj):
                f.seek(offsets[fi, ti])
                f.write(np.ascontiguousarray(
                    fields[nm][ti], dtype=dt).tobytes())
        f.seek(pos)
        js = json.dumps(meta or {}).encode()
        f.write(js)
        f.write(struct.pack('<q', len(js)))
    return path


def read_header(path: str):
    """Parses the FTRJ header; returns (n_traj, lengths, fields, dtype,
    offsets, meta) without touching the data blobs."""
    with open(path, 'rb') as f:
        head = f.read(_HEADER.size)
        magic, version, n_traj, n_field, dt_id, *_ = _HEADER.unpack(head)
        if magic != MAGIC or version != VERSION:
            raise ValueError(f'not an FTRJ v{VERSION} file: {path}')
        lengths = np.frombuffer(f.read(8 * n_traj), np.int64)
        fields = []
        for _ in range(n_field):
            raw = f.read(40)
            name = raw[:32].rstrip(b'\0').decode()
            (width,) = struct.unpack('<q', raw[32:])
            fields.append((name, int(width)))
        offsets = np.frombuffer(
            f.read(8 * n_field * n_traj), np.int64).reshape(
            n_field, n_traj)
        f.seek(-8, 2)
        (json_len,) = struct.unpack('<q', f.read(8))
        f.seek(-8 - json_len, 2)
        meta = json.loads(f.read(json_len).decode())
    return n_traj, lengths, fields, _DTYPES[dt_id], offsets, meta


def pack_walking_hdf5(h5_path: str, out_path: str) -> str:
    """Converts a reference walking HDF5 dataset
    (trajectory_loaders.py:185-264 layout) into FTRJ."""
    import h5py
    fields = {'qpos': [], 'qvel': [], 'root2site': [], 'joint_quat': []}
    with h5py.File(h5_path, 'r') as f:
        n = len(f['trajectories'])
        nz = len(str(n))
        lens = f['trajectory_lengths'][()]
        for idx in range(n):
            s = f['trajectories'][str(idx).zfill(nz)]
            L = int(lens[idx])
            qpos = np.concatenate(
                [s['root_qpos'][:L], s['qpos'][:L]], axis=1)
            qpos[:, :2] -= qpos[0, :2]  # re-zero xy (loader semantics)
            fields['qpos'].append(qpos)
            fields['qvel'].append(np.concatenate(
                [s['root_qvel'][:L], s['qvel'][:L]], axis=1))
            fields['root2site'].append(s['root2site'][:L])
            fields['joint_quat'].append(s['joint_quat'][:L])
        meta = {
            'kind': 'walking',
            'timestep': float(f['timestep_seconds'][()]),
            'sites': [x.decode() for x in f['id2name']['sites']],
            'joints': [x.decode() for x in f['id2name']['joints']],
        }
    return write_ftrj(out_path, fields, meta)


def pack_flight_hdf5(h5_path: str, out_path: str) -> str:
    """Converts a reference flight HDF5 dataset into FTRJ (root qpos/qvel,
    com->root converted like the loader, trajectory_loaders.py:96-141)."""
    import h5py
    from flybody_tpu.envs.trajectories import com2root
    fields = {'qpos': [], 'qvel': []}
    with h5py.File(h5_path, 'r') as f:
        n = len(f['trajectories'])
        nz = len(str(n))
        for idx in range(n):
            s = f['trajectories'][str(idx).zfill(nz)]
            com_qpos = s['com_qpos'][()]
            com_qvel = s['com_qvel'][()]
            com_qpos[:, :2] -= com_qpos[0, :2]
            root = com2root(com_qpos[:, :3], com_qpos[:, 3:])
            fields['qpos'].append(
                np.concatenate([root, com_qpos[:, 3:]], axis=1))
            fields['qvel'].append(com_qvel)
        meta = {'kind': 'flight',
                'timestep': float(f['timestep_seconds'][()])}
    return write_ftrj(out_path, fields, meta)
