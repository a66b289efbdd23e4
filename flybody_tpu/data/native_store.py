"""ctypes bindings for the native FTRJ loader + TrajectoryStore bridge.

`load_packed(path)` is the fast path for starting a training job from a
packed dataset: C++ mmap + threaded padded-gather straight into the
(n_traj, t_max, width) numpy banks that become the device-resident
TrajectoryStore. Falls back to a numpy reader when the native library
can't be built.
"""

from __future__ import annotations

import ctypes
import json
import os

import numpy as np

from flybody_tpu.data import format as fmt


class _NativeLib:
    def __init__(self, path: str):
        lib = ctypes.CDLL(path)
        lib.ftrj_open.restype = ctypes.c_void_p
        lib.ftrj_open.argtypes = [ctypes.c_char_p]
        lib.ftrj_close.argtypes = [ctypes.c_void_p]
        lib.ftrj_num_traj.restype = ctypes.c_int64
        lib.ftrj_num_traj.argtypes = [ctypes.c_void_p]
        lib.ftrj_dtype.restype = ctypes.c_int64
        lib.ftrj_dtype.argtypes = [ctypes.c_void_p]
        lib.ftrj_field_width.restype = ctypes.c_int64
        lib.ftrj_field_width.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.ftrj_lengths.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.ftrj_json_len.restype = ctypes.c_int64
        lib.ftrj_json_len.argtypes = [ctypes.c_void_p]
        lib.ftrj_json.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.ftrj_gather_padded.restype = ctypes.c_int
        lib.ftrj_gather_padded.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int]
        lib.ftrj_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        self.lib = lib


_CACHED_LIB: _NativeLib | None = None
_TRIED = False


def _native() -> _NativeLib | None:
    global _CACHED_LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        from flybody_tpu.data import build
        p = build.lib_path()
        if p is not None:
            _CACHED_LIB = _NativeLib(p)
    return _CACHED_LIB


class FtrjReader:
    """Reads an FTRJ dataset via the C++ loader (numpy fallback)."""

    def __init__(self, path: str, n_threads: int | None = None):
        self.path = path
        self.n_threads = n_threads or min(16, os.cpu_count() or 1)
        (self.n_traj, self.lengths, fields, self.dtype, self._offsets,
         self.meta) = fmt.read_header(path)
        self.fields = dict(fields)
        nat = _native()
        self._h = None
        if nat is not None:
            h = nat.lib.ftrj_open(path.encode())
            if h:
                self._h = h
                self._lib = nat.lib
                # Cross-check the C++ parse against the Python header read.
                assert nat.lib.ftrj_num_traj(h) == self.n_traj
                meta_native = self._json_native()
                assert meta_native == self.meta, 'native JSON parse mismatch'
        if self._h is None:
            self._mm = np.memmap(path, np.uint8, mode='r')

    @property
    def native(self) -> bool:
        return self._h is not None

    def _json_native(self):
        n = self._lib.ftrj_json_len(self._h)
        buf = ctypes.create_string_buffer(n)
        self._lib.ftrj_json(self._h, buf)
        return json.loads(buf.raw.decode())

    def prefetch(self, name: str):
        if self._h is not None:
            self._lib.ftrj_prefetch(self._h, name.encode())

    def gather_padded(self, name: str, sel=None,
                      t_max: int | None = None) -> np.ndarray:
        """(n_sel, t_max, width) bank with final-frame padding."""
        if name not in self.fields:
            raise KeyError(name)
        width = self.fields[name]
        if sel is None:
            sel = np.arange(self.n_traj, dtype=np.int64)
        sel = np.ascontiguousarray(sel, np.int64)
        if t_max is None:
            t_max = int(self.lengths[sel].max())
        out = np.empty((len(sel), t_max, width), self.dtype)
        if self._h is not None:
            rc = self._lib.ftrj_gather_padded(
                self._h, name.encode(),
                sel.ctypes.data_as(ctypes.c_void_p), len(sel), t_max,
                out.ctypes.data_as(ctypes.c_void_p), self.n_threads)
            if rc != 0:
                raise RuntimeError(f'ftrj_gather_padded failed: {rc}')
        else:
            fi = list(self.fields).index(name)
            itemsize = np.dtype(self.dtype).itemsize
            for i, t in enumerate(sel):
                L = int(self.lengths[t])
                off = int(self._offsets[fi, t])
                blk = np.frombuffer(
                    self._mm, self.dtype, count=L * width,
                    offset=off).reshape(L, width)
                c = min(L, t_max)
                out[i, :c] = blk[:c]
                out[i, c:] = blk[c - 1]
        return out

    def close(self):
        if self._h is not None:
            self._lib.ftrj_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover - best effort
        try:
            self.close()
        except Exception:
            pass


def load_packed(path: str, traj_indices=None):
    """FTRJ -> device TrajectoryStore (+ site/joint names for walking).

    Returns (store, meta) where meta is the dataset sidecar dict."""
    import jax.numpy as jnp
    from flybody_tpu.envs.trajectories import TrajectoryStore

    r = FtrjReader(path)
    sel = (np.arange(r.n_traj, dtype=np.int64) if traj_indices is None
           else np.asarray(traj_indices, np.int64))
    for nm in r.fields:
        r.prefetch(nm)
    t_max = int(r.lengths[sel].max())
    qpos = r.gather_padded('qpos', sel, t_max)
    qvel = r.gather_padded('qvel', sel, t_max)
    # store_from_arrays pads qpos (and extras) with the final frame but
    # qvel with zeros; zero the padded tail to match.
    pad = np.arange(t_max)[None, :] >= r.lengths[sel][:, None]
    qvel[pad] = 0.0
    kw = {}
    if 'root2site' in r.fields:
        ns = len(r.meta.get('sites', [])) or 1
        kw['root2site'] = jnp.asarray(
            r.gather_padded('root2site', sel, t_max).reshape(
                len(sel), t_max, ns, 3))
    if 'joint_quat' in r.fields:
        nj = len(r.meta.get('joints', [])) or 1
        kw['joint_quat'] = jnp.asarray(
            r.gather_padded('joint_quat', sel, t_max).reshape(
                len(sel), t_max, nj, 4))
    store = TrajectoryStore(
        qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
        lengths=jnp.asarray(r.lengths[sel].astype(np.int32)), **kw)
    meta = r.meta
    r.close()
    return store, meta
