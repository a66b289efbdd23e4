"""Builds the native FTRJ loader (ftrj.cpp -> _native/libftrj.so).

Compiled lazily on first use and cached by source mtime; falls back to the
pure-numpy reader in native_store.py if no C++ toolchain is available.
"""

from __future__ import annotations

import os
import pathlib
import subprocess

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / 'ftrj.cpp'
_OUT_DIR = _DIR / '_native'
_OUT = _OUT_DIR / 'libftrj.so'


def lib_path(rebuild: bool = False) -> str | None:
    """Returns the path to libftrj.so, building if needed; None if the
    build fails (callers fall back to the numpy reader)."""
    if not rebuild and _OUT.exists() and (
            _OUT.stat().st_mtime >= _SRC.stat().st_mtime):
        return str(_OUT)
    _OUT_DIR.mkdir(exist_ok=True)
    cmd = ['g++', '-O3', '-std=c++17', '-shared', '-fPIC', '-pthread',
           str(_SRC), '-o', str(_OUT)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    return str(_OUT)


if __name__ == '__main__':
    p = lib_path(rebuild=True)
    print(p if p else 'BUILD FAILED')
