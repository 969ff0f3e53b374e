"""Native (C++) host-side kernels, loaded via ctypes.

Self-building: the shared library is compiled with g++ -O3 on first use and
cached next to the sources (no install step, no pybind dependency).  Each
entry point has a pure-Python fallback at its call site, so the package
works without a toolchain.

Current kernels:
- ``decimate_native``: greedy cover decimation (native/decimate.cpp), the
  support-scheme setup step (reference point_sets.py:102-133) which is
  O(N^2)-ish and Python-slow for 100k+ point sets.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "..", "native")
_LIB_PATH = os.path.join(_SRC, "libdifficp_native.so")
_lock = threading.Lock()
_lib = None


def _build():
    src = os.path.join(_SRC, "decimate.cpp")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB_PATH, src,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_SRC, "decimate.cpp")
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        ):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.difficp_decimate.restype = ctypes.c_int
        lib.difficp_decimate.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return lib


def decimate_native(points: np.ndarray, r: float) -> np.ndarray:
    """Greedy cover decimation; returns kept indices (int32 array)."""
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    n, d = pts.shape
    if d > 3:
        raise ValueError("decimate_native supports d <= 3")
    out = np.empty(n, np.int32)
    n_kept = lib.difficp_decimate(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, d,
        ctypes.c_float(float(r)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out[:n_kept].copy()
