"""ctypes bindings for the native host ops (rnnpose_tpu/cpp/native_ops.cpp).

Auto-builds the shared library on first import if a compiler is available;
`available()` gates the fast path so the numpy implementations in
`data/pyramid.py` remain the fallback.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "grid_subsample", "radius_neighbors", "build", "lib_path"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "native_ops.cpp")
_LIB = os.path.join(_DIR, "libnative_ops.so")
_lock = threading.Lock()
_lib = None
_tried = False


def lib_path() -> str:
    return _LIB


def build(force: bool = False) -> bool:
    """Compile the shared library. Returns True on success."""
    if os.path.exists(_LIB) and not force:
        if not force and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return True
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-std=c++17", "-shared",
                "-fPIC", _SRC, "-o", _LIB,
            ],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.grid_subsample.restype = ctypes.c_int
        lib.grid_subsample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.radius_neighbors.restype = None
        lib.radius_neighbors.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_float, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def grid_subsample(points: np.ndarray, dl: float) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty_like(pts)
    m = lib.grid_subsample(_fptr(pts), len(pts), ctypes.c_float(dl), _fptr(out))
    return out[:m].copy()


def radius_neighbors(
    queries: np.ndarray, supports: np.ndarray, radius: float, max_neighbors: int
) -> np.ndarray:
    lib = _load()
    q = np.ascontiguousarray(queries, np.float32)
    s = np.ascontiguousarray(supports, np.float32)
    out = np.empty((len(q), max_neighbors), np.int32)
    lib.radius_neighbors(
        _fptr(q), len(q), _fptr(s), len(s), ctypes.c_float(radius),
        ctypes.c_int32(max_neighbors),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
