"""Native (C++) host-side kernels, loaded via ctypes.

Builds ``variogram.cpp`` into a shared library on first use (g++ -O3 -fopenmp)
and caches it next to the source.  Every entry point has a pure-numpy fallback
in ``inference.empirical``; :func:`available` reports whether the native path
loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "variogram.cpp")
_SO = os.path.join(_HERE, "_variogram.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        # retry without -march=native / -fopenmp for maximal portability
        for flags in (["-O3", "-shared", "-fPIC"],):
            try:
                subprocess.run(["g++", *flags, _SRC, "-o", _SO],
                               check=True, capture_output=True, timeout=120)
                return True
            except Exception:
                continue
    return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        dp = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
        lib.local_variogram_fit.argtypes = [
            dp, dp, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, dp, dp,
        ]
        lib.local_variogram_fit.restype = None
        lib.windowed_cov.argtypes = [dp, ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int64, dp]
        lib.windowed_cov.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def local_variogram_fit(x: np.ndarray, y: np.ndarray, window: int,
                        n_grid: int = 60):
    """Per-point (sigma, ell) variogram estimates; native path."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native variogram library unavailable")
    x = np.ascontiguousarray(x, np.float64)
    y = np.ascontiguousarray(y, np.float64)
    n, m = y.shape
    sig = np.empty(n)
    ell = np.empty(n)
    lib.local_variogram_fit(x, y, n, m, window, n_grid, sig, ell)
    return sig, ell


def windowed_cov(y: np.ndarray, window: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native variogram library unavailable")
    y = np.ascontiguousarray(y, np.float64)
    n, m = y.shape
    out = np.empty((n, m, m))
    lib.windowed_cov(y, n, m, window, out)
    return out
