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
_lock = threading.Lock()


def _compile(src: str, so: str, openmp: bool = False) -> bool:
    """g++ with a portability fallback flag ladder; caches next to src."""
    ladders = [["-O3", "-march=native", "-shared", "-fPIC"],
               ["-O3", "-shared", "-fPIC"]]
    if openmp:
        ladders.insert(0, ["-O3", "-march=native", "-fopenmp", "-shared",
                           "-fPIC"])
    for flags in ladders:
        try:
            subprocess.run(["g++", *flags, src, "-o", so],
                           check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            continue
    return False


class _LazyLib:
    """Build-on-first-use ctypes library with one shared scaffold
    (mtime staleness check, lock, tried-once caching, binder hook)."""

    def __init__(self, src_name: str, so_name: str, bind, openmp: bool = False):
        self.src = os.path.join(_HERE, src_name)
        self.so = os.path.join(_HERE, so_name)
        self.bind = bind
        self.openmp = openmp
        self.lib = None
        self.tried = False

    def load(self):
        with _lock:
            if self.lib is not None or self.tried:
                return self.lib
            self.tried = True
            if (not os.path.exists(self.so)
                    or os.path.getmtime(self.so) < os.path.getmtime(self.src)):
                if not _compile(self.src, self.so, openmp=self.openmp):
                    return None
            try:
                lib = ctypes.CDLL(self.so)
            except OSError:
                return None
            self.bind(lib)
            self.lib = lib
            return self.lib


def _bind_variogram(lib):
    dp = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
    lib.local_variogram_fit.argtypes = [
        dp, dp, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, dp, dp,
    ]
    lib.local_variogram_fit.restype = None
    lib.windowed_cov.argtypes = [dp, ctypes.c_int64, ctypes.c_int64,
                                 ctypes.c_int64, dp]
    lib.windowed_cov.restype = None


_variogram = _LazyLib("variogram.cpp", "_variogram.so", _bind_variogram,
                      openmp=True)


def _load():
    return _variogram.load()


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


# ---------------------------------------------------------------------------
# Fast long-format CSV parser (csv_loader.cpp) — the hot path behind
# data.io.load_long_csv; the csv-module Python path remains the exact
# fallback (quoted files, build failures).
# ---------------------------------------------------------------------------

def _bind_csv(lib):
    dp = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
    ip = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
    lib.csv_row_count.argtypes = [ctypes.c_char_p]
    lib.csv_row_count.restype = ctypes.c_longlong
    lib.parse_long_csv.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, dp, dp, ip, ip,
        ctypes.c_char_p, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_char_p, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_longlong,
    ]
    lib.parse_long_csv.restype = ctypes.c_longlong


_csv = _LazyLib("csv_loader.cpp", "_csv_loader.so", _bind_csv)

#: label-arena ceiling: labels are a tiny subset of any real table; files
#: whose unique labels exceed this fall back to the Python path rather than
#: committing O(file size) zero-filled buffers per arena
_CSV_ARENA_CAP = 64 << 20


def csv_available() -> bool:
    return _csv.load() is not None


def parse_long_csv(path: str, time_col: int, task_col: int, value_col: int,
                   subject_col: int):
    """Native long-format CSV parse.

    Returns ``(times, values, task_codes, subj_codes, task_table,
    subj_table)`` — integer codes per row plus the first-seen unique label
    tables (so no per-row Python strings are ever materialized) — or ``None``
    whenever the native path cannot serve the file faithfully: library
    unavailable, unreadable, quoted CSV, any numeric cell strtod would treat
    differently from ``float()``, non-UTF-8 labels, or arena overflow.  The
    caller's csv-module path is the single source of truth for errors — this
    function never raises on file content.
    """
    lib = _csv.load()
    if lib is None:
        return None
    rows_cap = lib.csv_row_count(path.encode())
    if rows_cap < 0:
        return None
    rows_cap = max(int(rows_cap), 1)
    arena_cap = min(os.path.getsize(path) + 16, _CSV_ARENA_CAP)
    times = np.empty(rows_cap, np.float64)
    values = np.empty(rows_cap, np.float64)
    task_codes = np.empty(rows_cap, np.int32)
    subj_codes = np.empty(rows_cap, np.int32)
    task_arena = ctypes.create_string_buffer(arena_cap)
    subj_arena = ctypes.create_string_buffer(arena_cap)
    t_len = ctypes.c_longlong()
    s_len = ctypes.c_longlong()
    n_tasks = ctypes.c_int32()
    n_subj = ctypes.c_int32()
    n = lib.parse_long_csv(
        path.encode(), time_col, task_col, value_col, subject_col,
        times, values, task_codes, subj_codes,
        task_arena, arena_cap, ctypes.byref(t_len), ctypes.byref(n_tasks),
        subj_arena, arena_cap, ctypes.byref(s_len), ctypes.byref(n_subj),
        rows_cap,
    )
    if n < 0:
        return None  # anything the native path cannot serve: Python fallback
    n = int(n)
    try:
        task_table = (
            bytes(task_arena.raw[: t_len.value]).decode().split("\0")[:-1]
        )
        subj_table = (
            bytes(subj_arena.raw[: s_len.value]).decode().split("\0")[:-1]
            if subject_col >= 0 else [0]
        )
    except UnicodeDecodeError:
        return None  # non-UTF-8 labels: locale-aware Python path handles them
    return (times[:n].copy(), values[:n].copy(), task_codes[:n].copy(),
            subj_codes[:n].copy(), task_table, subj_table)
