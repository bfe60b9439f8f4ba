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


# ---------------------------------------------------------------------------
# Fast long-format CSV parser (csv_loader.cpp) — the hot path behind
# data.io.load_long_csv; the csv-module Python path remains the exact
# fallback (quoted files, build failures).
# ---------------------------------------------------------------------------

_CSV_SRC = os.path.join(_HERE, "csv_loader.cpp")
_CSV_SO = os.path.join(_HERE, "_csv_loader.so")
_csv_lib = None
_csv_tried = False


def _build_csv() -> bool:
    for flags in (["-O3", "-march=native", "-shared", "-fPIC"],
                  ["-O3", "-shared", "-fPIC"]):
        try:
            subprocess.run(["g++", *flags, _CSV_SRC, "-o", _CSV_SO],
                           check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            continue
    return False


def _load_csv():
    global _csv_lib, _csv_tried
    with _lock:
        if _csv_lib is not None or _csv_tried:
            return _csv_lib
        _csv_tried = True
        if (not os.path.exists(_CSV_SO)
                or os.path.getmtime(_CSV_SO) < os.path.getmtime(_CSV_SRC)):
            if not _build_csv():
                return None
        try:
            lib = ctypes.CDLL(_CSV_SO)
        except OSError:
            return None
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
            ctypes.c_longlong, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.parse_long_csv.restype = ctypes.c_longlong
        _csv_lib = lib
        return _csv_lib


def csv_available() -> bool:
    return _load_csv() is not None


def parse_long_csv(path: str, time_col: int, task_col: int, value_col: int,
                   subject_col: int):
    """Native long-format CSV parse.

    Returns ``(times, values, task_codes, subj_codes, task_table,
    subj_table)`` — integer codes per row plus the first-seen unique label
    tables (so no per-row Python strings are ever materialized) — or ``None``
    when the native path cannot serve the file (library unavailable,
    unreadable, or quoted CSV — callers fall back to the exact csv-module
    path).  Raises ValueError with the 1-based physical line for unparsable
    or non-finite numeric cells, matching the Python path's messages.
    """
    lib = _load_csv()
    if lib is None:
        return None
    rows_cap = lib.csv_row_count(path.encode())
    if rows_cap < 0:
        return None
    rows_cap = max(int(rows_cap), 1)
    arena_cap = os.path.getsize(path) + 16
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
    err_kind = ctypes.c_int32()
    n = lib.parse_long_csv(
        path.encode(), time_col, task_col, value_col, subject_col,
        times, values, task_codes, subj_codes,
        task_arena, arena_cap, ctypes.byref(t_len), ctypes.byref(n_tasks),
        subj_arena, arena_cap, ctypes.byref(s_len), ctypes.byref(n_subj),
        rows_cap, ctypes.byref(err_kind),
    )
    if n in (-1, -2):
        return None  # unreadable / quoted: exact Python fallback
    if n < 0:
        line = -n
        if err_kind.value == 2:
            raise ValueError(f"{path} line {line}: non-finite time/value cell")
        raise ValueError(
            f"{path} line {line}: cannot parse time/value cell; "
            "clean or drop the row"
        )
    n = int(n)
    task_table = bytes(task_arena.raw[: t_len.value]).decode().split("\0")[:-1]
    subj_table = (
        bytes(subj_arena.raw[: s_len.value]).decode().split("\0")[:-1]
        if subject_col >= 0 else [0]
    )
    return (times[:n].copy(), values[:n].copy(), task_codes[:n].copy(),
            subj_codes[:n].copy(), task_table, subj_table)
