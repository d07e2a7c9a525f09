"""Native (C++) host-side kernels, loaded via ctypes.

The library is compiled on first use (g++ is part of the toolchain); if
compilation or loading fails, callers fall back to the scipy path, so the
framework works on hosts without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SOURCE = os.path.join(os.path.dirname(__file__), "densify.cpp")
_LIBRARY = os.path.join(os.path.dirname(__file__), "libdensify.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_load_failed = False


def _build_library() -> None:
    subprocess.run(
        [
            "g++",
            "-O3",
            "-std=c++17",
            "-shared",
            "-fPIC",
            "-pthread",
            _SOURCE,
            "-o",
            _LIBRARY + ".tmp",
        ],
        check=True,
        capture_output=True,
    )
    os.replace(_LIBRARY + ".tmp", _LIBRARY)


def _load() -> ctypes.CDLL | None:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if not os.path.exists(_LIBRARY) or os.path.getmtime(
                _LIBRARY
            ) < os.path.getmtime(_SOURCE):
                _build_library()
            lib = ctypes.CDLL(_LIBRARY)
            p_f32 = ctypes.POINTER(ctypes.c_float)
            p_i32 = ctypes.POINTER(ctypes.c_int32)
            p_i64 = ctypes.POINTER(ctypes.c_int64)
            lib.csr_gather_dense_f32.argtypes = [
                p_f32, p_i32, p_i64, p_i64,
                ctypes.c_int64, ctypes.c_int64, p_f32,
            ]
            lib.csr_gather_dense_with_sums_f32.argtypes = [
                p_f32, p_i32, p_i64, p_i64,
                ctypes.c_int64, ctypes.c_int64, p_f32, p_f32,
            ]
            lib.csr_to_dense_f32.argtypes = [
                p_f32, p_i32, p_i64,
                ctypes.c_int64, ctypes.c_int64, p_f32,
            ]
            _lib = lib
        except Exception:
            _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def _csr_arrays(matrix):
    """(data f32, indices i32, indptr i64) views/copies for the C ABI,
    cached on the matrix object."""
    cached = getattr(matrix, "_native_csr_cache", None)
    if cached is not None:
        return cached
    data = np.ascontiguousarray(matrix.data, np.float32)
    indices = np.ascontiguousarray(matrix.indices, np.int32)
    indptr = np.ascontiguousarray(matrix.indptr, np.int64)
    cached = (data, indices, indptr)
    try:
        matrix._native_csr_cache = cached
    except AttributeError:
        pass
    return cached


def _ptr(array, ctype):
    return array.ctypes.data_as(ctypes.POINTER(ctype))


def csr_gather_dense(matrix, rows: np.ndarray) -> np.ndarray | None:
    """Dense float32 gather of ``matrix[rows]``; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    data, indices, indptr = _csr_arrays(matrix)
    rows = np.ascontiguousarray(rows, np.int64)
    n_rows = rows.shape[0]
    n_cols = matrix.shape[1]
    out = np.empty((n_rows, n_cols), np.float32)
    lib.csr_gather_dense_f32(
        _ptr(data, ctypes.c_float),
        _ptr(indices, ctypes.c_int32),
        _ptr(indptr, ctypes.c_int64),
        _ptr(rows, ctypes.c_int64),
        n_rows,
        n_cols,
        _ptr(out, ctypes.c_float),
    )
    return out


def csr_to_dense(matrix) -> np.ndarray | None:
    """Full float32 densification; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    data, indices, indptr = _csr_arrays(matrix)
    n_rows, n_cols = matrix.shape
    out = np.empty((n_rows, n_cols), np.float32)
    lib.csr_to_dense_f32(
        _ptr(data, ctypes.c_float),
        _ptr(indices, ctypes.c_int32),
        _ptr(indptr, ctypes.c_int64),
        n_rows,
        n_cols,
        _ptr(out, ctypes.c_float),
    )
    return out
