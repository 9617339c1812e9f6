"""Native (C++) IO runtime: build-on-first-use via g++, load via ctypes.

The reference's loaders are plain C (SURVEY.md §2 R3); the TPU build keeps
host-side parsing native too because scipy's Python MatrixMarket reader is
20-50x slower on the multi-GB SuiteSparse files the SpGEMM configs use
(BASELINE.json:10). Falls back cleanly when no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "fastmtx.cpp")
_LIB = os.path.join(_HERE, "_fastmtx.so")
_lock = threading.Lock()
_lib = None
_tried = False


class MtxHeader(ctypes.Structure):
    _fields_ = [
        ("nrow", ctypes.c_int64),
        ("ncol", ctypes.c_int64),
        ("nnz", ctypes.c_int64),
        ("pattern", ctypes.c_int32),
        ("symmetric", ctypes.c_int32),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load():
    """The ctypes library handle, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.fastmtx_header.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(MtxHeader),
        ]
        lib.fastmtx_header.restype = ctypes.c_int
        lib.fastmtx_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int32,
        ]
        lib.fastmtx_read.restype = ctypes.c_int64
        _lib = lib
        return _lib


def read_mtx_native(path):
    """Parse a .mtx coordinate file natively.

    Returns (rows, cols, vals|None, shape, symmetric) or None when the
    native library is unavailable or the file is unsupported.
    """
    import numpy as np

    lib = load()
    if lib is None:
        return None
    h = MtxHeader()
    if lib.fastmtx_header(str(path).encode(), ctypes.byref(h)) != 0:
        return None
    rows = np.empty(h.nnz, np.int32)
    cols = np.empty(h.nnz, np.int32)
    vals = None if h.pattern else np.empty(h.nnz, np.float64)
    n = lib.fastmtx_read(
        str(path).encode(),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        None if vals is None else vals.ctypes.data_as(ctypes.c_void_p),
        h.nnz,
        h.pattern,
    )
    if n != h.nnz:
        return None
    if h.symmetric:
        off = rows != cols
        r0, c0 = rows, cols
        rows = np.concatenate([r0, c0[off]])
        cols = np.concatenate([c0, r0[off]])
        if vals is not None:
            vals = np.concatenate([vals, vals[off]])
    return rows, cols, vals, (int(h.nrow), int(h.ncol)), bool(h.symmetric)
