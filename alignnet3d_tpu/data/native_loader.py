"""ctypes bridge to the native batch assembler (native/loader.cpp).

Auto-builds the shared library on first use if a C++ toolchain is present
(``make -C native``); falls back to the pure-numpy path otherwise. The
native path is the production loader — one pass, counter-based PRNG, no
temporaries — replacing the reference's per-sample Python IO loop
(reference provider.py:85-136).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger("alignnet3d_tpu")

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libalignnet_loader.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True,
            capture_output=True, timeout=120,
        )
        return os.path.isfile(_SO_PATH)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.debug(f"native loader build failed: {e}")
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_SO_PATH) and not _build():
        logger.info("native loader unavailable; using numpy path")
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.loader_abi_version.restype = ctypes.c_int
    if lib.loader_abi_version() != 1:
        logger.warning("native loader ABI mismatch; using numpy path")
        return None
    lib.resample_gather.argtypes = [
        ctypes.POINTER(ctypes.c_float),   # points_flat
        ctypes.POINTER(ctypes.c_int64),   # offsets
        ctypes.POINTER(ctypes.c_int64),   # counts
        ctypes.POINTER(ctypes.c_int64),   # rows
        ctypes.c_int64,                   # batch
        ctypes.c_int64,                   # num_points
        ctypes.c_uint64,                  # seed
        ctypes.POINTER(ctypes.c_float),   # out
    ]
    lib.gather_labels.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def resample_gather(points_flat: np.ndarray, offsets: np.ndarray,
                    counts: np.ndarray, rows: np.ndarray, num_points: int,
                    seed: int, out: np.ndarray | None = None):
    """Native resample+gather; returns (B, num_points, 3) float32 or None
    when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    points_flat = np.ascontiguousarray(points_flat, np.float32)
    offsets = np.ascontiguousarray(offsets, np.int64)
    counts = np.ascontiguousarray(counts, np.int64)
    rows = np.ascontiguousarray(rows, np.int64)
    b = len(rows)
    if out is None:
        out = np.empty((b, num_points, 3), np.float32)
    lib.resample_gather(
        _ptr(points_flat, ctypes.c_float), _ptr(offsets, ctypes.c_int64),
        _ptr(counts, ctypes.c_int64), _ptr(rows, ctypes.c_int64),
        b, num_points, seed & 0xFFFFFFFFFFFFFFFF,
        _ptr(out, ctypes.c_float),
    )
    return out


def gather_labels(labels: np.ndarray, rows: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    labels = np.ascontiguousarray(labels, np.float64)
    rows = np.ascontiguousarray(rows, np.int64)
    out = np.empty((len(rows), labels.shape[1]), np.float64)
    lib.gather_labels(
        _ptr(labels, ctypes.c_double), _ptr(rows, ctypes.c_int64),
        len(rows), labels.shape[1], _ptr(out, ctypes.c_double),
    )
    return out
