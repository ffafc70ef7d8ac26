"""ctypes bindings for the native host-side preprocessing library.

Compiles ``native/gncde_native.cpp`` on demand (cached under ``build/``) and
exposes typed wrappers; every entry point has a numpy fallback so the
framework works without a toolchain. See native/gncde_native.cpp for scope.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
import typing as tp
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = Path(__file__).resolve().parent.parent
_SRC = _REPO_ROOT / "native" / "gncde_native.cpp"
_BUILD_DIR = _REPO_ROOT / "build"
_LIB_PATH = _BUILD_DIR / "libgncde_native.so"

_lock = threading.Lock()
_lib: tp.Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> tp.Optional[Path]:
    if not _SRC.exists():
        return None
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    if _LIB_PATH.exists() and _LIB_PATH.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB_PATH
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception as e:  # noqa: BLE001 - fall back to numpy
        logger.info("native build failed (%s); using numpy fallbacks", e)
        return None


def get_lib() -> tp.Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _compile()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(str(path))
            i64 = ctypes.c_int64
            P = ctypes.POINTER
            lib.gncde_build_ell.argtypes = [
                P(ctypes.c_int64), P(ctypes.c_int64), P(ctypes.c_float),
                i64, i64, i64, P(ctypes.c_int32), P(ctypes.c_float),
                P(ctypes.c_int64),
            ]
            lib.gncde_dense_adj.argtypes = [
                P(ctypes.c_int64), P(ctypes.c_int64), P(ctypes.c_float),
                i64, i64, P(ctypes.c_float),
            ]
            lib.gncde_degrees.argtypes = [P(ctypes.c_int64), i64, i64, P(ctypes.c_int64)]
            lib.gncde_hermite_coeffs.argtypes = [
                P(ctypes.c_double), P(ctypes.c_float), i64, i64,
                P(ctypes.c_float), P(ctypes.c_float), P(ctypes.c_float),
                P(ctypes.c_float),
            ]
            lib.gncde_bcsr_pattern.argtypes = [
                P(ctypes.c_int64), P(ctypes.c_int64), i64, i64, i64,
                P(ctypes.c_uint8),
            ]
            lib.gncde_bcsr_scatter.argtypes = [
                P(ctypes.c_int64), P(ctypes.c_int64), P(ctypes.c_float),
                i64, i64, i64, i64, P(ctypes.c_int32), P(ctypes.c_float),
            ]
            _lib = lib
        except Exception as e:  # noqa: BLE001
            logger.info("native load failed (%s); using numpy fallbacks", e)
            _lib = None
        return _lib


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def build_ell_native(
    src: np.ndarray, dst: np.ndarray, w: tp.Optional[np.ndarray], n: int,
    max_degree: tp.Optional[int] = None,
):
    """Edge list -> (indices, values) ELL arrays; None when native missing."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    wf = (
        np.ascontiguousarray(w, dtype=np.float32)
        if w is not None
        else np.ones(len(src), dtype=np.float32)
    )
    degs = np.zeros(n, dtype=np.int64)
    lib.gncde_degrees(_ptr(src, ctypes.c_int64), len(src), n, _ptr(degs, ctypes.c_int64))
    K = int(max_degree or max(int(degs.max()) if n else 1, 1))
    indices = np.full((n, K), n, dtype=np.int32)
    values = np.zeros((n, K), dtype=np.float32)
    slots = np.zeros(n, dtype=np.int64)
    lib.gncde_build_ell(
        _ptr(src, ctypes.c_int64), _ptr(dst, ctypes.c_int64),
        _ptr(wf, ctypes.c_float), len(src), n, K,
        _ptr(indices, ctypes.c_int32), _ptr(values, ctypes.c_float),
        _ptr(slots, ctypes.c_int64),
    )
    return indices, values


def dense_adj_native(
    src: np.ndarray, dst: np.ndarray, w: tp.Optional[np.ndarray], n: int
) -> tp.Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    wf = (
        np.ascontiguousarray(w, dtype=np.float32)
        if w is not None
        else np.ones(len(src), dtype=np.float32)
    )
    A = np.zeros((n, n), dtype=np.float32)
    lib.gncde_dense_adj(
        _ptr(src, ctypes.c_int64), _ptr(dst, ctypes.c_int64),
        _ptr(wf, ctypes.c_float), len(src), n, _ptr(A, ctypes.c_float),
    )
    return A


def hermite_coeffs_native(ts: np.ndarray, ys: np.ndarray):
    """(d, c, b, a) coefficients for a time-major (T, ...) signal."""
    lib = get_lib()
    if lib is None:
        return None
    T = ys.shape[0]
    chan_shape = ys.shape[1:]
    C = int(np.prod(chan_shape)) if chan_shape else 1
    ts64 = np.ascontiguousarray(ts, dtype=np.float64)
    ysf = np.ascontiguousarray(ys, dtype=np.float32).reshape(T, C)
    out = [np.zeros((T - 1, C), dtype=np.float32) for _ in range(4)]
    lib.gncde_hermite_coeffs(
        _ptr(ts64, ctypes.c_double), _ptr(ysf, ctypes.c_float), T, C,
        _ptr(out[0], ctypes.c_float), _ptr(out[1], ctypes.c_float),
        _ptr(out[2], ctypes.c_float), _ptr(out[3], ctypes.c_float),
    )
    return tuple(o.reshape((T - 1,) + chan_shape) for o in out)


def bcsr_pattern_native(
    src: np.ndarray, dst: np.ndarray, n: int, bs: int
) -> tp.Optional[np.ndarray]:
    """Edge list -> (nb, nb) uint8 block-touch bitmap; None without native."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    nb = -(-n // bs)
    mark = np.zeros((nb, nb), dtype=np.uint8)
    lib.gncde_bcsr_pattern(
        _ptr(src, ctypes.c_int64), _ptr(dst, ctypes.c_int64), len(src), n,
        bs, _ptr(mark, ctypes.c_uint8),
    )
    return mark


def bcsr_scatter_native(
    src: np.ndarray, dst: np.ndarray, w: tp.Optional[np.ndarray], n: int,
    bs: int, kb: int, slot_lut: np.ndarray,
) -> tp.Optional[np.ndarray]:
    """Edge list -> (nb, kb, bs, bs) tile values at a fixed blocked pattern
    (slot_lut: (nb, nb) int32, -1 marks unstored blocks); None without
    native."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    wf = (
        np.ascontiguousarray(w, dtype=np.float32)
        if w is not None
        else np.ones(len(src), dtype=np.float32)
    )
    nb = -(-n // bs)
    slot_lut = np.ascontiguousarray(slot_lut, dtype=np.int32)
    blocks = np.zeros((nb, kb, bs, bs), dtype=np.float32)
    lib.gncde_bcsr_scatter(
        _ptr(src, ctypes.c_int64), _ptr(dst, ctypes.c_int64),
        _ptr(wf, ctypes.c_float), len(src), n, bs, kb,
        _ptr(slot_lut, ctypes.c_int32), _ptr(blocks, ctypes.c_float),
    )
    return blocks
