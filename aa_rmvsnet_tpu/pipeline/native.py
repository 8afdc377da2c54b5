"""ctypes bindings for the native fusion core (native/fusion_core.cpp).

Builds ``libfusion_core.so`` on first use (g++ -O3 -fopenmp) and exposes
:func:`fuse_pair_native`, a fused reproject + graduated-vote pass matching
:func:`aa_rmvsnet_tpu.pipeline.fuse.graduated_consistency` numerics.  If no
compiler is available the import still succeeds and ``available()`` returns
False; the fusion driver falls back to the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfusion_core.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "fusion_core.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", "-std=c++17",
             src, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.fuse_pair.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.fuse_pair.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def fuse_pair_native(
    depth_ref: np.ndarray,
    K_ref: np.ndarray,
    E_ref: np.ndarray,
    depth_src: np.ndarray,
    K_src: np.ndarray,
    E_src: np.ndarray,
    level_counts: np.ndarray,
    loose_mask: np.ndarray,
    reproj_accum: np.ndarray,
    dist_base: float = 4.0,
    rel_base: float = 1300.0,
) -> None:
    """Accumulate one (ref, src) consistency pass into the output buffers.

    ``level_counts``: ``(num_levels, H, W)`` int32; ``loose_mask``:
    ``(H, W)`` int32; ``reproj_accum``: ``(H, W)`` float32 — all modified
    in place (matching the accumulation in ``fuse_scan``).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native fusion core unavailable")

    h, w = depth_ref.shape
    depth_ref = np.ascontiguousarray(depth_ref, np.float32)
    depth_src = np.ascontiguousarray(depth_src, np.float32)

    kinv_ref = np.ascontiguousarray(np.linalg.inv(K_ref), np.float64)
    kinv_src = np.ascontiguousarray(np.linalg.inv(K_src), np.float64)
    k_src = np.ascontiguousarray(K_src, np.float64)
    k_ref = np.ascontiguousarray(K_ref, np.float64)
    rt_ref2src = np.ascontiguousarray(
        (E_src.astype(np.float64) @ np.linalg.inv(E_ref.astype(np.float64)))[:3], np.float64
    )
    rt_src2ref = np.ascontiguousarray(
        (E_ref.astype(np.float64) @ np.linalg.inv(E_src.astype(np.float64)))[:3], np.float64
    )

    lib.fuse_pair(
        _ptr(depth_ref, ctypes.c_float), _ptr(depth_src, ctypes.c_float),
        h, w,
        _ptr(kinv_ref, ctypes.c_double), _ptr(k_src, ctypes.c_double),
        _ptr(kinv_src, ctypes.c_double), _ptr(k_ref, ctypes.c_double),
        _ptr(rt_ref2src, ctypes.c_double), _ptr(rt_src2ref, ctypes.c_double),
        float(dist_base), float(rel_base), int(level_counts.shape[0]),
        _ptr(level_counts, ctypes.c_int32), _ptr(loose_mask, ctypes.c_int32),
        _ptr(reproj_accum, ctypes.c_float),
    )
