"""ctypes bridge to the native C++ SAH builder (native/bvh_builder.cpp).

The Python builder (accel/sah.py) is the reference implementation; the
native one is the production path for large meshes (the reference's builder
is native Rust — this is its C++ counterpart). Compiled on demand with g++
and cached next to the source; falls back silently if no toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = os.path.join(_SRC_DIR, "libbvh.so")
        src = os.path.join(_SRC_DIR, "bvh_builder.cpp")
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", src, "-o", so],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(so)
            lib.build_bvh.restype = ctypes.c_int32
            lib.build_bvh.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def native_available() -> bool:
    return _load() is not None


def build_bvh_native(aabb_lo: np.ndarray, aabb_hi: np.ndarray, leaf_size: int = 4):
    """Returns (lo, hi, exit_idx, prim_start, prim_count, prim_order) numpy
    arrays like accel.flatten.flatten_bvh, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(aabb_lo)
    lo = np.ascontiguousarray(aabb_lo, np.float32)
    hi = np.ascontiguousarray(aabb_hi, np.float32)
    max_nodes = 2 * n + 2
    node_lo = np.zeros((max_nodes, 3), np.float32)
    node_hi = np.zeros((max_nodes, 3), np.float32)
    exit_idx = np.zeros(max_nodes, np.int32)
    prim_start = np.zeros(max_nodes, np.int32)
    prim_count = np.zeros(max_nodes, np.int32)
    prim_order = np.zeros(n, np.int32)

    def ptr_f(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def ptr_i(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    m = lib.build_bvh(
        ptr_f(lo), ptr_f(hi), n, leaf_size,
        ptr_f(node_lo), ptr_f(node_hi), ptr_i(exit_idx),
        ptr_i(prim_start), ptr_i(prim_count), ptr_i(prim_order), max_nodes,
    )
    if m <= 0:
        return None
    return (
        node_lo[:m], node_hi[:m], exit_idx[:m], prim_start[:m], prim_count[:m],
        prim_order,
    )
