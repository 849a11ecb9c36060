"""Native (C++) runtime components, loaded via ctypes.

The reference's runtime substrate is C++ (SURVEY §0); here the TPU compute
path is JAX/Pallas and the host-side heavy lifting — BVH clustering over
millions of primitives — is a small C++ library compiled on first use with
the system toolchain and cached next to the sources. Everything has a
numpy fallback, so the package works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bvh_builder.cpp")
_LIB = os.path.join(_DIR, "_bvh_builder.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC, "-o", _LIB]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        return res.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def load():
    """The builder library, or None when no toolchain is available."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.median_split.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.median_split.restype = None
        try:  # ABI >= 2 (older cached .so lacks it; recompile handles mtime)
            lib.ranges_to_perm.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
            lib.ranges_to_perm.restype = None
        except AttributeError:
            pass
        _lib = lib
        return _lib


def median_split(centroids: np.ndarray, n_leaves: int):
    """Partition prims into n_leaves median-split ranges.

    Returns (order [n] int64 permutation, bounds [n_leaves+1] int64 range
    offsets into order) or None if the native library is unavailable.
    """
    lib = load()
    if lib is None:
        return None
    cent = np.ascontiguousarray(centroids, np.float32)
    n = cent.shape[0]
    order = np.arange(n, dtype=np.int64)
    bounds = np.zeros(n_leaves + 1, np.int64)
    lib.median_split(
        cent.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n), ctypes.c_int64(n_leaves),
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        bounds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return order, bounds


def ranges_to_perm(order: np.ndarray, bounds: np.ndarray, n_leaves: int,
                   leaf_size: int):
    """Threaded C++ scatter of median_split ranges into padded leaf slots
    ([n_leaves*leaf_size] int64, -1 pads), or None without the library."""
    lib = load()
    if lib is None or not hasattr(lib, "ranges_to_perm"):
        return None
    order = np.ascontiguousarray(order, np.int64)
    bounds = np.ascontiguousarray(bounds, np.int64)
    perm = np.empty(n_leaves * leaf_size, np.int64)
    lib.ranges_to_perm(
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        bounds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n_leaves), ctypes.c_int64(leaf_size),
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return perm
