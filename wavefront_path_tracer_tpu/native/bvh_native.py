"""ctypes bindings for the C++ BVH builder (bvh_builder.cpp).

Same flat-array contract as ``scene.bvh.build_flat_bvh`` — outputs are
bit-identical (enforced by tests/test_native.py), so it is a pure
drop-in accelerator selected by ``build_bvh(..., backend="auto")``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bvh_builder.cpp")
_SO = os.path.join(_DIR, "_bvh_builder.so")
_LOCK = threading.Lock()
_lib = None


def _compile() -> None:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    with _LOCK:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _compile()
        lib = ctypes.CDLL(_SO)
        lib.wpt_build_bvh.restype = ctypes.c_int
        lib.wpt_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # centers
            ctypes.POINTER(ctypes.c_float),  # radii
            ctypes.c_int,                    # n
            ctypes.c_int,                    # bins
            ctypes.c_int,                    # max_leaf
            ctypes.POINTER(ctypes.c_float),  # out aabb_min
            ctypes.POINTER(ctypes.c_float),  # out aabb_max
            ctypes.POINTER(ctypes.c_int32),  # out left_first
            ctypes.POINTER(ctypes.c_int32),  # out prim_count
            ctypes.POINTER(ctypes.c_int32),  # out perm
        ]
        _lib = lib
        return lib


def build_flat_bvh(centers, radii, bins: int = 64, max_leaf_size: int = 4):
    """Native equivalent of scene.bvh.build_flat_bvh; returns (FlatBVH, perm)."""
    from wavefront_path_tracer_tpu.scene.bvh import FlatBVH

    lib = _load()
    centers = np.ascontiguousarray(centers, np.float32)
    radii = np.ascontiguousarray(radii, np.float32)
    n = centers.shape[0]
    cap = 2 * n + 2
    aabb_min = np.empty((cap, 3), np.float32)
    aabb_max = np.empty((cap, 3), np.float32)
    left_first = np.empty(cap, np.int32)
    prim_count = np.empty(cap, np.int32)
    perm = np.empty(n, np.int32)

    fptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    iptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    num_nodes = lib.wpt_build_bvh(
        fptr(centers), fptr(radii), n, bins, max_leaf_size,
        fptr(aabb_min), fptr(aabb_max), iptr(left_first), iptr(prim_count),
        iptr(perm),
    )
    if num_nodes < 0:
        raise RuntimeError("native BVH build failed (capacity)")
    bvh = FlatBVH(
        aabb_min=aabb_min[:num_nodes].copy(),
        aabb_max=aabb_max[:num_nodes].copy(),
        left_first=left_first[:num_nodes].copy(),
        prim_count=prim_count[:num_nodes].copy(),
    )
    return bvh, perm.astype(np.int64)
