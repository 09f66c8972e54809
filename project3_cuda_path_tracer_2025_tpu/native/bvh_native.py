"""ctypes binding for the native C++ BVH builder (``bvh_builder.cpp``).

Returns None when the shared library is unavailable so callers fall back to
the NumPy builder.  Build with ``python -m
project3_cuda_path_tracer_2025_tpu.native.build`` or ``make -C native``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _try_build(here: str) -> None:
    """Best-effort one-shot build of the shared library from source."""
    import shutil
    import subprocess

    if shutil.which("make") is None and shutil.which("g++") is None:
        return
    try:
        subprocess.run(
            ["make", "-C", here],
            capture_output=True,
            timeout=120,
            check=False,
        )
    except Exception:
        pass


def _find_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(__file__)
    if not any(
        os.path.exists(os.path.join(here, n))
        for n in ("libbvh_builder.so", "bvh_builder.so")
    ):
        _try_build(here)
    for name in ("libbvh_builder.so", "bvh_builder.so"):
        path = os.path.join(here, name)
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            lib.build_bvh.restype = ctypes.c_int
            lib.build_bvh.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # verts [T*9]
                ctypes.POINTER(ctypes.c_float),  # centroids [T*3]
                ctypes.c_int,  # T
                ctypes.c_int,  # leaf_size
                ctypes.POINTER(ctypes.c_float),  # out aabb_min [maxM*3]
                ctypes.POINTER(ctypes.c_float),  # out aabb_max
                ctypes.POINTER(ctypes.c_int),  # out left
                ctypes.POINTER(ctypes.c_int),  # out right
                ctypes.POINTER(ctypes.c_int),  # out start
                ctypes.POINTER(ctypes.c_int),  # out count
                ctypes.POINTER(ctypes.c_int),  # out tri_indices [T]
            ]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _find_lib() is not None


def build(tri_vertices: np.ndarray, centroids: np.ndarray, leaf_size: int):
    """Build via C++; returns dict of arrays or None if lib missing."""
    lib = _find_lib()
    if lib is None:
        return None
    T = int(tri_vertices.shape[0])
    if T == 0:
        return None
    max_nodes = 2 * T  # binary tree with >=1 tri per leaf has < 2T nodes
    verts = np.ascontiguousarray(tri_vertices, np.float32).reshape(-1)
    cents = np.ascontiguousarray(centroids, np.float32).reshape(-1)
    aabb_min = np.empty(max_nodes * 3, np.float32)
    aabb_max = np.empty(max_nodes * 3, np.float32)
    left = np.empty(max_nodes, np.int32)
    right = np.empty(max_nodes, np.int32)
    start = np.empty(max_nodes, np.int32)
    count = np.empty(max_nodes, np.int32)
    tri_indices = np.empty(T, np.int32)

    fptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    iptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    m = lib.build_bvh(
        fptr(verts),
        fptr(cents),
        T,
        leaf_size,
        fptr(aabb_min),
        fptr(aabb_max),
        iptr(left),
        iptr(right),
        iptr(start),
        iptr(count),
        iptr(tri_indices),
    )
    if m <= 0:
        return None
    return dict(
        aabb_min=aabb_min[: m * 3].reshape(m, 3),
        aabb_max=aabb_max[: m * 3].reshape(m, 3),
        left=left[:m].copy(),
        right=right[:m].copy(),
        start=start[:m].copy(),
        count=count[:m].copy(),
        tri_count=count[:m].copy(),
        tri_indices=tri_indices.copy(),
    )
