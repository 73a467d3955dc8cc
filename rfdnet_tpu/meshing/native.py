"""ctypes bindings for the native meshing library (built on demand).

The toolchain has g++ but no pybind11, so the C++ core
(`rfdnet_tpu/meshing/src/meshing.cpp`) exposes a C ABI and is compiled to a
shared object on first use (cached next to the source).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "src", "meshing.cpp")
_SO = os.path.join(_HERE, "src", "libmeshing.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.mt_extract.restype = ctypes.c_int
        lib.mt_extract.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.mesh_free.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int)
        ]
        lib.voxelize_surface.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.fill_interior.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.points_in_mesh.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return lib


def _cptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def marching_tetrahedra(grid: np.ndarray, iso: float):
    """Iso-surface of a dense (nx, ny, nz) grid. Returns (verts (V, 3)
    float64 in index space, tris (T, 3) int32)."""
    lib = get_lib()
    grid = np.ascontiguousarray(grid, dtype=np.float32)
    nx, ny, nz = grid.shape
    vp = ctypes.POINTER(ctypes.c_double)()
    tp = ctypes.POINTER(ctypes.c_int)()
    nv = ctypes.c_int()
    nt = ctypes.c_int()
    lib.mt_extract(
        _cptr(grid, ctypes.c_float), nx, ny, nz, ctypes.c_float(iso),
        ctypes.byref(vp), ctypes.byref(tp), ctypes.byref(nv), ctypes.byref(nt),
    )
    verts = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy()
    tris = np.ctypeslib.as_array(tp, shape=(nt.value, 3)).copy()
    lib.mesh_free(vp, tp)
    return verts, tris


def voxelize_surface(verts, tris, origin, voxel_size, dims):
    """Surface-voxelize a mesh into a uint8 grid of `dims`."""
    lib = get_lib()
    verts = np.ascontiguousarray(verts, dtype=np.float64)
    tris = np.ascontiguousarray(tris, dtype=np.int32)
    origin = np.ascontiguousarray(origin, dtype=np.float64)
    out = np.zeros(dims, dtype=np.uint8)
    lib.voxelize_surface(
        _cptr(verts, ctypes.c_double), len(verts),
        _cptr(tris, ctypes.c_int), len(tris),
        _cptr(origin, ctypes.c_double), ctypes.c_double(voxel_size),
        dims[0], dims[1], dims[2], _cptr(out, ctypes.c_uint8),
    )
    return out


def fill_interior(surface: np.ndarray) -> np.ndarray:
    lib = get_lib()
    surface = np.ascontiguousarray(surface, dtype=np.uint8)
    out = np.zeros_like(surface)
    nx, ny, nz = surface.shape
    lib.fill_interior(
        _cptr(surface, ctypes.c_uint8), nx, ny, nz, _cptr(out, ctypes.c_uint8)
    )
    return out


def points_in_mesh(verts, tris, points) -> np.ndarray:
    """Boolean containment test for points against a watertight mesh."""
    lib = get_lib()
    verts = np.ascontiguousarray(verts, dtype=np.float64)
    tris = np.ascontiguousarray(tris, dtype=np.int32)
    points = np.ascontiguousarray(points, dtype=np.float64)
    out = np.zeros(len(points), dtype=np.uint8)
    lib.points_in_mesh(
        _cptr(verts, ctypes.c_double), len(verts),
        _cptr(tris, ctypes.c_int), len(tris),
        _cptr(points, ctypes.c_double), len(points),
        _cptr(out, ctypes.c_uint8),
    )
    return out.astype(bool)
