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


def _host_tag() -> str:
    """Build-host fingerprint: -march=native binaries are only valid on
    CPUs with the same ISA extensions (ADVICE r3: a .so carried across
    hosts can SIGILL)."""
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except OSError:
        pass
    return platform.machine() + ":" + hashlib.sha1(
        flags.encode()
    ).hexdigest()[:16]


def _stale(so: str, src: str) -> bool:
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        return True
    tag = so + ".buildinfo"
    try:
        with open(tag) as f:
            return f.read().strip() != _host_tag()
    except OSError:
        return True  # no build record: binary of unknown provenance


def _record_build(so: str) -> None:
    with open(so + ".buildinfo", "w") as f:
        f.write(_host_tag())


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    _record_build(_SO)


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if _stale(_SO, _SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        _extract_sig = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.mt_extract.restype = ctypes.c_int
        lib.mt_extract.argtypes = _extract_sig
        lib.mc_extract.restype = ctypes.c_int
        lib.mc_extract.argtypes = _extract_sig
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
        lib.mise_create.restype = ctypes.c_void_p
        lib.mise_create.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ]
        lib.mise_destroy.argtypes = [ctypes.c_void_p]
        lib.mise_query.restype = ctypes.c_int
        lib.mise_query.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ]
        lib.mise_update.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ]
        lib.mise_to_dense.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ]
        lib.mise_mc_extract.restype = ctypes.c_int
        lib.mise_mc_extract.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.mise_mc_extract_batch.restype = ctypes.c_void_p
        lib.mise_mc_extract_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.mc_extract_batch.restype = ctypes.c_void_p
        lib.mc_extract_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.batch_mesh_get.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
        ]
        lib.batch_result_free.argtypes = [ctypes.c_void_p]
        lib.mc_extract_padded.restype = ctypes.c_int
        lib.mc_extract_padded.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.mesh_threads.restype = ctypes.c_int
        lib.mesh_threads.argtypes = [ctypes.c_int]
        lib.mc_extract_bits.restype = ctypes.c_int
        lib.mc_extract_bits.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return lib


_PREP_SRC = os.path.join(_HERE, "src", "prep.cpp")
_PREP_SO = os.path.join(_HERE, "src", "libprep.so")
_prep_lib = None


def get_prep_lib() -> ctypes.CDLL:
    """Offline-prep library: QEM simplify (N9), depth raster (N14), TSDF
    fusion (N13)."""
    global _prep_lib
    with _lock:
        if _prep_lib is not None:
            return _prep_lib
        if _stale(_PREP_SO, _PREP_SRC):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
                 "-fPIC", "-std=c++17", _PREP_SRC, "-o", _PREP_SO],
                check=True, capture_output=True,
            )
            _record_build(_PREP_SO)
        lib = ctypes.CDLL(_PREP_SO)
        lib.simplify_qem.restype = ctypes.c_int
        lib.simplify_qem.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.prep_free.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int)
        ]
        lib.render_depth.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.tsdf_fuse.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_double), ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_double,
            ctypes.POINTER(ctypes.c_float),
        ]
        _prep_lib = lib
        return lib


def _cptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def _extract(fn, grid: np.ndarray, iso: float):
    lib = get_lib()
    grid = np.ascontiguousarray(grid, dtype=np.float32)
    nx, ny, nz = grid.shape
    vp = ctypes.POINTER(ctypes.c_double)()
    tp = ctypes.POINTER(ctypes.c_int)()
    nv = ctypes.c_int()
    nt = ctypes.c_int()
    getattr(lib, fn)(
        _cptr(grid, ctypes.c_float), nx, ny, nz, ctypes.c_float(iso),
        ctypes.byref(vp), ctypes.byref(tp), ctypes.byref(nv), ctypes.byref(nt),
    )
    verts = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy()
    tris = np.ctypeslib.as_array(tp, shape=(nt.value, 3)).copy()
    lib.mesh_free(vp, tp)
    return verts, tris


def marching_tetrahedra(grid: np.ndarray, iso: float):
    """Iso-surface of a dense (nx, ny, nz) grid via 6-tetra marching
    tetrahedra. Returns (verts (V, 3) float64 in index space,
    tris (T, 3) int32)."""
    return _extract("mt_extract", grid, iso)


def marching_cubes(grid: np.ndarray, iso: float):
    """True marching cubes (the reference's PyMCubes extraction,
    `generator.py:160`), with programmatically-built case tables and
    per-face ambiguity resolution that is consistent across neighbouring
    cubes (watertight). Same (verts, tris) contract as
    marching_tetrahedra; ~2.5x fewer triangles for the same field."""
    return _extract("mc_extract", grid, iso)


def mise_marching_cubes(lvl0: np.ndarray, resolution_0: int,
                        upsampling_steps: int, level_idx, level_vals,
                        iso: float, pad_val: float = -1e6):
    """Marching cubes straight from ONE proposal's device-MISE sparse
    outputs (meshing/mise_device.py): no dense-grid reconstruction on
    the Python side, no full-grid cell scan — the C++ core rebuilds the
    lattice, marks only the cells that can carry an iso crossing
    (refined voxels + their one-ring + the padded boundary), and runs
    the same welded marching cubes over them in dense scan order, so
    the output is byte-identical to
    ``marching_cubes(pad(reconstruct_dense(...)), iso)``.

    lvl0: (res0+1,)*3 float; level_idx/level_vals: per refinement level
    the VALID refined-voxel linear ids (ascending) and (m, 27) values.
    Returns (verts (V, 3) float64 in padded index space, tris (T, 3)).
    """
    lib = get_lib()
    lvl0 = np.ascontiguousarray(lvl0, dtype=np.float32)
    counts = np.array([len(i) for i in level_idx], dtype=np.int32)
    idx = np.ascontiguousarray(
        np.concatenate([np.asarray(i, np.int32).ravel() for i in level_idx])
        if len(level_idx) else np.zeros(0, np.int32), dtype=np.int32)
    vals = np.ascontiguousarray(
        np.concatenate(
            [np.asarray(v, np.float32).reshape(-1, 27) for v in level_vals]
        ) if len(level_vals) else np.zeros((0, 27), np.float32),
        dtype=np.float32)
    vp = ctypes.POINTER(ctypes.c_double)()
    tp = ctypes.POINTER(ctypes.c_int)()
    nv = ctypes.c_int()
    nt = ctypes.c_int()
    lib.mise_mc_extract(
        _cptr(lvl0, ctypes.c_float), int(resolution_0),
        int(upsampling_steps), _cptr(idx, ctypes.c_int32),
        _cptr(vals, ctypes.c_float), _cptr(counts, ctypes.c_int32),
        ctypes.c_float(iso), ctypes.c_float(pad_val),
        ctypes.byref(vp), ctypes.byref(tp), ctypes.byref(nv),
        ctypes.byref(nt),
    )
    verts = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy()
    tris = np.ctypeslib.as_array(tp, shape=(nt.value, 3)).copy()
    lib.mesh_free(vp, tp)
    return verts, tris


def _split_batch(lib, handle, n, nv_per, nt_per):
    """Copy each proposal's mesh out of the batch result (one small copy
    per mesh, no concatenation pass) and free the native memory."""
    out = []
    vp = ctypes.POINTER(ctypes.c_double)()
    tp = ctypes.POINTER(ctypes.c_int)()
    try:
        for i in range(n):
            nv, nt = int(nv_per[i]), int(nt_per[i])
            if nv == 0:
                out.append(
                    (np.zeros((0, 3)), np.zeros((0, 3), np.int32))
                )
                continue
            lib.batch_mesh_get(handle, i, ctypes.byref(vp), ctypes.byref(tp))
            out.append((
                np.ctypeslib.as_array(vp, shape=(nv, 3)).copy(),
                np.ctypeslib.as_array(tp, shape=(nt, 3)).copy(),
            ))
    finally:
        lib.batch_result_free(handle)
    return out


def mesh_threads(njobs: int) -> int:
    """Worker-pool width the native batch extractors would use
    (RFDNET_MESH_THREADS env or hardware_concurrency, clamped)."""
    return int(get_lib().mesh_threads(int(njobs)))


def marching_cubes_padded(grid: np.ndarray, iso: float,
                          pad_val: float = -1e6):
    """Single-grid marching cubes with the pad_val boundary layer applied
    implicitly in C++ (no np.pad copy). Vertices in PADDED index space —
    byte-identical to marching_cubes(np.pad(grid, 1, ...), iso)."""
    lib = get_lib()
    grid = np.ascontiguousarray(grid, dtype=np.float32)
    nx, ny, nz = grid.shape
    vp = ctypes.POINTER(ctypes.c_double)()
    tp = ctypes.POINTER(ctypes.c_int)()
    nv = ctypes.c_int()
    nt = ctypes.c_int()
    lib.mc_extract_padded(
        _cptr(grid, ctypes.c_float), nx, ny, nz, ctypes.c_float(iso),
        ctypes.c_float(pad_val),
        ctypes.byref(vp), ctypes.byref(tp), ctypes.byref(nv),
        ctypes.byref(nt),
    )
    verts = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy()
    tris = np.ctypeslib.as_array(tp, shape=(nt.value, 3)).copy()
    lib.mesh_free(vp, tp)
    return verts, tris


def marching_cubes_bits(bits: np.ndarray, vals: np.ndarray, shape,
                        iso: float, pad_val: float = -1e6):
    """Marching cubes from ONE proposal's transfer-sparse grid form
    (`mise_device.sparsify_grids`): packed sign bits + needed-point
    values in ascending order. Byte-identical to
    marching_cubes_padded(dense_grid, iso). Returns (verts, tris) in
    PADDED index space, or None if the host-derived needed count
    disagrees with len(vals) (caller falls back to the dense path)."""
    lib = get_lib()
    bits = np.ascontiguousarray(bits, dtype=np.uint8)
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    nx, ny, nz = shape
    vp = ctypes.POINTER(ctypes.c_double)()
    tp = ctypes.POINTER(ctypes.c_int)()
    nv = ctypes.c_int()
    nt = ctypes.c_int()
    rc = lib.mc_extract_bits(
        _cptr(bits, ctypes.c_uint8), _cptr(vals, ctypes.c_float),
        len(vals), nx, ny, nz, ctypes.c_float(iso), ctypes.c_float(pad_val),
        ctypes.byref(vp), ctypes.byref(tp), ctypes.byref(nv),
        ctypes.byref(nt),
    )
    if rc != 0:
        return None
    verts = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy()
    tris = np.ctypeslib.as_array(tp, shape=(nt.value, 3)).copy()
    lib.mesh_free(vp, tp)
    return verts, tris


def marching_cubes_batch(grids: np.ndarray, iso: float,
                         pad_val: float = -1e6, valid=None):
    """Batched marching cubes over (n, nx, ny, nz) grids, each implicitly
    padded with one pad_val layer per side (no padded copies, ONE native
    call for the whole scene — the per-call ctypes overhead was ~1 ms x
    64 proposals). Returns a list of (verts (V,3) float64 in PADDED index
    space, tris (T,3) int32); empty pairs for invalid slots."""
    lib = get_lib()
    grids = np.ascontiguousarray(grids, dtype=np.float32)
    n, nx, ny, nz = grids.shape
    vmask = None
    vptr = ctypes.POINTER(ctypes.c_uint8)()
    if valid is not None:
        vmask = np.ascontiguousarray(
            np.asarray(valid).reshape(-1).astype(np.uint8))
        vptr = _cptr(vmask, ctypes.c_uint8)
    nv_per = np.zeros(n, np.int32)
    nt_per = np.zeros(n, np.int32)
    handle = lib.mc_extract_batch(
        _cptr(grids, ctypes.c_float), n, nx, ny, nz,
        ctypes.c_float(iso), ctypes.c_float(pad_val), vptr,
        _cptr(nv_per, ctypes.c_int32), _cptr(nt_per, ctypes.c_int32),
    )
    return _split_batch(lib, handle, n, nv_per, nt_per)


def mise_marching_cubes_batch(lvl0s: np.ndarray, resolution_0: int,
                              upsampling_steps: int, idx: np.ndarray,
                              vals: np.ndarray, level_counts: np.ndarray,
                              iso: float, valid=None,
                              pad_val: float = -1e6):
    """Batched sparse-replay marching cubes (ONE native call for all
    proposals; see mise_marching_cubes for the per-proposal contract).

    lvl0s: (n, res0+1, res0+1, res0+1); level_counts: (n, steps) int32;
    idx (M,) int32 / vals (M, 27) f32 concatenated in (proposal, level)
    order. Returns a list of (verts, tris) in padded index space."""
    lib = get_lib()
    lvl0s = np.ascontiguousarray(lvl0s, dtype=np.float32)
    n = lvl0s.shape[0]
    level_counts = np.ascontiguousarray(level_counts, dtype=np.int32)
    idx = np.ascontiguousarray(idx.reshape(-1), dtype=np.int32)
    vals = np.ascontiguousarray(vals.reshape(-1, 27), dtype=np.float32)
    vptr = ctypes.POINTER(ctypes.c_uint8)()
    if valid is not None:
        vmask = np.ascontiguousarray(
            np.asarray(valid).reshape(-1).astype(np.uint8))
        vptr = _cptr(vmask, ctypes.c_uint8)
    nv_per = np.zeros(n, np.int32)
    nt_per = np.zeros(n, np.int32)
    handle = lib.mise_mc_extract_batch(
        _cptr(lvl0s, ctypes.c_float), n, int(resolution_0),
        int(upsampling_steps), _cptr(idx, ctypes.c_int32),
        _cptr(vals, ctypes.c_float), _cptr(level_counts, ctypes.c_int32),
        ctypes.c_float(iso), ctypes.c_float(pad_val), vptr,
        _cptr(nv_per, ctypes.c_int32), _cptr(nt_per, ctypes.c_int32),
    )
    return _split_batch(lib, handle, n, nv_per, nt_per)


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


class MiseNative:
    """C++ MISE octree (`external/libmise/mise.pyx` role; the reference
    keeps this bookkeeping native too). Same contract as the Python
    `meshing.mise.MISE` oracle: `query()` returns the unknown lattice
    points (lexicographic order), `update(points, values)` stores logits
    and advances the refinement frontier, `to_dense()` fills unknowns
    from their coarsest known ancestor corner."""

    def __init__(self, resolution_0: int, depth: int, threshold: float):
        self._lib = get_lib()
        self.res0 = int(resolution_0)
        self.depth = int(depth)
        self.R = self.res0 * 2 ** self.depth
        self._h = ctypes.c_void_p(self._lib.mise_create(
            self.res0, self.depth, ctypes.c_double(threshold)
        ))

    def query(self) -> np.ndarray:
        cap = 0
        n = self._lib.mise_query(
            self._h, ctypes.POINTER(ctypes.c_int64)(), cap
        )
        out = np.empty((n, 3), dtype=np.int64)
        if n:
            self._lib.mise_query(self._h, _cptr(out, ctypes.c_int64), n)
        return out

    def update(self, points: np.ndarray, values: np.ndarray) -> None:
        points = np.ascontiguousarray(points, dtype=np.int64).reshape(-1, 3)
        values = np.ascontiguousarray(values, dtype=np.float64).reshape(-1)
        self._lib.mise_update(
            self._h, _cptr(points, ctypes.c_int64),
            _cptr(values, ctypes.c_double), len(points),
        )

    def done(self) -> bool:
        return self._lib.mise_query(
            self._h, ctypes.POINTER(ctypes.c_int64)(), 0
        ) == 0

    def to_dense(self) -> np.ndarray:
        out = np.empty((self.R + 1,) * 3, dtype=np.float32)
        self._lib.mise_to_dense(self._h, _cptr(out, ctypes.c_float))
        return out

    def __del__(self):
        # getattr: __init__ may have raised before _h/_lib were assigned
        # (e.g. get_lib() failure — the case _make_tree's fallback catches)
        h = getattr(self, "_h", None)
        self._h = None
        if h:
            self._lib.mise_destroy(h)


def simplify_mesh(verts, tris, target_faces: int,
                  aggressiveness: float = 7.0):
    """Quadric-error-metric simplification (`libsimplify` semantics:
    simplify_mesh(mesh, f_target, aggressiveness) — `simplify_mesh.pyx`)."""
    lib = get_prep_lib()
    verts = np.ascontiguousarray(verts, dtype=np.float64)
    tris = np.ascontiguousarray(tris, dtype=np.int32)
    vp = ctypes.POINTER(ctypes.c_double)()
    tp = ctypes.POINTER(ctypes.c_int)()
    nv = ctypes.c_int()
    nt = ctypes.c_int()
    lib.simplify_qem(
        _cptr(verts, ctypes.c_double), len(verts),
        _cptr(tris, ctypes.c_int), len(tris),
        int(target_faces), ctypes.c_double(aggressiveness),
        ctypes.byref(vp), ctypes.byref(tp), ctypes.byref(nv), ctypes.byref(nt),
    )
    out_v = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy()
    out_t = np.ctypeslib.as_array(tp, shape=(nt.value, 3)).copy()
    lib.prep_free(vp, tp)
    return out_v, out_t


def render_depth(verts, tris, pose, f: float, cx: float, cy: float,
                 width: int, height: int) -> np.ndarray:
    """Pinhole z-buffer depth map; pose is row-major 4x4 world->camera.
    Returns (height, width) float32, 0 where no geometry (the
    `librender` offscreen depth render role)."""
    lib = get_prep_lib()
    verts = np.ascontiguousarray(verts, dtype=np.float64)
    tris = np.ascontiguousarray(tris, dtype=np.int32)
    pose = np.ascontiguousarray(pose, dtype=np.float64)
    out = np.zeros((height, width), dtype=np.float32)
    lib.render_depth(
        _cptr(verts, ctypes.c_double), len(verts),
        _cptr(tris, ctypes.c_int), len(tris),
        _cptr(pose, ctypes.c_double), ctypes.c_double(f),
        ctypes.c_double(cx), ctypes.c_double(cy), width, height,
        _cptr(out, ctypes.c_float),
    )
    return out


def tsdf_fuse(depths, poses, f: float, cx: float, cy: float, res: int,
              bbox, trunc: float) -> np.ndarray:
    """Projective TSDF fusion over n depth views -> (res, res, res)
    float32 in [-1, 1] (`pyfusion.tsdf_gpu` role, OpenMP on host)."""
    lib = get_prep_lib()
    depths = np.ascontiguousarray(depths, dtype=np.float32)
    poses = np.ascontiguousarray(poses, dtype=np.float64)
    bbox = np.ascontiguousarray(bbox, dtype=np.float64).reshape(6)
    n, H, W = depths.shape
    out = np.zeros((res, res, res), dtype=np.float32)
    lib.tsdf_fuse(
        _cptr(depths, ctypes.c_float), n, H, W,
        _cptr(poses, ctypes.c_double), ctypes.c_double(f),
        ctypes.c_double(cx), ctypes.c_double(cy), res,
        _cptr(bbox, ctypes.c_double), ctypes.c_double(trunc),
        _cptr(out, ctypes.c_float),
    )
    return out


class KDTree:
    """3-D KD-tree with k-NN queries (the `pykdtree.KDTree` role; OpenMP
    queries in the native library). Used by the host-side chamfer in the
    eval path (`external/common.py:38-141` kdtree chamfer equivalent)."""

    def __init__(self, points: np.ndarray):
        lib = get_prep_lib()
        lib.kdtree_build.restype = ctypes.c_void_p
        lib.kdtree_build.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int
        ]
        lib.kdtree_query.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.kdtree_free.argtypes = [ctypes.c_void_p]
        self._lib = lib
        self._pts = np.ascontiguousarray(points, dtype=np.float64).reshape(-1, 3)
        self._handle = lib.kdtree_build(
            _cptr(self._pts, ctypes.c_double), len(self._pts)
        )

    def query(self, queries: np.ndarray, k: int = 1):
        """Returns (dists (nq, k) L2, idx (nq, k)); squeezed when k=1 to
        match pykdtree's interface."""
        q = np.ascontiguousarray(queries, dtype=np.float64).reshape(-1, 3)
        d2 = np.zeros((len(q), k))
        idx = np.zeros((len(q), k), np.int32)
        self._lib.kdtree_query(
            self._handle, _cptr(q, ctypes.c_double), len(q), k,
            _cptr(d2, ctypes.c_double), _cptr(idx, ctypes.c_int),
        )
        d = np.sqrt(d2)
        if k == 1:
            return d[:, 0], idx[:, 0]
        return d, idx

    def __del__(self):
        try:
            self._lib.kdtree_free(self._handle)
        except Exception:
            pass


def kdtree_chamfer(points1: np.ndarray, points2: np.ndarray):
    """Host chamfer via KD-trees (`external/common.py` chamfer_distance
    with use_kdtree=True): mean squared NN distance both ways."""
    d12, _ = KDTree(points2).query(points1, 1)
    d21, _ = KDTree(points1).query(points2, 1)
    return float((d12**2).mean() + (d21**2).mean())
