"""Mesh-mAP voxel IoU (host side, native voxelizer).

Semantic rebuild of the reference's mesh-IoU protocol
(`net_utils/eval_det.py:27-83` compute_mesh_iou +
`net_utils/ap_helper.py:429-463`): every mesh is voxelized at a
scene-derived voxel size (z-extent / 46, `network.py:164`) into a
*surface* shell and an *interior* fill; the IoU of two meshes is
alpha1*alpha2 / (alpha1 + alpha2 - alpha1*alpha2) where alpha_i is the
fraction of mesh i's (interior + surface) voxel centers contained in the
other mesh's voxels.

The reference shells out to the `binvox` executable through trimesh
(`ap_helper.py:16,441-443`); here the SAT surface voxelizer + flood-fill
from `rfdnet_tpu.meshing.native` replace it (N11/N16 in SURVEY §2.2).
"""

from __future__ import annotations

import numpy as np

from ..meshing.native import fill_interior, voxelize_surface


class VoxelSet:
    """A filled-cell set over a regular grid with world-space lookup."""

    def __init__(self, grid: np.ndarray, origin: np.ndarray, voxel_size: float):
        self.grid = grid.astype(bool)
        self.origin = np.asarray(origin, dtype=np.float64)
        self.voxel_size = float(voxel_size)
        self.filled_count = int(self.grid.sum())

    @property
    def points(self) -> np.ndarray:
        """World-space centers of filled voxels, (n, 3)."""
        idx = np.argwhere(self.grid)
        return self.origin + (idx + 0.5) * self.voxel_size

    def is_filled(self, points: np.ndarray) -> np.ndarray:
        points = np.asarray(points, dtype=np.float64).reshape(-1, 3)
        idx = np.floor((points - self.origin) / self.voxel_size).astype(
            np.int64
        )
        ok = np.all((idx >= 0) & (idx < np.array(self.grid.shape)), axis=1)
        out = np.zeros(len(points), dtype=bool)
        if ok.any():
            ii = idx[ok]
            out[ok] = self.grid[ii[:, 0], ii[:, 1], ii[:, 2]]
        return out


def voxelize_mesh_pair(vertices, faces, voxel_size: float):
    """(internal, surface) VoxelSet pair for a mesh, binvox-equivalent
    framing: cubic-ish grid over the mesh AABB with
    dimension = max extent / voxel_size (`ap_helper.py:438`)."""
    vertices = np.asarray(vertices, dtype=np.float64)
    if len(vertices) == 0 or len(faces) == 0:
        empty = VoxelSet(np.zeros((1, 1, 1)), np.zeros(3), voxel_size)
        return empty, empty
    mn = vertices.min(0)
    mx = vertices.max(0)
    dims = np.maximum(np.ceil((mx - mn) / voxel_size).astype(int), 1) + 1
    surface = voxelize_surface(
        vertices, np.asarray(faces, np.int32), mn, voxel_size, tuple(dims)
    )
    interior = fill_interior(surface)
    return (
        VoxelSet(interior, mn, voxel_size),
        VoxelSet(surface, mn, voxel_size),
    )


def compute_mesh_iou(voxel1, voxel2) -> float:
    """`eval_det.py:27-83` — mutual containment fractions combined as
    a1*a2 / (a1 + a2 - a1*a2)."""
    v1_int, v1_surf = voxel1
    v2_int, v2_surf = voxel2
    if v1_surf.filled_count == 0 or v2_surf.filled_count == 0:
        return 0.0

    def own_points(internal, surface):
        if internal.filled_count > 0:
            sp = surface.points
            sp = sp[~internal.is_filled(sp)]
            return np.vstack([internal.points, sp])
        return surface.points

    def contained(points, internal, surface):
        hits = surface.is_filled(points)
        if internal.filled_count > 0:
            hits = hits | internal.is_filled(points)
        return int(hits.sum())

    p1 = own_points(v1_int, v1_surf)
    p2 = own_points(v2_int, v2_surf)
    v1_in_v2 = contained(p1, v2_int, v2_surf)
    v2_in_v1 = contained(p2, v1_int, v1_surf)
    if v1_in_v2 == 0 or v2_in_v1 == 0:
        return 0.0
    a1 = v1_in_v2 / p1.shape[0]
    a2 = v2_in_v1 / p2.shape[0]
    return (a1 * a2) / (a1 + a2 - a1 * a2)


def mesh_iou(mesh1_pair, mesh2_pair) -> float:
    """mesh_iou_func plug for `eval_det` — each argument is the
    (internal, surface) pair produced by `voxelize_mesh_pair` (meshes are
    voxelized once at assembly time, as the reference does via its
    multiprocessing Pool)."""
    if mesh1_pair is None or mesh2_pair is None:
        return 0.0
    return compute_mesh_iou(mesh1_pair, mesh2_pair)
