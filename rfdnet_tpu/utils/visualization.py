"""Training/eval snapshot rendering + point-cloud/box PLY writers.

Semantic rebuild of `net_utils/visualization.py:11-90` (matplotlib voxel /
point-cloud renders) and the `utils/pc_util.py` PLY helpers the test-time
dumps use (colored point clouds, oriented-bbox meshes). VTK-based
interactive viewing (`utils/scannet/visualization/`) is host-optional and
stubbed behind `try: import vtk`.
"""

from __future__ import annotations

import numpy as np

from ..meshing.mesh import write_ply


def visualize_voxels(voxels: np.ndarray, out_file: str | None = None,
                     show: bool = False):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    voxels = np.asarray(voxels).transpose(2, 0, 1)
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    ax.voxels(voxels, edgecolor="k")
    ax.set_xlabel("Z")
    ax.set_ylabel("X")
    ax.set_zlabel("Y")
    ax.view_init(elev=30, azim=45)
    if out_file is not None:
        plt.savefig(out_file)
    if show:
        plt.show()
    plt.close(fig)


def visualize_pointcloud(points: np.ndarray, normals=None,
                         out_file: str | None = None, show: bool = False):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    points = np.asarray(points)
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    ax.scatter(points[:, 0], points[:, 1], points[:, 2], s=1)
    if normals is not None:
        ax.quiver(points[:, 0], points[:, 1], points[:, 2],
                  normals[:, 0], normals[:, 1], normals[:, 2],
                  length=0.1, color="k")
    ax.set_xlabel("X")
    ax.set_ylabel("Y")
    ax.set_zlabel("Z")
    ax.view_init(elev=30, azim=45)
    if out_file is not None:
        plt.savefig(out_file)
    if show:
        plt.show()
    plt.close(fig)


def write_ply_rgb(path: str, points: np.ndarray, colors: np.ndarray):
    """Colored point cloud PLY (`pc_util.py` write_ply_color family)."""
    points = np.asarray(points, dtype=np.float32).reshape(-1, 3)
    colors = np.asarray(colors).reshape(-1, 3)
    if colors.dtype != np.uint8:
        colors = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(
            (
                "ply\nformat binary_little_endian 1.0\n"
                f"element vertex {len(points)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
                "end_header\n"
            ).encode()
        )
        rec = np.empty(
            (len(points),),
            dtype=[("xyz", "<f4", (3,)), ("rgb", "u1", (3,))],
        )
        rec["xyz"] = points
        rec["rgb"] = colors
        f.write(rec.tobytes())


_BOX_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def write_oriented_bbox_ply(path: str, corners_list: np.ndarray,
                            radius: float = 0.01):
    """Boxes as thin triangulated edge 'tubes' (square cross-section), the
    `pc_util.write_oriented_bbox` role without trimesh."""
    corners_list = np.asarray(corners_list).reshape(-1, 8, 3)
    verts, faces = [], []
    for corners in corners_list:
        for a, b in _BOX_EDGES:
            v0, v1 = corners[a], corners[b]
            d = v1 - v0
            n = np.linalg.norm(d)
            if n < 1e-9:
                continue
            d = d / n
            # orthonormal frame around the edge
            up = np.array([0.0, 0.0, 1.0])
            if abs(d @ up) > 0.9:
                up = np.array([1.0, 0.0, 0.0])
            s = np.cross(d, up)
            s /= np.linalg.norm(s)
            t = np.cross(d, s)
            base = len(verts)
            for end in (v0, v1):
                for sa, sb in ((1, 1), (1, -1), (-1, -1), (-1, 1)):
                    verts.append(end + radius * (sa * s + sb * t))
            for k in range(4):
                k2 = (k + 1) % 4
                faces.append([base + k, base + 4 + k, base + 4 + k2])
                faces.append([base + k, base + 4 + k2, base + k2])
    if not verts:
        verts = np.zeros((0, 3))
        faces = np.zeros((0, 3), np.int32)
    write_ply(path, np.asarray(verts), np.asarray(faces, np.int32))


def dump_training_snapshot(vis_path: str, epoch: int, phase: str, it: int,
                           voxels_out: np.ndarray, proposal_ids: np.ndarray,
                           gt_voxels: np.ndarray, n_shapes_per_batch: int,
                           rng=None, n_samples: int = 3):
    """`models/iscnet/training.py:25-52` visualize_step: dump up to 3
    random predicted/GT voxel PNG pairs."""
    import os

    os.makedirs(vis_path, exist_ok=True)
    rng = rng or np.random
    total = voxels_out.shape[0]
    ids = (
        rng.choice(total, n_samples, replace=False)
        if total >= n_samples else range(total)
    )
    for idx, i in enumerate(ids):
        visualize_voxels(
            voxels_out[i],
            os.path.join(vis_path, f"{epoch}_{phase}_{it}_{idx:03d}_pred.png"),
        )
        b = i // n_shapes_per_batch
        k = i % n_shapes_per_batch
        box_id = int(proposal_ids[b, k, 1])
        cls_id = int(proposal_ids[b, k, 2])
        visualize_voxels(
            gt_voxels[b, box_id],
            os.path.join(
                vis_path, f"{epoch}_{phase}_{it}_{idx:03d}_gt_cls{cls_id}.png"
            ),
        )
