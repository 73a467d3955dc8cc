"""ShapeNet offline preparation (L0): watertighting, sampling, simplify.

Semantic rebuild of `utils/shapenet/{1_fuse_shapenetv2.py,
2_sample_mesh.py, 3_simplify_fusion.py}`:

stage *fuse*   — normalize mesh to the unit cube (padding 0.1), render
                 depth from Fibonacci-sphere views (640x640, f=640),
                 fuse a truncated SDF at `resolution`^3, marching-cubes
                 the zero level set back to the original frame
                 (`1_fuse_shapenetv2.py:16-176`).
stage *sample* — per watertight mesh, rescaled to the original bbox:
                 100k surface points (area-weighted, `pointcloud/`),
                 16^3 voxelization (`voxel/16/`), 100k occupancy points
                 (uniform in the padded box + surface + sigma noise)
                 labeled by containment, float16 + packbits (`point/`),
                 scaled mesh copy (`watertight_scaled/`)
                 (`2_sample_mesh.py:56-209`).
stage *simplify* — QEM simplification to `simplify_nfaces`
                 (`3_simplify_fusion.py`, meshlab replaced by the native
                 N9 library).

GPU renderer/fusion (librender OSMesa + pyfusion CUDA) are replaced by
the OpenMP host library (`meshing/src/prep.cpp`); the multiprocessing
Pool(8) fan-out over models is kept.
"""

from __future__ import annotations

import argparse
import os
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from rfdnet_tpu.data.binvox import Voxels, write_binvox  # noqa: E402
from rfdnet_tpu.meshing.mesh import TriMesh  # noqa: E402
from rfdnet_tpu.meshing.native import (  # noqa: E402
    marching_tetrahedra,
    points_in_mesh,
    render_depth,
    simplify_mesh,
    tsdf_fuse,
    voxelize_surface,
)

FOCAL = 640.0
IMAGE = 640
N_VIEWS = 100
PADDING = 0.1


def fibonacci_views(n_views: int = N_VIEWS) -> np.ndarray:
    """Evenly-distributed unit viewpoints (`1_fuse...:16-45`)."""
    rnd = 1.0
    points = []
    offset = 2.0 / n_views
    increment = np.pi * (3.0 - np.sqrt(5.0))
    for i in range(n_views):
        y = ((i * offset) - 1) + (offset / 2)
        r = np.sqrt(1 - y * y)
        phi = ((i + rnd) % n_views) * increment
        points.append([np.cos(phi) * r, y, np.sin(phi) * r])
    return np.array(points)


def look_at_pose(eye: np.ndarray) -> np.ndarray:
    """World->camera 4x4 for a camera at `eye` looking at the origin."""
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 1.0, 0.0])
    if abs(fwd @ up) > 0.99:
        up = np.array([1.0, 0.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd])  # rows: x right, y down, z forward
    M = np.eye(4)
    M[:3, :3] = R
    M[:3, 3] = -R @ eye
    return M


def watertight_fuse(mesh: TriMesh, resolution: int = 256,
                    n_views: int = N_VIEWS, truncation_factor: float = 10.0):
    """Mesh -> watertight mesh via multi-view depth + TSDF
    (`1_fuse...:108-143`). Returns (mesh, loc, scale) with the output in
    the ORIGINAL frame and loc/scale recording the normalization."""
    verts = np.asarray(mesh.vertices)
    center = (verts.max(0) + verts.min(0)) / 2.0
    scale = (verts.max(0) - verts.min(0)).max() / (1 - PADDING)
    norm = (verts - center) / scale  # in [-0.45, 0.45]

    cam_dist = 2.0
    eyes = fibonacci_views(n_views) * cam_dist
    depths = np.zeros((n_views, IMAGE, IMAGE), np.float32)
    poses = np.zeros((n_views, 4, 4))
    for i, eye in enumerate(eyes):
        poses[i] = look_at_pose(eye)
        depths[i] = render_depth(
            norm, mesh.faces, poses[i], FOCAL, IMAGE / 2.0, IMAGE / 2.0,
            IMAGE, IMAGE,
        )

    voxel_size = 1.0 / resolution
    truncation = truncation_factor * voxel_size
    bbox = np.array([-0.5, -0.5, -0.5, 0.5, 0.5, 0.5])
    tsdf = tsdf_fuse(depths, poses, FOCAL, IMAGE / 2.0, IMAGE / 2.0,
                     resolution, bbox, truncation)
    # zero level set; tsdf is + outside (in front), - inside
    v, f = marching_tetrahedra(-tsdf, 0.0)
    if len(v) == 0:
        return TriMesh(np.zeros((0, 3)), np.zeros((0, 3))), center, scale
    v = (v + 0.5) / resolution - 0.5  # index -> normalized coords
    v = v * scale + center
    return TriMesh(v, f), center, scale


def sample_surface(mesh: TriMesh, n: int, rng) -> np.ndarray:
    """Area-weighted surface sampling (trimesh.sample equivalent)."""
    v = np.asarray(mesh.vertices)
    f = np.asarray(mesh.faces)
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    probs = areas / areas.sum()
    idx = rng.choice(len(f), size=n, p=probs)
    r1 = np.sqrt(rng.rand(n, 1))
    r2 = rng.rand(n, 1)
    return (
        a[idx] * (1 - r1) + b[idx] * r1 * (1 - r2) + c[idx] * r1 * r2
    )


def sample_model(mesh: TriMesh, out_dirs: dict, catid: str, modelname: str,
                 points_size: int = 100_000, uniform_ratio: float = 0.5,
                 sigma: float = 0.01, voxel_res: int = 16, seed: int = 0):
    """Stage-2 exports for one watertight mesh (`2_sample_mesh.py:56-140`)."""
    rng = np.random.RandomState(seed)
    verts = np.asarray(mesh.vertices)
    loc = (verts.max(0) + verts.min(0)) / 2.0
    scale = (verts.max(0) - verts.min(0)).max() / (1 - PADDING)
    unit = TriMesh((verts - loc) / scale, mesh.faces)

    # pointcloud/: surface points + normals
    pc = sample_surface(unit, points_size, rng).astype(np.float16)
    np.savez(
        os.path.join(out_dirs["pointcloud"], f"{modelname}.npz"),
        points=pc, loc=loc.astype(np.float32), scale=np.float32(scale),
    )

    # voxel/<res>/: binvox occupancy of the unit mesh
    vsize = 1.0 / voxel_res
    surf = voxelize_surface(
        unit.vertices, unit.faces, np.full(3, -0.5), vsize,
        (voxel_res,) * 3,
    )
    from rfdnet_tpu.meshing.native import fill_interior

    vox = (surf | fill_interior(surf)).astype(bool)
    with open(
        os.path.join(out_dirs["voxel"], f"{modelname}.binvox"), "wb"
    ) as fh:
        write_binvox(fh, Voxels(vox, (voxel_res,) * 3, list(loc), scale))

    # point/: occupancy supervision points
    n_uniform = int(points_size * uniform_ratio)
    n_surface = points_size - n_uniform
    boxsize = 1 + PADDING
    pts_u = boxsize * (rng.rand(n_uniform, 3) - 0.5)
    pts_s = sample_surface(unit, n_surface, rng)
    pts_s += sigma * rng.randn(n_surface, 3)
    pts = np.concatenate([pts_u, pts_s]).astype(np.float32)
    occ = points_in_mesh(unit.vertices, unit.faces, pts)
    np.savez(
        os.path.join(out_dirs["point"], f"{modelname}.npz"),
        points=pts.astype(np.float16),
        occupancies=np.packbits(occ),
        loc=loc.astype(np.float32), scale=np.float32(scale),
    )

    # watertight_scaled/: mesh back at original scale
    mesh.export(
        os.path.join(out_dirs["watertight_scaled"], f"{modelname}.off")
    )


def process_model(args_tuple):
    in_path, out_root, catid, modelname, resolution, nfaces = args_tuple
    try:
        mesh = TriMesh.load(in_path)
        wt, loc, scale = watertight_fuse(mesh, resolution=resolution)
        out_dirs = {}
        for k, sub in [
            ("pointcloud", "pointcloud"), ("voxel", "voxel/16"),
            ("point", "point"), ("watertight_scaled", "watertight_scaled"),
            ("simplified", "watertight_scaled_simplified"),
        ]:
            d = os.path.join(out_root, sub, catid)
            os.makedirs(d, exist_ok=True)
            out_dirs[k] = d
        sample_model(wt, out_dirs, catid, modelname)
        sv, st = simplify_mesh(wt.vertices, wt.faces, nfaces)
        TriMesh(sv, st).export(
            os.path.join(out_dirs["simplified"], f"{modelname}.off")
        )
        return modelname, True, ""
    except Exception as e:  # keep the pool alive on bad models
        return modelname, False, str(e)


def main():
    p = argparse.ArgumentParser("shapenet prep: fuse + sample + simplify")
    p.add_argument("--in_root", required=True,
                   help="ShapeNetCore.v2 root (catid/modelid/models/*.obj|off)")
    p.add_argument("--out_root", required=True)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--nfaces", type=int, default=5000)
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()

    jobs = []
    for catid in sorted(os.listdir(args.in_root)):
        cdir = os.path.join(args.in_root, catid)
        if not os.path.isdir(cdir):
            continue
        for model in sorted(os.listdir(cdir)):
            for cand in ("model.off", "models/model_normalized.off"):
                path = os.path.join(cdir, model, cand)
                if os.path.exists(path):
                    jobs.append((path, args.out_root, catid, model,
                                 args.resolution, args.nfaces))
                    break
    print(f"{len(jobs)} models")
    with ProcessPoolExecutor(args.workers) as ex:
        for name, ok, err in ex.map(process_model, jobs):
            if not ok:
                print(f"FAILED {name}: {err}")


if __name__ == "__main__":
    main()
