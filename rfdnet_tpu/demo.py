"""Single-scene demo: raw .off scan in -> boxes + instance meshes out.

Semantic rebuild of `demo.py:24-420`: load a mesh/point scan, append the
height feature (floor = 0.99-percentile z), subsample to num_point,
run detection -> NMS -> skip-propagation -> per-proposal mesh generation,
optionally refit boxes to the scan, and dump
`proposal_<j>_mesh.ply` + `000000_pc.ply` + the NMS-filtered bbox npz
(the reference's checked-in outputs for scene0549_00 use this format).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from .eval.refit import fit_meshes_to_scan
from .eval.tester import place_mesh_in_box
from .meshing.generator import Generator3D
from .meshing.mesh import TriMesh, write_ply
from .models.iscnet import ISCNet


def load_demo_data(path: str, num_points: int = 80_000,
                   use_height: bool = True) -> dict:
    """`demo.py:24-48`: .off/.ply scan -> (1, N, 3+height) float32."""
    mesh = TriMesh.load(path)
    points = np.asarray(mesh.vertices, dtype=np.float32)
    if use_height:
        floor = np.percentile(points[:, 2], 0.99)
        points = np.concatenate(
            [points, (points[:, 2] - floor)[:, None]], axis=1
        )
    # deterministic subsample (demo parity: the reference seeds numpy
    # globally before sampling)
    rng = np.random.RandomState(10)
    n = points.shape[0]
    choice = rng.choice(n, num_points, replace=n < num_points)
    return {"point_clouds": points[choice][None]}


def generate(cfg, model: ISCNet, variables, data: dict,
             post_processing: bool = False):
    """Detection + completion + mesh extraction for one scene
    (`demo.py:200-276`). Returns (parsed, gen, meshes)."""
    ec = cfg.eval_config
    gen_cfg = cfg.config["generation"]

    fn = jax.jit(
        lambda v, pc: model.apply(
            v, pc, method=ISCNet.generate_detections, mutable=False,
            nms_iou=ec["nms_iou"], use_cls_nms=ec["cls_nms"],
        )
    )
    end_points, prop_feats, parsed = fn(
        variables, jax.numpy.asarray(data["point_clouds"])
    )
    gen = model.apply(
        variables, end_points, prop_feats, parsed,
        {"point_clouds": jax.numpy.asarray(data["point_clouds"])},
        method=ISCNet.generate_completion, mutable=False,
        dump_threshold=gen_cfg["dump_threshold"],
    )
    parsed = {k: np.asarray(v) for k, v in parsed.items()}
    gen = {k: np.asarray(v) for k, v in gen.items()}

    z_rng = (jax.random.PRNGKey(42)
             if gen_cfg.get("use_sampling") else None)
    decode = jax.jit(
        lambda f, c, p: model.apply(
            variables, f, c, p, method=ISCNet.decode_occupancy,
            mutable=False, rng=z_rng,
        )
    )
    generator = Generator3D(
        decode, threshold=cfg.config["data"]["threshold"],
        resolution0=gen_cfg["resolution_0"],
        upsampling_steps=gen_cfg["upsampling_steps"],
        refinement_step=gen_cfg.get("refinement_step", 0) or 0,
        simplify_nfaces=gen_cfg.get("simplify_nfaces"),
        with_normals=gen_cfg.get("with_normals", False),
    )
    meshes = generator.generate_meshes(
        gen["features"], gen["cls_codes"], valid=gen["valid"].reshape(-1)
    )
    if post_processing:
        parsed = fit_meshes_to_scan(
            parsed, meshes, gen["proposal_ids"], gen["valid"],
            np.asarray(data["point_clouds"]), gen_cfg["dump_threshold"],
        )
    return parsed, gen, meshes


def save_visualization(cfg, data, parsed, gen, meshes, out_dir: str):
    """`demo.py:278-327`: scene pc ply, per-proposal mesh plys, bbox npz."""
    os.makedirs(out_dir, exist_ok=True)
    pc = np.asarray(data["point_clouds"])[0, :, :3]
    write_ply(os.path.join(out_dir, "000000_pc.ply"), pc,
              np.zeros((0, 3), np.int32))

    from .eval.refit import _box_params_from_corners

    B, G, _ = gen["proposal_ids"].shape
    boxes, proposal_map = [], []
    for g in range(G):
        if not gen["valid"][0, g]:
            continue
        j = int(gen["proposal_ids"][0, g, 0])
        mesh = meshes[g]
        if len(mesh.vertices):
            placed = place_mesh_in_box(
                mesh, parsed["pred_corners_3d_upright_camera"][0, j]
            )
            placed.export(os.path.join(out_dir, f"proposal_{j}_mesh.ply"))
        # 7-param [center, size, heading] depth-frame box + proposal id
        # (the reference's 000000_pred_confident_nms_bbox.npz contract:
        # obbs (K, 7) + proposal_map (K, 1))
        boxes.append(
            _box_params_from_corners(
                parsed["pred_corners_3d_upright_camera"][0, j]
            )
        )
        proposal_map.append([j])
    np.savez(
        os.path.join(out_dir, "000000_pred_confident_nms_bbox.npz"),
        obbs=np.array(boxes), proposal_map=np.array(proposal_map),
    )

    # interactive WebGL inspector (the reference demo's VTK window,
    # `demo.py:329-377`) — instance-colored meshes + boxes, depth frame
    from .eval.box_util import flip_axis_to_depth
    from .utils.scene_viz import SceneRender, corners_to_center_vectors

    centers, vectors, placed_meshes = [], [], []
    for g in range(G):
        if not gen["valid"][0, g]:
            continue
        j = int(gen["proposal_ids"][0, g, 0])
        corners = flip_axis_to_depth(
            parsed["pred_corners_3d_upright_camera"][0, j]
        )
        c, vec = corners_to_center_vectors(corners)
        centers.append(c)
        vectors.append(vec)
        mesh = meshes[g]
        if len(mesh.vertices):
            m = place_mesh_in_box(
                mesh, parsed["pred_corners_3d_upright_camera"][0, j]
            )
            placed_meshes.append(
                (flip_axis_to_depth(np.asarray(m.vertices)),
                 np.asarray(m.faces))
            )
        else:
            placed_meshes.append(
                (np.zeros((0, 3)), np.zeros((0, 3), np.int64))
            )
    SceneRender(
        pc, meshes=placed_meshes, centers=centers, vectors=vectors,
        class_ids=[0] * len(centers),
    ).export_html(
        os.path.join(out_dir, "scene.html"),
        title=os.path.basename(out_dir), color_mode="instance",
    )
    return out_dir


def visualize(data, parsed, gen, meshes, out_path: str):
    """Offscreen scene render -> pred.png (`demo.py:329-377` uses VTK;
    vtk is absent in this toolchain so matplotlib renders the scan points,
    NMS boxes, and placed instance meshes)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    from .eval.box_util import flip_axis_to_depth

    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(projection="3d")
    pc = np.asarray(data["point_clouds"])[0, :, :3]
    sub = pc[:: max(1, len(pc) // 20000)]
    ax.scatter(sub[:, 0], sub[:, 1], sub[:, 2], s=0.3, c=sub[:, 2],
               cmap="gray", alpha=0.5)

    cmap = plt.get_cmap("tab20")
    G = gen["proposal_ids"].shape[1]
    for g in range(G):
        if not gen["valid"][0, g]:
            continue
        j = int(gen["proposal_ids"][0, g, 0])
        color = cmap(g % 20)
        corners = flip_axis_to_depth(
            parsed["pred_corners_3d_upright_camera"][0, j]
        )
        for a, b in [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6),
                     (6, 7), (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]:
            ax.plot(*zip(corners[a], corners[b]), c=color, lw=1.0)
        mesh = meshes[g]
        if len(mesh.vertices):
            placed = place_mesh_in_box(
                mesh, parsed["pred_corners_3d_upright_camera"][0, j]
            )
            tri = placed.vertices[placed.faces[:: max(1, len(placed.faces)
                                                      // 2000)]]
            ax.add_collection3d(
                Poly3DCollection(tri, facecolor=color, alpha=0.6,
                                 edgecolor="none")
            )
    ax.view_init(elev=55, azim=-60)
    ax.set_axis_off()
    rng_pts = pc.max(0) - pc.min(0)
    ax.set_box_aspect(rng_pts)
    plt.tight_layout()
    plt.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def run(cfg, demo_path: str):
    """`demo.py:379-420`."""
    import time

    from .cli import _restore_variables

    t0 = time.time()
    data = load_demo_data(
        demo_path, num_points=cfg.config["data"]["num_point"],
        use_height=not cfg.config["data"]["no_height"],
    )
    model = cfg.build_model()
    variables = _restore_variables(cfg, model, data)
    parsed, gen, meshes = generate(cfg, model, variables, data)
    scene = os.path.splitext(os.path.basename(demo_path))[0]
    out_dir = os.path.join(
        cfg.save_path or "out/demo", "visualization", scene
    )
    save_visualization(cfg, data, parsed, gen, meshes, out_dir)
    visualize(data, parsed, gen, meshes, os.path.join(out_dir, "pred.png"))
    cfg.log_string(f"Time elapsed: {time.time() - t0:.2f}s -> {out_dir}")
    return out_dir
