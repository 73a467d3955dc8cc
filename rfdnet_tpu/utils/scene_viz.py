"""Scene visualization suite — GT verification and pred-vs-GT comparison.

Rebuilds the capability of the reference's VTK renderers
(`utils/scannet/visualization/vis_gt.py:24-335`,
`vis_for_comparison.py:19-372`, `vis_scan2cad.py:27-286`) without VTK
(absent from this toolchain): matplotlib offscreen renders for PNGs plus
combined colored-PLY dumps for interactive inspection in any mesh viewer.

Feature parity targets:
- depth-colored scene point cloud (the reference's crest_r palette,
  `vis_gt.py:37,160-162`),
- instance meshes colored by semantic class with an hls palette over the
  8 ScanNet classes (`vis_gt.py:36,180-184`),
- translucent class-colored oriented bounding boxes (`vis_gt.py:188-196`),
- per-box orientation arrows (RGB = the three box axes,
  `vis_gt.py:198-203`),
- `only_points` mode and pred/gt instance-color mode
  (`vis_for_comparison.py:135-204`),
- side-by-side pred-vs-GT comparison figure (what the reference produces
  as two separate renders from `vis_for_comparison.py visualize`).

All geometry is in the scene/depth frame (z up). Boxes are given either
as (center, 3 half-edge vectors) like the preprocessed `bbox.pkl`
entries, or as 7-param [center, size, heading] via `box7_to_vectors`.
"""

from __future__ import annotations

import colorsys
import os

import numpy as np

__all__ = [
    "hls_palette",
    "box7_to_vectors",
    "corners_to_center_vectors",
    "place_canonical_mesh_in_box7",
    "SceneRender",
    "render_gt_scene",
    "render_comparison",
]


def corners_to_center_vectors(corners: np.ndarray):
    """(8,3) box corners (VoteNet `get_3d_box` / `_corners` adjacency:
    corners 1, 3, 4 adjacent to corner 0) -> (center, 3 half-edge
    vectors) in the `bbox.pkl` convention."""
    corners = np.asarray(corners, np.float64)
    center = corners.mean(axis=0)
    vectors = np.stack([
        (corners[1] - corners[0]) / 2.0,
        (corners[3] - corners[0]) / 2.0,
        (corners[4] - corners[0]) / 2.0,
    ])
    return center, vectors


def hls_palette(n: int, h: float = 0.01, l: float = 0.6, s: float = 0.65):
    """Evenly-spaced-hue palette, matching seaborn's `hls` defaults used
    throughout the reference viz (`vis_gt.py:36`)."""
    hues = (np.linspace(0.0, 1.0, n, endpoint=False) + h) % 1.0
    return np.array([colorsys.hls_to_rgb(hh, l, s) for hh in hues])


def box7_to_vectors(box7: np.ndarray):
    """7-param depth-frame box [cx,cy,cz,sx,sy,sz,heading] -> (center,
    3 half-edge vectors) in the `bbox.pkl` convention (`tools.py:34-43`:
    columns of R scaled by half sizes)."""
    center = np.asarray(box7[:3], np.float64)
    half = np.asarray(box7[3:6], np.float64) / 2.0
    a = float(box7[6])
    c, s = np.cos(a), np.sin(a)
    R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    vectors = (R * half[None, :]).T  # row i = half-edge vector i
    return center, vectors


def place_canonical_mesh_in_box7(vertices: np.ndarray, box7: np.ndarray):
    """Place a canonical [-0.5, 0.5]^3 mesh into a 7-param depth-frame
    box: scale by size, z-rotate by heading, translate to center (the
    depth-frame analogue of `ap_helper.py:404-426`
    fit_shapenet_obj_to_votenet_box)."""
    center, vectors = box7_to_vectors(np.asarray(box7, np.float64))
    # vectors rows are half-edges: world = v @ (2*vectors) + center
    return np.asarray(vertices, np.float64) @ (2.0 * vectors) + center


_BOX_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
              (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]
_BOX_FACES = [(0, 1, 2, 3), (4, 5, 6, 7), (0, 1, 5, 4), (1, 2, 6, 5),
              (2, 3, 7, 6), (3, 0, 4, 7)]


def _corners(center, vectors):
    c = np.asarray(center, np.float64)
    v0, v1, v2 = np.asarray(vectors, np.float64)
    return np.array([
        c - v0 - v1 - v2, c + v0 - v1 - v2, c + v0 + v1 - v2,
        c - v0 + v1 - v2, c - v0 - v1 + v2, c + v0 - v1 + v2,
        c + v0 + v1 + v2, c - v0 + v1 + v2,
    ])


class SceneRender:
    """One renderable scene: points + instance meshes + oriented boxes.

    scene_points: (N, >=3) scan points.
    meshes: list of (vertices (V,3), faces (F,3)) in the SCENE frame
        (use `place_canonical_mesh_in_box7` first for canonical meshes).
    centers / vectors: per-instance box center (3,) and half-edge
        vectors (3,3) (`bbox.pkl` convention).
    class_ids: per-instance index into the 8-class palette.
    """

    def __init__(self, scene_points, meshes=(), centers=(), vectors=(),
                 class_ids=(), num_classes: int = 8):
        self.scene_points = np.asarray(scene_points, np.float64)[:, :3]
        self.meshes = [
            (np.asarray(v, np.float64), np.asarray(f, np.int64))
            for v, f in meshes
        ]
        self.centers = [np.asarray(c, np.float64) for c in centers]
        self.vectors = [np.asarray(v, np.float64) for v in vectors]
        self.class_ids = [int(c) for c in class_ids]
        self.palette_cls = hls_palette(num_classes)
        self.palette_inst = hls_palette(10)

    # ------------------------------------------------------------ colors
    def _depth_colors(self, centroid):
        import matplotlib

        d = np.linalg.norm(self.scene_points - centroid, axis=1)
        lo, hi = d.min(), d.max()
        t = (d - lo) / (hi - lo) if hi > lo else np.zeros_like(d)
        # crest_r analogue: dark blue-green near, light far
        return matplotlib.colormaps["viridis_r"](t)[:, :3]

    def _inst_color(self, i):
        return self.palette_inst[i % len(self.palette_inst)]

    def _cls_color(self, i):
        return self.palette_cls[self.class_ids[i] % len(self.palette_cls)]

    # ------------------------------------------------------------ render
    def render(self, save_path: str | None = None,
               centroid=np.array([0.0, -2.5, 2.5]), only_points=False,
               color_mode: str = "class", max_points: int = 20000,
               show_boxes=True, show_arrows=True, ax=None,
               title: str | None = None):
        """Offscreen matplotlib render (the reference's
        `visualize(centroid, save_path, only_points)` contract,
        `vis_gt.py:230-253`). color_mode: 'class' (vis_gt) or 'instance'
        (vis_for_comparison pred/gt modes)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection

        own_fig = ax is None
        if own_fig:
            fig = plt.figure(figsize=(12, 8))
            ax = fig.add_subplot(projection="3d")
        pts = self.scene_points
        step = max(1, len(pts) // max_points)
        sub = pts[::step]
        colors = self._depth_colors(np.asarray(centroid, np.float64))[::step]
        ax.scatter(sub[:, 0], sub[:, 1], sub[:, 2], s=0.4, c=colors,
                   alpha=0.3, linewidths=0)

        if not only_points:
            for i, (v, f) in enumerate(self.meshes):
                if len(v) == 0 or len(f) == 0:
                    continue
                color = (self._cls_color(i) if color_mode == "class"
                         else self._inst_color(i))
                fs = f[:: max(1, len(f) // 3000)]
                ax.add_collection3d(Poly3DCollection(
                    v[fs], facecolor=color, alpha=0.85,
                    edgecolor="none",
                ))
            if show_boxes:
                for i, (c, vec) in enumerate(zip(self.centers,
                                                 self.vectors)):
                    color = (self._cls_color(i) if color_mode == "class"
                             else self._inst_color(i))
                    corners = _corners(c, vec)
                    # translucent faces (`vis_gt.py:188-196` SetOpacity(0.2))
                    ax.add_collection3d(Poly3DCollection(
                        [corners[list(face)] for face in _BOX_FACES],
                        facecolor=color, alpha=0.12, edgecolor=color,
                        linewidths=0.8,
                    ))
                    if show_arrows:
                        # RGB arrows for the three box axes
                        # (`vis_gt.py:198-203`)
                        for k, ac in enumerate(["r", "g", "b"]):
                            d = vec[k]
                            n = np.linalg.norm(d)
                            if n < 1e-9:
                                continue
                            d = d / n * 0.5
                            ax.quiver(*c, *d, color=ac, linewidth=1.2,
                                      arrow_length_ratio=0.25)

        ax.set_box_aspect((1, 1, 0.5))
        lo = pts.min(axis=0)
        hi = pts.max(axis=0)
        mid = (lo + hi) / 2
        r = (hi - lo).max() / 2
        ax.set_xlim(mid[0] - r, mid[0] + r)
        ax.set_ylim(mid[1] - r, mid[1] + r)
        ax.set_zlim(mid[2] - r / 2, mid[2] + r / 2)
        ax.view_init(elev=45, azim=-60)
        ax.set_axis_off()
        if title:
            ax.set_title(title)
        if own_fig:
            if save_path is not None:
                fig.savefig(save_path, dpi=110, bbox_inches="tight")
            plt.close(fig)
        return save_path

    # --------------------------------------------------------------- ply
    def export_ply(self, path: str, color_mode: str = "class",
                   max_points: int = 100000):
        """Combined colored scene dump (points gray + meshes colored) for
        interactive viewing — the stand-in for the reference's interactive
        VTK window."""
        pts = self.scene_points
        step = max(1, len(pts) // max_points)
        sub = pts[::step]
        verts = [sub]
        vcols = [np.full((len(sub), 3), 160, np.uint8)]
        faces = []
        off = len(sub)
        for i, (v, f) in enumerate(self.meshes):
            if len(v) == 0:
                continue
            color = (self._cls_color(i) if color_mode == "class"
                     else self._inst_color(i))
            verts.append(v)
            vcols.append(np.tile((np.asarray(color) * 255).astype(np.uint8),
                                 (len(v), 1)))
            faces.append(np.asarray(f, np.int64) + off)
            off += len(v)
        allv = np.vstack(verts)
        allc = np.vstack(vcols)
        allf = (np.vstack(faces) if faces
                else np.zeros((0, 3), np.int64))
        with open(path, "wb") as fh:
            header = (
                "ply\nformat binary_little_endian 1.0\n"
                f"element vertex {len(allv)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\n"
                "property uchar blue\n"
                f"element face {len(allf)}\n"
                "property list uchar int vertex_indices\nend_header\n"
            )
            fh.write(header.encode("ascii"))
            rec = np.zeros(len(allv), dtype=[("xyz", "<f4", 3),
                                             ("rgb", "u1", 3)])
            rec["xyz"] = allv
            rec["rgb"] = allc
            fh.write(rec.tobytes())
            frec = np.zeros(len(allf), dtype=[("n", "u1"),
                                              ("idx", "<i4", 3)])
            frec["n"] = 3
            frec["idx"] = allf
            fh.write(frec.tobytes())
        return path

    # -------------------------------------------------------------- html
    def export_html(self, path: str, title: str = "scene",
                    class_names=(), color_mode: str = "class",
                    max_points: int = 120000):
        """Interactive WebGL export (the reference's VTK window
        equivalent, `vis_scannet.py:23-369`) — see
        `utils/scene_html.py`."""
        from .scene_html import export_scene_html

        return export_scene_html(
            self, path, title=title, class_names=class_names,
            color_mode=color_mode, max_points=max_points,
        )


def render_gt_scene(scene_dir: str, save_path: str,
                    shapenet_mesh_fn=None, only_points=False):
    """Verify preprocessed data (the reference README's "Verify..." step,
    `vis_gt.py __main__:320-335`): load a prepared scene
    (`full_scan.npz` + `bbox.pkl` as written by `tools/prep/scannet.py`)
    and render scan + oriented boxes (+ CAD meshes placed into their
    boxes when `shapenet_mesh_fn(catid, id) -> (verts, faces)` is given).

    Also drops a colored PLY next to the PNG for interactive viewing."""
    import pickle

    from ..config.scannet import ScanNet_OBJ_CLASS_IDS

    scan = np.load(os.path.join(scene_dir, "full_scan.npz"))
    with open(os.path.join(scene_dir, "bbox.pkl"), "rb") as f:
        instances = pickle.load(f)

    cls_index = {int(c): i for i, c in enumerate(ScanNet_OBJ_CLASS_IDS)}
    centers, vectors, class_ids, meshes = [], [], [], []
    for inst in instances:
        box7 = np.asarray(inst["box3D"], np.float64)
        c, vec = box7_to_vectors(box7)
        centers.append(c)
        vectors.append(vec)
        class_ids.append(cls_index.get(int(inst["cls_id"]),
                                       int(inst["cls_id"]) % 8))
        if shapenet_mesh_fn is not None:
            mv, mf = shapenet_mesh_fn(inst["shapenet_catid"],
                                      inst["shapenet_id"])
            meshes.append((place_canonical_mesh_in_box7(mv, box7), mf))

    render = SceneRender(
        scan["mesh_vertices"][:, :3], meshes=meshes, centers=centers,
        vectors=vectors, class_ids=class_ids,
    )
    render.render(save_path, only_points=only_points)
    render.export_ply(os.path.splitext(save_path)[0] + ".ply")
    from ..config.scannet import SHAPENETCLASSES

    render.export_html(
        os.path.splitext(save_path)[0] + ".html",
        title=os.path.basename(scene_dir.rstrip("/")),
        class_names=[SHAPENETCLASSES[c] for c in ScanNet_OBJ_CLASS_IDS],
    )
    return save_path


def render_comparison(pred: SceneRender, gt: SceneRender,
                      save_path: str,
                      centroid=np.array([0.0, -2.5, 2.5])):
    """Side-by-side pred-vs-GT figure (the capability of
    `vis_for_comparison.py:19-372`, which renders 'pred' and 'gt' modes
    as separate windows). Instance coloring, shared viewpoint."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(20, 8))
    ax1 = fig.add_subplot(1, 2, 1, projection="3d")
    ax2 = fig.add_subplot(1, 2, 2, projection="3d")
    pred.render(ax=ax1, centroid=centroid, color_mode="instance",
                title="prediction")
    gt.render(ax=ax2, centroid=centroid, color_mode="instance",
              title="ground truth")
    os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
    fig.savefig(save_path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return save_path
