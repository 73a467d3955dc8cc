"""ScanNet + Scan2CAD offline preparation (L0).

Semantic rebuild of `utils/scannet/{gen_scannet_w_orientation.py,
load_scannet_data.py, scannet_utils.py, tools.py, split_data.py}`:

per Scan2CAD annotation: axis-align the scan, transform each aligned
ShapeNet CAD into the scan frame, rectify its axes to gravity, emit a
7-DoF oriented box [center, size, heading], match it to a ScanNet
instance by cuboid IoU, accumulate up to 3 per-point center votes
(N x 10: mask + 3 votes), and write `bbox.pkl` + `full_scan.npz`;
finally average per-class box sizes into `scannet_means.npz` and build
the train/val split JSONs.

Dependency swaps: `numpy-quaternion` -> a 10-line quaternion-to-matrix;
`shapely` cuboid IoU -> the Sutherland-Hodgman BEV clip already in
`rfdnet_tpu.eval.box_util`; `plyfile` -> a numpy PLY reader.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import pickle
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from rfdnet_tpu.config.scannet import (  # noqa: E402
    SHAPENETCLASSES,
    ScanNet_OBJ_CLASS_IDS,
    ShapeNetIDMap,
)
from rfdnet_tpu.eval.box_util import poly_area, polygon_clip  # noqa: E402

OBJ_CLASS_IDS = ScanNet_OBJ_CLASS_IDS


# ------------------------------------------------------------- geometry
def quaternion_matrix(q) -> np.ndarray:
    """Unit quaternion [w, x, y, z] -> 3x3 rotation matrix."""
    w, x, y, z = np.asarray(q, dtype=np.float64)
    n = w * w + x * x + y * y + z * z
    if n < 1e-12:
        return np.eye(3)
    s = 2.0 / n
    return np.array([
        [1 - s * (y * y + z * z), s * (x * y - w * z), s * (x * z + w * y)],
        [s * (x * y + w * z), 1 - s * (x * x + z * z), s * (y * z - w * x)],
        [s * (x * z - w * y), s * (y * z + w * x), 1 - s * (x * x + y * y)],
    ])


def make_M_from_tqs(t, q, s) -> np.ndarray:
    """Scan2CAD TRS -> 4x4 (`tools.py:8-18`)."""
    M = np.eye(4)
    M[:3, :3] = quaternion_matrix(q) @ np.diag(s)
    M[:3, 3] = t
    return M


def normalize(v):
    return v / np.linalg.norm(v)


def get_box_corners(center, vectors):
    """Center + half-edge vectors -> 8 corners, bottom 0-3 / top 4-7
    (`tools.py:106-124` ordering)."""
    c = np.asarray(center)
    v0, v1, v2 = np.asarray(vectors)
    return np.array([
        c - v0 - v1 - v2, c + v0 - v1 - v2, c + v0 + v1 - v2, c - v0 + v1 - v2,
        c - v0 - v1 + v2, c + v0 - v1 + v2, c + v0 + v1 + v2, c - v0 + v1 + v2,
    ])


def get_iou_cuboid(cu1: np.ndarray, cu2: np.ndarray) -> float:
    """Cuboid IoU: BEV polygon intersection x z-overlap (`tools.py:61-94`,
    shapely replaced by polygon_clip)."""
    p1 = [tuple(cu1[i, :2]) for i in range(4)]
    p2 = [tuple(cu2[i, :2]) for i in range(4)]
    inter = polygon_clip(p1, p2)
    if inter is None:
        inter_2d = 0.0
    else:
        inter = np.array(inter)
        inter_2d = poly_area(inter[:, 0], inter[:, 1])
    zmin = max(cu1[0, 2], cu2[0, 2])
    zmax = min(cu1[4, 2], cu2[4, 2])
    inter_vol = inter_2d * max(0.0, zmax - zmin)
    a1 = poly_area(np.array([p[0] for p in p1]), np.array([p[1] for p in p1]))
    a2 = poly_area(np.array([p[0] for p in p2]), np.array([p[1] for p in p2]))
    vol1 = a1 * (cu1[4, 2] - cu1[0, 2])
    vol2 = a2 * (cu2[4, 2] - cu2[0, 2])
    denom = vol1 + vol2 - inter_vol
    return inter_vol / denom if denom > 0 else 0.0


def points_in_obb(points, corners) -> np.ndarray:
    """Boolean mask of points inside the (convex) corner box — replaces
    the Delaunay in_hull test for boxes."""
    # build the box frame from corners (bottom 0-3, top 4-7)
    origin = corners[0]
    ex = corners[1] - corners[0]
    ey = corners[3] - corners[0]
    ez = corners[4] - corners[0]
    M = np.stack([ex, ey, ez], axis=1)  # local -> world
    local = (points - origin) @ np.linalg.inv(M).T
    return np.all((local >= -1e-9) & (local <= 1 + 1e-9), axis=1)


# ---------------------------------------------------------------- loaders
def read_mesh_vertices_rgb(path: str) -> np.ndarray:
    """ScanNet _vh_clean_2.ply -> (N, 6) xyz + rgb (binary-little PLY with
    x y z red green blue [alpha...] vertex properties)."""
    with open(path, "rb") as f:
        data = f.read()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:end].decode("ascii", errors="replace").splitlines()
    n_vert = 0
    props = []
    cur = None
    tmap = {"float": "<f4", "double": "<f8", "uchar": "u1", "uint8": "u1",
            "int": "<i4", "uint": "<u4", "short": "<i2", "ushort": "<u2",
            "char": "i1"}
    for line in header:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "element":
            cur = parts[1]
            if cur == "vertex":
                n_vert = int(parts[2])
        elif parts[0] == "property" and cur == "vertex":
            props.append((parts[2], tmap[parts[1]]))
    dtype = np.dtype(props)
    raw = np.frombuffer(data, dtype=dtype, count=n_vert, offset=end)
    out = np.zeros((n_vert, 6), np.float64)
    for i, k in enumerate(["x", "y", "z", "red", "green", "blue"]):
        out[:, i] = raw[k]
    return out


def read_label_map(tsv_path: str, label_from="raw_category",
                   label_to="nyu40id") -> dict:
    """scannetv2-labels.combined.tsv -> {raw label: mapped id}
    (`scannet_utils.py:33-51`)."""
    mapping = {}
    with open(tsv_path) as f:
        for row in csv.DictReader(f, delimiter="\t"):
            try:
                mapping[row[label_from]] = int(row[label_to])
            except (ValueError, KeyError):
                mapping[row[label_from]] = 0
    return mapping


def read_obj_vertices(path: str) -> np.ndarray:
    verts = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
    return np.array(verts)


def load_axis_align_matrix(meta_file: str) -> np.ndarray:
    for line in open(meta_file):
        if "axisAlignment" in line:
            vals = [float(x) for x in
                    line.rstrip().strip("axisAlignment = ").split(" ")]
            return np.array(vals).reshape(4, 4)
    return np.eye(4)


def export_scan(mesh_file, agg_file, seg_file, meta_file, label_map):
    """`load_scannet_data.py:61-128`: aligned vertices, per-vertex
    semantic + instance labels, per-instance AABBs."""
    mesh_vertices = read_mesh_vertices_rgb(mesh_file)
    axis_align = load_axis_align_matrix(meta_file)
    pts = np.concatenate(
        [mesh_vertices[:, :3], np.ones((len(mesh_vertices), 1))], axis=1
    )
    mesh_vertices[:, :3] = (pts @ axis_align.T)[:, :3]

    with open(agg_file) as f:
        agg = json.load(f)
    object_id_to_segs, label_to_segs = {}, {}
    for obj in agg["segGroups"]:
        oid = obj["objectId"] + 1
        object_id_to_segs[oid] = obj["segments"]
        label_to_segs.setdefault(obj["label"], []).extend(obj["segments"])
    with open(seg_file) as f:
        seg = json.load(f)
    seg_to_verts = {}
    for v, s in enumerate(seg["segIndices"]):
        seg_to_verts.setdefault(s, []).append(v)
    num_verts = len(seg["segIndices"])

    label_ids = np.zeros(num_verts, np.uint32)
    for label, segs in label_to_segs.items():
        lid = label_map.get(label, 0)
        for s in segs:
            label_ids[seg_to_verts.get(s, [])] = lid
    instance_ids = np.zeros(num_verts, np.uint32)
    obj_to_label = {}
    for oid, segs in object_id_to_segs.items():
        for s in segs:
            verts = seg_to_verts.get(s, [])
            instance_ids[verts] = oid
            if oid not in obj_to_label and verts:
                obj_to_label[oid] = label_ids[verts[0]]
    bboxes = []
    for oid in sorted(object_id_to_segs):
        pc = mesh_vertices[instance_ids == oid, :3]
        if len(pc) == 0:
            bboxes.append(np.zeros(7))
            continue
        mn, mx = pc.min(0), pc.max(0)
        bboxes.append(np.concatenate(
            [(mn + mx) / 2, mx - mn, [obj_to_label.get(oid, 0)]]
        ))
    return mesh_vertices, label_ids, instance_ids, np.array(bboxes)


# ------------------------------------------------------------------ votes
def accumulate_votes(box3D, mesh_vertices, point_votes, point_vote_idx):
    """`gen_scannet_w_orientation.py:24-47`: up to 3 center votes per
    point inside the oriented box."""
    center = box3D[:3]
    o = box3D[6]
    axis = np.array([[np.cos(o), np.sin(o), 0],
                     [-np.sin(o), np.cos(o), 0], [0, 0, 1]])
    vectors = np.diag(box3D[3:6] / 2.0) @ axis
    corners = get_box_corners(center, vectors)
    inds = points_in_obb(mesh_vertices[:, :3], corners)
    point_votes[inds, 0] = 1
    votes = center[None] - mesh_vertices[inds, :3]
    sparse = np.nonzero(inds)[0]
    for i, j in enumerate(sparse):
        k = point_vote_idx[j]
        point_votes[j, 3 * k + 1 : 3 * k + 4] = votes[i]
        if k == 0:
            point_votes[j, 4:7] = votes[i]
            point_votes[j, 7:10] = votes[i]
    point_vote_idx[sparse] = np.minimum(2, point_vote_idx[sparse] + 1)


# --------------------------------------------------------------- pipeline
def generate_scene(annotation: dict, scans_root: str, shapenet_root: str,
                   label_map: dict, out_root: str):
    """One Scan2CAD annotation -> bbox.pkl + full_scan.npz
    (`gen_scannet_w_orientation.py:49-194`). Returns per-class sizes."""
    scene = annotation["id_scan"]
    out_dir = os.path.join(out_root, scene)
    os.makedirs(out_dir, exist_ok=True)
    bbox_path = os.path.join(out_dir, "bbox.pkl")
    scan_path = os.path.join(out_dir, "full_scan.npz")
    if os.path.isfile(bbox_path) and os.path.isfile(scan_path):
        return None

    folder = os.path.join(scans_root, scene)
    meta = os.path.join(folder, scene + ".txt")
    axis_align = load_axis_align_matrix(meta)
    Mscan = make_M_from_tqs(
        annotation["trs"]["translation"], annotation["trs"]["rotation"],
        annotation["trs"]["scale"],
    )
    R_transform = axis_align @ np.linalg.inv(Mscan)

    mesh_vertices, _, instance_labels, instance_bboxes = export_scan(
        os.path.join(folder, scene + "_vh_clean_2.ply"),
        os.path.join(folder, scene + ".aggregation.json"),
        os.path.join(folder, scene + "_vh_clean_2.0.010000.segs.json"),
        meta, label_map,
    )

    N = len(mesh_vertices)
    point_votes = np.zeros((N, 10))
    point_vote_idx = np.zeros(N, np.int32)
    mean_sizes = {int(c): [] for c in OBJ_CLASS_IDS}
    instances = []

    for model in annotation["aligned_models"]:
        catid = model["catid_cad"]
        cls_id = SHAPENETCLASSES.index(ShapeNetIDMap[catid[1:]])
        if cls_id not in OBJ_CLASS_IDS:
            continue
        obj_path = os.path.join(
            shapenet_root, catid, model["id_cad"],
            "models", "model_normalized.obj",
        )
        obj_points = read_obj_vertices(obj_path)
        Mcad = make_M_from_tqs(
            model["trs"]["translation"], model["trs"]["rotation"],
            model["trs"]["scale"],
        )
        T = R_transform @ Mcad

        center = (obj_points.max(0) + obj_points.min(0)) / 2.0
        axis_pts = np.array([
            center, center - [0, 0, 1], center - [1, 0, 0],
            center + [0, 1, 0],
        ])
        tp = np.concatenate(
            [axis_pts, np.ones((4, 1))], axis=1
        ) @ T.T
        tp = tp[:, :3]
        center_t = tp[0]
        axes_t = np.array([
            normalize(tp[1] - tp[0]),  # forward
            normalize(tp[2] - tp[0]),  # left
            normalize(tp[3] - tp[0]),  # up
        ])
        # rectify to gravity (`gen...:136-148`)
        up_id = int(np.argmax(axes_t[:, 2]))
        fwd_id = 0 if up_id != 0 else 1
        left_id = int(np.setdiff1d([0, 1, 2], [up_id, fwd_id])[0])
        if np.linalg.norm(axes_t[fwd_id][:2]) < 1e-8:
            # degenerate: chosen forward is vertical (the reference would
            # NaN here; unseen in real Scan2CAD) — use the other
            # horizontal axis as forward
            fwd_id, left_id = left_id, fwd_id
        fwd = np.array([*axes_t[fwd_id][:2], 0.0])
        fwd = normalize(fwd)
        up = np.array([0.0, 0.0, 1.0])
        left = np.cross(up, fwd)
        axis_rect = np.zeros((3, 3))
        axis_rect[fwd_id] = fwd
        axis_rect[left_id] = left
        axis_rect[up_id] = up
        if np.linalg.det(axis_rect) < 0:
            axis_rect[left_id] *= -1

        pts_t = np.concatenate(
            [obj_points, np.ones((len(obj_points), 1))], axis=1
        ) @ T.T
        coords = (pts_t[:, :3] - center_t) @ axes_t.T
        sizes = coords.max(0) - coords.min(0)
        box3D = np.concatenate([
            center_t, sizes[[fwd_id, left_id, up_id]],
            [np.arctan2(fwd[1], fwd[0])],
        ])
        mean_sizes[cls_id].append(box3D[3:6])

        # match scan instance by cuboid IoU (`gen...:163-178`)
        o = box3D[6]
        axis = np.array([[np.cos(o), np.sin(o), 0],
                         [-np.sin(o), np.cos(o), 0], [0, 0, 1]])
        vectors = np.diag(box3D[3:6] / 2.0) @ axis
        cad_corners = get_box_corners(box3D[:3], vectors)
        best_iou, best_id = 0.0, 0
        for inst_id, ib in enumerate(instance_bboxes):
            sc = get_box_corners(ib[:3], np.diag(ib[3:6]) / 2.0)
            iou = get_iou_cuboid(cad_corners, sc)
            if iou > best_iou:
                best_iou, best_id = iou, inst_id + 1

        instances.append({
            "box3D": box3D, "cls_id": cls_id,
            "shapenet_catid": catid, "shapenet_id": model["id_cad"],
            "instance_id": best_id, "box_corners": cad_corners,
        })
        accumulate_votes(box3D, mesh_vertices, point_votes, point_vote_idx)

    if not instances:
        return None
    with open(bbox_path, "wb") as f:
        pickle.dump(instances, f, protocol=pickle.HIGHEST_PROTOCOL)
    np.savez(
        scan_path, mesh_vertices=mesh_vertices, point_votes=point_votes,
        instance_labels=instance_labels,
    )
    return mean_sizes


def build_splits(out_root: str, split_dir: str, scannet_split_dir: str):
    """Join processed scenes with the official train/val scene lists
    (`utils/scannet/split_data.py:8-47`)."""
    os.makedirs(split_dir, exist_ok=True)
    processed = {
        d for d in os.listdir(out_root)
        if os.path.isfile(os.path.join(out_root, d, "bbox.pkl"))
    }
    for split in ("train", "val"):
        txt = os.path.join(scannet_split_dir, f"scannetv2_{split}.txt")
        with open(txt) as f:
            wanted = [l.strip() for l in f if l.strip()]
        # paths relative to split_dir: the dataset resolves non-absolute
        # entries against its root (the splits dir, `data/scannet.py:81`),
        # so the prepped artifact stays relocatable and CWD-independent
        # realpath (not abspath) on both sides: lexical relpath across a
        # symlinked split_dir/out_root emits ../ traversals that resolve
        # to the wrong target when later joined (ADVICE r3). Fall back to
        # absolute paths if the relative form does not round-trip.
        def _rel(target: str) -> str:
            target = os.path.realpath(target)
            base = os.path.realpath(split_dir)
            rel = os.path.relpath(target, base)
            if os.path.exists(os.path.join(split_dir, rel)):
                return rel
            return target

        entries = [
            {
                "scan": _rel(os.path.join(out_root, s, "full_scan.npz")),
                "bbox": _rel(os.path.join(out_root, s, "bbox.pkl")),
            }
            for s in wanted if s in processed
        ]
        with open(os.path.join(split_dir, f"scannetv2_{split}.json"), "w") as f:
            json.dump(entries, f)
        print(f"{split}: {len(entries)} scenes")


def main():
    p = argparse.ArgumentParser("scannet + scan2cad prep")
    p.add_argument("--scan2cad", required=True,
                   help="full_annotations.json from Scan2CAD")
    p.add_argument("--scans_root", required=True, help="ScanNet scans/ dir")
    p.add_argument("--shapenet_root", required=True,
                   help="ShapeNetCore.v2 root")
    p.add_argument("--label_tsv", required=True,
                   help="scannetv2-labels.combined.tsv")
    p.add_argument("--out_root", required=True)
    p.add_argument("--splits_out", default=None)
    p.add_argument("--scannet_splits", default=None,
                   help="dir with scannetv2_{train,val}.txt")
    p.add_argument("--workers", type=int, default=20)
    args = p.parse_args()

    with open(args.scan2cad) as f:
        annotations = json.load(f)
    label_map = read_label_map(args.label_tsv)

    def job(ann):
        try:
            return generate_scene(
                ann, args.scans_root, args.shapenet_root, label_map,
                args.out_root,
            )
        except Exception as e:
            print(f"FAILED {ann.get('id_scan')}: {e}")
            return None

    with ProcessPoolExecutor(args.workers) as ex:
        all_sizes = list(ex.map(job, annotations))

    mean_arr = np.zeros((len(OBJ_CLASS_IDS), 3))
    for i, cls_id in enumerate(OBJ_CLASS_IDS):
        rows = sum(
            [s[int(cls_id)] for s in all_sizes if s is not None], []
        )
        if rows:
            mean_arr[i] = np.mean(rows, axis=0)
    np.savez(os.path.join(args.out_root, "scannet_means.npz"), arr_0=mean_arr)

    if args.splits_out and args.scannet_splits:
        build_splits(args.out_root, args.splits_out, args.scannet_splits)


if __name__ == "__main__":
    main()
