"""End-to-end ScanNet+Scan2CAD prep test on synthetic raw inputs: a fake
scan (binary PLY + aggregation/segs json + axis-align meta), a fake
ShapeNet chair OBJ, and a Scan2CAD annotation -> generate_scene ->
bbox.pkl/full_scan.npz contract + vote correctness + split building."""

import json
import os
import pickle
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.prep.scannet import build_splits, generate_scene


def write_scan_ply(path, verts_rgb):
    n = len(verts_rgb)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "element face 0\nproperty list uchar int vertex_indices\n"
        "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        for row in verts_rgb:
            f.write(struct.pack("<fffBBB", *row[:3],
                                int(row[3]), int(row[4]), int(row[5])))


def write_chair_obj(path, size=(0.6, 0.9, 0.6)):
    """Unit-ish chair: a box of vertices centered at origin (ShapeNet
    normalized frame: y up -> the 0.9 extent is vertical)."""
    sx, sy, sz = size
    with open(path, "w") as f:
        for dx in (-0.5, 0.5):
            for dy in (-0.5, 0.5):
                for dz in (-0.5, 0.5):
                    f.write(f"v {dx * sx} {dy * sy} {dz * sz}\n")


@pytest.fixture
def raw_scene(tmp_path):
    scene = "scene0777_00"
    scans = tmp_path / "scans" / scene
    os.makedirs(scans)

    rng = np.random.RandomState(0)
    # scene points: a floor + a cluster where the chair will be
    floor = np.concatenate(
        [rng.uniform(0, 4, (600, 2)), np.zeros((600, 1))], axis=1
    )
    chair_center = np.array([2.0, 1.5, 0.45])
    cluster = chair_center + rng.uniform(-0.3, 0.3, (400, 3))
    pts = np.concatenate([floor, cluster])
    rgb = rng.randint(0, 255, (len(pts), 3))
    write_scan_ply(scans / f"{scene}_vh_clean_2.ply",
                   np.concatenate([pts, rgb], axis=1))

    with open(scans / f"{scene}.txt", "w") as f:
        f.write("axisAlignment = " + " ".join(
            str(v) for v in np.eye(4).ravel()) + "\n")

    seg_indices = [0] * 600 + [1] * 400
    with open(scans / f"{scene}_vh_clean_2.0.010000.segs.json", "w") as f:
        json.dump({"segIndices": seg_indices}, f)
    with open(scans / f"{scene}.aggregation.json", "w") as f:
        json.dump({"segGroups": [
            {"objectId": 0, "segments": [1], "label": "chair"},
        ]}, f)

    # ShapeNet chair model (catid 03001627)
    sn = tmp_path / "shapenet" / "03001627" / "chair1" / "models"
    os.makedirs(sn)
    write_chair_obj(sn / "model_normalized.obj")

    # scan2cad: CAD y-up -> scene z-up (x-rot +90deg) composed with a
    # 45deg z-rotation, translated to chair_center (the real Scan2CAD
    # convention: CAD models are y-up, scans z-up)
    from scipy.spatial.transform import Rotation

    R = Rotation.from_euler("xz", [90, 45], degrees=True)
    x, y, z, w = R.as_quat()
    annotation = {
        "id_scan": scene,
        "trs": {"translation": [0, 0, 0], "rotation": [1, 0, 0, 0],
                "scale": [1, 1, 1]},
        "aligned_models": [{
            "catid_cad": "03001627", "id_cad": "chair1",
            "trs": {"translation": list(chair_center),
                    "rotation": [w, x, y, z],
                    "scale": [1, 1, 1]},
        }],
    }
    label_map = {"chair": 5}
    return tmp_path, scene, annotation, label_map, chair_center


def test_generate_scene_contract(raw_scene, tmp_path):
    root, scene, annotation, label_map, chair_center = raw_scene
    out_root = str(tmp_path / "processed")
    mean_sizes = generate_scene(
        annotation, str(root / "scans"), str(root / "shapenet"),
        label_map, out_root,
    )
    assert mean_sizes is not None

    with open(os.path.join(out_root, scene, "bbox.pkl"), "rb") as f:
        boxes = pickle.load(f)
    assert len(boxes) == 1
    b = boxes[0]
    # chair class id 7 in SHAPENETCLASSES
    assert b["cls_id"] == 7
    assert b["shapenet_catid"] == "03001627"
    # box lands at the placed center (z-rotation by pi/4 in quaternion)
    np.testing.assert_allclose(b["box3D"][:3], chair_center, atol=1e-6)
    # instance matched to the scan cluster (instance id 1)
    assert b["instance_id"] == 1
    # up size is the CAD's vertical 0.9; heading is 45deg mod 90
    np.testing.assert_allclose(sorted(b["box3D"][3:6]), [0.6, 0.6, 0.9],
                               atol=1e-6)
    assert b["box3D"][5] == pytest.approx(0.9)  # up axis last
    assert abs(b["box3D"][6]) % (np.pi / 2) == pytest.approx(
        np.pi / 4, abs=1e-6
    )

    scan = np.load(os.path.join(out_root, scene, "full_scan.npz"))
    votes = scan["point_votes"]
    mv = scan["mesh_vertices"]
    assert votes.shape == (1000, 10)
    in_box = votes[:, 0] == 1
    assert in_box.sum() > 100  # the cluster points vote
    # votes point at the box center
    np.testing.assert_allclose(
        mv[in_box, :3] + votes[in_box, 1:4],
        np.broadcast_to(chair_center, (in_box.sum(), 3)), atol=1e-6,
    )

    # split building
    split_dir = str(tmp_path / "splits")
    scansplit = tmp_path / "scannet_splits"
    os.makedirs(scansplit)
    for name, content in [("scannetv2_train.txt", scene),
                          ("scannetv2_val.txt", "")]:
        with open(scansplit / name, "w") as f:
            f.write(content + "\n")
    build_splits(out_root, split_dir, str(scansplit))
    with open(os.path.join(split_dir, "scannetv2_train.json")) as f:
        entries = json.load(f)
    assert len(entries) == 1 and entries[0]["scan"].endswith("full_scan.npz")


def test_processed_scene_loads_through_dataset(raw_scene, tmp_path):
    """The prep output feeds straight into the training dataset."""
    root, scene, annotation, label_map, _ = raw_scene
    out_root = str(tmp_path / "processed")
    generate_scene(
        annotation, str(root / "scans"), str(root / "shapenet"),
        label_map, out_root,
    )
    entries = [{
        "scan": os.path.join(out_root, scene, "full_scan.npz"),
        "bbox": os.path.join(out_root, scene, "bbox.pkl"),
    }]
    split = tmp_path / "split.json"
    with open(split, "w") as f:
        json.dump(entries, f)

    from rfdnet_tpu.data.scannet import ScanNetDataset

    ds = ScanNetDataset(str(split), mode="train", phase="detection",
                        num_points=512)
    item = ds[0]
    assert item["point_clouds"].shape == (512, 4)
    assert item["box_label_mask"].sum() == 1
    assert item["sem_cls_label"][0] == 1  # chair -> class index 1
