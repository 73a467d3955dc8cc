"""Data-pipeline tests: binvox IO, subsample transform, the ScanNet
dataset item contract (on synthetic fixture files), and the prefetching
loader."""

import json
import os
import pickle

import numpy as np
import pytest

from rfdnet_tpu.data.binvox import Voxels, read_binvox, write_binvox
from rfdnet_tpu.data.scannet import (
    MAX_NUM_OBJ,
    DataLoader,
    ScanNetDataset,
    collate,
)
from rfdnet_tpu.data.transforms import subsample_points

N_SCENE_POINTS = 2000
NUM_POINTS = 1024  # subsampled per scene
N_OBJ_POINTS = 512  # occupancy points per object on disk


def test_binvox_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    data = rng.rand(16, 16, 16) > 0.7
    p = tmp_path / "v.binvox"
    with open(p, "wb") as f:
        write_binvox(f, Voxels(data, data.shape, [0.1, 0.2, 0.3], 2.0))
    with open(p, "rb") as f:
        v = read_binvox(f)
    np.testing.assert_array_equal(v.data, data)
    assert v.translate == [0.1, 0.2, 0.3] and v.scale == 2.0


class TestSubsamplePoints:
    def test_split_mode_train(self):
        rng = np.random.RandomState(0)
        pts = rng.rand(300, 3).astype(np.float32)
        occ = (rng.rand(300) > 0.5).astype(np.float32)
        p, o, vol = subsample_points(pts, occ, [64, 32], "train")
        assert p.shape == (96, 3) and o.shape == (96,)
        np.testing.assert_array_equal(o[:64], 0)
        np.testing.assert_array_equal(o[64:], 1)
        assert 0 <= vol <= 1

    def test_test_mode_deterministic(self):
        pts = np.arange(300 * 3, dtype=np.float32).reshape(300, 3)
        occ = np.zeros(300, np.float32)
        occ[100:] = 1
        p1 = subsample_points(pts, occ, [8, 8], "test")
        p2 = subsample_points(pts, occ, [8, 8], "test")
        np.testing.assert_array_equal(p1[0], p2[0])
        # first 8 unoccupied then first 8 occupied rows
        np.testing.assert_array_equal(p1[0][:8], pts[:8])
        np.testing.assert_array_equal(p1[0][8:], pts[100:108])


@pytest.fixture
def fake_dataset_root(tmp_path):
    """Create 2 synthetic scenes + shapenet assets in the reference's
    on-disk layout."""
    rng = np.random.RandomState(0)
    shapenet = tmp_path / "shapenet"
    entries = []
    catid, sid = "3001627", "abc123"
    os.makedirs(shapenet / "point" / catid)
    os.makedirs(shapenet / "voxel" / "16" / catid)
    pts = (rng.rand(N_OBJ_POINTS, 3).astype(np.float16) - 0.5) * 1.1
    occ_bits = np.packbits((rng.rand(N_OBJ_POINTS) > 0.5).astype(np.uint8))
    np.savez(
        shapenet / "point" / catid / f"{sid}.npz",
        points=pts, occupancies=occ_bits,
    )
    with open(shapenet / "voxel" / "16" / catid / f"{sid}.binvox", "wb") as f:
        write_binvox(
            f, Voxels(rng.rand(16, 16, 16) > 0.5, (16,) * 3, [0, 0, 0], 1.0)
        )

    for i in range(2):
        scene = f"scene{i:04d}_00"
        verts = rng.rand(N_SCENE_POINTS, 6).astype(np.float32) * 4
        votes = np.zeros((N_SCENE_POINTS, 10), np.float32)
        votes[: N_SCENE_POINTS // 2, 0] = 1
        votes[: N_SCENE_POINTS // 2, 1:] = rng.randn(N_SCENE_POINTS // 2, 9)
        inst = rng.randint(0, 3, N_SCENE_POINTS).astype(np.float32)
        np.savez(
            tmp_path / f"{scene}.npz",
            mesh_vertices=verts, point_votes=votes, instance_labels=inst,
        )
        boxes = [
            {
                "box3D": np.array([1.0, 2.0, 0.5, 0.8, 0.6, 0.9, 0.3]),
                "cls_id": 7,  # chair
                "shapenet_catid": catid,
                "shapenet_id": sid,
                "instance_id": 1,
            },
            {
                "box3D": np.array([-1.0, 0.5, 0.4, 1.2, 0.7, 0.8, -0.8]),
                "cls_id": 7,
                "shapenet_catid": catid,
                "shapenet_id": sid,
                "instance_id": 2,
            },
        ]
        with open(tmp_path / f"{scene}_bbox.pkl", "wb") as f:
            pickle.dump(boxes, f)
        entries.append(
            {"scan": f"{scene}.npz", "bbox": f"{scene}_bbox.pkl"}
        )
    split = tmp_path / "split.json"
    with open(split, "w") as f:
        json.dump(entries, f)
    return tmp_path, str(split), str(shapenet)


def test_detection_item_contract(fake_dataset_root):
    root, split, shapenet = fake_dataset_root
    ds = ScanNetDataset(
        split, mode="val", phase="detection", num_points=NUM_POINTS,
    )
    item = ds[0]
    assert item["point_clouds"].shape == (NUM_POINTS, 4)  # xyz + height
    assert item["center_label"].shape == (MAX_NUM_OBJ, 3)
    assert item["vote_label"].shape == (NUM_POINTS, 9)
    assert item["box_label_mask"].sum() == 2
    assert item["sem_cls_label"][0] == 1  # chair -> class index 1
    # no-augment mode is deterministic
    item2 = ds[0]
    np.testing.assert_array_equal(item["point_clouds"], item2["point_clouds"])


def test_augmentation_consistency(fake_dataset_root):
    """Votes must still point at the (augmented) box centers."""
    root, split, shapenet = fake_dataset_root
    ds = ScanNetDataset(
        split, mode="train", phase="detection", num_points=NUM_POINTS,
    )
    a = ds[0]
    ds.set_epoch(1)
    b = ds[0]
    # different epochs give different augmentations (w.h.p.)
    assert not np.allclose(a["point_clouds"], b["point_clouds"])
    for item in (a, b):
        assert np.isfinite(item["point_clouds"]).all()
        assert (np.abs(item["heading_class_label"]) < 12).all()


def test_completion_item_and_loader(fake_dataset_root):
    root, split, shapenet = fake_dataset_root
    ds = ScanNetDataset(
        split, mode="train", phase="completion", num_points=NUM_POINTS,
        shapenet_path=shapenet, points_subsample=(128, 128),
    )
    item = ds[0]
    assert item["object_points"].shape == (MAX_NUM_OBJ, 256, 3)
    assert item["object_points_occ"].shape == (MAX_NUM_OBJ, 256)
    assert item["object_voxels"].shape == (MAX_NUM_OBJ, 16, 16, 16)
    np.testing.assert_array_equal(item["object_points_occ"][0][:128], 0)
    np.testing.assert_array_equal(item["object_points_occ"][0][128:], 1)

    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0]["point_clouds"].shape == (2, NUM_POINTS, 4)
    assert batches[0]["object_points"].shape == (2, MAX_NUM_OBJ, 256, 3)


def test_test_mode_iou_points(fake_dataset_root):
    root, split, shapenet = fake_dataset_root
    ds = ScanNetDataset(
        split, mode="test", phase="completion", num_points=NUM_POINTS,
        shapenet_path=shapenet, points_subsample=(128, 128),
    )
    item = ds[0]
    assert item["object_points_iou"].shape == (MAX_NUM_OBJ, N_OBJ_POINTS, 3)
    assert item["shapenet_ids"][0] == "abc123"
    c = collate([item, ds[1]])
    assert c["object_points_iou"].shape[0] == 2
    assert isinstance(c["shapenet_ids"], list)
