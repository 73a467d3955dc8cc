"""Heading supervision consistency (VERDICT r3 item 5, data side).

Pins that the heading LABEL is geometrically consistent with the points:
for every object, rotating its instance points into the canonical frame
by the labeled heading must land them inside the labeled (padded)
canonical box — before AND after the train-time augmentation (flips +
z-rotation update heading as `dataloader.py:83-115`). An augmentation
sign bug would leave heading at chance forever while every other target
still trains; this test makes that failure mode loud.
"""

import json
import os
import pickle

import numpy as np
import pytest

from rfdnet_tpu.config.scannet import ScannetConfig
from rfdnet_tpu.data.scannet import ScanNetDataset


@pytest.fixture(scope="module")
def tiny_ds(tmp_path_factory):
    """Two tiny synthetic protocol scenes on disk (the full generator at
    reduced point count — same code path as the protocol dataset)."""
    root = tmp_path_factory.mktemp("heading_ds")
    from tools.gen_synthetic_dataset import main as gen_main

    gen_main(["--out", str(root), "--train", "2", "--val", "1",
              "--points", "20000", "--variants", "2", "--seed", "7"])
    return str(root)


def _check_points_in_labeled_boxes(pc, inst, boxes3D, inst_ids, tol=0.08):
    """Each instance's points, de-rotated by the labeled heading about
    the labeled center, must fit the labeled size box (plus sensor-noise
    tolerance)."""
    checked = 0
    for k, box in zip(inst_ids, boxes3D):
        pts = pc[inst == k, :3]
        if len(pts) < 10:
            continue
        center, size, heading = box[0:3], box[3:6], box[6]
        c, s = np.cos(-heading), np.sin(-heading)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        local = (pts - center) @ R.T
        assert np.all(np.abs(local) <= size / 2 + tol), (
            f"instance {k}: de-rotated points exceed the labeled box "
            f"(max {np.abs(local).max(0)}, half-size {size / 2})"
        )
        checked += 1
    return checked


def test_raw_scene_heading_consistent(tiny_ds):
    split = json.load(
        open(os.path.join(tiny_ds, "splits", "scannetv2_train.json"))
    )
    base = os.path.join(tiny_ds, "splits")
    for entry in split:
        scan = np.load(os.path.join(base, entry["scan"]))
        with open(os.path.join(base, entry["bbox"]), "rb") as f:
            info = pickle.load(f)
        boxes = np.array([it["box3D"] for it in info])
        ids = [it["instance_id"] for it in info]
        n = _check_points_in_labeled_boxes(
            scan["mesh_vertices"], scan["instance_labels"], boxes, ids
        )
        assert n >= 3  # scenes carry >= 4 objects


def test_augmented_scene_heading_consistent(tiny_ds):
    """After flips + z-rotation, the updated heading labels must still
    describe the (augmented) point geometry — run many epochs so both
    flip branches and assorted rotations are exercised."""
    ds = ScanNetDataset(
        os.path.join(tiny_ds, "splits", "scannetv2_train.json"),
        mode="train", phase="detection", num_points=16384,
        dataset_config=ScannetConfig(), seed=3,
    )
    assert ds.augment
    checked = 0
    for epoch in range(6):
        ds.set_epoch(epoch)
        for idx in range(len(ds)):
            item = ds[idx]
            pc = item["point_clouds"]
            mask = item["box_label_mask"].astype(bool)
            boxes = np.concatenate(
                [
                    item["center_label"][mask],
                    # reconstruct size from class + residual
                    ds.dataset_config.mean_size_arr[
                        item["size_class_label"][mask].astype(int)
                    ] + item["size_residual_label"][mask],
                    ds.dataset_config.class2angle(
                        item["heading_class_label"][mask].astype(int),
                        item["heading_residual_label"][mask],
                    )[:, None],
                ], axis=1,
            )
            # votes point at centers: use them to recover per-point
            # instance grouping (vote == center - point for object points)
            votes = item["vote_label"][:, :3]
            vmask = item["vote_label_mask"].astype(bool)
            tgt = pc[vmask, :3] + votes[vmask]
            d = np.linalg.norm(
                tgt[:, None, :] - boxes[None, :, 0:3], axis=-1
            )
            inst = d.argmin(1)
            near = d.min(1) < 1e-3  # exact vote targets only
            checked += _check_points_in_labeled_boxes(
                pc[vmask][near], inst[near], boxes,
                list(range(len(boxes))),
            )
    assert checked >= 20


def test_canonical_shapes_y_mirror_symmetric():
    """The flip augmentation's heading updates (x-flip: pi-theta, y-flip:
    -theta — `dataloader.py:89,95`) keep labels geometry-consistent ONLY
    when canonical shapes are mirror-symmetric about their own y axis
    (asymmetric feature along x). The round-3 shapes violated this
    (backs at +y) and heading_cls_loss sat at chance forever — pin the
    invariant for every class and jitter draw."""
    from tools.gen_synthetic_dataset import CATIDS, make_shape

    rng = np.random.RandomState(0)
    q = rng.uniform(-0.5, 0.5, (20000, 3))
    q_m = q * np.array([1.0, -1.0, 1.0])
    for name in CATIDS.values():
        for _ in range(4):
            occ = make_shape(name, rng)
            np.testing.assert_array_equal(
                occ(q), occ(q_m),
                err_msg=f"{name}: canonical shape not y-mirror-symmetric",
            )


def test_flip_label_update_shape_consistent():
    """End-to-end check of the invariant: flip the world points of a
    placed shape, update the heading by the reference's rule, de-rotate
    by the new label — occupancy agreement must be as high as the
    unflipped case (it cratered with the round-3 shapes)."""
    from tools.gen_synthetic_dataset import make_shape, sample_surface, shape_mesh

    rng = np.random.RandomState(1)
    for name in ("chair", "sofa", "bookshelf", "cabinet"):
        occ = make_shape(name, rng)
        verts, tris = shape_mesh(occ)
        pts = sample_surface(verts, tris, 3000, rng)

        def frac_inside(points, label):
            c, s = np.cos(-label), np.sin(-label)
            R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            return occ(np.clip(points @ R.T, -0.5, 0.5)).mean()

        theta = 0.7
        c, s = np.cos(theta), np.sin(theta)
        world = pts @ np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]]).T
        base = frac_inside(world, theta)
        fx = frac_inside(world * [-1, 1, 1], np.sign(theta) * np.pi - theta)
        fy = frac_inside(world * [1, -1, 1], -theta)
        assert fx >= base - 1e-6, (name, base, fx)
        assert fy >= base - 1e-6, (name, base, fy)


def test_angle_codec_roundtrip():
    dc = ScannetConfig()
    angles = np.linspace(-np.pi, np.pi, 97)
    hc, hr = dc.angle2class(angles)
    back = dc.class2angle(hc.astype(int), hr)
    # equality mod 2*pi
    diff = np.angle(np.exp(1j * (back - angles)))
    assert np.abs(diff).max() < 1e-9
