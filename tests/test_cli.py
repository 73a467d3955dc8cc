"""CLI-path integration: Config -> dataset/loader factory -> Tester.run
metrics on a tiny on-disk dataset (detection phase, random weights)."""

import json
import os
import pickle

import numpy as np
import pytest

from rfdnet_tpu.config.config import Config

N_POINTS = 1024


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("scannet")
    rng = np.random.RandomState(0)
    split_dir = root / "splits"
    os.makedirs(split_dir)
    entries = []
    for i in range(2):
        scene = f"scene{i:04d}_00"
        verts = rng.rand(4000, 6).astype(np.float32) * 4
        votes = np.zeros((4000, 10), np.float32)
        inst = np.zeros(4000, np.float32)
        np.savez(root / f"{scene}.npz", mesh_vertices=verts,
                 point_votes=votes, instance_labels=inst)
        boxes = [{
            "box3D": np.array([1.0, 2.0, 0.5, 0.8, 0.6, 0.9, 0.3]),
            "cls_id": 7, "shapenet_catid": "3001627",
            "shapenet_id": "x", "instance_id": 1,
        }]
        with open(root / f"{scene}_bbox.pkl", "wb") as f:
            pickle.dump(boxes, f)
        entries.append({"scan": os.path.join("..", f"{scene}.npz"),
                        "bbox": os.path.join("..", f"{scene}_bbox.pkl")})
    with open(split_dir / "scannetv2_val.json", "w") as f:
        json.dump(entries, f)
    return str(root), str(split_dir)


def test_run_test_detection_metrics(tiny_dataset, tmp_path):
    from rfdnet_tpu.cli import _build_loaders
    from rfdnet_tpu.eval.tester import Tester

    root, split_dir = tiny_dataset
    cfg = Config(
        {
            "data": {"num_point": N_POINTS, "split": split_dir},
            "test": {"phase": "detection", "batch_size": 1,
                     "ap_iou_thresholds": [0.25],
                     "evaluate_mesh_mAP": False},
            "generation": {"generate_mesh": False},
            "device": {"num_workers": 1},
            "log": {"path": str(tmp_path)},
        },
        mode="test",
    )
    loaders = _build_loaders(cfg, ["test"])
    assert len(loaders["test"]) == 2

    import jax

    model = cfg.build_model(generate_limit=4)
    sample = next(iter(loaders["test"]))
    batch = {k: v for k, v in sample.items() if not isinstance(v, list)}
    variables = model.init(
        jax.random.PRNGKey(0),
        jax.tree_util.tree_map(lambda x: x, batch),
        train=False, rng=jax.random.PRNGKey(1),
    )
    tester = Tester(cfg, model, variables, cfg.dataset_config,
                    log=lambda m: None)
    metrics = tester.run(loaders["test"], ap_iou_thresholds=[0.25],
                         dump_dir=str(tmp_path / "vis"))
    assert any(k.startswith("mAP") for k in metrics)
    # dumps were written for both scenes
    dumped = sorted(os.listdir(tmp_path / "vis"))
    assert len(dumped) == 2
    for d in dumped:
        assert os.path.exists(tmp_path / "vis" / d / "pred_map_cls.txt")
        # interactive WebGL inspector written (never silently skipped)
        html = tmp_path / "vis" / d / "scene.html"
        assert os.path.exists(html)
        assert "getContext" in open(html).read()


def test_run_demo_mode(tmp_path):
    """Demo mode end-to-end on a raw (label-free) scan: init-from-synthetic
    (`cli._restore_variables`), detection -> NMS -> completion -> meshes ->
    artifact dump (`demo.py run`). Regression for the demo-mode init crash
    (raw scans carry no GT labels)."""
    from rfdnet_tpu import demo

    rng = np.random.RandomState(3)
    verts = rng.rand(3000, 3).astype(np.float32) * 3
    off = tmp_path / "room.off"
    with open(off, "w") as f:
        f.write("OFF\n%d 0 0\n" % len(verts))
        for v in verts:
            f.write("%f %f %f\n" % tuple(v))

    from rfdnet_tpu.config.config import Config

    cfg = Config(
        {
            "data": {"num_point": 1024},
            "demo": {"phase": "completion"},
            "generation": {"resolution_0": 8, "dump_threshold": 0.0},
            "log": {"path": str(tmp_path / "out")},
        },
        mode="demo",
    )
    out_dir = demo.run(cfg, str(off))
    files = os.listdir(out_dir)
    assert "000000_pc.ply" in files
    assert "000000_pred_confident_nms_bbox.npz" in files
    assert "pred.png" in files
    bbox = np.load(os.path.join(out_dir, "000000_pred_confident_nms_bbox.npz"))
    assert bbox["obbs"].shape[1] == 7
