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
