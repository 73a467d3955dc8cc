"""Full-dress rehearsal through the CLI (VERDICT r1 item 6): fabricate a
raw ScanNet+Scan2CAD dataset with `tools/prep`, run the reference's
three-stage training chain (`README.md` Training:
detection(lr 1e-3, scratch) -> completion(lr 1e-4, frozen detector,
finetune from stage-1 best) -> joint(lr 5e-5, completion weight 0.005,
weight from stage-2 last)) as real `rfdnet_tpu.cli.main` invocations,
then `--mode test` with mesh generation on the MISE path and mesh-mAP
enabled — asserting the run artifacts the reference produces (log.txt,
out_config.yaml, model_last/model_best checkpoints, AP table).

Scale note: 6 scenes x 1024 points x 1-2 epochs keeps the six jit
compiles CPU-affordable; every code path (prep, loaders, freeze masks,
plateau/BN schedules, finetune partial-load, resume-able checkpoints,
MISE, mesh mAP) is the production one. ShapeNet occupancy/voxel assets
are fabricated directly (the watertight->sample prep chain has its own
test, tests/test_prep.py)."""

import glob
import json
import os
import pickle

import numpy as np
import pytest
import yaml

from test_prep_scannet import write_chair_obj, write_scan_ply

from rfdnet_tpu import cli

N_SCENES = 6
N_TRAIN = 4
N_POINTS = 1024


@pytest.fixture(scope="module")
def prepared_root(tmp_path_factory):
    from scipy.spatial.transform import Rotation

    from tools.prep.scannet import build_splits, generate_scene

    root = tmp_path_factory.mktemp("fulldress")
    rng = np.random.RandomState(0)
    scans_dir = root / "scans"
    label_map = {"chair": 5}

    # one ShapeNet chair reused by every annotation
    sn = root / "shapenet_raw" / "03001627" / "chair1" / "models"
    os.makedirs(sn)
    write_chair_obj(sn / "model_normalized.obj")

    scenes = []
    for i in range(N_SCENES):
        scene = f"scene{i:04d}_00"
        scenes.append(scene)
        sd = scans_dir / scene
        os.makedirs(sd)
        floor = np.concatenate(
            [rng.uniform(0, 4, (900, 2)), np.zeros((900, 1))], axis=1
        )
        center = np.array([1.0 + 0.3 * i, 1.5, 0.45])
        cluster = center + rng.uniform(-0.3, 0.3, (600, 3))
        pts = np.concatenate([floor, cluster])
        rgb = rng.randint(0, 255, (len(pts), 3))
        write_scan_ply(sd / f"{scene}_vh_clean_2.ply",
                       np.concatenate([pts, rgb], axis=1))
        with open(sd / f"{scene}.txt", "w") as f:
            f.write("axisAlignment = "
                    + " ".join(str(v) for v in np.eye(4).ravel()) + "\n")
        with open(sd / f"{scene}_vh_clean_2.0.010000.segs.json", "w") as f:
            json.dump({"segIndices": [0] * 900 + [1] * 600}, f)
        with open(sd / f"{scene}.aggregation.json", "w") as f:
            json.dump({"segGroups": [
                {"objectId": 0, "segments": [1], "label": "chair"},
            ]}, f)

        R = Rotation.from_euler("xz", [90, 30 + 5 * i], degrees=True)
        x, y, z, w = R.as_quat()
        annotation = {
            "id_scan": scene,
            "trs": {"translation": [0, 0, 0], "rotation": [1, 0, 0, 0],
                    "scale": [1, 1, 1]},
            "aligned_models": [{
                "catid_cad": "03001627", "id_cad": "chair1",
                "trs": {"translation": list(center),
                        "rotation": [w, x, y, z], "scale": [1, 1, 1]},
            }],
        }
        out_root = str(root / "processed")
        assert generate_scene(
            annotation, str(scans_dir), str(root / "shapenet_raw"),
            label_map, out_root,
        ) is not None

    # official-style split txts -> fullscan split JSONs
    scansplit = root / "scannet_splits"
    os.makedirs(scansplit)
    with open(scansplit / "scannetv2_train.txt", "w") as f:
        f.write("\n".join(scenes[:N_TRAIN]) + "\n")
    with open(scansplit / "scannetv2_val.txt", "w") as f:
        f.write("\n".join(scenes[N_TRAIN:]) + "\n")
    split_dir = str(root / "splits")
    build_splits(str(root / "processed"), split_dir, str(scansplit))

    # completion-phase ShapeNet assets (point occupancies + 16^3 voxels)
    from rfdnet_tpu.data.binvox import Voxels, write_binvox

    shapenet = root / "shapenet"
    os.makedirs(shapenet / "point" / "03001627")
    os.makedirs(shapenet / "voxel" / "16" / "03001627")
    pts = (rng.rand(20000, 3).astype(np.float16) - 0.5) * 1.1
    inside = (np.abs(pts) < 0.25).all(axis=1)
    np.savez(shapenet / "point" / "03001627" / "chair1.npz",
             points=pts, occupancies=np.packbits(inside.astype(np.uint8)))
    vox = np.zeros((16, 16, 16), bool)
    vox[4:12, 4:12, 4:12] = True
    with open(shapenet / "voxel" / "16" / "03001627" / "chair1.binvox",
              "wb") as f:
        write_binvox(f, Voxels(vox, (16,) * 3, [0, 0, 0], 1.0))

    return str(root), split_dir, str(shapenet)


def _stage_yaml(root, split_dir, shapenet, out_dir, *, phase, lr, epochs,
                freeze=(), weight=(), extra=None):
    cfg = {
        "data": {
            "num_point": N_POINTS, "split": split_dir,
            "shapenet_path": shapenet, "completion_limit_in_train": 3,
        },
        "train": {"phase": phase, "batch_size": 2, "epochs": epochs,
                  "freeze": list(freeze)},
        "val": {"phase": phase, "batch_size": 2},
        "optimizer": {"lr": lr},
        "device": {"num_workers": 1},
        "log": {"path": out_dir, "print_step": 1},
        "finetune": bool(weight),
        "weight": list(weight),
    }
    if extra:
        from rfdnet_tpu.config.config import update_recursive

        update_recursive(cfg, extra)
    path = os.path.join(out_dir, f"{phase}_{lr}.yaml")
    os.makedirs(out_dir, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def _run_dir(out_dir):
    runs = sorted(
        d for d in glob.glob(os.path.join(out_dir, "*")) if os.path.isdir(d)
    )
    assert runs, f"no run dir under {out_dir}"
    return runs[-1]


def _assert_train_artifacts(run_dir):
    assert os.path.isfile(os.path.join(run_dir, "log.txt"))
    assert os.path.isfile(os.path.join(run_dir, "out_config.yaml"))
    assert os.path.isdir(os.path.join(run_dir, "model_last"))
    assert os.path.isdir(os.path.join(run_dir, "model_best"))


@pytest.mark.filterwarnings("ignore")
def test_three_stage_chain_and_test_protocol(prepared_root, tmp_path):
    root, split_dir, shapenet = prepared_root

    # ---- stage 1: detection from scratch, lr 1e-3, 2 epochs (plateau +
    # BN-momentum schedules step across the epoch boundary)
    out1 = str(tmp_path / "stage1")
    y1 = _stage_yaml(root, split_dir, shapenet, out1,
                     phase="detection", lr=1e-3, epochs=2)
    cli.main(["--config", y1, "--mode", "train"])
    run1 = _run_dir(out1)
    _assert_train_artifacts(run1)

    # ---- stage 2: completion, detector frozen, finetune from stage-1
    # best (module-by-module partial load)
    out2 = str(tmp_path / "stage2")
    y2 = _stage_yaml(
        root, split_dir, shapenet, out2, phase="completion", lr=1e-4,
        epochs=1, freeze=("backbone", "voting", "detection"),
        weight=(os.path.join(run1, "model_best"),),
    )
    cli.main(["--config", y2, "--mode", "train"])
    run2 = _run_dir(out2)
    _assert_train_artifacts(run2)
    log2 = open(os.path.join(run2, "log.txt")).read()
    assert "loaded" in log2.lower() or "finetune" in log2.lower()

    # ---- stage 3: joint refine, nothing frozen, completion weight 0.005
    out3 = str(tmp_path / "stage3")
    y3 = _stage_yaml(
        root, split_dir, shapenet, out3, phase="completion", lr=5e-5,
        epochs=1, weight=(os.path.join(run2, "model_last"),),
        extra={"model": {"completion": {"weight": 0.005}}},
    )
    cli.main(["--config", y3, "--mode", "train"])
    run3 = _run_dir(out3)
    _assert_train_artifacts(run3)

    # ---- test protocol: stage-3 weights, MISE mesh generation
    # (resolution_0=8, upsampling_steps=1 -> effective 16^3), mesh mAP
    test_cfg = {
        "data": {"num_point": N_POINTS, "split": split_dir,
                 "shapenet_path": shapenet},
        "test": {"phase": "completion", "batch_size": 1,
                 "evaluate_mesh_mAP": True,
                 "ap_iou_thresholds": [0.25, 0.5]},
        "generation": {"generate_mesh": True, "resolution_0": 8,
                       "upsampling_steps": 1, "dump_results": True},
        "device": {"num_workers": 1},
        "log": {"path": str(tmp_path / "test_out")},
        "weight": [os.path.join(run3, "model_last")],
    }
    ty = str(tmp_path / "test.yaml")
    with open(ty, "w") as f:
        yaml.safe_dump(test_cfg, f)
    metrics = cli.main(["--config", ty, "--mode", "test"])

    # AP table: box mAP/AR at both thresholds, mesh mAP from the enabled
    # mesh evaluation, and per-class voxel IoU stats
    for iou in (0.25, 0.5):
        assert f"mAP @{iou}" in metrics, sorted(metrics)
        assert f"AR @{iou}" in metrics
        assert f"mAP_mesh @{iou}" in metrics
    assert any(k.endswith("voxel IoU") for k in metrics), sorted(metrics)
    assert all(np.isfinite(v) for v in metrics.values()
               if isinstance(v, (int, float)))
