"""End-to-end pipeline tests on synthetic data with random weights:
Tester.test_step -> AP metrics, mesh generation, box refit, demo driver.
Small shapes keep CPU compile time bounded."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rfdnet_tpu.config.config import Config
from rfdnet_tpu.config.scannet import ScannetConfig
from rfdnet_tpu.data.synthetic import synthetic_scene_batch
from rfdnet_tpu.models import ISCNet

N_POINTS = 2048


@pytest.fixture(scope="module")
def cfg():
    return Config(
        {
            "data": {"num_point": N_POINTS},
            "test": {
                "phase": "completion", "batch_size": 1,
                "evaluate_mesh_mAP": True,
                "ap_iou_thresholds": [0.25],
            },
            "generation": {"generate_mesh": True, "resolution_0": 16},
            "log": {"path": "/tmp/rfdnet_test_out"},
        },
        mode="test",
    )


@pytest.fixture(scope="module")
def model_and_vars(cfg):
    rng = np.random.RandomState(0)
    model = cfg.build_model(generate_limit=4)
    batch = synthetic_scene_batch(
        rng, batch_size=1, num_points=N_POINTS,
        mean_size_arr=cfg.dataset_config.mean_size_arr,
    )
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(
        jax.random.PRNGKey(0), batch_j, train=False,
        rng=jax.random.PRNGKey(1),
    )
    return model, variables, batch


def test_tester_step_and_metrics(cfg, model_and_vars):
    from rfdnet_tpu.eval.tester import Tester

    model, variables, batch = model_and_vars
    # attach 16^3 gt voxels (the completion-phase dataset provides them)
    rng = np.random.RandomState(1)
    batch = dict(batch)
    batch["object_voxels"] = (
        rng.rand(1, 64, 16, 16, 16) > 0.5
    ).astype(np.float32)

    tester = Tester(cfg, model, variables, cfg.dataset_config, log=lambda m: None)
    out = tester.test_step(batch)
    assert isinstance(out["batch_pred_map_cls"], list)
    assert isinstance(out["batch_gt_map_cls"], list)
    # gt boxes present (synthetic scene has 4 objects)
    assert len(out["batch_gt_map_cls"][0]) == 4
    assert out["meshes"] is not None and len(out["meshes"]) == 4

    # AP accumulation end-to-end
    from rfdnet_tpu.eval.ap_helper import APCalculator

    calc = APCalculator(0.25, cfg.dataset_config.class2type)
    calc.step(out["batch_pred_map_cls"], out["batch_gt_map_cls"])
    metrics = calc.compute_metrics(parallel=False)
    assert "mAP" in metrics
    assert np.isfinite(metrics["mAP"])


def test_mesh_iou_identity():
    from rfdnet_tpu.eval.mesh_iou import compute_mesh_iou, voxelize_mesh_pair

    v = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
         [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], dtype=np.float64,
    )
    f = np.array(
        [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
         [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
         [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]], dtype=np.int32,
    )
    pair = voxelize_mesh_pair(v, f, 0.1)
    assert compute_mesh_iou(pair, pair) == pytest.approx(1.0)
    # disjoint boxes -> 0
    pair2 = voxelize_mesh_pair(v + 5.0, f, 0.1)
    assert compute_mesh_iou(pair, pair2) == 0.0


def test_refit_recovers_translation():
    """A unit-cube 'mesh' offset from a synthetic box point cloud: the
    chamfer refit should move the centroid toward the points."""
    from rfdnet_tpu.eval.refit import _optimize

    rng = np.random.RandomState(0)
    pc = rng.uniform(-0.5, 0.5, size=(1, 400, 3)).astype(np.float32)
    obj = rng.uniform(-0.5, 0.5, size=(1, 200, 3)).astype(np.float32)
    start = np.array([[0.4, -0.3, 0.2]], np.float32)
    cen, ori = _optimize(
        jnp.asarray(obj), jnp.asarray(pc),
        jnp.ones((1, 400), jnp.float32),
        jnp.asarray(start), jnp.zeros((1,), jnp.float32),
        iterations=60,
    )
    assert np.linalg.norm(np.asarray(cen)) < np.linalg.norm(start)


def test_demo_driver(tmp_path, cfg, model_and_vars):
    """Demo on a synthetic .off scene with random weights: runs the full
    path and dumps the reference's output artifact set."""
    from rfdnet_tpu.demo import generate, load_demo_data, save_visualization
    from rfdnet_tpu.meshing.mesh import write_off

    model, variables, batch = model_and_vars
    pts = batch["point_clouds"][0, :, :3]
    scene_path = str(tmp_path / "scene.off")
    write_off(scene_path, pts, np.zeros((0, 3), np.int32))

    data = load_demo_data(scene_path, num_points=N_POINTS)
    assert data["point_clouds"].shape == (1, N_POINTS, 4)
    parsed, gen, meshes = generate(cfg, model, variables, data)
    out_dir = save_visualization(
        cfg, data, parsed, gen, meshes, str(tmp_path / "vis")
    )
    assert os.path.exists(os.path.join(out_dir, "000000_pc.ply"))
    assert os.path.exists(
        os.path.join(out_dir, "000000_pred_confident_nms_bbox.npz")
    )


def test_demo_render(tmp_path, cfg, model_and_vars):
    """Offscreen pred.png render (VTK-role replacement)."""
    from rfdnet_tpu.demo import generate, load_demo_data, visualize
    from rfdnet_tpu.meshing.mesh import write_off

    model, variables, batch = model_and_vars
    pts = batch["point_clouds"][0, :, :3]
    scene_path = str(tmp_path / "scene.off")
    write_off(scene_path, pts, np.zeros((0, 3), np.int32))
    data = load_demo_data(scene_path, num_points=N_POINTS)
    parsed, gen, meshes = generate(cfg, model, variables, data)
    out = visualize(data, parsed, gen, meshes, str(tmp_path / "pred.png"))
    assert os.path.getsize(out) > 10_000
