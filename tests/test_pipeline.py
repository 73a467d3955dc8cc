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
        jnp.float32(400), iterations=60,
    )
    assert np.linalg.norm(np.asarray(cen)) < np.linalg.norm(start)


def test_refit_recovers_heading():
    """Scene = the object's own points rotated by a known heading: the
    refit must recover that heading (`network.py:268-286` optimizes
    centroid + orientation jointly)."""
    from rfdnet_tpu.eval.refit import _optimize

    rng = np.random.RandomState(1)
    # elongated slab so heading is observable (and not pi/2-symmetric)
    obj = rng.uniform(-0.5, 0.5, size=(1, 300, 3)).astype(np.float32)
    obj[..., 0] *= 2.0  # x extent 2, y extent 1
    theta = 0.35
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], np.float32)
    scene = (obj[0] @ R)[None]  # same row-vector convention as _optimize

    cen, ori = _optimize(
        jnp.asarray(obj), jnp.asarray(scene),
        jnp.ones((1, 300), jnp.float32),
        jnp.zeros((1, 3), jnp.float32), jnp.zeros((1,), jnp.float32),
        jnp.float32(300), iterations=100,
    )
    err = (float(ori[0]) - theta + np.pi) % (2 * np.pi) - np.pi
    assert abs(err) < 0.05
    assert np.linalg.norm(np.asarray(cen)) < 0.05


def test_refit_keeps_best_loss_params():
    """`network.py:268-286` keeps the best-loss iterate, not the last.
    One point at x=0.004 from the init: Adam(lr=1e-2)'s first step
    overshoots to x~0.01 (worse loss), so the returned centroid must be
    the INIT, not the post-step parameters."""
    from rfdnet_tpu.eval.refit import _optimize

    obj = np.zeros((1, 1, 3), np.float32)
    scene = np.array([[[0.004, 0.0, 0.0]]], np.float32)
    cen, _ = _optimize(
        jnp.asarray(obj), jnp.asarray(scene),
        jnp.ones((1, 1), jnp.float32),
        jnp.zeros((1, 3), jnp.float32), jnp.zeros((1,), jnp.float32),
        jnp.float32(1), iterations=2,
    )
    np.testing.assert_allclose(np.asarray(cen), 0.0, atol=1e-7)


def test_refit_floor_filter_and_min_points():
    """The 5th-height-percentile floor cut (`network.py:254-257`) and the
    <5-points-in-box skip: a proposal whose box contains only floor-level
    points is left untouched; lifting those same points above the
    percentile makes the refit run and move the box."""
    from rfdnet_tpu.eval.refit import fit_meshes_to_scan
    from rfdnet_tpu.eval.box_util import flip_axis_to_camera, get_3d_box
    from rfdnet_tpu.meshing.mesh import TriMesh

    rng = np.random.RandomState(2)
    K = 4

    def make_parsed():
        corners = np.zeros((1, K, 8, 3), np.float32)
        for j in range(K):
            corners[0, j] = get_3d_box(
                np.array([1.0, 1.0, 1.0]), 0.0,
                flip_axis_to_camera(np.array([0.0, 0.0, 1.0])),
            )
        return {
            "pred_corners_3d_upright_camera": corners.copy(),
            "pred_mask": np.ones((1, K), bool),
            "obj_prob": np.full((1, K), 0.9, np.float32),
        }

    cube = TriMesh(
        rng.uniform(-0.5, 0.5, (64, 3)), np.zeros((0, 3), np.int64)
    )
    proposal_ids = np.zeros((1, 1, 3), np.int64)  # proposal j=0
    valid = np.ones((1, 1), bool)

    def make_scene(floor_z):
        # Box (1.2x-enlarged) spans z in [0.4, 1.6]. 300 "floor" points
        # at floor_z inside the box footprint (3% of the scene), 3 other
        # in-box points, and 9697 far points (outside the footprint) with
        # z uniform in [0.6, 3.0] — so the scene's 5th height percentile
        # lands at z ~ 0.65, above a floor at 0.5 but below one at 1.2.
        floor = np.concatenate([
            rng.uniform(-0.5, 0.5, (300, 2)),
            rng.uniform(floor_z - 0.02, floor_z + 0.02, (300, 1)),
        ], axis=1)
        inbox = np.array([[0.1, 0.1, 1.2], [-0.1, 0.0, 1.1],
                          [0.0, -0.1, 0.9]])
        far = np.concatenate([
            rng.uniform(5.0, 9.0, (9697, 2)),
            rng.uniform(0.6, 3.0, (9697, 1)),
        ], axis=1)
        pts = np.concatenate([floor, inbox, far]).astype(np.float32)
        return np.concatenate(
            [pts, np.zeros((len(pts), 1), np.float32)], axis=1
        )[None]

    # floor at z=0.5 (inside the box, below the 5th percentile) ->
    # filtered out -> <5 points left in box -> proposal skipped
    parsed = make_parsed()
    before = parsed["pred_corners_3d_upright_camera"].copy()
    out = fit_meshes_to_scan(
        parsed, [cube], proposal_ids, valid, make_scene(0.5), 0.5,
        iterations=10,
    )
    np.testing.assert_array_equal(
        out["pred_corners_3d_upright_camera"], before
    )

    # same points lifted above the percentile -> refit runs, box moves
    parsed2 = make_parsed()
    out2 = fit_meshes_to_scan(
        parsed2, [cube], proposal_ids, valid, make_scene(1.2), 0.5,
        iterations=10,
    )
    assert not np.allclose(
        out2["pred_corners_3d_upright_camera"][0, 0], before[0, 0]
    )
    # untouched proposals stay put
    np.testing.assert_array_equal(
        out2["pred_corners_3d_upright_camera"][0, 1:], before[0, 1:]
    )


def test_refit_bucketing_matches_full_padding():
    """The refit optimization must be invariant to the padded shapes
    (fit_meshes_to_scan pow2-buckets them): every real row keeps >=1
    zero pad point so the chamfer min-candidates are identical, padded
    K rows are fully masked, and loss_denom pins the normalization —
    so _optimize at (K=2,No=64,Np=512) and (K=4,No=512,Np=2048) with the
    same data + denominator must agree to float tolerance."""
    from rfdnet_tpu.eval.refit import _optimize

    rng = np.random.RandomState(7)
    obj_real = [rng.uniform(-0.5, 0.5, (60, 3)).astype(np.float32),
                rng.uniform(-0.4, 0.4, (33, 3)).astype(np.float32)]
    pc_real = [rng.uniform(-0.8, 0.8, (300, 3)).astype(np.float32),
               rng.uniform(-0.6, 0.6, (211, 3)).astype(np.float32)]
    starts = np.array([[0.2, -0.1, 0.05], [-0.15, 0.2, 0.0]], np.float32)
    denom = np.float32(2 * 50_000)

    def run(Kb, No, Np):
        obj = np.zeros((Kb, No, 3), np.float32)
        pc = np.zeros((Kb, Np, 3), np.float32)
        pcm = np.zeros((Kb, Np), np.float32)
        cen = np.zeros((Kb, 3), np.float32)
        for k in range(2):
            obj[k, : len(obj_real[k])] = obj_real[k]
            pc[k, : len(pc_real[k])] = pc_real[k]
            pcm[k, : len(pc_real[k])] = 1.0
            cen[k] = starts[k]
        c, o = _optimize(
            jnp.asarray(obj), jnp.asarray(pc), jnp.asarray(pcm),
            jnp.asarray(cen), jnp.zeros((Kb,), jnp.float32),
            jnp.float32(denom), iterations=25,
        )
        return np.asarray(c)[:2], np.asarray(o)[:2]

    c1, o1 = run(2, 64, 512)
    c2, o2 = run(4, 512, 2048)
    np.testing.assert_allclose(c1, c2, atol=2e-5)
    np.testing.assert_allclose(o1, o2, atol=2e-5)


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
