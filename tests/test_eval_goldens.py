"""Pin the evaluator with the reference's scene0549_00 golden artifacts.

The 13 golden boxes (`demo/outputs/scene0549_00/000000_pred_confident_nms_
bbox.npz`, byte-identical reference demo output) and their instance meshes
are pushed through corners -> assembly -> APCalculator (box mAP, and mesh
mAP through our SAT voxelizer), and the box path is cross-checked against
the reference's own numpy evaluator (`net_utils/eval_det.py:259-343`,
`box_util.py:90-115`) on identical inputs.

Frozen numbers below are regression pins for this framework's evaluator —
they were computed once and must not drift.
"""

import os

import numpy as np
import pytest

from rfdnet_tpu.eval.ap_helper import (
    APCalculator,
    assembly_gt_map_cls,
    assembly_pred_map_cls,
    corners_from_params,
)
from rfdnet_tpu.eval.box_util import flip_axis_to_camera, get_iou_obb
from rfdnet_tpu.eval.mesh_iou import compute_mesh_iou, mesh_iou, voxelize_mesh_pair
from rfdnet_tpu.meshing.mesh import TriMesh

GOLDEN_DIR = os.path.join(
    os.path.dirname(__file__), "..", "demo", "outputs", "scene0549_00"
)


@pytest.fixture(scope="module")
def golden():
    d = np.load(os.path.join(GOLDEN_DIR, "000000_pred_confident_nms_bbox.npz"))
    obbs = d["obbs"]  # (13, 7) depth-frame [cx cy cz sx sy sz heading]
    pids = d["proposal_map"].ravel()
    corners = corners_from_params(
        obbs[:, 3:6], -obbs[:, 6], flip_axis_to_camera(obbs[:, 0:3])
    )
    meshes = [
        TriMesh.load(os.path.join(GOLDEN_DIR, f"proposal_{j}_mesh.ply"))
        for j in pids
    ]
    return obbs, corners, pids, meshes


def test_golden_corners_match_reference_get_3d_box(golden):
    """Vectorized corner gen == reference `box_util.get_3d_box` on the
    golden boxes."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from ref_torch import install_reference

    install_reference()
    from net_utils.box_util import get_3d_box as ref_get_3d_box

    obbs, corners, _, _ = golden
    centers_cam = flip_axis_to_camera(obbs[:, 0:3])
    for k in range(len(obbs)):
        ref = ref_get_3d_box(obbs[k, 3:6], -obbs[k, 6], centers_cam[k])
        np.testing.assert_allclose(corners[k], ref, atol=1e-6)


def test_box_map_identity_is_one(golden):
    """pred == gt golden boxes -> every class AP = 1 at IoU 0.5."""
    obbs, corners, _, _ = golden
    rng = np.random.RandomState(0)
    cls = rng.randint(0, 8, len(obbs))
    scores = rng.rand(len(obbs)) * 0.5 + 0.5
    pred = {0: [(int(c), corners[k], scores[k]) for k, c in enumerate(cls)]}
    gt = {0: [(int(c), corners[k]) for k, c in enumerate(cls)]}
    calc = APCalculator(ap_iou_thresh=0.5)
    calc.step([pred[0]], [gt[0]])
    metrics = calc.compute_metrics(parallel=False)
    assert metrics["mAP"] == pytest.approx(1.0)
    assert metrics["AR"] == pytest.approx(1.0)


def test_box_map_matches_reference_evaluator(golden):
    """Jittered predictions vs golden GT: per-class (rec, prec, AP) must
    equal the reference evaluator's, at both IoU 0.25 and 0.5 and with
    both AP metrics."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from ref_torch import install_reference

    install_reference()
    from net_utils.eval_det import eval_det_cls_wo_mesh
    from net_utils.eval_det import get_iou_obb as ref_get_iou_obb

    from rfdnet_tpu.eval.eval_det import eval_det_cls

    obbs, _, _, _ = golden
    rng = np.random.RandomState(1)
    # three jittered predictions per golden box, random classes/scores
    preds, gts = {0: []}, {0: []}
    gt_cls = rng.randint(0, 4, len(obbs))
    for k in range(len(obbs)):
        gt_corners = corners_from_params(
            obbs[k, 3:6], -obbs[k, 6], flip_axis_to_camera(obbs[k, 0:3])
        )
        gts[0].append((int(gt_cls[k]), gt_corners))
        for _ in range(3):
            j = obbs[k].copy()
            j[0:3] += rng.randn(3) * 0.15
            j[3:6] *= 1 + rng.randn(3) * 0.15
            j[6] += rng.randn() * 0.2
            c = corners_from_params(
                j[3:6], -j[6], flip_axis_to_camera(j[0:3])
            )
            preds[0].append((int(rng.randint(0, 4)), c, float(rng.rand())))

    for ov in (0.25, 0.5):
        for use_07 in (False, True):
            for cls_id in range(4):
                p = {
                    0: [
                        (c, s) for (ci, c, s) in preds[0] if ci == cls_id
                    ]
                }
                g = {0: [c for (ci, c) in gts[0] if ci == cls_id]}
                if not g[0]:
                    continue
                mine = eval_det_cls(
                    p, g, ovthresh=ov, use_07_metric=use_07,
                    get_iou_func=get_iou_obb,
                )
                ref = eval_det_cls_wo_mesh(
                    p, g, ovthresh=ov, use_07_metric=use_07,
                    get_iou_func=ref_get_iou_obb,
                )
                np.testing.assert_allclose(mine[2], ref[2], atol=1e-9)
                np.testing.assert_allclose(mine[0], ref[0], atol=1e-9)
                np.testing.assert_allclose(mine[1], ref[1], atol=1e-9)


def _voxel_size_from_boxes(obbs):
    """Test-protocol voxel size: scene z extent / 46 (`network.py:164`)."""
    z_hi = np.max(obbs[:, 2] + obbs[:, 5] / 2)
    z_lo = np.min(obbs[:, 2] - obbs[:, 5] / 2)
    return float(z_hi - z_lo) / 46.0


@pytest.fixture(scope="module")
def golden_voxel_pairs(golden):
    """Golden meshes are canonical-frame; place each into its NMS box
    (the reference's `fit_shapenet_obj_to_votenet_box` step,
    `ap_helper.py:404-426`) before voxelizing at scene voxel size."""
    from rfdnet_tpu.eval.tester import place_mesh_in_box

    obbs, corners, _, meshes = golden
    vs = _voxel_size_from_boxes(obbs)
    placed = [
        place_mesh_in_box(m, corners[k]) for k, m in enumerate(meshes)
    ]
    return [
        voxelize_mesh_pair(np.asarray(m.vertices), np.asarray(m.faces), vs)
        for m in placed
    ], vs


def test_mesh_map_identity_is_one(golden, golden_voxel_pairs):
    obbs, corners, _, _ = golden
    pairs, _ = golden_voxel_pairs
    rng = np.random.RandomState(2)
    cls = rng.randint(0, 8, len(obbs))
    pred = [
        (int(c), corners[k], 0.9, pairs[k]) for k, c in enumerate(cls)
    ]
    gt = [(int(c), corners[k], pairs[k]) for k, c in enumerate(cls)]
    calc = APCalculator(ap_iou_thresh=0.5, mesh_iou_func=mesh_iou)
    calc.step([pred], [gt])
    metrics = calc.compute_metrics(parallel=False)
    assert metrics["mAP"] == pytest.approx(1.0)
    assert metrics["mAP_mesh"] == pytest.approx(1.0)


def test_golden_mesh_iou_matrix_frozen(golden_voxel_pairs):
    """Pairwise mesh IoU of the first golden meshes through the SAT
    voxelizer + mutual-containment formula (`eval_det.py:27-83`): identity
    is 1, and the off-diagonal values are pinned (regression for the
    voxelizer, flood fill, and IoU formula)."""
    pairs, vs = golden_voxel_pairs
    n = 4
    mat = np.zeros((n, n))
    for a in range(n):
        for b in range(n):
            mat[a, b] = mesh_iou(pairs[a], pairs[b])
    assert np.allclose(np.diag(mat), 1.0)
    assert np.allclose(mat, mat.T, atol=1e-12)
    # frozen values (computed once from the byte-identical reference
    # goldens; update ONLY with a documented voxelizer change)
    frozen = FROZEN_MESH_IOU
    np.testing.assert_allclose(mat, frozen, atol=1e-6)


# filled by the pin run below (see test file history): pairwise mesh IoU of
# golden proposals [22, 38, 97, 99] at scene voxel size
FROZEN_MESH_IOU = np.array(
    [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ]
)


def test_mesh_map_degraded_frozen(golden, golden_voxel_pairs):
    """Every prediction carries mesh 0 (the duplicated-mesh failure mode):
    box mAP stays 1.0 (boxes are correct), mesh mAP collapses to one TP out
    of 13 GTs — exactly one 11-point bucket — pinning the reference's
    independent-mesh-assignment TP semantics (`eval_det.py:199-234`)."""
    obbs, corners, _, _ = golden
    pairs, _ = golden_voxel_pairs
    n = len(pairs)
    pred = [(0, corners[k], 0.9 - 0.01 * k, pairs[0]) for k in range(n)]
    gt = [(0, corners[k], pairs[k]) for k in range(n)]
    calc = APCalculator(ap_iou_thresh=0.5, mesh_iou_func=mesh_iou)
    calc.step([pred], [gt])
    metrics = calc.compute_metrics(parallel=False)
    assert metrics["mAP"] == pytest.approx(1.0)
    # one mesh TP (the first/highest-score pred claims GT0; duplicates are
    # FP; rec tops out at 1/13 < 0.1 -> only the t=0.0 bucket scores, with
    # max precision 1.0): 11-point AP = 1/11
    assert metrics["mAP_mesh"] == pytest.approx(1.0 / 11.0, abs=1e-9)
