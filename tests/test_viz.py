"""Scene visualization suite tests (`rfdnet_tpu/utils/scene_viz.py`) —
the non-VTK rebuild of `utils/scannet/visualization/{vis_gt,
vis_for_comparison}.py`."""

import os
import pickle

import numpy as np
import pytest

from rfdnet_tpu.utils.scene_viz import (
    SceneRender,
    box7_to_vectors,
    hls_palette,
    place_canonical_mesh_in_box7,
    render_comparison,
    render_gt_scene,
)


def _cube_mesh():
    v = np.array([[x, y, z] for z in (-0.5, 0.5) for y in (-0.5, 0.5)
                  for x in (-0.5, 0.5)], np.float64)
    f = np.array([[0, 1, 2], [1, 3, 2], [4, 6, 5], [5, 6, 7],
                  [0, 4, 1], [1, 4, 5], [2, 3, 6], [3, 7, 6],
                  [0, 2, 4], [2, 6, 4], [1, 5, 3], [3, 5, 7]])
    return v, f


def test_hls_palette_shape_and_range():
    p = hls_palette(8)
    assert p.shape == (8, 3)
    assert (p >= 0).all() and (p <= 1).all()
    # distinct hues
    assert len({tuple(np.round(c, 4)) for c in p}) == 8


def test_box7_to_vectors_orthogonal_and_sized():
    box7 = np.array([1.0, 2.0, 0.5, 2.0, 1.0, 3.0, 0.7])
    c, vec = box7_to_vectors(box7)
    np.testing.assert_allclose(c, box7[:3])
    # half-edge lengths = size/2
    np.testing.assert_allclose(
        np.linalg.norm(vec, axis=1), box7[3:6] / 2, atol=1e-12
    )
    # pairwise orthogonal
    g = vec @ vec.T
    np.testing.assert_allclose(g - np.diag(np.diag(g)), 0, atol=1e-12)


def test_place_canonical_mesh_matches_box_corners():
    box7 = np.array([0.5, -1.0, 0.25, 1.0, 2.0, 0.5, 0.3])
    v, _ = _cube_mesh()
    placed = place_canonical_mesh_in_box7(v, box7)
    c, vec = box7_to_vectors(box7)
    # canonical cube corners land exactly on the box corners
    expect = np.array([c + sx * vec[0] + sy * vec[1] + sz * vec[2]
                       for sz in (-1, 1) for sy in (-1, 1)
                       for sx in (-1, 1)])
    np.testing.assert_allclose(placed, expect, atol=1e-12)


@pytest.fixture
def scene(rng):
    pts = rng.rand(5000, 3) * np.array([6, 6, 3]) - np.array([3, 3, 0])
    v, f = _cube_mesh()
    box7 = np.array([1.0, 0.5, 0.6, 1.2, 0.8, 1.2, 0.4])
    c, vec = box7_to_vectors(box7)
    mesh = (place_canonical_mesh_in_box7(v, box7), f)
    return SceneRender(pts, meshes=[mesh], centers=[c], vectors=[vec],
                       class_ids=[3])


def test_render_png_and_ply(scene, tmp_path):
    png = str(tmp_path / "scene.png")
    scene.render(png)
    assert os.path.getsize(png) > 1000
    scene.render(str(tmp_path / "pts.png"), only_points=True)
    ply = scene.export_ply(str(tmp_path / "scene.ply"))
    head = open(ply, "rb").read(200)
    assert head.startswith(b"ply")
    assert b"element face 12" in head


def test_render_comparison(scene, rng, tmp_path):
    pts = scene.scene_points
    gt = SceneRender(pts, meshes=scene.meshes, centers=scene.centers,
                     vectors=scene.vectors, class_ids=[3])
    out = str(tmp_path / "cmp.png")
    render_comparison(scene, gt, out)
    assert os.path.getsize(out) > 1000


def test_render_gt_scene_from_prepared_dir(rng, tmp_path):
    """vis_gt capability: scan + bbox.pkl -> PNG + PLY, with CAD meshes
    placed into their boxes."""
    scene_dir = str(tmp_path / "scene0000_00")
    os.makedirs(scene_dir)
    pts = rng.rand(2000, 3).astype(np.float32) * 4
    np.savez(os.path.join(scene_dir, "full_scan.npz"),
             mesh_vertices=pts,
             point_votes=np.zeros((2000, 10), np.float32),
             instance_labels=np.zeros(2000, np.int32))
    instances = [{
        "box3D": np.array([2.0, 2.0, 1.0, 1.0, 1.0, 1.0, 0.2]),
        "cls_id": 7,  # ScanNet class id (table) -> palette index lookup
        "shapenet_catid": "04379243", "shapenet_id": "abc",
        "instance_id": 1,
        "box_corners": np.zeros((8, 3)),
    }]
    with open(os.path.join(scene_dir, "bbox.pkl"), "wb") as f:
        pickle.dump(instances, f)

    v, fc = _cube_mesh()
    calls = []

    def mesh_fn(catid, sid):
        calls.append((catid, sid))
        return v, fc

    out = str(tmp_path / "gt.png")
    render_gt_scene(scene_dir, out, shapenet_mesh_fn=mesh_fn)
    assert calls == [("04379243", "abc")]
    assert os.path.getsize(out) > 1000
    assert os.path.isfile(str(tmp_path / "gt.ply"))
