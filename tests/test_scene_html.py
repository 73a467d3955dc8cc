"""Interactive WebGL scene export (`utils/scene_html.py`) — the
reference's VTK interactive-window equivalent
(`utils/scannet/visualization/vis_scannet.py:23-369`)."""

import base64
import json
import re

import numpy as np
import pytest

from rfdnet_tpu.utils.scene_html import (
    export_comparison_html,
    export_scene_html,
)
from rfdnet_tpu.utils.scene_viz import (
    SceneRender,
    box7_to_vectors,
    corners_to_center_vectors,
    _corners,
)


def _mk_render(seed=0, n_pts=500):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n_pts, 3))
    cube_v = np.array(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
        np.float64,
    )
    cube_f = np.array(
        [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
         [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]],
        np.int64,
    )
    c1, v1 = box7_to_vectors(np.array([0.5, 0.5, 0.5, 1, 1, 1, 0.3]))
    c2, v2 = box7_to_vectors(np.array([-1, 0, 0, 0.5, 2, 1, -0.7]))
    return SceneRender(
        pts, meshes=[(cube_v, cube_f), (cube_v - 2.0, cube_f)],
        centers=[c1, c2], vectors=[v1, v2], class_ids=[0, 3],
    )


def _payload(path):
    with open(path) as f:
        html = f.read()
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    assert m, "embedded payload not found"
    return html, json.loads(m.group(1))


def _f32(b64):
    return np.frombuffer(base64.b64decode(b64), np.float32)


def test_export_scene_html(tmp_path):
    r = _mk_render()
    out = str(tmp_path / "scene.html")
    export_scene_html(r, out, title="t", class_names=["table", "chair"])
    html, data = _payload(out)
    s = data["scenes"]["scene"]
    # points round-trip (full cloud: 500 < max_points)
    pos = _f32(s["points"]["pos"]).reshape(-1, 3)
    assert s["points"]["n"] == 500 and pos.shape == (500, 3)
    np.testing.assert_allclose(pos, r.scene_points.astype(np.float32))
    # flat-shaded mesh VBO: 2 cubes x 12 tris x 3 verts
    assert s["mesh"]["n"] == 72
    assert len(_f32(s["mesh"]["nrm"])) == 72 * 3
    # 2 boxes x 12 edges x 2 endpoints
    assert s["box_lines"]["n"] == 48
    # 2 boxes x 6 faces x 2 tris x 3 verts
    assert s["box_faces"]["n"] == 72
    # arrows: 3 axes x (1 shaft + 2 head) x 2 endpoints per box
    assert s["arrows"]["n"] == 36
    # legend + standalone (no external fetches)
    assert "table" in html and "chair" in html
    assert "http://" not in html and "https://" not in html
    assert "getContext" in html


def test_export_comparison_html(tmp_path):
    out = str(tmp_path / "cmp.html")
    export_comparison_html(_mk_render(0), _mk_render(1), out)
    _, data = _payload(out)
    assert set(data["scenes"]) == {"pred", "gt"}
    assert data["scenes"]["pred"]["mesh"]["n"] == 72


def test_corners_to_center_vectors_roundtrip():
    box7 = np.array([1.0, -2.0, 0.5, 2.0, 1.0, 3.0, 0.9])
    c, vec = box7_to_vectors(box7)
    c2, vec2 = corners_to_center_vectors(_corners(c, vec))
    np.testing.assert_allclose(c2, c, atol=1e-12)
    np.testing.assert_allclose(vec2, vec, atol=1e-12)


def test_tester_hook_alignment():
    """Empty meshes for proposals without a generation keep the joint
    class_ids indexing valid inside SceneRender/_pack_scene."""
    r = SceneRender(
        np.zeros((10, 3)),
        meshes=[(np.zeros((0, 3)), np.zeros((0, 3), np.int64))],
        centers=[np.zeros(3)], vectors=[np.eye(3) * 0.5], class_ids=[5],
    )
    from rfdnet_tpu.utils.scene_html import _pack_scene

    s = _pack_scene(r, "class", 1000)
    assert s["mesh"]["n"] == 0 and s["box_lines"]["n"] == 24
