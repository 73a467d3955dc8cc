"""Test-time mesh-to-scan box refit.

Semantic rebuild of `models/iscnet/modules/network.py:182-303`
(fit_mesh_to_scan + chamfer_dist): for every confident NMS survivor, the
generated mesh's vertices (centered, rotated into the scan frame by the
ShapeNet->depth axis swap, normalized to unit extents, scaled to the
predicted box size) are registered against the scene points inside a
1.2x-enlarged box (floor points below the 5th height percentile removed)
by optimizing the box centroid + heading with 100 Adam(lr=0.01) steps on
a one-directional masked chamfer loss (scene->mesh, x1e3), keeping the
best-loss parameters.

TPU-first: the reference runs a Python optimizer loop issuing one fused
CUDA chamfer per step; here the whole 100-step optimization is ONE jitted
`lax.scan` over optax-Adam updates with the blocked chamfer kernel, for
all proposals at once. Host work is only mesh-vertex normalization and
point-in-box extraction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.chamfer import chamfer_distance
from .box_util import flip_axis_to_camera, flip_axis_to_depth, get_3d_box

TRANSFORM_SHAPENET = np.array([[0, 0, -1], [-1, 0, 0], [0, 1, 0]], np.float64)


def _box_params_from_corners(box_corners_cam: np.ndarray) -> np.ndarray:
    """corners (8, 3) camera frame -> [centroid(3), sizes(3), orientation]
    in depth frame (`network.py:218-227`)."""
    c = flip_axis_to_depth(box_corners_cam)
    centroid = (c.max(0) + c.min(0)) / 2.0
    forward = c[1] - c[2]
    left = c[0] - c[1]
    up = c[6] - c[2]
    orientation = np.arctan2(forward[1], forward[0])
    sizes = np.linalg.norm(np.stack([forward, left, up]), axis=1)
    return np.concatenate([centroid, sizes, [orientation]])


def _points_in_obb(points: np.ndarray, centroid, sizes, orientation):
    """Scene points inside the oriented box: inverse-rotate and bounds-test
    (equivalent to the reference's Delaunay in_hull on box corners,
    `net_utils/libs.py` extract_pc_in_box3d, for convex boxes)."""
    c, s = np.cos(orientation), np.sin(orientation)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    local = (points - centroid) @ R
    ok = np.all(np.abs(local) <= np.asarray(sizes) / 2.0 + 1e-9, axis=1)
    return points[ok]


@partial(jax.jit, static_argnames=("iterations",))
def _optimize(obj_points, pc_in_box, pc_mask, centroids, orientations,
              loss_denom, iterations: int = 100):
    """Jitted joint refit: obj_points (K, No, 3) pre-scaled mesh points,
    pc_in_box (K, Np, 3), pc_mask (K, Np), centroids (K, 3),
    orientations (K,). Returns best (centroids, orientations).

    K/No/Np are pow2-bucketed by the caller (padded rows have all-zero
    pc_mask); `loss_denom` (traced scalar) keeps the loss on the
    reference's normalization — torch.mean over the FULL
    (K_actual, 50000) matrix (`network.py:303`) — so the Adam trajectory
    is invariant to the bucketing."""
    tx = optax.adam(1e-2)
    params = {"centroid": centroids, "orientation": orientations}

    def loss_fn(params):
        th = params["orientation"]
        c, s = jnp.cos(th), jnp.sin(th)
        zeros = jnp.zeros_like(c)
        ones = jnp.ones_like(c)
        # row-vector convention: p @ R (`network.py:296-301` axis_rectified)
        R = jnp.stack([
            jnp.stack([c, s, zeros], -1),
            jnp.stack([-s, c, zeros], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ], -2)  # (K, 3, 3)
        placed = jnp.einsum("kno,koj->knj", obj_points, R) + params[
            "centroid"
        ][:, None, :]
        _, dist2 = chamfer_distance(placed, pc_in_box)
        return jnp.sum(dist2 * pc_mask) / loss_denom * 1e3

    opt_state = tx.init(params)

    def step(carry, _):
        params, opt_state, best_params, best_loss = carry
        loss, grads = jax.value_and_grad(loss_fn)(params)
        improved = loss < best_loss
        best_params = jax.tree_util.tree_map(
            lambda b, p: jnp.where(improved, p, b), best_params, params
        )
        best_loss = jnp.minimum(best_loss, loss)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, best_params, best_loss), loss

    (params, _, best_params, best_loss), _ = jax.lax.scan(
        step, (params, opt_state, params, jnp.float32(jnp.inf)), None,
        length=iterations,
    )
    return best_params["centroid"], best_params["orientation"]


def fit_meshes_to_scan(parsed_predictions: dict, meshes: list,
                       proposal_ids: np.ndarray, valid: np.ndarray,
                       point_clouds: np.ndarray, dump_threshold: float,
                       max_obj_points: int = 10_000,
                       max_pc_in_box: int = 50_000,
                       iterations: int = 100) -> dict:
    """Refit boxes for batch 0..B-1. meshes: flat list of TriMesh aligned
    with proposal_ids.reshape(-1, 3) rows. Mutates + returns
    parsed_predictions['pred_corners_3d_upright_camera'] (numpy)."""
    # np.array (copy): the input may be a CPU-jax zero-copy READ-ONLY
    # view, and this function writes refit corners back into it
    corners_all = np.array(parsed_predictions["pred_corners_3d_upright_camera"])
    pred_mask = np.asarray(parsed_predictions["pred_mask"])
    obj_prob = np.asarray(parsed_predictions["obj_prob"])
    proposal_ids = np.asarray(proposal_ids)
    valid = np.asarray(valid)
    point_clouds = np.asarray(point_clouds)
    B, G, _ = proposal_ids.shape

    index_list, obj_list, pc_list, pc_mask_list, box_params_list = (
        [], [], [], [], [],
    )
    for i in range(B):
        height = np.percentile(point_clouds[i, :, 2], 5)
        scene = point_clouds[i, point_clouds[i, :, 2] >= height, :3]
        for g in range(G):
            if not valid[i, g]:
                continue
            j = int(proposal_ids[i, g, 0])
            if not (pred_mask[i, j] and obj_prob[i, j] > dump_threshold):
                continue
            mesh = meshes[i * G + g]
            if len(mesh.vertices) == 0:
                continue
            pts = np.asarray(mesh.vertices)
            pts = pts - (pts.max(0) + pts.min(0)) / 2.0
            pts = pts @ TRANSFORM_SHAPENET.T
            extent = pts.max(0) - pts.min(0)
            pts = pts / np.where(extent > 0, extent, 1.0)
            if len(pts) > max_obj_points:
                pts = pts[:max_obj_points]

            box_params = _box_params_from_corners(corners_all[i, j])
            pc_in_box = _points_in_obb(
                scene, box_params[:3], 1.2 * box_params[3:6], box_params[6]
            )
            if len(pc_in_box) < 5:
                continue
            if len(pc_in_box) > max_pc_in_box:
                pc_in_box = pc_in_box[:max_pc_in_box]

            index_list.append((i, j))
            obj_list.append(
                (pts * box_params[3:6]).astype(np.float32)  # pre-scale
            )
            pc_list.append(pc_in_box.astype(np.float32))
            box_params_list.append(box_params)

    if not index_list:
        return parsed_predictions

    # pow2-bucket the padded shapes to the scene's actual maxima instead
    # of always (K, 10000) x (K, 50000): typical 32^3-grid meshes have
    # ~2k vertices and boxes hold ~4k scene points, so the chamfer matrix
    # shrinks ~30x. Exactness: every real row keeps >=1 zero pad point
    # (+1 below), duplicating the reference's padded-zero min candidates
    # (`network.py:193-198` pads with zeros the same way), and the loss
    # normalization is pinned to the reference's via loss_denom.
    def _pow2(n, lo, hi):
        b = lo
        while b < n and b < hi:
            b *= 2
        return min(b, hi)

    K = len(index_list)
    Kb = _pow2(K, 4, 1 << 30)
    No = _pow2(max(len(o) for o in obj_list) + 1, 512, max_obj_points)
    Np = _pow2(max(len(p) for p in pc_list) + 1, 1024, max_pc_in_box)

    obj = np.zeros((Kb, No, 3), np.float32)
    pc = np.zeros((Kb, Np, 3), np.float32)
    pcm = np.zeros((Kb, Np), np.float32)
    for k in range(K):
        obj[k, : len(obj_list[k])] = obj_list[k]
        pc[k, : len(pc_list[k])] = pc_list[k]
        pcm[k, : len(pc_list[k])] = 1.0

    box_params_arr = np.stack(box_params_list)
    init = np.zeros((Kb, 7), np.float32)
    init[:K] = box_params_arr
    centroids, orientations = _optimize(
        jnp.asarray(obj),
        jnp.asarray(pc),
        jnp.asarray(pcm),
        jnp.asarray(init[:, :3]),
        jnp.asarray(init[:, 6]),
        jnp.float32(K * max_pc_in_box),
        iterations=iterations,
    )
    centroids = np.asarray(centroids)
    orientations = np.asarray(orientations)

    for k, (i, j) in enumerate(index_list):
        corners_all[i, j] = get_3d_box(
            box_params_arr[k, 3:6], -orientations[k],
            flip_axis_to_camera(centroids[k]),
        )
    parsed_predictions["pred_corners_3d_upright_camera"] = corners_all
    return parsed_predictions
