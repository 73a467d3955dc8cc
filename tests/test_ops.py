"""Kernel-layer unit tests against dense numpy oracles.

Oracles re-state the reference CUDA semantics (sampling_gpu.cu,
ball_query_gpu.cu, interpolate_gpu.cu, chamfer_distance.cu,
net_utils/nn_distance.py) as explicit O(N*M) loops — the pattern the
reference itself uses in `net_utils/nn_distance.py:63-94` demo_nn_distance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rfdnet_tpu import ops


# ---------------------------------------------------------------- oracles
def fps_oracle(xyz, npoint, skip_near_origin=True):
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), dtype=np.int32)
    for b in range(B):
        temp = np.full((N,), 1e10, dtype=np.float32)
        mag = np.sum(xyz[b] ** 2, axis=-1)
        old = 0
        for j in range(1, npoint):
            d = np.sum((xyz[b] - xyz[b, old]) ** 2, axis=-1).astype(np.float32)
            temp = np.minimum(temp, d)
            eff = temp.copy()
            if skip_near_origin:
                eff[mag <= 1e-3] = -1.0
            old = int(np.argmax(eff))
            out[b, j] = old
    return out


def ball_query_oracle(xyz, new_xyz, radius, nsample):
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    out = np.zeros((B, M, nsample), dtype=np.int32)
    for b in range(B):
        for j in range(M):
            cnt = 0
            for k in range(N):
                d2 = np.sum((new_xyz[b, j] - xyz[b, k]) ** 2)
                if d2 < radius**2:
                    if cnt == 0:
                        out[b, j, :] = k
                    out[b, j, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
    return out


# ------------------------------------------------------------------ tests
def test_fps_matches_oracle(rng):
    xyz = rng.randn(2, 200, 3).astype(np.float32)
    got = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 32, impl="xla"))
    want = fps_oracle(xyz, 32)
    np.testing.assert_array_equal(got, want)


def test_fps_skip_near_origin(rng):
    xyz = rng.randn(1, 64, 3).astype(np.float32)
    xyz[0, 10:20] = 0.0  # near-origin points must never be selected
    got = np.asarray(
        ops.furthest_point_sample(jnp.asarray(xyz), 16, impl="xla")
    )
    assert not np.any((got >= 10) & (got < 20))
    want = fps_oracle(xyz, 16)
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_interpret(rng):
    """Pallas kernel vs oracle under the interpreter (no TPU needed)."""
    import sys

    fps_mod = sys.modules["rfdnet_tpu.ops.fps"]
    xyz = rng.randn(2, 150, 3).astype(np.float32)
    got = fps_mod._fps_pallas(jnp.asarray(xyz), 24, True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), fps_oracle(xyz, 24))


def test_fps_under_grad_with_param_dependent_xyz(rng):
    """vote_fps feeds PREDICTED vote coordinates to FPS, so under
    jax.grad the sampled xyz carries a tangent. FPS indices are
    non-differentiable (the reference's FurthestPointSampling has no
    backward, `pointnet2_utils.py:34-56`) — furthest_point_sample must
    cut the tangent before the Pallas kernel, whose pallas_call has no
    jvp rule (interpret mode exercises the identical trace path the TPU
    hits). Regression for the vote_fps train-step crash."""
    import sys

    import jax

    fps_mod = sys.modules["rfdnet_tpu.ops.fps"]
    xyz = jnp.asarray(rng.randn(1, 96, 3).astype(np.float32))

    def loss(offset, impl):
        votes = xyz + offset  # param-dependent coordinates
        old = fps_mod._fps_pallas
        if impl == "pallas":
            fps_mod._fps_pallas = lambda x, n, s: old(x, n, s, interpret=True)
        try:
            inds = ops.furthest_point_sample(votes, 16, impl=impl)
        finally:
            fps_mod._fps_pallas = old
        gathered = jnp.take_along_axis(votes, inds[..., None], axis=1)
        return jnp.sum(gathered**2)

    g_pallas = jax.grad(lambda o: loss(o, "pallas"))(jnp.ones((1, 1, 3)))
    g_xla = jax.grad(lambda o: loss(o, "xla"))(jnp.ones((1, 1, 3)))
    # grads flow through the gather (values), not the indices
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-6
    )
    assert np.any(np.asarray(g_xla) != 0.0)


def test_ball_query_matches_oracle(rng):
    xyz = rng.randn(2, 128, 3).astype(np.float32)
    centers = xyz[:, :16] + 0.05 * rng.randn(2, 16, 3).astype(np.float32)
    got = np.asarray(ops.ball_query(jnp.asarray(xyz), jnp.asarray(centers), 0.4, 8))
    want = ball_query_oracle(xyz, centers, 0.4, 8)
    np.testing.assert_array_equal(got, want)


def test_ball_query_no_hit_is_zero(rng):
    xyz = rng.randn(1, 32, 3).astype(np.float32)
    centers = np.full((1, 2, 3), 100.0, dtype=np.float32)
    got = np.asarray(ops.ball_query(jnp.asarray(xyz), jnp.asarray(centers), 0.1, 4))
    np.testing.assert_array_equal(got, 0)


def test_ball_query_chunked_path(rng):
    """Force the lax.map chunk path and compare against the one-shot path."""
    import sys

    bq = sys.modules["rfdnet_tpu.ops.ball_query"]

    xyz = rng.randn(2, 300, 3).astype(np.float32)
    centers = xyz[:, :40]
    full = np.asarray(ops.ball_query(jnp.asarray(xyz), jnp.asarray(centers), 0.5, 6))
    old = bq._MAX_CHUNK_ELEMS
    try:
        bq._MAX_CHUNK_ELEMS = 4096  # tiny budget -> chunked everywhere
        chunked = np.asarray(
            ops.ball_query(jnp.asarray(xyz), jnp.asarray(centers), 0.5, 6)
        )
    finally:
        bq._MAX_CHUNK_ELEMS = old
    np.testing.assert_array_equal(full, chunked)


def test_gather_group_points(rng):
    feats = rng.randn(2, 50, 7).astype(np.float32)
    idx = rng.randint(0, 50, size=(2, 10)).astype(np.int32)
    got = np.asarray(ops.gather_points(jnp.asarray(feats), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_allclose(got[b], feats[b, idx[b]])

    gidx = rng.randint(0, 50, size=(2, 10, 4)).astype(np.int32)
    got = np.asarray(ops.group_points(jnp.asarray(feats), jnp.asarray(gidx)))
    for b in range(2):
        np.testing.assert_allclose(got[b], feats[b][gidx[b]])


def test_group_points_grad_is_scatter_add(rng):
    feats = rng.randn(1, 20, 4).astype(np.float32)
    idx = np.array([[[0, 0, 5], [5, 2, 2]]], dtype=np.int32)

    def f(x):
        return jnp.sum(ops.group_points(x, jnp.asarray(idx)))

    g = np.asarray(jax.grad(f)(jnp.asarray(feats)))[0]
    want = np.zeros((20, 4), np.float32)
    for row in idx[0]:
        for k in row:
            want[k] += 1.0
    np.testing.assert_allclose(g, want)


def test_three_nn_and_interpolate(rng):
    unknown = rng.randn(2, 30, 3).astype(np.float32)
    known = rng.randn(2, 12, 3).astype(np.float32)
    dist, idx = ops.three_nn(jnp.asarray(unknown), jnp.asarray(known))
    dist, idx = np.asarray(dist), np.asarray(idx)
    for b in range(2):
        d2 = np.sum((unknown[b][:, None] - known[b][None]) ** 2, axis=-1)
        order = np.argsort(d2, axis=1)[:, :3]
        np.testing.assert_array_equal(np.sort(idx[b], axis=1), np.sort(order, axis=1))
        np.testing.assert_allclose(
            np.sort(dist[b], axis=1) ** 2,
            np.sort(d2[np.arange(30)[:, None], order], axis=1),
            rtol=1e-4, atol=1e-5,
        )

    feats = rng.randn(2, 12, 6).astype(np.float32)
    out = ops.interpolate_features(
        jnp.asarray(unknown), jnp.asarray(known), jnp.asarray(feats)
    )
    assert out.shape == (2, 30, 6)
    # oracle for one row
    b, i = 0, 0
    d = dist[b, i]
    w = (1.0 / (d + 1e-8))
    w = w / w.sum()
    want = (feats[b][idx[b, i]] * w[:, None]).sum(0)
    np.testing.assert_allclose(np.asarray(out)[b, i], want, rtol=1e-4, atol=1e-5)


def test_nn_distance_matches_reference_demo():
    """Replays `net_utils/nn_distance.py:63-94` demo_nn_distance."""
    np.random.seed(0)
    pc1 = np.random.random((1, 5, 3)).astype(np.float32)
    pc2 = np.random.random((1, 6, 3)).astype(np.float32)
    dist1, idx1, dist2, idx2 = ops.nn_distance(jnp.asarray(pc1), jnp.asarray(pc2))
    dist = np.zeros((5, 6))
    for i in range(5):
        for j in range(6):
            dist[i, j] = np.sum((pc1[0, i] - pc2[0, j]) ** 2)
    np.testing.assert_allclose(np.asarray(dist1)[0], dist.min(1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx1)[0], dist.argmin(1))
    np.testing.assert_allclose(np.asarray(dist2)[0], dist.min(0), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx2)[0], dist.argmin(0))
    # huber variant
    d1h, _, _, _ = ops.nn_distance(jnp.asarray(pc1), jnp.asarray(pc2), l1smooth=True)
    disth = np.zeros((5, 6))
    for i in range(5):
        for j in range(6):
            err = np.abs(pc1[0, i] - pc2[0, j])
            quad = np.minimum(err, 1.0)
            disth[i, j] = np.sum(0.5 * quad**2 + (err - quad))
    np.testing.assert_allclose(np.asarray(d1h)[0], disth.min(1), rtol=1e-5)


def test_chamfer_matches_dense(rng):
    a = rng.randn(2, 100, 3).astype(np.float32)
    b = rng.randn(2, 37, 3).astype(np.float32)
    d1, d2 = ops.chamfer_distance(jnp.asarray(a), jnp.asarray(b))
    for i in range(2):
        full = np.sum((a[i][:, None] - b[i][None]) ** 2, axis=-1)
        np.testing.assert_allclose(np.asarray(d1)[i], full.min(1), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(d2)[i], full.min(0), rtol=1e-4, atol=1e-5)


def test_chamfer_blocked_large(rng):
    """Exercise the multi-chunk path (M > chunk size)."""
    a = rng.randn(1, 64, 3).astype(np.float32)
    b = rng.randn(1, 5000, 3).astype(np.float32)
    d1, d2 = ops.chamfer_distance(jnp.asarray(a), jnp.asarray(b))
    full = np.sum((a[0][:, None] - b[0][None]) ** 2, axis=-1)
    np.testing.assert_allclose(np.asarray(d1)[0], full.min(1), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2)[0], full.min(0), rtol=1e-3, atol=1e-4)


def test_chamfer_gradient(rng):
    a = rng.randn(1, 10, 3).astype(np.float32)
    b = rng.randn(1, 8, 3).astype(np.float32)

    def loss(av):
        d1, d2 = ops.chamfer_distance(av, jnp.asarray(b))
        return jnp.mean(d1) + jnp.mean(d2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(a)))
    # numerical check on a couple of coords
    eps = 1e-3
    for (i, c) in [(0, 0), (3, 2)]:
        ap = a.copy(); ap[0, i, c] += eps
        am = a.copy(); am[0, i, c] -= eps
        num = (loss(jnp.asarray(ap)) - loss(jnp.asarray(am))) / (2 * eps)
        np.testing.assert_allclose(g[0, i, c], num, rtol=1e-2, atol=1e-3)


def nms_oracle(boxes8, thresh):
    """Port of nms_3d_faster_samecls greedy loop (numpy, from nms.py:79-118)."""
    x1, y1, z1, x2, y2, z2, score, cls = boxes8.T
    area = (x2 - x1) * (y2 - y1) * (z2 - z1)
    I = np.argsort(score)
    pick = []
    while I.size != 0:
        last = I.size
        i = I[-1]
        pick.append(i)
        xx1 = np.maximum(x1[i], x1[I[: last - 1]])
        yy1 = np.maximum(y1[i], y1[I[: last - 1]])
        zz1 = np.maximum(z1[i], z1[I[: last - 1]])
        xx2 = np.minimum(x2[i], x2[I[: last - 1]])
        yy2 = np.minimum(y2[i], y2[I[: last - 1]])
        zz2 = np.minimum(z2[i], z2[I[: last - 1]])
        l = np.maximum(0, xx2 - xx1)
        w = np.maximum(0, yy2 - yy1)
        h = np.maximum(0, zz2 - zz1)
        inter = l * w * h
        o = inter / (area[i] + area[I[: last - 1]] - inter)
        o = o * (cls[i] == cls[I[: last - 1]])
        I = np.delete(I, np.concatenate(([last - 1], np.where(o > thresh)[0])))
    return sorted(pick)


def test_nms_matches_oracle(rng):
    K = 40
    centers = rng.rand(K, 3) * 4
    sizes = 0.5 + rng.rand(K, 3)
    mins = centers - sizes / 2
    maxs = centers + sizes / 2
    score = rng.rand(K).astype(np.float32)
    cls = rng.randint(0, 3, size=(K,))
    aabb = np.concatenate([mins, maxs], axis=-1).astype(np.float32)
    keep = np.asarray(
        ops.nms_3d(
            jnp.asarray(aabb[None]),
            jnp.asarray(score[None]),
            jnp.asarray(cls[None]),
            0.25,
        )
    )[0]
    boxes8 = np.concatenate([aabb, score[:, None], cls[:, None]], axis=-1)
    want = nms_oracle(boxes8, 0.25)
    assert sorted(np.where(keep)[0].tolist()) == want


def test_nms_valid_mask(rng):
    aabb = np.array([[[0, 0, 0, 1, 1, 1], [0, 0, 0, 1, 1, 1]]], np.float32)
    score = np.array([[0.9, 0.8]], np.float32)
    keep = np.asarray(
        ops.nms_3d(
            jnp.asarray(aabb), jnp.asarray(score), None, 0.25,
            valid=jnp.asarray([[False, True]]),
        )
    )[0]
    assert keep.tolist() == [False, True]


def test_box_corners_match_reference_formula(rng):
    def get_3d_box_np(box_size, heading_angle, center):
        c, s = np.cos(heading_angle), np.sin(heading_angle)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        l, w, h = box_size
        x = [l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2]
        y = [h / 2, h / 2, h / 2, h / 2, -h / 2, -h / 2, -h / 2, -h / 2]
        z = [w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2]
        return (R @ np.vstack([x, y, z])).T + center

    sizes = rng.rand(4, 3) + 0.5
    angles = rng.randn(4)
    centers = rng.randn(4, 3)
    got = np.asarray(
        ops.get_3d_box_batch(
            jnp.asarray(sizes, dtype=jnp.float32),
            jnp.asarray(angles, dtype=jnp.float32),
            jnp.asarray(centers, dtype=jnp.float32),
        )
    )
    for i in range(4):
        np.testing.assert_allclose(
            got[i], get_3d_box_np(sizes[i], angles[i], centers[i]), rtol=1e-4, atol=1e-5
        )


def test_axis_flips_roundtrip(rng):
    pc = jnp.asarray(rng.randn(5, 3).astype(np.float32))
    back = ops.flip_axis_to_depth(ops.flip_axis_to_camera(pc))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pc), rtol=1e-6)
