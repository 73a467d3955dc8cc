"""Model-layer tests: shape/dtype contract of SURVEY.md §3.4, loss
computation, and a gradient step, on synthetic ScanNet-format scenes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rfdnet_tpu.config.scannet import ScannetConfig
from rfdnet_tpu.data.synthetic import synthetic_scene_batch
from rfdnet_tpu.models import ISCNet

N_POINTS = 4096


@pytest.fixture(scope="module")
def dataset_config():
    return ScannetConfig()


@pytest.fixture(scope="module")
def batch(dataset_config):
    rng = np.random.RandomState(0)
    data = synthetic_scene_batch(
        rng, batch_size=2, num_points=N_POINTS,
        mean_size_arr=dataset_config.mean_size_arr,
    )
    return jax.tree_util.tree_map(jnp.asarray, data)


def make_model(dataset_config, phase):
    return ISCNet(
        mean_size_arr=dataset_config.mean_size_arr,
        phase=phase,
        completion_limit=4,
        generate_limit=8,
    )


@pytest.fixture(scope="module")
def detection_model_vars(dataset_config, batch):
    model = make_model(dataset_config, "detection")
    variables = model.init(
        jax.random.PRNGKey(0), batch, train=False, rng=jax.random.PRNGKey(1)
    )
    return model, variables


def test_detection_forward_shapes(detection_model_vars, batch):
    model, variables = detection_model_vars
    (end_points, losses, shape_ex, pids), _ = model.apply(
        variables, batch, train=True, rng=jax.random.PRNGKey(2),
        mutable=["batch_stats"],
    )
    B = 2
    # SURVEY §3.4 contract
    assert end_points["seed_xyz"].shape == (B, 1024, 3)
    assert end_points["seed_features"].shape == (B, 1024, 256)
    assert end_points["vote_xyz"].shape == (B, 1024, 3)
    assert end_points["aggregated_vote_xyz"].shape == (B, 256, 3)
    assert end_points["objectness_scores"].shape == (B, 256, 2)
    assert end_points["center"].shape == (B, 256, 3)
    assert end_points["heading_scores"].shape == (B, 256, 12)
    assert end_points["heading_residuals_normalized"].shape == (B, 256, 12)
    assert end_points["size_scores"].shape == (B, 256, 8)
    assert end_points["size_residuals_normalized"].shape == (B, 256, 8, 3)
    assert end_points["sem_cls_scores"].shape == (B, 256, 8)
    # vote features are L2-normalised (`network.py:322-324`)
    norms = jnp.linalg.norm(end_points["vote_features"], axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, rtol=1e-4)


def test_detection_loss_finite(detection_model_vars, batch, dataset_config):
    model, variables = detection_model_vars
    out, _ = model.apply(
        variables, batch, train=True, rng=jax.random.PRNGKey(2),
        mutable=["batch_stats"],
    )
    losses = model.apply(
        variables, out, batch, dataset_config, method=ISCNet.loss
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert float(losses["total"]) > 0


def test_detection_grad_step(detection_model_vars, batch, dataset_config):
    model, variables = detection_model_vars
    params = variables["params"]
    batch_stats = variables["batch_stats"]

    def loss_fn(p):
        out, updates = model.apply(
            {"params": p, "batch_stats": batch_stats},
            batch, train=True, rng=jax.random.PRNGKey(2),
            mutable=["batch_stats"],
        )
        losses = model.apply(
            {"params": p, "batch_stats": batch_stats},
            out, batch, dataset_config, method=ISCNet.loss,
        )
        return losses["total"]

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    total_norm = sum(float(jnp.sum(l**2)) for l in leaves) ** 0.5
    assert total_norm > 0


@pytest.fixture(scope="module")
def completion_model_vars(dataset_config, batch):
    model = make_model(dataset_config, "completion")
    variables = model.init(
        jax.random.PRNGKey(0), batch, train=False, rng=jax.random.PRNGKey(1)
    )
    return model, variables


def test_completion_forward_and_loss(completion_model_vars, batch, dataset_config):
    model, variables = completion_model_vars
    out, _ = model.apply(
        variables, batch, train=True, rng=jax.random.PRNGKey(2),
        mutable=["batch_stats"],
    )
    end_points, losses, shape_ex, pids = out
    assert pids.shape == (2, 4, 3)
    assert losses.shape == (2,)
    assert np.isfinite(float(losses[0]))  # completion loss
    assert np.isfinite(float(losses[1]))  # mask loss
    total = model.apply(
        variables, out, batch, dataset_config, method=ISCNet.loss,
    )
    assert np.isfinite(float(total["total"]))
    assert "completion_loss" in total and "mask_loss" in total


def test_generate_path(completion_model_vars, batch):
    model, variables = completion_model_vars
    end_points, prop_feats, parsed = model.apply(
        variables, batch["point_clouds"], method=ISCNet.generate_detections,
        mutable=False,
    )
    assert parsed["pred_corners_3d_upright_camera"].shape == (2, 256, 8, 3)
    assert parsed["pred_mask"].shape == (2, 256)
    assert parsed["pred_mask"].dtype == bool
    gen = model.apply(
        variables, end_points, prop_feats, parsed, batch,
        method=ISCNet.generate_completion, mutable=False,
    )
    assert gen["proposal_ids"].shape == (2, 8, 3)
    assert gen["features"].shape == (16, 512)
    # occupancy decode over a dense grid
    pts = jnp.zeros((16, 27, 3))
    logits = model.apply(
        variables, gen["features"], gen["cls_codes"], pts,
        method=ISCNet.decode_occupancy, mutable=False,
    )
    assert logits.shape == (16, 27)


def test_generate_fused_grid_decode(completion_model_vars, batch):
    """`generate(decode_grid_res=R)` — the single-dispatch test-protocol
    path — must produce the same occupancy grids as a separate
    decode_occupancy call over the same dense grid."""
    from rfdnet_tpu.models import make_3d_grid

    model, variables = completion_model_vars
    out = model.apply(
        variables, batch, method=ISCNet.generate, mutable=False,
        decode_grid_res=8,
    )
    assert out["grids"].shape == (16, 8, 8, 8)

    pts = 1.1 * make_3d_grid((-0.5,) * 3, (0.5,) * 3, (8,) * 3)
    pts_b = jnp.broadcast_to(pts[None], (16, pts.shape[0], 3))
    ref = model.apply(
        variables, out["gen"]["features"], out["gen"]["cls_codes"], pts_b,
        method=ISCNet.decode_occupancy, mutable=False,
    )
    np.testing.assert_allclose(
        np.asarray(out["grids"]).reshape(16, -1), np.asarray(ref),
        rtol=1e-6, atol=1e-6,
    )


def test_select_completion_proposals_matches_reference_order():
    """Oracle replay of get_proposal_id 'objectness' mode
    (`network.py:417-428`): unique-GT-first (np.unique order), then
    remaining objectness-sorted."""
    from rfdnet_tpu.models import select_completion_proposals

    rng = np.random.RandomState(3)
    K, M, limit = 32, 8, 6
    probs = rng.rand(1, K).astype(np.float32)
    center = rng.randn(1, K, 3).astype(np.float32)
    gt_center = rng.randn(1, M, 3).astype(np.float32)
    mask = np.ones((1, M), np.float32)
    mask[0, 5:] = 0
    sem = rng.randint(0, 8, (1, M)).astype(np.int32)

    got = np.asarray(
        select_completion_proposals(
            jnp.asarray(probs), jnp.asarray(center), jnp.asarray(gt_center),
            jnp.asarray(mask), jnp.asarray(sem), limit,
        )
    )[0]

    # numpy oracle
    d = np.sum((center[0][:, None] - gt_center[0][None]) ** 2, -1)
    d[:, mask[0] == 0] = np.inf
    assign = d.argmin(-1)
    order = np.argsort(-probs[0])
    sorted_gt = assign[order]
    uniq_first = np.unique(sorted_gt, return_index=True)[1]
    rest = np.setdiff1d(np.arange(K), uniq_first, assume_unique=True)
    gt_ids = np.hstack([uniq_first, rest])[:limit]
    sample_ids = order[gt_ids]
    np.testing.assert_array_equal(got[:, 0], sample_ids)
    np.testing.assert_array_equal(got[:, 1], assign[sample_ids])
    np.testing.assert_array_equal(got[:, 2], sem[0][assign[sample_ids]])
