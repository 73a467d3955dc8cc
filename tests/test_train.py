"""Training-runtime tests: jitted train step over the virtual mesh,
parameter freezing, per-submodule optimizer specs, plateau scheduler,
checkpoint save/restore with partial (finetune) loading."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rfdnet_tpu.config.scannet import ScannetConfig
from rfdnet_tpu.data.synthetic import synthetic_scene_batch
from rfdnet_tpu.models import ISCNet
from rfdnet_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from rfdnet_tpu.train.trainer import (
    PlateauScheduler,
    init_state,
    make_optimizer,
    make_optimizer_with_specs,
    make_train_step,
)

N_POINTS = 2048


@pytest.fixture(scope="module")
def setup():
    dc = ScannetConfig()
    model = ISCNet(
        mean_size_arr=dc.mean_size_arr, phase="detection",
    )
    batch = synthetic_scene_batch(
        np.random.RandomState(0), batch_size=2, num_points=N_POINTS,
        mean_size_arr=dc.mean_size_arr,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    tx = make_optimizer()
    state = init_state(model, tx, batch)
    return dc, model, batch, tx, state


def test_train_step_decreases_loss_and_respects_freeze(setup):
    dc, model, batch, tx, state = setup
    step = make_train_step(
        model, dc, tx, frozen=("voting",), donate=False
    )
    v0 = jax.tree_util.tree_map(lambda x: np.asarray(x), state.params["voting"])
    b0 = np.asarray(
        jax.tree_util.tree_leaves(state.params["backbone"])[0]
    )
    s1, losses1 = step(state, batch, jax.random.PRNGKey(0),
                       jnp.float32(1e-3), jnp.float32(0.5))
    # frozen module unchanged; trainable module moved
    for a, b in zip(jax.tree_util.tree_leaves(v0),
                    jax.tree_util.tree_leaves(s1.params["voting"])):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert not np.allclose(
        b0, np.asarray(jax.tree_util.tree_leaves(s1.params["backbone"])[0])
    )
    # a few more steps reduce loss on the same batch
    s = s1
    for i in range(3):
        s, losses = step(s, batch, jax.random.PRNGKey(0),
                         jnp.float32(1e-3), jnp.float32(0.5))
    assert float(losses["total"]) < float(losses1["total"])


def test_per_module_optimizer_spec(setup):
    dc, model, batch, _, _ = setup
    model_cfg = {
        "backbone": {"method": "Pointnet2Backbone",
                     "optimizer": {"lr": 1e-5}},
        "voting": {"method": "VotingModule"},
    }
    base = {"lr": 1e-3, "betas": [0.9, 0.999], "eps": 1e-8,
            "weight_decay": 0}
    tx, scale_tree = make_optimizer_with_specs(base, model_cfg)
    assert scale_tree is not None
    state = init_state(model, tx, batch)
    scales = scale_tree(state.params)
    assert jax.tree_util.tree_leaves(scales["backbone"])[0] == pytest.approx(
        1e-2
    )
    assert jax.tree_util.tree_leaves(scales["voting"])[0] == 1.0
    step = make_train_step(
        model, dc, tx, lr_scale_tree=scale_tree, donate=False
    )
    s1, _ = step(state, batch, jax.random.PRNGKey(0),
                 jnp.float32(1e-3), jnp.float32(0.5))
    # backbone moved ~100x less than voting (relative)
    def delta(a, b):
        return max(
            float(jnp.max(jnp.abs(x - y)))
            for x, y in zip(jax.tree_util.tree_leaves(a),
                            jax.tree_util.tree_leaves(b))
        )
    assert delta(state.params["backbone"], s1.params["backbone"]) < 0.2 * \
        delta(state.params["voting"], s1.params["voting"])


def test_sharded_step_runs_on_mesh(setup):
    dc, model, batch, tx, state = setup
    mesh = make_mesh(jax.devices()[:2])
    step = make_train_step(model, dc, tx, donate=False)
    state = jax.device_put(state, replicated(mesh))
    sbatch = shard_batch(batch, mesh)
    s1, losses = step(state, sbatch, jax.random.PRNGKey(0),
                      jnp.float32(1e-3), jnp.float32(0.5))
    assert np.isfinite(float(losses["total"]))


class _ToyNet:
    """Minimal discrete-op-free model exposing the ISCNet trainer
    interface (`__call__(batch, train, bn_momentum, rng)` + `loss`) so
    the SAME make_train_step / mesh / sync-BN machinery can be verified
    exactly (no FPS/ball-query/argmin selections to amplify 1-ULP
    codegen differences between sharded and unsharded layouts)."""

    def __new__(cls):
        import flax.linen as nn

        from rfdnet_tpu.models.common import BatchNorm

        class Net(nn.Module):
            @nn.compact
            def __call__(self, batch, train, bn_momentum=None, rng=None):
                # bias-free Dense before BN, like the model's SharedMLP
                # pairs — a pre-BN bias has an exactly-zero gradient whose
                # f32 rounding noise is layout-dependent
                h = nn.Dense(32, use_bias=False)(batch["x"])
                h = BatchNorm(name="bn")(h, train, bn_momentum)
                return nn.Dense(1)(nn.relu(h))

            def loss(self, out, batch, dataset_config, completion_weight):
                return {"total": jnp.mean((out - batch["y"]) ** 2)}

        return Net()


def test_dp_plumbing_exact_on_smooth_model():
    """DP correctness of the training machinery itself: for a model with
    no data-dependent discrete selections, the 8-way batch-sharded
    make_train_step produces the SAME loss, gradients (observed exactly
    as parameter deltas through an identity-transform optimizer with
    lr=1), and sync-BN batch statistics as the unsharded step — the
    gradient all-reduce and global-batch BN reduction inserted by the
    partitioner are semantics-preserving, not just finite."""
    import optax

    model = _ToyNet()
    rng = np.random.RandomState(0)
    batch = {
        "x": jnp.asarray(rng.randn(64, 16).astype(np.float32)),
        "y": jnp.asarray(rng.randn(64, 1).astype(np.float32)),
    }
    tx = optax.identity()  # param delta == raw gradient
    state = init_state(model, tx, batch)
    step = make_train_step(model, None, tx, donate=False)
    args = (jax.random.PRNGKey(1), jnp.float32(1.0), jnp.float32(0.5))

    s_single, l_single = step(state, batch, *args)
    mesh = make_mesh(jax.devices()[:8])
    s_shard, l_shard = step(
        jax.device_put(state, replicated(mesh)),
        shard_batch(batch, mesh),
        *args,
    )
    assert float(l_shard["total"]) == pytest.approx(
        float(l_single["total"]), rel=1e-6
    )
    for tree_s, tree_r, tol in [
        (s_shard.params, s_single.params, 1e-6),
        (s_shard.batch_stats, s_single.batch_stats, 1e-6),
    ]:
        for a, b in zip(jax.tree_util.tree_leaves(tree_r),
                        jax.tree_util.tree_leaves(tree_s)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=tol, rtol=1e-5
            )


def test_dp_step_matches_single_device():
    """DP agreement on the REAL model at training-observable level: the
    8-way sharded train step reproduces the unsharded step's loss and
    sync-BN batch statistics.

    Why not bitwise parameters: under GSPMD per-device operand shapes
    differ ((1, N, ...) blocks vs the (8, N, ...) whole), so backend
    codegen rounds the big MLP contractions ~1 ULP apart; the model's
    discrete selections (vote-FPS argmax, ball-query radius test,
    proposal<->GT argmin) can amplify one flipped ULP into a different
    — equally valid — selection for a scene, perturbing that scene's
    gradient macroscopically. The torch reference has the same property
    across DataParallel replica counts. The semantics-level checks live
    in test_dp_plumbing_exact_on_smooth_model; here we pin the
    training-level agreement: loss to 0.1% and the (smooth, selection-
    free in expectation) BN statistics."""
    dc = ScannetConfig()
    model = ISCNet(mean_size_arr=dc.mean_size_arr, phase="detection")
    batch = synthetic_scene_batch(
        np.random.RandomState(3), batch_size=8, num_points=1024,
        mean_size_arr=dc.mean_size_arr,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    tx = make_optimizer()
    state = init_state(model, tx, batch)
    step = make_train_step(model, dc, tx, donate=False)
    args = (jax.random.PRNGKey(7), jnp.float32(1e-3), jnp.float32(0.5))

    s_single, l_single = step(state, batch, *args)
    mesh = make_mesh(jax.devices()[:8])
    s_shard, l_shard = step(
        jax.device_put(state, replicated(mesh)),
        shard_batch(batch, mesh),
        *args,
    )
    assert float(l_shard["total"]) == pytest.approx(
        float(l_single["total"]), rel=1e-3
    )
    for a, b in zip(jax.tree_util.tree_leaves(s_single.batch_stats),
                    jax.tree_util.tree_leaves(s_shard.batch_stats)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-2
        )


def test_dp_pinned_selection_bn_stats():
    """Tight selection-DOWNSTREAM DP agreement (VERDICT r2 item 7): with
    the proposal selection pinned (`pinned_proposal_ids` hook), skip
    propagation and the ONet see identical proposals in both layouts, so
    its BN batch statistics must agree tightly — replacing the loose
    `< 1.0` bound the round-2 dryrun used as the load-bearing check for
    selection-downstream modules. Match: DataParallel's
    replicate-scatter-gather semantics, `net_utils/utils.py:238`."""
    dc = ScannetConfig()
    limit = 4
    model = ISCNet(
        mean_size_arr=dc.mean_size_arr, phase="completion",
        completion_limit=limit,
    )
    batch = synthetic_scene_batch(
        np.random.RandomState(5), batch_size=8, num_points=1024,
        num_obj_points=64, mean_size_arr=dc.mean_size_arr,
    )
    # deterministic selection computed on the host from GT only:
    # proposals 0..limit-1, their nearest valid GT box, its class
    B = 8
    pin = np.zeros((B, limit, 3), np.int32)
    pin[:, :, 0] = np.arange(limit)
    for b in range(B):
        valid = batch["box_label_mask"][b] > 0
        gt_ids = np.flatnonzero(valid)[:limit]
        gt_ids = np.resize(gt_ids, limit)
        pin[b, :, 1] = gt_ids
        pin[b, :, 2] = batch["sem_cls_label"][b][gt_ids]
    batch["pinned_proposal_ids"] = pin
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    tx = make_optimizer()
    state = init_state(model, tx, batch)
    step = make_train_step(model, dc, tx, donate=False)
    args = (jax.random.PRNGKey(11), jnp.float32(1e-3), jnp.float32(0.5))

    s_single, l_single = step(state, batch, *args)
    mesh = make_mesh(jax.devices()[:8])
    s_shard, l_shard = step(
        jax.device_put(state, replicated(mesh)),
        shard_batch(batch, mesh),
        *args,
    )
    assert float(l_shard["total"]) == pytest.approx(
        float(l_single["total"]), rel=1e-3
    )
    # tight agreement through EVERY module, including skip_propagation
    # and the decoder CBNs (selection-downstream). atol 5e-3: the pinned
    # ids remove the proposal-selection flip, but the ball query around
    # the (~1-ULP-different) predicted centers is itself discrete —
    # boundary points flip group membership between layouts, shifting
    # the 8x4x1024-point batch means by O(1e-3) (measured 2.9e-3 max).
    # A real sync-BN bug (per-shard stats) shifts means by O(0.1-1).
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(s_single.batch_stats),
        jax.tree_util.tree_leaves(s_shard.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-2,
            err_msg=jax.tree_util.keystr(path),
        )


def test_plateau_scheduler():
    s = PlateauScheduler(lr=1.0, patience=2, factor=0.1, threshold=0.01)
    assert s.step(10.0) == 1.0  # first metric becomes best
    s.step(10.0)
    s.step(10.0)
    lr = s.step(10.0)  # patience exceeded
    assert lr == pytest.approx(0.1)
    assert s.step(5.0) == pytest.approx(0.1)  # improvement resets


def test_checkpoint_roundtrip_and_partial_load(tmp_path, setup):
    from rfdnet_tpu.train.checkpoint import CheckpointIO, partial_load

    dc, model, batch, tx, state = setup
    ckpt = CheckpointIO(str(tmp_path / "run1"), log=lambda m: None)
    ckpt.save_last(state, {"epoch": 3, "min_loss": 1.5})
    restored, meta = ckpt.load(str(tmp_path / "run1" / "model_last"))
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
        jax.tree_util.tree_leaves(restored["params"])[0],
    )
    # partial load: target with an extra module keeps its own weights
    target = dict(state.params)
    target["extra"] = {"w": np.zeros((3,))}
    merged = partial_load(target, restored["params"], log=None)
    np.testing.assert_array_equal(merged["extra"]["w"], np.zeros((3,)))

    # resume scans sibling run dirs
    ckpt2 = CheckpointIO(str(tmp_path / "run2"), log=lambda m: None)
    st, meta2 = ckpt2.resume(state)
    assert meta2["epoch"] == 3


def test_checkpoint_copy_best_to_last(tmp_path, setup):
    """`CheckpointIO.copy`: the save-cadence path writes model_best on
    improvement and refreshes model_last by a LOCAL dir copy (one
    device->host download per save event — the download dominates
    checkpoint cost on a tunneled device). The copy must be loadable,
    leaf-identical, and must atomically replace a stale model_last."""
    from rfdnet_tpu.train.checkpoint import CheckpointIO

    dc, model, batch, tx, state = setup
    ckpt = CheckpointIO(str(tmp_path / "run1"), log=lambda m: None)
    # a stale model_last exists from an earlier epoch
    ckpt.save_last(state, {"epoch": 1, "min_loss": 9.0})
    ckpt.save_best(state, {"epoch": 5, "min_loss": 1.25})
    ckpt.copy("model_best", "model_last")
    restored, meta = ckpt.load(str(tmp_path / "run1" / "model_last"))
    assert meta == {"epoch": 5, "min_loss": 1.25}
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resume still finds it (the cadence path's contract with resume)
    st, meta2 = ckpt.resume(state)
    assert meta2["epoch"] == 5


def test_visualize_step_host_batch(tmp_path):
    """Trainer.visualize_step end-to-end on the virtual mesh with a HOST
    numpy batch: the vis jit declares the same in_shardings as the
    train/eval steps (the one leak-free host->device route on this
    runtime, `parallel/mesh.py`), and the snapshot PNGs land in
    cfg.save_path/vis_path."""
    import os

    from rfdnet_tpu.config.config import Config
    from rfdnet_tpu.train.loop import Trainer

    cfg = Config(
        {
            "data": {"num_point": N_POINTS},
            "train": {"phase": "completion", "batch_size": 2, "epochs": 1},
            "log": {"path": str(tmp_path), "vis_step": 1},
        },
        mode="train",
    )
    model = cfg.build_model(generate_limit=4)
    dc = cfg.dataset_config
    batch = synthetic_scene_batch(
        np.random.RandomState(1), batch_size=2, num_points=N_POINTS,
        mean_size_arr=dc.mean_size_arr,
    )  # host numpy, straight in — no explicit device_put
    tr = Trainer(cfg, model, dc, log=lambda m: None)
    tr.initialize(batch)
    tr.visualize_step(batch, epoch=0, phase="completion", it=0)
    vis_dir = os.path.join(cfg.save_path, cfg.config["log"]["vis_path"])
    pngs = os.listdir(vis_dir)
    assert any(p.endswith("_pred.png") for p in pngs)
    assert any("_gt_cls" in p for p in pngs)
