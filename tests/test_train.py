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
