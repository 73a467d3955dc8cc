"""End-to-end learning sanity: train detection on synthetic scenes until
the detector finds the boxes, then score mAP through the full eval stack.

This is the framework's "does the whole loop actually learn" check (the
reference's equivalent evidence is a full ScanNet run): synthetic scenes
from `rfdnet_tpu.data.synthetic` -> jitted train steps -> Tester ->
VOC mAP. With 600 steps on a v5e chip the detector should reach
mAP@0.25 >~ 0.5 on held-out synthetic scenes.

Usage: python tools/sanity_train.py [--steps 600] [--scenes 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--scenes", type=int, default=32)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--points", type=int, default=20000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--phase", type=str, default="detection",
                   choices=["detection", "completion"])
    p.add_argument("--save-to", type=str, default=None,
                   help="save final weights (orbax dir)")
    p.add_argument("--finetune-from", type=str, default=None,
                   help="partial-load weights from a saved dir")
    p.add_argument("--freeze", type=str, default="",
                   help="comma-separated submodules to freeze")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rfdnet_tpu.config.config import Config
    from rfdnet_tpu.data.synthetic import synthetic_scene_batch
    from rfdnet_tpu.eval.tester import Tester
    from rfdnet_tpu.train.trainer import (
        init_state,
        make_optimizer,
        make_train_step,
    )

    cfg = Config(
        {
            "data": {"num_point": args.points},
            "test": {"phase": args.phase, "batch_size": 1,
                     "ap_iou_thresholds": [0.25]},
            "generation": {"generate_mesh": False},
            "log": {"path": "/tmp/sanity_train"},
        },
        mode="test", make_dirs=False,
    )
    dc = cfg.dataset_config
    model = cfg.build_model(generate_limit=8)
    # detection-phase model for training
    from rfdnet_tpu.models import ISCNet

    train_model = ISCNet(
        mean_size_arr=dc.mean_size_arr, phase=args.phase,
        completion_limit=4, generate_limit=8,
    )

    rng = np.random.RandomState(0)
    scenes = [
        synthetic_scene_batch(rng, batch_size=1, num_points=args.points,
                              num_objects=4, mean_size_arr=dc.mean_size_arr)
        for _ in range(args.scenes + 4)
    ]
    train_scenes, val_scenes = scenes[: args.scenes], scenes[args.scenes:]

    def stack(items):
        return {
            k: np.concatenate([it[k] for it in items]) for k in items[0]
        }

    tx = make_optimizer()
    sample = jax.tree_util.tree_map(
        jnp.asarray, stack(train_scenes[: args.batch])
    )
    state = init_state(train_model, tx, sample)
    frozen = tuple(s for s in args.freeze.split(",") if s)
    if args.finetune_from:
        from rfdnet_tpu.train.checkpoint import CheckpointIO

        ckpt = CheckpointIO(os.path.dirname(args.finetune_from) or ".",
                            log=print)
        state = ckpt.finetune(state, args.finetune_from)
        state = jax.tree_util.tree_map(jnp.asarray, state)
    step = make_train_step(train_model, dc, tx, frozen=frozen, donate=True)
    key = jax.random.PRNGKey(0)
    lr = jnp.float32(args.lr)
    bnm = jnp.float32(0.5)

    t0 = time.time()
    order = np.arange(args.scenes)
    for it in range(args.steps):
        if it % (args.scenes // args.batch) == 0:
            rng.shuffle(order)
        sel = order[
            (it % (args.scenes // args.batch)) * args.batch :][: args.batch]
        batch = jax.tree_util.tree_map(
            jnp.asarray, stack([train_scenes[i] for i in sel])
        )
        state, losses = step(state, batch, jax.random.fold_in(key, it), lr, bnm)
        if it % 100 == 0:
            extra = ""
            if "completion_loss" in losses:
                extra = f" compl {float(losses['completion_loss']):.1f}"
            print(f"step {it}: total {float(losses['total']):.2f} "
                  f"obj_acc {float(losses['obj_acc']):.3f} "
                  f"box {float(losses['box_loss']):.3f}" + extra)
    print(f"trained {args.steps} steps in {time.time() - t0:.0f}s")

    if args.save_to:
        from rfdnet_tpu.train.checkpoint import CheckpointIO

        CheckpointIO(os.path.dirname(args.save_to) or ".", log=print).save(
            os.path.basename(args.save_to), state, {"steps": args.steps}
        )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    tester = Tester(cfg, train_model, variables, dc, log=print)

    class _Loader:
        batch_size = 1

        def __iter__(self):
            for s in val_scenes:
                yield s

    metrics = tester.run(_Loader(), ap_iou_thresholds=[0.25])
    for k, v in metrics.items():
        if "mAP" in k or "AR" in k or "voxel IoU" in k:
            print(f"{k}: {v:.4f}")
    return metrics


if __name__ == "__main__":
    main()
