"""Produce checked-in demo artifacts from a trained-from-scratch model:
train the two-stage pipeline on synthetic scenes (as sanity_train), then
run the full demo path (scan .off in -> boxes + instance meshes +
pred.png out) on a held-out scene.

Outputs land in demo/outputs/synthetic_room/ — our equivalent of the
reference's checked-in scene0549_00 artifacts.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(steps_det: int = 600, steps_comp: int = 300, points: int = 20000):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rfdnet_tpu.config.config import Config
    from rfdnet_tpu.data.synthetic import synthetic_scene_batch
    from rfdnet_tpu.demo import generate, save_visualization, visualize
    from rfdnet_tpu.meshing.mesh import write_off
    from rfdnet_tpu.models import ISCNet
    from rfdnet_tpu.train.trainer import (
        init_state,
        make_optimizer,
        make_train_step,
    )

    cfg = Config(
        {
            "data": {"num_point": points},
            "test": {"phase": "completion", "batch_size": 1},
            "generation": {"generate_mesh": True, "resolution_0": 32},
            "log": {"path": "/tmp/demo_artifacts"},
        },
        mode="test", make_dirs=False,
    )
    dc = cfg.dataset_config
    model = ISCNet(
        mean_size_arr=dc.mean_size_arr, phase="completion",
        completion_limit=4, generate_limit=8,
    )

    rng = np.random.RandomState(0)
    scenes = [
        synthetic_scene_batch(rng, batch_size=1, num_points=points,
                              num_objects=4, mean_size_arr=dc.mean_size_arr)
        for _ in range(33)
    ]
    train_scenes, demo_scene = scenes[:32], scenes[32]

    def stack(items):
        return {k: np.concatenate([it[k] for it in items]) for k in items[0]}

    tx = make_optimizer()
    state = init_state(model, tx, jax.tree_util.tree_map(
        jnp.asarray, stack(train_scenes[:8])
    ))
    key = jax.random.PRNGKey(0)

    # stage 1: pure detection gradients (completion weight 0 — the
    # reference's stage 1 trains the detection phase alone at lr 1e-3;
    # joint training at that lr diverges)
    step = make_train_step(model, dc, tx, completion_weight=0.0,
                           donate=True)
    for it in range(steps_det):
        sel = rng.choice(32, 8, replace=False)
        batch = jax.tree_util.tree_map(
            jnp.asarray, stack([train_scenes[i] for i in sel])
        )
        state, losses = step(state, batch, jax.random.fold_in(key, it),
                             jnp.float32(1e-3), jnp.float32(0.5))
        if it % 100 == 0:
            print(f"[det] {it}: total {float(losses['total']):.2f} "
                  f"obj_acc {float(losses['obj_acc']):.3f}")

    # stage 2: completion with frozen detector
    step2 = make_train_step(model, dc, tx, completion_weight=1.0,
                            frozen=("backbone", "voting", "detection"),
                            donate=True)
    for it in range(steps_comp):
        sel = rng.choice(32, 8, replace=False)
        batch = jax.tree_util.tree_map(
            jnp.asarray, stack([train_scenes[i] for i in sel])
        )
        state, losses = step2(state, batch, jax.random.fold_in(key, 10_000 + it),
                              jnp.float32(1e-4), jnp.float32(0.5))
        if it % 100 == 0:
            print(f"[comp] {it}: total {float(losses['total']):.2f}")

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    out_dir = os.path.join(
        os.path.dirname(__file__), "..", "demo", "outputs", "synthetic_room"
    )
    os.makedirs(out_dir, exist_ok=True)
    scan_path = os.path.join(out_dir, "synthetic_room.off")
    write_off(scan_path, demo_scene["point_clouds"][0, :, :3],
              np.zeros((0, 3), np.int32))

    data = {"point_clouds": demo_scene["point_clouds"]}
    parsed, gen, meshes = generate(cfg, model, variables, data)
    save_visualization(cfg, data, parsed, gen, meshes, out_dir)
    visualize(data, parsed, gen, meshes, os.path.join(out_dir, "pred.png"))
    n_boxes = int((gen["valid"][0]).sum())
    print(f"wrote {out_dir}: {n_boxes} confident proposals")


if __name__ == "__main__":
    main()
