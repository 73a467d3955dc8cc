"""End-to-end throughput benchmark: scenes/sec for detection + instance
reconstruction (the reference's `--mode test` per-scene path,
`models/iscnet/modules/network.py:56-180`), on whatever accelerator JAX
sees (real TPU chip under the driver; CPU elsewhere).

One scene = 80k-point cloud -> PointNet++ backbone -> voting -> proposal
head -> on-device class-aware 3D NMS -> skip-propagation conditioning for
the top proposals -> occupancy decode of a dense 32^3 grid per proposal
(the shipped test config's mesh-extraction resolution,
`ISCNet_test.yaml:62-63` with upsampling_steps=0). Everything up to the
host marching-cubes is a single jitted program with static shapes.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "scenes/sec", "vs_baseline": N}

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
we use an estimated 0.4 scenes/sec for the reference's GPU test loop
(per-scene Python NMS + per-proposal chunked occupancy evals + CPU
marching cubes dominate; see SURVEY.md §3.2) until a measured baseline
exists. The north-star target is >=5x (BASELINE.json).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Persistent compile cache: the 80k-scale generate program is a large
# compile over the remote-compile tunnel; cache it across runs.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

REF_SCENES_PER_SEC_EST = 0.4  # estimated reference GPU throughput (see above)

NUM_POINTS = int(os.environ.get("BENCH_POINTS", 80_000))
BATCH = int(os.environ.get("BENCH_BATCH", 1))  # scenes per device call
GRID_RES = 32
GENERATE_LIMIT = 8  # proposals reconstructed per scene (demo-scale)
WARMUP = 2
ITERS = 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rfdnet_tpu.config.scannet import ScannetConfig
    from rfdnet_tpu.data.synthetic import synthetic_scene_batch
    from rfdnet_tpu.models import ISCNet, make_3d_grid

    dc = ScannetConfig()
    model = ISCNet(
        mean_size_arr=dc.mean_size_arr,
        phase="completion",
        generate_limit=GENERATE_LIMIT,
    )

    batch = synthetic_scene_batch(
        np.random.RandomState(0), batch_size=BATCH, num_points=NUM_POINTS,
        mean_size_arr=dc.mean_size_arr,
    )
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    variables = model.init(
        jax.random.PRNGKey(0), batch, train=False, rng=jax.random.PRNGKey(1)
    )

    grid = make_3d_grid((-0.55,) * 3, (0.55,) * 3, (GRID_RES,) * 3)  # (R^3, 3)

    def scene_fn(variables, point_clouds):
        end_points, prop_feats, parsed = model.apply(
            variables, point_clouds, method=ISCNet.generate_detections,
            mutable=False,
        )
        gen = model.apply(
            variables, end_points, prop_feats, parsed,
            {"point_clouds": point_clouds},
            method=ISCNet.generate_completion, mutable=False,
        )
        pts = jnp.broadcast_to(
            grid[None], (gen["features"].shape[0],) + grid.shape
        )
        logits = model.apply(
            variables, gen["features"], gen["cls_codes"], pts,
            method=ISCNet.decode_occupancy, mutable=False,
        )
        return (
            parsed["pred_corners_3d_upright_camera"],
            parsed["pred_mask"],
            gen["valid"],
            logits,
        )

    pc = batch["point_clouds"]

    # Loop scenes INSIDE one jit: the dev tunnel has ~33 ms per-dispatch
    # round-trip which would dominate per-call wall timing; a fori_loop
    # with an input perturbation measures pure device throughput
    # (`rfdnet_tpu.utils.timing.device_time` pattern).
    def scalarize(tree):
        # full-output reduction so no branch of the program is DCE-able
        return sum(
            jnp.sum(leaf.astype(jnp.float32))
            for leaf in jax.tree_util.tree_leaves(tree)
        )

    @jax.jit
    def run_n(variables, pc):
        def body(i, carry):
            eps, acc = carry
            out = scene_fn(variables, pc + eps)
            s = scalarize(out)
            return s * 1e-38, acc + s

        _, acc = jax.lax.fori_loop(
            0, ITERS, body, (jnp.float32(0), jnp.float32(0))
        )
        return acc

    @jax.jit
    def null(variables, pc):
        return jnp.sum(pc.ravel()[:1])

    np.asarray(run_n(variables, pc))  # compile + warmup
    for _ in range(WARMUP - 1):
        np.asarray(run_n(variables, pc))
    np.asarray(null(variables, pc))
    t0 = time.perf_counter()
    np.asarray(run_n(variables, pc))
    t_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(null(variables, pc))
    t_null = time.perf_counter() - t0
    dt = max(t_run - t_null, 1e-9) / ITERS

    value = BATCH / dt
    print(json.dumps({
        "metric": "scenes_per_sec_detect_recon",
        "value": round(value, 4),
        "unit": "scenes/sec",
        "vs_baseline": round(value / REF_SCENES_PER_SEC_EST, 4),
    }))


if __name__ == "__main__":
    main()
