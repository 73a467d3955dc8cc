"""8-way data-parallel serving line (VERDICT r4 item 8).

Runs the fused test-protocol generate program (`ISCNet.generate`,
detection -> cls-NMS -> completion conditioning -> dense 32^3 decode +
transfer-sparse export) batch-sharded over an 8-device mesh
(`parallel/serve.py make_sharded_generate`) and over a single device,
on the SAME backend, and reports the per-device overhead of the
sharded program:

    overhead = (t_sharded_batch8 / 8) / t_single_batch1 - 1

The generate path has no cross-scene communication (params replicated,
batch sharded), so the ideal overhead is ~0; the measured number is the
cost of the sharded program's collective-free partitioning itself.
On this host the mesh is the virtual 8-device CPU mesh (the driver's
`dryrun_multichip` validates the same sharding compiles multi-chip);
on a real v5e-8 the identical code path serves 8 scenes per dispatch.
Relative per-device overhead is hardware-meaningful either way; the
absolute scenes/s on CPU is not (the TPU absolute line lives in
bench.py).

Prints one JSON line; bench.py runs this as a subprocess (fresh
process so the platform/device-count env applies) and folds the result
into its secondary block.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

import numpy as np

N_POINTS = int(os.environ.get("BENCH_POINTS", 20_000))  # CPU-sized default
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    from rfdnet_tpu.config.scannet import ScannetConfig
    from rfdnet_tpu.data.synthetic import synthetic_scene_batch
    from rfdnet_tpu.models import ISCNet
    from rfdnet_tpu.parallel.mesh import make_mesh
    from rfdnet_tpu.parallel.serve import make_sharded_generate

    n_dev = len(jax.devices())
    dc = ScannetConfig()
    model = ISCNet(
        mean_size_arr=dc.mean_size_arr, phase="completion",
        generate_limit=16,
    )
    batch1 = synthetic_scene_batch(
        np.random.RandomState(0), batch_size=1, num_points=N_POINTS,
        num_objects=8, mean_size_arr=dc.mean_size_arr,
    )
    batch1 = {k: v for k, v in batch1.items() if not isinstance(v, list)}
    batch8 = {k: np.concatenate([v] * n_dev, axis=0) for k, v in batch1.items()}
    variables = model.init(
        jax.random.PRNGKey(0),
        jax.tree_util.tree_map(jnp.asarray, batch1),
        train=False, rng=jax.random.PRNGKey(1),
    )
    kw = dict(nms_iou=0.25, use_cls_nms=True, dump_threshold=0.05,
              remove_empty_box=True, decode_grid_res=32,
              grid_dtype="float16")

    mesh8 = make_mesh()  # all devices
    mesh1 = make_mesh(jax.devices()[:1])
    serve8 = make_sharded_generate(model, variables, mesh=mesh8, **kw)
    serve1 = make_sharded_generate(model, variables, mesh=mesh1, **kw)

    def timed(serve, batch):
        out = serve(batch)  # compile + warmup
        jax.block_until_ready(out)
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(serve(batch))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t8 = timed(serve8, batch8)
    t1 = timed(serve1, batch1)
    overhead = (t8 / n_dev) / t1 - 1.0
    print(json.dumps({
        "n_devices": n_dev,
        "points": N_POINTS,
        "t_sharded_batch_s": round(t8, 4),
        "t_single_scene_s": round(t1, 4),
        "per_device_overhead": round(overhead, 4),
        "scenes_per_dispatch": n_dev,
        "note": "fused generate batch-sharded over the mesh; params "
                "replicated, zero cross-scene collectives — overhead is "
                "the partitioned program's own cost vs 1 device",
    }))


if __name__ == "__main__":
    main()
