"""Kernel-level benchmark: per-op device time at scene scale.

Measures the hot geometry ops (SURVEY §3.1 hot loops) on whatever
accelerator JAX sees, using `device_time` (tunnel-safe). Prints one JSON
line per op plus a summary. Not the driver benchmark — that's `bench.py`.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rfdnet_tpu import ops
    from rfdnet_tpu.utils.timing import device_time

    rng = np.random.RandomState(0)
    results = {}

    # SA1 config: 80k points -> 2048 samples, r=0.2, ns=64
    xyz = jnp.asarray(rng.rand(1, 80_000, 3).astype(np.float32) * 4)

    for impl in ("xla", "pallas"):
        try:
            t = device_time(
                lambda x: ops.furthest_point_sample(x, 2048, impl=impl), xyz,
                iters=30,
            )
            results[f"fps_80k_to_2048_{impl}_ms"] = t * 1e3
        except Exception as e:
            results[f"fps_80k_to_2048_{impl}_ms"] = f"FAIL {e}"

    centers = jnp.asarray(rng.rand(1, 2048, 3).astype(np.float32) * 4)
    t = device_time(
        lambda x: ops.ball_query(x, centers, 0.2, 64), xyz, iters=30
    )
    results["ball_query_2048x80k_ms"] = t * 1e3

    # three_nn interpolation (FP layer scale: 1024 unknown, 512 known)
    unknown = jnp.asarray(rng.rand(1, 1024, 3).astype(np.float32))
    known = jnp.asarray(rng.rand(1, 512, 3).astype(np.float32))
    feats = jnp.asarray(rng.rand(1, 512, 256).astype(np.float32))
    t = device_time(
        lambda u: ops.interpolate_features(u, known, feats), unknown, iters=200
    )
    results["three_interpolate_1024x512_ms"] = t * 1e3

    # chamfer at refit scale (10k x 50k)
    a = jnp.asarray(rng.rand(1, 10_000, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 50_000, 3).astype(np.float32))
    t = device_time(lambda x: ops.chamfer_distance(x, b)[0], a, iters=20)
    results["chamfer_10kx50k_ms"] = t * 1e3

    # NMS over 256 proposals
    aabb = jnp.asarray(rng.rand(1, 256, 6).astype(np.float32))
    aabb = aabb.at[..., 3:].add(aabb[..., :3] + 0.2)
    score = jnp.asarray(rng.rand(1, 256).astype(np.float32))
    cls = jnp.asarray(rng.randint(0, 8, (1, 256)).astype(np.int32))
    t = device_time(
        lambda s: ops.nms_3d(aabb, s, cls, 0.25), score, iters=200
    )
    results["nms_256_ms"] = t * 1e3

    # occupancy decoder throughput (BASELINE.json tracked metric):
    # 64 conditioned objects x 33^3 grid points through DecoderCBatchNorm
    from rfdnet_tpu.models import ONet

    onet = ONet(z_dim=32, c_dim=512)
    Nb, T = 64, 33**3
    feats_o = jnp.asarray(rng.randn(Nb, 512).astype(np.float32))
    cls_o = jnp.zeros((Nb, 8), jnp.float32)
    pts_o = jnp.asarray(rng.rand(Nb, T, 3).astype(np.float32) - 0.5)
    vo = onet.init(jax.random.PRNGKey(0), pts_o, feats_o, cls_o)
    t = device_time(
        lambda p: onet.apply(vo, p, feats_o, cls_o), pts_o, iters=10
    )
    results["occupancy_queries_per_sec"] = Nb * T / t

    results["backend"] = jax.devices()[0].platform
    for k, v in results.items():
        print(json.dumps({k: v}))


if __name__ == "__main__":
    main()
