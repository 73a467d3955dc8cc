"""Microbenchmark for the host marching-cubes paths (VERDICT r3 item 3).

Times, per proposal, the two hot extractors on trained-model-shaped
inputs (a smooth blob whose logit field crosses iso over an O(R^2)
surface shell):

- dense:  mc_extract over a padded (res0+2)^3 grid (the shipped
  test-config path, `ISCNet_test.yaml:62-63`),
- sparse: mise_mc_extract from device-MISE sparse outputs at
  res0=32, steps=1 (the bench's mise_64 line).

Usage: python tools/bench_mc.py [--reps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def blob_logits(pts: np.ndarray, rng) -> np.ndarray:
    """Smooth asymmetric logit field over canonical-box points (..., 3)."""
    c = np.array([0.03, -0.04, 0.02])
    r = np.linalg.norm((pts - c) * np.array([1.0, 1.3, 0.8]), axis=-1)
    bump = 0.15 * np.sin(7 * pts[..., 0]) * np.cos(5 * pts[..., 1])
    return 40.0 * (0.33 + bump - r)


def bench_dense(res0=32, nprop=64, reps=5):
    from rfdnet_tpu.meshing.native import marching_cubes
    from rfdnet_tpu.models.occnet import make_3d_grid

    rng = np.random.RandomState(0)
    pts = np.asarray(make_3d_grid((-0.5,) * 3, (0.5,) * 3, (res0,) * 3))
    pts = 1.1 * pts
    grids = []
    for i in range(nprop):
        shift = rng.uniform(-0.05, 0.05, 3)
        grids.append(
            blob_logits(pts + shift, rng).reshape(res0, res0, res0)
            .astype(np.float32))
    iso = 0.0
    nt_total = 0
    t0 = time.perf_counter()
    for _ in range(reps):
        nt_total = 0
        for g in grids:
            padded = np.pad(g, 1, constant_values=-1e6)
            v, t = marching_cubes(padded, iso)
            nt_total += len(t)
    dt = (time.perf_counter() - t0) / reps
    print(f"dense  res0={res0} nprop={nprop}: {dt*1000:.1f} ms/scene "
          f"({dt/nprop*1000:.3f} ms/prop, {nt_total} tris)")

    from rfdnet_tpu.meshing.native import marching_cubes_batch

    stack = np.stack(grids)
    t0 = time.perf_counter()
    for _ in range(reps):
        pairs = marching_cubes_batch(stack, iso)
        nt_b = sum(len(t) for _, t in pairs)
    dt_b = (time.perf_counter() - t0) / reps
    assert nt_b == nt_total, (nt_b, nt_total)
    print(f"dense-batch              : {dt_b*1000:.1f} ms/scene "
          f"({dt_b/nprop*1000:.3f} ms/prop)")
    return dt_b


def bench_sparse(res0=32, steps=1, nprop=64, reps=5):
    """Build genuine device-MISE sparse outputs on CPU jax, then time the
    C++ sparse extractor alone."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rfdnet_tpu.meshing.mise_device import make_mise_device
    from rfdnet_tpu.meshing.native import mise_marching_cubes

    rng = np.random.RandomState(0)
    shifts = rng.uniform(-0.05, 0.05, (nprop, 3)).astype(np.float32)

    def decode_fn(features, cls_codes, pts):
        # features[:, :3] is the per-proposal shift
        p = pts + features[:, None, :3]
        c = jnp.array([0.03, -0.04, 0.02])
        r = jnp.linalg.norm((p - c) * jnp.array([1.0, 1.3, 0.8]), axis=-1)
        bump = 0.15 * jnp.sin(7 * p[..., 0]) * jnp.cos(5 * p[..., 1])
        return 40.0 * (0.33 + bump - r)

    budgets = [(res0 * 2 ** l) ** 2 * 4 for l in range(steps)]
    fn = jax.jit(make_mise_device(
        decode_fn, res0, steps, 0.5, 0.1, budgets=budgets, output="sparse"))
    feats = np.zeros((nprop, 8), np.float32)
    feats[:, :3] = shifts
    lvl0, levels, counts = fn(jnp.asarray(feats), jnp.zeros((nprop, 8)))
    counts = np.asarray(counts)
    assert (counts <= np.array(budgets)[None]).all(), counts.max(0)
    lvl0 = np.asarray(lvl0).astype(np.float32)
    per_prop = []
    for l, (idx_l, vals_l) in enumerate(levels):
        idx_l = np.asarray(idx_l)
        vals_l = np.asarray(vals_l).astype(np.float32)
        per_prop.append((idx_l, vals_l, counts[:, l]))

    iso = 0.0
    t0 = time.perf_counter()
    nt_total = 0
    for _ in range(reps):
        nt_total = 0
        for i in range(nprop):
            idx_i, vals_i = [], []
            for idx_l, vals_l, cnt in per_prop:
                m = int(cnt[i])
                idx_i.append(idx_l[i, :m])
                vals_i.append(vals_l[i, :m])
            v, t = mise_marching_cubes(lvl0[i], res0, steps, idx_i, vals_i,
                                       iso)
            nt_total += len(t)
    dt = (time.perf_counter() - t0) / reps
    print(f"sparse res0={res0} steps={steps} nprop={nprop}: "
          f"{dt*1000:.1f} ms/scene ({dt/nprop*1000:.3f} ms/prop, "
          f"{nt_total} tris, counts max {counts.max(0)})")

    from rfdnet_tpu.meshing.native import mise_marching_cubes_batch

    level_counts = counts.astype(np.int32)
    idx_parts, val_parts = [], []
    for i in range(nprop):
        for idx_l, vals_l, cnt in per_prop:
            m = int(cnt[i])
            idx_parts.append(idx_l[i, :m])
            val_parts.append(vals_l[i, :m])
    idx_cat = np.concatenate(idx_parts)
    val_cat = np.concatenate(val_parts)
    t0 = time.perf_counter()
    for _ in range(reps):
        pairs = mise_marching_cubes_batch(
            lvl0, res0, steps, idx_cat, val_cat, level_counts, iso)
        nt_b = sum(len(t) for _, t in pairs)
    dt_b = (time.perf_counter() - t0) / reps
    assert nt_b == nt_total, (nt_b, nt_total)
    print(f"sparse-batch             : {dt_b*1000:.1f} ms/scene "
          f"({dt_b/nprop*1000:.3f} ms/prop)")
    return dt_b


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()
    bench_dense(reps=args.reps)
    bench_sparse(reps=args.reps)
