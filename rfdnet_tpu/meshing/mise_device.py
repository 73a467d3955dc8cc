"""Device-resident MISE: the whole multi-resolution iso-surface
refinement in ONE jitted program.

The reference's MISE (`external/libmise/mise.pyx` driven by
`generator.py:78-121`) ping-pongs between a host octree and per-chunk
decoder evaluations — on TPU that costs one dispatch (plus a ~MB query
upload and logit download) per refinement round per chunk, and round-2's
driver capture showed the MISE path collapsing to 0.129 scenes/s because
of exactly that serial host<->device traffic.

This module keeps the octree ON DEVICE as fixed-shape tensor ops:

- level 0 decodes the dense (res0+1)^3 corner lattice,
- each refinement level finds voxels whose 8 known corners straddle the
  threshold (the reference's activation rule), takes the first
  ``budget[l]`` of them in index order (static shape; the true active
  count is returned so callers can detect budget overflow — rare, and
  recoverable by falling back to the host-octree path), decodes their
  27-point child lattices in one batched call, and scatters the values,
- unknown lattice points then inherit their coarsest known ancestor
  corner value (the `to_dense` rule), entirely on device.

The result is the full (R+1)^3 logit grid per proposal after exactly
``1 + upsampling_steps`` decoder calls inside ONE compiled program — no
query uploads, no intermediate downloads, no host octree bookkeeping.
With budgets >= the true active counts the produced grid is IDENTICAL to
the host octree's (asserted against the python/C++ oracles in
tests/test_meshing.py).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _first_k_true(flat: jax.Array, k: int):
    """Indices of the first k True entries (index order), plus validity.

    flat: (n,) bool. Returns (idx (k,) int32, valid (k,) bool).
    """
    n = flat.shape[0]
    ar = jnp.arange(n, dtype=jnp.int32)
    score = jnp.where(flat, n - ar, -1 - ar)  # actives first, index order
    _, idx = jax.lax.top_k(score, k)
    idx = idx.astype(jnp.int32)
    return idx, flat[idx]


def _active_voxels(values, known, n, s, logit_thresh):
    """Mixed-sign fully-known voxels at stride s ((n+1)^3 corner grid)."""
    v = values[::s, ::s, ::s]
    kn = known[::s, ::s, ::s]
    occ = v >= logit_thresh
    c = jnp.zeros((n, n, n), jnp.int32)
    k8 = jnp.zeros((n, n, n), jnp.int32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                c = c + occ[dx : n + dx, dy : n + dy, dz : n + dz]
                k8 = k8 + kn[dx : n + dx, dy : n + dy, dz : n + dz]
    return (c > 0) & (c < 8) & (k8 == 8)


def make_mise_device(
    decode_fn: Callable,
    resolution_0: int,
    upsampling_steps: int,
    threshold: float,
    padding: float,
    budgets: Sequence[int] | None = None,
    out_dtype=jnp.float16,
    chunk_t: int = 36_000,
):
    """Build the jittable one-dispatch MISE evaluator.

    decode_fn: (features (Nb,c), cls_codes (Nb,nc), points (Nb,T,3)) ->
      logits (Nb,T) — must be traceable (called inside jit).
    budgets: per-level max refined voxels; default n_l^2 * 8 (a generous
      surface-shell bound: a flat surface crosses ~n^2 voxels).

    Returns fn(features, cls_codes) -> (grids (Nb, R+1, R+1, R+1)
    out_dtype, active_counts (Nb, steps) int32). Compare active_counts
    against the budgets to detect overflow.
    """
    res0 = int(resolution_0)
    steps = int(upsampling_steps)
    R = res0 * 2**steps
    box_size = 1.0 + padding
    logit_thresh = float(np.log(threshold) - np.log(1.0 - threshold))
    if budgets is None:
        budgets = [min((res0 * 2**l) ** 3, (res0 * 2**l) ** 2 * 8)
                   for l in range(steps)]
    budgets = [int(b) for b in budgets]

    # 27-point child lattice offsets, filled per level with stride s
    def _offsets(s):
        h = s // 2
        return np.array(
            [[a, b, c] for a in (0, h, s) for b in (0, h, s)
             for c in (0, h, s)],
            dtype=np.int32,
        )

    ax0 = np.arange(0, R + 1, 2**steps, dtype=np.int32)
    gx, gy, gz = np.meshgrid(ax0, ax0, ax0, indexing="ij")
    lvl0_pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)  # (n0,3)

    def run(features, cls_codes):
        Nb = features.shape[0]
        values = jnp.zeros((Nb, R + 1, R + 1, R + 1), jnp.float32)
        known = jnp.zeros((Nb, R + 1, R + 1, R + 1), bool)

        def decode_lattice(pts_lattice):
            """pts_lattice (Nb, T, 3) int -> logits (Nb, T) f32.

            Chunked over T: the decoder's (Nb, T, 256) activations at
            refinement-level sizes (64 x 110k points) would exhaust HBM
            in one call; sequential chunks let XLA reuse the buffers
            (mirrors the reference's points_batch_size=100000,
            `generator.py:34,123-143` — but inside ONE program)."""
            pts = box_size * (
                pts_lattice.astype(jnp.float32) / R - 0.5
            )
            T = pts.shape[1]
            if T <= chunk_t:
                return decode_fn(features, cls_codes, pts).astype(
                    jnp.float32
                )
            outs = [
                decode_fn(
                    features, cls_codes, pts[:, k : k + chunk_t]
                ).astype(jnp.float32)
                for k in range(0, T, chunk_t)
            ]
            return jnp.concatenate(outs, axis=1)

        # ---------------------------------------------------- level 0
        p0 = jnp.broadcast_to(
            jnp.asarray(lvl0_pts)[None], (Nb, len(lvl0_pts), 3)
        )
        v0 = decode_lattice(p0)
        bidx = jnp.arange(Nb, dtype=jnp.int32)[:, None]
        values = values.at[
            bidx, p0[..., 0], p0[..., 1], p0[..., 2]
        ].set(v0)
        known = known.at[
            bidx, p0[..., 0], p0[..., 1], p0[..., 2]
        ].set(True)

        counts = []
        # ---------------------------------------------- refinement levels
        for l in range(steps):
            s = 2 ** (steps - l)
            n = res0 * 2**l
            K = budgets[l]
            offs = jnp.asarray(_offsets(s))  # (27, 3)

            def per_prop(vals, kn):
                act = _active_voxels(vals, kn, n, s, logit_thresh)
                flat = act.ravel()
                idx, valid = _first_k_true(flat, K)
                cnt = jnp.sum(flat, dtype=jnp.int32)
                ii = idx // (n * n)
                jj = (idx // n) % n
                kk = idx % n
                base = jnp.stack([ii, jj, kk], -1) * s  # (K, 3)
                pts = base[:, None, :] + offs[None, :, :]  # (K, 27, 3)
                return pts.reshape(K * 27, 3), valid, cnt

            pts_l, valid_l, cnt_l = jax.vmap(per_prop)(values, known)
            counts.append(cnt_l)
            v_l = decode_lattice(pts_l)
            # invalid slots scatter out of bounds -> dropped
            vmask = jnp.repeat(valid_l, 27, axis=1)
            tgt = jnp.where(vmask[..., None], pts_l, R + 1)
            values = values.at[
                bidx, tgt[..., 0], tgt[..., 1], tgt[..., 2]
            ].set(v_l, mode="drop")
            known = known.at[
                bidx, tgt[..., 0], tgt[..., 1], tgt[..., 2]
            ].set(True, mode="drop")

        # -------------------------------------- ancestor fill (to_dense)
        for l in range(steps):
            s = 2 ** (steps - l)
            h = s // 2
            src = ((np.arange(0, R + 1, h) // s) * s).astype(np.int32)
            coarse = values[
                :, src[:, None, None], src[None, :, None], src[None, None, :]
            ]
            sub = values[:, ::h, ::h, ::h]
            kn = known[:, ::h, ::h, ::h]
            values = values.at[:, ::h, ::h, ::h].set(
                jnp.where(kn, sub, coarse)
            )
            known = known.at[:, ::h, ::h, ::h].set(True)

        if out_dtype == jnp.float16:
            # f16 finite range: extreme logits must not become inf
            # (inf corners NaN marching-cubes interpolation)
            values = jnp.clip(values, -6e4, 6e4)
        grids = values.astype(out_dtype)
        return grids, jnp.stack(counts, axis=-1)

    return run
