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


def _offsets(s: int) -> np.ndarray:
    """27-point child lattice offsets for a voxel of side s."""
    h = s // 2
    return np.array(
        [[a, b, c] for a in (0, h, s) for b in (0, h, s)
         for c in (0, h, s)],
        dtype=np.int32,
    )


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
    output: str = "dense",
):
    """Build the jittable one-dispatch MISE evaluator.

    decode_fn: (features (Nb,c), cls_codes (Nb,nc), points (Nb,T,3)) ->
      logits (Nb,T) — must be traceable (called inside jit).
    budgets: per-level max refined voxels; default n_l^2 * 8 (a generous
      surface-shell bound: a flat surface crosses ~n^2 voxels).

    output="dense": fn(features, cls_codes) -> (grids
    (Nb, R+1, R+1, R+1) out_dtype, active_counts (Nb, steps) int32).
    Compare active_counts against the budgets to detect overflow.

    output="sparse": fn -> (lvl0 (Nb, n0+1, n0+1, n0+1) out_dtype,
    [(idx_l (Nb, K_l) int32, vals_l (Nb, K_l, 27) out_dtype)...],
    counts (Nb, steps) int32) — exactly the values the program decoded,
    in budget-compact per-level form, WITHOUT materializing the dense
    grid in the outputs. The caller reconstructs the dense grid with
    `reconstruct_dense` (bit-identical: the ancestor-fill rule is
    deterministic) after downloading ~the decoded values instead of the
    (R+1)^3 grid — on a bandwidth-starved host link the dense download
    dominates everything else (measured 7.4 s for 64x65^3 f16 vs 0.22 s
    of device compute)."""
    res0 = int(resolution_0)
    steps = int(upsampling_steps)
    R = res0 * 2**steps
    box_size = 1.0 + padding
    logit_thresh = float(np.log(threshold) - np.log(1.0 - threshold))
    if budgets is None:
        budgets = [min((res0 * 2**l) ** 3, (res0 * 2**l) ** 2 * 8)
                   for l in range(steps)]
    budgets = [int(b) for b in budgets]

    ax0 = np.arange(0, R + 1, 2**steps, dtype=np.int32)
    gx, gy, gz = np.meshgrid(ax0, ax0, ax0, indexing="ij")
    lvl0_pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)  # (n0,3)

    def _narrow(x):
        # f16 finite range: extreme logits must not become inf (inf
        # corners NaN marching-cubes interpolation)
        if out_dtype == jnp.float16:
            x = jnp.clip(x, -6e4, 6e4)
        return x.astype(out_dtype)

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
        sparse_levels = []
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
                return pts.reshape(K * 27, 3), idx, valid, cnt

            pts_l, idx_l, valid_l, cnt_l = jax.vmap(per_prop)(values, known)
            counts.append(cnt_l)
            v_l = decode_lattice(pts_l)
            if output == "sparse":
                sparse_levels.append(
                    (idx_l, _narrow(v_l.reshape(Nb, K, 27)))
                )
            # invalid slots scatter out of bounds -> dropped
            vmask = jnp.repeat(valid_l, 27, axis=1)
            tgt = jnp.where(vmask[..., None], pts_l, R + 1)
            values = values.at[
                bidx, tgt[..., 0], tgt[..., 1], tgt[..., 2]
            ].set(v_l, mode="drop")
            known = known.at[
                bidx, tgt[..., 0], tgt[..., 1], tgt[..., 2]
            ].set(True, mode="drop")

        if output == "sparse":
            n0 = res0 + 1
            lvl0 = _narrow(v0.reshape(Nb, n0, n0, n0))
            return lvl0, sparse_levels, jnp.stack(counts, axis=-1)

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

        return _narrow(values), jnp.stack(counts, axis=-1)

    return run


def make_mise_device_global(
    decode_fn: Callable,
    resolution_0: int,
    upsampling_steps: int,
    threshold: float,
    padding: float,
    level_budgets: Sequence[int],
    sparse_budget: int,
    out_dtype=jnp.float16,
    chunk_rows: int = 2048,
):
    """Device MISE v2 (VERDICT r4 item 2): the refinement budget is
    GLOBAL across proposals and the output is the transfer-sparse form of
    the final dense field.

    The r3/r4 design gave every proposal slot the same static per-level
    budget, so one complex trained field overflowed the whole scene to
    the host octree (budgets [1024, 4096] vs measured counts up to
    [3057, 4112] — `BENCH_r04` tail), while INVALID slots (52 of 64 on
    the rehearsal checkpoint) burned identical decode FLOPs on garbage
    features. Here:

    - `valid` gating floors invalid proposals' coarse lattices to
      "everywhere outside" right after the level-0 decode, so they spawn
      zero refinement voxels and ship zero bytes;
    - each refinement level compacts the ACTIVE (mixed-sign, fully
      known) voxels of ALL proposals into one (prop, voxel) list capped
      by ``level_budgets[l]`` — a scene-level bound that rides the
      compile cache when the caller doubles it on overflow — and decodes
      each voxel's 27-point child lattice with its own proposal's
      conditioning (features/cls gathered per voxel row; the decoder is
      pointwise given (feature, point), so (K, 27) rows are just another
      batch shape);
    - after the ancestor fill (`to_dense`), the full (R+1)^3 field is
      narrowed to ``out_dtype`` and reduced to the transfer-sparse form
      (`sparsify_grids`: sign bits + iso-neighborhood values), which the
      host turns into meshes with `marching_cubes_bits` — byte-identical
      to extracting the dense download, via the identical code path the
      dense 32^3 protocol already uses.

    Returns fn(features (Nb,c), cls_codes (Nb,nc), valid (Nb,) bool) ->
      (bits (Nb, (R+1)^3/8 round up) uint8,
       vals (sparse_budget,) out_dtype,
       needed_counts (Nb,) int32            # sparsify per-proposal counts
       level_totals (steps,) int32)         # TRUE active totals per level;
    overflow iff level_totals[l] > level_budgets[l] or
    needed_counts.sum() > sparse_budget — the caller re-dispatches at
    doubled budgets (each budget tuple compiles once, cached).

    Match: `external/libmise/mise.pyx` (host octree, works at any
    occupancy), `generator.py:78-121`.
    """
    res0 = int(resolution_0)
    steps = int(upsampling_steps)
    R = res0 * 2**steps
    box_size = 1.0 + padding
    logit_thresh = float(np.log(threshold) - np.log(1.0 - threshold))
    level_budgets = [int(b) for b in level_budgets]

    ax0 = np.arange(0, R + 1, 2**steps, dtype=np.int32)
    gx, gy, gz = np.meshgrid(ax0, ax0, ax0, indexing="ij")
    lvl0_pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)

    def _narrow(x):
        if out_dtype == jnp.float16:
            x = jnp.clip(x, -6e4, 6e4)
        return x.astype(out_dtype)

    def run(features, cls_codes, valid=None):
        Nb = features.shape[0]
        values = jnp.zeros((Nb, R + 1, R + 1, R + 1), jnp.float32)
        known = jnp.zeros((Nb, R + 1, R + 1, R + 1), bool)
        bidx = jnp.arange(Nb, dtype=jnp.int32)[:, None]

        def to_coords(pts_lattice):
            return box_size * (pts_lattice.astype(jnp.float32) / R - 0.5)

        # ------------------------------------------------------ level 0
        p0 = jnp.broadcast_to(
            jnp.asarray(lvl0_pts)[None], (Nb, len(lvl0_pts), 3)
        )
        T0 = p0.shape[1]
        ct = chunk_rows * 27  # reuse the row chunking budget point-wise
        if T0 <= ct:
            v0 = decode_fn(features, cls_codes, to_coords(p0)).astype(
                jnp.float32
            )
        else:
            v0 = jnp.concatenate(
                [
                    decode_fn(
                        features, cls_codes, to_coords(p0[:, k: k + ct])
                    ).astype(jnp.float32)
                    for k in range(0, T0, ct)
                ],
                axis=1,
            )
        if valid is not None:
            # invalid slots: everywhere-outside field -> no refinement,
            # no sparse payload, empty mesh
            v0 = jnp.where(valid.reshape(Nb, 1), v0, -1e4)
        values = values.at[bidx, p0[..., 0], p0[..., 1], p0[..., 2]].set(v0)
        known = known.at[bidx, p0[..., 0], p0[..., 1], p0[..., 2]].set(True)

        totals = []
        # --------------------------------------------- refinement levels
        for l in range(steps):
            s = 2 ** (steps - l)
            n = res0 * 2**l
            K = level_budgets[l]
            offs = jnp.asarray(_offsets(s))  # (27, 3)

            act = jax.vmap(
                lambda v, k: _active_voxels(v, k, n, s, logit_thresh)
            )(values, known)  # (Nb, n, n, n)
            flat = act.reshape(-1)
            total = jnp.sum(flat, dtype=jnp.int32)
            totals.append(total)
            # O(N) stream compaction by cumulative position (ascending
            # (prop, voxel) order) — top_k over Nb*n^3 keys with K in the
            # tens of thousands is far slower on the VPU
            pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
            tgt = jnp.where(flat & (pos < K), pos, K)
            gidx = (
                jnp.zeros((K + 1,), jnp.int32)
                .at[tgt]
                .set(jnp.arange(flat.shape[0], dtype=jnp.int32))[:K]
            )
            gvalid = jnp.arange(K, dtype=jnp.int32) < total
            gprop = (gidx // (n * n * n)).astype(jnp.int32)
            vox = gidx % (n * n * n)
            ii = vox // (n * n)
            jj = (vox // n) % n
            kk = vox % n
            base = jnp.stack([ii, jj, kk], -1) * s  # (K, 3)
            pts = base[:, None, :] + offs[None, :, :]  # (K, 27, 3)

            f_sel = features[gprop]  # (K, c)
            c_sel = cls_codes[gprop]  # (K, nc)
            coords = to_coords(pts)
            if K <= chunk_rows:
                v_l = decode_fn(f_sel, c_sel, coords).astype(jnp.float32)
            else:
                v_l = jnp.concatenate(
                    [
                        decode_fn(
                            f_sel[k: k + chunk_rows],
                            c_sel[k: k + chunk_rows],
                            coords[k: k + chunk_rows],
                        ).astype(jnp.float32)
                        for k in range(0, K, chunk_rows)
                    ],
                    axis=0,
                )  # (K, 27)

            tgt = jnp.where(gvalid[:, None, None], pts, R + 1)
            gp = jnp.where(gvalid, gprop, Nb)
            values = values.at[
                gp[:, None], tgt[..., 0], tgt[..., 1], tgt[..., 2]
            ].set(v_l, mode="drop")
            known = known.at[
                gp[:, None], tgt[..., 0], tgt[..., 1], tgt[..., 2]
            ].set(True, mode="drop")

        # ---------------------------------------- ancestor fill (to_dense)
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

        grids = _narrow(values)
        bits, vals, needed = sparsify_grids(
            grids, logit_thresh, int(sparse_budget), valid=valid
        )
        return bits, vals, needed, jnp.stack(totals)

    return run


def sparsify_grids(grids: jax.Array, iso: float, budget: int, valid=None):
    """Transfer-sparsification of dense occupancy-logit grids (the
    protocol path's dominant device->host payload): marching cubes only
    reads corner VALUES at cells that cross the iso, so ship (a) one sign
    bit per lattice point and (b) the values of points whose 3^3
    neighborhood (padded with outside) carries mixed signs — every corner
    of every mixed padded cell is such a point. ~4.2 MB/scene of f16
    grids becomes ~0.3-1.3 MB on the 64-proposal protocol.

    grids: (Nb, n, n, n) float16/float32 logits. Returns
    (bits (Nb, n^3/8) uint8 [np.packbits big-bit order],
     vals (budget,) grids.dtype — the needed points' values in
     (proposal, point-index) ascending order,
     counts (Nb,) int32 — true needed count per proposal; overflow iff
     counts.sum() > budget, in which case the caller falls back to a
     dense download).

    Byte-identity: the host extractor (`meshing.cpp mc_extract_bits`)
    rebuilds the same sign field and the same ascending needed order, so
    its meshes equal the dense path's bit for bit
    (tests/test_meshing.py).

    valid: optional (Nb,) bool — invalid proposals ship no values
    (count 0); the caller emits empty meshes for them anyway."""
    Nb, n = grids.shape[0], grids.shape[1]
    occ = grids.astype(jnp.float32) > jnp.float32(iso)
    bits = jnp.packbits(occ.reshape(Nb, -1), axis=-1)
    occp = jnp.pad(occ, ((0, 0), (1, 1), (1, 1), (1, 1)))
    any_in = jnp.zeros((Nb, n, n, n), bool)
    all_in = jnp.ones((Nb, n, n, n), bool)
    for dx in (0, 1, 2):
        for dy in (0, 1, 2):
            for dz in (0, 1, 2):
                w = occp[:, dx:dx + n, dy:dy + n, dz:dz + n]
                any_in = any_in | w
                all_in = all_in & w
    needed = any_in & ~all_in
    if valid is not None:
        needed = needed & valid.reshape(Nb, 1, 1, 1)
    flat = needed.reshape(-1)
    # stable stream-compaction by cumulative position (ascending order,
    # proposal-major) — O(N), no top_k
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    tgt = jnp.where(flat & (pos < budget), pos, budget)
    vals = jnp.zeros((budget,), grids.dtype).at[tgt].set(
        grids.reshape(-1), mode="drop"
    )
    counts = jnp.sum(needed.reshape(Nb, -1), axis=-1, dtype=jnp.int32)
    return bits, vals, counts


def make_compactor(K: int, bucket: int):
    """Jittable cross-proposal compaction of one sparse level.

    (idx (Nb, K) int32, vals (Nb, K, d), counts (Nb,)) ->
    (gprop (bucket,) int32, gidx (bucket,) int32, gvals (bucket, d),
    gvalid (bucket,) bool) — the first sum(counts) entries are the
    valid refined voxels across all proposals in (proposal, index)
    order. Downloading these bucket-sized buffers replaces the dense
    grid download; pick bucket as the pow2 cover of sum(counts)."""

    def compact(idx, vals, counts):
        nb = idx.shape[0]
        n = nb * K
        valid = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
        flat = valid.ravel()
        ar = jnp.arange(n, dtype=jnp.int32)
        score = jnp.where(flat, n - ar, -1 - ar)
        _, sel = jax.lax.top_k(score, min(bucket, n))
        sel = sel.astype(jnp.int32)
        return (
            (sel // K).astype(jnp.int32),
            idx.reshape(n)[sel],
            vals.reshape(n, -1)[sel],
            flat[sel],
        )

    return compact


def reconstruct_dense(lvl0, levels, resolution_0: int,
                      upsampling_steps: int) -> np.ndarray:
    """Host-side (numpy) dense-grid reconstruction from the sparse
    outputs: replays the device scatter + ancestor fill exactly.

    lvl0: (Nb, n0+1, n0+1, n0+1); levels: one
    (gprop (M,), gidx (M,), gvals (M, 27), gvalid (M,)) per refinement
    level (compacted, `make_compactor`). Returns (Nb, R+1, R+1, R+1)
    float32 — bit-identical to the device dense output (duplicate
    scatter targets always carry identical decoded values, because the
    decoder is a per-point map and both programs round through the same
    out_dtype)."""
    lvl0 = np.asarray(lvl0)
    nb = lvl0.shape[0]
    res0 = int(resolution_0)
    steps = int(upsampling_steps)
    R = res0 * 2**steps
    values = np.zeros((nb, R + 1, R + 1, R + 1), np.float32)
    known = np.zeros((nb, R + 1, R + 1, R + 1), bool)
    s0 = 2**steps
    values[:, ::s0, ::s0, ::s0] = lvl0.astype(np.float32)
    known[:, ::s0, ::s0, ::s0] = True
    for l, (gprop, gidx, gvals, gvalid) in enumerate(levels):
        s = 2 ** (steps - l)
        n = res0 * 2**l
        m = np.asarray(gvalid).astype(bool)
        gp = np.asarray(gprop)[m]
        gi = np.asarray(gidx)[m].astype(np.int64)
        gv = np.asarray(gvals)[m].astype(np.float32)
        base = (
            np.stack([gi // (n * n), (gi // n) % n, gi % n], -1) * s
        )  # (M, 3)
        pts = base[:, None, :] + _offsets(s)[None]  # (M, 27, 3)
        values[gp[:, None], pts[..., 0], pts[..., 1], pts[..., 2]] = gv
        known[gp[:, None], pts[..., 0], pts[..., 1], pts[..., 2]] = True
    for l in range(steps):
        s = 2 ** (steps - l)
        h = s // 2
        src = ((np.arange(0, R + 1, h) // s) * s).astype(np.int64)
        coarse = values[
            :, src[:, None, None], src[None, :, None], src[None, None, :]
        ]
        sub = values[:, ::h, ::h, ::h]
        kn = known[:, ::h, ::h, ::h]
        values[:, ::h, ::h, ::h] = np.where(kn, sub, coarse)
        known[:, ::h, ::h, ::h] = True
    return values
