"""Point-sharded SA1 — the sequence-parallel axis prototype.

The reference has no distributed stack at all (SURVEY §2.3); its scale
axis is points-per-scene, handled by subsampling to 80k. This module is
the one axis where the TPU build goes BEYOND the reference's parallelism
story (docs/SCALING.md "next axis"): the POINT dimension of the first
set-abstraction layer is block-sharded over an ICI mesh axis with
``shard_map``, and the three point-cloud primitives become collective
algorithms:

- ``fps_sharded``        — exact distributed furthest point sampling:
  each device keeps the running min-distance for ITS point block in
  VMEM/local memory; per selection step one f32 ``pmax`` picks the
  global winner, one masked ``psum`` broadcasts its coordinates.
  Selection-for-selection identical to the single-device kernel
  (`ops/fps.py`) because per-point distances are computed locally with
  the same formula and ties break to the smallest global index.
- ``ball_query_sharded`` — each device scans its block in global index
  order with the same MXU quadratic-form distance as `ops/ball_query.py`
  and emits (first <= nsample local hits, count); one ``all_gather``
  + an order-preserving merge reconstructs the global "first nsample in
  index order, first-hit padded" semantics of the reference CUDA kernel
  (`ball_query_gpu.cu:33-41`) exactly.
- ``gather_points_sharded`` / ``group_points_sharded`` — owner-computes
  gathers: each device answers the indices that land in its block and
  contributes zeros elsewhere; one ``psum`` assembles the result
  bit-exactly (all other summands are exact zeros).

``sa1_forward_sharded`` composes them into the full SA1 forward
(FPS -> ball query -> relative-xyz grouping -> shared MLP -> max-pool,
`pointnet2_modules.py:196` semantics) and is equivalence-tested against
the single-device ``SetAbstraction`` module in
``tests/test_point_shard.py``.

Scope notes (honest engineering record): centers and MLP parameters are
replicated — at SA1 scale (2048 centers x 64 neighbors) the grouped
tensor is ~2 MB, so only the N-point distance/selection work (the part
that grows with scene size) is worth sharding. A spatial pre-sort +
halo exchange (SCALING.md step 1) would cut the ball-query all-gather
from O(nsample * n_dev) to O(nsample) per center for huge N; it changes
nothing about these ops' contracts and is deliberately left out of the
prototype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

POINT_AXIS = "points"

_BIG = jnp.int32(2**30)


def make_point_mesh(devices=None, axis: str = POINT_AXIS) -> Mesh:
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


# --------------------------------------------------------------------- FPS
def fps_sharded(xyz: jax.Array, npoint: int, mesh: Mesh,
                axis: str = POINT_AXIS,
                skip_near_origin: bool = True) -> jax.Array:
    """Exact distributed FPS. xyz (B, N, 3) with N divisible by the mesh
    axis size -> (B, npoint) int32 GLOBAL indices, equal to
    `ops.fps.furthest_point_sample` on the unsharded array.

    Per step: local distance update (compute stays sharded), one
    pmax((B,)) + one pmin((B,)) + one psum((B,3)) over ICI — O(npoint)
    latency-bound collectives, each of a few bytes/scene.
    """
    n_dev = mesh.shape[axis]
    B, N, _ = xyz.shape
    assert N % n_dev == 0, (N, n_dev)
    n_loc = N // n_dev

    def body(xyz_loc):
        # xyz_loc: (B, n_loc, 3) — this device's block
        di = jax.lax.axis_index(axis)
        base = (di * n_loc).astype(jnp.int32)
        x = xyz_loc.astype(jnp.float32)
        if skip_near_origin:
            cand = jnp.sum(x * x, axis=-1) > 1e-3  # (B, n_loc)
        else:
            cand = jnp.ones((B, n_loc), dtype=bool)

        def owner_coords(g_idx):
            """Coordinates of global index g_idx via masked psum."""
            loc = (g_idx - base).astype(jnp.int32)
            own = (loc >= 0) & (loc < n_loc)
            safe = jnp.clip(loc, 0, n_loc - 1)
            c = jnp.take_along_axis(
                x, safe[:, None, None], axis=1
            )[:, 0]  # (B, 3)
            c = jnp.where(own[:, None], c, 0.0)
            return jax.lax.psum(c, axis)

        def step(carry, _):
            mind, last = carry  # (B, n_loc), (B, 3)
            d = jnp.sum((x - last[:, None, :]) ** 2, axis=-1)
            mind = jnp.minimum(mind, d)
            eff = jnp.where(cand, mind, -1.0)
            mx_l = jnp.max(eff, axis=1)  # (B,)
            mx_g = jax.lax.pmax(mx_l, axis)
            # smallest global index attaining the global max (ties break
            # like numpy argmax on the unsharded array)
            il = jnp.argmax(eff, axis=1).astype(jnp.int32)
            gl = jnp.where(
                (mx_l >= mx_g) & (jnp.take_along_axis(
                    eff, il[:, None], axis=1)[:, 0] >= mx_g),
                base + il, _BIG,
            )
            g = jax.lax.pmin(gl, axis)  # (B,)
            return (mind, owner_coords(g)), g

        mind0 = jnp.full((B, n_loc), 1e10, jnp.float32)
        first = jnp.zeros((B,), jnp.int32)
        (_, _), idxs = jax.lax.scan(
            step, (mind0, owner_coords(first)), None, length=npoint - 1
        )
        return jnp.concatenate([first[None], idxs], axis=0).T  # (B, npoint)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis, None),),
        out_specs=P(),
        check_vma=False,
    )(xyz)


# -------------------------------------------------------------- ball query
def ball_query_sharded(xyz: jax.Array, new_xyz: jax.Array, radius: float,
                       nsample: int, mesh: Mesh,
                       axis: str = POINT_AXIS) -> jax.Array:
    """Distributed ball query with the reference's exact semantics:
    first <= nsample in-radius points in GLOBAL index order, all slots
    first-hit padded, zeros when no hit (`ball_query_gpu.cu:9-44`).

    xyz (B, N, 3) point-sharded, new_xyz (B, M, 3) replicated ->
    (B, M, nsample) int32 global indices.
    """
    n_dev = mesh.shape[axis]
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    assert N % n_dev == 0, (N, n_dev)
    n_loc = N // n_dev
    r2 = radius * radius

    def body(xyz_loc, centers):
        di = jax.lax.axis_index(axis)
        base = (di * n_loc).astype(jnp.int32)
        x = xyz_loc.astype(jnp.float32)
        c = centers.astype(jnp.float32)
        # same MXU quadratic-form distance as `_ball_query_single` so the
        # in/out mask is bitwise identical to the single-device op
        p2 = jnp.sum(x * x, axis=-1)  # (B, n_loc)
        c2 = jnp.sum(c * c, axis=-1)  # (B, M)
        cross = jnp.einsum(
            "bmk,bnk->bmn", c, x,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d2 = c2[..., None] + p2[:, None, :] - 2.0 * cross  # (B, M, n_loc)
        mask = d2 < r2

        # first <= nsample local hits in local (== global) index order:
        # smallest nsample of (local_id | BIG where miss)
        ids = jnp.arange(n_loc, dtype=jnp.int32)
        keyed = jnp.where(mask, ids[None, None, :], _BIG)
        neg_top, _ = jax.lax.top_k(-keyed, nsample)  # (B, M, ns)
        hits_l = -neg_top  # ascending local ids, BIG-padded
        count_l = jnp.minimum(
            jnp.sum(mask, axis=-1, dtype=jnp.int32), nsample
        )  # (B, M)
        hits_g = jnp.where(hits_l < n_loc, base + hits_l, _BIG)

        # order-preserving merge across the device axis
        all_hits = jax.lax.all_gather(hits_g, axis)    # (n_dev, B, M, ns)
        all_cnt = jax.lax.all_gather(count_l, axis)    # (n_dev, B, M)
        offs = jnp.cumsum(all_cnt, axis=0) - all_cnt   # exclusive
        out = jnp.full((B, M, nsample), _BIG, jnp.int32)
        slot = jnp.arange(nsample, dtype=jnp.int32)
        for k in range(n_dev):
            # device k's hit j lands in output slot offs[k] + j; phrased
            # as a per-slot gather: output slot s reads source s - offs[k]
            # (the [offs[k], offs[k]+cnt[k]) destination ranges are
            # disjoint by construction of the exclusive prefix sum)
            src = slot[None, None, :] - offs[k][..., None]
            valid = (src >= 0) & (src < all_cnt[k][..., None])
            gathered = jnp.take_along_axis(
                all_hits[k], jnp.clip(src, 0, nsample - 1), axis=-1
            )
            out = jnp.where(valid, gathered, out)
        total = jnp.minimum(
            jnp.sum(all_cnt, axis=0), nsample
        )  # (B, M)
        first = out[..., :1]
        filled = slot[None, None, :] < total[..., None]
        out = jnp.where(filled, out, first)
        # no-hit rows -> zeros (reference zero-initialised buffer)
        return jnp.where(total[..., None] > 0, out, 0)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis, None), P()),
        out_specs=P(),
        check_vma=False,
    )(xyz, new_xyz)


# ----------------------------------------------------------------- gathers
def gather_points_sharded(features: jax.Array, idx: jax.Array, mesh: Mesh,
                          axis: str = POINT_AXIS) -> jax.Array:
    """features (B, N, C) point-sharded, idx (B, M) global -> (B, M, C),
    bit-exact (owner contributes, others psum exact zeros)."""
    n_dev = mesh.shape[axis]
    B, N, C = features.shape
    n_loc = N // n_dev

    def body(feats_loc, idx_rep):
        di = jax.lax.axis_index(axis)
        base = (di * n_loc).astype(jnp.int32)
        loc = idx_rep.astype(jnp.int32) - base
        own = (loc >= 0) & (loc < n_loc)
        safe = jnp.clip(loc, 0, n_loc - 1)
        vals = jnp.take_along_axis(feats_loc, safe[..., None], axis=1)
        vals = jnp.where(own[..., None], vals, 0)
        return jax.lax.psum(vals, axis)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis, None), P()),
        out_specs=P(),
        check_vma=False,
    )(features, idx)


def group_points_sharded(features: jax.Array, idx: jax.Array, mesh: Mesh,
                         axis: str = POINT_AXIS) -> jax.Array:
    """features (B, N, C) point-sharded, idx (B, M, S) global ->
    (B, M, S, C)."""
    B, M, S = idx.shape
    flat = gather_points_sharded(
        features, idx.reshape(B, M * S), mesh, axis
    )
    return flat.reshape(B, M, S, -1)


# -------------------------------------------------------------- full SA1
def sa1_forward_sharded(sa_module, variables, xyz: jax.Array,
                        features: jax.Array | None, mesh: Mesh,
                        axis: str = POINT_AXIS, train: bool = False):
    """Full SA1 forward with the point axis sharded; numerically matches
    ``sa_module.apply(variables, xyz, features, train)`` for a
    max-pooling `SetAbstraction` (the backbone's configuration,
    `pointnet2backbone.py:27-40`).

    The distance/selection work (everything O(N)) runs sharded; the
    grouped neighborhood tensor (O(npoint * nsample)) is assembled with
    owner-computes psums and the shared MLP runs replicated on it.
    """
    from ..models.common import SharedMLP, max_pool_points

    inds = fps_sharded(xyz, sa_module.npoint, mesh, axis)
    new_xyz = gather_points_sharded(xyz, inds, mesh, axis)
    idx = ball_query_sharded(
        xyz, new_xyz, sa_module.radius, sa_module.nsample, mesh, axis
    )
    grouped_xyz = group_points_sharded(xyz, idx, mesh, axis)
    grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
    if sa_module.normalize_xyz:
        grouped_xyz = grouped_xyz / sa_module.radius
    if features is not None:
        grouped_feats = group_points_sharded(features, idx, mesh, axis)
        grouped = (
            jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
            if sa_module.use_xyz else grouped_feats
        )
    else:
        grouped = grouped_xyz

    mlp = SharedMLP(sa_module.mlp, bn_axis_name=None, name="mlp")
    mlp_vars = {"params": variables["params"]["mlp"]}
    if "batch_stats" in variables:
        mlp_vars["batch_stats"] = variables["batch_stats"]["mlp"]
    out = mlp.apply(mlp_vars, grouped, train, None,
                    mutable=["batch_stats"] if train else False)
    if train:
        out = out[0]
    new_features = max_pool_points(out, axis=2)
    return new_xyz, new_features, inds
