"""Spatially-sorted point sharding with halo exchange — SCALING.md step 1.

`point_shard.py` proves the exact collective algorithms (distributed FPS,
order-preserving ball-query merge) but its ball query all-gathers every
shard's candidate hits: O(nsample * n_dev) per center crosses ICI. This
module adds the production layout that makes neighbor communication
O(halo) instead:

1. ``slab_sort`` orders each scene's points by x once (host/device, part
   of data prep); equal-COUNT contiguous blocks of the sorted array are
   the shards, so load is balanced and a shard's points are spatially
   coherent.
2. ``required_halo`` (host) validates the geometric contract for a given
   radius — every slab wider than ``radius`` (so an in-radius ball never
   reaches past the adjacent slab) — and returns the halo width H: the
   max number of points within ``radius`` of any slab boundary.
3. ``ball_query_halo``: one ``ppermute`` each way trades fixed-width
   H-point boundary strips between slab neighbors; every center is then
   resolved ENTIRELY locally against local+halo points. Results are
   bit-identical to `ops.ball_query` on the unsorted arrays: the
   candidate pool (all in-radius points) is complete by the halo
   contract, per-pair distances are the same mul/add sequence regardless
   of layout, and ranking by ORIGINAL point index reproduces the
   reference's first-<=nsample-in-index-order + first-hit-padding
   semantics (`ball_query_gpu.cu:9-44`).
4. ``fps_bucketed``: the FlashFPS/FuseFPS-style two-level sampler from
   the SCALING.md plan — each shard FPS-samples its slab to
   k*npoint/n_dev candidates with the unchanged single-device kernel,
   ONE all-gather moves the ~k*npoint candidate coordinates, and exact
   FPS over the candidates picks the final npoint. When
   k*npoint/n_dev >= n_loc the candidate set is the whole cloud in
   sorted order and the result equals exact FPS index-for-index (the
   equivalence test's anchor); smaller k trades a bounded covering-
   radius increase for n_dev-way parallel selection.

Scope: same honest prototype contract as point_shard.py — centers and
MLP parameters replicated; only the O(N) distance/selection work is
sharded. Composable with `sa1_forward_sharded` by swapping the two ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.fps import furthest_point_sample

POINT_AXIS = "points"

_BIG = jnp.int32(2**30)


def slab_sort(xyz: jax.Array):
    """Sort each scene's points by x. Returns (xyz_sorted, orig_ids)
    with orig_ids (B, N) int32 mapping sorted row -> original index."""
    order = jnp.argsort(xyz[..., 0], axis=1).astype(jnp.int32)
    return jnp.take_along_axis(xyz, order[..., None], axis=1), order


def required_halo(xyz_sorted: np.ndarray, radius: float, n_dev: int) -> int:
    """Host-side validation of the halo contract for this scene batch.

    Asserts every interior slab's x-extent exceeds ``radius`` (so a ball
    centered in slab k cannot reach past slabs k+-1) and returns H: the
    max count of points within ``radius`` of a slab boundary on either
    side (the fixed strip width ``ball_query_halo`` must exchange).
    """
    xs = np.asarray(xyz_sorted[..., 0])
    B, N = xs.shape
    n_loc = N // n_dev
    H = 1
    for b in range(B):
        for k in range(1, n_dev):
            bound = 0.5 * (xs[b, k * n_loc - 1] + xs[b, k * n_loc])
            left = int((xs[b, : k * n_loc] > bound - radius).sum())
            right = int((xs[b, k * n_loc:] < bound + radius).sum())
            H = max(H, left, right)
        for k in range(1, n_dev - 1):  # interior slab widths
            width = xs[b, (k + 1) * n_loc - 1] - xs[b, k * n_loc]
            assert width > radius, (
                f"slab {k} of scene {b} is {width:.4f} wide < radius "
                f"{radius}: in-radius points can span beyond adjacent "
                f"slabs; use fewer shards or the all-gather ball query"
            )
    assert H <= n_loc, f"halo {H} exceeds slab size {n_loc}"
    return H


def _neighbor_halos(block, axis: str, n_dev: int, H: int):
    """One ppermute each way: (from_left, from_right) fixed-width strips.
    Edge devices receive zeros (callers mask with `_halo_valid`)."""
    from_left = jax.lax.ppermute(
        block[:, -H:], axis, [(i, i + 1) for i in range(n_dev - 1)]
    )
    from_right = jax.lax.ppermute(
        block[:, :H], axis, [(i + 1, i) for i in range(n_dev - 1)]
    )
    return from_left, from_right


def ball_query_halo(xyz_sorted: jax.Array, orig_ids: jax.Array,
                    center_idx: jax.Array, radius: float, nsample: int,
                    H: int, mesh: Mesh,
                    axis: str = POINT_AXIS) -> jax.Array:
    """Halo-local distributed ball query.

    xyz_sorted (B, N, 3) point-sharded (slab_sort order), orig_ids
    (B, N) its original indices (sharded alongside), center_idx (B, M)
    replicated GLOBAL SORTED indices of the query centers (e.g. FPS
    output), H the validated halo width -> (B, M, nsample) int32
    ORIGINAL indices, == `ops.ball_query(xyz_orig, centers)` on the
    unsorted arrays.
    """
    n_dev = mesh.shape[axis]
    B, N, _ = xyz_sorted.shape
    M = center_idx.shape[1]
    n_loc = N // n_dev
    r2 = radius * radius

    def body(xyz_loc, ids_loc, cidx):
        di = jax.lax.axis_index(axis)
        base = (di * n_loc).astype(jnp.int32)
        x = xyz_loc.astype(jnp.float32)

        hl, hr = _neighbor_halos(x, axis, n_dev, H)
        il, ir = _neighbor_halos(ids_loc.astype(jnp.int32), axis, n_dev, H)
        cand = jnp.concatenate([hl, x, hr], axis=1)  # (B, n_loc+2H, 3)
        cand_ids = jnp.concatenate(
            [il, ids_loc.astype(jnp.int32), ir], axis=1
        )
        has_l = (di > 0)
        has_r = (di < n_dev - 1)
        cand_valid = jnp.concatenate([
            jnp.full((H,), has_l), jnp.ones((n_loc,), bool),
            jnp.full((H,), has_r),
        ])  # (n_loc+2H,)

        # my centers: global sorted index in [base, base+n_loc)
        loc = cidx.astype(jnp.int32) - base
        own = (loc >= 0) & (loc < n_loc)  # (B, M)
        safe = jnp.clip(loc, 0, n_loc - 1)
        c = jnp.take_along_axis(x, safe[..., None], axis=1)  # (B, M, 3)

        # same quadratic-form MXU distance as ops.ball_query, so the
        # in/out decision per (center, point) pair is bitwise identical
        p2 = jnp.sum(cand * cand, axis=-1)
        c2 = jnp.sum(c * c, axis=-1)
        cross = jnp.einsum(
            "bmk,bnk->bmn", c, cand,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d2 = c2[..., None] + p2[:, None, :] - 2.0 * cross
        mask = (d2 < r2) & cand_valid[None, None, :] & own[..., None]

        # first <= nsample by ORIGINAL index: smallest nsample orig ids
        keyed = jnp.where(mask, cand_ids[:, None, :], _BIG)
        neg_top, _ = jax.lax.top_k(-keyed, nsample)
        hits = -neg_top  # ascending orig ids, BIG-padded (B, M, ns)
        count = jnp.minimum(
            jnp.sum(mask, axis=-1, dtype=jnp.int32), nsample
        )
        slot = jnp.arange(nsample, dtype=jnp.int32)
        filled = slot[None, None, :] < count[..., None]
        out = jnp.where(filled, hits, hits[..., :1])
        out = jnp.where(count[..., None] > 0, out, 0)
        out = jnp.where(own[..., None], out, 0)
        return jax.lax.psum(out, axis)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis), P()),
        out_specs=P(),
        check_vma=False,
    )(xyz_sorted, orig_ids, center_idx)


def fps_bucketed(xyz_sorted: jax.Array, npoint: int, mesh: Mesh,
                 k: int = 4, axis: str = POINT_AXIS,
                 skip_near_origin: bool = True) -> jax.Array:
    """Two-level distributed FPS over slab-sorted points.

    Each shard runs the unchanged single-device FPS kernel over its slab
    to k*npoint/n_dev candidates; one all-gather of the candidate
    coordinates; exact FPS over the gathered candidates selects the
    final npoint. Returns (B, npoint) GLOBAL SORTED indices.

    With k*npoint/n_dev >= n_loc this is EXACTLY exact FPS (candidates =
    the full sorted cloud, in order). Below that it is the bucketed
    approximation from the FlashFPS/FuseFPS literature; covering-radius
    quality is asserted against the exact oracle in
    tests/test_halo_shard.py.
    """
    n_dev = mesh.shape[axis]
    B, N, _ = xyz_sorted.shape
    n_loc = N // n_dev
    local_m = min(max(k * npoint // n_dev, npoint // n_dev + 1), n_loc)

    def body(xyz_loc):
        di = jax.lax.axis_index(axis)
        base = (di * n_loc).astype(jnp.int32)
        li = furthest_point_sample(
            xyz_loc, local_m, skip_near_origin=skip_near_origin,
            impl="xla",
        )  # (B, local_m) local indices
        cand = jnp.take_along_axis(xyz_loc, li[..., None], axis=1)
        gids = base + li.astype(jnp.int32)
        all_cand = jax.lax.all_gather(cand, axis)   # (n_dev, B, lm, 3)
        all_gids = jax.lax.all_gather(gids, axis)   # (n_dev, B, lm)
        cat = jnp.moveaxis(all_cand, 0, 1).reshape(B, n_dev * local_m, 3)
        gid = jnp.moveaxis(all_gids, 0, 1).reshape(B, n_dev * local_m)
        sel = furthest_point_sample(
            cat, npoint, skip_near_origin=skip_near_origin, impl="xla"
        )
        return jnp.take_along_axis(gid, sel, axis=1)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis, None),),
        out_specs=P(),
        check_vma=False,
    )(xyz_sorted)
