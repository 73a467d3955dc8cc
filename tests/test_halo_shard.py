"""Halo-exchange point sharding (`parallel/halo.py` — SCALING.md step 1)
equivalence tests on the 8-virtual-device CPU mesh.

The contract under test: after a slab sort, ball query resolves every
center against local+halo points only (one ppermute each way) and must
be BIT-IDENTICAL to the single-device `ops.ball_query` on the unsorted
arrays; bucketed FPS must equal exact FPS index-for-index when the
candidate budget covers the cloud, and stay within a bounded
covering-radius factor below that.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rfdnet_tpu.ops.ball_query import ball_query
from rfdnet_tpu.ops.fps import furthest_point_sample
from rfdnet_tpu.parallel.halo import (
    ball_query_halo,
    fps_bucketed,
    required_halo,
    slab_sort,
)
from rfdnet_tpu.parallel.point_shard import make_point_mesh

B, N = 2, 2048
N_DEV = 8
RADIUS = 0.08
NSAMPLE = 16


@pytest.fixture(scope="module")
def mesh():
    return make_point_mesh(jax.devices()[:N_DEV])


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.RandomState(3)
    # away from the origin (FPS skip-near-origin quirk) and x-spread so
    # equal-count slabs are wider than RADIUS
    xyz = rng.uniform(0.2, 1.8, (B, N, 3)).astype(np.float32)
    xyz_j = jnp.asarray(xyz)
    xyz_sorted, orig_ids = slab_sort(xyz_j)
    return xyz_j, xyz_sorted, orig_ids


def test_required_halo_contract(cloud):
    _, xyz_sorted, _ = cloud
    H = required_halo(np.asarray(xyz_sorted), RADIUS, N_DEV)
    # uniform density: ~N * r / extent points per boundary strip
    assert 0 < H < N // N_DEV


def test_ball_query_halo_bitwise_matches_single_device(cloud, mesh):
    xyz, xyz_sorted, orig_ids = cloud
    H = required_halo(np.asarray(xyz_sorted), RADIUS, N_DEV)

    # centers: a spread of sorted indices across all slabs (incl. slab
    # edges, where the halo matters most)
    M = 64
    cidx = np.linspace(0, N - 1, M).astype(np.int32)
    cidx = np.broadcast_to(cidx, (B, M)).copy()
    nl = N // N_DEV
    cidx[:, :N_DEV] = [k * nl for k in range(N_DEV)]        # left edges
    cidx[:, N_DEV:2 * N_DEV] = [
        (k + 1) * nl - 1 for k in range(N_DEV)
    ]                                                        # right edges
    cidx = jnp.asarray(cidx)

    out = ball_query_halo(
        xyz_sorted, orig_ids, cidx, RADIUS, NSAMPLE, H, mesh
    )

    centers = jnp.take_along_axis(xyz_sorted, cidx[..., None], axis=1)
    ref = ball_query(xyz, centers, RADIUS, NSAMPLE)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def _covering_radius(xyz, idx):
    sel = np.take_along_axis(
        np.asarray(xyz), np.asarray(idx)[..., None], axis=1
    )
    d = np.linalg.norm(
        np.asarray(xyz)[:, :, None, :] - sel[:, None, :, :], axis=-1
    )
    return d.min(axis=2).max(axis=1)  # (B,)


def test_fps_bucketed_exact_when_budget_covers_cloud(cloud, mesh):
    _, xyz_sorted, _ = cloud
    npoint = 256
    # k*npoint/n_dev == n_loc -> candidates are the whole cloud
    k = N // npoint
    out = fps_bucketed(xyz_sorted, npoint, mesh, k=k)
    ref = furthest_point_sample(xyz_sorted, npoint, impl="xla")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fps_bucketed_quality_at_small_k(cloud, mesh):
    _, xyz_sorted, _ = cloud
    npoint = 256
    out = fps_bucketed(xyz_sorted, npoint, mesh, k=4)
    ref = furthest_point_sample(xyz_sorted, npoint, impl="xla")
    # all selected indices valid and unique per scene
    o = np.asarray(out)
    assert ((o >= 0) & (o < N)).all()
    for b in range(B):
        assert len(np.unique(o[b])) == npoint
    # covering radius within 1.3x of exact FPS (uniform data)
    r_b = _covering_radius(xyz_sorted, out)
    r_e = _covering_radius(xyz_sorted, ref)
    assert (r_b <= 1.3 * r_e).all(), (r_b, r_e)
