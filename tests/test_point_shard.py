"""Point-sharded SA1 equivalence tests (`parallel/point_shard.py`):
every sharded primitive must return EXACTLY what the single-device op
returns on the unsharded array — sharding is a layout decision, not a
semantics change. Runs on the 8-virtual-CPU-device mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rfdnet_tpu.ops import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
)
from rfdnet_tpu.parallel.point_shard import (
    ball_query_sharded,
    fps_sharded,
    gather_points_sharded,
    group_points_sharded,
    make_point_mesh,
    sa1_forward_sharded,
)

B, N = 2, 1024


@pytest.fixture(scope="module")
def mesh():
    return make_point_mesh(jax.devices()[:8])


@pytest.fixture(scope="module")
def xyz():
    rng = np.random.RandomState(11)
    pts = rng.uniform(-2, 2, size=(B, N, 3)).astype(np.float32)
    pts[0, 5] = 0.0  # exercise the ||p||^2 <= 1e-3 skip
    return jnp.asarray(pts)


def test_fps_sharded_exact(mesh, xyz):
    ref = np.asarray(furthest_point_sample(xyz, 64, impl="xla"))
    got = np.asarray(fps_sharded(xyz, 64, mesh))
    np.testing.assert_array_equal(got, ref)


def test_fps_sharded_skip_flag(mesh, xyz):
    ref = np.asarray(
        furthest_point_sample(xyz, 32, impl="xla", skip_near_origin=False)
    )
    got = np.asarray(fps_sharded(xyz, 32, mesh, skip_near_origin=False))
    np.testing.assert_array_equal(got, ref)


def test_ball_query_sharded_exact(mesh, xyz):
    inds = furthest_point_sample(xyz, 64, impl="xla")
    centers = gather_points(xyz, inds)
    for radius, ns in [(0.3, 16), (1.5, 8)]:  # few hits / overflow
        ref = np.asarray(ball_query(xyz, centers, radius, ns))
        got = np.asarray(ball_query_sharded(xyz, centers, radius, ns, mesh))
        np.testing.assert_array_equal(got, ref)


def test_ball_query_sharded_no_hit_rows(mesh, xyz):
    centers = jnp.full((B, 4, 3), 100.0, jnp.float32)  # far away
    got = np.asarray(ball_query_sharded(xyz, centers, 0.2, 8, mesh))
    np.testing.assert_array_equal(got, 0)


def test_gather_group_sharded_exact(mesh, xyz):
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(B, N, 5).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, size=(B, 32)))
    np.testing.assert_array_equal(
        np.asarray(gather_points_sharded(feats, idx, mesh)),
        np.asarray(gather_points(feats, idx)),
    )
    idx3 = jnp.asarray(rng.randint(0, N, size=(B, 16, 8)))
    np.testing.assert_array_equal(
        np.asarray(group_points_sharded(feats, idx3, mesh)),
        np.asarray(group_points(feats, idx3)),
    )


def test_sa1_forward_sharded_matches_module(mesh, xyz):
    """Full SA1: sharded FPS + ball query + owner-computes grouping +
    replicated shared MLP == the single-device SetAbstraction module
    (`pointnet2_modules.py:196` semantics, eval mode)."""
    from rfdnet_tpu.models.pointnet2 import SetAbstraction

    rng = np.random.RandomState(5)
    feats = jnp.asarray(rng.randn(B, N, 4).astype(np.float32))
    sa = SetAbstraction(
        npoint=64, radius=0.4, nsample=16, mlp=(16, 32),
        use_xyz=True, normalize_xyz=True, fps_impl="xla",
    )
    variables = sa.init(jax.random.PRNGKey(0), xyz, feats, False)
    ref_xyz, ref_feat, ref_inds = sa.apply(variables, xyz, feats, False)

    got_xyz, got_feat, got_inds = sa1_forward_sharded(
        sa, variables, xyz, feats, mesh
    )
    np.testing.assert_array_equal(np.asarray(got_inds), np.asarray(ref_inds))
    np.testing.assert_array_equal(np.asarray(got_xyz), np.asarray(ref_xyz))
    np.testing.assert_allclose(
        np.asarray(got_feat), np.asarray(ref_feat), atol=1e-5, rtol=1e-5
    )
