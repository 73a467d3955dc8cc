"""PointNet++ backbone: 4 SA + 2 FP layers -> 1024 seeds x 256-d.

Semantic rebuild of `models/iscnet/modules/pointnet2backbone.py:10-125`
(npoint 2048/1024/512/256, radius 0.2/0.4/0.8/1.2, nsample 64/32/16/16,
mlps per reference; input features = height (1) [+ RGB (3)]).
"""

from __future__ import annotations

import flax.linen as nn

from .pointnet2 import FeaturePropagation, SetAbstraction


class Pointnet2Backbone(nn.Module):
    input_feature_dim: int = 1
    bn_axis_name: str | None = None
    fps_impl: str | None = None
    mlp_dtype: str | None = None  # "bfloat16": bf16 MXU operands + bf16
    # activation chains in the shared MLPs (f32 accumulate/BN stats; FPS,
    # ball query and all coordinates stay f32). Throughput mode — off by
    # default for reference-parity numerics.

    @nn.compact
    def __call__(self, pointcloud, train: bool, bn_momentum=None):
        """pointcloud (B, N, 3 + input_feature_dim) -> end_points dict with
        fp2 (seed) xyz/features/inds and all sa*_xyz/features (the contract
        of `pointnet2backbone.py:75-125`)."""
        xyz = pointcloud[..., 0:3]
        features = (
            pointcloud[..., 3 : 3 + self.input_feature_dim]
            if pointcloud.shape[-1] > 3
            else None
        )
        kw = dict(bn_axis_name=self.bn_axis_name,
                  compute_dtype=self.mlp_dtype)
        end_points = {}

        sa1 = SetAbstraction(
            npoint=2048, radius=0.2, nsample=64,
            mlp=[64, 64, 128], normalize_xyz=True, fps_impl=self.fps_impl,
            name="sa1", **kw,
        )
        xyz, features, inds = sa1(xyz, features, train, bn_momentum)
        end_points["sa1_inds"] = inds
        end_points["sa1_xyz"] = xyz
        end_points["sa1_features"] = features

        sa2 = SetAbstraction(
            npoint=1024, radius=0.4, nsample=32,
            mlp=[128, 128, 256], normalize_xyz=True, fps_impl=self.fps_impl,
            name="sa2", **kw,
        )
        xyz, features, inds = sa2(xyz, features, train, bn_momentum)
        end_points["sa2_inds"] = inds
        end_points["sa2_xyz"] = xyz
        end_points["sa2_features"] = features

        sa3 = SetAbstraction(
            npoint=512, radius=0.8, nsample=16,
            mlp=[128, 128, 256], normalize_xyz=True, fps_impl=self.fps_impl,
            name="sa3", **kw,
        )
        xyz, features, _ = sa3(xyz, features, train, bn_momentum)
        end_points["sa3_xyz"] = xyz
        end_points["sa3_features"] = features

        sa4 = SetAbstraction(
            npoint=256, radius=1.2, nsample=16,
            mlp=[128, 128, 256], normalize_xyz=True, fps_impl=self.fps_impl,
            name="sa4", **kw,
        )
        xyz, features, _ = sa4(xyz, features, train, bn_momentum)
        end_points["sa4_xyz"] = xyz
        end_points["sa4_features"] = features

        features = FeaturePropagation(mlp=[256, 256], name="fp1", **kw)(
            end_points["sa3_xyz"], end_points["sa4_xyz"],
            end_points["sa3_features"], end_points["sa4_features"],
            train, bn_momentum,
        )
        features = FeaturePropagation(mlp=[256, 256], name="fp2", **kw)(
            end_points["sa2_xyz"], end_points["sa3_xyz"],
            end_points["sa2_features"], features,
            train, bn_momentum,
        )
        end_points["fp2_features"] = features  # (B, 1024, 256)
        end_points["fp2_xyz"] = end_points["sa2_xyz"]
        num_seed = end_points["fp2_xyz"].shape[1]
        # seed indices into the ORIGINAL point cloud: sa2 sampled from sa1's
        # output, so compose the two index maps (the reference relies on
        # sa2_inds being arange and takes sa1_inds[:, :num_seed] —
        # `pointnet2backbone.py:122-124`; we compose explicitly, which is
        # identical when inds are FPS-ordered prefixes and correct otherwise)
        import jax.numpy as jnp

        end_points["fp2_inds"] = jnp.take_along_axis(
            end_points["sa1_inds"], end_points["sa2_inds"], axis=1
        )
        return end_points
