"""Hough voting module — per-seed MLP predicting xyz offsets + residual
features. Semantic rebuild of `models/iscnet/modules/vote_module.py:11-61`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .common import BatchNorm, Dense


class VotingModule(nn.Module):
    vote_factor: int = 1
    in_dim: int = 256
    bn_axis_name: str | None = None
    mlp_dtype: str | None = None

    @nn.compact
    def __call__(self, seed_xyz, seed_features, train: bool, bn_momentum=None):
        """seed_xyz (B, num_seed, 3), seed_features (B, num_seed, C) ->
        (vote_xyz (B, num_seed*vote_factor, 3), vote_features (B, nv, C))."""
        B, num_seed, _ = seed_xyz.shape
        out_dim = self.in_dim
        net = seed_features
        for i in range(2):
            net = Dense(self.in_dim, name=f"conv{i + 1}",
                        compute_dtype=self.mlp_dtype)(net)
            net = BatchNorm(axis_name=self.bn_axis_name, name=f"bn{i + 1}")(
                net, train, bn_momentum
            )
            net = nn.relu(net)
        # the offset/residual head stays f32 (its outputs are coordinates
        # added to seed xyz — bf16 offsets would quantize vote geometry)
        net = Dense((3 + out_dim) * self.vote_factor, name="conv3")(
            net.astype(jnp.float32)
        )
        net = net.reshape(B, num_seed, self.vote_factor, 3 + out_dim)
        offset = net[..., 0:3]
        vote_xyz = (seed_xyz[:, :, None, :] + offset).reshape(
            B, num_seed * self.vote_factor, 3
        )
        residual = net[..., 3:]
        vote_features = (seed_features[:, :, None, :] + residual).reshape(
            B, num_seed * self.vote_factor, out_dim
        )
        return vote_xyz, vote_features
