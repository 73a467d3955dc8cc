"""Proposal module: vote aggregation + box parameter head.

Semantic rebuild of `models/iscnet/modules/proposal_module.py` —
vote clustering via a SA layer (npoint=num_proposal, r=0.3, ns=16,
mlp [128,128,128]) with the `seed_fps`/`vote_fps`/`random` sampling
strategies, then a Conv1d head 128->128->(2+3+NH*2+NS*4+NC), decoded by
``decode_scores`` into the end_points contract.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import furthest_point_sample
from .common import BatchNorm, Dense
from .pointnet2 import SetAbstraction


def decode_scores(net, aggregated_vote_xyz, num_heading_bin, num_size_cluster):
    """Split the head output (B, K, 69) into the end_points fields
    (`proposal_module.py:13-39`)."""
    B, K, _ = net.shape
    nh, ns = num_heading_bin, num_size_cluster
    out = {}
    out["objectness_scores"] = net[..., 0:2]
    out["center"] = aggregated_vote_xyz + net[..., 2:5]
    out["heading_scores"] = net[..., 5 : 5 + nh]
    out["heading_residuals_normalized"] = net[..., 5 + nh : 5 + nh * 2]
    out["size_scores"] = net[..., 5 + nh * 2 : 5 + nh * 2 + ns]
    out["size_residuals_normalized"] = net[
        ..., 5 + nh * 2 + ns : 5 + nh * 2 + ns * 4
    ].reshape(B, K, ns, 3)
    out["sem_cls_scores"] = net[..., 5 + nh * 2 + ns * 4 :]
    return out


class ProposalModule(nn.Module):
    num_class: int = 8
    num_heading_bin: int = 12
    num_size_cluster: int = 8
    num_proposal: int = 256
    sampling: str = "seed_fps"
    seed_feat_dim: int = 256
    bn_axis_name: str | None = None
    fps_impl: str | None = None
    mlp_dtype: str | None = None

    @nn.compact
    def __call__(self, xyz, features, end_points, train: bool, bn_momentum=None,
                 rng=None):
        """xyz (B, num_vote, 3) votes, features (B, num_vote, C) ->
        (end_points updates, proposal_features (B, K, 128))."""
        agg = SetAbstraction(
            npoint=self.num_proposal, radius=0.3, nsample=16,
            mlp=[128, 128, 128], normalize_xyz=True,
            bn_axis_name=self.bn_axis_name, fps_impl=self.fps_impl,
            compute_dtype=self.mlp_dtype,
            name="vote_aggregation",
        )
        if self.sampling == "vote_fps":
            new_xyz, new_features, sample_inds = agg(xyz, features, train, bn_momentum)
        elif self.sampling == "seed_fps":
            sample_inds = furthest_point_sample(
                end_points["seed_xyz"], self.num_proposal, impl=self.fps_impl
            )
            new_xyz, new_features, _ = agg(
                xyz, features, train, bn_momentum, inds=sample_inds
            )
        elif self.sampling == "random":
            if rng is None:
                raise ValueError("random sampling requires an rng key")
            num_seed = end_points["seed_xyz"].shape[1]
            B = xyz.shape[0]
            sample_inds = jax.random.randint(
                rng, (B, self.num_proposal), 0, num_seed, dtype=jnp.int32
            )
            new_xyz, new_features, _ = agg(
                xyz, features, train, bn_momentum, inds=sample_inds
            )
        else:
            raise ValueError(f"Unknown sampling strategy: {self.sampling}")

        out = dict(end_points)
        out["aggregated_vote_xyz"] = new_xyz
        out["aggregated_vote_inds"] = sample_inds

        net = new_features
        for i in range(2):
            net = Dense(128, name=f"conv{i + 1}")(net)
            net = BatchNorm(axis_name=self.bn_axis_name, name=f"bn{i + 1}")(
                net, train, bn_momentum
            )
            net = nn.relu(net)
        head = 2 + 3 + self.num_heading_bin * 2 + self.num_size_cluster * 4 + self.num_class
        net = Dense(head, name="conv3")(net)
        out.update(
            decode_scores(net, new_xyz, self.num_heading_bin, self.num_size_cluster)
        )
        return out, new_features
