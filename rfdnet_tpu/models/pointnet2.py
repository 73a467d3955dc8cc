"""PointNet++ set-abstraction / feature-propagation modules, channels-last.

flax.linen equivalents of `pointnet2_ops/pointnet2_modules.py`:
- ``SetAbstraction`` == PointnetSAModuleVotes (max/avg/rbf pooling,
  normalize_xyz, optional external sampling indices) — `:148-262`,
- ``FeaturePropagation`` == PointnetFPModule — `:330-406`,
- ``GroupSTN3d`` == the 12-parameter (3x4) spatial transformer used by
  STN_Group — `:420-466` (note: its Linear layers are ZERO-initialised by
  `weights_init:407-418`, so the transform starts as identity),
- ``STNGroup`` == STN_Group (group-around-box-centers + heading
  canonicalisation + learned refinement) — `:468-537`.

All grouped tensors are (B, npoint, nsample, C) so shared MLPs are MXU
matmuls and pooling is a lane-preserving reduction over nsample.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
    interpolate_features,
    query_and_group,
)
from .common import BatchNorm, Dense, SharedMLP, max_pool_points


class SetAbstraction(nn.Module):
    """PointnetSAModuleVotes semantics."""

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    use_xyz: bool = True
    pooling: str = "max"
    sigma: float | None = None
    normalize_xyz: bool = False
    bn_axis_name: str | None = None
    fps_impl: str | None = None
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, xyz, features, train: bool, bn_momentum=None, inds=None):
        """xyz (B,N,3), features (B,N,C)|None -> (new_xyz (B,np,3),
        new_features (B,np,mlp[-1]), inds (B,np))."""
        if inds is None:
            inds = furthest_point_sample(xyz, self.npoint, impl=self.fps_impl)
        new_xyz = gather_points(xyz, inds)
        idx = ball_query(xyz, new_xyz, self.radius, self.nsample)
        grouped, grouped_xyz = query_and_group(
            xyz,
            new_xyz,
            idx,
            features,
            radius=self.radius,
            use_xyz=self.use_xyz,
            normalize_xyz=self.normalize_xyz,
        )
        if self.compute_dtype is not None:
            # narrow the grouped slab BEFORE the MLP so the (B,np,ns,C)
            # gather output — the layer's dominant HBM tensor — is written
            # once in the narrow dtype (coordinates/features at SA radii
            # are O(1); bf16 rounding is ~1e-3 relative)
            grouped = grouped.astype(self.compute_dtype)
        out = SharedMLP(self.mlp, bn_axis_name=self.bn_axis_name, name="mlp",
                        compute_dtype=self.compute_dtype)(
            grouped, train, bn_momentum
        )  # (B, np, ns, mlp[-1])
        if self.pooling == "max":
            new_features = max_pool_points(out, axis=2)
        elif self.pooling == "avg":
            new_features = jnp.mean(out, axis=2)
        elif self.pooling == "rbf":
            sigma = self.sigma if self.sigma is not None else self.radius / 2.0
            rbf = jnp.exp(
                -jnp.sum(grouped_xyz**2, axis=-1) / (sigma**2) / 2.0
            )  # (B, np, ns)
            new_features = (
                jnp.sum(out * rbf[..., None], axis=2) / self.nsample
            )
        else:
            raise ValueError(f"unknown pooling {self.pooling}")
        # hand downstream consumers (voting head, proposal features,
        # skip propagation) f32: the pooled tensor is small (B, np, C)
        return new_xyz, new_features.astype(jnp.float32), inds


class SetAbstractionMSG(nn.Module):
    """Multi-scale grouping SA (PointnetSAModuleMSG semantics,
    `pointnet2_modules.py:9-84`): one FPS sampling, several
    (radius, nsample, mlp) branches, features concatenated."""

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    bn_axis_name: str | None = None
    fps_impl: str | None = None

    @nn.compact
    def __call__(self, xyz, features, train: bool, bn_momentum=None):
        inds = furthest_point_sample(xyz, self.npoint, impl=self.fps_impl)
        new_xyz = gather_points(xyz, inds)
        outs = []
        for i, (r, ns, mlp) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            idx = ball_query(xyz, new_xyz, r, ns)
            grouped, _ = query_and_group(
                xyz, new_xyz, idx, features, radius=r, use_xyz=self.use_xyz
            )
            out = SharedMLP(
                mlp, bn_axis_name=self.bn_axis_name, name=f"mlp{i}"
            )(grouped, train, bn_momentum)
            outs.append(max_pool_points(out, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1), inds


class FeaturePropagation(nn.Module):
    """PointnetFPModule semantics: inverse-distance 3-NN interpolation of the
    coarse features, concat with the skip features, shared MLP."""

    mlp: Sequence[int]
    bn_axis_name: str | None = None
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, unknown_xyz, known_xyz, unknown_feats, known_feats,
                 train: bool, bn_momentum=None):
        interpolated = interpolate_features(unknown_xyz, known_xyz, known_feats)
        if unknown_feats is not None:
            # reference channel order: [interpolated, skip] (`:383-388`)
            new = jnp.concatenate([interpolated, unknown_feats], axis=-1)
        else:
            new = interpolated
        out = SharedMLP(self.mlp, bn_axis_name=self.bn_axis_name, name="mlp",
                        compute_dtype=self.compute_dtype)(
            new, train, bn_momentum
        )
        return out.astype(jnp.float32)


class GroupSTN3d(nn.Module):
    """12-parameter (3x4 affine) spatial transformer over grouped xyz.

    Input (B, nprop, ns, 3) -> output (B, nprop, ns, 3). The conv stack uses
    torch-default init; the FC stack is zero-initialised (reference
    `weights_init`), so initial output == identity transform.
    """

    bn_axis_name: str | None = None
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, grouped_xyz, train: bool, bn_momentum=None):
        B, P, S, _ = grouped_xyz.shape
        x = grouped_xyz.reshape(B * P, S, 3)
        h = x
        for i, f in enumerate([64, 128, 256]):
            h = Dense(f, name=f"conv{i + 1}",
                      compute_dtype=self.compute_dtype)(h)
            h = BatchNorm(axis_name=self.bn_axis_name, name=f"bn{i + 1}")(
                h, train, bn_momentum
            )
            h = nn.relu(h)
        h = max_pool_points(h, axis=1)  # (B*P, 256)
        zeros = nn.initializers.zeros
        h = h.astype(jnp.float32)  # transform head stays f32 (geometry)
        for i, f in enumerate([128, 64]):
            h = Dense(f, kernel_init=zeros, name=f"fc{i + 1}")(h)
            h = BatchNorm(axis_name=self.bn_axis_name, name=f"bn{i + 4}")(
                h, train, bn_momentum
            )
            h = nn.relu(h)
        h = Dense(12, kernel_init=zeros, name="fc3")(h)
        iden = jnp.asarray(
            [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], dtype=jnp.float32
        )
        h = (h + iden).reshape(B * P, 3, 4)
        rot = h[:, :, :3]  # (B*P, 3, 3)
        t = h[:, :, 3]  # (B*P, 3)
        # reference applies x' = A[:, :3] @ x + A[:, 3] with column vectors
        out = jnp.einsum("bij,bsj->bsi", rot, x) + t[:, None, :]
        return out.reshape(B, P, S, 3)


class STNGroup(nn.Module):
    """STN_Group: gather nsample points within radius of each proposal
    center, rotate into the box's canonical heading frame, then refine with
    the learned GroupSTN3d."""

    radius: float = 1.0
    nsample: int = 1024
    normalize_xyz: bool = True
    bn_axis_name: str | None = None
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, xyz, features, new_xyz, orientations, train: bool,
                 bn_momentum=None):
        """xyz (B,N,3), features (B,N,C), new_xyz (B,P,3) box centers,
        orientations (B,P) headings -> (grouped_xyz (B,P,ns,3),
        grouped_features (B,P,ns,C))."""
        idx = ball_query(xyz, new_xyz, self.radius, self.nsample)
        grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
        if self.normalize_xyz:
            grouped_xyz = grouped_xyz / self.radius
        grouped_features = group_points(features, idx)

        c = jnp.cos(orientations)
        s = jnp.sin(orientations)
        # R rows: [cos, sin, 0; -sin, cos, 0; 0, 0, 1]  (`:520-526`)
        x, y, z = grouped_xyz[..., 0], grouped_xyz[..., 1], grouped_xyz[..., 2]
        rx = c[..., None] * x + s[..., None] * y
        ry = -s[..., None] * x + c[..., None] * y
        grouped_xyz = jnp.stack([rx, ry, z], axis=-1)

        grouped_xyz = GroupSTN3d(bn_axis_name=self.bn_axis_name, name="stn3d",
                                 compute_dtype=self.compute_dtype)(
            grouped_xyz, train, bn_momentum
        )
        return grouped_xyz, grouped_features
