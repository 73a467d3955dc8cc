"""Skip propagation: back-propagate box proposal features to scene points.

Semantic rebuild of `models/iscnet/modules/skip_propagation.py:13-129`:
group 1024 scene points within r=1.0 of each selected proposal center
(STN_Group), rotate to the box's canonical heading, refine with a learned
3x4 STN, predict a per-point instance mask with PointSeg (supervised by GT
instance labels -> mask loss), gate [xyz, height-feature, box feature] by
the predicted mask, and encode with ResnetPointnet to c_dim=512.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import ResnetPointnet
from .pointnet2 import STNGroup
from .pointseg import PointSeg, pointseg_loss


class SkipPropagation(nn.Module):
    c_dim: int = 512
    hidden_dim: int = 512
    input_feature_dim: int = 1  # height (+3 if use_color_completion)
    bn_axis_name: str | None = None
    mlp_dtype: str | None = None  # "bfloat16": bf16 operand/activation
    # chains in the STN/PointSeg/ResnetPointnet MLPs (geometry heads,
    # logits, BN stats stay f32) — train-throughput mode

    def setup(self):
        self.stn = STNGroup(
            radius=1.0, nsample=1024, normalize_xyz=True,
            bn_axis_name=self.bn_axis_name, compute_dtype=self.mlp_dtype,
        )
        self.encoder = ResnetPointnet(
            c_dim=self.c_dim, hidden_dim=self.hidden_dim,
            compute_dtype=self.mlp_dtype,
        )
        self.point_seg = PointSeg(
            num_class=2, channel=self.input_feature_dim + 3,
            bn_axis_name=self.bn_axis_name, compute_dtype=self.mlp_dtype,
        )

    def _run(self, box_xyz, box_orientations, box_feature, input_point_cloud,
             point_instance_labels, proposal_instance_labels, train,
             bn_momentum, slot_mask=None):
        """Shared forward. Returns (features (B, P, c_dim), mask_loss or None).

        box_xyz (B, P, 3), box_orientations (B, P),
        box_feature (B, P, 128), input_point_cloud (B, N, 3+F),
        point_instance_labels (B, N) or None.

        slot_mask: optional (B, P) validity — padded proposal slots are
        excluded from the mask loss (the reference gathers only valid
        proposals dynamically, `network.py:97-128`; the TPU build keeps
        static shapes and masks instead).
        """
        xyz = input_point_cloud[..., 0:3]
        feat = input_point_cloud[..., 3 : 3 + self.input_feature_dim]
        if point_instance_labels is not None:
            feat = jnp.concatenate(
                [feat, point_instance_labels[..., None]], axis=-1
            )
        else:
            feat = jnp.concatenate([feat, jnp.zeros_like(feat[..., :1])], axis=-1)

        grouped_xyz, grouped_features = self.stn(
            xyz, feat, box_xyz, box_orientations, train, bn_momentum
        )  # (B, P, ns, 3), (B, P, ns, F+1)
        B, P, S, _ = grouped_features.shape

        mask_loss = None
        if point_instance_labels is not None:
            instance_labels = grouped_features[..., 1]  # (B, P, ns)
            instance_point_masks = (
                instance_labels == proposal_instance_labels[..., None]
            ).reshape(B * P * S)

        height = grouped_features[..., 0:1]
        input_features = jnp.concatenate([grouped_xyz, height], axis=-1)
        input_features = input_features.reshape(B * P, S, -1)

        seg_pred, trans_feat = self.point_seg(
            input_features, train, bn_momentum
        )  # (B*P, S, 2)
        seg_flat = seg_pred.reshape(B * P * S, 2)
        if point_instance_labels is not None:
            if slot_mask is None:
                mask_loss = pointseg_loss(
                    seg_flat, instance_point_masks.astype(jnp.int32),
                    trans_feat,
                )
            else:
                mask_loss = pointseg_loss(
                    seg_flat, instance_point_masks.astype(jnp.int32),
                    trans_feat,
                    sample_weights=jnp.repeat(
                        slot_mask.reshape(B * P).astype(jnp.float32), S
                    ),
                    trans_weights=slot_mask.reshape(B * P).astype(
                        jnp.float32
                    ),
                )

        box_feat = jnp.broadcast_to(
            box_feature.reshape(B * P, 1, -1),
            (B * P, S, box_feature.shape[-1]),
        )
        input_features = jnp.concatenate([input_features, box_feat], axis=-1)

        point_seg_mask = jnp.argmax(seg_flat, axis=1).reshape(B * P, S, 1)
        input_features = input_features * point_seg_mask.astype(jnp.float32)

        encoded = self.encoder(input_features)  # (B*P, c_dim)
        return encoded.reshape(B, P, self.c_dim), mask_loss

    def __call__(self, box_xyz, box_orientations, box_feature,
                 input_point_cloud, point_instance_labels,
                 proposal_instance_labels, train: bool, bn_momentum=None,
                 slot_mask=None):
        return self._run(
            box_xyz, box_orientations, box_feature, input_point_cloud,
            point_instance_labels, proposal_instance_labels, train,
            bn_momentum, slot_mask=slot_mask,
        )

    def generate(self, box_xyz, box_orientations, box_feature,
                 input_point_cloud, train: bool = False, bn_momentum=None):
        feats, _ = self._run(
            box_xyz, box_orientations, box_feature, input_point_cloud,
            None, None, train, bn_momentum,
        )
        return feats
