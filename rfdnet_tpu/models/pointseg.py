"""PointNet instance segmentation head (per-point mask prediction).

Semantic rebuild of `models/iscnet/modules/pointseg.py:7-177`: input STN3d
(3x3), feature STNkd (64x64), seg head 1088->512->256->128->2 with
log-softmax; loss = NLL + 0.001 * orthogonality regularizer.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .common import BatchNorm, Dense, max_pool_points


class _STN(nn.Module):
    """Shared trunk of STN3d / STNkd: per-point MLP 64-128-1024, max-pool,
    FC 512-256-k*k, + identity."""

    k: int
    bn_axis_name: str | None = None
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool, bn_momentum=None):
        """x (B, N, k) -> (B, k, k) transform."""
        B = x.shape[0]
        h = x
        for i, f in enumerate([64, 128, 1024]):
            h = Dense(f, name=f"conv{i + 1}",
                      compute_dtype=self.compute_dtype)(h)
            h = BatchNorm(axis_name=self.bn_axis_name, name=f"bn{i + 1}")(
                h, train, bn_momentum
            )
            h = nn.relu(h)
        h = max_pool_points(h, axis=1)
        for i, f in enumerate([512, 256]):
            h = Dense(f, name=f"fc{i + 1}",
                      compute_dtype=self.compute_dtype)(h)
            h = BatchNorm(axis_name=self.bn_axis_name, name=f"bn{i + 4}")(
                h, train, bn_momentum
            )
            h = nn.relu(h)
        # the transform head stays f32 (it produces a geometry matrix)
        h = Dense(self.k * self.k, name="fc3")(h.astype(jnp.float32))
        iden = jnp.eye(self.k, dtype=jnp.float32).reshape(-1)
        return (h + iden).reshape(B, self.k, self.k)


class PointNetEncoder(nn.Module):
    """`pointseg.py:88-132` with global_feat=False, feature_transform=True."""

    channel: int = 4
    bn_axis_name: str | None = None
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool, bn_momentum=None):
        """x (B, N, channel) -> (per-point features (B, N, 1088), trans_feat
        (B, 64, 64))."""
        # STN3d consumes the FULL channel input but outputs a 3x3 transform
        # applied to xyz only (`pointseg.py:89-110`)
        trans = _STN(k=3, bn_axis_name=self.bn_axis_name, name="stn",
                     compute_dtype=self.compute_dtype)(
            x, train, bn_momentum
        )
        xyz = jnp.einsum("bnc,bcd->bnd", x[..., :3], trans)
        if self.channel > 3:
            x = jnp.concatenate([xyz, x[..., 3:]], axis=-1)
        else:
            x = xyz
        h = Dense(64, name="conv1", compute_dtype=self.compute_dtype)(x)
        h = BatchNorm(axis_name=self.bn_axis_name, name="bn1")(h, train, bn_momentum)
        h = nn.relu(h)
        trans_feat = _STN(k=64, bn_axis_name=self.bn_axis_name, name="fstn",
                          compute_dtype=self.compute_dtype)(
            h, train, bn_momentum
        )
        # the 64x64 transform product accumulates in f32 (trans_feat is
        # f32 by construction; h may be bf16)
        h = jnp.einsum("bnc,bcd->bnd", h.astype(jnp.float32), trans_feat)
        if self.compute_dtype is not None:
            h = h.astype(self.compute_dtype)
        pointfeat = h
        h = Dense(128, name="conv2", compute_dtype=self.compute_dtype)(h)
        h = BatchNorm(axis_name=self.bn_axis_name, name="bn2")(h, train, bn_momentum)
        h = nn.relu(h)
        h = Dense(1024, name="conv3", compute_dtype=self.compute_dtype)(h)
        h = BatchNorm(axis_name=self.bn_axis_name, name="bn3")(h, train, bn_momentum)
        glob = max_pool_points(h, axis=1, keepdims=True)  # (B, 1, 1024)
        glob = jnp.broadcast_to(glob, (h.shape[0], h.shape[1], 1024))
        return jnp.concatenate([glob, pointfeat], axis=-1), trans_feat


class PointSeg(nn.Module):
    """Per-point 2-class segmentation with log-softmax output."""

    num_class: int = 2
    channel: int = 4
    bn_axis_name: str | None = None
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool, bn_momentum=None):
        """x (B, N, channel) -> (log_probs (B, N, num_class), trans_feat)."""
        h, trans_feat = PointNetEncoder(
            channel=self.channel, bn_axis_name=self.bn_axis_name, name="feat",
            compute_dtype=self.compute_dtype,
        )(x, train, bn_momentum)
        for i, f in enumerate([512, 256, 128]):
            h = Dense(f, name=f"conv{i + 1}",
                      compute_dtype=self.compute_dtype)(h)
            h = BatchNorm(axis_name=self.bn_axis_name, name=f"bn{i + 1}")(
                h, train, bn_momentum
            )
            h = nn.relu(h)
        # class logits stay f32 (log-softmax feeds the NLL mask loss)
        h = Dense(self.num_class, name="conv4")(h.astype(jnp.float32))
        return nn.log_softmax(h, axis=-1), trans_feat


def feature_transform_regularizer(trans, weights=None):
    """||A A^T - I|| orthogonality penalty (`pointseg.py:134-141`).

    NOTE: replicates the reference literally, including its operator-order
    quirk: torch computes ``bmm(A, A^T - I)`` (the -I applies BEFORE the
    product), then a frobenius norm per batch, then the mean.

    weights: optional (B,) — masked mean over the batch (static-shape
    padding slots excluded, matching the reference's dynamic gather).
    """
    d = trans.shape[1]
    eye = jnp.eye(d, dtype=trans.dtype)
    # torch: bmm(trans, trans.transpose(2,1) - I)
    prod = jnp.einsum("bij,bjk->bik", trans, jnp.swapaxes(trans, 1, 2) - eye)
    norms = jnp.linalg.norm(prod, axis=(1, 2))
    if weights is None:
        return jnp.mean(norms)
    return jnp.sum(norms * weights) / jnp.maximum(jnp.sum(weights), 1e-6)


def pointseg_loss(log_probs, target, trans_feat, mat_diff_loss_scale=0.001,
                  sample_weights=None, trans_weights=None):
    """NLL + orthogonality regularizer (`pointseg.py:170-177` get_loss).

    log_probs (M, C), target (M,) int -> scalar.
    sample_weights (M,) / trans_weights (B,): masked means for padded
    proposal slots (see SkipPropagation.slot_mask).
    """
    per = -jnp.take_along_axis(
        log_probs, target[:, None].astype(jnp.int32), axis=1
    )[:, 0]
    if sample_weights is None:
        nll = jnp.mean(per)
    else:
        nll = jnp.sum(per * sample_weights) / jnp.maximum(
            jnp.sum(sample_weights), 1e-6
        )
    reg = feature_transform_regularizer(trans_feat, trans_weights)
    return nll + reg * mat_diff_loss_scale
