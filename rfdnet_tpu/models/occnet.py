"""Occupancy network (ONet): conditional implicit decoder + VAE latent.

Semantic rebuild of `models/iscnet/modules/occupancy_net.py:11-189`:
- ``compute_loss`` = KL(q(z|p,occ,c) || N(0,I)) + per-point BCE summed over
  points, averaged over the object batch (`occupancy_net.py:59-109`),
- ``decode`` returns logits,
- optional 16^3 voxel export for visualization / voxel-IoU stats.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import DecoderCBatchNorm, EncoderLatent


def make_3d_grid(bb_min, bb_max, shape):
    """Dense grid of shape[0]*shape[1]*shape[2] points (matches
    `external/common.py` make_3d_grid ordering: x slowest, z fastest)."""
    axes = [
        jnp.linspace(bb_min[i], bb_max[i], shape[i]) for i in range(3)
    ]
    gx, gy, gz = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=-1)


class ONet(nn.Module):
    z_dim: int = 32
    c_dim: int = 512
    threshold: float = 0.5
    use_cls_for_completion: bool = False
    num_class: int = 8
    bn_axis_name: str | None = None
    decoder_dtype: str | None = None  # "bfloat16" for MXU fast path

    def setup(self):
        if self.z_dim != 0:
            self.encoder_latent = EncoderLatent(z_dim=self.z_dim)
        self.decoder = DecoderCBatchNorm(
            z_dim=self.z_dim, bn_axis_name=self.bn_axis_name,
            compute_dtype=self.decoder_dtype,
        )

    def _cond(self, features, cls_codes):
        if self.use_cls_for_completion:
            features = jnp.concatenate(
                [features, cls_codes.astype(jnp.float32)], axis=-1
            )
        return features

    def decode(self, p, z, features, train: bool = False, bn_momentum=None):
        """p (Nb, T, 3), z (Nb, z_dim)|None, features (Nb, c_dim) -> logits."""
        return self.decoder(p, z, features, train, bn_momentum)

    def decode_fused(self, p, z, c):
        """Eval-mode decode through the single fused Pallas kernel
        (`ops/cbn_decoder.py`): the 11 CBNs fold into per-proposal affine
        tables and the whole 5-block chain runs VMEM-resident — 2.3x the
        unfused f32 decode at protocol scale (BASELINE.md). bf16-operand
        matmuls with f32 accumulation, i.e. the `decoder_dtype="bfloat16"`
        numerics. Interpreted (slow, exact-lowering) off-TPU."""
        import jax as _jax

        from ..ops.cbn_decoder import fold_cbn_constants, fused_cbn_decode

        dv = self.decoder.variables
        dp, st = dv["params"], dv["batch_stats"]
        h0 = p @ dp["fc_p"]["kernel"] + dp["fc_p"]["bias"]
        if self.z_dim != 0:
            h0 = h0 + (z @ dp["fc_z"]["kernel"]
                       + dp["fc_z"]["bias"])[:, None, :]
        scales, shifts = fold_cbn_constants(dp, st, c)
        stack_k = lambda f: jnp.stack(
            [dp[f"block{i}"][f]["kernel"] for i in range(5)]
        )
        stack_b = lambda f: jnp.stack(
            [dp[f"block{i}"][f]["bias"] for i in range(5)]
        )
        return fused_cbn_decode(
            h0, scales, shifts,
            stack_k("fc_0"), stack_b("fc_0"),
            stack_k("fc_1"), stack_b("fc_1"),
            dp["fc_out"]["kernel"][:, 0], dp["fc_out"]["bias"][0],
            interpret=_jax.default_backend() != "tpu",
        )

    def infer_z(self, p, occ, c):
        if self.z_dim != 0:
            return self.encoder_latent(p, occ, c)
        B = p.shape[0]
        return jnp.zeros((B, 0)), jnp.zeros((B, 0))

    def compute_loss(
        self,
        input_features,
        input_points,
        input_points_occ,
        cls_codes,
        rng,
        train: bool,
        bn_momentum=None,
        export_shape: bool = False,
        valid_mask=None,
    ):
        """Per the reference: loss = mean_over_objects(KL) +
        mean_over_objects(sum_over_points BCE).

        Args:
          input_features: (Nb, c_dim) conditioning codes.
          input_points: (Nb, T, 3); input_points_occ: (Nb, T) in {0,1}.
          cls_codes: (Nb, num_class) one-hot.
          rng: PRNG key for the z posterior sample.
          valid_mask: optional (Nb,) weighting — the TPU build keeps padded
            proposal slots in the batch for static shapes and masks them out
            here (the reference dynamically gathers valid proposals).

        Returns: (loss scalar, voxels_out (Nb, 16, 16, 16) bool | None)
        """
        c = self._cond(input_features, cls_codes)
        Nb = c.shape[0]
        if self.z_dim > 0:
            mean_z, logstd_z = self.infer_z(input_points, input_points_occ, c)
            # clamp before exp: with a small completion weight the KL term
            # is too weak to contain logstd drift, and exp overflow poisons
            # the JOINT loss with inf/NaN (0 * inf == NaN kills detection
            # gradients too). Invisible in the normal regime (|logstd|<~5).
            logstd_z = jnp.clip(logstd_z, -20.0, 20.0)
            std = jnp.exp(logstd_z)
            if train and rng is not None:
                z = mean_z + std * jax.random.normal(rng, mean_z.shape)
            else:  # eval: posterior mean, RNG-free (`generate` path)
                z = mean_z
            # KL(N(mu, std) || N(0,1)) summed over z dims
            kl = 0.5 * jnp.sum(
                std**2 + mean_z**2 - 1.0 - 2.0 * logstd_z, axis=-1
            )
        else:
            z = jnp.zeros((Nb, 0))
            kl = jnp.zeros((Nb,))

        logits = self.decode(input_points, z, c, train, bn_momentum)
        bce = _bce_with_logits(logits, input_points_occ)  # (Nb, T)
        per_obj = kl + jnp.sum(bce, axis=-1)  # (Nb,)
        if valid_mask is not None:
            w = valid_mask.astype(jnp.float32)
            loss = jnp.sum(per_obj * w) / jnp.maximum(jnp.sum(w), 1e-6)
        else:
            loss = jnp.mean(per_obj)

        voxels_out = None
        if export_shape:
            shape = (16, 16, 16)
            p = make_3d_grid(
                [-0.5 + 1 / 32] * 3, [0.5 - 1 / 32] * 3, shape
            )
            p = jnp.broadcast_to(p[None], (Nb, p.shape[0], 3))
            z0 = jnp.zeros((Nb, self.z_dim))  # prior mean
            logits_v = self.decode(p, z0, c, False, bn_momentum)
            probs = jax.nn.sigmoid(logits_v)
            voxels_out = (probs >= self.threshold).reshape(Nb, *shape)
        return loss, voxels_out

    def __call__(self, input_points, input_features, cls_codes,
                 train: bool = False, bn_momentum=None):
        """Forward with prior-mean z: logits for sampled points."""
        c = self._cond(input_features, cls_codes)
        z = jnp.zeros((c.shape[0], self.z_dim))
        return self.decode(input_points, z, c, train, bn_momentum)


def _bce_with_logits(logits, targets):
    """Numerically-stable binary cross entropy with logits (torch
    F.binary_cross_entropy_with_logits, reduction='none')."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
