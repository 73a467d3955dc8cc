"""Three-NN feature interpolation (PointNet++ FP layers) — TPU-native.

Replaces `_ext-src/src/interpolate_gpu.cu` (three_nn, three_interpolate and
their grads). The 3-nearest-neighbor search is a dense distance matrix
(MXU contraction) followed by ``lax.top_k`` on negated distances; the
weighted gather's backward (CUDA scatter-add, `interpolate_gpu.cu:116-145`)
falls out of JAX autodiff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def three_nn(unknown: jax.Array, known: jax.Array) -> tuple[jax.Array, jax.Array]:
    """For each of n unknown points find its 3 nearest known points.

    Args:
      unknown: (B, n, 3).
      known: (B, m, 3).

    Returns:
      dist (B, n, 3) float32 (euclidean, NOT squared — matches
      `pointnet2_utils.py:124` which sqrt's the kernel output),
      idx (B, n, 3) int32.
    """
    unknown = unknown.astype(jnp.float32)
    known = known.astype(jnp.float32)
    u2 = jnp.sum(unknown * unknown, axis=-1)  # (B, n)
    k2 = jnp.sum(known * known, axis=-1)  # (B, m)
    cross = jnp.einsum(
        "bnc,bmc->bnm", unknown, known, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = u2[..., None] + k2[:, None, :] - 2.0 * cross  # (B, n, m)
    neg_top, idx = jax.lax.top_k(-d2, 3)
    dist = jnp.sqrt(jnp.maximum(-neg_top, 0.0))
    return dist, idx.astype(jnp.int32)


def three_interpolate(
    features: jax.Array, idx: jax.Array, weight: jax.Array
) -> jax.Array:
    """Weighted interpolation of 3 neighbor features.

    Args:
      features: (B, m, C) known-point features (channels-last).
      idx: (B, n, 3) neighbor indices.
      weight: (B, n, 3) interpolation weights.

    Returns:
      (B, n, C) interpolated features.
    """
    B, _, C = features.shape
    n = idx.shape[1]
    gathered = jnp.take_along_axis(
        features, idx.reshape(B, n * 3, 1).astype(jnp.int32), axis=1
    ).reshape(B, n, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)


def interpolate_features(
    unknown_xyz: jax.Array, known_xyz: jax.Array, known_features: jax.Array
) -> jax.Array:
    """Full FP-layer interpolation (dist-weighted 3-NN,
    `pointnet2_modules.py` PointnetFPModule semantics)."""
    dist, idx = three_nn(unknown_xyz, known_xyz)
    dist_recip = 1.0 / (dist + 1e-8)
    norm = jnp.sum(dist_recip, axis=2, keepdims=True)
    weight = dist_recip / norm
    return three_interpolate(known_features, idx, weight)
