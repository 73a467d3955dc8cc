"""Point gathering / grouping ops — channels-last, autodiff-native.

Replaces the reference CUDA gather/group kernels
(`_ext-src/src/sampling_gpu.cu:8-57` gather_points(+grad),
`_ext-src/src/group_points_gpu.cu:8-66` group_points(+grad)).

The reference works channels-first (B, C, N) because cuDNN Conv1d wants it;
on TPU we keep channels LAST so the feature dim sits on the 128-lane axis
and the downstream shared MLPs are plain MXU matmuls. Gradients (the CUDA
scatter-add kernels) come for free from JAX's gather/scatter transpose
rules — no custom VJP needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_points(features: jax.Array, idx: jax.Array) -> jax.Array:
    """features (B, N, C), idx (B, M) int -> (B, M, C)."""
    return jnp.take_along_axis(features, idx[..., None].astype(jnp.int32), axis=1)


def group_points(features: jax.Array, idx: jax.Array) -> jax.Array:
    """features (B, N, C), idx (B, M, S) int -> (B, M, S, C)."""
    B, _, C = features.shape
    M, S = idx.shape[1], idx.shape[2]
    flat = jnp.take_along_axis(
        features, idx.reshape(B, M * S, 1).astype(jnp.int32), axis=1
    )
    return flat.reshape(B, M, S, C)


def query_and_group(
    xyz: jax.Array,
    new_xyz: jax.Array,
    idx: jax.Array,
    features: jax.Array | None,
    *,
    radius: float,
    use_xyz: bool = True,
    normalize_xyz: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Group neighborhoods around query centers (QueryAndGroup semantics,
    `pointnet2_ops/pointnet2_utils.py:279-361`, channels-last).

    Args:
      xyz: (B, N, 3) support points.
      new_xyz: (B, M, 3) centers.
      idx: (B, M, S) neighbor indices (from ``ball_query``).
      features: optional (B, N, C) point features.
      radius: grouping radius (for normalize_xyz).
      use_xyz: prepend relative xyz to grouped features.
      normalize_xyz: divide relative xyz by radius.

    Returns:
      (grouped_features (B, M, S, 3+C or C or 3), grouped_xyz (B, M, S, 3)),
      where grouped_xyz is the center-relative (and optionally normalised)
      coordinates.
    """
    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius
    if features is not None:
        grouped = group_points(features, idx)
        if use_xyz:
            grouped = jnp.concatenate([grouped_xyz, grouped], axis=-1)
    else:
        if not use_xyz:
            raise ValueError("Cannot have no features and use_xyz=False")
        grouped = grouped_xyz
    return grouped, grouped_xyz
