"""Chamfer distance — blocked, memory-bounded, differentiable.

Replaces `external/pyTorchChamferDistance` (CUDA kernel with 512-point
shared-memory tiling + explicit gradient kernels). Used in the training loss
path (`models/loss.py:282` ChamferDist) and the test-time mesh-to-scan box
refit (`models/iscnet/modules/network.py:293-303`), where set sizes reach
10k x 50k per proposal.

TPU design: nearest-neighbor *indices* are found with a blocked min-scan
(`lax.map` over chunks of the opposing set, so only a (chunk x chunk) slab
is live at once) under ``stop_gradient``; the distances are then recomputed
differentiably from the gathered matches. This is exact (d min/d params only
flows through the argmin match) and sidesteps a custom VJP entirely, while
never materialising the full N x M matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_CHUNK = 2048


def _nn_idx_blocked(a: jax.Array, b: jax.Array) -> jax.Array:
    """For each point in a (N,3), index of nearest point in b (M,3). int32."""
    N = a.shape[0]
    M = b.shape[0]
    a2 = jnp.sum(a * a, axis=-1)

    n_chunks = -(-M // _CHUNK)
    pad = n_chunks * _CHUNK - M
    b_pad = jnp.pad(b, ((0, pad), (0, 0)))
    b_chunks = b_pad.reshape(n_chunks, _CHUNK, 3)
    base = jnp.arange(n_chunks, dtype=jnp.int32) * _CHUNK

    def chunk_min(args):
        bc, off = args  # (CHUNK, 3), scalar
        b2 = jnp.sum(bc * bc, axis=-1)
        cross = jnp.dot(a, bc.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        d2 = a2[:, None] + b2[None, :] - 2.0 * cross  # (N, CHUNK)
        valid = (jnp.arange(_CHUNK, dtype=jnp.int32) + off) < M
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
        local = jnp.argmin(d2, axis=1).astype(jnp.int32)
        return jnp.min(d2, axis=1), local + off

    dists, idxs = jax.lax.map(chunk_min, (b_chunks, base))  # (n_chunks, N) each
    best_chunk = jnp.argmin(dists, axis=0)  # (N,)
    return jnp.take_along_axis(idxs, best_chunk[None, :], axis=0)[0]


def chamfer_distance(
    set1: jax.Array, set2: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Bidirectional squared-L2 chamfer distances.

    Args:
      set1: (B, N, 3); set2: (B, M, 3).

    Returns:
      dist1 (B, N): for each point in set1, squared distance to nearest set2
      point; dist2 (B, M): the reverse. Differentiable w.r.t. both sets
      (gradient flows through the matched pairs, matching the CUDA grads).
    """
    set1 = set1.astype(jnp.float32)
    set2 = set2.astype(jnp.float32)

    def single(a, b):
        idx1 = jax.lax.stop_gradient(_nn_idx_blocked(a, b))
        idx2 = jax.lax.stop_gradient(_nn_idx_blocked(b, a))
        d1 = jnp.sum((a - b[idx1]) ** 2, axis=-1)
        d2 = jnp.sum((b - a[idx2]) ** 2, axis=-1)
        return d1, d2

    return jax.vmap(single)(set1, set2)
