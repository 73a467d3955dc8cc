"""On-device greedy 3D NMS — fixed-K, jit-compatible.

Semantic equivalent of `net_utils/nms.py:41-118` (nms_3d_faster /
nms_3d_faster_samecls): greedy suppression over axis-aligned boxes in
descending-score order, optionally class-aware (a box only suppresses boxes
of the same class) and with the "old type" overlap/area criterion.

The numpy reference is a data-dependent while-loop over survivors; here it
is a fixed-K ``fori_loop`` over the score-sorted order where iteration i
suppresses later boxes only if box i itself is still alive — which is
exactly the greedy algorithm. Returns a 0/1 mask over the original order
(the `pred_mask` contract of `net_utils/ap_helper.py:205-264`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import aabb_pairwise_iou


def nms_3d(
    aabb: jax.Array,
    score: jax.Array,
    cls: jax.Array | None,
    iou_threshold: float,
    old_type: bool = False,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Batched greedy NMS.

    Args:
      aabb: (B, K, 6) [xmin ymin zmin xmax ymax zmax].
      score: (B, K).
      cls: optional (B, K) int class ids; if given, suppression is
        class-aware (nms_3d_faster_samecls semantics).
      iou_threshold: suppression threshold (strictly-greater comparison,
        matching `nms.py:116` ``o > overlap_threshold``).
      old_type: use inter/area-of-other instead of IoU (`nms.py:111-114`).
      valid: optional (B, K) bool; invalid boxes never keep nor suppress
        (the reference's `nonempty_box_mask` pre-filter).

    Returns:
      (B, K) bool keep-mask.
    """

    def single(boxes, s, c, v):
        K = boxes.shape[0]
        s = jnp.where(v, s, -jnp.inf)
        order = jnp.argsort(-s)  # descending
        b_o = boxes[order]
        v_o = v[order]
        if old_type:
            mins = b_o[:, :3]
            maxs = b_o[:, 3:]
            lo = jnp.maximum(mins[:, None, :], mins[None, :, :])
            hi = jnp.minimum(maxs[:, None, :], maxs[None, :, :])
            inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
            vol = jnp.prod(maxs - mins, axis=-1)
            overlap = inter / jnp.maximum(vol[None, :], 1e-12)
        else:
            overlap = aabb_pairwise_iou(b_o)
        if c is not None:
            c_o = c[order]
            overlap = overlap * (c_o[:, None] == c_o[None, :])
        later = jnp.arange(K)[None, :] > jnp.arange(K)[:, None]
        sup = (overlap > iou_threshold) & later & v_o[None, :]

        def body(i, keep):
            alive = keep[i] & v_o[i]
            return jnp.where(alive, keep & ~sup[i], keep)

        keep = jax.lax.fori_loop(0, K, body, v_o)
        out = jnp.zeros((K,), dtype=bool).at[order].set(keep)
        return out

    if cls is None:
        cls = jnp.zeros(score.shape, dtype=jnp.int32)
    if valid is None:
        valid = jnp.ones(score.shape, dtype=bool)
    return jax.vmap(single)(aabb, score, cls, valid)
