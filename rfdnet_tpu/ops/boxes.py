"""On-device box geometry: heading/size decoding, corner generation, frames.

jnp equivalents of `net_utils/box_util.py` (get_3d_box/roty) and
`net_utils/libs.py` (flip_axis_to_camera/depth), fully batched and
fixed-shape so the whole proposal-decode + NMS path stays on the TPU
(the reference loops over B x 256 proposals in Python —
`net_utils/ap_helper.py:174-181` — a known CPU bottleneck by design).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def class2angle(pred_cls: jax.Array, residual: jax.Array, num_heading_bin: int,
                to_label_format: bool = True) -> jax.Array:
    """Heading bin + residual -> angle. `configs/scannet_config.py:56-64`."""
    angle_per_class = 2.0 * np.pi / float(num_heading_bin)
    angle = pred_cls.astype(jnp.float32) * angle_per_class + residual
    if to_label_format:
        angle = angle - 2.0 * np.pi * (angle > np.pi).astype(jnp.float32)
    return angle


def class2size(pred_cls: jax.Array, residual: jax.Array,
               mean_size_arr: jax.Array) -> jax.Array:
    """Size cluster + residual -> (l, w, h). `scannet_config.py:75-81`."""
    return mean_size_arr[pred_cls] + residual


def flip_axis_to_camera(pc: jax.Array) -> jax.Array:
    """Depth (X right, Y fwd, Z up) -> camera (X right, Y down, Z fwd)."""
    return jnp.stack([pc[..., 0], -pc[..., 2], pc[..., 1]], axis=-1)


def flip_axis_to_depth(pc: jax.Array) -> jax.Array:
    """Camera -> depth frame (inverse of flip_axis_to_camera)."""
    return jnp.stack([pc[..., 0], pc[..., 2], -pc[..., 1]], axis=-1)


def get_3d_box_batch(box_size: jax.Array, heading_angle: jax.Array,
                     center: jax.Array) -> jax.Array:
    """Batched corner generation in the y-up camera frame.

    Args:
      box_size: (..., 3) as (l, w, h).
      heading_angle: (...,) radians, clockwise from +x.
      center: (..., 3) camera-frame box centers.

    Returns:
      (..., 8, 3) corners, same corner ordering as
      `net_utils/box_util.py:183-198` (indices 0-3 top face, 4-7 bottom).
    """
    l = box_size[..., 0]
    w = box_size[..., 1]
    h = box_size[..., 2]
    sgn_x = jnp.asarray([1, 1, -1, -1, 1, 1, -1, -1], dtype=jnp.float32)
    sgn_y = jnp.asarray([1, 1, 1, 1, -1, -1, -1, -1], dtype=jnp.float32)
    sgn_z = jnp.asarray([1, -1, -1, 1, 1, -1, -1, 1], dtype=jnp.float32)
    x = 0.5 * l[..., None] * sgn_x
    y = 0.5 * h[..., None] * sgn_y
    z = 0.5 * w[..., None] * sgn_z
    c = jnp.cos(heading_angle)[..., None]
    s = jnp.sin(heading_angle)[..., None]
    # roty: [c 0 s; 0 1 0; -s 0 c]
    rx = c * x + s * z
    ry = y
    rz = -s * x + c * z
    corners = jnp.stack([rx, ry, rz], axis=-1)  # (..., 8, 3)
    return corners + center[..., None, :]


def corners_to_aabb(corners: jax.Array) -> jax.Array:
    """(..., 8, 3) corners -> (..., 6) [xmin ymin zmin xmax ymax zmax]."""
    return jnp.concatenate(
        [jnp.min(corners, axis=-2), jnp.max(corners, axis=-2)], axis=-1
    )


def aabb_pairwise_iou(boxes: jax.Array) -> jax.Array:
    """Pairwise IoU of (K, 6) axis-aligned boxes -> (K, K)."""
    mins = boxes[:, :3]
    maxs = boxes[:, 3:]
    lo = jnp.maximum(mins[:, None, :], mins[None, :, :])
    hi = jnp.minimum(maxs[:, None, :], maxs[None, :, :])
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    vol = jnp.prod(maxs - mins, axis=-1)
    union = vol[:, None] + vol[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)
