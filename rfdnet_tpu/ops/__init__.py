"""Fixed-shape TPU geometry ops (the reference's `external/` CUDA layer)."""

from .ball_query import ball_query
from .boxes import (
    aabb_pairwise_iou,
    class2angle,
    class2size,
    corners_to_aabb,
    flip_axis_to_camera,
    flip_axis_to_depth,
    get_3d_box_batch,
)
from .chamfer import chamfer_distance
from .fps import furthest_point_sample
from .grouping import gather_points, group_points, query_and_group
from .interpolate import interpolate_features, three_interpolate, three_nn
from .nms import nms_3d
from .nn_distance import huber_loss, nn_distance

__all__ = [
    "aabb_pairwise_iou",
    "ball_query",
    "chamfer_distance",
    "class2angle",
    "class2size",
    "corners_to_aabb",
    "flip_axis_to_camera",
    "flip_axis_to_depth",
    "furthest_point_sample",
    "gather_points",
    "get_3d_box_batch",
    "group_points",
    "huber_loss",
    "interpolate_features",
    "nms_3d",
    "nn_distance",
    "query_and_group",
    "three_interpolate",
    "three_nn",
]
