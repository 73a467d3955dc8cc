"""Host-side evaluation stack (VOC mAP, oriented-box IoU, AP assembly)."""

from .ap_helper import (
    APCalculator,
    assembly_gt_map_cls,
    assembly_pred_map_cls,
    corners_from_params,
    parse_groundtruths,
)
from .box_util import (
    box3d_iou,
    box3d_vol,
    calc_iou,
    flip_axis_to_camera,
    flip_axis_to_depth,
    get_3d_box,
    get_iou_obb,
    polygon_clip,
)
from .eval_det import eval_det, eval_det_cls, voc_ap

__all__ = [
    "APCalculator", "assembly_gt_map_cls", "assembly_pred_map_cls",
    "box3d_iou", "box3d_vol", "calc_iou", "corners_from_params",
    "eval_det", "eval_det_cls", "flip_axis_to_camera", "flip_axis_to_depth",
    "get_3d_box", "get_iou_obb", "parse_groundtruths", "polygon_clip",
    "voc_ap",
]
