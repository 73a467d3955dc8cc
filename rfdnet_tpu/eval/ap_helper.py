"""AP accumulation + prediction/GT assembly (host side).

Semantic rebuild of `net_utils/ap_helper.py`: `APCalculator` accumulates
per-scan (class, box[, mesh], score) tuples and computes per-class AP/AR
and mAP; `assembly_pred_map_cls` expands NMS survivors into per-class
proposals (per_class_proposal semantics, score = sem_prob * obj_prob);
`parse_groundtruths` decodes GT box labels to camera-frame corners —
vectorized numpy instead of the reference's B x K Python loops.

The on-device half of parse_predictions (box decode + NMS) lives in
`rfdnet_tpu.models.iscnet.ISCNet.parse_predictions`.
"""

from __future__ import annotations

import numpy as np

from .box_util import flip_axis_to_camera, get_iou_obb
from .eval_det import eval_det


def corners_from_params(box_size, heading_angle, center_cam):
    """Vectorized get_3d_box over leading dims: sizes (..., 3) [l, w, h],
    angles (...,), centers (..., 3) -> corners (..., 8, 3)."""
    l, w, h = box_size[..., 0], box_size[..., 1], box_size[..., 2]
    sx = np.array([1, 1, -1, -1, 1, 1, -1, -1], np.float64)
    sy = np.array([1, 1, 1, 1, -1, -1, -1, -1], np.float64)
    sz = np.array([1, -1, -1, 1, 1, -1, -1, 1], np.float64)
    x = 0.5 * l[..., None] * sx
    y = 0.5 * h[..., None] * sy
    z = 0.5 * w[..., None] * sz
    c = np.cos(heading_angle)[..., None]
    s = np.sin(heading_angle)[..., None]
    rx = c * x + s * z
    rz = -s * x + c * z
    corners = np.stack([rx, y, rz], axis=-1)
    return corners + center_cam[..., None, :]


def parse_groundtruths(gt_data, dataset_config):
    """`ap_helper.py:326-368` — all numpy, no per-box loops."""
    center = np.asarray(gt_data["center_label"])[:, :, 0:3]
    hc = np.asarray(gt_data["heading_class_label"]).astype(np.int64)
    hr = np.asarray(gt_data["heading_residual_label"])
    sc = np.asarray(gt_data["size_class_label"]).astype(np.int64)
    sr = np.asarray(gt_data["size_residual_label"])
    mask = np.asarray(gt_data["box_label_mask"])
    sem = np.asarray(gt_data["sem_cls_label"])

    angle_per_class = 2 * np.pi / dataset_config.num_heading_bin
    angle = hc * angle_per_class + hr
    angle = angle - 2 * np.pi * (angle > np.pi)
    sizes = dataset_config.mean_size_arr[sc] + sr
    center_cam = flip_axis_to_camera(center)
    corners = corners_from_params(sizes, -angle, center_cam)
    corners = corners * mask[..., None, None]  # zero out padding (cosmetic)
    return {
        "sem_cls_label": sem,
        "gt_corners_3d_upright_camera": corners,
        "box_label_mask": mask,
    }


def assembly_pred_map_cls(parsed, dataset_config, conf_thresh=0.05,
                          per_class_proposal=True, meshes=None,
                          proposal_ids=None):
    """`ap_helper.py:267-323` — returns a list (batch) of lists of
    (cls, corners[, mesh], score)."""
    corners = np.asarray(parsed["pred_corners_3d_upright_camera"])
    sem_probs = np.asarray(parsed["sem_cls_probs"])
    obj_prob = np.asarray(parsed["obj_prob"])
    pred_mask = np.asarray(parsed["pred_mask"])
    pred_sem_cls = np.asarray(parsed["pred_sem_cls"])
    bsize, K = obj_prob.shape

    def mesh_for(i, j):
        if meshes is None:
            return None
        pids = np.asarray(proposal_ids)[i, :, 0]
        hits = np.where(pids == j)[0]
        return meshes[i][hits[0]] if len(hits) else None

    batch = []
    for i in range(bsize):
        keep = np.where((pred_mask[i] == 1) & (obj_prob[i] > conf_thresh))[0]
        cur = []
        if per_class_proposal:
            for ii in range(dataset_config.num_class):
                for j in keep:
                    score = sem_probs[i, j, ii] * obj_prob[i, j]
                    if meshes is None:
                        cur.append((ii, corners[i, j], score))
                    else:
                        cur.append((ii, corners[i, j], score, mesh_for(i, j)))
        else:
            for j in keep:
                if meshes is None:
                    cur.append((int(pred_sem_cls[i, j]), corners[i, j],
                                obj_prob[i, j]))
                else:
                    cur.append((int(pred_sem_cls[i, j]), corners[i, j],
                                obj_prob[i, j], mesh_for(i, j)))
        batch.append(cur)
    return batch


def assembly_gt_map_cls(parsed_gts, meshes=None):
    """`ap_helper.py:371-401`."""
    sem = parsed_gts["sem_cls_label"]
    corners = parsed_gts["gt_corners_3d_upright_camera"]
    mask = parsed_gts["box_label_mask"]
    batch = []
    for i in range(sem.shape[0]):
        keep = np.where(mask[i] == 1)[0]
        if meshes is None:
            batch.append([(int(sem[i, j]), corners[i, j]) for j in keep])
        else:
            batch.append(
                [(int(sem[i, j]), corners[i, j], meshes[i][j]) for j in keep]
            )
    return batch


class APCalculator:
    """`ap_helper.py:25-128`."""

    def __init__(self, ap_iou_thresh=0.25, class2type_map=None,
                 mesh_iou_func=None, use_07_metric=True):
        """use_07_metric defaults True: the reference's APCalculator runs
        `eval_det_multiprocessing_wo_mesh` without overriding its
        `use_07_metric=True` default (`eval_det.py:424`, `ap_helper.py:65`),
        i.e. the published protocol is 11-point interpolated AP."""
        self.ap_iou_thresh = ap_iou_thresh
        self.class2type_map = class2type_map
        self.mesh_iou_func = mesh_iou_func
        self.use_07_metric = use_07_metric
        self.reset()

    def reset(self):
        self.gt_map_cls = {}
        self.pred_map_cls = {}
        self.scan_cnt = 0

    def step(self, batch_pred_map_cls, batch_gt_map_cls):
        assert len(batch_pred_map_cls) == len(batch_gt_map_cls)
        for pred, gt in zip(batch_pred_map_cls, batch_gt_map_cls):
            self.pred_map_cls[self.scan_cnt] = pred
            self.gt_map_cls[self.scan_cnt] = gt
            self.scan_cnt += 1

    def compute_metrics(self, parallel=True):
        res = eval_det(
            self.pred_map_cls, self.gt_map_cls, ovthresh=self.ap_iou_thresh,
            use_07_metric=self.use_07_metric,
            mesh_iou_func=self.mesh_iou_func, parallel=parallel,
        )
        if self.mesh_iou_func is not None:
            (rec, prec, ap), (rec_m, prec_m, ap_m) = res
        else:
            rec, prec, ap = res
        ret = self._summarize(rec, ap, "")
        if self.mesh_iou_func is not None:
            ret.update(self._summarize(rec_m, ap_m, "_mesh"))
        return ret

    def _summarize(self, rec, ap, suffix):
        ret = {}
        rec_list = []
        for key in sorted(ap.keys()):
            clsname = (
                self.class2type_map[key] if self.class2type_map else str(key)
            )
            ret[f"{clsname} Average Precision{suffix}"] = ap[key]
            try:
                r = rec[key][-1]
            except (TypeError, IndexError):
                r = 0
            ret[f"{clsname} Recall{suffix}"] = r
            rec_list.append(r)
        ret[f"mAP{suffix}"] = float(np.mean(list(ap.values()))) if ap else 0.0
        ret[f"AR{suffix}"] = float(np.mean(rec_list)) if rec_list else 0.0
        return ret
