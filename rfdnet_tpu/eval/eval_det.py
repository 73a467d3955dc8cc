"""VOC-style detection AP evaluation (host-side, numpy).

Semantic rebuild of `net_utils/eval_det.py`: per-class greedy TP/FP matching
at an IoU threshold, precision/recall envelope, VOC AP (11-point optional),
with an optional joint mesh-AP pass (`eval_det_cls_w_mesh`) scoring box and
mesh IoU simultaneously. The reference's multiprocessing Pool-over-classes
becomes a `concurrent.futures` fan-out with a serial fallback
(`eval_det.py:393-406`).
"""

from __future__ import annotations

import multiprocessing
import os
from concurrent.futures import ProcessPoolExecutor
from typing import Callable

import numpy as np

from .box_util import get_iou_obb


def voc_ap(rec, prec, use_07_metric=False):
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = np.max(prec[rec >= t]) if np.sum(rec >= t) != 0 else 0
            ap += p / 11.0
        return ap
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    i = np.where(mrec[1:] != mrec[:-1])[0]
    return np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1])


def eval_det_cls(pred, gt, ovthresh=0.25, use_07_metric=False,
                 get_iou_func: Callable = get_iou_obb, mesh_iou_func=None):
    """Single-class precision/recall.

    pred: {img_id: [(bbox, score)]} (or [(bbox, score, mesh)] with
    mesh_iou_func); gt: {img_id: [bbox]} (or [(bbox, mesh)]).
    Returns (rec, prec, ap) — and a second mesh triple when mesh_iou_func.
    """
    with_mesh = mesh_iou_func is not None
    class_recs = {}
    npos = 0
    for img_id in gt.keys():
        items = gt[img_id]
        if with_mesh:
            bbox = np.array([it[0] for it in items])
            mesh = [it[1] for it in items]
        else:
            bbox = np.array(items)
            mesh = []
        npos += len(bbox)
        class_recs[img_id] = {
            "bbox": bbox,
            "det": [False] * len(bbox),
            "mesh": mesh,
            "det_mesh": [False] * len(bbox),
        }
    for img_id in pred.keys():
        if img_id not in class_recs:
            class_recs[img_id] = {"bbox": np.array([]), "det": [],
                                  "mesh": [], "det_mesh": []}

    image_ids, confidence, BB, meshes = [], [], [], []
    for img_id in pred.keys():
        for item in pred[img_id]:
            image_ids.append(img_id)
            confidence.append(item[1])
            BB.append(item[0])
            if with_mesh:
                meshes.append(item[2])
    confidence = np.array(confidence)
    BB = np.array(BB)

    sorted_ind = np.argsort(-confidence)
    BB = BB[sorted_ind, ...] if BB.size else BB
    image_ids = [image_ids[x] for x in sorted_ind]
    if with_mesh:
        meshes = [meshes[x] for x in sorted_ind]

    nd = len(image_ids)
    tp = np.zeros(nd)
    fp = np.zeros(nd)
    tp_mesh = np.zeros(nd)
    fp_mesh = np.zeros(nd)
    for d in range(nd):
        R = class_recs[image_ids[d]]
        bb = BB[d, ...].astype(float)
        ovmax, jmax = -np.inf, -1
        ovmax_mesh, jmax_mesh = -np.inf, -1
        BBGT = R["bbox"].astype(float)
        if BBGT.size > 0:
            for j in range(BBGT.shape[0]):
                iou = get_iou_func(bb, BBGT[j, ...])
                if iou > ovmax:
                    ovmax, jmax = iou, j
                if with_mesh:
                    iou_m = mesh_iou_func(meshes[d], R["mesh"][j])
                    if iou_m > ovmax_mesh:
                        ovmax_mesh, jmax_mesh = iou_m, j
        if ovmax > ovthresh:
            if not R["det"][jmax]:
                tp[d] = 1.0
                R["det"][jmax] = True
            else:
                fp[d] = 1.0
        else:
            fp[d] = 1.0
        if with_mesh:
            if ovmax_mesh > ovthresh:
                if not R["det_mesh"][jmax_mesh]:
                    tp_mesh[d] = 1.0
                    R["det_mesh"][jmax_mesh] = True
                else:
                    fp_mesh[d] = 1.0
            else:
                fp_mesh[d] = 1.0

    def pr(tp, fp):
        fp = np.cumsum(fp)
        tp = np.cumsum(tp)
        rec = tp / float(npos) if npos > 0 else np.zeros_like(tp)
        prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
        return rec, prec, voc_ap(rec, prec, use_07_metric)

    if with_mesh:
        return pr(tp, fp), pr(tp_mesh, fp_mesh)
    return pr(tp, fp)


def _eval_cls_worker(args):
    pred, gt, ovthresh, use_07, with_mesh, mesh_iou_func = args
    return eval_det_cls(
        pred, gt, ovthresh, use_07,
        mesh_iou_func=mesh_iou_func if with_mesh else None,
    )


def eval_det(pred_all, gt_all, ovthresh=0.25, use_07_metric=False,
             mesh_iou_func=None, parallel=True):
    """Multi-class AP (the `eval_det_multiprocessing_*` drivers,
    `eval_det.py:355-473`).

    pred_all: {img_id: [(classname, bbox, score[, mesh])]};
    gt_all: {img_id: [(classname, bbox[, mesh])]}.
    Returns (rec, prec, ap) dicts keyed by class — plus mesh dicts when
    mesh_iou_func is given.
    """
    with_mesh = mesh_iou_func is not None
    pred, gt = {}, {}
    for img_id in pred_all.keys():
        for item in pred_all[img_id]:
            cls = item[0]
            pred.setdefault(cls, {}).setdefault(img_id, []).append(item[1:])
    for img_id in gt_all.keys():
        for item in gt_all[img_id]:
            cls = item[0]
            entry = item[1] if not with_mesh else tuple(item[1:])
            gt.setdefault(cls, {}).setdefault(img_id, []).append(entry)

    classes = [c for c in gt.keys()]
    jobs = [
        (pred.get(c, {}), gt[c], ovthresh, use_07_metric, with_mesh,
         mesh_iou_func)
        for c in classes
    ]
    results = None
    if parallel and len(classes) > 1 and (os.cpu_count() or 1) > 1:
        try:
            # spawn context: fork() under JAX's threads can deadlock
            ctx = multiprocessing.get_context("spawn")
            with ProcessPoolExecutor(
                max_workers=min(10, len(classes)), mp_context=ctx
            ) as ex:
                results = list(ex.map(_eval_cls_worker, jobs))
        except Exception:  # serial fallback (`eval_det.py:393-406`)
            results = None
    if results is None:
        results = [_eval_cls_worker(j) for j in jobs]

    rec, prec, ap = {}, {}, {}
    rec_m, prec_m, ap_m = {}, {}, {}
    for c, res in zip(classes, results):
        if with_mesh:
            (rec[c], prec[c], ap[c]), (rec_m[c], prec_m[c], ap_m[c]) = res
        else:
            rec[c], prec[c], ap[c] = res
    for c in pred.keys():
        if c not in gt:
            rec[c], prec[c], ap[c] = 0.0, 0.0, 0.0
            if with_mesh:
                rec_m[c], prec_m[c], ap_m[c] = 0.0, 0.0, 0.0
    if with_mesh:
        return (rec, prec, ap), (rec_m, prec_m, ap_m)
    return rec, prec, ap
