"""Official Lyft detection metric: mAP over 3D-IoU thresholds 0.5:0.95.

Devkit-free re-implementation of the protocol the reference runs through
`lyft_dataset_sdk.eval.detection.mAP_evaluation` (invoked from
`mmdet3d/core/evaluation/lyft_eval.py:97-140`, called at
`mmdet3d/datasets/lyft_dataset.py:296`):

- predictions of each class are sorted by descending score; each is
  greedily matched to the argmax-3D-IoU ground-truth box of that class in
  its sample; a GT already matched at a given IoU threshold makes the
  detection a false positive at that threshold
  (`lyft_eval.py:201-259` / the SDK's ``get_single_class_aps``);
- AP per (class, threshold) is the all-point-interpolated area under the
  precision/recall curve with (0, 1)-recall sentinels (the SDK's
  ``get_ap``);
- the headline number is the mean over classes and the ten thresholds
  {0.5, 0.55, ..., 0.95} (`lyft_eval.py:112-120`).

3D IoU = (BEV rotated-rectangle intersection area x z-extent overlap) /
volume union, matching the SDK's shapely-polygon Box3D.get_iou. IoU is
rigid-motion invariant, so evaluating in the per-sample LiDAR frame gives
the same numbers as the SDK's global frame.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from ..bbox.box_np_ops import center_to_corner_box2d

IOU_THRESHOLDS = tuple(np.round(np.arange(0.5, 1.0, 0.05), 2))


def _cross2(u: np.ndarray, v: np.ndarray) -> float:
    return float(u[0] * v[1] - u[1] * v[0])


def _clip_polygon(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman clip of polygon ``subject`` by convex ``clip``
    (both (K, 2), counter-clockwise). Returns the clipped polygon."""
    output = subject
    n = len(clip)
    for i in range(n):
        if len(output) == 0:
            break
        a, b = clip[i], clip[(i + 1) % n]
        edge = b - a
        inp = output
        output = []
        prev = inp[-1]
        prev_in = _cross2(edge, prev - a) >= 0
        for cur in inp:
            cur_in = _cross2(edge, cur - a) >= 0
            if cur_in != prev_in:
                d = cur - prev
                denom = _cross2(edge, d)
                if abs(denom) > 1e-12:
                    t = _cross2(edge, a - prev) / denom
                    output.append(prev + t * d)
            if cur_in:
                output.append(cur)
            prev, prev_in = cur, cur_in
        output = np.asarray(output).reshape(-1, 2)
    return np.asarray(output).reshape(-1, 2)


def _poly_area(poly: np.ndarray) -> float:
    if len(poly) < 3:
        return 0.0
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(y, -1)) -
                           np.dot(y, np.roll(x, -1))))


def _ccw(corners: np.ndarray) -> np.ndarray:
    """Ensure counter-clockwise winding for one (4, 2) rectangle."""
    x, y = corners[:, 0], corners[:, 1]
    if float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) < 0:
        return corners[::-1]
    return corners


def iou_3d(box: np.ndarray, gts: np.ndarray) -> np.ndarray:
    """3D IoU of one (7,) box (x, y, z_bottom, dx, dy, dz, yaw) against
    (M, 7) boxes — the SDK Box3D.get_iou formula."""
    if len(gts) == 0:
        return np.zeros((0,), np.float64)
    all_boxes = np.concatenate([box[None], gts], axis=0)
    corners = center_to_corner_box2d(
        all_boxes[:, :2], all_boxes[:, 3:5], all_boxes[:, 6])
    c0 = _ccw(corners[0])
    vol = all_boxes[:, 3] * all_boxes[:, 4] * all_boxes[:, 5]
    z0, z1 = all_boxes[:, 2], all_boxes[:, 2] + all_boxes[:, 5]
    ious = np.zeros(len(gts), np.float64)
    for j in range(len(gts)):
        zi = min(z1[0], z1[j + 1]) - max(z0[0], z0[j + 1])
        if zi <= 0:
            continue
        area = _poly_area(_clip_polygon(c0, _ccw(corners[j + 1])))
        inter = area * zi
        union = vol[0] + vol[j + 1] - inter
        ious[j] = inter / max(union, 1e-12)
    return ious


def get_ap(recalls: np.ndarray, precisions: np.ndarray) -> float:
    """All-point-interpolated AP (the SDK's ``get_ap``)."""
    recalls = np.concatenate(([0.0], recalls, [1.0]))
    precisions = np.concatenate(([0.0], precisions, [0.0]))
    for i in range(len(precisions) - 1, 0, -1):
        precisions[i - 1] = max(precisions[i - 1], precisions[i])
    idx = np.where(recalls[1:] != recalls[:-1])[0]
    return float(np.sum((recalls[idx + 1] - recalls[idx]) *
                        precisions[idx + 1]))


def get_single_class_aps(gt_by_sample: Dict[int, np.ndarray],
                         predictions: List[tuple],
                         iou_thresholds: Sequence[float]) -> np.ndarray:
    """SDK ``get_single_class_aps``: greedy matching over score-sorted
    predictions. ``predictions`` is a list of (score, sample_id, box7)."""
    num_gts = int(sum(len(b) for b in gt_by_sample.values()))
    checked = {sid: np.zeros((len(b), len(iou_thresholds)))
               for sid, b in gt_by_sample.items()}
    predictions = sorted(predictions, key=lambda t: -t[0])
    tps = np.zeros((len(predictions), len(iou_thresholds)))
    fps = np.zeros((len(predictions), len(iou_thresholds)))
    for pi, (_, sid, box) in enumerate(predictions):
        gts = gt_by_sample.get(sid, np.zeros((0, 7)))
        max_iou, jmax = -np.inf, -1
        if len(gts):
            overlaps = iou_3d(box, gts)
            jmax = int(np.argmax(overlaps))
            max_iou = float(overlaps[jmax])
        for ti, th in enumerate(iou_thresholds):
            if max_iou > th:
                if checked[sid][jmax, ti] == 0:
                    tps[pi, ti] = 1.0
                    checked[sid][jmax, ti] = 1
                else:
                    fps[pi, ti] = 1.0
            else:
                fps[pi, ti] = 1.0
    fps = np.cumsum(fps, axis=0)
    tps = np.cumsum(tps, axis=0)
    recalls = tps / max(float(num_gts), 1e-12)
    precisions = tps / np.maximum(tps + fps, np.finfo(np.float64).eps)
    return np.asarray([
        get_ap(recalls[:, i], precisions[:, i])
        for i in range(len(iou_thresholds))])


def lyft_eval_core(results: List[dict], gts: List[dict],
                   classes: Sequence[str],
                   iou_thresholds: Sequence[float] = IOU_THRESHOLDS
                   ) -> dict:
    """Official Lyft mAP over per-sample LiDAR-frame boxes.

    results: per-sample dict(bboxes (K,>=7), scores (K,), labels (K,)
    [, mask]); gts: per-sample dict(boxes (M,>=7), labels (M,)).
    """
    per_class_preds: Dict[int, list] = {c: [] for c in range(len(classes))}
    for sid, det in enumerate(results):
        boxes = np.asarray(det.get("bboxes", det.get("boxes")), np.float64)
        scores = np.asarray(det["scores"], np.float64)
        labels = np.asarray(det["labels"], np.int64)
        mask = np.asarray(det.get("mask", np.ones(len(scores), bool))
                          ).astype(bool)
        for i in np.nonzero(mask)[0]:
            li = int(labels[i])
            if 0 <= li < len(classes):
                per_class_preds[li].append(
                    (float(scores[i]), sid, boxes[i, :7]))
    per_class_gts: Dict[int, Dict[int, np.ndarray]] = {
        c: {} for c in range(len(classes))}
    gt_counts = np.zeros(len(classes), np.int64)
    for sid, gt in enumerate(gts):
        boxes = np.asarray(gt["boxes"], np.float64)
        labels = np.asarray(gt["labels"], np.int64)
        for c in range(len(classes)):
            sel = labels == c
            if sel.any():
                per_class_gts[c][sid] = boxes[sel][:, :7]
                gt_counts[c] += int(sel.sum())

    aps = np.zeros((len(classes), len(iou_thresholds)))
    for c in range(len(classes)):
        # classes with no predictions score 0 at every threshold
        if per_class_preds[c] and gt_counts[c] > 0:
            aps[c] = get_single_class_aps(
                per_class_gts[c], per_class_preds[c], iou_thresholds)
    # SDK semantics (mAP_evaluation: class_names = get_class_names(gt)):
    # the mean runs ONLY over classes present in the ground truth —
    # averaging zero rows for absent classes would deflate the headline
    present = np.asarray([gt_counts[c] > 0 for c in range(len(classes))])
    if not present.any():
        present = np.ones(len(classes), bool)
    m_ap_per_th = aps[present].mean(axis=0)
    m_ap_per_class = aps.mean(axis=1)
    return {
        "average_precisions": aps.tolist(),
        "mAPs": m_ap_per_th.tolist(),
        "mAPs_cate": m_ap_per_class.tolist(),
        "Final mAP": float(m_ap_per_th.mean()),
        "class_names": list(classes),
        "gt_present": present.tolist(),
    }
