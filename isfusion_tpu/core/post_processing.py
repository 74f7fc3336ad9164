"""Post-processing utilities: multiclass NMS wrapper + TTA merge.

Parity: `mmdet3d/core/post_processing/box3d_nms.py:9` (box3d_multiclass_nms)
and `merge_augs.py` (merge_aug_bboxes_3d).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.box_ops import nms_bev_mask, circle_nms_mask


def box3d_multiclass_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                         score_thr: float, nms_thr: float,
                         max_num: int,
                         valid: Optional[jnp.ndarray] = None) -> dict:
    """Per-class rotated-BEV NMS with a fixed output budget.

    boxes (N, >=7); scores (N, num_classes) post-sigmoid. Returns dict of
    padded (max_num,) results (`box3d_nms.py:9` semantics, static shapes).
    """
    n, nc = scores.shape
    if valid is None:
        valid = jnp.ones((n,), bool)
    bev = boxes[:, [0, 1, 3, 4, 6]]
    all_scores, all_labels, keep_masks = [], [], []
    for c in range(nc):
        s = scores[:, c]
        ok = valid & (s > score_thr)
        keep = nms_bev_mask(bev, s, nms_thr, ok)
        all_scores.append(jnp.where(keep, s, 0.0))
        all_labels.append(jnp.full((n,), c, jnp.int32))
        keep_masks.append(keep)
    flat_scores = jnp.concatenate(all_scores)
    flat_labels = jnp.concatenate(all_labels)
    flat_keep = jnp.concatenate(keep_masks)
    topv, topi = jax.lax.top_k(jnp.where(flat_keep, flat_scores, 0.0),
                               max_num)
    box_idx = topi % n
    return dict(bboxes=boxes[box_idx], scores=topv,
                labels=flat_labels[topi], mask=topv > score_thr)


def merge_aug_bboxes_3d(aug_results: List[dict],
                        aug_metas: List[dict],
                        score_thr: float = 0.0,
                        nms_thr: float = 0.25,
                        max_num: int = 500) -> dict:
    """Undo per-view TTA transforms, concatenate, NMS
    (`merge_augs.py:merge_aug_bboxes_3d`).

    aug_metas[i] may carry pcd_horizontal_flip / pcd_vertical_flip /
    pcd_scale_factor / pcd_rotation (scalar yaw) describing view i.
    """
    boxes_list, scores_list, labels_list, mask_list = [], [], [], []
    for res, meta in zip(aug_results, aug_metas):
        b = np.asarray(res["bboxes"]).copy()
        if meta.get("pcd_scale_factor"):
            s = float(meta["pcd_scale_factor"])
            b[:, :6] /= s
        if meta.get("pcd_rotation"):
            th = -float(meta["pcd_rotation"])
            c, si = np.cos(th), np.sin(th)
            xy = b[:, :2] @ np.array([[c, si], [-si, c]], b.dtype)
            b[:, :2] = xy
            b[:, 6] += th
            if b.shape[1] >= 9:
                b[:, 7:9] = b[:, 7:9] @ np.array([[c, si], [-si, c]],
                                                 b.dtype)
        if meta.get("pcd_horizontal_flip"):
            b[:, 1] = -b[:, 1]
            b[:, 6] = -b[:, 6]
            if b.shape[1] >= 9:
                b[:, 8] = -b[:, 8]
        if meta.get("pcd_vertical_flip"):
            b[:, 0] = -b[:, 0]
            b[:, 6] = -(b[:, 6] + np.pi)
            if b.shape[1] >= 9:
                b[:, 7] = -b[:, 7]
        boxes_list.append(b)
        scores_list.append(np.asarray(res["scores"]))
        labels_list.append(np.asarray(res["labels"]))
        mask_list.append(np.asarray(res.get(
            "mask", np.ones(len(b), bool))))
    boxes = jnp.asarray(np.concatenate(boxes_list))
    scores = jnp.asarray(np.concatenate(scores_list))
    labels = jnp.asarray(np.concatenate(labels_list))
    valid = jnp.asarray(np.concatenate(mask_list))
    keep = nms_bev_mask(boxes[:, [0, 1, 3, 4, 6]], scores, nms_thr,
                        valid & (scores > score_thr))
    k = min(max_num, boxes.shape[0])
    topv, topi = jax.lax.top_k(jnp.where(keep, scores, 0.0), k)
    return dict(bboxes=np.asarray(boxes[topi]),
                scores=np.asarray(topv),
                labels=np.asarray(labels[topi]),
                mask=np.asarray(topv > score_thr))