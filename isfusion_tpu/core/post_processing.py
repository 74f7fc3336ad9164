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


def weighted_nms(boxes: np.ndarray, scores: np.ndarray,
                 nms_thr: float = 0.25, merge_thr: float = 0.7,
                 yaw_tol: float = 0.3) -> tuple:
    """Score-weighted box-averaging NMS (the reference's TorchEx
    ``wnms_gpu``: `ops/TorchEx/torchex/src/weighted_nms/wnms_kernel.cu`,
    used by the TTA merge `core/post_processing/merge_augs.py:8,49-52`).

    Greedy rotated-BEV NMS at ``nms_thr`` picks the keep set; each kept
    box is then replaced by the score-weighted average of itself and all
    LOWER-scored boxes with BEV IoU > ``merge_thr`` whose yaw lies within
    ``yaw_tol`` rad of the candidate-set median yaw (wnms_kernel.cu:
    median filter :372-410, accumulation :408-441). The kept box's score
    is preserved.

    boxes: (N, D>=7) float; scores (N,). Returns (merged_boxes (K, D),
    keep_scores (K,), keep_indices (K,)) sorted by descending score.
    """
    from ..ops.box_ops import boxes_iou_bev

    boxes = np.asarray(boxes, np.float64)
    scores = np.asarray(scores, np.float64)
    if len(boxes) == 0:
        return boxes, scores, np.zeros((0,), np.int64)
    order = np.argsort(-scores, kind="stable")
    b, s = boxes[order], scores[order]
    bev = jnp.asarray(b[:, [0, 1, 3, 4, 6]], jnp.float32)
    iou = np.asarray(boxes_iou_bev(bev, bev), np.float64)

    n = len(b)
    suppressed = np.zeros(n, bool)
    keep: List[int] = []
    merged: List[np.ndarray] = []
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(i)
        later = np.arange(i + 1, n)
        suppressed[later] |= iou[i, later] > nms_thr
        cand = later[iou[i, later] > merge_thr]
        if len(cand) > 2:
            median_yaw = np.sort(b[cand, 6])[len(cand) // 2]
        else:
            median_yaw = b[i, 6]
        diff = b[cand, 6] - median_yaw
        diff = (diff + np.pi) % (2 * np.pi) - np.pi
        sel = cand[np.abs(diff) < yaw_tol]
        w = np.concatenate([[s[i]], s[sel]])
        data = np.concatenate([b[i][None], b[sel]], axis=0).copy()
        # unwrap yaws to the kept box's branch before averaging: raw
        # values straddling +-pi (e.g. 3.1 and -3.1) would otherwise
        # average to ~0 — a heading flipped by ~pi
        data[:, 6] = b[i, 6] + ((data[:, 6] - b[i, 6] + np.pi) %
                                (2 * np.pi) - np.pi)
        merged.append((w[:, None] * data).sum(0) / w.sum())
    keep = np.asarray(keep, np.int64)
    return np.stack(merged), s[keep], order[keep]


def merge_aug_bboxes_3d(aug_results: List[dict],
                        aug_metas: List[dict],
                        score_thr: float = 0.0,
                        nms_thr: float = 0.25,
                        max_num: int = 500,
                        use_weighted_nms: bool = False,
                        merge_thr: float = 0.7) -> dict:
    """Undo per-view TTA transforms, concatenate, NMS
    (`merge_augs.py:merge_aug_bboxes_3d`); with ``use_weighted_nms`` the
    kept boxes are score-weighted averages of their high-IoU cluster
    (TorchEx wnms semantics, `merge_augs.py:49-52`).

    aug_metas[i] may carry pcd_horizontal_flip / pcd_vertical_flip /
    pcd_scale_factor / pcd_rotation (scalar yaw) describing view i.

    Inverse order contract: forward views compose flip -> rotate ->
    scale (MultiScaleFlipAug3D applies its flips before the wrapped
    transforms, where any GlobalRotScaleTrans rotates then scales), so
    the undo here is scale^-1 -> rotate^-1 -> flip^-1. Flips and
    isotropic scaling commute; rotation does not commute with flips, so
    a rotation applied BEFORE the flips would need a different inverse.
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
    np_boxes = np.concatenate(boxes_list)
    np_scores = np.concatenate(scores_list)
    np_labels = np.concatenate(labels_list)
    np_valid = np.concatenate(mask_list).astype(bool)
    np_valid &= np_scores > score_thr
    if use_weighted_nms:
        # per-class wnms (the reference's merge loops classes,
        # `merge_augs.py:77-89`)
        out_b, out_s, out_l = [], [], []
        for c in np.unique(np_labels[np_valid]):
            sel = np_valid & (np_labels == c)
            mb, ms, _ = weighted_nms(np_boxes[sel], np_scores[sel],
                                     nms_thr=nms_thr, merge_thr=merge_thr)
            out_b.append(mb)
            out_s.append(ms)
            out_l.append(np.full(len(ms), c, np_labels.dtype))
        if not out_b:
            out_b = [np.zeros((0,) + np_boxes.shape[1:])]
            out_s, out_l = [np.zeros((0,))], [np.zeros((0,), np.int64)]
        mb = np.concatenate(out_b)
        ms = np.concatenate(out_s)
        ml = np.concatenate(out_l)
        order = np.argsort(-ms, kind="stable")[:max_num]
        return dict(bboxes=mb[order].astype(np_boxes.dtype),
                    scores=ms[order].astype(np_scores.dtype),
                    labels=ml[order],
                    mask=ms[order] > score_thr)
    boxes = jnp.asarray(np_boxes)
    scores = jnp.asarray(np_scores)
    labels = jnp.asarray(np_labels)
    valid = jnp.asarray(np_valid)
    keep = nms_bev_mask(boxes[:, [0, 1, 3, 4, 6]], scores, nms_thr, valid)
    k = min(max_num, boxes.shape[0])
    topv, topi = jax.lax.top_k(jnp.where(keep, scores, 0.0), k)
    return dict(bboxes=np.asarray(boxes[topi]),
                scores=np.asarray(topv),
                labels=np.asarray(labels[topi]),
                mask=np.asarray(topv > score_thr))