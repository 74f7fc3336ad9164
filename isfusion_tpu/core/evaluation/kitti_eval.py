"""KITTI 3D detection metrics (numba-free numpy).

Parity: `mmdet3d/core/evaluation/kitti_utils/eval.py` — per-class AP at
difficulty levels (easy/moderate/hard via 2D box height, occlusion,
truncation), matched by rotated 3D / BEV IoU with class-specific
thresholds (0.7 car, 0.5 pedestrian/cyclist), 40-point interpolated AP.
The reference runs numba kernels; here the pairwise rotated IoU reuses the
framework's vectorized geometry (`ops/box_ops.py`) on host.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

DIFFICULTY = {
    0: dict(min_height=40, max_occlusion=0, max_truncation=0.15),
    1: dict(min_height=25, max_occlusion=1, max_truncation=0.30),
    2: dict(min_height=25, max_occlusion=2, max_truncation=0.50),
}
OVERLAP_TH = {"car": 0.7, "pedestrian": 0.5, "cyclist": 0.5}


def _rotated_iou(boxes1: np.ndarray, boxes2: np.ndarray,
                 mode: str = "3d") -> np.ndarray:
    """(N, 7) x (M, 7) LiDAR boxes -> (N, M) IoU via the jnp geometry."""
    import jax.numpy as jnp
    from ...ops.box_ops import boxes_iou_3d, boxes_iou_bev
    if len(boxes1) == 0 or len(boxes2) == 0:
        return np.zeros((len(boxes1), len(boxes2)))
    a, b = jnp.asarray(boxes1), jnp.asarray(boxes2)
    if mode == "bev":
        return np.asarray(boxes_iou_bev(a[:, [0, 1, 3, 4, 6]],
                                        b[:, [0, 1, 3, 4, 6]]))
    return np.asarray(boxes_iou_3d(a[:, :7], b[:, :7]))


def _gt_difficulty_mask(gt: dict, level: int) -> np.ndarray:
    cfg = DIFFICULTY[level]
    n = len(gt["boxes"])
    height = gt.get("bbox2d_height", np.full(n, 50.0))
    occ = gt.get("occluded", np.zeros(n))
    trunc = gt.get("truncated", np.zeros(n))
    return (height >= cfg["min_height"]) & \
        (occ <= cfg["max_occlusion"]) & (trunc <= cfg["max_truncation"])


def _class_ap(dets: List[dict], gts: List[dict], cls: int, iou_th: float,
              level: int, mode: str) -> float:
    rows = []
    npos = 0
    per_sample_iou = []
    per_sample_care = []
    for s, (det, gt) in enumerate(zip(dets, gts)):
        gmask = gt["labels"] == cls
        care = gmask & _gt_difficulty_mask(gt, level)
        npos += int(care.sum())
        dmask = det["labels"] == cls
        dii = np.nonzero(dmask)[0]
        iou = _rotated_iou(det["boxes"][dii], gt["boxes"], mode)
        per_sample_iou.append((dii, iou))
        per_sample_care.append((gmask, care))
        for k, i in enumerate(dii):
            rows.append((float(det["scores"][i]), s, k))
    if npos == 0 or not rows:
        return float("nan")
    rows.sort(key=lambda r: -r[0])
    taken = set()
    tp, fp = [], []
    for score, s, k in rows:
        dii, iou = per_sample_iou[s]
        gmask, care = per_sample_care[s]
        cand = np.where(gmask, iou[k], -1.0)
        cand[[j for j in range(len(cand)) if (s, j) in taken]] = -1.0
        j = int(np.argmax(cand)) if cand.size else -1
        if j >= 0 and cand[j] >= iou_th:
            taken.add((s, j))
            if care[j]:
                tp.append(1)
                fp.append(0)
            else:
                continue  # matched a don't-care GT: ignore detection
        else:
            tp.append(0)
            fp.append(1)
    tp = np.cumsum(tp)
    fp = np.cumsum(fp)
    rec = tp / npos
    prec = tp / np.maximum(tp + fp, 1)
    # 40-point interpolation
    ap = 0.0
    for r in np.linspace(0.025, 1.0, 40):
        p = prec[rec >= r].max() if (rec >= r).any() else 0.0
        ap += p / 40
    return float(ap)


def kitti_eval(dets: List[dict], gts: List[dict],
               class_names: Sequence[str],
               modes: Sequence[str] = ("bev", "3d")) -> Dict[str, float]:
    """dets: per-sample dict(boxes (K,7) LiDAR, scores, labels[, mask]);
    gts: dict(boxes, labels[, occluded, truncated, bbox2d_height])."""
    dets = [
        {k: np.asarray(d[k])[np.asarray(d["mask"], bool)]
         if "mask" in d and k in ("boxes", "scores", "labels") else
         np.asarray(d[k]) for k in ("boxes", "scores", "labels")}
        for d in [dict(d, boxes=d.get("boxes", d.get("bboxes")))
                  for d in dets]]
    out: Dict[str, float] = {}
    levels = {0: "easy", 1: "moderate", 2: "hard"}
    for ci, name in enumerate(class_names):
        th = OVERLAP_TH.get(name.lower(), 0.5)
        for mode in modes:
            for lvl, lname in levels.items():
                ap = _class_ap(dets, gts, ci, th, lvl, mode)
                if not np.isnan(ap):
                    out[f"{name}_{mode}_{lname}"] = ap
    aps3d = [v for k, v in out.items() if "_3d_moderate" in k]
    out["mAP_3d_moderate"] = float(np.mean(aps3d)) if aps3d else 0.0
    return out
