"""Self-contained nuScenes detection metrics (devkit-free).

Implements the nuScenes detection protocol (the math of
nuscenes-devkit's `nuscenes/eval/detection/algo.py`, which the reference
invokes through `NuScenesDataset._evaluate_single:421`):
- matching by BEV center distance at thresholds {0.5, 1, 2, 4} m,
  greedy over descending confidence, one match per GT;
- per-class AP = normalized area under the (recall, precision) curve with
  the (0.1, 0.1) min-recall/min-precision clipping;
- TP errors (ATE translation, ASE scale via 1-iou of aligned boxes,
  AOE orientation, AVE velocity) averaged over matches at the 2 m
  threshold and accumulated up to max recall;
- NDS = (5*mAP + sum(1 - min(1, err))) / 10.

Box layout: (x, y, z_bottom, dx, dy, dz, yaw, vx, vy) in the LiDAR frame —
metrics are frame-invariant, so evaluation happens in LiDAR coordinates
against the same info-pkl ground truth the training consumed.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

DIST_THS = (0.5, 1.0, 2.0, 4.0)
TP_DIST_TH = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1
TP_METRICS = ("trans_err", "scale_err", "orient_err", "vel_err")


def _scale_iou(gt: np.ndarray, det: np.ndarray) -> float:
    """IoU of size-aligned boxes (devkit scale_iou)."""
    minima = np.minimum(gt[3:6], det[3:6])
    inter = float(np.prod(minima))
    union = float(np.prod(gt[3:6]) + np.prod(det[3:6]) - inter)
    return inter / max(union, 1e-9)


def _yaw_diff(a: float, b: float) -> float:
    d = (a - b) % (2 * np.pi)
    return min(d, 2 * np.pi - d)


def _accumulate(dets: List[dict], gts: List[dict], cls: int,
                dist_th: float) -> Dict[str, np.ndarray]:
    """Devkit `accumulate`: greedy center-distance matching for one class
    at one threshold across all samples."""
    all_rows = []
    npos = 0
    for s, (det, gt) in enumerate(zip(dets, gts)):
        gmask = gt["labels"] == cls
        npos += int(gmask.sum())
        dmask = det["labels"] == cls
        for i in np.nonzero(dmask)[0]:
            all_rows.append((float(det["scores"][i]), s, i))
    if npos == 0 or not all_rows:
        return dict(valid=False, npos=npos)
    all_rows.sort(key=lambda r: -r[0])

    taken = {}
    tp, fp = [], []
    match_err = {k: [] for k in TP_METRICS}
    conf = []
    for score, s, i in all_rows:
        det_box = dets[s]["boxes"][i]
        gt_boxes = gts[s]["boxes"]
        gmask = gts[s]["labels"] == cls
        best_j, best_d = -1, float("inf")
        for j in np.nonzero(gmask)[0]:
            if (s, j) in taken:
                continue
            d = float(np.linalg.norm(det_box[:2] - gt_boxes[j][:2]))
            if d < best_d:
                best_d, best_j = d, j
        if best_j >= 0 and best_d < dist_th:
            taken[(s, best_j)] = True
            tp.append(1)
            fp.append(0)
            g = gt_boxes[best_j]
            match_err["trans_err"].append(best_d)
            match_err["scale_err"].append(1.0 - _scale_iou(g, det_box))
            match_err["orient_err"].append(
                _yaw_diff(float(g[6]), float(det_box[6])))
            if g.shape[0] >= 9 and det_box.shape[0] >= 9:
                match_err["vel_err"].append(
                    float(np.linalg.norm(g[7:9] - det_box[7:9])))
            else:
                match_err["vel_err"].append(0.0)
        else:
            tp.append(0)
            fp.append(1)
        conf.append(score)

    tp = np.cumsum(tp).astype(np.float64)
    fp = np.cumsum(fp).astype(np.float64)
    prec = tp / np.maximum(tp + fp, 1e-9)
    rec = tp / npos
    rec_interp = np.linspace(0, 1, 101)
    prec_i = np.interp(rec_interp, rec, prec, right=0)
    conf_i = np.interp(rec_interp, rec, np.asarray(conf, np.float64),
                       right=0)

    # cumulative-mean TP errors interpolated on the recall grid (devkit
    # uses cummean over matches then interp by recall of matches)
    out_err = {}
    n_match = int(tp[-1]) if len(tp) else 0
    for k in TP_METRICS:
        e = np.asarray(match_err[k], np.float64)
        if n_match == 0:
            out_err[k] = np.ones(101)
            continue
        cume = np.cumsum(e) / (np.arange(len(e)) + 1)
        match_rec = (np.arange(len(e)) + 1) / npos
        out_err[k] = np.interp(rec_interp, match_rec, cume,
                               right=cume[-1] if len(cume) else 1.0)
    return dict(valid=True, npos=npos, precision=prec_i, recall=rec_interp,
                confidence=conf_i, errors=out_err,
                max_recall_ind=int(round(rec[-1] * 100)) if len(rec) else 0)


def _calc_ap(md: dict) -> float:
    prec = md["precision"].copy()
    prec = prec[round(100 * MIN_RECALL) + 1:]
    prec -= MIN_PRECISION
    prec[prec < 0] = 0
    return float(prec.sum() / (prec.size * (1 - MIN_PRECISION)))


def _calc_tp(md: dict, metric: str) -> float:
    first = round(100 * MIN_RECALL) + 1
    last = md["max_recall_ind"]
    if last < first:
        return 1.0
    e = md["errors"][metric][first:last + 1]
    return float(np.mean(e)) if e.size else 1.0


def nuscenes_style_eval(dets: List[dict], gts: List[dict],
                        class_names: Sequence[str]) -> dict:
    """dets/gts: per-sample dicts with boxes (K, >=7), labels (K,), and for
    dets scores (K,) + optional mask. Returns dict with mAP, NDS, per-class
    AP and TP errors."""
    dets = [dict(boxes=np.asarray(d["bboxes"] if "bboxes" in d
                                  else d["boxes"]),
                 scores=np.asarray(d["scores"]),
                 labels=np.asarray(d["labels"]))
            if "mask" not in d else
            dict(boxes=np.asarray(d["bboxes"] if "bboxes" in d
                                  else d["boxes"])[np.asarray(d["mask"],
                                                              bool)],
                 scores=np.asarray(d["scores"])[np.asarray(d["mask"],
                                                           bool)],
                 labels=np.asarray(d["labels"])[np.asarray(d["mask"],
                                                           bool)])
            for d in dets]
    metrics = {}
    aps = []
    tp_errs = {k: [] for k in TP_METRICS}
    for ci, name in enumerate(class_names):
        cls_aps = []
        md_tp = None
        for th in DIST_THS:
            md = _accumulate(dets, gts, ci, th)
            if not md["valid"]:
                continue
            cls_aps.append(_calc_ap(md))
            if th == TP_DIST_TH:
                md_tp = md
        if cls_aps:
            ap = float(np.mean(cls_aps))
            metrics[f"{name}_AP"] = ap
            aps.append(ap)
            if md_tp is not None:
                for k in TP_METRICS:
                    v = _calc_tp(md_tp, k)
                    metrics[f"{name}_{k}"] = v
                    tp_errs[k].append(v)
    m_ap = float(np.mean(aps)) if aps else 0.0
    tp_scores = [1.0 - min(1.0, float(np.mean(v))) if v else 0.0
                 for v in tp_errs.values()]
    # devkit NDS uses 5 TP metrics (incl. attr_err, absent here: treat the
    # missing one as perfect would inflate; we renormalize over available)
    nds = (5 * m_ap + sum(tp_scores)) / (5 + len(tp_scores))
    metrics["mAP"] = m_ap
    metrics["NDS"] = float(nds)
    return metrics
