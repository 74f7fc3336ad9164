"""Indoor detection metrics (parity: `mmdet3d/core/evaluation/
indoor_eval.py`): per-class AP at 3D IoU 0.25 / 0.5 over depth-frame
boxes, 11-point interpolation."""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def _iou3d(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp
    from ...ops.box_ops import boxes_iou_3d
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    return np.asarray(boxes_iou_3d(jnp.asarray(a[:, :7]),
                                   jnp.asarray(b[:, :7])))


def indoor_eval(dets: List[dict], gts: List[dict],
                class_names: Sequence[str],
                iou_thrs: Sequence[float] = (0.25, 0.5)) -> Dict[str, float]:
    out: Dict[str, float] = {}
    for th in iou_thrs:
        aps = []
        for ci, name in enumerate(class_names):
            rows = []
            npos = 0
            ious = []
            for s, (det, gt) in enumerate(zip(dets, gts)):
                gmask = gt["labels"] == ci
                npos += int(gmask.sum())
                dmask = det["labels"] == ci
                dii = np.nonzero(dmask)[0]
                ious.append((dii, _iou3d(det["boxes"][dii], gt["boxes"]),
                             gmask))
                for k, i in enumerate(dii):
                    rows.append((float(det["scores"][i]), s, k))
            if npos == 0:
                continue
            rows.sort(key=lambda r: -r[0])
            taken = set()
            tp, fp = [], []
            for score, s, k in rows:
                dii, iou, gmask = ious[s]
                cand = np.where(gmask, iou[k], -1.0)
                for j in range(len(cand)):
                    if (s, j) in taken:
                        cand[j] = -1.0
                j = int(np.argmax(cand)) if cand.size else -1
                if j >= 0 and cand[j] >= th:
                    taken.add((s, j))
                    tp.append(1)
                    fp.append(0)
                else:
                    tp.append(0)
                    fp.append(1)
            tp, fp = np.cumsum(tp), np.cumsum(fp)
            rec = tp / npos
            prec = tp / np.maximum(tp + fp, 1)
            ap = 0.0
            for r in np.arange(0, 1.01, 0.1):
                p = prec[rec >= r].max() if (rec >= r).any() else 0.0
                ap += p / 11
            out[f"{name}_AP_{th:.2f}"] = float(ap)
            aps.append(ap)
        out[f"mAP_{th:.2f}"] = float(np.mean(aps)) if aps else 0.0
    return out
