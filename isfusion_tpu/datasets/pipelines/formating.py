"""Formatting: pad everything to fixed capacities and collect device keys.

Parity: `mmdet3d/datasets/pipelines/formating.py` (DefaultFormatBundle3D:257,
Collect3DV2:184). TPU-native change: instead of DataContainers with dynamic
lengths, every array is padded to a static capacity with a validity mask —
the device batch contract the models consume (SURVEY.md §7 decision 1).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ...registry import PIPELINES


def pad_to(arr: np.ndarray, n: int, fill=0.0):
    """Pad/truncate leading dim to n; returns (padded, mask).

    Overflow takes a UNIFORM deterministic stride subsample, not a
    prefix: generators/loggers often write points in structured order
    (ground first, objects last), so a prefix cut deletes whole objects
    — measured as mAP 0.0 on the synthetic val split whose 122k-point
    clouds overflowed max_points=65536 (round 5; train survived only
    because PointShuffle runs before the bundle). Aligned arrays (boxes
    + labels + ...) stay aligned: selection depends only on (m, n)."""
    m = arr.shape[0]
    mask = np.zeros((n,), bool)
    out = np.full((n,) + arr.shape[1:], fill, arr.dtype)
    k = min(m, n)
    if m > n:
        out[:k] = arr[(np.arange(k, dtype=np.int64) * m) // k]
    else:
        out[:k] = arr[:k]
    mask[:k] = True
    return out, mask


@PIPELINES.register_module()
class DefaultFormatBundle3D:
    """Convert points/boxes/images to padded numpy arrays
    (`formating.py:257`)."""

    def __init__(self, class_names=None, max_points: int = 250000,
                 max_gt: int = 128, with_label: bool = True):
        self.class_names = class_names
        self.max_points = int(max_points)
        self.max_gt = int(max_gt)
        self.with_label = with_label

    def __call__(self, results: dict) -> dict:
        if "points" in results:
            pts = results["points"].numpy().astype(np.float32)
            results["points"], results["points_mask"] = pad_to(
                pts, self.max_points)
        if "img" in results:
            imgs = [np.asarray(i, np.float32) for i in results["img"]]
            results["img"] = np.stack(imgs)  # (Nv, H, W, 3)
        if self.with_label and "gt_bboxes_3d" in results:
            boxes = results["gt_bboxes_3d"]
            arr = boxes.numpy().astype(np.float32) \
                if hasattr(boxes, "numpy") else np.asarray(boxes, np.float32)
            if arr.shape[-1] < 9:
                arr = np.concatenate(
                    [arr, np.zeros((arr.shape[0], 9 - arr.shape[-1]),
                                   np.float32)], -1)
            results["gt_bboxes_3d"], results["gt_mask"] = pad_to(
                arr, self.max_gt)
            labels, _ = pad_to(
                np.asarray(results["gt_labels_3d"], np.int32), self.max_gt)
            results["gt_labels_3d"] = labels
        return results


@PIPELINES.register_module()
class Collect3DV2:
    """Keep device keys as arrays + host metadata under 'img_metas'
    (`formating.py:184`)."""

    DEVICE_KEYS = ("points", "points_mask", "img", "gt_bboxes_3d",
                   "gt_labels_3d", "gt_mask", "lidar2img",
                   "img_aug_matrix", "lidar_aug_matrix", "img_view_mask")

    def __init__(self, keys: Sequence[str],
                 meta_keys: Optional[Sequence[str]] = None):
        self.keys = list(keys)
        self.meta_keys = list(meta_keys or (
            "sample_idx", "token", "pts_filename", "filename", "ori_shape",
            "box_type_3d", "timestamp"))

    def __call__(self, results: dict) -> dict:
        out = {}
        for k in self.keys:
            if k in results:
                v = results[k]
                out[k] = np.asarray(v) if not isinstance(v, np.ndarray) \
                    else v
        for k in ("points_mask", "gt_mask", "img_aug_matrix",
                  "lidar_aug_matrix", "img_view_mask", "lidar2img"):
            if k in results and k not in out:
                out[k] = np.asarray(results[k])
        out["img_metas"] = {k: results[k] for k in self.meta_keys
                            if k in results}
        return out


@PIPELINES.register_module()
class Collect3D(Collect3DV2):
    """Alias of Collect3DV2 for configs using the older name."""
