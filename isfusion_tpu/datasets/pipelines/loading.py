"""Loading transforms (host, numpy/PIL).

Parity: `mmdet3d/datasets/pipelines/loading.py`
(LoadMultiViewImageFromFilesV2:15, LoadPointsFromFile:1345,
LoadPointsFromMultiSweeps:735, LoadAnnotations3D:1530).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from ...registry import PIPELINES
from ...core.points import get_points_type


def _read_points_bin(path: str, load_dim: int) -> np.ndarray:
    if path.endswith(".npy"):
        pts = np.load(path)
    else:
        pts = np.fromfile(path, dtype=np.float32)
    return pts.reshape(-1, load_dim)


@PIPELINES.register_module()
class LoadPointsFromFile:
    """Load (N, load_dim) LiDAR points -> results['points']
    (`loading.py:1345`)."""

    def __init__(self, coord_type: str = "LIDAR", load_dim: int = 5,
                 use_dim: Sequence[int] = (0, 1, 2, 3),
                 shift_height: bool = False, file_client_args=None):
        if isinstance(use_dim, int):
            use_dim = list(range(use_dim))
        self.coord_type = coord_type
        self.load_dim = load_dim
        self.use_dim = list(use_dim)
        self.shift_height = shift_height

    def __call__(self, results: dict) -> dict:
        pts = _read_points_bin(results["pts_filename"], self.load_dim)
        pts = pts[:, self.use_dim]
        attribute_dims = None
        if self.shift_height:
            floor = np.percentile(pts[:, 2], 0.99)
            pts = np.concatenate([pts, (pts[:, 2] - floor)[:, None]], 1)
            attribute_dims = dict(height=pts.shape[1] - 1)
        cls = get_points_type(self.coord_type)
        results["points"] = cls(pts, points_dim=pts.shape[-1],
                                attribute_dims=attribute_dims)
        return results


@PIPELINES.register_module()
class LoadPointsFromMultiSweeps:
    """Aggregate N past sweeps with a time-lag channel (`loading.py:735`)."""

    def __init__(self, sweeps_num: int = 10,
                 load_dim: int = 5, use_dim: Sequence[int] = (0, 1, 2, 4),
                 pad_empty_sweeps: bool = False, remove_close: bool = True,
                 test_mode: bool = False, file_client_args=None):
        if isinstance(use_dim, int):
            use_dim = list(range(use_dim))
        self.sweeps_num = sweeps_num
        self.load_dim = load_dim
        self.use_dim = list(use_dim)
        self.pad_empty_sweeps = pad_empty_sweeps
        self.remove_close = remove_close
        self.test_mode = test_mode

    @staticmethod
    def _remove_close(points: np.ndarray, radius: float = 1.0) -> np.ndarray:
        keep = (np.abs(points[:, 0]) >= radius) | \
            (np.abs(points[:, 1]) >= radius)
        return points[keep]

    def __call__(self, results: dict) -> dict:
        points = results["points"]
        # add the time-lag channel (0 for the key frame)
        pts = points.tensor
        if pts.shape[1] > 4:
            pts[:, 4] = 0.0
        sweep_points = [pts]
        ts = results.get("timestamp", 0) / 1e6
        sweeps = results.get("sweeps", [])
        if len(sweeps) == 0 and self.pad_empty_sweeps:
            for _ in range(self.sweeps_num):
                sweep_points.append(
                    self._remove_close(pts) if self.remove_close else pts)
        else:
            if len(sweeps) <= self.sweeps_num:
                choices = np.arange(len(sweeps))
            elif self.test_mode:
                choices = np.arange(self.sweeps_num)
            else:
                choices = np.random.choice(len(sweeps), self.sweeps_num,
                                           replace=False)
            for idx in choices:
                sweep = sweeps[idx]
                raw = _read_points_bin(sweep["data_path"], self.load_dim)
                if self.remove_close:
                    raw = self._remove_close(raw)
                sweep_ts = sweep["timestamp"] / 1e6
                r = np.asarray(sweep["sensor2lidar_rotation"], np.float32)
                t = np.asarray(sweep["sensor2lidar_translation"], np.float32)
                raw[:, :3] = raw[:, :3] @ r.T + t
                raw[:, 4] = ts - sweep_ts
                sweep_points.append(raw)
        pts = np.concatenate(sweep_points, axis=0)[:, self.use_dim]
        results["points"] = points.new_point(pts)
        return results


@PIPELINES.register_module()
class LoadMultiViewImageFromFilesV2:
    """Load the 6 camera views as float arrays (`loading.py:15` keeps PIL
    images for later resizing in ImageAug3D; we do the same via PIL when
    available)."""

    def __init__(self, to_float32: bool = False, color_type: str = "color"):
        self.to_float32 = to_float32

    def __call__(self, results: dict) -> dict:
        from PIL import Image
        filenames = results["img_filename"]
        results["filename"] = filenames
        imgs = [Image.open(name) for name in filenames]
        results["img"] = imgs
        results["ori_shape"] = imgs[0].size  # PIL (W, H)
        results["img_fields"] = ["img"]
        return results


@PIPELINES.register_module()
class LoadAnnotations3D:
    """Pull gt boxes/labels from ann_info into the working dict
    (`loading.py:1530`)."""

    def __init__(self, with_bbox_3d: bool = True, with_label_3d: bool = True,
                 with_attr_label: bool = False, **kwargs):
        self.with_bbox_3d = with_bbox_3d
        self.with_label_3d = with_label_3d
        self.with_attr_label = with_attr_label

    def __call__(self, results: dict) -> dict:
        ann = results["ann_info"]
        if self.with_bbox_3d:
            results["gt_bboxes_3d"] = ann["gt_bboxes_3d"]
            results.setdefault("bbox3d_fields", []).append("gt_bboxes_3d")
        if self.with_label_3d:
            results["gt_labels_3d"] = np.asarray(ann["gt_labels_3d"],
                                                 np.int64)
        if self.with_attr_label and "attr_labels" in ann:
            results["attr_labels"] = ann["attr_labels"]
        return results
