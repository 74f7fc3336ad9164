"""Lyft and Waymo datasets.

Parity: `mmdet3d/datasets/lyft_dataset.py` (nuScenes-style info pkls,
9-class taxonomy, official Lyft IoU-threshold mAP protocol via
`core/evaluation/lyft_eval.py`) and `waymo_dataset.py` (KITTI-format
infos — subclass of KittiDataset with Waymo classes and 5-view layout).
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..registry import DATASETS
from .custom_3d import Custom3DDataset
from .kitti_dataset import KittiDataset
from .nuscenes_dataset import NuScenesDataset


@DATASETS.register_module()
class LyftDataset(NuScenesDataset):
    CLASSES = ('car', 'truck', 'bus', 'emergency_vehicle',
               'other_vehicle', 'motorcycle', 'bicycle', 'pedestrian',
               'animal')
    NameMapping = {c: c for c in CLASSES}
    DefaultAttribute = {c: '' for c in CLASSES}

    def __init__(self, *args, with_velocity: bool = False, **kwargs):
        super().__init__(*args, with_velocity=with_velocity, **kwargs)

    def evaluate(self, results: List[dict], metric="bbox", **kwargs):
        """Official Lyft protocol: mAP over 3D-IoU thresholds 0.5:0.95
        (`mmdet3d/core/evaluation/lyft_eval.py:97-140`, invoked at
        `lyft_dataset.py:296`) — NOT the nuScenes center-distance metric."""
        from ..core.evaluation.lyft_eval import lyft_eval_core
        gts = []
        for info in self.data_infos:
            boxes = np.asarray(info["gt_boxes"], np.float64).copy()
            # info boxes carry GRAVITY-center z (reference info format;
            # get_ann_info loads them with origin=(0.5,0.5,0.5));
            # predictions and iou_3d use bottom-center z — shift down
            if boxes.shape[0]:
                boxes[:, 2] -= boxes[:, 5] / 2.0
            labels = np.asarray(
                [self.cat2id.get(n, -1) for n in info["gt_names"]],
                np.int64)
            gts.append(dict(boxes=boxes, labels=labels))
        metrics = lyft_eval_core(results, gts, list(self.CLASSES))
        out = {f"mAP_{c}": v for c, v in
               zip(metrics["class_names"], metrics["mAPs_cate"])}
        out["mAP"] = metrics["Final mAP"]
        out["detail"] = metrics
        return out


@DATASETS.register_module()
class WaymoDataset(KittiDataset):
    CLASSES = ('car', 'pedestrian', 'cyclist')

    def __init__(self, *args, load_interval: int = 1, **kwargs):
        self.load_interval = load_interval
        super().__init__(*args, **kwargs)

    def load_annotations(self, ann_file: str):
        infos = super().load_annotations(ann_file)
        return infos[::self.load_interval]


@DATASETS.register_module()
class SemanticKITTIDataset(Custom3DDataset):
    """SemanticKITTI point-cloud segmentation dataset
    (`mmdet3d/datasets/semantickitti_dataset.py:9`): info pkls point at
    velodyne .bin scans + per-point .label files; evaluation is
    confusion-matrix mIoU (`core/evaluation/seg_eval.py`)."""

    CLASSES = ('unlabeled', 'car', 'bicycle', 'motorcycle', 'truck', 'bus',
               'person', 'bicyclist', 'motorcyclist', 'road', 'parking',
               'sidewalk', 'other-ground', 'building', 'fence',
               'vegetation', 'trunck', 'terrian', 'pole', 'traffic-sign')

    # semantic-kitti-api learning_map: raw .label ids -> the 20 train ids
    # above (moving classes fold into their static counterparts). The
    # reference dataset is skeletal and compares raw ids directly, which
    # is meaningless on real scans (road=40 lands past num_classes);
    # .label files are remapped through this on load (r3).
    LEARNING_MAP = {
        0: 0, 1: 0, 10: 1, 11: 2, 13: 5, 15: 3, 16: 5, 18: 4, 20: 5,
        30: 6, 31: 7, 32: 8, 40: 9, 44: 10, 48: 11, 49: 12, 50: 13,
        51: 14, 52: 0, 60: 9, 70: 15, 71: 16, 72: 17, 80: 18, 81: 19,
        99: 0, 252: 1, 253: 7, 254: 6, 255: 8, 256: 5, 257: 5, 258: 4,
        259: 5,
    }

    def __init__(self, data_root, ann_file, pipeline=None, classes=None,
                 modality=None, box_type_3d="LiDAR",
                 filter_empty_gt=False, test_mode=False, **kwargs):
        super().__init__(data_root=data_root, ann_file=ann_file,
                         pipeline=pipeline, classes=classes,
                         modality=modality, box_type_3d=box_type_3d,
                         filter_empty_gt=filter_empty_gt,
                         test_mode=test_mode, **kwargs)

    def get_data_info(self, index: int) -> dict:
        info = self.data_infos[index]
        input_dict = dict(
            sample_idx=info.get("sample_idx", index),
            pts_filename=info["lidar_path"],
        )
        if not self.test_mode:
            input_dict["ann_info"] = dict(
                pts_semantic_mask_path=info.get("pts_semantic_mask_path"))
        return input_dict

    def evaluate(self, results, metric=None, **kwargs) -> dict:
        """results: per-sample dicts with 'semantic_mask' predictions;
        GT loaded from each info's pts_semantic_mask_path (.label or
        .npy)."""
        from ..core.evaluation.seg_eval import seg_eval
        gts, preds = [], []
        for idx, res in enumerate(results):
            path = self.data_infos[idx].get("pts_semantic_mask_path")
            if path and path.endswith(".npy"):
                gt = np.load(path)          # already train-id space
            elif path:
                raw = np.fromfile(path, dtype=np.uint32) & 0xFFFF
                gt = self.remap_labels(raw)
            else:
                continue
            gts.append(gt.astype(np.int64))
            preds.append(np.asarray(res["semantic_mask"]))
        label2cat = {i: c for i, c in enumerate(self.CLASSES)}
        return seg_eval(gts, preds, label2cat, ignore_index=0)

    @classmethod
    def remap_labels(cls, raw: np.ndarray) -> np.ndarray:
        """Raw SemanticKITTI ids -> train ids via LEARNING_MAP (unknown
        ids -> 0/unlabeled)."""
        lut = np.zeros(max(cls.LEARNING_MAP) + 1, np.int64)
        for k, v in cls.LEARNING_MAP.items():
            lut[k] = v
        raw = np.asarray(raw, np.int64)
        return lut[np.clip(raw, 0, len(lut) - 1) *
                   (raw < len(lut))]
