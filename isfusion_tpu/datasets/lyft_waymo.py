"""Lyft and Waymo datasets.

Parity: `mmdet3d/datasets/lyft_dataset.py` (nuScenes-style info pkls,
9-class taxonomy, Lyft mAP protocol approximated by the same
center-distance evaluator) and `waymo_dataset.py` (KITTI-format infos —
subclass of KittiDataset with Waymo classes and 5-view layout).
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..registry import DATASETS
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
        # Lyft's official metric is mAP over IoU thresholds; the shared
        # center-distance evaluator serves as the internal stand-in.
        return self._evaluate_internal(results)


@DATASETS.register_module()
class WaymoDataset(KittiDataset):
    CLASSES = ('car', 'pedestrian', 'cyclist')

    def __init__(self, *args, load_interval: int = 1, **kwargs):
        self.load_interval = load_interval
        super().__init__(*args, **kwargs)

    def load_annotations(self, ann_file: str):
        infos = super().load_annotations(ann_file)
        return infos[::self.load_interval]
