"""Base 3D dataset: info-pkl loading + pipeline + epoch propagation.

Parity: `mmdet3d/datasets/custom_3d.py` (Custom3DDataset) — pipeline
compose, `set_epoch:73` forwarding to epoch-scheduled transforms,
train/test prepare with invalid-sample retry.
"""
from __future__ import annotations

import pickle
from typing import List, Optional

import numpy as np

from ..registry import DATASETS
from ..core.bbox.structures import get_box_type
from .pipelines import Compose


@DATASETS.register_module()
class Custom3DDataset:
    CLASSES: tuple = ()

    def __init__(self, data_root: str, ann_file: str, pipeline=None,
                 classes=None, modality=None, box_type_3d: str = "LiDAR",
                 filter_empty_gt: bool = True, test_mode: bool = False,
                 **kwargs):
        self.data_root = data_root
        self.ann_file = ann_file
        self.modality = modality or {}
        self.filter_empty_gt = filter_empty_gt
        self.test_mode = test_mode
        self.box_type_3d, self.box_mode_3d = get_box_type(box_type_3d)
        self.CLASSES = tuple(classes) if classes else type(self).CLASSES
        self.cat2id = {name: i for i, name in enumerate(self.CLASSES)}
        self.data_infos = self.load_annotations(ann_file)
        self.pipeline = Compose(pipeline) if pipeline is not None else None
        self.epoch = 0

    # -------------------------------------------------------------- infos
    def load_annotations(self, ann_file: str) -> List[dict]:
        with open(ann_file, "rb") as f:
            data = pickle.load(f)
        if isinstance(data, dict) and "infos" in data:
            infos = data["infos"]
            self.metadata = data.get("metadata", {})
        else:
            infos = data
            self.metadata = {}
        return list(infos)

    def set_epoch(self, epoch: int) -> None:
        """`runner` hook: drive stop_epoch-scheduled transforms
        (`custom_3d.py:73`, CustomEpochBasedRunner)."""
        self.epoch = epoch
        if self.pipeline is not None:
            self.pipeline.set_epoch(epoch)

    def get_data_info(self, index: int) -> dict:
        raise NotImplementedError

    def get_ann_info(self, index: int) -> dict:
        raise NotImplementedError

    def get_cat_ids(self, idx: int) -> List[int]:
        """Category ids present in a sample (CBGS support,
        `nuscenes_dataset.py:154`)."""
        ann = self.get_ann_info(idx)
        labels = np.asarray(ann["gt_labels_3d"])
        return list(np.unique(labels[labels >= 0]).tolist())

    # ----------------------------------------------------------- pipeline
    def pre_pipeline(self, results: dict) -> None:
        results["box_type_3d"] = self.box_type_3d
        results["box_mode_3d"] = self.box_mode_3d
        results["bbox3d_fields"] = []
        results["img_fields"] = []

    def prepare_train_data(self, index: int) -> Optional[dict]:
        input_dict = self.get_data_info(index)
        if input_dict is None:
            return None
        self.pre_pipeline(input_dict)
        example = self.pipeline(input_dict)
        if example is None:
            return None
        if self.filter_empty_gt and "gt_mask" in example and \
                not example["gt_mask"].any():
            return None
        return example

    def prepare_test_data(self, index: int) -> dict:
        input_dict = self.get_data_info(index)
        self.pre_pipeline(input_dict)
        return self.pipeline(input_dict)

    def __getitem__(self, idx: int):
        if self.test_mode:
            return self.prepare_test_data(idx)
        while True:
            data = self.prepare_train_data(idx)
            if data is not None:
                return data
            idx = np.random.randint(len(self))

    def __len__(self) -> int:
        return len(self.data_infos)
