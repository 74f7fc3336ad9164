"""Dataset wrappers.

Parity: `mmdet3d/datasets/dataset_wrappers.py` — CBGSDataset:8
(class-balanced resampling: duplicate indices so every class contributes
~1/num_classes of samples, `_get_sample_indices:33`) and SimpleDataset:84
(fixed repetition).
"""
from __future__ import annotations

import numpy as np

from ..registry import DATASETS, build_from_cfg


def build_dataset(cfg):
    return build_from_cfg(dict(cfg), DATASETS)


@DATASETS.register_module()
class CBGSDataset:
    def __init__(self, dataset):
        self.dataset = build_dataset(dataset) if isinstance(dataset, dict) \
            else dataset
        self.CLASSES = self.dataset.CLASSES
        self.sample_indices = self._get_sample_indices()

    def _get_sample_indices(self):
        class_sample_idxs = {i: [] for i in range(len(self.CLASSES))}
        for idx in range(len(self.dataset)):
            for cat_id in self.dataset.get_cat_ids(idx):
                if cat_id in class_sample_idxs:
                    class_sample_idxs[cat_id].append(idx)
        duplicated = sum(len(v) for v in class_sample_idxs.values())
        if duplicated == 0:
            return list(range(len(self.dataset)))
        class_distribution = {
            k: len(v) / duplicated for k, v in class_sample_idxs.items()}
        sample_indices = []
        frac = 1.0 / len(self.CLASSES)
        ratios = [frac / max(v, 1e-8) for v in class_distribution.values()]
        for cls_inds, ratio in zip(list(class_sample_idxs.values()), ratios):
            if len(cls_inds) == 0:
                continue
            sample_indices += np.random.choice(
                cls_inds, int(len(cls_inds) * ratio)).tolist()
        return sample_indices or list(range(len(self.dataset)))

    def set_epoch(self, epoch: int) -> None:
        self.dataset.set_epoch(epoch)

    def get_cat_ids(self, idx: int):
        return self.dataset.get_cat_ids(self.sample_indices[idx])

    def __getitem__(self, idx: int):
        return self.dataset[self.sample_indices[idx]]

    def __len__(self) -> int:
        return len(self.sample_indices)


@DATASETS.register_module()
class SimpleDataset:
    """Repeat a dataset ``times`` times (`dataset_wrappers.py:84`)."""

    def __init__(self, dataset, times: int = 1):
        self.dataset = build_dataset(dataset) if isinstance(dataset, dict) \
            else dataset
        self.times = int(times)
        self.CLASSES = self.dataset.CLASSES

    def set_epoch(self, epoch: int) -> None:
        self.dataset.set_epoch(epoch)

    def __getitem__(self, idx: int):
        return self.dataset[idx % len(self.dataset)]

    def __len__(self) -> int:
        return len(self.dataset) * self.times
