"""Indoor datasets: ScanNet, SUN RGB-D, S3DIS.

Parity: `mmdet3d/datasets/{scannet,sunrgbd,s3dis}_dataset.py` — info-pkl
driven point-cloud scenes with depth-frame boxes, optional per-point
instance/semantic masks, evaluated with indoor AP at IoU 0.25/0.5.
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..registry import DATASETS
from .custom_3d import Custom3DDataset


class _IndoorDataset(Custom3DDataset):
    ALIGNED = False   # ScanNet: ann_info carries axis_align_matrix

    def __init__(self, ann_file: str, pipeline=None, data_root: str = "",
                 classes=None, box_type_3d: str = "Depth", **kwargs):
        super().__init__(data_root=data_root, ann_file=ann_file,
                         pipeline=pipeline, classes=classes,
                         box_type_3d=box_type_3d, **kwargs)

    def get_data_info(self, index: int) -> dict:
        info = self.data_infos[index]
        pc = info.get("point_cloud", {})
        input_dict = dict(
            sample_idx=pc.get("idx", index),
            token=str(pc.get("idx", index)),
            pts_filename=info.get("pts_path",
                                  pc.get("pts_path", "")),
            timestamp=index)
        for key in ("pts_instance_mask_path", "pts_semantic_mask_path"):
            if key in info:
                input_dict[key] = info[key]
        if not self.test_mode:
            input_dict["ann_info"] = self.get_ann_info(index)
        return input_dict

    def get_ann_info(self, index: int) -> dict:
        info = self.data_infos[index]
        annos = info["annos"]
        boxes = np.asarray(annos.get("gt_boxes_upright_depth",
                                     np.zeros((0, 7))), np.float32)
        if boxes.shape[-1] == 6:  # yaw-free datasets (ScanNet)
            boxes = np.concatenate(
                [boxes, np.zeros((len(boxes), 1), np.float32)], -1)
        names = np.asarray(annos.get("name", annos.get("class",
                                                       np.array([]))))
        labels = np.asarray([self.cat2id.get(str(n), -1) for n in names],
                            np.int64)
        gt = self.box_type_3d(boxes, box_dim=boxes.shape[-1],
                              origin=(0.5, 0.5, 0.5))
        ann = dict(gt_bboxes_3d=gt, gt_labels_3d=labels, gt_names=names)
        if self.ALIGNED:
            # ScanNet scenes carry a scene-to-axis-aligned 4x4 (consumed
            # by GlobalAlignment, reference scannet_dataset.py ann_info);
            # identity when the info pkl predates alignment export
            ann["axis_align_matrix"] = np.asarray(
                annos.get("axis_align_matrix", np.eye(4)), np.float32)
        return ann

    def evaluate(self, results: List[dict], metric=None, **kwargs) -> dict:
        from ..core.evaluation.indoor_eval import indoor_eval
        gts = []
        for i in range(len(results)):
            ann = self.get_ann_info(i)
            gts.append(dict(boxes=ann["gt_bboxes_3d"].numpy(),
                            labels=ann["gt_labels_3d"]))
        dets = [dict(boxes=np.asarray(d.get("bboxes", d.get("boxes")))[
                     np.asarray(d["mask"], bool)] if "mask" in d else
                     np.asarray(d.get("bboxes", d.get("boxes"))),
                     scores=np.asarray(d["scores"])[
                     np.asarray(d["mask"], bool)] if "mask" in d else
                     np.asarray(d["scores"]),
                     labels=np.asarray(d["labels"])[
                     np.asarray(d["mask"], bool)] if "mask" in d else
                     np.asarray(d["labels"]))
                for d in results]
        return indoor_eval(dets, gts, list(self.CLASSES))


@DATASETS.register_module()
class ScanNetDataset(_IndoorDataset):
    ALIGNED = True
    CLASSES = ('cabinet', 'bed', 'chair', 'sofa', 'table', 'door',
               'window', 'bookshelf', 'picture', 'counter', 'desk',
               'curtain', 'refrigerator', 'showercurtrain', 'toilet',
               'sink', 'bathtub', 'garbagebin')


@DATASETS.register_module()
class SUNRGBDDataset(_IndoorDataset):
    CLASSES = ('bed', 'table', 'sofa', 'chair', 'toilet', 'desk',
               'dresser', 'night_stand', 'bookshelf', 'bathtub')


@DATASETS.register_module()
class S3DISDataset(_IndoorDataset):
    CLASSES = ('table', 'chair', 'sofa', 'bookcase', 'board')
