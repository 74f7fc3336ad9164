"""KITTI dataset.

Parity: `mmdet3d/datasets/kitti_dataset.py` — standard kitti info pkls
(annos with name/truncated/occluded/bbox/dimensions/location/rotation_y,
calib P2/R0_rect/Tr_velo_to_cam), camera-frame GT converted to the LiDAR
frame, evaluation via KITTI 3D/BEV AP (`core/evaluation/kitti_eval.py`).
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..registry import DATASETS
from ..core.bbox.structures import CameraInstance3DBoxes, Box3DMode
from .custom_3d import Custom3DDataset


@DATASETS.register_module()
class KittiDataset(Custom3DDataset):
    CLASSES = ("car", "pedestrian", "cyclist")

    def __init__(self, ann_file: str, pipeline=None, data_root: str = "",
                 classes=None, modality=None, box_type_3d: str = "LiDAR",
                 filter_empty_gt: bool = True, test_mode: bool = False,
                 pts_prefix: str = "velodyne", **kwargs):
        self.pts_prefix = pts_prefix
        super().__init__(data_root=data_root, ann_file=ann_file,
                         pipeline=pipeline, classes=classes,
                         modality=modality or dict(use_lidar=True,
                                                   use_camera=False),
                         box_type_3d=box_type_3d,
                         filter_empty_gt=filter_empty_gt,
                         test_mode=test_mode, **kwargs)

    def get_data_info(self, index: int) -> dict:
        info = self.data_infos[index]
        calib = info.get("calib", {})
        pc = info.get("point_cloud", {})
        input_dict = dict(
            sample_idx=pc.get("idx", index),
            token=str(pc.get("idx", index)),
            pts_filename=pc.get("velodyne_path",
                                info.get("pts_filename", "")),
            timestamp=index,
        )
        if calib:
            rect = np.asarray(calib.get("R0_rect", np.eye(4)), np.float64)
            trv2c = np.asarray(calib.get("Tr_velo_to_cam", np.eye(4)),
                               np.float64)
            p2 = np.asarray(calib.get("P2", np.eye(4)), np.float64)
            input_dict["lidar2img"] = (p2 @ rect @ trv2c).astype(
                np.float32)[None]
        if not self.test_mode:
            input_dict["ann_info"] = self.get_ann_info(index)
        return input_dict

    def get_ann_info(self, index: int) -> dict:
        info = self.data_infos[index]
        annos = info["annos"]
        keep = np.asarray([n != "DontCare" for n in annos["name"]])
        loc = np.asarray(annos["location"], np.float32)[keep]
        dims = np.asarray(annos["dimensions"], np.float32)[keep]  # lhw
        rots = np.asarray(annos["rotation_y"], np.float32)[keep]
        names = np.asarray(annos["name"])[keep]
        cam_boxes = np.concatenate(
            [loc, dims, rots[:, None]], axis=1).astype(np.float32)
        calib = info.get("calib", {})
        rect = np.asarray(calib.get("R0_rect", np.eye(4)), np.float32)
        trv2c = np.asarray(calib.get("Tr_velo_to_cam", np.eye(4)),
                           np.float32)
        cam = CameraInstance3DBoxes(cam_boxes)
        lidar_boxes = cam.convert_to(
            Box3DMode.LIDAR, rt_mat=np.linalg.inv(rect @ trv2c))
        labels = np.asarray(
            [self.cat2id.get(str(n).lower(), -1) for n in names], np.int64)
        bbox2d = np.asarray(annos.get("bbox",
                                      np.zeros((len(names), 4))),
                            np.float32)[keep]
        return dict(
            gt_bboxes_3d=lidar_boxes, gt_labels_3d=labels, gt_names=names,
            bboxes=bbox2d,
            occluded=np.asarray(annos.get("occluded",
                                          np.zeros(keep.sum())))[
                :len(names)],
            truncated=np.asarray(annos.get("truncated",
                                           np.zeros(keep.sum())))[
                :len(names)])

    def evaluate(self, results: List[dict], metric: str = "bbox",
                 **kwargs) -> dict:
        from ..core.evaluation.kitti_eval import kitti_eval
        gts = []
        for i in range(len(results)):
            ann = self.get_ann_info(i)
            b2d = ann["bboxes"]
            gts.append(dict(
                boxes=ann["gt_bboxes_3d"].numpy(),
                labels=ann["gt_labels_3d"],
                occluded=np.asarray(ann["occluded"], np.float32),
                truncated=np.asarray(ann["truncated"], np.float32),
                bbox2d_height=(b2d[:, 3] - b2d[:, 1]) if len(b2d) else
                np.zeros(0)))
        return kitti_eval(results, gts, list(self.CLASSES))
