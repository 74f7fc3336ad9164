"""nuScenes monocular dataset (FCOS3D's data path).

Parity: `mmdet3d/datasets/nuscenes_mono_dataset.py` — per-image samples
with camera-frame 3D boxes + projected 2D boxes/centers/depths. Info
format: list of dicts with img_path, cam_intrinsic (3x3 or 4x4), and annos
(bboxes 2d, bboxes_cam3d, centers2d, depths, labels, attr_labels).
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..registry import DATASETS
from ..core.bbox.structures import CameraInstance3DBoxes
from .custom_3d import Custom3DDataset


@DATASETS.register_module()
class NuScenesMonoDataset(Custom3DDataset):
    CLASSES = ('car', 'truck', 'trailer', 'bus', 'construction_vehicle',
               'bicycle', 'motorcycle', 'pedestrian', 'traffic_cone',
               'barrier')

    def __init__(self, ann_file: str, pipeline=None, data_root: str = "",
                 classes=None, box_type_3d: str = "Camera", **kwargs):
        super().__init__(data_root=data_root, ann_file=ann_file,
                         pipeline=pipeline, classes=classes,
                         modality=dict(use_camera=True, use_lidar=False),
                         box_type_3d=box_type_3d, **kwargs)

    def get_data_info(self, index: int) -> dict:
        info = self.data_infos[index]
        intr = np.asarray(info["cam_intrinsic"], np.float32)
        cam2img = np.eye(4, dtype=np.float32)
        cam2img[:intr.shape[0], :intr.shape[1]] = intr
        input_dict = dict(
            sample_idx=index,
            token=info.get("token", str(index)),
            img_filename=[info["img_path"]],
            cam2img=cam2img,
            timestamp=info.get("timestamp", index))
        if not self.test_mode:
            input_dict["ann_info"] = self.get_ann_info(index)
        return input_dict

    def get_ann_info(self, index: int) -> dict:
        annos = self.data_infos[index]["annos"]
        boxes_cam = np.asarray(annos["bboxes_cam3d"], np.float32)
        return dict(
            gt_bboxes_3d=CameraInstance3DBoxes(
                boxes_cam, box_dim=boxes_cam.shape[-1]),
            gt_labels_3d=np.asarray(annos["labels"], np.int64),
            gt_names=np.asarray(annos.get("names", [])),
            bboxes=np.asarray(annos["bboxes"], np.float32),
            centers2d=np.asarray(annos["centers2d"], np.float32),
            depths=np.asarray(annos["depths"], np.float32),
            attr_labels=np.asarray(annos.get(
                "attr_labels", np.zeros(len(boxes_cam))), np.int64))

    def evaluate(self, results: List[dict], metric="bbox", **kwargs):
        # camera-frame boxes; the internal nuScenes protocol expects a
        # consistent frame per sample — evaluate in the camera frame
        from ..core.evaluation.nuscenes_eval import nuscenes_style_eval
        gts = []
        for i in range(len(results)):
            ann = self.get_ann_info(i)
            b = ann["gt_bboxes_3d"].numpy()
            gts.append(dict(boxes=b[:, [2, 0, 1, 3, 4, 5, 6]]
                            if b.shape[-1] >= 7 else b,
                            labels=ann["gt_labels_3d"]))
        dets = []
        for d in results:
            b = np.asarray(d["bboxes"])
            dets.append(dict(bboxes=b[:, [2, 0, 1, 3, 4, 5, 6]]
                             if b.shape[-1] >= 7 else b,
                             scores=d["scores"], labels=d["labels"],
                             mask=d.get("mask", np.ones(len(b), bool))))
        return nuscenes_style_eval(dets, gts, list(self.CLASSES))
