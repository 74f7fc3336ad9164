"""Augmentation + filtering transforms (host, numpy).

Parity: `mmdet3d/datasets/pipelines/transforms_3d.py` —
ImageAug3D:46 (BEVFusion-style per-view resize/crop/flip/rot, emits 4x4
img_aug_matrix), GlobalRotScaleTransV2:1871 (emits lidar_aug_matrix),
RandomFlip3DV2:1163, ModalMask3D:1828, ObjectSampleV2:1276 (GT-paste with
stop_epoch), Points/Object Range/Name filters:1950-2060, PointShuffle:1918,
ImageNormalize:25.
"""
from __future__ import annotations

import random
from typing import Any, Dict, Optional, Sequence

import numpy as np

from ...registry import PIPELINES, build_from_cfg


@PIPELINES.register_module()
class ImageNormalize:
    """Per-channel normalize; PIL -> float numpy HWC (`:25`)."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, results: dict) -> dict:
        imgs = []
        for img in results["img"]:
            arr = np.asarray(img, np.float32) / 255.0
            imgs.append((arr - self.mean) / self.std)
        results["img"] = imgs
        results["img_norm_cfg"] = dict(mean=self.mean, std=self.std)
        return results


@PIPELINES.register_module()
class ImageAug3D:
    """Per-view resize/crop/flip/rotate with 4x4 pixel-space aug matrix
    (`transforms_3d.py:46-145`)."""

    def __init__(self, final_dim, resize_lim, bot_pct_lim, rot_lim,
                 rand_flip: bool, is_train: bool):
        self.final_dim = final_dim
        self.resize_lim = resize_lim
        self.bot_pct_lim = bot_pct_lim
        self.rot_lim = rot_lim
        self.rand_flip = rand_flip
        self.is_train = is_train

    def sample_augmentation(self, results):
        w, h = results["ori_shape"]
        fh, fw = self.final_dim
        if self.is_train:
            resize = np.random.uniform(*self.resize_lim)
            new_w, new_h = int(w * resize), int(h * resize)
            crop_h = int((1 - np.random.uniform(*self.bot_pct_lim))
                         * new_h) - fh
            crop_w = int(np.random.uniform(0, max(0, new_w - fw)))
            crop = (crop_w, crop_h, crop_w + fw, crop_h + fh)
            flip = bool(self.rand_flip and np.random.choice([0, 1]))
            rotate = np.random.uniform(*self.rot_lim)
        else:
            resize = float(np.mean(self.resize_lim))
            new_w, new_h = int(w * resize), int(h * resize)
            crop_h = int((1 - np.mean(self.bot_pct_lim)) * new_h) - fh
            crop_w = int(max(0, new_w - fw) / 2)
            crop = (crop_w, crop_h, crop_w + fw, crop_h + fh)
            flip, rotate = False, 0.0
        return resize, (new_w, new_h), crop, flip, rotate

    def img_transform(self, img, resize, resize_dims, crop, flip, rotate):
        from PIL import Image
        rotation = np.eye(2, dtype=np.float32)
        translation = np.zeros(2, np.float32)
        img = img.resize(resize_dims)
        img = img.crop(crop)
        if flip:
            img = img.transpose(method=Image.FLIP_LEFT_RIGHT)
        img = img.rotate(rotate)

        rotation = rotation * resize
        translation = translation - np.asarray(crop[:2], np.float32)
        if flip:
            a = np.array([[-1, 0], [0, 1]], np.float32)
            b = np.array([crop[2] - crop[0], 0], np.float32)
            rotation = a @ rotation
            translation = a @ translation + b
        theta = rotate / 180 * np.pi
        a = np.array([[np.cos(theta), np.sin(theta)],
                      [-np.sin(theta), np.cos(theta)]], np.float32)
        b = np.array([crop[2] - crop[0], crop[3] - crop[1]],
                     np.float32) / 2
        b = a @ (-b) + b
        rotation = a @ rotation
        translation = a @ translation + b
        return img, rotation, translation

    def __call__(self, data: Dict[str, Any]) -> Dict[str, Any]:
        if "img" not in data:
            return data
        new_imgs, transforms = [], []
        for img in data["img"]:
            resize, dims, crop, flip, rotate = self.sample_augmentation(data)
            new_img, rotation, translation = self.img_transform(
                img, resize, dims, crop, flip, rotate)
            t = np.eye(4, dtype=np.float32)
            t[:2, :2] = rotation
            t[:2, 3] = translation
            new_imgs.append(new_img)
            transforms.append(t)
        data["img"] = new_imgs
        data["img_aug_matrix"] = np.stack(transforms)
        return data


@PIPELINES.register_module()
class GlobalRotScaleTransV2:
    """Global rot/scale/trans of points+boxes, emitting lidar_aug_matrix
    (`transforms_3d.py:1871`)."""

    def __init__(self, resize_lim, rot_lim, trans_lim, is_train: bool):
        self.resize_lim = resize_lim
        self.rot_lim = rot_lim
        self.trans_lim = trans_lim
        self.is_train = is_train

    def __call__(self, data: Dict[str, Any]) -> Dict[str, Any]:
        transform = np.eye(4, dtype=np.float32)
        if self.is_train:
            scale = np.random.uniform(*self.resize_lim)
            theta = np.random.uniform(*self.rot_lim)
            translation = np.array(
                [np.random.normal(0, self.trans_lim) for _ in range(3)],
                np.float32)
            gt_boxes = data["gt_bboxes_3d"]
            # combined call: the box class rotates the points with ITS
            # OWN matrix/sign (reference transforms_3d.py:1747-1753) —
            # separate points.rotate/boxes.rotate calls encode one box
            # convention and silently shear points off boxes for others
            if "points" in data:
                _, rotation = gt_boxes.rotate(theta, data["points"])
                data["points"].translate(translation)
                data["points"].scale(scale)
            else:
                rotation = gt_boxes.rotate(theta)
            gt_boxes.translate(translation)
            gt_boxes.scale(scale)
            transform[:3, :3] = rotation.T * scale
            transform[:3, 3] = translation * scale
        data["lidar_aug_matrix"] = transform
        return data


@PIPELINES.register_module()
class RandomFlip3DV2:
    """BEV flips of points+boxes composed into lidar_aug_matrix
    (`transforms_3d.py:1163`)."""

    def __call__(self, data: Dict[str, Any]) -> Dict[str, Any]:
        rotation = np.eye(3, dtype=np.float32)
        if np.random.choice([0, 1]):
            rotation = np.array([[1, 0, 0], [0, -1, 0], [0, 0, 1]],
                                np.float32) @ rotation
            if "points" in data:
                data["points"].flip("horizontal")
            if "gt_bboxes_3d" in data:
                data["gt_bboxes_3d"].flip("horizontal")
        if np.random.choice([0, 1]):
            rotation = np.array([[-1, 0, 0], [0, 1, 0], [0, 0, 1]],
                                np.float32) @ rotation
            if "points" in data:
                data["points"].flip("vertical")
            if "gt_bboxes_3d" in data:
                data["gt_bboxes_3d"].flip("vertical")
        if "lidar_aug_matrix" not in data:
            data["lidar_aug_matrix"] = np.eye(4, dtype=np.float32)
        data["lidar_aug_matrix"][:3, :] = \
            rotation @ data["lidar_aug_matrix"][:3, :]
        return data


@PIPELINES.register_module()
class ModalMask3D:
    """Random camera-view dropping (train: 3 of 6 views w.p. 0.5; test:
    view 0) — `transforms_3d.py:1828`, consumed by the detector as a
    boolean view mask (`isfusion.py:56-60`)."""

    def __init__(self, mode: str = "train",
                 dataset_type: str = "NuScenesDataset", stop_epoch=None,
                 **kwargs):
        self.mode = mode
        self.dataset_type = dataset_type
        self.stop_epoch = stop_epoch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __call__(self, data: dict) -> dict:
        n = len(data["img"]) if isinstance(data.get("img"), (list, tuple)) \
            else int(data.get("num_views", 6))
        mask = np.ones((n,), bool)
        if self.mode == "test":
            mask[0] = False
        elif self.stop_epoch is None or self.epoch < self.stop_epoch:
            if np.random.rand() > 0.5:
                k = 3 if self.dataset_type == "NuScenesDataset" else 2
                mask[random.sample(range(n), k)] = False
        data["img_view_mask"] = mask
        return data


@PIPELINES.register_module()
class PointsRangeFilter:
    """Keep points inside point_cloud_range (`transforms_3d.py:2002`)."""

    def __init__(self, point_cloud_range):
        self.pcr = np.asarray(point_cloud_range, np.float32)

    def __call__(self, data: dict) -> dict:
        mask = data["points"].in_range_3d(self.pcr)
        data["points"] = data["points"][mask]
        return data


@PIPELINES.register_module()
class ObjectRangeFilter:
    """Keep GT boxes whose BEV center is inside range
    (`transforms_3d.py:1950`)."""

    def __init__(self, point_cloud_range):
        self.pcr = np.asarray(point_cloud_range, np.float32)

    def __call__(self, data: dict) -> dict:
        boxes = data["gt_bboxes_3d"]
        mask = boxes.in_range_bev(self.pcr[[0, 1, 3, 4]])
        data["gt_bboxes_3d"] = boxes[mask]
        data["gt_labels_3d"] = data["gt_labels_3d"][mask]
        data["gt_bboxes_3d"].limit_yaw(offset=0.5, period=2 * np.pi)
        return data


@PIPELINES.register_module()
class ObjectNameFilter:
    """Keep GTs whose class is in ``classes`` (`transforms_3d.py:2047`)."""

    def __init__(self, classes):
        self.labels = list(range(len(classes)))

    def __call__(self, data: dict) -> dict:
        mask = np.isin(data["gt_labels_3d"], self.labels)
        data["gt_bboxes_3d"] = data["gt_bboxes_3d"][mask]
        data["gt_labels_3d"] = data["gt_labels_3d"][mask]
        return data


@PIPELINES.register_module()
class PointShuffle:
    def __call__(self, data: dict) -> dict:
        data["points"].shuffle()
        return data


@PIPELINES.register_module()
class GlobalRotScaleTrans:
    """Legacy global rot/scale/trans (`transforms_3d.py:1664`) — same math
    as V2 without the aug-matrix bookkeeping."""

    def __init__(self, rot_range=(-0.78539816, 0.78539816),
                 scale_ratio_range=(0.95, 1.05),
                 translation_std=(0, 0, 0), shift_height: bool = False):
        self.rot_range = rot_range
        self.scale_ratio_range = scale_ratio_range
        self.translation_std = np.asarray(translation_std, np.float32)

    def __call__(self, data: dict) -> dict:
        theta = np.random.uniform(*self.rot_range)
        scale = np.random.uniform(*self.scale_ratio_range)
        trans = np.random.normal(scale=self.translation_std, size=3).astype(
            np.float32)
        has_boxes = "gt_bboxes_3d" in data and len(data["gt_bboxes_3d"])
        if "points" in data:
            if has_boxes:
                # combined call: box class rotates points with its own
                # matrix/sign (reference transforms_3d.py:1747-1753)
                data["gt_bboxes_3d"].rotate(theta, data["points"])
            else:
                data["points"].rotate(theta)
            data["points"].translate(trans)
            data["points"].scale(scale)
        elif has_boxes:
            data["gt_bboxes_3d"].rotate(theta)
        if has_boxes:
            data["gt_bboxes_3d"].translate(trans)
            data["gt_bboxes_3d"].scale(scale)
        data["pcd_scale_factor"] = scale
        data["pcd_rotation"] = theta
        return data


@PIPELINES.register_module()
class RandomFlip3D:
    """Legacy BEV flip (`transforms_3d.py:1043`)."""

    def __init__(self, flip_ratio_bev_horizontal: float = 0.5,
                 flip_ratio_bev_vertical: float = 0.0, **kwargs):
        self.ratio_h = flip_ratio_bev_horizontal
        self.ratio_v = flip_ratio_bev_vertical

    def __call__(self, data: dict) -> dict:
        if np.random.rand() < self.ratio_h:
            data["points"].flip("horizontal")
            if "gt_bboxes_3d" in data:
                data["gt_bboxes_3d"].flip("horizontal")
            data["pcd_horizontal_flip"] = True
        if np.random.rand() < self.ratio_v:
            data["points"].flip("vertical")
            if "gt_bboxes_3d" in data:
                data["gt_bboxes_3d"].flip("vertical")
            data["pcd_vertical_flip"] = True
        return data


@PIPELINES.register_module()
class IndoorPointSample:
    """Random point subsampling for indoor scenes (`indoor_sample.py`)."""

    def __init__(self, num_points: int):
        self.num_points = int(num_points)

    def __call__(self, data: dict) -> dict:
        pts = data["points"]
        n = len(pts)
        if n == 0:
            # np.random.choice(0, ...) raises; an all-filtered scan
            # yields a zero-padded sample instead of killing the loader
            data["points"] = pts.new_point(
                np.zeros((self.num_points, pts.tensor.shape[1]),
                         np.float32))
            for key in ("pts_instance_mask", "pts_semantic_mask"):
                if key in data:
                    data[key] = np.zeros((self.num_points,), np.int64)
            return data
        replace = n < self.num_points
        idx = np.random.choice(n, self.num_points, replace=replace)
        data["points"] = pts[idx]
        for key in ("pts_instance_mask", "pts_semantic_mask"):
            if key in data:
                data[key] = np.asarray(data[key])[idx]
        return data


@PIPELINES.register_module()
class PointSample(IndoorPointSample):
    """Registered alias: later mmdet3d renames IndoorPointSample to
    PointSample; both names build the same transform."""


@PIPELINES.register_module()
class ObjectNoise:
    """Per-object jitter (`transforms_3d.py` ObjectNoise, SECOND-style):
    random translation/rotation applied to each GT box and its points."""

    def __init__(self, translation_std=(0.25, 0.25, 0.25),
                 rot_range=(-0.15707963267, 0.15707963267),
                 num_try: int = 100, global_rot_range=(0.0, 0.0)):
        self.translation_std = np.asarray(translation_std, np.float32)
        self.rot_range = rot_range
        self.num_try = int(num_try)

    def __call__(self, data: dict) -> dict:
        from ...core.bbox.box_np_ops import box_collision_test, \
            points_in_rbbox
        boxes = data["gt_bboxes_3d"]
        pts = data["points"]
        arr = boxes.numpy()
        if len(arr) == 0:
            return data
        inside = points_in_rbbox(pts.numpy(), arr)
        tensor = pts.numpy()
        for i in range(len(arr)):
            # rejection sampling like the reference noise_per_object_v3_:
            # a proposed placement that collides with any OTHER current
            # box is retried up to num_try times, else the object stays
            # put (previously the noise applied unconditionally and
            # pushed adjacent objects into overlap — r3 review fix)
            t = np.zeros(3, np.float32)
            r = 0.0
            others = np.delete(arr, i, axis=0)
            for _ in range(max(1, self.num_try)):
                t_c = np.random.normal(scale=self.translation_std, size=3)
                r_c = np.random.uniform(*self.rot_range)
                cand = arr[i:i + 1].copy()
                cand[0, :3] += t_c
                cand[0, 6] += r_c
                if len(others) == 0 or not box_collision_test(
                        cand[:, [0, 1, 3, 4, 6]],
                        others[:, [0, 1, 3, 4, 6]]).any():
                    t, r = t_c, r_c
                    break
            if r == 0.0 and not np.any(t):
                continue
            sel = inside[:, i]
            c = arr[i, :3].copy()
            rel = tensor[sel, :3] - c
            cs, sn = np.cos(r), np.sin(r)
            rot = np.array([[cs, -sn, 0], [sn, cs, 0], [0, 0, 1]],
                           np.float32)
            # same matrix/side as box corners (yaw += r below rotates the
            # box shape by `rel @ rot`, so its points must follow suit)
            tensor[sel, :3] = rel @ rot + c + t
            arr[i, :3] += t
            arr[i, 6] += r
        data["points"] = pts.new_point(tensor)
        data["gt_bboxes_3d"] = boxes.new_box(arr)
        return data


@PIPELINES.register_module()
class ObjectSampleV2:
    """GT-paste augmentation wrapper with epoch schedule
    (`transforms_3d.py:1276`; sampler = MMDataBaseSamplerV2)."""

    def __init__(self, db_sampler: dict, sample_2d: bool = True,
                 stop_epoch: Optional[int] = None):
        from ...registry import OBJECT_SAMPLERS
        cfg = dict(db_sampler)
        cfg.setdefault("type", "MMDataBaseSamplerV2")
        self.db_sampler = build_from_cfg(cfg, OBJECT_SAMPLERS)
        self.sample_2d = sample_2d
        self.stop_epoch = stop_epoch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __call__(self, data: dict) -> dict:
        if self.stop_epoch is not None and self.epoch >= self.stop_epoch:
            return data
        sampled = self.db_sampler.sample_all(
            data["gt_bboxes_3d"].numpy(), data["gt_labels_3d"],
            imgs=data.get("img"), calib=data,
            gt_bboxes_2d=data.get("gt_bboxes"))
        if sampled is None:
            return data
        data["gt_bboxes_3d"] = data["gt_bboxes_3d"].new_box(
            np.concatenate([data["gt_bboxes_3d"].numpy(),
                            sampled["gt_bboxes_3d"]], 0))
        data["gt_labels_3d"] = np.concatenate(
            [data["gt_labels_3d"], sampled["gt_labels_3d"]], 0)
        points = data["points"]
        # remove real points inside pasted boxes, then add object points
        from ...core.bbox.box_np_ops import points_in_rbbox
        masks = points_in_rbbox(points.numpy(), sampled["gt_bboxes_3d"])
        points = points[~masks.any(-1)]
        data["points"] = points.new_point(
            np.concatenate([sampled["points"], points.numpy()], 0))
        if self.sample_2d and sampled.get("imgs") is not None:
            data["img"] = sampled["imgs"]
        return data
