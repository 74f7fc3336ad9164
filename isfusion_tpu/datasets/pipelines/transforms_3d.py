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


@PIPELINES.register_module()
class GlobalAlignment:
    """Axis-align the scene with the dataset-provided 4x4 matrix
    (`transforms_3d.py:1577`) — ScanNet detection trains/evaluates in the
    axis-aligned frame, so this must run before box generation. The
    transform is not recorded (never reversed; aligned GT is canonical).
    """

    def __init__(self, rotation_axis: int):
        self.rotation_axis = int(rotation_axis)

    def _check_rot_mat(self, rot: np.ndarray) -> None:
        valid = np.allclose(np.linalg.det(rot), 1.0, atol=1e-5)
        unit = np.zeros(3, rot.dtype)
        unit[self.rotation_axis] = 1.0
        valid &= np.allclose(rot[self.rotation_axis, :], unit)
        valid &= np.allclose(rot[:, self.rotation_axis], unit)
        assert valid, f"invalid rotation matrix {rot}"

    def __call__(self, data: dict) -> dict:
        ann = data.get("ann_info", {})
        assert "axis_align_matrix" in ann, \
            "axis_align_matrix is not provided in GlobalAlignment"
        mat = np.asarray(ann["axis_align_matrix"], np.float32)
        assert mat.shape == (4, 4), f"invalid axis_align_matrix {mat.shape}"
        rot, trans = mat[:3, :3], mat[:3, 3]
        self._check_rot_mat(rot)
        # aligned = R @ p (column vectors) = p_row @ R^T; points.rotate
        # applies xyz @ arg, so pass R^T
        data["points"].rotate(rot.T)
        data["points"].translate(trans)
        return data


@PIPELINES.register_module()
class RandomDropPointsColor:
    """Zero all point colors with probability ``drop_ratio``
    (`transforms_3d.py:840`; PAConv scene-seg augmentation)."""

    def __init__(self, drop_ratio: float = 0.2):
        assert 0 <= drop_ratio <= 1, f"invalid drop_ratio {drop_ratio}"
        self.drop_ratio = float(drop_ratio)

    def __call__(self, data: dict) -> dict:
        pts = data["points"]
        assert pts.attribute_dims and "color" in pts.attribute_dims, \
            "Expect points have color attribute"
        # the reference keeps `rand() > 1 - ratio` (measured-better hack)
        if np.random.rand() > 1.0 - self.drop_ratio:
            pts.tensor[:, pts.attribute_dims["color"]] = 0.0
        return data


@PIPELINES.register_module()
class RandomJitterPoints:
    """Per-point gaussian coordinate noise, optionally clipped
    (`transforms_3d.py:1208`; segmentation-only — boxes untouched)."""

    def __init__(self, jitter_std=(0.01, 0.01, 0.01),
                 clip_range=(-0.05, 0.05)):
        if isinstance(jitter_std, (int, float)):
            jitter_std = [jitter_std] * 3
        self.jitter_std = np.asarray(jitter_std, np.float32)
        if clip_range is not None and isinstance(clip_range, (int, float)):
            clip_range = [-clip_range, clip_range]
        self.clip_range = clip_range

    def __call__(self, data: dict) -> dict:
        pts = data["points"]
        noise = np.random.randn(len(pts), 3).astype(np.float32) \
            * self.jitter_std[None, :]
        if self.clip_range is not None:
            noise = np.clip(noise, self.clip_range[0], self.clip_range[1])
        pts.translate(noise)
        return data


@PIPELINES.register_module()
class BackgroundPointsFilter:
    """Drop background points inside the enlarged-but-not-original GT
    boxes (`transforms_3d.py:2461`): keeps clean margins around objects.
    """

    def __init__(self, bbox_enlarge_range):
        if isinstance(bbox_enlarge_range, (int, float)):
            bbox_enlarge_range = [float(bbox_enlarge_range)] * 3
        self.bbox_enlarge_range = np.asarray(bbox_enlarge_range,
                                             np.float32)[None, :]

    def __call__(self, data: dict) -> dict:
        from ...core.bbox.box_np_ops import points_in_rbbox
        boxes = data["gt_bboxes_3d"]
        arr = boxes.numpy().copy()
        arr[:, :3] = boxes.gravity_center
        enlarged = arr.copy()
        enlarged[:, 3:6] += self.bbox_enlarge_range
        pts = data["points"].numpy()
        fg = points_in_rbbox(pts, arr, origin=(0.5, 0.5, 0.5)).max(1) \
            if len(arr) else np.zeros(len(pts), bool)
        fg_en = points_in_rbbox(pts, enlarged,
                                origin=(0.5, 0.5, 0.5)).max(1) \
            if len(arr) else np.zeros(len(pts), bool)
        valid = ~(~fg & fg_en)
        data["points"] = data["points"][valid]
        for key in ("pts_instance_mask", "pts_semantic_mask"):
            if data.get(key) is not None:
                data[key] = np.asarray(data[key])[valid]
        return data


@PIPELINES.register_module()
class IndoorPatchPointSample:
    """Sample a column patch then fix the point count
    (`transforms_3d.py:2216`; PointNet++ ScanNet recipe): pick a random
    center, keep points in an enlarged block, accept the patch by the
    coverage/annotation criteria, sample to ``num_points`` (duplicating
    when short), and re-center xy (z kept). ``use_normalized_coord``
    appends xyz / coord_max as extra features."""

    def __init__(self, num_points: int, block_size: float = 1.5,
                 sample_rate=None, ignore_index=None,
                 use_normalized_coord: bool = False, num_try: int = 10,
                 enlarge_size: float = 0.2, min_unique_num=None,
                 eps: float = 1e-2):
        self.num_points = int(num_points)
        self.block_size = float(block_size)
        self.ignore_index = ignore_index
        self.use_normalized_coord = bool(use_normalized_coord)
        self.num_try = int(num_try)
        self.enlarge_size = float(enlarge_size) if enlarge_size else 0.0
        self.min_unique_num = min_unique_num
        self.eps = float(eps)

    def _patch(self, coords: np.ndarray, sem: np.ndarray) -> tuple:
        coord_max = coords.max(0)
        coord_min = coords.min(0)
        point_idxs = np.arange(len(coords))
        cur_center = coords[0]
        for _ in range(self.num_try):
            cur_center = coords[np.random.choice(len(coords))]
            half = np.array([self.block_size / 2, self.block_size / 2, 0.0])
            cur_max = cur_center + half
            cur_min = cur_center - half
            cur_max[2], cur_min[2] = coord_max[2], coord_min[2]
            choice = np.all((coords >= cur_min - self.enlarge_size)
                            & (coords <= cur_max + self.enlarge_size), 1)
            if not choice.any():
                continue
            cur_coords = coords[choice]
            point_idxs = np.where(choice)[0]
            mask = np.all((cur_coords >= cur_min - self.eps)
                          & (cur_coords <= cur_max + self.eps), 1)
            if self.min_unique_num is None:
                # PointNet++ coverage test: >=2% of a 31x31x62 grid
                vidx = np.ceil((cur_coords[mask] - cur_min)
                               / np.maximum(cur_max - cur_min, 1e-6)
                               * np.array([31.0, 31.0, 62.0]))
                vidx = np.unique(vidx[:, 0] * 31 * 62 + vidx[:, 1] * 62
                                 + vidx[:, 2])
                flag1 = len(vidx) / (31.0 * 31.0 * 62.0) >= 0.02
            else:
                flag1 = mask.sum() >= self.min_unique_num
            flag2 = True if self.ignore_index is None else \
                np.sum(sem[choice] != self.ignore_index) / max(
                    len(sem[choice]), 1) >= 0.7
            if flag1 and flag2:
                break
        if len(point_idxs) >= self.num_points:
            choices = np.random.choice(point_idxs, self.num_points,
                                       replace=False)
        else:
            dup = np.random.choice(len(point_idxs),
                                   self.num_points - len(point_idxs))
            choices = point_idxs[np.concatenate(
                [np.arange(len(point_idxs)), dup], 0)]
        return choices, cur_center, coord_max

    def __call__(self, data: dict) -> dict:
        pts = data["points"]
        assert "pts_semantic_mask" in data, \
            "semantic mask should be provided in training and evaluation"
        sem = np.asarray(data["pts_semantic_mask"])
        coords = pts.numpy()[:, :3]
        attrs = pts.numpy()[:, 3:]
        choices, center, coord_max = self._patch(coords, sem)
        sel_coords = coords[choices].copy()
        sel_coords[:, 0] -= center[0]
        sel_coords[:, 1] -= center[1]
        sel_attrs = attrs[choices]
        attribute_dims = dict(pts.attribute_dims or {})
        if self.use_normalized_coord:
            norm = coords[choices] / np.maximum(coord_max, 1e-6)
            start = 3 + sel_attrs.shape[1]
            sel_attrs = np.concatenate([sel_attrs, norm], 1)
            attribute_dims["normalized_coord"] = [start, start + 1,
                                                  start + 2]
        new = np.concatenate([sel_coords, sel_attrs], 1).astype(np.float32)
        out = pts.new_point(new)
        out.attribute_dims = attribute_dims or None
        data["points"] = out
        data["pts_semantic_mask"] = sem[choices]
        if data.get("pts_instance_mask") is not None:
            data["pts_instance_mask"] = \
                np.asarray(data["pts_instance_mask"])[choices]
        return data


@PIPELINES.register_module()
class VoxelBasedPointSampler:
    """Voxel-budget point sampling across sweeps (`transforms_3d.py:2526`):
    current-sweep and previous-sweep points are voxelized separately
    (host VoxelGenerator) and each capped to its max_voxels budget;
    per-point mask/seg fields ride along as extra channels."""

    def __init__(self, cur_sweep_cfg: dict, prev_sweep_cfg=None,
                 time_dim: int = 3):
        from ...core.voxel_generator import VoxelGenerator
        self.cur_voxel_generator = VoxelGenerator(**cur_sweep_cfg)
        self.cur_voxel_num = self.cur_voxel_generator._max_voxels
        self.time_dim = int(time_dim)
        if prev_sweep_cfg is not None:
            assert prev_sweep_cfg["max_num_points"] == \
                cur_sweep_cfg["max_num_points"]
            self.prev_voxel_generator = VoxelGenerator(**prev_sweep_cfg)
            self.prev_voxel_num = self.prev_voxel_generator._max_voxels
        else:
            self.prev_voxel_generator = None
            self.prev_voxel_num = 0

    def _sample(self, points: np.ndarray, sampler) -> np.ndarray:
        voxels, _, _ = sampler.generate(points)
        if voxels.shape[0] == 0:
            return np.zeros((sampler._max_voxels, sampler._max_num_points,
                             points.shape[-1]), points.dtype)
        if voxels.shape[0] < sampler._max_voxels:
            pad = np.zeros((sampler._max_voxels - voxels.shape[0],
                            sampler._max_num_points, points.shape[-1]),
                           points.dtype)
            pad[:] = voxels[0]
            voxels = np.concatenate([voxels, pad], 0)
        return voxels

    def __call__(self, data: dict) -> dict:
        pts = data["points"]
        original_dim = pts.shape[1]
        arr = pts.numpy()
        extra = [arr]
        fields2dim = []
        start = original_dim
        for key in data.get("pts_mask_fields", []):
            fields2dim.append((key, start))
            extra.append(np.asarray(data[key])[..., None])
            start += 1
        for key in data.get("pts_seg_fields", []):
            fields2dim.append((key, start))
            extra.append(np.asarray(data[key])[..., None])
            start += 1
        arr = np.concatenate(extra, -1)
        cur_flag = arr[:, self.time_dim] == 0
        cur, prev = arr[cur_flag], arr[~cur_flag]
        if prev.shape[0] == 0:
            prev = cur
        np.random.shuffle(cur)
        np.random.shuffle(prev)
        cur = self._sample(cur, self.cur_voxel_generator)
        if self.prev_voxel_generator is not None:
            prev = self._sample(prev, self.prev_voxel_generator)
            arr = np.concatenate([cur, prev], 0)
        else:
            arr = cur
        if self.cur_voxel_generator._max_num_points == 1:
            arr = arr.squeeze(1)
        data["points"] = pts.new_point(
            arr[..., :original_dim].astype(np.float32))
        for key, dim in fields2dim:
            data[key] = arr[..., dim]
        return data
