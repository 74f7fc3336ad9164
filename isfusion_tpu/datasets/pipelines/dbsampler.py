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
        self.blending_type = blending_type
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

    def _pick_collision_thr(self) -> float:
        """collision_thr may be a float, a list (uniform choice) or a dict
        (mode 'value'/'range') — `dbsampler.py:952-965`."""
        thr = self.collision_thr
        if isinstance(thr, (int, float)):
            return float(thr)
        if isinstance(thr, (list, tuple)):
            return float(np.random.choice(list(thr)))
        if isinstance(thr, dict):
            if thr.get("mode", "value") == "range":
                lo, hi = thr["thr_range"]
                return float(np.random.uniform(lo, hi))
            return float(np.random.choice(list(thr["thr_range"])))
        return 0.0

    @staticmethod
    def _coll_2d(total_2d: np.ndarray, thr: float) -> np.ndarray:
        """2D-image collision matrix: any-overlap test at thr == 0 (the
        reference runs the polygon corner-collision test on the four
        rectangle corners, which for axis-aligned boxes is exactly
        rectangle intersection), else IoF (intersection over foreground)
        > thr to protect pasted foregrounds (`sample_class_v2:944-985`)."""
        n = len(total_2d)
        if n == 0:
            return np.zeros((0, 0), bool)
        iw = (np.minimum(total_2d[:, None, 2], total_2d[None, :, 2]) -
              np.maximum(total_2d[:, None, 0], total_2d[None, :, 0]))
        ih = (np.minimum(total_2d[:, None, 3], total_2d[None, :, 3]) -
              np.maximum(total_2d[:, None, 1], total_2d[None, :, 1]))
        inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
        if thr == 0:
            return inter > 0
        area = ((total_2d[:, 2] - total_2d[:, 0]) *
                (total_2d[:, 3] - total_2d[:, 1]))
        iof = inter / np.maximum(area[None, :], 1e-6)   # over the QUERY box
        return iof > thr

    def sample_all(self, gt_bboxes: np.ndarray, gt_labels: np.ndarray,
                   imgs=None, calib: Optional[dict] = None,
                   gt_bboxes_2d: Optional[np.ndarray] = None
                   ) -> Optional[dict]:
        """gt_bboxes (G, >=7) numpy, gt_labels (G,). Returns dict with
        sampled boxes/labels/points (+ pasted imgs) or None."""
        sampled_infos: List[dict] = []
        avoid = gt_bboxes.copy() if len(gt_bboxes) else \
            np.zeros((0, 9), np.float32)
        avoid_2d = np.asarray(gt_bboxes_2d, np.float32).reshape(-1, 4) \
            if gt_bboxes_2d is not None else np.zeros((0, 4), np.float32)
        # row in `avoid` each avoid_2d entry belongs to (GT 2D boxes align
        # 1:1 with the leading GT rows; kept candidates append their true
        # row) — without this the 2D collision matrix drifts onto the
        # wrong boxes once any avoid entry lacks a 2D box (r3 review fix)
        avoid_2d_rows = np.arange(len(avoid_2d))
        thr_2d = self._pick_collision_thr() if self.check_2D_collision \
            else None
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
            # 2D-image collision (check_2D_collision,
            # `sample_class_v2:944-985`): candidates without a stored 2D
            # box are treated as non-colliding in image space
            if thr_2d is not None:
                new_2d = np.stack(
                    [np.asarray(c.get("bbox", [0, 0, 0, 0]), np.float32)
                     for c in cands])
                has_2d = np.asarray(
                    [c.get("bbox") is not None for c in cands])
                total_2d = np.concatenate([avoid_2d, new_2d], axis=0)
                c2d = self._coll_2d(total_2d, thr_2d)
                if len(total_2d) != len(all_boxes) or \
                        not np.array_equal(avoid_2d_rows,
                                           np.arange(len(avoid))):
                    # align: avoid entries lacking 2D boxes can't collide;
                    # avoid_2d_rows maps each 2D box to its avoid row
                    full = np.zeros((len(all_boxes),) * 2, bool)
                    idx = np.r_[avoid_2d_rows,
                                len(avoid) + np.arange(len(new_2d))]
                    full[np.ix_(idx, idx)] = c2d
                    c2d = full
                n_av = len(avoid)
                c2d[n_av:][~has_2d] = False
                c2d[:, n_av:][:, ~has_2d] = False
                coll = coll | c2d
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
            if thr_2d is not None:
                kept_2d, kept_rows = [], []
                for rank, i in enumerate(keep):
                    if cands[i].get("bbox") is not None:
                        kept_2d.append(
                            np.asarray(cands[i]["bbox"], np.float32))
                        kept_rows.append(n_avoid + rank)
                if kept_2d:
                    avoid_2d = np.concatenate(
                        [avoid_2d, np.stack(kept_2d)], axis=0)
                    avoid_2d_rows = np.concatenate(
                        [avoid_2d_rows, np.asarray(kept_rows)])
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
        if imgs is not None:   # patch pasting whenever images flow
            # (the old `check_2D_collision is not None` read as a gate
            # but was always True for the bool field)
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
        # depth_consistent: paste far objects first so near ones overdraw
        # them (`sample_all:779-785`); without it, db order is kept
        if self.depth_consistent:
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
            was_pil = isinstance(target, Image.Image)
            tarr = np.array(target) if was_pil else target
            img_h, img_w = tarr.shape[:2]
            x1 = max(x1, 0)
            y1 = max(y1, 0)
            w = max(min(x2, img_w - 1) - x1 + 1, 1)
            h = max(min(y2, img_h - 1) - y1 + 1, 1)
            parr = np.asarray(patch, np.float32)
            if parr.shape[0] < h or parr.shape[1] < w:
                parr = np.asarray(
                    Image.fromarray(np.asarray(patch, np.uint8)).resize(
                        (w, h)), np.float32)
            parr = parr[:h, :w, :tarr.shape[-1]]
            # paste_obj_v2 semantics (`:902-928`): mixup-weighted add
            # inside a margin mask (5%); blending_type 'gaussian'
            # feathers the mask edges instead of a hard margin
            mask = np.zeros((h, w), np.float32)
            mh, mw = int(0.05 * h), int(0.05 * w)
            mask[mh:h - mh, mw:w - mw] = 1.0
            if self.blending_type == "gaussian" and h > 4 and w > 4:
                yy = np.linspace(-1, 1, h)[:, None]
                xx = np.linspace(-1, 1, w)[None]
                mask = np.exp(-((yy ** 4 + xx ** 4) * 3.0)).astype(
                    np.float32)
            region = tarr[y1:y1 + h, x1:x1 + w].astype(np.float32)
            blended = region * (1 - mask[..., None] * self.mixup) + \
                parr * mask[..., None] * self.mixup
            tarr[y1:y1 + h, x1:x1 + w] = blended.astype(tarr.dtype)
            imgs[cam] = Image.fromarray(tarr) if was_pil else tarr
        return imgs
