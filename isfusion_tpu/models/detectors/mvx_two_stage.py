"""Multi-modality two-branch detector base (parity:
`mmdet3d/models/detectors/mvx_two_stage.py:20`).

Owns the optional image branch (backbone+neck over (B, N_views, H, W, 3)
NHWC images) and the LiDAR branch (voxelize -> VFE -> middle encoder ->
BEV backbone -> neck -> head). Subclasses (MVXFasterRCNN, ISFusionDetector)
specialize fusion.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import DETECTORS
from ...ops.voxel import voxelize_hard, voxelize_dynamic
from ..builder import (build_backbone, build_head,
                       build_middle_encoder, build_neck, build_voxel_encoder)
from .voxelnet import _capacity


@DETECTORS.register_module()
class MVXTwoStageDetector(nn.Module):
    pts_voxel_layer: Optional[dict] = None
    pts_voxel_encoder: Optional[dict] = None
    pts_middle_encoder: Optional[dict] = None
    pts_fusion_layer: Optional[dict] = None
    img_backbone: Optional[dict] = None
    pts_backbone: Optional[dict] = None
    img_neck: Optional[dict] = None
    pts_neck: Optional[dict] = None
    pts_bbox_head: Optional[dict] = None
    img_roi_head: Optional[dict] = None
    img_rpn_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    def setup(self):
        if self.pts_voxel_encoder:
            self.pts_voxel_encoder_m = build_voxel_encoder(
                dict(self.pts_voxel_encoder))
        if self.pts_middle_encoder:
            self.pts_middle_encoder_m = build_middle_encoder(
                dict(self.pts_middle_encoder))
        if self.pts_backbone:
            self.pts_backbone_m = build_backbone(dict(self.pts_backbone))
        if self.pts_fusion_layer:
            # nothing consumes a detector-level fusion layer (in the
            # reference, too, point-wise image fusion lives INSIDE the
            # VFE via its fusion_layer key); building params here would
            # be a silent no-op that bloats checkpoints — fail loudly
            raise ValueError(
                "pts_fusion_layer is not wired at the detector level; "
                "configure pts_voxel_encoder.fusion_layer (DynamicVFE "
                "PointFusion) instead")
        if self.pts_neck:
            self.pts_neck_m = build_neck(dict(self.pts_neck))
        if self.img_backbone:
            self.img_backbone_m = build_backbone(dict(self.img_backbone))
        if self.img_neck:
            self.img_neck_m = build_neck(dict(self.img_neck))
        if self.pts_bbox_head:
            head_cfg = dict(self.pts_bbox_head)
            tc = self.train_cfg or {}
            sc = self.test_cfg or {}
            head_cfg.setdefault("train_cfg", tc.get("pts", tc) or None)
            head_cfg.setdefault("test_cfg", sc.get("pts", sc) or None)
            self.pts_bbox_head_m = build_head(head_cfg)

    @property
    def with_img_branch(self) -> bool:
        return self.img_backbone is not None

    def extract_img_feat(self, img: jnp.ndarray, train: bool = False):
        """img (B, N, H, W, 3) -> list of (B, N, h, w, C) feature maps."""
        if not self.with_img_branch:
            return None
        b, n = img.shape[:2]
        flat = img.reshape((b * n,) + img.shape[2:])
        feats = self.img_backbone_m(flat, train=train)
        if self.img_neck is not None:
            feats = self.img_neck_m(feats, train=train)
        if not isinstance(feats, (tuple, list)):
            feats = [feats]
        return [f.reshape((b, n) + f.shape[1:]) for f in feats]

    @staticmethod
    def calib_from_batch(batch: Optional[dict]) -> Optional[dict]:
        """Collect projection matrices from the batch (Collect3DV2 keys:
        lidar2img + img_aug_matrix/lidar_aug_matrix from ImageAug3D /
        GlobalRotScaleTransV2)."""
        if not batch or "lidar2img" not in batch or "img" not in batch:
            return None
        calib = dict(lidar2img=batch["lidar2img"],
                     img_input_shape=tuple(batch["img"].shape[2:4]))
        for k in ("img_aug_matrix", "lidar_aug_matrix"):
            if k in batch:
                calib[k] = batch[k]
        return calib

    def extract_pts_feat(self, points, points_mask, img_feats=None,
                         batch=None, train: bool = False):
        calib = self.calib_from_batch(batch)
        vl = dict(self.pts_voxel_layer)
        max_pts = int(vl.get("max_num_points", 32))
        if max_pts > 0:
            cap = _capacity(vl.get("max_voxels", 30000), train)
            vox = jax.vmap(lambda p, m: voxelize_hard(
                p, m, vl["point_cloud_range"], vl["voxel_size"],
                max_pts, cap))(points, points_mask)
            feats = self.pts_voxel_encoder_m(
                vox.voxels, vox.num_points, vox.coors, train=train)
            bev = self.pts_middle_encoder_m(
                feats, vox.coors, vox.voxel_mask, train=train)
        else:
            cap = _capacity(vl.get("max_voxels", 60000), train)
            dv = jax.vmap(lambda p, m: voxelize_dynamic(
                p, m, vl["point_cloud_range"], vl["voxel_size"], cap))(
                    points, points_mask)
            feats = self.pts_voxel_encoder_m(
                points, dv.point_voxel_index, dv.voxel_coors, train=train,
                img_feats=img_feats, calib=calib)
            bev = self.pts_middle_encoder_m(
                feats, dv.voxel_coors, dv.voxel_mask, train=train)
        x = self.pts_backbone_m(bev, train=train)
        if self.pts_neck is not None:
            x = self.pts_neck_m(x, train=train)
        if not isinstance(x, (tuple, list)):
            x = (x,)
        return x

    def __call__(self, batch: dict, train: bool = False,
                 mode: str = "predict"):
        img_feats = None
        if self.with_img_branch and "img" in batch:
            img_feats = self.extract_img_feat(batch["img"], train=train)
        pts_feats = self.extract_pts_feat(
            batch["points"], batch["points_mask"], img_feats, batch,
            train=train)
        preds = self.pts_bbox_head_m(pts_feats, train=train)
        if mode == "feats":
            return preds
        if mode == "loss":
            return self.pts_bbox_head_m.loss(
                preds, batch["gt_bboxes_3d"], batch["gt_labels_3d"],
                batch["gt_mask"])
        return self.pts_bbox_head_m.get_bboxes(preds)


@DETECTORS.register_module()
class MVXFasterRCNN(MVXTwoStageDetector):
    """Used by the PointPillars nuScenes configs (LiDAR-only branch)."""


@DETECTORS.register_module()
class DynamicMVXFasterRCNN(MVXTwoStageDetector):
    """Dynamic-voxelization MVX-Net variant (point-wise image fusion is
    applied inside extract_pts_feat when a fusion layer is configured)."""
