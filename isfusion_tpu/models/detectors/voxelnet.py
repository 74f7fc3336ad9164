"""Single-modality voxel detectors (VoxelNet / DynamicVoxelNet family).

Parity: `mmdet3d/models/detectors/voxelnet.py` + `dynamic_voxelnet.py`.

Batch contract (fixed shapes, see SURVEY.md §7 design decision 1):
  points       (B, P, C) float32, zero-padded
  points_mask  (B, P) bool
  gt_bboxes_3d (B, G, code) float32  [train]
  gt_labels_3d (B, G) int32          [train]
  gt_mask      (B, G) bool           [train]

Voxelization capacities come from the ``pts_voxel_layer`` config
(max_voxels may be an int or a (train, test) pair as in the reference).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import DETECTORS
from ...ops.voxel import voxelize_hard, voxelize_dynamic
from ..builder import (build_backbone, build_head, build_middle_encoder,
                       build_neck, build_voxel_encoder)


def _capacity(max_voxels, train: bool) -> int:
    if isinstance(max_voxels, (tuple, list)):
        return int(max_voxels[0] if train else max_voxels[1])
    return int(max_voxels)


@DETECTORS.register_module()
class VoxelNet(nn.Module):
    """Hard-voxelization single-stage LiDAR detector."""

    voxel_layer: Optional[dict] = None
    voxel_encoder: Optional[dict] = None
    middle_encoder: Optional[dict] = None
    backbone: Optional[dict] = None
    neck: Optional[dict] = None
    bbox_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    def setup(self):
        self.voxel_encoder_m = build_voxel_encoder(dict(self.voxel_encoder))
        self.middle_encoder_m = build_middle_encoder(
            dict(self.middle_encoder))
        self.backbone_m = build_backbone(dict(self.backbone))
        self.neck_m = build_neck(dict(self.neck)) if self.neck else None
        head_cfg = dict(self.bbox_head)
        head_cfg.setdefault("train_cfg",
                            (self.train_cfg or {}).get("pts", self.train_cfg))
        head_cfg.setdefault("test_cfg",
                            (self.test_cfg or {}).get("pts", self.test_cfg))
        self.bbox_head_m = build_head(head_cfg)

    def extract_feat(self, points, points_mask, train: bool):
        vl = dict(self.voxel_layer)
        cap = _capacity(vl.get("max_voxels", 30000), train)
        max_pts = int(vl.get("max_num_points", 32))

        # voxelize_hard is a pure function: vmap over the batch
        vox = jax.vmap(lambda p, m: voxelize_hard(
            p, m, vl["point_cloud_range"], vl["voxel_size"],
            max_pts, cap))(points, points_mask)
        # encoders are natively batched modules
        feats = self.voxel_encoder_m(vox.voxels, vox.num_points, vox.coors,
                                     train=train)
        bev = self.middle_encoder_m(feats, vox.coors, vox.voxel_mask,
                                    train=train)
        x = self.backbone_m(bev, train=train)
        if self.neck_m is not None:
            x = self.neck_m(x, train=train)
        if not isinstance(x, (tuple, list)):
            x = (x,)
        return x

    def __call__(self, batch: dict, train: bool = False,
                 mode: str = "predict"):
        feats = self.extract_feat(batch["points"], batch["points_mask"],
                                  train)
        preds = self.bbox_head_m(feats, train=train)
        if mode == "feats":
            return preds
        if mode == "loss":
            return self.bbox_head_m.loss(
                preds, batch["gt_bboxes_3d"], batch["gt_labels_3d"],
                batch["gt_mask"])
        return self.bbox_head_m.get_bboxes(preds)


@DETECTORS.register_module()
class DynamicVoxelNet(VoxelNet):
    """Dynamic-voxelization variant (`dynamic_voxelnet.py`)."""

    def extract_feat(self, points, points_mask, train: bool):
        vl = dict(self.voxel_layer)
        cap = _capacity(vl.get("max_voxels", 60000), train)

        dv = jax.vmap(lambda p, m: voxelize_dynamic(
            p, m, vl["point_cloud_range"], vl["voxel_size"], cap))(
                points, points_mask)
        feats = self.voxel_encoder_m(points, dv.point_voxel_index,
                                     dv.voxel_coors, train=train)
        bev = self.middle_encoder_m(feats, dv.voxel_coors, dv.voxel_mask,
                                    train=train)
        x = self.backbone_m(bev, train=train)
        if self.neck_m is not None:
            x = self.neck_m(x, train=train)
        if not isinstance(x, (tuple, list)):
            x = (x,)
        return x
