"""TransFusion detector (LiDAR-only / LiDAR+camera baseline).

Parity: `mmdet3d/models/detectors/transfusion.py` (TransFusionDetector) —
the pre-IS-Fusion baseline: voxelize -> VFE -> SparseEncoder -> SECOND ->
SECONDFPN -> TransFusionHead(V2). Shares all plumbing with
MVXTwoStageDetector; the head consumes the fused BEV directly (no HSF/IGF).
"""
from __future__ import annotations

import flax.linen as nn
import jax

from ...registry import DETECTORS
from .mvx_two_stage import MVXTwoStageDetector


@DETECTORS.register_module()
class TransFusionDetector(MVXTwoStageDetector):
    def __call__(self, batch: dict, train: bool = False,
                 mode: str = "predict"):
        img_feats = None
        if self.with_img_branch and "img" in batch:
            img_feats = self.extract_img_feat(batch["img"], train=train)
        pts_feats = self.extract_pts_feat(
            batch["points"], batch["points_mask"], img_feats, batch,
            train=train)
        preds = self.pts_bbox_head_m(pts_feats, img_feats, train=train)
        if mode == "feats":
            return preds
        if mode == "loss":
            return self.pts_bbox_head_m.loss(
                preds, batch["gt_bboxes_3d"], batch["gt_labels_3d"],
                batch["gt_mask"])
        return self.pts_bbox_head_m.get_bboxes(preds)
