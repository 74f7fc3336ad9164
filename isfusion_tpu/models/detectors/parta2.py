"""Part-A2 two-stage detector.

Parity: `mmdet3d/models/detectors/parta2.py` + the part-aware stage of
`roi_heads/part_aggregation_roi_head.py`: SparseUNet backbone ->
(a) RPN over the dense BEV (Anchor3DHead), (b) per-voxel semantic + part
location predictions from the U-Net's full-res features, (c) ROI stage
pooling seg/part features inside each proposal for IoU-scored refinement.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import DETECTORS
from ...ops.voxel import voxelize_hard
from ..builder import (build_backbone, build_head, build_middle_encoder,
                       build_neck, build_voxel_encoder)
from .voxelnet import _capacity


@DETECTORS.register_module()
class PartA2(nn.Module):
    voxel_layer: Optional[dict] = None
    voxel_encoder: Optional[dict] = None
    middle_encoder: Optional[dict] = None
    backbone: Optional[dict] = None
    neck: Optional[dict] = None
    rpn_head: Optional[dict] = None
    roi_head: Optional[dict] = None
    num_proposals: int = 128
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    def setup(self):
        self.voxel_encoder_m = build_voxel_encoder(dict(self.voxel_encoder))
        self.middle_encoder_m = build_middle_encoder(
            dict(self.middle_encoder))
        self.backbone_m = build_backbone(dict(self.backbone))
        self.neck_m = build_neck(dict(self.neck)) if self.neck else None
        rpn_cfg = dict(self.rpn_head)
        tc = dict(self.train_cfg or {})
        sc = dict(self.test_cfg or {})
        rpn_cfg.setdefault("train_cfg", tc.get("rpn", tc) or None)
        rpn_cfg.setdefault("test_cfg", sc.get("rpn", sc) or None)
        self.rpn_head_m = build_head(rpn_cfg)
        roi_cfg = dict(self.roi_head or dict(type="PartAggregationROIHead"))
        self.roi_head_m = build_head(roi_cfg)
        # part-aware stage-1 heads over U-Net seg features
        self.seg_fc = nn.Dense(1, name="seg_head")
        self.part_fc = nn.Dense(3, name="part_head")

    def _voxel_centers(self, coors, vl):
        vs = jnp.asarray(vl["voxel_size"], jnp.float32)
        low = jnp.asarray(vl["point_cloud_range"][:3], jnp.float32)
        cx = (coors[..., 2].astype(jnp.float32) + 0.5) * vs[0] + low[0]
        cy = (coors[..., 1].astype(jnp.float32) + 0.5) * vs[1] + low[1]
        cz = (coors[..., 0].astype(jnp.float32) + 0.5) * vs[2] + low[2]
        return jnp.stack([cx, cy, cz], -1)

    def __call__(self, batch: dict, train: bool = False,
                 mode: str = "predict"):
        vl = dict(self.voxel_layer)
        cap = _capacity(vl.get("max_voxels", 16000), train)
        vox = jax.vmap(lambda p, m: voxelize_hard(
            p, m, vl["point_cloud_range"], vl["voxel_size"],
            int(vl.get("max_num_points", 5)), cap))(
            batch["points"], batch["points_mask"])
        feats = self.voxel_encoder_m(vox.voxels, vox.num_points, vox.coors,
                                     train=train)
        unet = self.middle_encoder_m(feats, vox.coors, vox.voxel_mask,
                                     train=train)
        x = self.backbone_m(unet["spatial_features"], train=train)
        if self.neck_m is not None:
            x = self.neck_m(x, train=train)
        if not isinstance(x, (tuple, list)):
            x = (x,)
        rpn_preds = self.rpn_head_m(x, train=train)

        seg_logit = self.seg_fc(unet["seg_features"])[..., 0]
        part_pred = jax.nn.sigmoid(self.part_fc(unet["seg_features"]))
        centers = self._voxel_centers(vox.coors, vl)

        # proposals from the RPN (stop-grad into the ROI stage)
        det = self.rpn_head_m.get_bboxes(
            jax.tree_util.tree_map(jax.lax.stop_gradient, rpn_preds))
        k = min(self.num_proposals, det["bboxes"].shape[1])
        topv, topi = jax.lax.top_k(det["scores"], k)
        rois = jnp.take_along_axis(det["bboxes"], topi[..., None], 1)
        roi_mask = jnp.take_along_axis(det["mask"], topi, 1) & (topv > 0)

        roi_feats = jnp.concatenate(
            [unet["seg_features"],
             jax.nn.sigmoid(seg_logit)[..., None], part_pred], -1)
        roi_preds = self.roi_head_m(
            rois[..., :7], roi_mask, centers, roi_feats, vox.voxel_mask,
            train=train)

        if mode == "feats":
            return dict(rpn=rpn_preds, roi=roi_preds, seg=seg_logit,
                        part=part_pred)
        if mode == "loss":
            losses = self.rpn_head_m.loss(
                rpn_preds, batch["gt_bboxes_3d"], batch["gt_labels_3d"],
                batch["gt_mask"])
            losses = {f"rpn_{k}": v for k, v in losses.items()}
            losses.update(self.roi_head_m.loss(
                roi_preds, batch["gt_bboxes_3d"], batch["gt_labels_3d"],
                batch["gt_mask"]))
            losses.update(self._part_losses(
                seg_logit, part_pred, centers, vox.voxel_mask,
                batch["gt_bboxes_3d"], batch["gt_mask"]))
            return losses
        out = self.roi_head_m.get_bboxes(roi_preds)
        labels = jnp.take_along_axis(det["labels"], topi, 1)
        out["labels"] = labels
        return out

    def _part_losses(self, seg_logit, part_pred, centers, vmask,
                     gt_bboxes, gt_mask):
        """Stage-1 supervision: voxel fg seg (inside any GT) + intra-object
        part coordinates (normalized in-box position)."""
        from ..losses import build_loss

        from ...ops.box_ops import box_local_uvw

        def single(c, m, gts, gm):
            uvw_all, inside = box_local_uvw(gts[:, :7], c)  # (P, G, ...)
            inside = inside & gm[None, :]
            fg = inside.any(-1) & m
            first = jnp.argmax(inside, -1)
            uvw = jnp.take_along_axis(
                uvw_all, first[:, None, None].repeat(3, -1), 1)[:, 0]
            return fg, uvw

        fg, uvw = jax.vmap(single)(centers, vmask, gt_bboxes, gt_mask)
        ce = build_loss(dict(type="CrossEntropyLoss", use_sigmoid=True,
                             reduction="none"))
        w_all = vmask.astype(jnp.float32)
        loss_seg = jnp.sum(ce(seg_logit, fg.astype(jnp.float32)) * w_all) \
            / jnp.maximum(w_all.sum(), 1.0)
        pw = fg.astype(jnp.float32)[..., None]
        loss_part = jnp.sum(jnp.abs(part_pred - uvw) * pw) / \
            jnp.maximum(pw.sum(), 1.0)
        return dict(loss_seg=loss_seg, loss_part=loss_part)
