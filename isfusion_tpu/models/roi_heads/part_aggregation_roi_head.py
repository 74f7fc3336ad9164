"""PartA2 ROI head: part-aware pooling + box refinement.

Parity: `mmdet3d/models/roi_heads/part_aggregation_roi_head.py` (+
`bbox_heads/parta2_bbox_head.py`, `roi_extractors` with the
roiaware_pool3d CUDA kernel): per-proposal RoI-aware pooling of the
U-Net's per-voxel seg/part features onto a fixed 3D grid, conv/MLP
refinement predicting an IoU-guided score and a residual box.

TPU-native: pooling = transform all voxel centers into each proposal's
box frame, bin to a (G, G, G) grid, segment-mean — all static shapes
(N_proposals x V pairwise, vectorized; no CUDA pooling kernel).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import HEADS
from ...ops.box_ops import box_local_uvw, boxes_iou_3d
from ..losses import build_loss


def roiaware_pool(rois: jnp.ndarray, centers: jnp.ndarray,
                  feats: jnp.ndarray, mask: jnp.ndarray,
                  grid_size: int) -> jnp.ndarray:
    """rois (R, 7); centers (V, 3); feats (V, C); mask (V,) ->
    (R, G, G, G, C) mean-pooled features (roiaware_pool3d equivalent)."""
    r = rois.shape[0]
    g = grid_size
    # shared world->box-local transform (ops/box_ops.box_local_uvw);
    # returns (V, R, 3) — transpose to the (R, V) layout used below
    uvw, inside_vr = box_local_uvw(rois, centers)
    u, v, w = (jnp.moveaxis(uvw[..., i], 0, 1) for i in range(3))
    inside = jnp.moveaxis(inside_vr, 0, 1) & mask[None, :]
    gi = jnp.clip((u * g).astype(jnp.int32), 0, g - 1)
    gj = jnp.clip((v * g).astype(jnp.int32), 0, g - 1)
    gk = jnp.clip((w * g).astype(jnp.int32), 0, g - 1)
    cell = gi * g * g + gj * g + gk                  # (R, V)
    roi_off = jnp.arange(r, dtype=jnp.int32)[:, None] * (g ** 3)
    seg = jnp.where(inside, cell + roi_off, r * g ** 3)
    c = feats.shape[-1]
    flat_feats = jnp.broadcast_to(feats[None], (r,) + feats.shape)
    total = jax.ops.segment_sum(
        flat_feats.reshape(r * centers.shape[0], c), seg.reshape(-1),
        num_segments=r * g ** 3 + 1)[:-1]
    cnt = jax.ops.segment_sum(
        inside.astype(jnp.float32).reshape(-1), seg.reshape(-1),
        num_segments=r * g ** 3 + 1)[:-1]
    pooled = total / jnp.maximum(cnt, 1.0)[:, None]
    return pooled.reshape(r, g, g, g, c)


@HEADS.register_module()
class PartAggregationROIHead(nn.Module):
    num_classes: int = 3
    grid_size: int = 6
    in_channels: int = 20        # seg feats (16) + seg score (1) + part (3)
    shared_channels: Any = (128, 128)
    pos_iou_thr: float = 0.55
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, rois: jnp.ndarray, roi_mask: jnp.ndarray,
                 voxel_centers: jnp.ndarray, voxel_feats: jnp.ndarray,
                 voxel_mask: jnp.ndarray, train: bool = False) -> dict:
        """rois (B, R, 7+); voxel_* (B, V, ...). Returns refinement
        predictions (cls (B, R), reg (B, R, 7))."""
        g = self.grid_size

        pooled = jax.vmap(lambda r, c, f, m: roiaware_pool(
            r[:, :7], c, f, m, g))(rois, voxel_centers, voxel_feats,
                                   voxel_mask)
        b, r_n = pooled.shape[:2]
        x = pooled.reshape(b, r_n, -1)
        for i, ch in enumerate(self.shared_channels):
            x = nn.Dense(int(ch), name=f"shared_{i}")(x)
            x = nn.relu(x)
        cls = nn.Dense(1, name="conv_cls")(x)[..., 0]
        reg = nn.Dense(7, name="conv_reg")(x)
        return dict(cls_score=cls, bbox_pred=reg, rois=rois,
                    roi_mask=roi_mask)

    def loss(self, preds: dict, gt_bboxes: jnp.ndarray,
             gt_labels: jnp.ndarray, gt_mask: jnp.ndarray) -> dict:
        rois = preds["rois"]
        roi_mask = preds["roi_mask"]

        def single(rois_s, rmask, gts, gmask):
            iou = boxes_iou_3d(rois_s[:, :7], gts[:, :7])
            iou = jnp.where(gmask[None, :], iou, 0.0)
            best = jnp.max(iou, -1)
            arg = jnp.argmax(iou, -1)
            return best, arg

        best_iou, assigned = jax.vmap(single)(
            rois, roi_mask, gt_bboxes, gt_mask)
        # IoU-guided classification target (PartA2: clamp((iou-0.25)/0.5))
        cls_t = jnp.clip((best_iou - 0.25) / 0.5, 0.0, 1.0)
        w = roi_mask.astype(jnp.float32)
        ce = build_loss(dict(type="CrossEntropyLoss", use_sigmoid=True,
                             reduction="none"))
        loss_cls = jnp.sum(ce(preds["cls_score"], cls_t) * w) / \
            jnp.maximum(w.sum(), 1.0)
        # residual regression for positives
        matched = jnp.take_along_axis(gt_bboxes[..., :7],
                                      assigned[..., None], 1)
        diag = jnp.linalg.norm(rois[..., 3:5], axis=-1)
        tx = (matched[..., 0] - rois[..., 0]) / jnp.maximum(diag, 1e-3)
        ty = (matched[..., 1] - rois[..., 1]) / jnp.maximum(diag, 1e-3)
        tz = (matched[..., 2] - rois[..., 2]) / \
            jnp.maximum(rois[..., 5], 1e-3)
        tdim = jnp.log(jnp.maximum(matched[..., 3:6], 1e-3) /
                       jnp.maximum(rois[..., 3:6], 1e-3))
        tyaw = matched[..., 6] - rois[..., 6]
        target = jnp.concatenate(
            [tx[..., None], ty[..., None], tz[..., None], tdim,
             jnp.sin(tyaw)[..., None]], -1)
        pos = (best_iou > self.pos_iou_thr) & roi_mask
        pw = pos.astype(jnp.float32)[..., None]
        sl1 = build_loss(dict(type="SmoothL1Loss", beta=1.0 / 9.0,
                              reduction="none"))
        loss_reg = jnp.sum(sl1(preds["bbox_pred"], target) * pw) / \
            jnp.maximum(pw.sum(), 1.0)
        return dict(loss_roi_cls=loss_cls, loss_roi_reg=loss_reg)

    def get_bboxes(self, preds: dict) -> dict:
        rois = preds["rois"]
        reg = preds["bbox_pred"]
        diag = jnp.linalg.norm(rois[..., 3:5], axis=-1)
        x = rois[..., 0] + reg[..., 0] * diag
        y = rois[..., 1] + reg[..., 1] * diag
        z = rois[..., 2] + reg[..., 2] * rois[..., 5]
        dims = rois[..., 3:6] * jnp.exp(jnp.clip(reg[..., 3:6], -2, 2))
        yaw = rois[..., 6] + jnp.arcsin(jnp.clip(reg[..., 6], -1, 1))
        boxes = jnp.concatenate(
            [x[..., None], y[..., None], z[..., None], dims,
             yaw[..., None]], -1)
        scores = jax.nn.sigmoid(preds["cls_score"])
        return dict(bboxes=boxes,
                    scores=jnp.where(preds["roi_mask"], scores, 0.0),
                    mask=preds["roi_mask"])
