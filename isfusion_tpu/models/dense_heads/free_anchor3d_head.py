"""FreeAnchor3D head: learning-to-match anchor assignment.

Parity: `mmdet3d/models/dense_heads/free_anchor3d_head.py` — reuses the
Anchor3DHead network; the loss replaces max-IoU assignment with
FreeAnchor's bag-based matching: for each GT a bag of the top-k anchors by
IoU, positive loss = -log(mean-max of cls*loc likelihood over the bag),
negative loss = focal-weighted -log(1 - P_neg) with
P_neg = cls_prob * (1 - localization prob).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import HEADS
from ...ops.box_ops import boxes_iou_bev
from .anchor3d_head import Anchor3DHead, bbox_overlaps_nearest_3d


@HEADS.register_module()
class FreeAnchor3DHead(Anchor3DHead):
    pre_anchor_topk: int = 16
    bbox_thr: float = 0.6
    gamma: float = 2.0
    alpha: float = 0.5

    def loss(self, preds, gt_bboxes: jnp.ndarray, gt_labels: jnp.ndarray,
             gt_mask: jnp.ndarray) -> dict:
        coder = self._coder()
        code = self.box_code_size
        nc = self.num_classes
        cls_list, reg_list = [], []
        for cls_s, bbox_p, _dir in preds:
            b, h, w, _ = cls_s.shape
            cls_list.append(cls_s.reshape(b, -1, nc))
            reg_list.append(bbox_p.reshape(b, -1, code))
        cls_scores = jnp.concatenate(cls_list, axis=1)   # (B, A, nc)
        bbox_preds = jnp.concatenate(reg_list, axis=1)   # (B, A, code)
        anchors = jnp.asarray(self.anchors_for(
            [p[0].shape[1:3] for p in preds]))           # (A, code)
        k = int(self.pre_anchor_topk)

        def single(cls_s, bbox_p, gts, glabels, gmask):
            probs = jax.nn.sigmoid(cls_s)                # (A, nc)
            decoded = coder.decode(anchors, bbox_p)
            ious = bbox_overlaps_nearest_3d(gts, decoded)  # (G, A)
            ious = jnp.where(gmask[:, None], ious, -1.0)
            # localization prob: saturated-linear between bbox_thr and
            # the PER-GT best IoU (reference free_anchor3d_head: t2 =
            # object_box_iou.max(dim=1) clamped above t1; a fixed 1.0
            # kept loc probs near zero early in training — r3 fix)
            t1 = self.bbox_thr
            # epsilon at f32 scale: t1 + 1e-12 rounds back to t1 in
            # float32, making (t2 - t1) exactly zero -> NaN gradients
            t2 = jnp.clip(jnp.max(ious, axis=1, keepdims=True),
                          t1 + 1e-4, None)
            loc_p = jnp.clip((ious - t1) / (t2 - t1), 0.0, 1.0)
            # bag: top-k anchors per GT by IoU with the ANCHOR boxes
            a_iou = bbox_overlaps_nearest_3d(gts, anchors)  # (G, A)
            a_iou = jnp.where(gmask[:, None], a_iou, -1.0)
            _, bag = jax.lax.top_k(a_iou, k)             # (G, k)
            cls_g = jnp.take_along_axis(
                probs[None, :, :].repeat(gts.shape[0], 0),
                bag[..., None], 1)                        # (G, k, nc)
            cls_at_label = jnp.take_along_axis(
                cls_g, glabels[:, None, None].repeat(k, 1), -1)[..., 0]
            loc_g = jnp.take_along_axis(loc_p, bag, 1)    # (G, k)
            match = cls_at_label * loc_g
            # mean-max (FreeAnchor eq.6 / reference positive_bag_loss):
            # weights 1/(1-p) normalized — NOT p/sum(p), which inverts
            # the early-training emphasis (r3 fix)
            w_bag = 1.0 / jnp.clip(1.0 - match, 1e-12, None)
            w_bag = w_bag / jnp.sum(w_bag, -1, keepdims=True)
            pos_p = jnp.sum(w_bag * match, -1)
            pos_loss = -jnp.log(jnp.clip(pos_p, 1e-12, 1.0))
            pos_loss = jnp.where(gmask, pos_loss, 0.0)
            num_pos = jnp.maximum(gmask.sum(), 1)

            # negatives: P{anchor a localizes an object OF CLASS c},
            # maxed over that class's GTs only (reference builds the
            # per-class image_box_prob; a class-agnostic max suppressed
            # negative supervision for all other classes — r3 fix)
            loc_masked = jnp.where(gmask[:, None], loc_p, 0.0)  # (G, A)
            nc = probs.shape[-1]
            safe_lbl = jnp.clip(glabels, 0, nc - 1)
            obj_p = jnp.zeros((probs.shape[0], nc), loc_p.dtype).at[
                :, safe_lbl].max(loc_masked.T)               # (A, nc)
            neg_p = probs * (1 - obj_p)
            neg_loss = -(neg_p ** self.gamma) * jnp.log(
                jnp.clip(1 - neg_p, 1e-12, 1.0))
            return (self.alpha * jnp.sum(pos_loss) / num_pos,
                    (1 - self.alpha) * jnp.sum(neg_loss) /
                    jnp.maximum(num_pos * k, 1))

        pos, neg = jax.vmap(single)(cls_scores, bbox_preds, gt_bboxes,
                                    gt_labels, gt_mask)
        return dict(positive_bag_loss=jnp.mean(pos),
                    negative_bag_loss=jnp.mean(neg))
