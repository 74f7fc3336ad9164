"""Anchor-based 3D head (parity: `mmdet3d/models/dense_heads/anchor3d_head.py`
+ `train_utils`/`get_bboxes` flow, with MaxIoUAssigner + nearest-BEV IoU).

TPU-native notes:
- anchors are numpy constants folded at trace time;
- target assignment is fully vectorized over (anchors x padded GTs) with a
  GT validity mask — no per-sample python;
- get_bboxes keeps static shapes: joint top-k prefilter + per-class NMS
  masks + fixed-size output with a validity mask.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import core  # noqa: F401  (register anchor generators / coders)
from ...registry import HEADS, ANCHOR_GENERATORS, BBOX_CODERS, build_from_cfg
from ...ops.box_ops import limit_period, nms_bev_mask
from ..losses import build_loss


def nearest_bev_boxes(boxes: jnp.ndarray) -> jnp.ndarray:
    """(…, 7+) lidar boxes -> axis-aligned (…, 4) BEV (x1, y1, x2, y2),
    swapping extents when |yaw mod pi| > pi/4 (LiDARInstance3DBoxes
    .nearest_bev semantics)."""
    bev = boxes[..., [0, 1, 3, 4, 6]]
    rot = jnp.abs(limit_period(bev[..., 4], 0.5, jnp.pi))
    cond = (rot > jnp.pi / 4)[..., None]
    xywh = jnp.where(cond, bev[..., [0, 1, 3, 2]], bev[..., :4])
    c, d = xywh[..., :2], xywh[..., 2:]
    return jnp.concatenate([c - d / 2, c + d / 2], -1)


def bbox_overlaps_nearest_3d(boxes1: jnp.ndarray, boxes2: jnp.ndarray
                             ) -> jnp.ndarray:
    """(N, K) axis-aligned nearest-BEV IoU (BboxOverlapsNearest3D)."""
    b1 = nearest_bev_boxes(boxes1)
    b2 = nearest_bev_boxes(boxes2)
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = jnp.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = jnp.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None] - inter
    return inter / jnp.maximum(union, 1e-8)


def max_iou_assign(ious: jnp.ndarray, gt_mask: jnp.ndarray,
                   pos_iou_thr: float, neg_iou_thr: float,
                   min_pos_iou: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized MaxIoUAssigner.

    ious: (A, G) anchor-gt IoU; gt_mask: (G,) valid GTs.
    Returns (assigned_gt (A,) int32 index or -1, pos_mask/neg_mask via
    assigned: -1 = negative, -2 = ignore, >=0 = matched gt index).
    """
    ious = jnp.where(gt_mask[None, :], ious, -1.0)
    max_iou = jnp.max(ious, axis=1)
    argmax_gt = jnp.argmax(ious, axis=1)
    assigned = jnp.full(ious.shape[:1], -1, jnp.int32)          # negative
    assigned = jnp.where((max_iou >= neg_iou_thr)
                         & (max_iou < pos_iou_thr), -2, assigned)  # ignore
    assigned = jnp.where(max_iou >= pos_iou_thr,
                         argmax_gt.astype(jnp.int32), assigned)
    # force-assign: for each gt, its best anchor (if iou >= min_pos_iou)
    gt_best = jnp.max(ious, axis=0)                              # (G,)
    is_best = (ious == gt_best[None, :]) & gt_mask[None, :] & \
        (ious >= min_pos_iou)
    # an anchor that is the best for some gt: pick highest-iou such gt
    best_iou = jnp.where(is_best, ious, -1.0)
    has_best = jnp.any(is_best, axis=1)
    best_gt = jnp.argmax(best_iou, axis=1).astype(jnp.int32)
    assigned = jnp.where(has_best, best_gt, assigned)
    return assigned, max_iou


def add_sin_difference(r_pred: jnp.ndarray, r_tgt: jnp.ndarray):
    """mmdet3d diff_rad_by_sin: regress sin(a-b) via the product identity."""
    new_pred = jnp.sin(r_pred) * jnp.cos(r_tgt)
    new_tgt = jnp.cos(r_pred) * jnp.sin(r_tgt)
    return new_pred, new_tgt


def get_direction_target(anchors_rot: jnp.ndarray, reg_target_rot: jnp.ndarray,
                         dir_offset: float = 0.7854) -> jnp.ndarray:
    rot_gt = reg_target_rot + anchors_rot
    offset_rot = limit_period(rot_gt - dir_offset, 0, 2 * jnp.pi)
    return jnp.clip(jnp.floor(offset_rot / jnp.pi).astype(jnp.int32), 0, 1)


@HEADS.register_module()
class Anchor3DHead(nn.Module):
    num_classes: int = 1
    in_channels: int = 384
    feat_channels: int = 384
    use_direction_classifier: bool = True
    anchor_generator: Optional[dict] = None
    assigner_per_size: bool = False
    assign_per_class: bool = False
    diff_rad_by_sin: bool = True
    dir_offset: float = 0.7854
    dir_limit_offset: float = 0.0
    bbox_coder: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    loss_dir: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None

    def _coder(self):
        cfg = self.bbox_coder or dict(type="DeltaXYZWLHRBBoxCoder")
        return build_from_cfg(dict(cfg), BBOX_CODERS)

    def _anchor_gen(self):
        cfg = self.anchor_generator or dict(
            type="Anchor3DRangeGenerator",
            ranges=[[0, -39.68, -1.78, 69.12, 39.68, -1.78]])
        return build_from_cfg(dict(cfg), ANCHOR_GENERATORS)

    @property
    def box_code_size(self) -> int:
        cfg = self.bbox_coder or {}
        return int(cfg.get("code_size", 7))

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        """feats: list of (..., H, W, C) maps. Returns per-level tuples of
        (cls_score, bbox_pred, dir_pred) with trailing channel layout
        (A*num_classes), (A*code), (A*2)."""
        gen = self._anchor_gen()
        num_anchors = gen.num_base_anchors
        # focal-loss prior: init cls bias to log(p/(1-p)), p=0.01
        conv_cls = nn.Conv(num_anchors * self.num_classes, (1, 1),
                           bias_init=nn.initializers.constant(-4.595),
                           name="conv_cls")
        conv_reg = nn.Conv(num_anchors * self.box_code_size, (1, 1),
                           name="conv_reg")
        conv_dir = nn.Conv(num_anchors * 2, (1, 1), name="conv_dir_cls") \
            if self.use_direction_classifier else None
        outs = []
        for f in feats:
            cls_score = conv_cls(f)
            bbox_pred = conv_reg(f)
            dir_pred = conv_dir(f) if conv_dir is not None else None
            outs.append((cls_score, bbox_pred, dir_pred))
        return outs

    # ---- pure (parameter-free) target/loss/decode methods ---------------

    def anchors_for(self, featmap_sizes) -> np.ndarray:
        gen = self._anchor_gen()
        levels = gen.grid_anchors([tuple(fs) for fs in featmap_sizes])
        return np.concatenate([lv.reshape(-1, lv.shape[-1]) for lv in levels])

    def loss(self, preds, gt_bboxes: jnp.ndarray, gt_labels: jnp.ndarray,
             gt_mask: jnp.ndarray) -> dict:
        """preds: list over levels of (cls (B,H,W,A*C), reg, dir).
        gt_bboxes (B, G, code), gt_labels (B, G), gt_mask (B, G)."""
        featmap_sizes = [p[0].shape[-3:-1] for p in preds]
        anchors = jnp.asarray(self.anchors_for(featmap_sizes))  # (N, code)
        code = self.box_code_size
        b = preds[0][0].shape[0]
        cls_scores = jnp.concatenate(
            [p[0].reshape(b, -1, self.num_classes) for p in preds], 1)
        bbox_preds = jnp.concatenate(
            [p[1].reshape(b, -1, code) for p in preds], 1)
        dir_preds = None
        if self.use_direction_classifier:
            dir_preds = jnp.concatenate(
                [p[2].reshape(b, -1, 2) for p in preds], 1)

        train_cfg = dict(self.train_cfg or {})
        assigner = dict(train_cfg.get("assigner",
                                      dict(pos_iou_thr=0.6, neg_iou_thr=0.45,
                                           min_pos_iou=0.45)))
        code_weight = jnp.asarray(
            train_cfg.get("code_weight", [1.0] * code), jnp.float32)

        coder = self._coder()
        loss_cls_fn = build_loss(dict(self.loss_cls or dict(
            type="FocalLoss", use_sigmoid=True)))
        loss_bbox_fn = build_loss(dict(self.loss_bbox or dict(
            type="SmoothL1Loss", beta=1.0 / 9.0)))
        loss_dir_fn = build_loss(dict(self.loss_dir or dict(
            type="CrossEntropyLoss"))) if self.use_direction_classifier \
            else None

        def single(cls_s, bbox_p, dir_p, gts, glabels, gmask):
            ious = bbox_overlaps_nearest_3d(anchors, gts)
            assigned, _ = max_iou_assign(
                ious, gmask, float(assigner.get("pos_iou_thr", 0.6)),
                float(assigner.get("neg_iou_thr", 0.45)),
                float(assigner.get("min_pos_iou", 0.45)))
            pos = assigned >= 0
            neg = assigned == -1
            safe_gt = jnp.clip(assigned, 0)
            matched_boxes = gts[safe_gt]
            matched_labels = glabels[safe_gt]
            num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)

            # classification: one-hot for pos, all-zero for neg
            onehot = jax.nn.one_hot(matched_labels, self.num_classes)
            cls_tgt = jnp.where(pos[:, None], onehot, 0.0)
            cls_weight = (pos | neg).astype(jnp.float32)[:, None]
            l_cls = loss_cls_fn(cls_s, cls_tgt, weight=cls_weight,
                                avg_factor=num_pos)

            # bbox regression on positives
            reg_tgt = coder.encode(anchors, matched_boxes)
            bp, rt = bbox_p, reg_tgt
            if self.diff_rad_by_sin:
                sp, st = add_sin_difference(bp[:, 6], rt[:, 6])
                bp = bp.at[:, 6].set(sp)
                rt = rt.at[:, 6].set(st)
            w = pos.astype(jnp.float32)[:, None] * code_weight[None, :]
            l_bbox = loss_bbox_fn(bp, rt, weight=w, avg_factor=num_pos)

            out = dict(loss_cls=l_cls, loss_bbox=l_bbox)
            if dir_p is not None:
                dir_tgt = get_direction_target(
                    anchors[:, 6], reg_tgt[:, 6], self.dir_offset)
                l_dir = loss_dir_fn(dir_p, dir_tgt,
                                    weight=pos.astype(jnp.float32),
                                    avg_factor=num_pos)
                out["loss_dir"] = l_dir
            return out

        if dir_preds is None:
            per_sample = jax.vmap(
                lambda c, bp, g, gl, gm: single(c, bp, None, g, gl, gm))(
                    cls_scores, bbox_preds, gt_bboxes, gt_labels, gt_mask)
        else:
            per_sample = jax.vmap(single)(cls_scores, bbox_preds, dir_preds,
                                          gt_bboxes, gt_labels, gt_mask)
        return {k: jnp.mean(v) for k, v in per_sample.items()}

    def get_bboxes(self, preds) -> dict:
        """Decode + multiclass rotated NMS with static shapes.

        Returns per-batch dict: bboxes (B, max_num, code), scores, labels,
        mask.
        """
        test_cfg = dict(self.test_cfg or {})
        nms_pre = int(test_cfg.get("nms_pre", 1000))
        score_thr = float(test_cfg.get("score_thr", 0.05))
        nms_thr = float(test_cfg.get("nms_thr", 0.2))
        max_num = int(test_cfg.get("max_num", 500))

        featmap_sizes = [p[0].shape[-3:-1] for p in preds]
        anchors = jnp.asarray(self.anchors_for(featmap_sizes))
        code = self.box_code_size
        b = preds[0][0].shape[0]
        cls_scores = jnp.concatenate(
            [p[0].reshape(b, -1, self.num_classes) for p in preds], 1)
        bbox_preds = jnp.concatenate(
            [p[1].reshape(b, -1, code) for p in preds], 1)
        dir_preds = jnp.concatenate(
            [p[2].reshape(b, -1, 2) for p in preds], 1) \
            if self.use_direction_classifier else None
        coder = self._coder()

        def single(cls_s, bbox_p, dir_p):
            scores = jax.nn.sigmoid(cls_s)                  # (N, C)
            top_score = jnp.max(scores, -1)
            k = min(nms_pre, scores.shape[0])
            topv, topi = jax.lax.top_k(top_score, k)
            scores_k = scores[topi]
            boxes_k = coder.decode(anchors[topi], bbox_p[topi])
            if dir_p is not None:
                dir_lbl = jnp.argmax(dir_p[topi], -1)
                # snap yaw to predicted direction bin
                r = limit_period(boxes_k[:, 6] - self.dir_offset,
                                 self.dir_limit_offset, jnp.pi)
                boxes_k = boxes_k.at[:, 6].set(
                    r + self.dir_offset + jnp.pi * dir_lbl.astype(r.dtype))
            bev = boxes_k[:, [0, 1, 3, 4, 6]]
            out_boxes, out_scores, out_labels, out_valid = [], [], [], []
            for c in range(self.num_classes):
                s = scores_k[:, c]
                valid = s > score_thr
                keep = nms_bev_mask(bev, s, nms_thr, valid=valid)
                out_boxes.append(boxes_k)
                out_scores.append(jnp.where(keep, s, 0.0))
                out_labels.append(jnp.full(s.shape, c, jnp.int32))
                out_valid.append(keep)
            boxes_all = jnp.concatenate(out_boxes)
            scores_all = jnp.concatenate(out_scores)
            labels_all = jnp.concatenate(out_labels)
            valid_all = jnp.concatenate(out_valid)
            fv, fi = jax.lax.top_k(scores_all, max_num)
            return dict(bboxes=boxes_all[fi], scores=fv,
                        labels=labels_all[fi],
                        mask=valid_all[fi] & (fv > 0))

        if dir_preds is None:
            return jax.vmap(lambda c, bp: single(c, bp, None))(
                cls_scores, bbox_preds)
        return jax.vmap(single)(cls_scores, bbox_preds, dir_preds)
