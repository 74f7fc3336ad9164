"""Hungarian assignment for the TransFusion head.

Parity: `mmdet3d/core/bbox/assigners/hungarian_assigner.py:95`
(HungarianAssigner3D) + match costs FocalLossCost (mmdet),
BBoxBEVL1Cost (`:27`), IoU3DCost (`:42`).

The reference moves the cost matrix to CPU and runs scipy
linear_sum_assignment (`hungarian_assigner.py:136-142`). The axon TPU
runtime does not support host callbacks inside jit, so matching runs fully
on device with an exact Hungarian implementation (`ops/hungarian.py`,
scipy-verified); invalid (padded) GT columns carry a large cost and matches
to them are discarded.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...registry import BBOX_ASSIGNERS
from ...ops.box_ops import boxes_iou_3d
from ...ops.hungarian import assign_proposals

_BIG = 1e8


def focal_loss_cost(cls_pred: jnp.ndarray, gt_labels: jnp.ndarray,
                    weight: float, alpha: float = 0.25, gamma: float = 2.0,
                    eps: float = 1e-12) -> jnp.ndarray:
    """mmdet FocalLossCost: (num_query, num_classes) logits x (G,) labels
    -> (num_query, G)."""
    p = jax.nn.sigmoid(cls_pred)
    neg = -jnp.log(1 - p + eps) * (1 - alpha) * p ** gamma
    pos = -jnp.log(p + eps) * alpha * (1 - p) ** gamma
    cost = pos[:, gt_labels] - neg[:, gt_labels]
    return cost * weight


def bbox_bev_l1_cost(bboxes: jnp.ndarray, gt_bboxes: jnp.ndarray,
                     pc_range: Sequence[float], weight: float) -> jnp.ndarray:
    start = jnp.asarray(pc_range[0:2])
    extent = jnp.asarray(pc_range[3:5]) - start
    a = (bboxes[:, :2] - start) / extent
    b = (gt_bboxes[:, :2] - start) / extent
    return weight * jnp.sum(jnp.abs(a[:, None] - b[None]), -1)


class AssignResult(NamedTuple):
    gt_inds: jnp.ndarray       # (num_query,) int32: matched GT slot, -1 none
    max_overlaps: jnp.ndarray  # (num_query,) IoU with matched GT (0 if none)
    labels: jnp.ndarray        # (num_query,) matched GT label, -1 background


def hungarian_match(cost: jnp.ndarray) -> jnp.ndarray:
    """On-device exact LSA; cost (Q, G) -> (Q,) matched column or -1."""
    return assign_proposals(cost)


@BBOX_ASSIGNERS.register_module()
class HungarianAssigner3D:
    def __init__(self, cls_cost=None, reg_cost=None, iou_cost=None,
                 iou_calculator=None):
        self.cls_cost = dict(cls_cost or dict(weight=1.0))
        self.reg_cost = dict(reg_cost or dict(weight=1.0))
        self.iou_cost = dict(iou_cost or dict(weight=1.0))

    def assign(self, bboxes: jnp.ndarray, gt_bboxes: jnp.ndarray,
               gt_labels: jnp.ndarray, gt_mask: jnp.ndarray,
               cls_pred: jnp.ndarray, train_cfg: dict) -> AssignResult:
        """Static-shape assignment for one sample & one decoder layer.

        bboxes (Q, >=7) decoded predictions; gt_bboxes (G, >=7) padded;
        gt_labels (G,); gt_mask (G,) validity; cls_pred (Q, num_classes)
        logits. Matches to padded GT slots are suppressed by a large cost
        and reported as background.
        """
        pc_range = train_cfg["point_cloud_range"]
        cls_c = focal_loss_cost(
            cls_pred, gt_labels, float(self.cls_cost.get("weight", 1.0)),
            float(self.cls_cost.get("alpha", 0.25)),
            float(self.cls_cost.get("gamma", 2.0)))
        reg_c = bbox_bev_l1_cost(
            bboxes, gt_bboxes, pc_range,
            float(self.reg_cost.get("weight", 1.0)))
        iou = boxes_iou_3d(bboxes[:, :7], gt_bboxes[:, :7])
        iou_c = -iou * float(self.iou_cost.get("weight", 1.0))
        cost = cls_c + reg_c + iou_c
        cost = jnp.where(gt_mask[None, :], cost, _BIG)
        col = hungarian_match(cost)
        matched = (col >= 0) & gt_mask[jnp.clip(col, 0)]
        col_c = jnp.clip(col, 0)
        gt_inds = jnp.where(matched, col_c, -1)
        labels = jnp.where(matched, gt_labels[col_c], -1)
        ious = jnp.where(matched,
                         jnp.take_along_axis(iou, col_c[:, None], 1)[:, 0],
                         0.0)
        return AssignResult(gt_inds=gt_inds,
                            max_overlaps=jnp.clip(ious, 0.0, 1.0),
                            labels=labels)
