"""VoteNet head (indoor point-based detection).

Parity: `mmdet3d/models/dense_heads/vote_head.py` +
`mmdet3d/models/model_utils/vote_module.py`: seeds vote for object centers
(offset MLP, chamfer-style vote loss against the owning instance's
center), votes are aggregated with a set-abstraction module, a conv head
predicts objectness / center / direction bins / size clusters / semantics,
decoded by PartialBinBasedBBoxCoder. Objectness positives are aggregated
points within 0.3 m of a GT center, negatives beyond 0.6 m
(`vote_head.py` get_targets).

TPU-native: all targets vectorized over padded GTs; vote targets use
per-point instance ids carried in the batch (`pts_instance_mask`), like
the reference's indoor datasets.

Batch contract additions: pts_instance_mask (B, N) int (-1 background),
pts_semantic_mask (B, N) optional.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import BBOX_CODERS, HEADS, build_from_cfg
from ..backbones.pointnet2 import PointSAModule, _SharedMLP
from ..losses import build_loss


class VoteModule(nn.Module):
    """Seed -> vote offsets (`model_utils/vote_module.py`)."""

    in_channels: int = 256
    vote_per_seed: int = 1
    gt_per_seed: int = 3
    conv_channels: Sequence[int] = (256, 256)
    norm_feats: bool = True

    @nn.compact
    def __call__(self, seed_xyz, seed_feats, seed_mask, train: bool = False):
        x = _SharedMLP(tuple(self.conv_channels), name="vote_mlp")(
            seed_feats, seed_mask, train=train)
        out = nn.Dense((3 + self.in_channels) * self.vote_per_seed,
                       name="vote_out")(x)
        offset = out[..., :3]
        res_feats = out[..., 3:]
        vote_xyz = seed_xyz + offset
        vote_feats = seed_feats + res_feats
        if self.norm_feats:
            norm = jnp.linalg.norm(vote_feats, axis=-1, keepdims=True)
            vote_feats = vote_feats / jnp.maximum(norm, 1e-6) * \
                jnp.sqrt(float(vote_feats.shape[-1]))
        return vote_xyz, vote_feats, offset


@HEADS.register_module()
class VoteHead(nn.Module):
    num_classes: int = 18
    bbox_coder: Any = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    vote_module_cfg: Any = None
    vote_aggregation_cfg: Any = None
    pred_layer_cfg: Any = None
    feat_channels: Sequence[int] = (128, 128)
    objectness_loss: Any = None
    center_loss: Any = None
    dir_class_loss: Any = None
    dir_res_loss: Any = None
    size_class_loss: Any = None
    size_res_loss: Any = None
    semantic_loss: Any = None
    vote_loss: Any = None

    def _coder(self):
        return build_from_cfg(dict(self.bbox_coder), BBOX_CODERS)

    @nn.compact
    def __call__(self, feat_dict: dict, train: bool = False) -> dict:
        seed_xyz = feat_dict["fp_xyz"][-1]
        seed_feats = feat_dict["fp_features"][-1]
        seed_mask = feat_dict["fp_masks"][-1]
        vm_cfg = dict(self.vote_module_cfg or {})
        vm_cfg.pop("type", None)
        vm_cfg.setdefault("in_channels", seed_feats.shape[-1])
        vote_xyz, vote_feats, vote_offset = VoteModule(
            **{k: v for k, v in vm_cfg.items()
               if k in ("in_channels", "vote_per_seed", "gt_per_seed",
                        "conv_channels", "norm_feats")},
            name="vote_module")(seed_xyz, seed_feats, seed_mask,
                                train=train)
        agg_cfg = dict(self.vote_aggregation_cfg or
                       dict(num_point=256, radius=0.3, num_sample=16,
                            mlp_channels=[256, 128, 128, 128]))
        agg_cfg.pop("type", None)
        agg_xyz, agg_feats, agg_inds, agg_mask = PointSAModule(
            num_point=int(agg_cfg.get("num_point", 256)),
            radii=[float(agg_cfg.get("radius", 0.3))],
            sample_nums=[int(agg_cfg.get("num_sample", 16))],
            mlp_channels=list(agg_cfg.get("mlp_channels",
                                          [256, 128, 128, 128])),
            use_xyz=True, normalize_xyz=True,
            name="vote_aggregation")(vote_xyz, vote_feats, seed_mask,
                                     train=train)
        x = _SharedMLP(tuple(self.feat_channels), name="pred_mlp")(
            agg_feats, agg_mask, train=train)
        coder = self._coder()
        nb, ns = coder.num_dir_bins, coder.num_sizes
        out_ch = 2 + 3 + nb * 2 + ns * 4 + self.num_classes
        pred = nn.Dense(out_ch, name="conv_pred")(x)
        i = 0

        def take(n):
            nonlocal i
            sl = pred[..., i:i + n]
            i += n
            return sl

        obj = take(2)
        center = agg_xyz + take(3)
        dir_class = take(nb)
        dir_res_norm = take(nb)
        size_class = take(ns)
        size_res_norm = take(ns * 3).reshape(pred.shape[:-1] + (ns, 3))
        sem = take(self.num_classes)
        return dict(
            seed_xyz=seed_xyz, seed_mask=seed_mask, vote_xyz=vote_xyz,
            vote_offset=vote_offset, aggregated_points=agg_xyz,
            aggregated_mask=agg_mask, obj_scores=obj, center=center,
            dir_class=dir_class,
            dir_res=dir_res_norm * (jnp.pi / nb),
            size_class=size_class, size_res=size_res_norm,
            sem_scores=sem, seed_indices=feat_dict["fp_indices"])

    # -------------------------------------------------------------- loss
    def loss(self, preds: dict, batch: dict) -> dict:
        coder = self._coder()
        gt_boxes = batch["gt_bboxes_3d"]          # (B, G, 7) bottom-z
        gt_labels = batch["gt_labels_3d"]
        gt_mask = batch["gt_mask"]
        grav = gt_boxes[..., :3].at[..., 2].add(gt_boxes[..., 5] / 2)

        # ---- vote loss: seeds inside a GT box vote for its center ----
        seed_xyz = preds["seed_xyz"]
        smask = preds["seed_mask"]
        # ownership: nearest GT center whose box contains the seed (approx
        # containment by axis-aligned check in the box frame)
        rel = seed_xyz[:, :, None, :] - grav[:, None, :, :]
        yaw = gt_boxes[..., 6]
        cos, sin = jnp.cos(yaw), jnp.sin(yaw)
        # inverse of the corner convention (box_np_ops.points_in_rbbox)
        lx = rel[..., 0] * cos[:, None] - rel[..., 1] * sin[:, None]
        ly = rel[..., 0] * sin[:, None] + rel[..., 1] * cos[:, None]
        inside = (jnp.abs(lx) < gt_boxes[..., 3][:, None] / 2) & \
                 (jnp.abs(ly) < gt_boxes[..., 4][:, None] / 2) & \
                 (jnp.abs(rel[..., 2]) < gt_boxes[..., 5][:, None] / 2) & \
                 gt_mask[:, None, :]
        d2 = jnp.sum(rel ** 2, -1)
        d2 = jnp.where(inside, d2, 1e10)
        owner = jnp.argmin(d2, -1)
        has_owner = (jnp.min(d2, -1) < 1e9) & smask
        own_center = jnp.take_along_axis(
            grav, owner[..., None], 1)
        vote_err = jnp.linalg.norm(preds["vote_xyz"] - own_center, axis=-1)
        w = has_owner.astype(jnp.float32)
        vote_loss_w = float(dict(self.vote_loss or {}).get(
            "loss_weight", 1.0))
        losses = dict(vote_loss=vote_loss_w * jnp.sum(vote_err * w)
                      / jnp.maximum(w.sum(), 1.0))

        # ---- objectness / box losses on aggregated proposals ----
        agg = preds["aggregated_points"]
        amask = preds["aggregated_mask"]
        dd = jnp.sum((agg[:, :, None] - grav[:, None]) ** 2, -1)
        dd = jnp.where(gt_mask[:, None, :], dd, 1e10)
        near = jnp.sqrt(jnp.min(dd, -1))
        assign = jnp.argmin(dd, -1)
        pos = (near < 0.3) & amask
        neg = (near > 0.6) & amask
        obj_t = pos.astype(jnp.int32)
        obj_w = (pos | neg).astype(jnp.float32)
        ce = build_loss(dict(type="CrossEntropyLoss", reduction="none"))
        obj_l = ce(preds["obj_scores"], obj_t)
        losses["objectness_loss"] = jnp.sum(obj_l * obj_w) / \
            jnp.maximum(obj_w.sum(), 1.0)

        posw = pos.astype(jnp.float32)
        np_ = jnp.maximum(posw.sum(), 1.0)
        tgt_center = jnp.take_along_axis(grav, assign[..., None], 1)
        losses["center_loss"] = jnp.sum(
            jnp.sum(jnp.abs(preds["center"] - tgt_center), -1) * posw) / np_

        tgt_dims = jnp.take_along_axis(
            gt_boxes[..., 3:6], assign[..., None], 1)
        tgt_yaw = jnp.take_along_axis(gt_boxes[..., 6], assign, 1)
        tgt_label = jnp.take_along_axis(gt_labels, assign, 1)
        _, size_cls_t, size_res_t, dir_cls_t, dir_res_t = coder.encode(
            tgt_center, tgt_dims, tgt_yaw, tgt_label)
        losses["dir_class_loss"] = jnp.sum(
            ce(preds["dir_class"], dir_cls_t) * posw) / np_
        dres_p = jnp.take_along_axis(
            preds["dir_res"], dir_cls_t[..., None], -1)[..., 0]
        losses["dir_res_loss"] = jnp.sum(
            jnp.abs(dres_p - dir_res_t) * posw) / np_
        losses["size_class_loss"] = jnp.sum(
            ce(preds["size_class"], size_cls_t) * posw) / np_
        sres_p = jnp.take_along_axis(
            preds["size_res"],
            size_cls_t[..., None, None].repeat(3, -1), -2)[..., 0, :]
        losses["size_res_loss"] = jnp.sum(
            jnp.sum(jnp.abs(sres_p - size_res_t), -1) * posw) / np_
        losses["semantic_loss"] = jnp.sum(
            ce(preds["sem_scores"], tgt_label) * posw) / np_
        return losses

    # --------------------------------------------------------- inference
    def get_bboxes(self, preds: dict, max_num: int = 128) -> dict:
        coder = self._coder()
        boxes = coder.decode(preds["center"], preds["dir_class"],
                             preds["dir_res"], preds["size_class"],
                             preds["size_res"])
        # gravity-center -> bottom-center z
        boxes = boxes.at[..., 2].add(-boxes[..., 5] / 2)
        obj = jax.nn.softmax(preds["obj_scores"], -1)[..., 1]
        sem = jax.nn.softmax(preds["sem_scores"], -1)
        scores = obj[..., None] * sem
        best = jnp.max(scores, -1)
        labels = jnp.argmax(scores, -1)
        k = min(max_num, best.shape[-1])
        topv, topi = jax.lax.top_k(
            jnp.where(preds["aggregated_mask"], best, 0.0), k)
        return dict(
            bboxes=jnp.take_along_axis(boxes, topi[..., None], 1),
            scores=topv,
            labels=jnp.take_along_axis(labels, topi, 1),
            mask=topv > 0)
