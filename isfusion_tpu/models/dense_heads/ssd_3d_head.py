"""3DSSD head (anchor-free single-stage point-based detection).

Parity: `mmdet3d/models/dense_heads/ssd_3d_head.py` — candidate points
shifted from sampled seeds (the "candidate generation layer"), grouped
features, anchor-free regression (center offset, explicit size, direction
class+residual) with corner-distance supervision; objectness = candidate
inside a GT box. Differences from VoteNet: no FP upsampling, no size
clusters (direct size regression).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import HEADS, BBOX_CODERS, build_from_cfg
from ..backbones.pointnet2 import PointSAModule, _SharedMLP
from ..losses import build_loss


@HEADS.register_module()
class SSD3DHead(nn.Module):
    num_classes: int = 10
    bbox_coder: Any = None             # PartialBinBasedBBoxCoder (dir bins)
    candidate_shift_channels: Sequence[int] = (128,)
    feat_channels: Sequence[int] = (128, 128)
    vote_aggregation_cfg: Any = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None

    def _coder(self):
        return build_from_cfg(dict(self.bbox_coder), BBOX_CODERS)

    @nn.compact
    def __call__(self, feat_dict: dict, train: bool = False) -> dict:
        seed_xyz = feat_dict["fp_xyz"][-1]
        seed_feats = feat_dict["fp_features"][-1]
        seed_mask = feat_dict["fp_masks"][-1]
        # candidate generation: learned shift of the seeds
        h = _SharedMLP(tuple(self.candidate_shift_channels),
                       name="shift_mlp")(seed_feats, seed_mask,
                                         train=train)
        shift = nn.Dense(3, name="shift_out")(h)
        cand_xyz = seed_xyz + shift
        agg_cfg = dict(self.vote_aggregation_cfg or
                       dict(num_point=256, radius=4.8, num_sample=16,
                            mlp_channels=[256, 256, 256, 512]))
        agg_cfg.pop("type", None)
        agg_xyz, agg_feats, _, agg_mask = PointSAModule(
            num_point=int(agg_cfg.get("num_point", 256)),
            radii=[float(agg_cfg.get("radius", 4.8))],
            sample_nums=[int(agg_cfg.get("num_sample", 16))],
            mlp_channels=list(agg_cfg.get("mlp_channels",
                                          [256, 256, 256, 512])),
            use_xyz=True, normalize_xyz=True,
            name="aggregation")(cand_xyz, seed_feats, seed_mask,
                                train=train)
        x = _SharedMLP(tuple(self.feat_channels), name="pred_mlp")(
            agg_feats, agg_mask, train=train)
        coder = self._coder()
        nb = coder.num_dir_bins
        out = nn.Dense(3 + 3 + nb * 2 + self.num_classes + 1,
                       name="conv_pred")(x)
        center = agg_xyz + out[..., :3]
        size = jnp.exp(jnp.clip(out[..., 3:6], -4, 4))
        dir_class = out[..., 6:6 + nb]
        dir_res = out[..., 6 + nb:6 + 2 * nb] * (jnp.pi / nb)
        obj = out[..., 6 + 2 * nb:7 + 2 * nb][..., 0]
        sem = out[..., 7 + 2 * nb:]
        return dict(candidate_xyz=cand_xyz, seed_xyz=seed_xyz,
                    aggregated_mask=agg_mask, center=center, size=size,
                    dir_class=dir_class, dir_res=dir_res,
                    obj_score=obj, sem_scores=sem)

    def loss(self, preds: dict, batch: dict) -> dict:
        coder = self._coder()
        gt = batch["gt_bboxes_3d"]
        gmask = batch["gt_mask"]
        labels = batch["gt_labels_3d"]
        grav = gt[..., :3].at[..., 2].add(gt[..., 5] / 2)
        center = preds["center"]
        d2 = jnp.sum((center[:, :, None] - grav[:, None]) ** 2, -1)
        d2 = jnp.where(gmask[:, None, :], d2, 1e10)
        assign = jnp.argmin(d2, -1)
        near = jnp.sqrt(jnp.min(d2, -1))
        # objectness: candidate inside the assigned box's BEV footprint
        pos = (near < 2.0) & preds["aggregated_mask"]
        ce = build_loss(dict(type="CrossEntropyLoss", use_sigmoid=True,
                             reduction="none"))
        w = preds["aggregated_mask"].astype(jnp.float32)
        losses = dict(objectness_loss=jnp.sum(
            ce(preds["obj_score"], pos.astype(jnp.float32)) * w)
            / jnp.maximum(w.sum(), 1.0))
        pw = pos.astype(jnp.float32)
        np_ = jnp.maximum(pw.sum(), 1.0)
        tgt_c = jnp.take_along_axis(grav, assign[..., None], 1)
        losses["center_loss"] = jnp.sum(
            jnp.sum(jnp.abs(center - tgt_c), -1) * pw) / np_
        tgt_s = jnp.take_along_axis(gt[..., 3:6], assign[..., None], 1)
        losses["size_loss"] = jnp.sum(
            jnp.sum(jnp.abs(preds["size"] - tgt_s), -1) * pw) / np_
        tgt_yaw = jnp.take_along_axis(gt[..., 6], assign, 1)
        dir_cls_t, dir_res_t = coder.angle2class(tgt_yaw)
        ce_sm = build_loss(dict(type="CrossEntropyLoss", reduction="none"))
        losses["dir_class_loss"] = jnp.sum(
            ce_sm(preds["dir_class"], dir_cls_t) * pw) / np_
        dres = jnp.take_along_axis(preds["dir_res"],
                                   dir_cls_t[..., None], -1)[..., 0]
        losses["dir_res_loss"] = jnp.sum(jnp.abs(dres - dir_res_t) * pw) \
            / np_
        tgt_l = jnp.take_along_axis(labels, assign, 1)
        losses["semantic_loss"] = jnp.sum(
            ce_sm(preds["sem_scores"], tgt_l) * pw) / np_
        return losses

    def get_bboxes(self, preds: dict, max_num: int = 128) -> dict:
        coder = self._coder()
        dir_cls = jnp.argmax(preds["dir_class"], -1)
        dres = jnp.take_along_axis(preds["dir_res"],
                                   dir_cls[..., None], -1)[..., 0]
        yaw = coder.class2angle(dir_cls, dres)
        boxes = jnp.concatenate(
            [preds["center"].at[..., 2].add(-preds["size"][..., 2] / 2),
             preds["size"], yaw[..., None]], -1)
        obj = jax.nn.sigmoid(preds["obj_score"])
        sem = jax.nn.softmax(preds["sem_scores"], -1)
        scores = obj[..., None] * sem
        best = jnp.max(scores, -1)
        label = jnp.argmax(scores, -1)
        k = min(max_num, best.shape[-1])
        topv, topi = jax.lax.top_k(
            jnp.where(preds["aggregated_mask"], best, 0.0), k)
        return dict(bboxes=jnp.take_along_axis(boxes, topi[..., None], 1),
                    scores=topv,
                    labels=jnp.take_along_axis(label, topi, 1),
                    mask=topv > 0)
