"""Group-Free 3D detection head (transformer decoder over seed points).

Parity: `mmdet3d/models/dense_heads/groupfree3d_head.py:109` — the full
pipeline: (1) KPS initial candidate sampling (PointsObjClsModule seed
objectness -> top-num_proposal, `:320-330`), (2) a proposal conv head
(`BaseConvBboxHead`), (3) ``num_decoder_layers`` transformer layers, each
with its OWN prediction head and positional embeddings: the query pos
embed is computed from the PREVIOUS stage's decoded box (center+size,
detached, `:356-374`), the key pos embed from seed xyz, and (4) the
stage-summed loss over ``proposal. s0. ... s{L-1}.`` prefixes
(`loss:420-533`) with KPS sampling-objectness supervision (top-4 closest
seeds per GT are positives, `get_targets_single:795-815`).

TPU-native: fixed-capacity padded GTs/points, fully vectorized targets
(no per-sample python), masks carried end-to-end. Deviations (documented):
point-instance ownership is computed geometrically (containing box with
the nearest center) instead of the reference's first-3-containing-boxes
vote bookkeeping — identical except for points inside >3 overlapping
GT boxes; the `pts_instance_mask` dataset path reduces to the same
geometric assignment under the synthetic fixtures.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import BBOX_CODERS, HEADS, build_from_cfg
from ..backbones.pointnet2 import _SharedMLP
from ..losses import build_loss
from ..transformer import TransformerDecoderLayer


class PointsObjClsModule(nn.Module):
    """Seed objectness MLP (`groupfree3d_head.py:22-78`): (num_convs-1)
    conv+BN+ReLU blocks then a plain 1-channel conv."""

    in_channel: int
    num_convs: int = 3

    @nn.compact
    def __call__(self, feats, mask, train: bool = False):
        x = _SharedMLP((self.in_channel,) * (self.num_convs - 1),
                       name="mlp")(feats, mask, train=train)
        return nn.Dense(1, name="out")(x)[..., 0]


class _ConvBboxHead(nn.Module):
    """BaseConvBboxHead (`base_conv_bbox_head.py`): shared convs ->
    separate cls / reg 1x1 conv branches."""

    shared_conv_channels: Sequence[int]
    num_cls_out: int
    num_reg_out: int

    @nn.compact
    def __call__(self, feats, mask, train: bool = False):
        x = _SharedMLP(tuple(self.shared_conv_channels),
                       name="shared")(feats, mask, train=train)
        return (nn.Dense(self.num_cls_out, name="conv_cls")(x),
                nn.Dense(self.num_reg_out, name="conv_reg")(x))


@HEADS.register_module()
class GroupFree3DHead(nn.Module):
    num_classes: int = 18
    in_channels: int = 288
    bbox_coder: Any = None
    num_decoder_layers: int = 6
    num_proposal: int = 256
    embed_dims: int = 288
    num_heads: int = 8
    ffn_channels: int = 2048
    dropout: float = 0.1
    gt_per_seed: int = 3
    pred_layer_cfg: Any = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    sampling_objectness_loss: Any = None
    objectness_loss: Any = None
    center_loss: Any = None
    dir_class_loss: Any = None
    dir_res_loss: Any = None
    size_class_loss: Any = None
    size_res_loss: Any = None
    size_reg_loss: Any = None
    semantic_loss: Any = None

    def _coder(self):
        return build_from_cfg(dict(self.bbox_coder), BBOX_CODERS)

    def _reg_out_channels(self, coder) -> int:
        if coder.size_cls_agnostic:
            return 6 + coder.num_dir_bins * 2
        return 3 + coder.num_dir_bins * 2 + coder.num_sizes * 4

    def _split_pred(self, coder, cls_pred, reg_pred, base_xyz, prefix,
                    out) -> None:
        """`groupfree3d_bbox_coder.py:118-190` channel split."""
        i = 0

        def take(n):
            nonlocal i
            sl = reg_pred[..., i:i + n]
            i += n
            return sl

        nb = coder.num_dir_bins
        out[f"{prefix}center_residual"] = take(3)
        out[f"{prefix}center"] = base_xyz + out[f"{prefix}center_residual"]
        out[f"{prefix}dir_class"] = take(nb)
        dir_res_norm = take(nb)
        out[f"{prefix}dir_res_norm"] = dir_res_norm
        out[f"{prefix}dir_res"] = dir_res_norm * (jnp.pi / nb)
        if coder.size_cls_agnostic:
            out[f"{prefix}size"] = take(3)
        else:
            ns = coder.num_sizes
            out[f"{prefix}size_class"] = take(ns)
            srn = take(ns * 3).reshape(reg_pred.shape[:-1] + (ns, 3))
            out[f"{prefix}size_res_norm"] = srn
            out[f"{prefix}size_res"] = srn * jnp.asarray(
                coder.mean_sizes)[None, None]
        out[f"{prefix}obj_scores"] = cls_pred[..., :1]
        out[f"{prefix}sem_scores"] = cls_pred[..., 1:]

    @nn.compact
    def __call__(self, feat_dict: dict, train: bool = False) -> dict:
        coder = self._coder()
        seed_xyz = feat_dict["fp_xyz"][-1]
        seed_feats = feat_dict["fp_features"][-1]
        seed_mask = feat_dict["fp_masks"][-1]

        # 1. KPS candidate sampling: top-num_proposal seeds by objectness
        obj_logits = PointsObjClsModule(
            seed_feats.shape[-1], name="points_obj_cls")(
                seed_feats, seed_mask, train=train)
        k = min(self.num_proposal, seed_xyz.shape[1])
        _, topi = jax.lax.top_k(
            jnp.where(seed_mask, obj_logits, -1e9), k)
        cand_xyz = jnp.take_along_axis(seed_xyz, topi[..., None], 1)
        cand_feats = jnp.take_along_axis(seed_feats, topi[..., None], 1)
        cand_mask = jnp.take_along_axis(seed_mask, topi, 1)

        preds = dict(
            seeds_obj_cls_logits=obj_logits,
            seed_xyz=seed_xyz, seed_mask=seed_mask,
            query_points_xyz=cand_xyz, query_points_sample_inds=topi,
            query_points_mask=cand_mask)

        pl = dict(self.pred_layer_cfg or {})
        shared = tuple(pl.get("shared_conv_channels",
                              (self.embed_dims, self.embed_dims)))
        cls_out = self.num_classes + 1
        reg_out = self._reg_out_channels(coder)

        # 2. initial proposal prediction
        cls_p, reg_p = _ConvBboxHead(shared, cls_out, reg_out,
                                     name="conv_pred")(
            cand_feats, cand_mask, train=train)
        self._split_pred(coder, cls_p, reg_p, cand_xyz, "proposal.", preds)
        bbox3d = coder.decode(preds, "proposal.")

        # 3. iterative refinement; each layer re-embeds the previous
        # stage's detached box as the query position
        query = nn.Dense(self.embed_dims, name="decoder_query_proj")(
            cand_feats)
        key = nn.Dense(self.embed_dims, name="decoder_key_proj")(seed_feats)
        for li in range(self.num_decoder_layers):
            prefix = f"s{li}."
            base_bbox = jax.lax.stop_gradient(bbox3d[..., :6])
            query = TransformerDecoderLayer(
                self.embed_dims, self.num_heads, self.ffn_channels,
                dropout=self.dropout, name=f"decoder_{li}")(
                    query, key, base_bbox, seed_xyz, train=train,
                    key_mask=seed_mask, query_mask=cand_mask)
            cls_p, reg_p = _ConvBboxHead(shared, cls_out, reg_out,
                                         name=f"prediction_head_{li}")(
                query, cand_mask, train=train)
            self._split_pred(coder, cls_p, reg_p, cand_xyz, prefix, preds)
            bbox3d = coder.decode(preds, prefix)
        preds["num_decoder_layers"] = self.num_decoder_layers
        return preds

    # ---------------------------------------------------------- targets
    def _point_instance_labels(self, points, gt_boxes, gt_mask):
        """(B, N) owning-GT index (-1 = background): the containing box
        with the nearest gravity center (`get_targets_single:705-760`,
        vectorized; see module docstring for the >gt_per_seed caveat)."""
        grav = gt_boxes[..., :3].at[..., 2].add(gt_boxes[..., 5] / 2)
        rel = points[:, :, None, :3] - grav[:, None]
        yaw = gt_boxes[..., 6]
        cos, sin = jnp.cos(yaw), jnp.sin(yaw)
        lx = rel[..., 0] * cos[:, None] - rel[..., 1] * sin[:, None]
        ly = rel[..., 0] * sin[:, None] + rel[..., 1] * cos[:, None]
        inside = (jnp.abs(lx) < gt_boxes[..., 3][:, None] / 2) & \
                 (jnp.abs(ly) < gt_boxes[..., 4][:, None] / 2) & \
                 (jnp.abs(rel[..., 2]) < gt_boxes[..., 5][:, None] / 2) & \
                 gt_mask[:, None]
        d2 = jnp.where(inside, jnp.sum(rel ** 2, -1), 1e10)
        label = jnp.argmin(d2, -1)
        return jnp.where(jnp.min(d2, -1) < 1e9, label, -1), grav

    def loss(self, preds: dict, batch: dict) -> dict:
        coder = self._coder()
        gt_boxes = batch["gt_bboxes_3d"]
        gt_labels = batch["gt_labels_3d"]
        gt_mask = batch["gt_mask"]
        points = batch["points"]
        pmask = batch["points_mask"]
        bsz = points.shape[0]
        eps = 1e-6

        inst, grav = self._point_instance_labels(points, gt_boxes, gt_mask)
        inst = jnp.where(pmask, inst, -1)

        seed_xyz = preds["seed_xyz"]
        smask = preds["seed_mask"]
        # backbone seeds are fp outputs of the original cloud; their
        # instance labels are recomputed geometrically (the reference
        # gathers via fp_indices — same values)
        seed_inst, _ = self._point_instance_labels(seed_xyz, gt_boxes,
                                                   gt_mask)
        seed_inst = jnp.where(smask, seed_inst, -1)

        # --- sampling objectness: top-4 closest seeds of each GT ---
        delta = (seed_xyz[:, None] - grav[:, :, None]) / \
            (gt_boxes[..., 3:6][:, :, None] + eps)          # (B, G, N, 3)
        dist = jnp.sqrt(jnp.sum(delta ** 2, -1) + eps)
        owned = seed_inst[:, None, :] == \
            jnp.arange(gt_boxes.shape[1])[None, :, None]
        dist = jnp.where(owned, dist, 100.0)
        k = 4
        _, top_inds = jax.lax.top_k(-dist, k)               # (B, G, k)
        hit = jnp.zeros(seed_xyz.shape[:2])
        valid_pick = jnp.take_along_axis(dist, top_inds, -1) < 99.0
        gt_ok = gt_mask[..., None] & valid_pick
        hit = jax.vmap(lambda h, idx, ok: h.at[idx.reshape(-1)].max(
            ok.reshape(-1).astype(h.dtype)))(hit, top_inds, gt_ok)
        sampling_t = (hit > 0.5) & (seed_inst >= 0)
        sw = smask.astype(jnp.float32)
        sw = sw / jnp.maximum(sw.sum(-1, keepdims=True), 1.0)

        focal = build_loss(dict(type="FocalLoss", use_sigmoid=True,
                                gamma=2.0, alpha=0.25, reduction="none"))
        s_cfg = dict(self.sampling_objectness_loss or {})
        s_logit = preds["seeds_obj_cls_logits"][..., None]
        s_loss = focal(s_logit, sampling_t.astype(jnp.int32)[..., None])
        losses = dict(sampling_objectness_loss=float(
            s_cfg.get("loss_weight", 8.0)) * jnp.sum(
                s_loss[..., 0] * sw) / bsz)

        # --- per-candidate targets ---
        topi = preds["query_points_sample_inds"]
        cmask = preds["query_points_mask"]
        cand_inst = jnp.take_along_axis(seed_inst, topi, 1)
        objness_t = (cand_inst >= 0) & cmask
        ow = cmask.astype(jnp.float32)
        ow = ow / jnp.maximum(ow.sum(-1, keepdims=True), 1.0)
        blw = objness_t.astype(jnp.float32)
        blw = blw / (blw.sum() + eps)

        assign = jnp.where(cand_inst >= 0, cand_inst,
                           gt_boxes.shape[1] - 1)          # bg -> last gt
        t_center = jnp.take_along_axis(grav, assign[..., None], 1)
        t_dims = jnp.take_along_axis(gt_boxes[..., 3:6],
                                     assign[..., None], 1)
        t_yaw = jnp.take_along_axis(gt_boxes[..., 6], assign, 1)
        t_label = jnp.take_along_axis(gt_labels, assign, 1)
        if coder.with_rot:
            dir_cls_t, dir_res_t = coder.angle2class(t_yaw)
        else:
            dir_cls_t = jnp.zeros(t_yaw.shape, jnp.int32)
            dir_res_t = jnp.zeros_like(t_yaw)
        nb = coder.num_dir_bins
        dir_res_t = dir_res_t / (jnp.pi / nb)              # `:841`
        mean_sizes = jnp.asarray(coder.mean_sizes)
        size_cls_t = t_label
        size_res_t = (t_dims - mean_sizes[size_cls_t]) / \
            (mean_sizes[size_cls_t] + eps)                  # `:848-858`

        ce = build_loss(dict(type="CrossEntropyLoss", reduction="none"))
        sl1 = build_loss(dict(type="SmoothL1Loss", beta=1.0,
                              reduction="none"))

        def w_of(cfg, default):
            return float(dict(cfg or {}).get("loss_weight", default))

        prefixes = ["proposal."] + \
            [f"s{i}." for i in range(int(preds["num_decoder_layers"]))]
        ns = len(prefixes)
        for prefix in prefixes:
            ol = focal(preds[f"{prefix}obj_scores"],
                       objness_t.astype(jnp.int32)[..., None])
            losses[f"{prefix}objectness_loss"] = w_of(
                self.objectness_loss, 1.0) * jnp.sum(
                    ol[..., 0] * ow) / bsz / ns
            cl = jnp.sum(sl1(preds[f"{prefix}center"], t_center), -1)
            losses[f"{prefix}center_loss"] = w_of(
                self.center_loss, 10.0) * jnp.sum(cl * blw) / ns
            dcl = ce(preds[f"{prefix}dir_class"], dir_cls_t)
            losses[f"{prefix}dir_class_loss"] = w_of(
                self.dir_class_loss, 1.0) * jnp.sum(dcl * blw) / ns
            drn = jnp.take_along_axis(preds[f"{prefix}dir_res_norm"],
                                      dir_cls_t[..., None], -1)[..., 0]
            losses[f"{prefix}dir_res_loss"] = w_of(
                self.dir_res_loss, 10.0) * jnp.sum(
                    sl1(drn, dir_res_t) * blw) / ns
            if coder.size_cls_agnostic:
                szl = jnp.sum(sl1(preds[f"{prefix}size"], t_dims), -1)
                losses[f"{prefix}size_reg_loss"] = w_of(
                    self.size_reg_loss, 10.0) * jnp.sum(szl * blw) / ns
            else:
                scl = ce(preds[f"{prefix}size_class"], size_cls_t)
                losses[f"{prefix}size_class_loss"] = w_of(
                    self.size_class_loss, 1.0) * jnp.sum(scl * blw) / ns
                srn = jnp.take_along_axis(
                    preds[f"{prefix}size_res_norm"],
                    size_cls_t[..., None, None].repeat(3, -1), -2)[..., 0, :]
                srl = jnp.sum(sl1(srn, size_res_t), -1)
                losses[f"{prefix}size_res_loss"] = w_of(
                    self.size_res_loss, 10.0) * jnp.sum(srl * blw) / ns
            sel = ce(preds[f"{prefix}sem_scores"], t_label)
            losses[f"{prefix}semantic_loss"] = w_of(
                self.semantic_loss, 1.0) * jnp.sum(sel * blw) / ns
        return losses

    # --------------------------------------------------------- inference
    def get_bboxes(self, preds: dict, max_num: int = 128) -> dict:
        """Decode per test_cfg.prediction_stages ('last' default; 'all' /
        'last_three' concatenate stages, `get_bboxes:862-900`), fuse
        objectness x semantics, return top-k (aligned-NMS free path —
        the indoor evaluator consumes score-ranked boxes)."""
        coder = self._coder()
        stages = dict(self.test_cfg or {}).get("prediction_stages", "last")
        nl = int(preds["num_decoder_layers"])
        if stages == "all":
            prefixes = ["proposal."] + [f"s{i}." for i in range(nl)]
        elif stages == "last_three":
            prefixes = [f"s{i}." for i in range(max(0, nl - 3), nl)]
        else:
            prefixes = [f"s{nl - 1}."]
        boxes, scores, labels, masks = [], [], [], []
        for prefix in prefixes:
            bbox = coder.decode(preds, prefix)
            bbox = bbox.at[..., 2].add(-bbox[..., 5] / 2)  # grav -> bottom
            obj = jax.nn.sigmoid(preds[f"{prefix}obj_scores"][..., -1])
            sem = jax.nn.softmax(preds[f"{prefix}sem_scores"], -1)
            sc = obj[..., None] * sem
            boxes.append(bbox)
            scores.append(jnp.max(sc, -1))
            labels.append(jnp.argmax(sc, -1))
            masks.append(preds["query_points_mask"])
        boxes = jnp.concatenate(boxes, 1)
        scores = jnp.concatenate(scores, 1)
        labels = jnp.concatenate(labels, 1)
        masks = jnp.concatenate(masks, 1)
        k = min(max_num, scores.shape[-1])
        topv, topi = jax.lax.top_k(jnp.where(masks, scores, 0.0), k)
        return dict(bboxes=jnp.take_along_axis(boxes, topi[..., None], 1),
                    scores=topv,
                    labels=jnp.take_along_axis(labels, topi, 1),
                    mask=topv > 0)
