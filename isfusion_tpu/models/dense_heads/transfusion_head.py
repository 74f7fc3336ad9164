"""TransFusion-style query-based detection head (V2, used by IS-Fusion).

Parity: `mmdet3d/models/dense_heads/transfusion_head_v2.py:593`
(TransFusionHeadV2): shared conv -> dense heatmap -> max-pool NMS ->
top-num_proposals query init with class embedding (`forward_single:771-850`)
-> TransformerDecoderLayer(s) (`:42`) -> FFN prediction branches (`FFN:505`)
-> per-layer Hungarian targets (`get_targets_single:962`) + gaussian
heatmap targets (`:1080-1127`) -> losses (`loss:1142`) -> score-fused
decode (`get_bboxes:1278`).

TPU-native differences: all tensors channels-last with static shapes;
GT padding carried as masks; gaussian targets painted by vectorized
max-reduce; Hungarian matching via a scipy host callback inside jit
(the reference also matches on CPU, `hungarian_assigner.py:136`);
NMS-free output stays (B, num_proposals) with a validity mask.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...registry import (BBOX_ASSIGNERS, BBOX_CODERS, HEADS, build_from_cfg)
from ...core.bbox.assigners import HungarianAssigner3D
from ...ops.box_ops import circle_nms_mask
from ...ops.gaussian import draw_heatmap_gaussian_batch, gaussian_radius
from ..layers import ConvModule, resolve_dtype
from ..losses import build_loss
from ..transformer import TransformerDecoderLayer
from .centerpoint_head import clip_sigmoid


class _FFNHead(nn.Module):
    """Per-branch prediction MLPs over (B, P, C) query features
    (`transfusion_head_v2.py:505`, Conv1d == per-query Dense)."""

    heads: Any
    head_conv: int = 64
    init_bias: float = -2.19
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> dict:
        out = {}
        for key, (classes, num_conv) in dict(self.heads).items():
            h = x
            for i in range(int(num_conv) - 1):
                h = nn.Dense(self.head_conv, dtype=self.dtype,
                             name=f"{key}_{i}")(h)
                h = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype,
                                 name=f"{key}_{i}_bn")(h)
                h = nn.relu(h)
            bias_init = nn.initializers.constant(self.init_bias) \
                if key == "heatmap" else nn.initializers.zeros
            # final branch Dense in f32: box regression / logits feed
            # decode + Hungarian targets at full precision
            out[key] = nn.Dense(int(classes), bias_init=bias_init,
                                name=f"{key}_final")(
                                    h.astype(jnp.float32))
        return out


def _maxpool_nms(heat: jnp.ndarray, kernel: int,
                 flat_classes: Tuple[int, ...]) -> jnp.ndarray:
    """Keep only local maxima (B, H, W, C); classes in ``flat_classes`` use
    kernel 1 (`forward_single:798-817` ped/cone exception)."""
    pad = kernel // 2
    pooled = nn.max_pool(heat, (kernel, kernel), strides=(1, 1),
                         padding="VALID")
    pooled = jnp.pad(pooled, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     constant_values=-jnp.inf)
    keep = heat == pooled
    if flat_classes:
        c = heat.shape[-1]
        flat = jnp.zeros((c,), bool).at[jnp.asarray(flat_classes)].set(True)
        keep = keep | flat[None, None, None, :]
    return heat * keep


@HEADS.register_module()
class TransFusionHeadV2(nn.Module):
    num_proposals: int = 128
    auxiliary: bool = True
    in_channels: int = 384
    hidden_channel: int = 128
    num_classes: int = 4
    num_decoder_layers: int = 3
    num_heads: int = 8
    nms_kernel_size: int = 1
    ffn_channel: int = 256
    dropout: float = 0.1
    bn_momentum: float = 0.1
    activation: str = "relu"
    common_heads: Any = None
    num_heatmap_convs: int = 2
    loss_cls: Any = None
    loss_iou: Any = None
    loss_bbox: Any = None
    loss_heatmap: Any = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    bbox_coder: Optional[dict] = None
    compute_dtype: Optional[str] = None

    def _coder(self):
        return build_from_cfg(dict(self.bbox_coder), BBOX_CODERS)

    def _assigner(self) -> HungarianAssigner3D:
        cfg = dict(dict(self.train_cfg or {}).get("assigner", {}))
        cfg.setdefault("type", "HungarianAssigner3D")
        return build_from_cfg(cfg, BBOX_ASSIGNERS)

    def _flat_nms_classes(self) -> Tuple[int, ...]:
        ds = dict(self.test_cfg or {}).get("dataset", "nuScenes")
        if ds == "nuScenes" and self.num_classes >= 10:
            return (8, 9)
        if ds == "Waymo":
            return (1, 2)
        return ()

    @nn.compact
    def __call__(self, feats, img_feats=None, train: bool = False) -> dict:
        """feats: (B, H, W, C_in) or a 1-list of it. Returns a dict of
        (B, num_proposals [* num_layers], c) predictions + dense maps."""
        x = feats[0] if isinstance(feats, (tuple, list)) else feats
        dt = resolve_dtype(self.compute_dtype)
        if dt is not None:
            x = x.astype(dt)
        b, h, w, _ = x.shape
        p = self.num_proposals
        nc = self.num_classes
        lidar_feat = nn.Conv(self.hidden_channel, (3, 3), padding=1,
                             use_bias=True, dtype=dt,
                             name="shared_conv")(x)

        hm = ConvModule(self.hidden_channel, kernel_size=3, padding=1,
                        norm_cfg=dict(type="BN2d"),
                        act_cfg=dict(type="relu"), dtype=dt,
                        name="heatmap_conv")(lidar_feat, train=train)
        # dense heatmap logits in f32 (focal loss + top-k proposal scores)
        dense_heatmap = nn.Conv(
            nc, (3, 3), padding=1, use_bias=True,
            bias_init=nn.initializers.constant(-2.19),  # focal prior init
            name="heatmap_out")(hm.astype(jnp.float32))

        heat = jax.nn.sigmoid(jax.lax.stop_gradient(dense_heatmap))
        heat = _maxpool_nms(heat, self.nms_kernel_size,
                            self._flat_nms_classes())
        heat_flat = heat.reshape(b, h * w, nc)

        # joint top-k over classes*positions (`forward_single:820-826`)
        flat_all = heat_flat.transpose(0, 2, 1).reshape(b, nc * h * w)
        _, top = jax.lax.top_k(flat_all, p)
        top_class = (top // (h * w)).astype(jnp.int32)       # (B, P)
        top_index = (top % (h * w)).astype(jnp.int32)        # (B, P)

        ys = (top_index // w).astype(jnp.float32) + 0.5
        xs = (top_index % w).astype(jnp.float32) + 0.5
        query_pos = jnp.stack([xs, ys], -1)                  # (B, P, 2)

        lidar_flat = lidar_feat.reshape(b, h * w, self.hidden_channel)
        query_feat = jnp.take_along_axis(
            lidar_flat, top_index[..., None], axis=1)        # (B, P, C)
        one_hot = jax.nn.one_hot(top_class, nc,
                                 dtype=query_feat.dtype)
        query_feat = query_feat + nn.Dense(
            self.hidden_channel, dtype=dt, name="class_encoding")(one_hot)

        # BEV key positions (+0.5 grid centers, `create_2D_grid`)
        gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        bev_pos = jnp.asarray(
            np.stack([gx + 0.5, gy + 0.5], -1).reshape(1, h * w, 2),
            jnp.float32)
        bev_pos = jnp.broadcast_to(bev_pos, (b, h * w, 2))

        layer_preds = []
        qpos = query_pos
        for i in range(self.num_decoder_layers):
            query_feat = TransformerDecoderLayer(
                self.hidden_channel, self.num_heads, self.ffn_channel,
                self.dropout, self.activation, dtype=dt,
                name=f"decoder_{i}")(query_feat, lidar_flat, qpos, bev_pos,
                                     train=train)
            res = _FFNHead(
                heads={**dict(self.common_heads or {}),
                       "heatmap": (nc, self.num_heatmap_convs)},
                head_conv=self.hidden_channel, dtype=dt,
                name=f"pred_{i}")(query_feat, train=train)
            res["center"] = res["center"] + qpos
            qpos = jax.lax.stop_gradient(res["center"])
            layer_preds.append(res)

        preds = {k: jnp.concatenate([lp[k] for lp in layer_preds], axis=1)
                 for k in layer_preds[0]}
        preds["dense_heatmap"] = dense_heatmap
        preds["query_heatmap_score"] = jnp.take_along_axis(
            heat_flat, top_index[..., None], axis=1)         # (B, P, nc)
        preds["query_labels"] = top_class
        return preds

    # ------------------------------------------------------------ targets
    def get_targets(self, preds: dict, gt_bboxes: jnp.ndarray,
                    gt_labels: jnp.ndarray, gt_mask: jnp.ndarray,
                    feat_hw: Tuple[int, int]):
        """Per-layer Hungarian matching on decoded (stop-grad) predictions
        + dense gaussian heatmap target. All shapes static."""
        coder = self._coder()
        assigner = self._assigner()
        tc = dict(self.train_cfg or {})
        nl = self.num_decoder_layers if self.auxiliary else 1
        p = self.num_proposals

        det = {k: jax.lax.stop_gradient(preds[k])
               for k in ("heatmap", "center", "height", "dim", "rot")}
        vel = jax.lax.stop_gradient(preds["vel"]) if "vel" in preds else None

        def decode_layer(l, bidx):
            sl = slice(l * p, (l + 1) * p)
            d = coder.decode(
                det["heatmap"][bidx, sl].T, det["rot"][bidx, sl].T,
                det["dim"][bidx, sl].T, det["center"][bidx, sl].T,
                det["height"][bidx, sl].T,
                vel[bidx, sl].T if vel is not None else None)
            return d["bboxes"], det["heatmap"][bidx, sl]

        def single(bidx, gts, glabels, gmask):
            all_inds, all_labels, all_ious = [], [], []
            for l in range(nl):
                boxes, cls_logits = decode_layer(l, bidx)
                res = assigner.assign(boxes, gts, glabels, gmask,
                                      cls_logits, tc)
                all_inds.append(res.gt_inds)
                all_labels.append(res.labels)
                all_ious.append(res.max_overlaps)
            return (jnp.concatenate(all_inds), jnp.concatenate(all_labels),
                    jnp.concatenate(all_ious))

        b = gt_bboxes.shape[0]
        gt_inds, labels, ious = jax.vmap(single)(
            jnp.arange(b), gt_bboxes, gt_labels, gt_mask)

        matched = gt_inds >= 0
        gather = jnp.take_along_axis(
            gt_bboxes, jnp.clip(gt_inds, 0)[..., None], axis=1)
        bbox_targets = coder.encode(gather)
        bbox_weights = matched[..., None].astype(jnp.float32)
        cls_labels = jnp.where(matched, labels, self.num_classes)
        label_weights = jnp.ones_like(cls_labels, jnp.float32)
        num_pos = jnp.sum(matched.astype(jnp.float32))
        matched_ious = jnp.sum(ious) / jnp.maximum(num_pos, 1.0)

        # dense heatmap target (single task over all classes,
        # `get_targets_single:1080-1127`)
        pc_range = np.asarray(tc["point_cloud_range"], np.float32)
        voxel_size = np.asarray(tc["voxel_size"], np.float32)
        osf = int(tc["out_size_factor"])
        h, w = feat_hw
        cx = (gt_bboxes[..., 0] - pc_range[0]) / (voxel_size[0] * osf)
        cy = (gt_bboxes[..., 1] - pc_range[1]) / (voxel_size[1] * osf)
        dxw = gt_bboxes[..., 3] / (voxel_size[0] * osf)
        dyl = gt_bboxes[..., 4] / (voxel_size[1] * osf)
        radius = gaussian_radius(
            (dyl, dxw), min_overlap=float(tc.get("gaussian_overlap", 0.1)))
        radius = jnp.maximum(float(tc.get("min_radius", 2)),
                             jnp.floor(radius)).astype(jnp.float32)
        ok = gt_mask & (dxw > 0) & (dyl > 0) & \
            (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)

        def heat_single(cxy, rad, glabels, valid):
            return jnp.stack([
                draw_heatmap_gaussian_batch(
                    (h, w), cxy, rad, valid & (glabels == c))
                for c in range(self.num_classes)], -1)

        heatmap = jax.vmap(heat_single)(
            jnp.stack([cx, cy], -1), radius, gt_labels, ok)

        return (cls_labels, label_weights, bbox_targets, bbox_weights,
                num_pos, matched_ious, heatmap)

    # -------------------------------------------------------------- loss
    def loss(self, preds: dict, gt_bboxes: jnp.ndarray,
             gt_labels: jnp.ndarray, gt_mask: jnp.ndarray,
             ins_heatmap: Optional[jnp.ndarray] = None) -> dict:
        h, w = preds["dense_heatmap"].shape[1:3]
        (labels, label_weights, bbox_targets, bbox_weights, num_pos,
         matched_ious, heatmap) = self.get_targets(
            preds, gt_bboxes, gt_labels, gt_mask, (h, w))

        tc = dict(self.train_cfg or {})
        loss_cls_fn = build_loss(dict(
            self.loss_cls or dict(type="FocalLoss", use_sigmoid=True,
                                  gamma=2.0, alpha=0.25, reduction="mean",
                                  loss_weight=1.0)))
        loss_bbox_fn = build_loss(dict(
            self.loss_bbox or dict(type="L1Loss", reduction="mean",
                                   loss_weight=0.25)))
        loss_hm_fn = build_loss(dict(
            self.loss_heatmap or dict(type="GaussianFocalLoss",
                                      reduction="mean", loss_weight=1.0)))

        losses = {}
        hm_pos = jnp.maximum(jnp.sum((heatmap == 1.0).astype(jnp.float32)),
                             1.0)
        losses["loss_heatmap"] = loss_hm_fn(
            clip_sigmoid(preds["dense_heatmap"]), heatmap,
            avg_factor=hm_pos)
        if ins_heatmap is not None:
            losses["loss_heatmap_ins"] = loss_hm_fn(
                clip_sigmoid(ins_heatmap), heatmap, avg_factor=hm_pos)

        p = self.num_proposals
        nl = self.num_decoder_layers if self.auxiliary else 1
        code_weights = jnp.asarray(tc.get("code_weights", [1.0] * 10),
                                   jnp.float32)
        code = bbox_targets.shape[-1]
        pred_boxes = jnp.concatenate(
            [preds["center"], preds["height"], preds["dim"], preds["rot"]]
            + ([preds["vel"]] if "vel" in preds else []), axis=-1)
        one_hot = jax.nn.one_hot(labels, self.num_classes + 1,
                                 dtype=jnp.float32)[..., :self.num_classes]
        for l in range(nl):
            prefix = "layer_-1" if l == nl - 1 else f"layer_{l}"
            sl = slice(l * p, (l + 1) * p)
            losses[f"{prefix}_loss_cls"] = loss_cls_fn(
                preds["heatmap"][:, sl].reshape(-1, self.num_classes),
                one_hot[:, sl].reshape(-1, self.num_classes),
                weight=label_weights[:, sl].reshape(-1)[:, None],
                avg_factor=jnp.maximum(num_pos, 1.0))
            reg_w = bbox_weights[:, sl] * code_weights[None, None, :code]
            losses[f"{prefix}_loss_bbox"] = loss_bbox_fn(
                pred_boxes[:, sl], bbox_targets[:, sl], weight=reg_w,
                avg_factor=jnp.maximum(num_pos, 1.0))
        losses["matched_ious"] = jax.lax.stop_gradient(matched_ious)
        return losses

    # --------------------------------------------------------- inference
    def get_bboxes(self, preds: dict) -> dict:
        """NMS-free decode of the LAST layer's proposals
        (`get_bboxes:1278-1401`). Returns (B, num_proposals) padded boxes."""
        coder = self._coder()
        p = self.num_proposals
        nc = self.num_classes
        score = jax.nn.sigmoid(preds["heatmap"][:, -p:])     # (B, P, nc)
        one_hot = jax.nn.one_hot(preds["query_labels"], nc)
        score = score * preds["query_heatmap_score"] * one_hot

        def single(score_s, rot, dim, center, height, vel):
            d = coder.decode(score_s.T, rot.T, dim.T, center.T, height.T,
                             vel.T if vel is not None else None)
            mask = coder.valid_mask(d["bboxes"], d["scores"])
            return d["bboxes"], jnp.where(mask, d["scores"], 0.0), \
                d["labels"], mask

        vel = preds.get("vel")
        bboxes, scores, labels, mask = jax.vmap(single)(
            score, preds["rot"][:, -p:], preds["dim"][:, -p:],
            preds["center"][:, -p:], preds["height"][:, -p:],
            vel[:, -p:] if vel is not None else
            jnp.zeros(score.shape[:2] + (2,), score.dtype))

        tcfg = dict(self.test_cfg or {})
        nms_type = tcfg.get("nms_type")
        if nms_type is not None:
            # config-driven per-class-task NMS (`get_bboxes:1344-1401`):
            # each task covers a class-index group with its own radius
            # (circle NMS) or IoU threshold (rotate NMS); radius <= 0
            # keeps every box of the group.
            tasks = tcfg.get("tasks")
            if tasks is None:
                # reference defaults for nuScenes (`:1315-1333`)
                tasks = [dict(indices=list(range(8)), radius=-1),
                         dict(indices=[8], radius=0.175),
                         dict(indices=[9], radius=0.175)]
            for task in tasks:
                radius = float(task.get("radius", -1))
                if radius <= 0:
                    continue
                in_task = jnp.isin(
                    labels, jnp.asarray(list(task["indices"])))
                if nms_type == "circle":
                    # the reference passes task['radius'] RAW to
                    # circle_nms, whose thresh compares SQUARED distance
                    # (box3d_nms.py:181 quirk: 0.175 means sqrt(0.175)=
                    # 0.42 m); squaring again shrank suppression to
                    # 0.175 m (r3 review fix)
                    keep = jax.vmap(lambda c, s, v: circle_nms_mask(
                        c, s, radius, v))(
                            bboxes[..., :2], scores, mask & in_task)
                else:   # rotate NMS on BEV boxes, radius = IoU thresh
                    from ...ops.box_ops import nms_bev_mask
                    keep = jax.vmap(lambda b, s, v: nms_bev_mask(
                        b, s, radius, v))(
                            bboxes[..., [0, 1, 3, 4, 6]], scores,
                            mask & in_task)
                mask = jnp.where(in_task, keep, mask)
                scores = jnp.where(mask, scores, 0.0)
        return dict(bboxes=bboxes, scores=scores, labels=labels, mask=mask)
