"""CenterPoint detection head.

Parity: `mmdet3d/models/dense_heads/centerpoint_head.py` (SeparateHead:18,
CenterHead:242). TPU-native differences:
- gaussian heatmap targets are painted with a vectorized max-reduce over all
  padded GT slots (`ops/gaussian.py`), not a python loop per object
  (`centerpoint_head.py:500-570`);
- per-task GT "compaction" keeps the padded (B, G) layout with a task mask
  instead of dynamic gathers — identical losses, static shapes;
- decode + circle-NMS run fully on device with fixed box budgets per task
  (`get_bboxes`, `centerpoint_head.py:626-718`).

All feature maps are NHWC.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...registry import HEADS, BBOX_CODERS, build_from_cfg
from ...ops.box_ops import circle_nms_mask, nms_bev_mask
from ...ops.gaussian import draw_heatmap_gaussian_batch, gaussian_radius
from ..layers import ConvModule
from ..losses import build_loss


def clip_sigmoid(x: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """`mmdet3d/models/utils/clip_sigmoid.py` equivalent."""
    return jnp.clip(jax.nn.sigmoid(x), eps, 1 - eps)


class SeparateHead(nn.Module):
    """Per-task branch convs (`centerpoint_head.py:18`): for each output key
    (reg/height/dim/rot/vel/heatmap), num_conv-1 ConvModules + final conv."""

    heads: Any  # dict key -> (out_channels, num_conv)
    head_conv: int = 64
    final_kernel: int = 1
    init_bias: float = -2.19
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> dict:
        out = {}
        norm_cfg = dict(self.norm_cfg or dict(type="BN2d"))
        for key, (classes, num_conv) in dict(self.heads).items():
            h = x
            for i in range(int(num_conv) - 1):
                h = ConvModule(
                    self.head_conv, kernel_size=self.final_kernel,
                    padding=self.final_kernel // 2, norm_cfg=norm_cfg,
                    act_cfg=dict(type="relu"),
                    name=f"{key}_{i}")(h, train=train)
            bias_init = nn.initializers.constant(self.init_bias) \
                if key == "heatmap" else nn.initializers.zeros
            h = nn.Conv(int(classes),
                        (self.final_kernel, self.final_kernel),
                        padding=self.final_kernel // 2, use_bias=True,
                        bias_init=bias_init, name=f"{key}_final")(h)
            out[key] = h
        return out


@HEADS.register_module()
class CenterHead(nn.Module):
    """Multi-task center heatmap head (`centerpoint_head.py:242`)."""

    in_channels: int = 128
    tasks: Any = None               # list of dict(num_class, class_names)
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    bbox_coder: Optional[dict] = None
    common_heads: Any = None        # dict key -> (channels, num_conv)
    loss_cls: Any = None
    loss_bbox: Any = None
    separate_head: Any = None
    share_conv_channel: int = 64
    num_heatmap_convs: int = 2
    norm_cfg: Optional[dict] = None
    norm_bbox: bool = True

    @property
    def class_names(self):
        return [list(t["class_names"]) for t in self.tasks]

    @property
    def num_classes(self):
        return [len(t["class_names"]) for t in self.tasks]

    @property
    def task_offsets(self):
        offs = [0]
        for n in self.num_classes:
            offs.append(offs[-1] + n)
        return offs

    def _coder(self):
        return build_from_cfg(dict(self.bbox_coder), BBOX_CODERS)

    def setup(self):
        sep = dict(self.separate_head or
                   dict(type="SeparateHead", init_bias=-2.19, final_kernel=3))
        sep.pop("type", None)
        heads_list = []
        for num_cls in self.num_classes:
            heads = dict(self.common_heads or {})
            heads = {k: tuple(v) for k, v in heads.items()}
            heads["heatmap"] = (num_cls, self.num_heatmap_convs)
            heads_list.append(SeparateHead(
                heads=heads, norm_cfg=self.norm_cfg, **sep))
        self.task_heads = heads_list
        self.shared_conv = ConvModule(
            self.share_conv_channel, kernel_size=3, padding=1,
            norm_cfg=dict(self.norm_cfg or dict(type="BN2d")),
            act_cfg=dict(type="relu"))
        self.loss_cls_fn = build_loss(dict(
            self.loss_cls or dict(type="GaussianFocalLoss",
                                  reduction="mean")))
        self.loss_bbox_fn = build_loss(dict(
            self.loss_bbox or dict(type="L1Loss", reduction="none",
                                   loss_weight=0.25)))

    def __call__(self, feats, train: bool = False):
        """feats: list of (B, H, W, C) -> list (levels) of list (tasks) of
        dicts of NHWC maps."""
        if not isinstance(feats, (tuple, list)):
            feats = [feats]
        outs = []
        for x in feats:
            x = self.shared_conv(x, train=train)
            outs.append([head(x, train=train) for head in self.task_heads])
        return outs

    # ------------------------------------------------------------ targets
    def _grid_params(self) -> Tuple[np.ndarray, np.ndarray, int]:
        tc = dict(self.train_cfg or {})
        pc_range = np.asarray(tc["point_cloud_range"], np.float32)
        voxel_size = np.asarray(tc["voxel_size"], np.float32)
        osf = int(tc["out_size_factor"])
        return pc_range, voxel_size, osf

    def get_targets(self, gt_bboxes: jnp.ndarray, gt_labels: jnp.ndarray,
                    gt_mask: jnp.ndarray, feat_hw: Tuple[int, int]):
        """Vectorized target generation for all tasks.

        gt_bboxes (B, G, 9) bottom-z boxes; gt_labels (B, G) global ids;
        gt_mask (B, G). Returns per-task (heatmap (B,H,W,nc), anno (B,G,10),
        ind (B,G), mask (B,G))."""
        tc = dict(self.train_cfg or {})
        pc_range, voxel_size, osf = self._grid_params()
        overlap = float(tc.get("gaussian_overlap", 0.1))
        min_radius = float(tc.get("min_radius", 2))
        h, w = feat_hw

        cx = (gt_bboxes[..., 0] - pc_range[0]) / (voxel_size[0] * osf)
        cy = (gt_bboxes[..., 1] - pc_range[1]) / (voxel_size[1] * osf)
        xi = jnp.floor(cx).astype(jnp.int32)
        yi = jnp.floor(cy).astype(jnp.int32)
        in_grid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        dxw = gt_bboxes[..., 3] / (voxel_size[0] * osf)   # width in cells
        dyl = gt_bboxes[..., 4] / (voxel_size[1] * osf)   # length in cells
        radius = gaussian_radius((dyl, dxw), min_overlap=overlap)
        radius = jnp.maximum(min_radius,
                             jnp.floor(radius)).astype(jnp.float32)
        size_ok = (dxw > 0) & (dyl > 0)

        z_grav = gt_bboxes[..., 2] + gt_bboxes[..., 5] * 0.5
        dims = gt_bboxes[..., 3:6]
        dims = jnp.log(jnp.maximum(dims, 1e-4)) if self.norm_bbox else dims
        rot = gt_bboxes[..., 6]
        vel = gt_bboxes[..., 7:9] if gt_bboxes.shape[-1] >= 9 else \
            jnp.zeros(gt_bboxes.shape[:-1] + (2,), gt_bboxes.dtype)
        anno = jnp.concatenate([
            (cx - xi.astype(cx.dtype))[..., None],
            (cy - yi.astype(cy.dtype))[..., None],
            z_grav[..., None], dims, jnp.sin(rot)[..., None],
            jnp.cos(rot)[..., None], vel], axis=-1)
        ind = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)

        targets = []
        offs = self.task_offsets
        for t, names in enumerate(self.class_names):
            task_valid = gt_mask & in_grid & size_ok & \
                (gt_labels >= offs[t]) & (gt_labels < offs[t + 1])

            def heat_single(cxy, rad, labels, valid):
                maps = []
                for c in range(len(names)):
                    v = valid & (labels == offs[t] + c)
                    maps.append(draw_heatmap_gaussian_batch(
                        (h, w), cxy, rad, v))
                return jnp.stack(maps, -1)  # (H, W, nc)

            heat = jax.vmap(heat_single)(
                jnp.stack([cx, cy], -1), radius, gt_labels, task_valid)
            targets.append((heat, anno, ind, task_valid))
        return targets

    # -------------------------------------------------------------- loss
    def loss(self, preds, gt_bboxes: jnp.ndarray, gt_labels: jnp.ndarray,
             gt_mask: jnp.ndarray) -> dict:
        preds = preds[0]  # single level
        h, w = preds[0]["heatmap"].shape[1:3]
        targets = self.get_targets(gt_bboxes, gt_labels, gt_mask, (h, w))
        tc = dict(self.train_cfg or {})
        code_weights = jnp.asarray(
            tc.get("code_weights", [1.0] * 10), jnp.float32)
        losses = {}
        for t, pred in enumerate(preds):
            heat_t, anno_t, ind_t, mask_t = targets[t]
            heat_p = clip_sigmoid(pred["heatmap"])
            num_pos = jnp.sum((heat_t == 1.0).astype(jnp.float32))
            losses[f"task{t}.loss_heatmap"] = self.loss_cls_fn(
                heat_p, heat_t, avg_factor=jnp.maximum(num_pos, 1.0))
            keys = ["reg", "height", "dim", "rot"]
            if "vel" in pred:
                keys.append("vel")
            anno_pred = jnp.concatenate([pred[k] for k in keys], -1)
            b, _, _, code = anno_pred.shape
            flat = anno_pred.reshape(b, h * w, code)
            gathered = jnp.take_along_axis(
                flat, ind_t[..., None].astype(jnp.int32), axis=1)
            weights = mask_t[..., None].astype(jnp.float32) * \
                code_weights[None, None, :code]
            num = jnp.sum(mask_t.astype(jnp.float32))
            losses[f"task{t}.loss_bbox"] = jnp.sum(
                self.loss_bbox_fn(gathered, anno_t[..., :code],
                                  weight=weights, reduction="none",
                                  avg_factor=None)) / (num + 1e-4)
        return losses

    # --------------------------------------------------------- inference
    def get_bboxes(self, preds) -> dict:
        """Decode all tasks, per-task NMS with fixed budgets, concat.

        Returns dict(bboxes (B, K, code), scores (B, K), labels (B, K),
        mask (B, K))."""
        preds = preds[0]
        coder = self._coder()
        tcfg = dict(self.test_cfg or {})
        nms_type = tcfg.get("nms_type", "circle")
        post_max = int(tcfg.get("post_max_size", 83))
        min_radius = tcfg.get("min_radius", [4] * len(preds))
        offs = self.task_offsets

        outs = []
        for t, pred in enumerate(preds):
            heat = jax.nn.sigmoid(pred["heatmap"])

            def decode_single(heat, reg, hei, dim, rot, vel):
                d = coder.decode(
                    heat, rot[..., 0:1], rot[..., 1:2], hei,
                    jnp.exp(dim) if self.norm_bbox else dim, vel, reg)
                boxes, scores = d["bboxes"], d["scores"]
                valid = d["mask"]
                if nms_type == "circle":
                    keep = circle_nms_mask(
                        boxes[:, :2], scores, float(min_radius[t]), valid)
                else:
                    bev = boxes[:, [0, 1, 3, 4, 6]]
                    keep = nms_bev_mask(
                        bev, scores, float(tcfg.get("nms_thr", 0.2)), valid)
                scores = jnp.where(keep, scores, 0.0)
                topv, topi = jax.lax.top_k(scores, post_max)
                return (boxes[topi], topv, d["labels"][topi] + offs[t],
                        keep[topi] & (topv > 0))

            vel = pred.get("vel")
            out = jax.vmap(decode_single)(
                heat, pred["reg"], pred["height"], pred["dim"], pred["rot"],
                vel if vel is not None else
                jnp.zeros(heat.shape[:3] + (2,), heat.dtype))
            outs.append(out)

        bboxes = jnp.concatenate([o[0] for o in outs], axis=1)
        # decode returns gravity-center z; convert to bottom z
        # (`centerpoint_head.py:707`)
        bboxes = bboxes.at[..., 2].add(-bboxes[..., 5] * 0.5)
        return dict(
            bboxes=bboxes,
            scores=jnp.concatenate([o[1] for o in outs], axis=1),
            labels=jnp.concatenate([o[2] for o in outs], axis=1),
            mask=jnp.concatenate([o[3] for o in outs], axis=1))
