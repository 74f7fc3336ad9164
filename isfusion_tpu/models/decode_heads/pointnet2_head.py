"""PointNet++ semantic segmentation head.

Parity: `mmdet3d/models/decode_heads/pointnet2_head.py` — FP modules
upsampling the SA pyramid back to full resolution + per-point classifier.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...registry import HEADS
from ..backbones.pointnet2 import PointFPModule, _SharedMLP
from ..losses import build_loss


@HEADS.register_module()
class PointNet2Head(nn.Module):
    num_classes: int = 20
    fp_channels: Any = ((768, 256, 256), (384, 256, 256),
                        (320, 256, 128), (128, 128, 128, 128))
    channels: int = 128
    dropout_ratio: float = 0.5
    ignore_index: Optional[int] = None
    loss_decode: Any = None

    @nn.compact
    def __call__(self, feat_dict: dict, train: bool = False) -> jnp.ndarray:
        """Consumes the full SA pyramid; returns (B, N, num_classes)
        logits at the input resolution."""
        sa_xyz = feat_dict["sa_xyz"]
        sa_feats = feat_dict["sa_features"]
        sa_masks = feat_dict["sa_masks"]
        x_xyz, x_feats, x_mask = sa_xyz[-1], sa_feats[-1], sa_masks[-1]
        n = len(sa_xyz)
        for i, channels in enumerate(self.fp_channels):
            t = n - i - 2
            x_feats = PointFPModule(list(channels)[1:], name=f"fp{i}")(
                sa_xyz[t], sa_feats[t], x_xyz, x_feats,
                sa_masks[t], x_mask, train=train)
            x_xyz, x_mask = sa_xyz[t], sa_masks[t]
        x = _SharedMLP((self.channels,), name="pre_seg")(
            x_feats, x_mask, train=train)
        if self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio,
                           deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="cls_seg")(x)

    def loss(self, logits: jnp.ndarray, batch: dict) -> dict:
        labels = batch["pts_semantic_mask"]
        mask = batch["points_mask"]
        if self.ignore_index is not None:
            mask = mask & (labels != self.ignore_index)
        ce = build_loss(dict(
            self.loss_decode or dict(type="CrossEntropyLoss",
                                     reduction="none")))
        loss = ce(logits, jnp.clip(labels, 0, self.num_classes - 1))
        w = mask.astype(jnp.float32)
        return dict(loss_sem_seg=jnp.sum(loss * w) /
                    jnp.maximum(w.sum(), 1.0))


@HEADS.register_module()
class PAConvHead(PointNet2Head):
    """PAConv decoder head (`mmdet3d/models/decode_heads/paconv_head.py`):
    PointNet2 FP pyramid plus a pre-seg 1x1 conv before the classifier."""

    fp_channels: Any = ((768, 256, 256), (384, 256, 256),
                        (320, 256, 128), (128 + 6, 128, 128, 128))
    with_pre_seg_conv: bool = True
