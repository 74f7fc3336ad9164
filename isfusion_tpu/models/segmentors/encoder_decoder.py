"""3D semantic segmentation (parity: `mmdet3d/models/segmentors/
encoder_decoder.py` EncoderDecoder3D): point backbone + decode head."""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...registry import SEGMENTORS, build_from_cfg, HEADS
from ..builder import build_backbone


@SEGMENTORS.register_module()
class EncoderDecoder3D(nn.Module):
    backbone: Optional[dict] = None
    decode_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    def setup(self):
        self.backbone_m = build_backbone(dict(self.backbone))
        self.decode_head_m = build_from_cfg(dict(self.decode_head), HEADS)

    def __call__(self, batch: dict, train: bool = False,
                 mode: str = "predict"):
        feat_dict = self.backbone_m(batch["points"], batch["points_mask"],
                                    train=train)
        logits = self.decode_head_m(feat_dict, train=train)
        if mode == "feats":
            return logits
        if mode == "loss":
            return self.decode_head_m.loss(logits, batch)
        return dict(semantic_pred=jnp.argmax(logits, -1),
                    logits=logits, mask=batch["points_mask"])
