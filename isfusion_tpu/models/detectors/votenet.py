"""VoteNet indoor detector (parity: `mmdet3d/models/detectors/votenet.py`):
PointNet++ backbone -> VoteHead. Batch contract: points (B, N, 3+C),
points_mask (B, N), padded GTs (+ optional pts_instance/semantic masks)."""
from __future__ import annotations

from typing import Optional

import flax.linen as nn

from ...registry import DETECTORS
from ..builder import build_backbone, build_head


@DETECTORS.register_module()
class VoteNet(nn.Module):
    backbone: Optional[dict] = None
    bbox_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    def setup(self):
        self.backbone_m = build_backbone(dict(self.backbone))
        head_cfg = dict(self.bbox_head)
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
        max_num = int(dict(self.test_cfg or {}).get("max_output_num", 128))
        return self.bbox_head_m.get_bboxes(preds, max_num=max_num)
