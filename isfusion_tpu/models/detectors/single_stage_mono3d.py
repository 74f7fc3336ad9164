"""Single-stage monocular 3D detectors (FCOS3D).

Parity: `mmdet3d/models/detectors/single_stage_mono3d.py` +
`fcos_mono3d.py` (FCOSMono3D): backbone -> neck -> mono head over single
images. Batch contract documented in `dense_heads/fcos_mono3d_head.py`.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn

from ...registry import DETECTORS
from ..builder import build_backbone, build_head, build_neck


@DETECTORS.register_module()
class FCOSMono3D(nn.Module):
    backbone: Optional[dict] = None
    neck: Optional[dict] = None
    bbox_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    def setup(self):
        self.backbone_m = build_backbone(dict(self.backbone))
        self.neck_m = build_neck(dict(self.neck)) if self.neck else None
        head_cfg = dict(self.bbox_head)
        head_cfg.setdefault("train_cfg", self.train_cfg)
        head_cfg.setdefault("test_cfg", self.test_cfg)
        self.bbox_head_m = build_head(head_cfg)

    def extract_feat(self, img, train: bool = False):
        x = self.backbone_m(img, train=train)
        if self.neck_m is not None:
            x = self.neck_m(x, train=train)
        if not isinstance(x, (tuple, list)):
            x = [x]
        return x

    def __call__(self, batch: dict, train: bool = False,
                 mode: str = "predict"):
        feats = self.extract_feat(batch["img"], train=train)
        preds = self.bbox_head_m(feats, train=train)
        if mode == "feats":
            return preds
        if mode == "loss":
            return self.bbox_head_m.loss(preds, batch)
        max_num = int(dict(self.test_cfg or {}).get("max_per_img", 200))
        return self.bbox_head_m.get_bboxes(preds, batch["cam2img"],
                                           max_num=max_num)
