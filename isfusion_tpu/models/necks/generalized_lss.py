"""GeneralizedLSSFPN image neck.

Parity: `mmdet3d/models/necks/generalized_lss.py:13,81` — top-down:
upsample(next level, bilinear align_corners=True) -> concat -> 1x1 lateral
conv -> 3x3 fpn conv; all outs at out_channels. NHWC.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...registry import NECKS
from ...ops.interpolate import resize_bilinear
from ..layers import ConvModule, resolve_dtype


@NECKS.register_module()
class GeneralizedLSSFPN(nn.Module):
    in_channels: Sequence[int] = (192, 384, 768)
    out_channels: int = 256
    num_outs: int = 3
    start_level: int = 0
    end_level: int = -1
    no_norm_on_lateral: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    upsample_cfg: Optional[dict] = None
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        up = dict(self.upsample_cfg or
                  dict(mode="bilinear", align_corners=True))
        align = bool(up.get("align_corners", True))
        norm_cfg = dict(self.norm_cfg or dict(type="BN2d"))
        act_cfg = dict(self.act_cfg or dict(type="ReLU"))
        dt = resolve_dtype(self.compute_dtype)
        laterals = [inputs[i + self.start_level]
                    for i in range(len(inputs) - self.start_level)]
        if dt is not None:
            laterals = [f.astype(dt) for f in laterals]
        used = len(laterals) - 1
        for i in range(used - 1, -1, -1):
            x = resize_bilinear(laterals[i + 1], laterals[i].shape[1:3],
                                align_corners=align)
            x = jnp.concatenate([laterals[i], x], axis=-1)
            x = ConvModule(
                self.out_channels, kernel_size=1,
                norm_cfg=None if self.no_norm_on_lateral else norm_cfg,
                act_cfg=act_cfg, dtype=dt,
                name=f"lateral_{i}")(x, train=train)
            laterals[i] = ConvModule(
                self.out_channels, kernel_size=3, padding=1,
                norm_cfg=norm_cfg, act_cfg=act_cfg, dtype=dt,
                name=f"fpn_{i}")(x, train=train)
        return tuple(laterals[:used])
