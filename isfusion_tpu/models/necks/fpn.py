"""Standard FPN neck (mmdet FPN surface, used by the PointPillars-FPN and
image branches). NHWC; nearest-neighbor top-down upsampling."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import NECKS
from ..layers import ConvModule


def _upsample2x(x: jnp.ndarray, target_hw) -> jnp.ndarray:
    """Nearest-neighbor resize to target (h, w) (NHWC or HWC)."""
    h, w = target_hw
    shape = x.shape[:-3] + (h, w, x.shape[-1])
    return jax.image.resize(x, shape, method="nearest")


@NECKS.register_module()
class FPN(nn.Module):
    in_channels: Sequence[int] = (64, 128, 256)
    out_channels: int = 256
    num_outs: int = 3
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: object = False  # False | 'on_output' | 'on_lateral'
    relu_before_extra_convs: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        end = len(self.in_channels) if self.end_level == -1 else self.end_level
        laterals = [
            ConvModule(self.out_channels, 1, bias="auto",
                       norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                       axis_name=self.axis_name,
                       name=f"lateral_{i}")(inputs[i], train=train)
            for i in range(self.start_level, end)
        ]
        # top-down pathway
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample2x(
                laterals[i], laterals[i - 1].shape[-3:-1])
        outs = [
            ConvModule(self.out_channels, 3, padding=1, bias="auto",
                       norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                       axis_name=self.axis_name,
                       name=f"fpn_conv_{i}")(laterals[i], train=train)
            for i in range(len(laterals))
        ]
        # extra levels: stride-2 convs (FCOS style) or maxpool (mmdet default)
        extra_idx = 0
        while len(outs) < self.num_outs:
            if self.add_extra_convs:
                src = outs[-1]
                if self.relu_before_extra_convs and extra_idx > 0:
                    src = nn.relu(src)
                outs.append(ConvModule(
                    self.out_channels, 3, stride=2, padding=1, bias="auto",
                    norm_cfg=self.norm_cfg, act_cfg=None,
                    axis_name=self.axis_name,
                    name=f"extra_conv_{extra_idx}")(src, train=train))
                extra_idx += 1
            else:
                outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)
